package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (one JVM-wide session; suites run serially
  * under sbt's default test execution).
  */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.get("local[4]")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Evaluate a single-column expression over the given inputs (null-safe) and
    * return the results in input order.
    */
  def evalCases(inputs: Seq[String])(fn: Column => Column): Seq[Any] = {
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val rows = inputs.zipWithIndex.map { case (v, i) =>
      org.apache.spark.sql.Row(Int.box(i), v)
    }
    spark.createDataFrame(rows.asJava, schema)
      .select(col("i"), fn(col("v")).as("r"))
      .collect().sortBy(_.getInt(0)).map(r => r.get(1)).toSeq
  }

  def checkCases(cases: Seq[(String, Any)])(fn: Column => Column): Unit = {
    val got = evalCases(cases.map(_._1))(fn)
    cases.zip(got).foreach { case ((in, want), actual) =>
      assert(actual == want, s"input=${Option(in).map("'" + _ + "'").getOrElse("null")} expected=$want got=$actual")
    }
  }
}
