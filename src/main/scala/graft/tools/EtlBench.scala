package graft.tools

import graft.GraftSession
import graft.operators.{Canonicalize, TransformPipeline}

/** Head-to-head throughput vs the reference's pandas transform layer: parse a
  * price-list CSV, canonicalize headers, run the full §2.4 transform surface,
  * and materialize through the noop sink. Pass the CSV path (default: the
  * 100×-replicated `Lista Precios.csv` at /tmp/lista_100x.csv) and optionally
  * a core count; prints one JSON line with median-of-3 wall time and rows/s.
  *
  * The measured span includes CSV parsing, like the pandas figure it is
  * compared against (`pd.read_csv` + `map_columns_to_apply_transformations` +
  * `apply_transformations`, single process).
  */
object EtlBench {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/lista_100x.csv")
    val cpus = if (args.length > 1) args(1) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(): Long = {
      val t0 = System.nanoTime()
      val raw = graft.sources.CsvSource.readPath(spark, path)
      TransformPipeline(Canonicalize.canonicalize(Canonicalize.dropJunkColumns(raw)))
        .write.format("noop").mode("overwrite").save()
      System.nanoTime() - t0
    }

    run() // warm codegen + classloading
    val times = Seq.fill(3)(run()).sorted
    val medianSec = times(1) / 1e9
    val rows = graft.sources.CsvSource.readPath(spark, path).count()
    println(f"""{"metric":"etl_transform_throughput","csv":"$path","rows":$rows,"median_sec":$medianSec%.3f,"rows_per_sec":${rows / medianSec}%.0f,"cores":$cpus}""")
    spark.stop()
  }
}
