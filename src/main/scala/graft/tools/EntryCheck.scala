package graft.tools
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[4]")
    val df = graft.SparkEntry.entry(spark)
    println(s"entry rows=${df.count()}")
    df.show(3, false)
    spark.stop()
  }
}
