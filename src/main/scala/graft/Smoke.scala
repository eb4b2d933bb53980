package graft

/** Driver-contract smoke: runs SparkEntry.entry and prints its row count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-smoke")
    val df = SparkEntry.entry(spark)
    df.show(10, false)
    println(s"entry rows: ${df.count()}")
    spark.stop()
  }
}
