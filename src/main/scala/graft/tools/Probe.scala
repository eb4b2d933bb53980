package graft.tools
import graft._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "probe")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (i <- 1 to 10) {
      val t0 = System.nanoTime
      val c = SparkEntry.queries("a1_sentiment_distribution")(spark, d).count()
      println(f"[probe] a1 run$i: ${(System.nanoTime - t0) / 1e9}%.2fs ($c rows)")
    }
    spark.stop()
  }
}
