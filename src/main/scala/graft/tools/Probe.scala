package graft.tools
import graft._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "probe")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime
      val c = SparkEntry.queries("dd_embedding_neardup")(spark, d).count()
      println(f"[probe] dd_embedding run$i: ${(System.nanoTime - t0) / 1e9}%.2fs ($c rows)")
    }
    spark.stop()
  }
}
