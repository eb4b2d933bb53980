package graft.tools
import graft._

/** Throwaway profiling harness (not part of the shipped surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "scratch")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warmup
    graft.streaming.Streams.runStreamJoinToCompletion(spark, d, "wj0").count()
    for (i <- 1 to 3)
      time(s"st4-run$i")(
        graft.streaming.Streams.runStreamJoinToCompletion(spark, d, s"wj$i").count())
    spark.stop()
  }
}
