package graft.tools
import graft._

/** Throwaway profiling harness (not part of the shipped surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "scratch")
    val d = "/root/testdata/sf0.001"
    val streaming = Set("st2_stream_hourly", "st3_stream_dedup",
      "st4_stream_join", "st6_stream_sessionize")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!streaming(name)) {
        try {
          val p = fn(spark, d).queryExecution.executedPlan.toString
          val bad = Seq("BroadcastNestedLoopJoin", "CartesianProduct").filter(p.contains)
          if (bad.nonEmpty) println(s"[scratch] $name: ${bad.mkString(",")}")
        } catch { case e: Throwable => println(s"[scratch] $name: ERROR ${e.getMessage}") }
      }
    }
    println("[scratch] sweep done")
    spark.stop()
  }
}
