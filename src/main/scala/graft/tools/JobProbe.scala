package graft.tools

import graft._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Round-16 measurement aid (guide §1: measure first): runs one or more
  * catalog queries and prints EVERY Spark job's wall time, description and
  * stage/task counts — the per-job breakdown the Spark UI would show,
  * usable headlessly. Construction (eager checkpoints inside iterative
  * operators) and the final action are bracketed separately so loop-round
  * jobs are attributable.
  *
  * Usage: `runMain graft.tools.JobProbe <q1,q2,...> [sfDir]`
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProbe <q1,q2,...> [sfDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-jobprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val stageTasks = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc, js.stageInfos.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc, nStages) =>
          println(f"[job] id=${je.jobId}%4d ${(je.time - t0) / 1000.0}%8.3f s  stages=$nStages%3d  $desc")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stageTasks.addAndGet(sc.stageInfo.numTasks.toLong)
    }
    spark.sparkContext.addSparkListener(listener)
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query: $n"))
      // warmup (codegen/JIT), mirroring Bench methodology
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
      println(s"=== $n: measured run ===")
      stageTasks.set(0)
      val t0 = System.nanoTime()
      println(s"--- $n: construction ---")
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      println(s"--- $n: action ---")
      df.count()
      val t2 = System.nanoTime()
      Thread.sleep(200) // let the listener bus drain before the summary line
      println(f"=== $n total=${(t2 - t0) / 1e9}%.3f s (construct=${(t1 - t0) / 1e9}%.3f, action=${(t2 - t1) / 1e9}%.3f) tasks=${stageTasks.get()} ===")
      spark.catalog.clearCache()
      // release construction-time localCheckpoint blocks (PlanDump note)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
