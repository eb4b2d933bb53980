package graft.tools

import graft._

/** Round-15 plan-audit dump: writes `.explain("formatted")` for the named
  * catalog queries to `<outDir>/<query>_<tag>.txt` — the before/after
  * evidence files the optimization round commits under `plans/r15/`.
  *
  * Usage: `runMain graft.tools.PlanDump <outDir> <tag> <q1,q2,...> [sfDir]`
  *
  * Iterative operators (graph loops, BPE, the selection families) execute
  * their per-round `localCheckpoint`s eagerly during CONSTRUCTION, so the
  * dumped plan is the final-stage plan reading checkpointed blocks — the
  * loop-internal shapes are documented per round in OPTIMIZATION_r15.md
  * from the operator code and solo probes instead. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <q1,q2,...> [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query: $n"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$tag.txt"), plan)
      println(s"[plandump] $n -> ${outDir.resolve(s"${n}_$tag.txt")}")
      spark.catalog.clearCache()
      // iterative operators eagerly localCheckpoint during CONSTRUCTION;
      // those blocks are RDD-level and survive clearCache — release them
      // so dumping many iterative queries in one session doesn't
      // accumulate checkpoint blocks (round-15 ADVICE)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
