package graft

/** Small-heap measurement for the iterative graph family (r13 VERDICT
  * task 5) — one storage mode per JVM so block-manager residue from a
  * previous mode can't contaminate the next:
  * `SPARK_DRIVER_MEM=8g sbt "Test/runMain graft.GraphHeapProbe /tmp/sf3 ser"`.
  * Prints wall time and cumulative GC time per pass; SCALE.md records
  * the sf3@8g-vs-24g table. Optional third arg picks the catalog entry
  * (default gr_pagerank — round 14 adds the LPA pair). Not a test. */
object GraphHeapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val entry = if (args.length > 2) args(2) else "gr_pagerank"
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graph-heap-probe")
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.graft.graph.checkpointStorage", mode)
    def gcMillis: Long = {
      val it = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.iterator()
      var t = 0L
      while (it.hasNext) t += it.next().getCollectionTime
      t
    }
    def once(tag: String): Unit = {
      System.gc()
      val g0 = gcMillis; val t0 = System.nanoTime()
      SparkEntry.queries(entry)(s, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      s.catalog.clearCache()
      println(f"[heap] $entry mode=$mode%-7s $tag t=$t%7.2fs gc=${gcMillis - g0}%6dms " +
        f"heap=${Runtime.getRuntime.maxMemory() / 1024 / 1024}MB")
    }
    once("warm")
    once("r1  ")
    once("r2  ")
    s.stop()
  }
}
