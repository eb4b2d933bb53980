package graft

/** Full-materialization timing harness (dev tool, not a test): times
  * catalog entries under a `noop`-sink write, which forces EVERY output
  * column to be computed — unlike Bench's `count()`, which Catalyst
  * legitimately answers after pruning unreferenced projection work, so
  * row-local string/array operators (augmentation, templating) measure
  * as a bare scan there. Bench keeps `count()` for round-to-round
  * comparability with the recorded baselines; THIS tool is what SCALE.md
  * cites for projection-heavy entries. Run:
  * `sbt "Test/runMain graft.TimeMain <sfDir> <name,name,...>"`. */
object TimeMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, csv) = args.take(2)
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-time")
    for (name <- csv.split(",")) {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(s, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        s.catalog.clearCache()
        t
      }
      once() // warm (session/codegen), discard
      val t = math.min(once(), once())
      println(f"[time] $name%-28s $t%.2fs (noop-forced, min of 2)")
    }
    s.stop()
  }
}
