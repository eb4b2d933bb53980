package graft

/** Catalog-wide plan audit (dev tool, not a test): prints per-query flags
  * worth a second look — interpreted expressions in the hot path
  * (CodegenFallback), SortAggregate where hash aggregation may fit,
  * range-partitioning exchanges, and cartesian shapes. Run:
  * `sbt "Test/runMain graft.AuditMain"`. */
object AuditMain {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("8", "audit")
    val streaming = Set("st2_stream_hourly", "st3_stream_dedup",
      "st4_stream_join", "st6_stream_sessionize", "st7_stream_static_join",
      "st9_stream_outer_join")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!streaming(name)) {
        try {
          val p = fn(s, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
          val flags = Seq(
            "SortAggregate" -> p.contains("SortAggregate"),
            "rangeExchange" -> p.contains("Exchange rangepartitioning"),
            "cartesian" -> p.contains("CartesianProduct"),
            "BNLJ" -> p.contains("BroadcastNestedLoopJoin"),
            "inMemoryRelation" -> p.contains("InMemoryTableScan")
          ).collect { case (f, true) => f }
          if (flags.nonEmpty) println(f"$name%-32s ${flags.mkString(", ")}")
        } catch { case e: Throwable => println(f"$name%-32s ERROR ${e.getMessage.take(80)}") }
      }
    }
    s.stop()
  }
}
