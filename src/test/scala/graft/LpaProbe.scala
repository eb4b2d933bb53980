package graft

/** Round-attribution probe for `gr_labelprop` (SCALE.md round 14):
  * times the labelPropagation entry at 1..4 rounds over the sf0.1
  * trade graph and prints the final plan. The measurement behind the
  * "per-round marginal ≈ 0.15 s, the wall is the shared edge base"
  * claim and the `UnknownPartitioning(0)` checkpoint observation that
  * killed the pre-partition idea. Not a test. */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "lpa-probe")
    val d = "/root/testdata/sf0.1"
    val t0 = System.nanoTime
    val e = operators.Graph.tradeEdges(Tables.orders(spark, d), Tables.lineitem(spark, d))
    println(s"edges: ${e.count()} in ${(System.nanoTime - t0) / 1e9}")
    for (r <- 1 to 4) {
      val t = System.nanoTime
      val out = operators.Graph.labelPropagation(e, rounds = r)
      val n = out.count()
      println(s"rounds=$r nodes=$n wall=${(System.nanoTime - t) / 1e9}")
    }
    val t5 = System.nanoTime
    val out = operators.Graph.labelPropagation(e, rounds = 4)
    println("=== final plan ===")
    out.explain("formatted")
    println(s"4-round repeat wall=${(System.nanoTime - t5) / 1e9}")
    spark.stop()
  }
}
