package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Graph

/** Hand-computed goldens for the graph operators. The catalog's trade
  * graph is symmetric (no dangling nodes by construction), so the
  * dangling-mass redistribution semantics is pinned HERE on a directed
  * 3-node chain. */
class GraphSpec extends SparkSpec {

  private def edges(rows: Seq[(String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("src", "dst")
  }

  private def pairs(rows: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id_a", "id_b")
  }

  test("pageRank one iteration with a dangling node: hand-computed") {
    // a→b, b→c, c dangling. r0 = 1/3 each; dangling mass 1/3 re-spread.
    // a: 0.15/3 + 0.85*(0 + 1/9)         = 0.144444
    // b: 0.15/3 + 0.85*(1/3 + 1/9)       = 0.427778
    // c: 0.15/3 + 0.85*(1/3 + 1/9)       = 0.427778
    val r = Graph.pageRank(edges(Seq("a" -> "b", "b" -> "c")), iterations = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("a") == 0.144444)
    assert(r("b") == 0.427778)
    assert(r("c") == 0.427778)
  }

  test("pageRank conserves total rank mass across iterations") {
    // star + chain + dangling tail: mass must stay 1 (up to round-6 noise)
    val e = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "c" -> "d")
    for (k <- Seq(1, 5, 10)) {
      val total = Graph.pageRank(edges(e), iterations = k)
        .agg(org.apache.spark.sql.functions.sum("rank")).collect()(0).getDouble(0)
      assert(math.abs(total - 1.0) < 1e-5, s"mass drifted at k=$k: $total")
    }
  }

  test("pageRank on a symmetric pair gives the uniform fixpoint") {
    // a↔b is already stationary: rank stays 1/2 whatever the iterations
    val e = Seq("a" -> "b", "b" -> "a")
    val r = Graph.pageRank(edges(e), iterations = 7)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("a") == 0.5 && r("b") == 0.5)
  }

  test("triangleStats: one triangle with a pendant vertex") {
    // (1,2),(2,3),(1,3) triangle; 4 pendant off 3
    val r = Graph.triangleStats(pairs(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)))
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 1L, 1.0)))
    assert(r(2L) == ((2L, 1L, 1.0)))
    assert(r(3L) == ((3L, 1L, 0.333333)))
    assert(r(4L) == ((1L, 0L, 0.0)))
  }

  test("triangleStats canonicalizes reversed and duplicate pairs") {
    val canon = Graph.triangleStats(pairs(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)))
      .collect().toSeq.map(_.toSeq)
    val messy = Graph.triangleStats(pairs(Seq(2L -> 1L, 2L -> 3L, 3L -> 1L,
      1L -> 2L, 3L -> 2L)))
      .collect().toSeq.map(_.toSeq)
    assert(canon == messy)
  }

  test("triangleStats on K4: every node in 3 triangles, clustering 1") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield a -> b
    val r = Graph.triangleStats(pairs(k4)).collect()
    assert(r.length == 4)
    r.foreach { x =>
      assert(x.getLong(1) == 3L && x.getLong(2) == 3L && x.getDouble(3) == 1.0)
    }
  }

  test("hopDistances: hand-computed BFS with the cap excluding the tail") {
    // path a-b-c-d-e (symmetric), seed {a}, cap 2 → a:0 b:1 c:2; d,e absent
    val e = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b",
      "c" -> "d", "d" -> "c", "d" -> "e", "e" -> "d")
    val s = spark
    import s.implicits._
    val seeds = Seq("a").toDF("id")
    val r = Graph.hopDistances(edges(e), seeds, maxHops = 2)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(r == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("hopDistances: min over multiple seeds and shortcut edges") {
    // seeds {a, e} on the a-b-c-d-e path: c is 2 from both, d is 1 from e
    val e = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b",
      "c" -> "d", "d" -> "c", "d" -> "e", "e" -> "d")
    val s = spark
    import s.implicits._
    val r = Graph.hopDistances(edges(e), Seq("a", "e").toDF("id"), maxHops = 4)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(r == Map("a" -> 0, "e" -> 0, "b" -> 1, "d" -> 1, "c" -> 2))
  }

  test("degreeAssortativity: star graph is exactly -1, regular graph is NULL") {
    // symmetric star a-{b,c,d}: every arc pairs deg 3 with deg 1 → r = −1
    val star = Seq("a" -> "b", "b" -> "a", "a" -> "c", "c" -> "a",
      "a" -> "d", "d" -> "a")
    val r1 = Graph.degreeAssortativity(edges(star)).collect().head
    assert(r1.getAs[Long]("m") == 6L)
    assert(r1.getAs[Double]("assortativity") == -1.0)
    // 3-cycle: all degrees equal → zero variance → undefined, NULL
    val cyc = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b",
      "c" -> "a", "a" -> "c")
    val r2 = Graph.degreeAssortativity(edges(cyc)).collect().head
    assert(r2.isNullAt(r2.fieldIndex("assortativity")))
  }

  test("kCore: tail peels off round by round, triangle core survives") {
    // triangle {1,2,3} with a pendant chain 3-4-5: 2-core = the triangle
    val s = spark
    import s.implicits._
    val p = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    // peel 1 drops 5 (deg 1); peel 2 drops 4 (deg fell to 1); converged
    val r = Graph.kCore(p, k = 2, peels = 3).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("deg")).toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // insufficient peels leave the intermediate fringe — rounds matter
    val r1 = Graph.kCore(p, k = 2, peels = 1).collect().map(_.getAs[Long]("id")).toSet
    assert(r1 == Set(1L, 2L, 3L, 4L))
  }

  test("modularity: two disjoint triangles under their component labels") {
    // m=6; each community: m_c=3, d_c=6 → Q = 2·(3/6 − (6/12)²) = 0.5
    val s = spark
    import s.implicits._
    val p = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("id_a", "id_b")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "canonical")
    val r = Graph.modularity(p, lab).collect().head
    assert(r.getAs[Long]("communities") == 2L)
    assert(r.getAs[Long]("m") == 6L)
    assert(r.getAs[Double]("modularity") == 0.5)
  }

  test("modularity: one community containing every edge scores 1 − (1)² = 0") {
    // single triangle, single label: Q = 3/3 − (6/6)² = 0
    val s = spark
    import s.implicits._
    val p = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "canonical")
    val r = Graph.modularity(p, lab).collect().head
    assert(r.getAs[Double]("modularity") == 0.0)
  }

  test("tradeEdges is symmetric and prefix-disambiguated") {
    val e = Graph.tradeEdges(Tables.orders(spark, sf0001),
      Tables.lineitem(spark, sf0001)).cache()
    try {
      val n = e.count()
      assert(n > 0 && n % 2 == 0)
      // every forward arc has its reverse
      val asym = e.as("x").join(e.as("y"),
        org.apache.spark.sql.functions.col("x.src") === org.apache.spark.sql.functions.col("y.dst") &&
          org.apache.spark.sql.functions.col("x.dst") === org.apache.spark.sql.functions.col("y.src"),
        "left_anti").count()
      assert(asym == 0)
      val badPrefix = e.filter(!org.apache.spark.sql.functions.col("src").rlike("^[cs]\\d+$")).count()
      assert(badPrefix == 0)
    } finally e.unpersist()
  }

  test("pageRank broadcast decision honors autoBroadcastJoinThreshold") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      // 1 MiB budget / 32 B per rank row = 32768 nodes: strictly under
      // broadcasts, at-or-over co-partitions (the threshold is a cap)
      spark.conf.set(key, "1MB")
      assert(Graph.shouldBroadcastRanks(spark, 32767.0))
      assert(!Graph.shouldBroadcastRanks(spark, 32768.0))
      assert(!Graph.shouldBroadcastRanks(spark, 4e6))
      // raising the budget flips the same graph to broadcast
      spark.conf.set(key, "1GB")
      assert(Graph.shouldBroadcastRanks(spark, 4e6))
      // -1 disables broadcast here exactly as it does in the planner
      spark.conf.set(key, "-1")
      assert(!Graph.shouldBroadcastRanks(spark, 10.0))
    } finally spark.conf.set(key, saved)
  }

  /** Two triangles bridged by one edge — the minimal graph with real
    * community structure. Symmetrized distinct edge list (the
    * tradeEdges contract). */
  private def bridgedTriangles: DataFrame = {
    val und = Seq("a" -> "b", "a" -> "c", "b" -> "c",
      "x" -> "y", "x" -> "z", "y" -> "z", "c" -> "x")
    edges(und ++ und.map(_.swap))
  }

  test("labelPropagation: one round, hand-computed closed-neighborhood vote") {
    // init: own label. Round 1 (neighbors + self, all counts 1 → min):
    // a:{b,c,a}→a  b:{a,c,b}→a  c:{a,b,x,c}→a  x:{c,y,z,x}→c
    // y:{x,z,y}→x  z:{x,y,z}→x
    val r = Graph.labelPropagation(bridgedTriangles, rounds = 1)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "c", "y" -> "x", "z" -> "x"))
  }

  test("labelPropagation: converges to one community per triangle") {
    // by round 3 the bridge stops flipping c/x (self-vote + majority):
    // {a,b,c} → a, {x,y,z} → x; round 4 confirms the fixpoint
    val r = Graph.labelPropagation(bridgedTriangles, rounds = 4)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "x"))
    // fixpoint: more rounds change nothing
    val r6 = Graph.labelPropagation(bridgedTriangles, rounds = 6)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r6 == r)
  }

  test("labelPropagation output covers every node exactly once") {
    val out = Graph.labelPropagation(bridgedTriangles, rounds = 2).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c", "x", "y", "z"))
  }
}
