package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists the engine already produces — the trade
  * graph (customer↔supplier from orders×lineitem) and the verified near-dup
  * pair graph ([[Dedup.minhashNearDupPairs]]).
  *
  * Both operators are join-shaped, never adjacency-matrix-shaped: at 100 TB
  * the edge list is a distributed table and every step below is an
  * equi-join or an aggregation on a key Catalyst can shuffle-partition.
  * The iterative PageRank loop reuses the checkpoint discipline proven in
  * [[Dedup.canonicalComponents]] (lineage truncation per round, in-plan
  * scalar broadcasts, no driver-side collect of node data).
  */
object Graph {

  /** Symmetrized customer↔supplier trade edge list: one directed edge each
    * way per distinct (customer, supplier) pair that traded (orders ⋈
    * lineitem). Keys are prefixed (`c…`/`s…`) because TPC-H custkey and
    * suppkey ranges overlap. The orderkey equi-join shuffles once; the
    * distinct collapses the ~4 lineitems per order before symmetrization
    * doubles rows. */
  def tradeEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
      .distinct()
    pairs.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** Power-iteration PageRank over a directed edge list `(src, dst)`, the
    * fixed-iteration form (deterministic, oracle-replayable — convergence
    * thresholds on floating ranks are engine-noise-sensitive; an iteration
    * count is not).
    *
    * rank₀(v) = 1/N;
    * rankₜ₊₁(v) = (1−d)/N + d·(Σ_{u→v} rankₜ(u)/outdeg(u) + Dₜ/N)
    * where Dₜ is the total rank mass sitting on dangling nodes (no
    * out-edges), redistributed uniformly so Σrank stays 1.
    *
    * Scale shape: the per-iteration cost is ONE equi-join of the edge list
    * (pre-joined once with out-degrees, persisted) against the current
    * rank table plus one aggregation keyed by `dst` — both partition on
    * the node key, so a cluster co-partitions them and the loop reuses the
    * exchange. The dangling mass is a one-row aggregate broadcast back
    * into the plan (never a driver collect), and each round ends in a
    * `localCheckpoint` to truncate lineage (cluster checkpoint at 100 TB),
    * exactly the [[Dedup.canonicalComponents]] discipline. Returns
    * `(id, rank)` with rank ROUND(6)ed (the sum over incoming
    * contributions is order-dependent in the last float bits; rounding is
    * the repo-wide convention for order-dependent double aggregates),
    * ordered rank-descending then id. */
  def pageRank(edges0: DataFrame, iterations: Int = 10,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    val oneMinusD = 1.0 - damping
    val edges = edges0.select(col("src"), col("dst")).distinct()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    // the loop's only repeated scan: edge list pre-joined with source
    // out-degree, persisted once
    val arcs = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("deg")).persist()
    try {
      val nodes = arcs.select(col("src").as("id"))
        .union(arcs.select(col("dst").as("id"))).distinct().localCheckpoint()
      val nAgg = nodes.agg(count(lit(1)).cast("double").as("n"))
      var ranks = nodes.crossJoin(broadcast(nAgg))
        .select(col("id"), (lit(1.0) / col("n")).as("rank")).localCheckpoint()
      var iter = 0
      while (iter < iterations) {
        val contrib = arcs
          .join(ranks.withColumnRenamed("id", "src_id"), col("src") === col("src_id"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("rank") / col("deg")).as("contrib"))
        // dangling = rank mass on nodes with no out-edges; nodes appear in
        // `outdeg` iff they have one, so an anti-join isolates them. One
        // row out — broadcast back into the plan.
        val dangling = ranks
          .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("dang"))
        ranks = nodes
          .join(contrib, Seq("id"), "left")
          .crossJoin(broadcast(nAgg))
          .crossJoin(broadcast(dangling))
          .select(col("id"),
            (lit(oneMinusD) / col("n") + lit(damping) *
              (coalesce(col("contrib"), lit(0.0)) + col("dang") / col("n"))).as("rank"))
          .localCheckpoint()
        iter += 1
      }
      ranks.select(col("id"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("id"))
    } finally arcs.unpersist()
  }

  /** Per-node triangle count, degree, and local clustering coefficient
    * over an undirected pair list — the transitivity audit of a near-dup
    * pair graph (high clustering ⇒ dup components are clique-shaped ⇒
    * collapsing them to one canonical doc, as
    * [[Dedup.canonicalComponents]] does, loses nothing; low clustering ⇒
    * chains of marginal pairs are being glued into one component and the
    * threshold needs raising).
    *
    * Enumeration is degree-oriented (Schank–Wagner): each undirected edge
    * becomes ONE arc from its (deg, id)-smaller endpoint, wedges form by
    * self-joining arcs on the source, and a final equi-join closes them.
    * Orientation bounds every node's wedge fan-out by its oriented
    * out-degree ≤ O(√m) — the difference between a skew-killed self-join
    * on a hub's full degree and a bounded one. Triangle counts are
    * orientation-invariant, so the oracle may enumerate in plain id order
    * and still agree exactly (integers throughout; the only double is the
    * final coefficient, row-level exact). */
  def triangleStats(pairs: DataFrame, idA: String = "id_a",
                    idB: String = "id_b"): DataFrame = {
    val e = pairs
      .select(least(col(idA), col(idB)).as("u"), greatest(col(idA), col(idB)).as("v"))
      .where(col("u") =!= col("v")).distinct().persist()
    try {
      val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("deg")).persist()
      try {
        val du = deg.select(col("id").as("u"), col("deg").as("du"))
        val dv = deg.select(col("id").as("v"), col("deg").as("dv"))
        val uFirst = (col("du") < col("dv")) ||
          (col("du") === col("dv") && col("u") < col("v"))
        // arc src→dst with dst's degree kept for the wedge-order test
        val arcs = e.join(du, "u").join(dv, "v")
          .select(when(uFirst, col("u")).otherwise(col("v")).as("src"),
            when(uFirst, col("v")).otherwise(col("u")).as("dst"),
            when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))
          .persist()
        try {
          val a1 = arcs.select(col("src"), col("dst").as("d1"), col("ddst").as("dd1"))
          val a2 = arcs.select(col("src"), col("dst").as("d2"), col("ddst").as("dd2"))
          val wedges = a1.join(a2, Seq("src"))
            .where((col("dd1") < col("dd2")) ||
              (col("dd1") === col("dd2") && col("d1") < col("d2")))
          // d1 ≺ d2 in orientation order, so a closing edge can only be
          // the arc (d1 → d2): one equi-join, no membership scan
          val tris = wedges
            .join(arcs.select(col("src").as("d1"), col("dst").as("d2")), Seq("d1", "d2"))
            .select(col("src"), col("d1"), col("d2"))
          val perNode = tris
            .select(explode(array(col("src"), col("d1"), col("d2"))).as("id"))
            .groupBy("id").agg(count(lit(1)).as("triangles"))
          deg.join(perNode, Seq("id"), "left")
            .select(col("id"), col("deg"),
              coalesce(col("triangles"), lit(0L)).as("triangles"))
            .withColumn("clustering",
              when(col("deg") >= 2,
                round((col("triangles") * lit(2)).cast("double") /
                  (col("deg") * (col("deg") - 1)).cast("double"), 6))
                .otherwise(lit(0.0)))
            .orderBy("id")
            // materialize before the finally unpersists the inputs the
            // plan still references
            .localCheckpoint()
        } finally arcs.unpersist()
      } finally deg.unpersist()
    } finally e.unpersist()
  }
}
