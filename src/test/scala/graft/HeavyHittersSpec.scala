package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {

  test("exactHeavyHitters equals the naive GROUP BY .. HAVING on skewed data") {
    val s = spark
    import s.implicits._
    // deterministic zipf-ish stream: item i appears ~ 4000/i times
    val items = (1 to 50).flatMap(i => Seq.fill(4000 / i)(s"item$i"))
    // fixed shuffle so heavy items straddle partition boundaries
    val df = items.sortBy(x => (x.hashCode * 2654435761L).toInt)
      .toDF("item").repartition(8)
    val k = 10
    val fast = HeavyHitters.exactHeavyHitters(df, "item", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val n = items.size
    val naive = items.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c.toDouble > n.toDouble / k }
      .sortBy { case (w, c) => (-c, w) }
      .map { case (w, c) => (w, c) }
    assert(fast.toSeq == naive)
    assert(fast.nonEmpty) // the test would be vacuous on an empty result
  }

  test("Misra-Gries candidates form a superset even with an adversarial partition layout") {
    val s = spark
    import s.implicits._
    val k = 5
    // one item at exactly n/k + 1 occurrences spread evenly over many
    // partitions (each partition sees it mixed with distinct noise)
    val hot = Seq.fill(41)("hot")
    val noise = (1 to 159).map(i => s"n$i")
    val df = (hot ++ noise).zipWithIndex
      .sortBy(_._2 % 16).map(_._1).toDF("item").repartition(16)
    val out = HeavyHitters.exactHeavyHitters(df, "item", k).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("hot"))
    assert(out.head.getLong(1) == 41L)
  }

  test("no false positives: sub-threshold candidates are filtered by the exact pass") {
    val s = spark
    import s.implicits._
    // everything below threshold -> empty result even though MG emits candidates
    val df = (1 to 100).map(i => s"x${i % 20}").toDF("item").repartition(4)
    assert(HeavyHitters.exactHeavyHitters(df, "item", 3).count() == 0)
  }
}
