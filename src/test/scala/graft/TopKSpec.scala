package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.TopK

class TopKSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("heap top-k == window row_number top-k on random multi-partition data") {
    val s = spark
    import s.implicits._
    val rows = samples(for {
      g <- Gen.oneOf("a", "b", "c")
      id <- Gen.chooseNum(1L, 100000L)
      sc <- Gen.oneOf(0.1, 0.25, 0.25, 0.5, 0.9) // deliberate score ties
    } yield (g, id, sc), 400).distinct
    val df = rows.toDF("g", "id", "score").repartition(13)
    val viaHeap = df.groupBy("g")
      .agg(TopK.topKByScore(col("score"), col("id"), col("id"), 7).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col").as("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select(col("g"), (col("rn") - 1).cast("int"), col("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaHeap == viaWindow)
    assert(viaHeap.nonEmpty)
  }

  test("struct payloads, k larger than group, null scores skipped") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1L, Some(0.9)), ("a", 2L, Some(0.8)), ("a", 3L, None),
      ("b", 4L, Some(0.5))).toDF("g", "id", "score")
      .select(col("g"), col("id"), col("score").cast("double").as("score"))
    val out = df.groupBy("g")
      .agg(TopK.topKByScore(col("score"), col("id"),
        struct(col("id"), col("score")), 10).as("top"))
      .select(col("g"), col("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getDouble(1))))
      .toMap
    assert(out("a") == Seq((1L, 0.9), (2L, 0.8))) // null-score row 3 dropped
    assert(out("b") == Seq((4L, 0.5)))
  }

  test("heap: NaN and signed-zero scores are arrival-order independent") {
    import graft.plans.TopKHeap
    // NaN compares greater than everything under Double.compare (Spark's
    // ORDER BY relation); -0.0 < 0.0. The round-3 offer() used primitive
    // >/== which disagrees on both, making full-heap admission depend on
    // arrival order.
    val vals = Seq((Double.NaN, 1L), (1.0, 2L), (2.0, 3L), (-0.0, 4L),
      (0.0, 5L), (Double.NaN, 6L), (3.0, 7L))
    def run(order: Seq[(Double, Long)]): Seq[Any] = {
      val h = new TopKHeap(3)
      order.foreach { case (sc, t) => h.offer(sc, t, t) }
      h.sortedPayloads.toSeq
    }
    val expect = run(vals)
    assert(expect == Seq(1L, 6L, 7L)) // NaN (tie 1,6) then 3.0
    vals.permutations.take(120).foreach(p => assert(run(p) == expect, p))
    // -0.0 vs 0.0 at the admission boundary: tiebreak must apply
    val zeros = Seq((0.0, 9L), (-0.0, 1L), (0.0, 2L))
    def runZ(order: Seq[(Double, Long)]): Seq[Any] = {
      val h = new TopKHeap(2)
      order.foreach { case (sc, t) => h.offer(sc, t, t) }
      h.sortedPayloads.toSeq
    }
    val zExpect = runZ(zeros)
    assert(zExpect == Seq(2L, 9L)) // 0.0 > -0.0; ties by id ASC
    zeros.permutations.foreach(p => assert(runZ(p) == zExpect, p))
  }

  test("SQL registration: graft_top_k usable from pure SQL") {
    val s = spark
    import s.implicits._
    Seq(("a", 1L, 0.9), ("a", 2L, 0.7), ("a", 3L, 0.8))
      .toDF("g", "id", "score").createOrReplaceTempView("topk_sql_in")
    val out = spark.sql(
      "SELECT g, graft_top_k(score, id, id, 2) AS top FROM topk_sql_in GROUP BY g")
      .collect()(0)
    assert(out.getSeq[Long](1) == Seq(1L, 3L))
  }

  test("plans as ObjectHashAggregate with a partial stage (map-side heaps)") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L, 0.5)).toDF("g", "id", "score").repartition(3)
      .groupBy("g")
      .agg(TopK.topKByScore(col("score"), col("id"), col("id"), 3).as("top"))
    df.collect()
    val plan: SparkPlan = df.queryExecution.executedPlan
    val str = plan.toString
    assert(str.contains("ObjectHashAggregate"), str.take(2000))
    assert(str.contains("partial_graft_top_k") || str.contains("partial"), str.take(2000))
  }
}
