package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {

  test("as-of join: most recent at-or-before match per key, null when none") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 300L), // user 10
      (4L, 20L, 150L),                                   // user 20: no match
      (5L, 30L, 200L))                                   // user 30: equal-ts match
      .toDF("event_id", "user_id", "us")
    val right = Seq(
      (10L, 100L), (10L, 200L), (10L, 400L), // user 10 purchases
      (30L, 200L))                           // user 30 purchase at equal ts
      .toDF("user_id", "us")
    val out = AsOf.asOfJoin(left, right, "user_id", "us", col("us"), "asof_us")
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"),
        if (r.isNullAt(r.fieldIndex("asof_us"))) -1L else r.getAs[Long]("asof_us")))
    assert(out.toSeq == Seq(
      (1L, 100L),  // equal ts matches (<=)
      (2L, 200L),  // most recent prior, not the later 400
      (3L, 200L),
      (4L, -1L),   // no right rows for key
      (5L, 200L))) // equal ts on a different key
  }

  test("as-of join: struct payload carrying non-time right-side columns") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 300L)).toDF("event_id", "user_id", "us")
    val right = Seq((10L, 50L, 9.99), (10L, 200L, 19.99)).toDF("user_id", "us", "price")
    val out = AsOf.asOfJoin(left, right, "user_id", "us",
      struct(col("us").as("t"), col("price")), "last_purchase")
      .orderBy("event_id").collect()
    assert(out(0).getStruct(out(0).fieldIndex("last_purchase")).getDouble(1) == 9.99)
    assert(out(1).getStruct(out(1).fieldIndex("last_purchase")).getDouble(1) == 19.99)
  }

  test("as-of join: user columns named like the internals survive; map payload joins") {
    val s = spark
    import s.implicits._
    // user columns deliberately named like the operator's internals — the
    // round-3 implementation clobbered same-named columns
    val left = Seq((1L, 10L, 100L, "keep-tag", "keep-pl"))
      .toDF("event_id", "user_id", "us", "__asof_tag", "__asof_pl")
    val right = Seq((10L, 50L, 7L)).toDF("user_id", "us", "amount")
    val out = AsOf.asOfJoin(left, right, "user_id", "us", col("amount"), "asof_amount")
      .collect()(0)
    assert(out.getAs[String]("__asof_tag") == "keep-tag")
    assert(out.getAs[String]("__asof_pl") == "keep-pl")
    assert(out.getAs[Long]("asof_amount") == 7L)
    // non-orderable payload (map type): analysis used to fail because the
    // window sorted by the payload; now the tiebreak is skipped
    val right2 = Seq((10L, 50L)).toDF("user_id", "us")
      .withColumn("m", map(lit("k"), lit(1)))
    val out2 = AsOf.asOfJoin(left.select("event_id", "user_id", "us"), right2,
      "user_id", "us", col("m"), "asof_m").collect()(0)
    assert(out2.getAs[Map[String, Int]]("asof_m") == Map("k" -> 1))
  }

  test("as-of join: single shuffle, no join operator in the plan") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "us")
    val right = Seq((10L, 50L)).toDF("user_id", "us")
    val plan = AsOf.asOfJoin(left, right, "user_id", "us", col("us"), "asof_us")
      .queryExecution.executedPlan.toString
    // the union-tag formulation must not degenerate into any join
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("interpJoin: midpoint lerp, edge fills, exact-time match, no-obs null") {
    val s = spark
    import s.implicits._
    // user 1: purchases at t=100 (v=10) and t=200 (v=30)
    //   clicks at 150 (midpoint -> 20), 100 (exact -> 10), 50 (before -> 10),
    //   250 (after -> 30), 175 (quarter -> 25)
    // user 2: no purchases -> null
    val clicks = Seq((1L, 1L, 150L), (2L, 1L, 100L), (3L, 1L, 50L),
      (4L, 1L, 250L), (5L, 1L, 175L), (6L, 2L, 150L))
      .toDF("event_id", "user_id", "us")
    val purchases = Seq((1L, 100L, 10.0), (1L, 200L, 30.0))
      .toDF("user_id", "us", "value")
    val out = AsOf.interpJoin(clicks, purchases, "user_id", "us", "value",
        "iv")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L).contains(20.0))
    assert(out(2L).contains(10.0))
    assert(out(3L).contains(10.0))
    assert(out(4L).contains(30.0))
    assert(out(5L).contains(25.0))
    assert(out(6L).isEmpty)
  }

  test("interpJoin: union-tag plan, no join operator") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "us")
    val right = Seq((1L, 5L, 1.0)).toDF("user_id", "us", "value")
    val plan = AsOf.interpJoin(left, right, "user_id", "us", "value", "iv")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }
}
