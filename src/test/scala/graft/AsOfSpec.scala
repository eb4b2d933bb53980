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
}
