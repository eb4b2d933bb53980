package graft

import org.apache.spark.sql.functions._
import graft.operators.DataQuality
import graft.operators.DataQuality._

class DataQualitySpec extends SparkSpec {

  private def sample() = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alpha", "en", 10L),
      (2L, "beta", "en", 20L),
      (3L, null: String, "xx!", 30L),
      (3L, "gamma", null: String, 40L)
    ).toDF("id", "text", "lang", "n")
  }

  test("validate: full contract report — values, ops, and a mixed pass/fail outcome") {
    val out = DataQuality.validate(sample(), Seq(
      completeness("text", 0.9),       // 3/4 = 0.75 -> FAIL
      uniqueness("id", 1.0),           // 3 distinct / 4 rows -> FAIL
      matchRate("lang", "^[a-z]{2}$", 0.5), // nulls ignored: 2/3 -> PASS
      minOf("n", 5.0),                 // 10 >= 5 -> PASS
      maxOf("n", 35.0),                // 40 <= 35 -> FAIL
      meanOf("n", ">=", 20.0),         // 25 -> PASS
      rowCountAtLeast(4L)              // PASS
    )).collect().map(r => r.getAs[String]("metric") ->
      (r.getAs[Double]("value"), r.getAs[Boolean]("passed"))).toMap
    assert(out("completeness(text)") == ((0.75, false)))
    assert(out("uniqueness(id)") == ((0.75, false)))
    assert(out("match_rate(lang)")._1 == 0.666667) // rounded to 6
    assert(out("match_rate(lang)")._2)
    assert(out("min(n)") == ((10.0, true)))
    assert(out("max(n)") == ((40.0, false)))
    assert(out("mean(n)") == ((25.0, true)))
    assert(out("row_count") == ((4.0, true)))
  }

  test("validate: the whole suite is ONE aggregate over the input (single scan)") {
    val plan = DataQuality.validate(sample(), Seq(
      completeness("text", 0.9), minOf("n", 5.0), maxOf("n", 35.0),
      meanOf("n", ">=", 20.0), rowCountAtLeast(4L)
    )).queryExecution.optimizedPlan
    val nAggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAggs == 1, s"expected 1 Aggregate, got $nAggs:\n$plan")
  }

  test("uniquenessApprox: sketch check agrees with exact on a clean key") {
    val s = spark
    import s.implicits._
    val df = (1L to 500L).toDF("id")
    val out = DataQuality.validate(df, Seq(uniquenessApprox("id", 0.9)))
      .collect()(0)
    assert(out.getAs[Boolean]("passed"),
      s"approx uniqueness ${out.getAs[Double]("value")} under 0.9 on a unique key")
  }

  test("validate: empty contract and bad op are rejected") {
    intercept[IllegalArgumentException] {
      DataQuality.validate(sample(), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Expectation("x", lit(1.0), "==", 1.0)
    }
  }

  test("psiDrift: identical distributions give PSI 0; a shift is detected and bounded") {
    val s = spark
    import s.implicits._
    val base = (1 to 400).map(i => i % 100).toDF("x")
    // identical window -> every bin rate matches -> PSI exactly 0
    val same = DataQuality.psiDrift(base, base, "x", bins = 10).collect()
    assert(same.length == 10)
    assert(same.forall(_.getAs[Double]("psi_term") == 0.0))
    assert(same.head.getAs[Double]("psi_total") == 0.0)
    // shifted window: mass moves to the top bins -> PSI clearly > 0.25
    val shifted = (1 to 400).map(i => i % 100 + 60).toDF("x")
    val drift = DataQuality.psiDrift(base, shifted, "x", bins = 10).collect()
    val total = drift.head.getAs[Double]("psi_total")
    assert(total > 0.25, s"expected actionable drift, got $total")
    assert(drift.forall(r => r.getAs[Double]("psi_total") == total)) // repeated
    // bucket rates each sum to 1 (pre-rounding tolerance)
    assert(math.abs(drift.map(_.getAs[Double]("base_rate")).sum - 1.0) < 1e-4)
    assert(math.abs(drift.map(_.getAs[Double]("cur_rate")).sum - 1.0) < 1e-4)
  }

  test("psiDrift: a bin emptied in the current window still yields a finite term") {
    val s = spark
    import s.implicits._
    val base = (1 to 100).toDF("x")
    val cur = (51 to 100).toDF("x") // bottom half gone
    val out = DataQuality.psiDrift(base, cur, "x", bins = 4).collect()
    assert(out.forall(r => !r.getAs[Double]("psi_term").isNaN &&
      !r.getAs[Double]("psi_term").isInfinite))
    assert(out.head.getAs[Double]("psi_total") > 0.0)
  }

  test("psiDrift: NULL values are excluded, not counted as the bottom bin") {
    val s = spark
    import s.implicits._
    val base = (1 to 100).map(i => Some(i)).toDF("x")
    // same distribution + a flood of nulls: if nulls landed in bucket 0
    // the current window's bottom-bin rate would explode and PSI with it
    val cur = ((1 to 100).map(i => Some(i)) ++ Seq.fill(300)(Option.empty[Int]))
      .toDF("x")
    val out = DataQuality.psiDrift(base, cur, "x", bins = 4).collect()
    assert(out.length == 4)
    assert(out.head.getAs[Double]("psi_total") == 0.0)
    // counts prove the nulls never entered the rate denominators
    assert(out.map(_.getAs[Long]("n_cur")).sum == 100L)
  }

  test("columnProfile: null accounting, exact distincts, typed min/max rendered as strings") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("b")), (2L, Some("a")), (3L, None), (3L, Some("a")))
      .toDF("k", "v")
    val out = DataQuality.columnProfile(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6)))).toMap
    assert(out("k") == ((4L, 4L, 0L, 3L, "1", "3")))
    assert(out("v") == ((4L, 3L, 1L, 2L, "a", "b"))) // null not a distinct value
  }

  test("benfordAudit: digits from cents strings, fractions sum to 1, nulls/non-positives excluded") {
    val s = spark
    import s.implicits._
    // 1.23 -> 123 cents -> digit 1; 0.05 -> 5 -> digit 5; 250.0 -> 25000
    // -> digit 2; 9.995 pins the DOUBLE-representation truth: the literal
    // stores as 9.99499999…, so half-up cents give 999, digit 9 (both
    // engines agree because both run the same double arithmetic — the
    // convention trades the decimal illusion for bit-exact parity).
    // null/zero/negative are excluded
    val df = Seq(Some(1.23), Some(9.995), Some(0.05), Some(250.0),
      None, Some(0.0), Some(-4.2)).toDF("v")
    val out = DataQuality.benfordAudit(df, col("v")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1, 2, 5, 9))
    assert(out(1)._1 == 1L && out(2)._1 == 1L && out(5)._1 == 1L && out(9)._1 == 1L)
    assert(out(1)._2 == 0.25 && out(2)._2 == 0.25)
    // expectation column is the Benford mass (log10(2) for digit 1)
    val e1 = DataQuality.benfordAudit(df, col("v")).collect()
      .find(_.getInt(0) == 1).get.getDouble(3)
    assert(e1 == math.round(math.log10(2.0) * 1e6) / 1e6)
  }

  test("tCloseness: hand-computed TVD, absent values contribute global mass") {
    val s = spark
    import s.implicits._
    // global: a 6/20 = .3, b 14/20 = .7.
    // X (3a, 1b): tvd = .5*(|.75-.3| + |.25-.7|) = .45 -> at risk
    // Y (6b, a ABSENT): tvd = .5*(|1-.7| + .3 unclaimed global a mass) = .3
    // Z (3a, 7b) mirrors the global distribution exactly: tvd = 0
    val df = (Seq.fill(3)(("X", "a")) ++ Seq(("X", "b")) ++
      Seq.fill(6)(("Y", "b")) ++
      Seq.fill(3)(("Z", "a")) ++ Seq.fill(7)(("Z", "b")))
      .toDF("cls", "sens")
    val out = DataQuality.tCloseness(df, Seq("cls" -> col("cls")),
        col("sens"), t = 0.2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out("X") == ((4L, 0.45, true)))
    assert(out("Y") == ((6L, 0.3, true)))
    assert(out("Z") == ((10L, 0.0, false)))
  }

  test("simulatedDpCounts: noise matches the hand-computed Laplace quantile, release clamps at 0") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(3)("A") ++ Seq.fill(5)("B")).toDF("src")
    // replicate the seeded inverse-CDF on the JVM side
    def lap(key: String, eps: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp:$key".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 1.152921504606846976e18
      val x = -(1.0 / eps) * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      math.round(x * 1e6) / 1e6
    }
    val out = DataQuality.simulatedDpCounts(df, "src", epsilon = 0.5, seed = "dp:")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out("A")._1 == 3L && out("B")._1 == 5L)
    assert(out("A")._2 == lap("A", 0.5))
    assert(out("B")._2 == lap("B", 0.5))
    assert(out.values.forall(_._3 >= 0L)) // clamp
    assert(out("A")._3 == math.max(0L, math.floor(3 + lap("A", 0.5) + 0.5).toLong))
    // determinism: a second run releases the identical values
    val again = DataQuality.simulatedDpCounts(df, "src", epsilon = 0.5, seed = "dp:")
      .collect().map(r => r.getLong(3)).toSeq
    assert(again == out.toSeq.sortBy(_._1).map(_._2._3))
  }

  test("snapshotDiff: added, removed, changed, unchanged all counted per group") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "a", "same"), (2L, "a", "old"), (3L, "b", "gone"))
      .toDF("doc_id", "source", "text")
    val cur = Seq(
      (1L, "a", "same"),   // unchanged
      (2L, "a", "new"),    // changed
      (4L, "b", "fresh"))  // added; 3 removed
      .toDF("doc_id", "source", "text")
    val rep = DataQuality.snapshotDiff(base, cur, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rep("a") == ((0L, 0L, 1L, 1L))) // added, removed, changed, unchanged
    assert(rep("b") == ((1L, 1L, 0L, 0L)))
  }

  test("embeddingDrift: hand-computed per-dim means, L1 and cosine verdicts") {
    val s = spark
    import s.implicits._
    val base = Seq((0L, Seq(1.0, 0.0)), (2L, Seq(3.0, 0.0))).toDF("vec_id", "v")
    val cur = Seq((1L, Seq(2.0, 2.0)), (3L, Seq(2.0, 4.0))).toDF("vec_id", "v")
    val out = DataQuality.embeddingDrift(base, cur, "v").orderBy("dim").collect()
    // means: base (2, 0), cur (2, 3); drift (0, 3); L1 = 3
    assert(out.map(_.getAs[Double]("mean_a")).toSeq == Seq(2.0, 0.0))
    assert(out.map(_.getAs[Double]("mean_b")).toSeq == Seq(2.0, 3.0))
    assert(out.map(_.getAs[Double]("drift")).toSeq == Seq(0.0, 3.0))
    assert(out.head.getAs[Double]("l1_drift") == 3.0)
    // cos((2,0),(2,3)) = 4 / (2 * sqrt(13))
    assert(math.abs(out.head.getAs[Double]("cos_shift")
      - 4.0 / (2.0 * math.sqrt(13.0))) < 1e-6)
  }

  test("lDiversity: classes below l distinct sensitive values flag at_risk") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1, "s1"), ("a", 1, "s2"), ("a", 1, "s1"), // class (a,1): 2 distinct
      ("b", 2, "s1"), ("b", 2, "s1")                  // class (b,2): 1 distinct
    ).toDF("g", "h", "sens")
    val out = DataQuality.lDiversity(df,
      Seq("g" -> col("g"), "h" -> col("h")), col("sens"), l = 2).collect()
    val byKey = out.map(r => (r.getAs[String]("g"),
      r.getAs[Long]("class_size"), r.getAs[Long]("distinct_sensitive"),
      r.getAs[Boolean]("at_risk"))).toSeq
    assert(byKey == Seq(("a", 3L, 2L, false), ("b", 2L, 1L, true)))
  }
}
