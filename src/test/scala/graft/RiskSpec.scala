package graft

import graft.operators.Risk

/** F11/A11 golden tests, hand-computed from the reference formula
  * (ref `insurance_calculator.py:13-243`). */
class RiskSpec extends SparkSpec {

  private def trendsDf(rows: Seq[(String, Long, Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("date", "positive", "negative", "neutral", "total")
  }

  test("A11 trend multiplier: significant deterioration → 1.4") {
    // 30 days: recent 14 days 20% negative, previous 14 days 10% → ratio
    // 2.0 > 1.5 → 1.4
    val rows = (1 to 30).map { d =>
      val date = f"2024-01-$d%02d"
      if (d > 16) (date, 8L, 2L, 0L, 10L) else (date, 9L, 1L, 0L, 10L)
    }
    val r = Risk.trendRisk(trendsDf(rows)).collect()(0)
    assert(r.getAs[Double]("trend_multiplier") == 1.4)
    assert(r.getAs[String]("trend_status") == "Significantly deteriorating")
  }

  test("A11 trend multiplier: improvement → 0.9") {
    val rows = (1 to 30).map { d =>
      val date = f"2024-01-$d%02d"
      if (d > 16) (date, 10L, 0L, 0L, 10L) else (date, 8L, 2L, 0L, 10L)
    }
    assert(Risk.trendRisk(trendsDf(rows)).collect()(0)
      .getAs[Double]("trend_multiplier") == 0.9)
  }

  test("A11 trend multiplier: short history with 3-day spike → 1.3") {
    val rows = (1 to 10).map { d =>
      val date = f"2024-01-$d%02d"
      if (d > 7) (date, 5L, 5L, 0L, 10L) else (date, 10L, 0L, 0L, 10L)
    }
    assert(Risk.trendRisk(trendsDf(rows)).collect()(0)
      .getAs[Double]("trend_multiplier") == 1.3)
  }

  test("A11 trend multiplier: under 7 days of data → 1.0") {
    val rows = (1 to 5).map(d => (f"2024-01-$d%02d", 0L, 10L, 0L, 10L))
    assert(Risk.trendRisk(trendsDf(rows)).collect()(0)
      .getAs[Double]("trend_multiplier") == 1.0)
  }

  test("F11 insurance risk golden case") {
    val s = spark
    import s.implicits._
    // 8 POSITIVE / 1 NEGATIVE / 1 NEUTRAL, all confidence 0.9:
    //   sentMult = (1 + 0.1*2.5 + 0.1*0.5) * 0.95 (posR 0.8 > 0.75) = 1.2350
    //   confMult = 1.5 - 0.9*0.5 = 1.05 ; sampleMult = 1.3 (n<50); trend 1.0
    //   cost = 5000 * 1.235 * 1.05 * 1.3 = 8428.88 (rounded)
    //   score = 0.1*200 + 0 + 0 + (100-10)/10 + 0 = 29 → Low
    val scored = (Seq.fill(8)("POSITIVE") ++ Seq("NEGATIVE", "NEUTRAL"))
      .map(sent => (sent, 0.9)).toDF("sentiment", "confidence")
    val trends = trendsDf(Seq(("2024-01-01", 1L, 0L, 0L, 1L), ("2024-01-02", 1L, 0L, 0L, 1L)))
    val r = Risk.insuranceRisk(scored, trends).collect()(0)
    assert(r.getAs[Double]("insurance_cost") == 8428.88)
    assert(r.getAs[Long]("risk_score") == 29L)
    assert(r.getAs[String]("risk_level") == "Low")
    // 1.3 * 0.95 in doubles is 1.2349999999999999 → rounds to 1.23 (the
    // DuckDB oracle computes the identical double and agrees)
    assert(r.getAs[Double]("sentiment_multiplier") == 1.23)
    assert(r.getAs[Double]("confidence_multiplier") == 1.05)
    assert(r.getAs[Double]("sample_multiplier") == 1.3)
    assert(r.getAs[String]("trend_status") == "Stable")
  }
}
