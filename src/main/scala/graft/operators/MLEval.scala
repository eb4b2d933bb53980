package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators for the quality-gating loop of a
  * training-data pipeline: a corpus gate (reference
  * `sentiment_analysis_fun.py`'s keep/drop decision generalized to any
  * scored filter) is only trustworthy if its score is *measured* against
  * ground truth — AUC for threshold-free ranking power, calibration bins
  * for probability faithfulness, and the confusion matrix / P-R-F1 for
  * the deployed threshold.
  *
  * Scale shapes, in order of the scary one first: exact AUC needs a
  * global cumulative over scores — [[rocAuc]] gets it with a range-
  * bucketed prefix sum (quantile cuts → per-bucket window + broadcast
  * O(buckets) offsets), the [[Analytics.withGlobalRankCuts]] machinery,
  * so no single-partition window ever sees fact rows. Calibration and
  * confusion are plain map-side-combinable aggregations.
  */
object MLEval {

  /** Exact ROC-AUC (+ Gini) of `scoreCol` against binary `labelCol`
    * (1 = positive) via the Mann-Whitney pair-count identity:
    *
    *   AUC = (#{pos > neg} + ½·#{pos = neg}) / (P·N)
    *
    * computed over score *groups* — collapse to (score, p, n) counts,
    * prefix-sum the negatives below each score, then one aggregate:
    * Σ p·negBelow counts the concordant pairs, Σ p·n the ties. This is
    * the average-rank rank-sum AUC, exactly (ties handled by the ½ term),
    * with no per-row global rank.
    *
    * Distinct scores can still be O(rows), so the prefix sum is range-
    * bucketed: quantile cuts assign each score group a bucket, the
    * cumulative runs per-bucket (window partitioned by bucket), and the
    * O(buckets) bucket totals — the only unpartitioned window — are
    * broadcast back as offsets. Pair counts accumulate in DECIMAL(38,0):
    * P·N overflows BIGINT beyond ~3·10⁹ rows per class, well inside
    * 100 TB corpus range.
    *
    * Returns one row `(n_pos, n_neg, auc, gini)`; `auc` is NULL when a
    * class is empty (undefined, not 0.5 — surface it, don't invent it). */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String,
             buckets: Int = 32): DataFrame = {
    val g = scored
      .groupBy(col(scoreCol).cast("double").as("s"))
      .agg(sum(col(labelCol).cast("long")).as("p"),
        sum(lit(1L) - col(labelCol).cast("long")).as("n"))
    // Quantile cuts over the already-collapsed score groups (one pass);
    // degenerate sketches (constant score) fall back to a single bucket —
    // correct, and the frame is one group per distinct score anyway.
    val cuts = g.stat
      .approxQuantile("s", (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
      .distinct.sorted
    val pid = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("s") > lit(c), 1).otherwise(0)
    }
    val withPid = g.withColumn("__pid", pid)
    val localW = Window.partitionBy("__pid").orderBy("s")
    val cum = Window.orderBy("__pid")
    val offsets = withPid.groupBy("__pid").agg(sum(col("n")).as("__bn"))
      .withColumn("__off", coalesce(
        sum(col("__bn")).over(cum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val ranked = withPid
      .withColumn("__ln", coalesce(
        sum(col("n")).over(localW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("neg_below", col("__ln") + col("__off"))
    val dec = "decimal(38,0)"
    ranked.agg(
        sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum((col("p") * col("neg_below")).cast(dec)).as("__conc"),
        sum((col("p") * col("n")).cast(dec)).as("__tied"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("__conc").cast("double") + lit(0.5) * col("__tied").cast("double"))
            / (col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .as("auc"))
      .withColumn("gini", round(lit(2.0) * col("auc") - lit(1.0), 6))
  }

  /** Reliability diagram: equal-width probability bins (`[0,1]` split into
    * `bins`, top edge closed) with per-bin count, mean predicted
    * probability, observed positive rate, and the signed gap — the
    * calibration audit behind an ECE number, kept per-bin so the
    * *direction* of miscalibration is visible. One map-side-combinable
    * aggregation; bin count is a constant, so the result is O(bins). */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val b = least(floor(col(scoreCol).cast("double") * bins).cast("long"),
      lit(bins - 1L))
    scored.groupBy(b.as("bin"))
      .agg(count(lit(1)).as("cnt"),
        round(avg(col(scoreCol).cast("double")), 6).as("mean_score"),
        round(avg(col(labelCol).cast("double")), 6).as("pos_rate"))
      .withColumn("gap", round(col("pos_rate") - col("mean_score"), 6))
      .orderBy("bin")
  }

  /** Thresholded confusion counts plus the derived operating-point
    * metrics, one row: accuracy, precision, recall, F1 at
    * `score >= threshold`. All four cells come from ONE aggregation of
    * boolean products (no 4-way union); divisions guard empty
    * denominators with NULL. */
  def confusionStats(scored: DataFrame, scoreCol: String, labelCol: String,
                     threshold: Double = 0.5): DataFrame = {
    val pred = (col(scoreCol).cast("double") >= lit(threshold)).cast("long")
    val act = col(labelCol).cast("long")
    def ratio(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den.cast("double"), 6))
    scored.agg(
        sum(pred * act).as("tp"), sum(pred * (lit(1L) - act)).as("fp"),
        sum((lit(1L) - pred) * act).as("fn"),
        sum((lit(1L) - pred) * (lit(1L) - act)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        ratio(col("tp") + col("tn"),
          col("tp") + col("fp") + col("fn") + col("tn")).as("accuracy"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("tp") + col("fn")).as("recall"),
        // F1 in the integer form 2tp/(2tp+fp+fn) — algebraically equal to
        // the harmonic mean but a SINGLE division of exact integers, so
        // engine and oracle agree bit-for-bit
        ratio(lit(2L) * col("tp"),
          lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"))
  }
}
