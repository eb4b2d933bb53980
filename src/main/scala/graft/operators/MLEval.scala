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
  *
  * MATERIALIZATION CONTRACT (applies to every operator here — and in
  * [[Dedup]]/[[Analytics]]/[[Similarity]]/[[TextAnalysis]] — that returns
  * `localCheckpoint(eager = true)`): the returned frame is EAGERLY
  * EXECUTED at call time and its lineage is truncated to local
  * (non-replicated) blocks. That is deliberate — these operators persist
  * intermediates internally and must release them before returning, so
  * the result cannot keep a lazy plan over freed caches — but it means
  * (a) callers do not get lazy composition: filters composed on top do
  * not push into the operator, and (b) on a real cluster an executor
  * loss makes the result unrecoverable (re-run the operator; at 100 TB
  * use `spark.checkpoint` storage instead). Operators without an
  * internal persist stay lazy as usual.
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
    // persist: the quantile sketch action below materializes the grouped
    // frame and the main query reuses it instead of re-running the full
    // scoring pass. The 1-row result is localCheckpoint'ed so the persist
    // can be RELEASED before returning (the triangleStats discipline — a
    // long-lived session must not accumulate cached blocks per call).
    g.persist()
    try {
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
        .localCheckpoint(eager = true)
    } finally g.unpersist()
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

  /** Expected / maximum calibration error over the [[calibrationBins]]
    * frame: ECE = Σ (cnt/N)·|gap|, MCE = max|gap| — the two numbers a
    * model card quotes, computed from the PUBLISHED (rounded) bin stats
    * so the summary always reconciles with the table it summarizes (the
    * clusterStats rounded-inputs convention). One O(bins) aggregation
    * over an already-aggregated frame. */
  def calibrationError(scored: DataFrame, scoreCol: String, labelCol: String,
                       bins: Int = 10): DataFrame =
    calibrationBins(scored, scoreCol, labelCol, bins)
      .agg(sum(col("cnt")).as("n"),
        round(sum(col("cnt").cast("double") * abs(col("gap")))
          / sum(col("cnt").cast("double")), 6).as("ece"),
        max(abs(col("gap"))).as("mce"))

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

  /** Per-group [[rocAuc]]: one AUC row per `keyCol` value — the audit
    * that catches a gate scoring well in aggregate while failing one
    * domain (the per-source gate-quality dashboard). Same rank-sum
    * identity and bucket machinery, with every window additionally
    * partitioned by the key: local cumulatives on (key, bucket), bucket
    * offsets cumulated per key, totals joined back on the key (an
    * equi-join — AQE broadcasts the O(keys) side at runtime). Quantile
    * cuts are computed once globally: per-key bucketing correctness
    * doesn't depend on the cut placement, only the prefix-sum algebra. */
  def rocAucBy(scored: DataFrame, keyCol: String, scoreCol: String,
               labelCol: String, buckets: Int = 32): DataFrame = {
    val g = scored
      .groupBy(col(keyCol).as("k"), col(scoreCol).cast("double").as("s"))
      .agg(sum(col(labelCol).cast("long")).as("p"),
        sum(lit(1L) - col(labelCol).cast("long")).as("n"))
    g.persist() // released in finally; result localCheckpoint'ed (O(keys))
    try {
      val cuts = g.stat
        .approxQuantile("s", (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .distinct.sorted
      val pid = cuts.foldLeft(lit(0)) { (acc, c) =>
        acc + when(col("s") > lit(c), 1).otherwise(0)
      }
      val withPid = g.withColumn("__pid", pid)
      val localW = Window.partitionBy("k", "__pid").orderBy("s")
      val cum = Window.partitionBy("k").orderBy("__pid")
      val offsets = withPid.groupBy("k", "__pid").agg(sum(col("n")).as("__bn"))
        .withColumn("__off", coalesce(
          sum(col("__bn")).over(cum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("k", "__pid", "__off")
      val ranked = withPid
        .withColumn("__ln", coalesce(
          sum(col("n")).over(localW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .join(offsets, Seq("k", "__pid"))
        .withColumn("neg_below", col("__ln") + col("__off"))
      val dec = "decimal(38,0)"
      ranked.groupBy("k")
        .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
          sum((col("p") * col("neg_below")).cast(dec)).as("__conc"),
          sum((col("p") * col("n")).cast(dec)).as("__tied"))
        .select(col("k").as(keyCol), col("n_pos"), col("n_neg"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            round((col("__conc").cast("double") + lit(0.5) * col("__tied").cast("double"))
              / (col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
            .as("auc"))
        .withColumn("gini", round(lit(2.0) * col("auc") - lit(1.0), 6))
        .orderBy(keyCol)
        .localCheckpoint(eager = true)
    } finally g.unpersist()
  }

  /** Kolmogorov-Smirnov separation of the two score distributions:
    * D = max over scores of |CDF_pos − CDF_neg|, with the score where the
    * max is first attained (`ks_score`, min-score tie-break). The
    * threshold-free "how separable are the classes at the best single
    * cut" companion to [[rocAuc]] — credit-scoring's standard statistic.
    *
    * Same scale frame as AUC: collapse to score groups, inclusive
    * cumulatives of p and n via the range-bucketed prefix sum, then the
    * CDFs are exact integer/integer divisions — every per-group diff is
    * bit-identical across engines, so the argmax needs no rounding
    * epsilon. Two single-row broadcasts (totals, max-diff) close it. */
  def ksStatistic(scored: DataFrame, scoreCol: String, labelCol: String,
                  buckets: Int = 32): DataFrame = {
    val g = scored
      .groupBy(col(scoreCol).cast("double").as("s"))
      .agg(sum(col(labelCol).cast("long")).as("p"),
        sum(lit(1L) - col(labelCol).cast("long")).as("n"))
    g.persist() // released in finally; 1-row result localCheckpoint'ed
    try {
      val cuts = g.stat
        .approxQuantile("s", (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .distinct.sorted
      val pid = cuts.foldLeft(lit(0)) { (acc, c) =>
        acc + when(col("s") > lit(c), 1).otherwise(0)
      }
      val withPid = g.withColumn("__pid", pid)
      val localW = Window.partitionBy("__pid").orderBy("s")
      val cum = Window.orderBy("__pid")
      val offsets = withPid.groupBy("__pid")
        .agg(sum(col("p")).as("__bp"), sum(col("n")).as("__bn"))
        .withColumn("__offp", coalesce(
          sum(col("__bp")).over(cum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("__offn", coalesce(
          sum(col("__bn")).over(cum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("__pid", "__offp", "__offn")
      val incl = localW.rowsBetween(Window.unboundedPreceding, 0)
      val totals = g.agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"))
      val diffs = withPid
        .withColumn("__lp", sum(col("p")).over(incl))
        .withColumn("__ln", sum(col("n")).over(incl))
        .join(broadcast(offsets), Seq("__pid"))
        .crossJoin(broadcast(totals))
        .withColumn("__diff", when(col("n_pos") > 0 && col("n_neg") > 0, abs(
          (col("__lp") + col("__offp")).cast("double") / col("n_pos").cast("double")
            - (col("__ln") + col("__offn")).cast("double") / col("n_neg").cast("double"))))
        .select(col("s"), col("__diff"))
        // consumed twice (the max probe's broadcast + the argmin filter);
        // without the materialization both executions re-ran the bucketed
        // prefix-sum windows (round 16, guide §2.4). O(distinct scores).
        .transform(Iter.checkpoint)
      val mx = diffs.agg(max(col("__diff")).as("__ks"))
      diffs.crossJoin(broadcast(mx))
        .filter(col("__diff") === col("__ks"))
        .agg(min(col("s")).as("ks_score"), max(col("__ks")).as("__ksv"))
        .crossJoin(broadcast(totals))
        .select(col("n_pos"), col("n_neg"),
          round(col("__ksv"), 6).as("ks"), col("ks_score"))
        .localCheckpoint(eager = true)
    } finally g.unpersist()
  }

  /** Full precision-recall curve: one row per distinct score threshold
    * (predict positive at `score >= threshold`), with the confusion
    * counts and precision/recall/F1 at that cut — the operating-curve
    * companion to [[rocAuc]]'s single number, and the artifact a gate
    * owner actually reads to pick the deployed threshold.
    *
    * Same bucketed-prefix-sum frame as [[ksStatistic]]: inclusive
    * ascending cumulatives convert to suffix counts by subtraction
    * (tp at s = P − cum_p(<s)), so every cell is an exact integer and
    * every metric a single exact-operand division — bit-identical
    * across engines with no rounding epsilon. Output is O(distinct
    * scores), already reduced. */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String,
              buckets: Int = 32): DataFrame = {
    val g = scored
      .groupBy(col(scoreCol).cast("double").as("threshold"))
      .agg(sum(col(labelCol).cast("long")).as("p"),
        sum(lit(1L) - col(labelCol).cast("long")).as("n"))
    g.persist() // released in finally; O(distinct scores) result
    // localCheckpoint'ed — already the reduced curve, not fact rows
    try {
      val cuts = g.stat
        .approxQuantile("threshold",
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .distinct.sorted
      val pid = cuts.foldLeft(lit(0)) { (acc, c) =>
        acc + when(col("threshold") > lit(c), 1).otherwise(0)
      }
      val withPid = g.withColumn("__pid", pid)
      val localW = Window.partitionBy("__pid").orderBy("threshold")
      val cum = Window.orderBy("__pid")
      val offsets = withPid.groupBy("__pid")
        .agg(sum(col("p")).as("__bp"), sum(col("n")).as("__bn"))
        .withColumn("__offp", coalesce(
          sum(col("__bp")).over(cum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("__offn", coalesce(
          sum(col("__bn")).over(cum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("__pid", "__offp", "__offn")
      val incl = localW.rowsBetween(Window.unboundedPreceding, 0)
      val totals = g.agg(sum(col("p")).as("__tp_all"), sum(col("n")).as("__tn_all"))
      def ratio(num: Column, den: Column): Column =
        when(den > 0, num.cast("double") / den.cast("double"))
      withPid
        .withColumn("__cp", sum(col("p")).over(incl))
        .withColumn("__cn", sum(col("n")).over(incl))
        .join(broadcast(offsets), Seq("__pid"))
        .crossJoin(broadcast(totals))
        // score >= threshold ⇔ NOT strictly below ⇔ total − exclusive-cum
        .withColumn("tp", col("__tp_all") - (col("__cp") + col("__offp") - col("p")))
        .withColumn("fp", col("__tn_all") - (col("__cn") + col("__offn") - col("n")))
        .select(col("threshold"), col("tp"), col("fp"),
          ratio(col("tp"), col("tp") + col("fp")).as("precision"),
          ratio(col("tp"), col("__tp_all")).as("recall"),
          ratio(lit(2L) * col("tp"),
            col("tp") + col("fp") + col("__tp_all")).as("f1"))
        .orderBy("threshold")
        .localCheckpoint(eager = true)
    } finally g.unpersist()
  }

  /** Cohen's kappa between the thresholded prediction and the label —
    * chance-corrected agreement, the honest twin of raw accuracy on an
    * imbalanced gate. All cells and marginals are exact integers
    * (DECIMAL(38,0) products — n² overflows BIGINT past ~3·10⁹ rows), so
    * p_o, p_e, and kappa are a fixed sequence of IEEE ops, identical on
    * both engines before the final ROUND(6). */
  def cohensKappa(scored: DataFrame, scoreCol: String, labelCol: String,
                  threshold: Double = 0.5): DataFrame = {
    val pred = (col(scoreCol).cast("double") >= lit(threshold)).cast("long")
    val act = col(labelCol).cast("long")
    val dec = "decimal(38,0)"
    scored.agg(
        sum(pred * act).as("tp"), sum(pred * (lit(1L) - act)).as("fp"),
        sum((lit(1L) - pred) * act).as("fn"),
        sum((lit(1L) - pred) * (lit(1L) - act)).as("tn"))
      .withColumn("n", col("tp") + col("fp") + col("fn") + col("tn"))
      .withColumn("__po", (col("tp") + col("tn")).cast("double") / col("n").cast("double"))
      .withColumn("__pe",
        ((col("tp") + col("fp")).cast(dec) * (col("tp") + col("fn")).cast(dec)
          + (col("fn") + col("tn")).cast(dec) * (col("fp") + col("tn")).cast(dec))
          .cast("double") / (col("n").cast("double") * col("n").cast("double")))
      .select(col("n"), round(col("__po"), 6).as("po"), round(col("__pe"), 6).as("pe"),
        when(col("__pe") < 1.0,
          round((col("__po") - col("__pe")) / (lit(1.0) - col("__pe")), 6))
          .as("kappa"))
  }

  /** Brier score and log-loss in one aggregation — the proper scoring
    * rules that complement [[calibrationBins]] with a single number each.
    * Probabilities are clamped to [1e-15, 1−1e-15] on BOTH engine and
    * oracle (identical ops → identical bits) so log-loss stays finite on
    * a saturated score; the order-dependent double averages are
    * ROUND(6)-absorbed. */
  def brierLogLoss(scored: DataFrame, scoreCol: String,
                   labelCol: String): DataFrame = {
    val pr = least(greatest(col(scoreCol).cast("double"), lit(1e-15)),
      lit(1.0 - 1e-15))
    val y = col(labelCol).cast("double")
    scored.agg(
      count(lit(1)).as("n"),
      round(avg((pr - y) * (pr - y)), 6).as("brier"),
      round(avg(-(y * log(pr) + (lit(1.0) - y) * log(lit(1.0) - pr))), 6)
        .as("logloss"))
  }

  /** Poisson-bootstrap confidence interval for the Brier score — the
    * uncertainty bar a gate metric needs before anyone acts on a
    * "calibration improved by 0.003" delta: `b` resamples, each row's
    * multiplicity drawn Poisson(1) (the distributed bootstrap of
    * Chamandy et al. / Efron's classic, Poissonized so no global n is
    * needed at draw time), from a SEEDED md5-uniform per (resample, id)
    * — fully deterministic, replayed by the oracle. Returns ONE row:
    * `(n_resamples, brier_mean, brier_lo95, brier_hi95)` with exact
    * 2.5/97.5 interpolated percentiles over the resample scores.
    *
    * The Poisson inverse CDF is a pinned 7-arm CASE (P(7+) ≈ 8.3e-5
    * truncated to 6 — bias orders below the CI width, and the pinned
    * thresholds are what make both engines agree bit-for-bit).
    *
    * Scale shape: one `b`-way sequence-explode (row-local) into ONE
    * map-side-combined groupBy(resample) producing `b` rows, then an
    * O(b) percentile aggregate. No window over fact rows, no driver
    * loop; at 100 TB this is a single pass costing `b`× the scan's
    * arithmetic (not `b` scans). */
  def brierBootstrapCI(scored: DataFrame, scoreCol: String, labelCol: String,
                       idCol: String, b: Int = 32,
                       seed: String = "bs:"): DataFrame = {
    require(b >= 2, "b must be >= 2")
    // Poisson(1) CDF, pinned to 9 decimals on both engines
    val cdf = Seq(0.367879441, 0.735758882, 0.919698602,
      0.981011843, 0.996340153, 0.999405815)
    val pr = least(greatest(col(scoreCol).cast("double"), lit(1e-15)),
      lit(1.0 - 1e-15))
    val y = col(labelCol).cast("double")
    val u = (conv(substring(md5(concat(lit(seed), col("__b").cast("string"),
      lit(":"), col("__id"))), 1, 15), 16, 10).cast("long").cast("double") +
      lit(0.5)) / lit(1152921504606846976.0)
    val rows2 = scored
      .select(col(idCol).cast("string").as("__id"),
        ((pr - y) * (pr - y)).as("__sq"))
      .select(col("__id"), col("__sq"),
        explode(sequence(lit(0), lit(b - 1))).as("__b"))
      .withColumn("__w",
        cdf.zipWithIndex.foldRight(lit(6): Column) { case ((c, i), acc) =>
          when(u < lit(c), i).otherwise(acc)
        }.cast("double"))
    rows2
      .groupBy(col("__b"))
      .agg((sum(col("__w") * col("__sq")) / sum(col("__w"))).as("__brier"))
      .agg(
        count(lit(1)).cast("int").as("n_resamples"),
        round(avg(col("__brier")), 6).as("brier_mean"),
        round(percentile(col("__brier"), lit(0.025)), 6).as("brier_lo95"),
        round(percentile(col("__brier"), lit(0.975)), 6).as("brier_hi95"))
  }

  /** Padding-waste report for fixed-size inference batching — the
    * measured case for LENGTH-SORTING a corpus before the V4
    * mapPartitions seam: a batch pads every sequence to its longest
    * member, so arrival-order batches pay `max(len)` for short rows
    * batched next to long ones, while length-sorted batches make
    * near-uniform groups. One row per strategy:
    * `(strategy, n_batches, total_tokens, padded_tokens, waste_ratio)`.
    *
    * Scale shape: token lengths are a narrow scan-side projection; both
    * global orderings go through [[Analytics.withGlobalRank]] (range-
    * bucketed two-phase rank — never a single-partition window over the
    * corpus); batches then aggregate by `(rank-1) div batchSize` with
    * map-side partials, and the report is an O(batches) reduction. */
  def lengthBatchingReport(docs: DataFrame, textCol: String, idCol: String,
                           batchSize: Int): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val lens = docs.select(col(idCol).cast("long").as("id"),
      size(graft.functions.TextFns.tokens(col(textCol))).cast("long").as("len"))
    def report(ranked: DataFrame, name: String): DataFrame =
      ranked
        .withColumn("b", expr(s"(rnk - 1) div $batchSize"))
        .groupBy("b")
        .agg(count(lit(1)).as("n"), max("len").as("mx"), sum("len").as("s"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("s")).as("total_tokens"),
          sum(col("n") * col("mx")).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("total_tokens"), col("padded_tokens"),
          round(lit(1.0) - col("total_tokens").cast("double") /
            col("padded_tokens").cast("double"), 6).as("waste_ratio"))
    val naive = Analytics.withGlobalRank(lens, "id", Seq(col("id")), "rnk")
    val sorted = Analytics.withGlobalRank(lens, "len",
      Seq(col("len"), col("id")), "rnk")
    report(naive, "arrival_order")
      .unionByName(report(sorted, "length_sorted"))
      .orderBy("strategy")
  }

  /** Rank-aware retrieval quality — the metrics the classifier family
    * above cannot see (AUC scores POINTWISE goodness; retrieval cares
    * WHERE the relevant items land in the list): per query, against a
    * binary relevance set `truth`,
    *
    *  - `precision_at_k` / `recall_at_k` — overlap mass;
    *  - `mrr` — 1 / rank of the FIRST relevant hit (Voorhees, TREC-8),
    *    the "how far does the user scroll" metric;
    *  - `ndcg` — DCG with the standard `1/log2(rank+1)` discount
    *    (Järvelin & Kekäläinen, TOIS 2002), normalized by the ideal DCG
    *    of the truth set, so 1.0 = the system ranked every relevant item
    *    as early as possible.
    *
    * Inputs are ranked lists `(queryCol, docCol, rankCol)` — the
    * [[Similarity.batchTopK]] output shape — both truncated to `k` here.
    * The truth side's rank values are used only to ORDER the relevance
    * set: the ideal DCG is computed over a per-query `row_number`, so a
    * FILTERED truth set with non-contiguous ranks (3, 7, 12, …) still
    * yields the textbook IDCG at positions 1..min(n, k) instead of an
    * undersized denominator and nDCG > 1. Queries present in `ranked`
    * but absent from `truth` are KEPT (left join): they report
    * `n_truth = 0`, hits/precision/mrr of 0, and NULL recall/nDCG —
    * both metrics are undefined against an empty relevance set, and a
    * silent drop would hide exactly the queries whose truth labeling is
    * broken. Both frames are O(panel × k): the join and per-query
    * aggregations are trivially small next to the scans that produced
    * them, so this composes onto any retrieval pair (exact vs ANN,
    * full-dim vs MRL prefix, lexical vs hybrid) without adding a wide
    * stage. DCG sums are ROUND(6)ed: per-query sums of ≤ k doubles are
    * reduction-order-dependent in the last ulp. */
  def rankingQuality(ranked: DataFrame, truth: DataFrame, k: Int,
                     queryCol: String = "query_id", docCol: String = "vec_id",
                     rankCol: String = "rank"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val r = ranked.select(col(queryCol).as("qid"), col(docCol).as("did"),
      col(rankCol).cast("double").as("rnk")).filter(col("rnk") <= k)
    val byTruthRank = Window.partitionBy("qid")
      .orderBy(col("trnk"), col("did"))
    val t = truth.select(col(queryCol).as("qid"), col(docCol).as("did"),
        col(rankCol).cast("double").as("trnk"))
      .withColumn("irnk", row_number().over(byTruthRank).cast("double"))
      .filter(col("irnk") <= k)
    val ideal = t.groupBy("qid").agg(
      count(lit(1)).as("n_truth"),
      sum(lit(1.0) / log2(col("irnk") + lit(1.0))).as("idcg"))
    val joined = r.join(
      t.select(col("qid"), col("did"), lit(true).as("rel")),
      Seq("qid", "did"), "left")
    joined.groupBy("qid")
      .agg(
        count(lit(1)).as("n_ranked"),
        coalesce(sum(when(col("rel"), 1L)), lit(0L)).as("hits"),
        coalesce(sum(when(col("rel"),
          lit(1.0) / log2(col("rnk") + lit(1.0)))), lit(0.0)).as("dcg"),
        coalesce(max(when(col("rel"), lit(1.0) / col("rnk"))), lit(0.0))
          .as("mrr"))
      .join(ideal, Seq("qid"), "left")
      .select(col("qid").as(queryCol), col("n_ranked"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        col("hits"),
        round(col("hits").cast("double") / lit(k.toDouble), 6)
          .as("precision_at_k"),
        when(col("n_truth") > 0,
          round(col("hits").cast("double") / col("n_truth").cast("double"), 6))
          .as("recall_at_k"),
        round(col("mrr"), 6).as("mrr"),
        when(col("idcg").isNotNull, round(col("dcg") / col("idcg"), 6))
          .as("ndcg"))
      .orderBy(queryCol)
  }

  /** Leave-one-out target encoding with additive smoothing (the
    * leakage-safe categorical encoder of the Kaggle/CTR lineage; Micci-
    * Barreca 2001 for the smoothing form) — the feature-engineering prep
    * a tabular trainer runs at corpus scale: category c's encoding for
    * row i is `(sum_c − y_i + m·prior) / (cnt_c − 1 + m)` — the row's
    * OWN label is subtracted out (else the feature memorizes the label,
    * the classic target-leak), and `m` pseudo-observations of the global
    * prior keep rare categories from collapsing to their noisy mean
    * (a singleton category encodes exactly to the prior).
    *
    * Scale shape: ONE map-side aggregation to O(categories) stats, a
    * broadcast single-row global prior, and a broadcast join back — the
    * corpus never shuffles. All inputs to the row-level arithmetic are
    * exact integer sums, so the encoding is bit-identical across
    * engines; ROUND(6) is presentation only. */
  def targetEncode(df: DataFrame, catCol: String, labelCol: Column,
                   idCol: String, m: Double = 10.0): DataFrame = {
    require(m > 0, "m must be > 0 (m = 0 divides by zero on singletons)")
    val y = labelCol.cast("long")
    val rows = df.select(col(idCol), col(catCol), y.as("__y"))
    val stats = rows.groupBy(col(catCol))
      .agg(count(lit(1)).as("__cnt"), sum(col("__y")).as("__sum"))
    val prior = rows.agg(
      (sum(col("__y")).cast("double") / count(lit(1)).cast("double"))
        .as("__prior"))
    rows.join(broadcast(stats), Seq(catCol))
      .crossJoin(broadcast(prior))
      .select(col(idCol), col(catCol), col("__y").as("label"),
        round(((col("__sum") - col("__y")).cast("double") +
            lit(m) * col("__prior")) /
          ((col("__cnt") - 1).cast("double") + lit(m)), 6).as("encoded"))
      .orderBy(idCol)
  }

  /** Simple OLS fit + regression metrics in (almost) one pass — the
    * regression arm the eval family was missing: slope/intercept/R²/RMSE
    * all derive in CLOSED FORM from the six sufficient statistics
    * `(n, Σx, Σy, Σx², Σy², Σxy)`, which is the textbook "regression as
    * aggregation" Spark shape — ONE map-side-combined pass over any
    * corpus, no gradient loop, no collect. MAE needs the fitted
    * residuals, so it costs one more pass with the coefficient row
    * broadcast back (still no shuffle of the data).
    *
    * Determinism: x and y are cast to LONG before summing, so the
    * sufficient statistics are exact integers on both engines and every
    * derived metric is row-local double arithmetic — bit-identical with
    * no intermediate rounding (the only ROUND(6) is MAE's
    * order-dependent residual average, plus presentation rounding).
    * Integer sums bound the envelope: Σxy stays exact while
    * `n·max(x)·max(y) < 2^63` — beyond that (trillion-row corpora),
    * swap the casts to double and accept last-ulp drift. Degenerate
    * zero-variance x: NULL coefficients and metrics, not a division
    * error. */
  /** The six OLS sufficient statistics `(n, sx, sy, sxx, syy, sxy)` as
    * exact-integer aggregates — shared by [[olsFit]] and the streaming
    * incremental fit (the sums are what a streaming aggregation
    * maintains; the closed form is a snapshot-time projection). */
  def olsSumAggs(x: Column, y: Column): Seq[Column] = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    Seq(count(lit(1)).as("n"),
      sum(xl).as("sx"), sum(yl).as("sy"),
      sum(xl * xl).as("sxx"), sum(yl * yl).as("syy"),
      sum(xl * yl).as("sxy"))
  }

  /** Closed-form OLS coefficients/metrics from a sufficient-statistics
    * row: `(n, __b slope, __a intercept, __r2, __rmse)`, NULL-guarded on
    * zero x-variance. Row-local double arithmetic on exact sums. */
  def olsStatsFromSums(sums: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    def d(c: String): Column = col(c).cast("double")
    val covN = d("n") * d("sxy") - d("sx") * d("sy")
    val varXN = d("n") * d("sxx") - d("sx") * d("sx")
    val varYN = d("n") * d("syy") - d("sy") * d("sy")
    val slope = covN / varXN
    val icept = (d("sy") - slope * d("sx")) / d("n")
    val sse = d("syy") + d("n") * icept * icept + slope * slope * d("sxx") -
      lit(2.0) * icept * d("sy") - lit(2.0) * slope * d("sxy") +
      lit(2.0) * icept * slope * d("sx")
    sums.select(keep.map(col) ++ Seq(col("n"),
      when(varXN > 0.0, slope).as("__b"),
      when(varXN > 0.0, icept).as("__a"),
      when(varXN > 0.0 && varYN > 0.0, covN * covN / (varXN * varYN)).as("__r2"),
      when(varXN > 0.0, sqrt(greatest(sse, lit(0.0)) / d("n"))).as("__rmse")): _*)
  }

  /** [[olsFit]] PER GROUP (the rocAucBy convention): one aggregation to
    * O(groups) sufficient-statistic rows, the closed form row-local on
    * each — per-segment regression lines (a per-language chars-per-token
    * slope, a per-cohort calibration line) at one shuffle, no MAE (the
    * residual pass is a per-group batch join; callers who need it
    * broadcast the coefficient table back themselves). */
  def olsFitBy(df: DataFrame, keyCol: String, xCol: Column,
               yCol: Column): DataFrame = {
    val aggs = olsSumAggs(xCol, yCol)
    val sums = df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    olsStatsFromSums(sums, keep = Seq(keyCol))
      .select(col(keyCol), col("n"),
        round(col("__b"), 6).as("slope"),
        round(col("__a"), 6).as("intercept"),
        round(col("__r2"), 6).as("r2"),
        round(col("__rmse"), 6).as("rmse"))
      .orderBy(keyCol)
  }

  def olsFit(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val x = xCol.cast("long")
    val y = yCol.cast("long")
    val aggs = olsSumAggs(xCol, yCol)
    val sums = df.agg(aggs.head, aggs.tail: _*)
    val fitted = olsStatsFromSums(sums)
    val mae = df.crossJoin(broadcast(fitted.select(col("__a").as("__ma"),
        col("__b").as("__mb"))))
      .agg(round(avg(abs(y.cast("double") - (col("__ma") + col("__mb") *
        x.cast("double")))), 6).as("mae"))
    fitted.crossJoin(broadcast(mae))
      .select(col("n"),
        round(col("__b"), 6).as("slope"),
        round(col("__a"), 6).as("intercept"),
        round(col("__r2"), 6).as("r2"),
        round(col("__rmse"), 6).as("rmse"),
        col("mae"))
  }

  /** McNemar's test for PAIRED classifier comparison (McNemar 1947;
    * Dietterich 1998 recommends it for comparing two classifiers on the
    * SAME examples — marginal accuracies alone ignore the pairing): from
    * per-example correctness of models A and B against a shared label,
    * the discordant counts `b` (A right, B wrong) and `c` (A wrong, B
    * right), the continuity-corrected statistic
    * `chi2 = (|b−c|−1)² / (b+c)`, and the `chi2 > 3.841` verdict (the
    * 95% chi-square(1) critical value — a constant, so the arithmetic
    * stays closed-form on both engines). Degenerate case `b + c = 0`
    * (the models never disagree): chi2 NULL, not-significant — there is
    * no evidence either way, not a division error.
    *
    * Scale shape: ONE global conditional aggregation over row-local
    * correctness flags — no window, no join, a single output row. */
  def mcnemar(scored: DataFrame, predA: Column, predB: Column,
              label: Column): DataFrame = {
    val okA = (predA === label).cast("int")
    val okB = (predB === label).cast("int")
    val agg = scored.agg(
      count(lit(1)).as("n"),
      sum(when(okA === 1 && okB === 1, 1L).otherwise(0L)).as("both_right"),
      sum(when(okA === 1 && okB === 0, 1L).otherwise(0L)).as("b_only_a"),
      sum(when(okA === 0 && okB === 1, 1L).otherwise(0L)).as("c_only_b"),
      sum(when(okA === 0 && okB === 0, 1L).otherwise(0L)).as("both_wrong"))
    val disc = (col("b_only_a") + col("c_only_b")).cast("double")
    val chi2 = pow(abs(col("b_only_a") - col("c_only_b")).cast("double") - lit(1.0), 2) / disc
    agg.select(col("n"), col("both_right"), col("b_only_a"),
        col("c_only_b"), col("both_wrong"),
        when(disc > 0.0, round(chi2, 6)).as("chi2"))
      .withColumn("significant",
        coalesce(col("chi2") > lit(3.841), lit(false)))
  }

  /** Pairwise duel outcomes → canonical win matrix: from a frame of
    * duels `(duelCol, itemCol, scoreCol, idCol)` with EXACTLY two rows
    * per duel, emit one row per unordered item pair `(item_a < item_b)`
    * with duel count, wins for each side, and `win_rate_a`. The duel
    * winner is the argmax of `(score, id)` — the [[TrainingPipeline
    * .dpoPairs]] tie convention, so the matrix is engine- and
    * layout-independent. Self-duels (both rows the same item) are
    * excluded: they carry no between-item signal.
    *
    * Scale shape: ONE duel-keyed aggregation collapses the log to
    * O(duels) rows (min_by/max_by structs, no window), then ONE rollup
    * to O(item-pairs). A 100 TB preference log reduces in two map-side
    * combined shuffles. */
  def pairwiseWinMatrix(duels: DataFrame, duelCol: String, itemCol: String,
                        scoreCol: String, idCol: String): DataFrame = {
    val entry = struct(col(itemCol).as("item"), col(scoreCol).as("s"),
      col(idCol).as("id"))
    val perDuel = duels
      .groupBy(col(duelCol))
      .agg(count(lit(1)).as("__n"),
        max_by(entry, struct(col(scoreCol), col(idCol))).as("__w"),
        min_by(entry, struct(col(scoreCol), col(idCol))).as("__l"))
      .where(col("__n") === 2 && col("__w.item") =!= col("__l.item"))
    perDuel
      .select(least(col("__w.item"), col("__l.item")).as("item_a"),
        greatest(col("__w.item"), col("__l.item")).as("item_b"),
        when(col("__w.item") <= col("__l.item"), 1L).otherwise(0L).as("__wa"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_duels"), sum(col("__wa")).as("wins_a"))
      .withColumn("wins_b", col("n_duels") - col("wins_a"))
      .withColumn("win_rate_a",
        round(col("wins_a").cast("double") / col("n_duels").cast("double"), 6))
      .orderBy("item_a", "item_b")
  }

  /** Bradley-Terry strength fitting over a pairwise win matrix (Hunter
    * 2004's MM algorithm — the Chatbot-Arena-style ranking a preference
    * log earns): `iters` fixed minorize-maximize updates
    * `p_i ← W_i / Σ_j n_ij/(p_i+p_j)`, renormalized to Σp = 1 each
    * round, from a uniform start. Fixed iteration count (not a
    * convergence probe) keeps the plan static and the oracle an
    * unrolled CTE chain; 15 rounds is far past practical convergence
    * on dozens-of-items matrices. Emits `(item, n_wins, n_duels,
    * strength)` with strength ROUND(6)ed.
    *
    * Determinism: every per-item sum (the MM denominator, the
    * normalizer) is ROUND(12)ed before use — double addition order is
    * engine-defined, and 12 dp is far below the O(1)-magnitude values'
    * noise floor while pinning both engines to identical inputs for the
    * next round (the [[DataQuality.tCloseness]] convention, applied
    * per iteration).
    *
    * Scale shape: the matrix is O(items²) — DIMENSION-sized (items are
    * models/sources/policies, never documents), so each iteration is a
    * couple of broadcast joins + one tiny aggregation; the expensive
    * reduction from the raw log happened in [[pairwiseWinMatrix]].
    * Items with zero wins decay to strength 0 (their true MLE under
    * BT); items absent from every duel are absent from the output. */
  def bradleyTerry(matrix: DataFrame, iters: Int = 15): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // directed edges: n_ij ridden both ways, wins from each side's view
    val e1 = matrix.select(col("item_a").as("i"), col("item_b").as("j"),
      col("wins_a").as("w"), col("n_duels").as("n"))
    val e2 = matrix.select(col("item_b").as("i"), col("item_a").as("j"),
      col("wins_b").as("w"), col("n_duels").as("n"))
    // materialize the O(items²) matrix ONCE: without this every MM
    // round's denominator job re-runs the whole upstream reduction
    // (raw log -> duels -> matrix), turning a dimension-sized loop
    // into 15 full-corpus scans (measured 12 s -> 0.6 s at sf0.1)
    val edges = e1.unionAll(e2).transform(Iter.checkpoint)
    val wtot = edges.groupBy(col("i").as("item"))
      .agg(sum(col("w")).as("n_wins"), sum(col("n")).as("n_duels"))
      .transform(Iter.checkpoint)
    val k = wtot.select(count(lit(1)).as("__k"))
    // Round 16 (guide §2.4 / §1.2 "the distributed algorithm"): the MM
    // round used to run FOUR broadcast exchanges (two projections of p
    // onto the edge list, the denominator table, the normalizer row) and
    // re-executed the unnorm subplan inside the normalizer's broadcast —
    // ~6 scheduled jobs per round on a DIMENSION-sized state, so 15
    // rounds were pure driver/scheduler overhead (probe: 105 jobs, 2.5 s
    // of task time under a 6.2 s wall). Now the state rides ONE broadcast
    // map per round — (item → (wins, p)), O(items) by construction — the
    // denominator comes off the edge scan with both endpoint lookups
    // against that map, and the normalizer is a bounded single-partition
    // window over O(items) rows (the kMeansParReduce two-frame pattern)
    // instead of a separate aggregate + crossJoin broadcast. Two jobs per
    // round (map broadcast + state checkpoint); every ROUND(12) boundary
    // is unchanged, so engine and oracle still agree bit-for-bit.
    // The state carries n_wins alongside p so the per-round plan never
    // re-joins wtot.
    var p = wtot.crossJoin(broadcast(k))
      .select(col("item"), col("n_wins").as("__w"),
        (lit(1.0) / col("__k").cast("double")).as("p"))
    val fullW = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // AQE off for the loop body only (restored in the finally): each
    // round's state is O(items) — dimension-sized by contract — and AQE
    // re-plans every exchange as its own scheduled job, turning the
    // 2-exchange round into ~5 driver round-trips; with a static plan the
    // round is one job. AQE has nothing to adapt here (no skew, no
    // partition coalescing worth having on dozens of rows).
    // ... and the loop's two exchanges (groupBy item, normalizer window)
    // carry O(items) rows — one reduce task is the honest shape for a
    // dimension-sized state (32 near-empty tasks per round was pure
    // scheduling tax). [[Iter.withTinyLoopConf]] pins and restores both.
    Iter.withTinyLoopConf(matrix.sparkSession) {
    var it = 0
    while (it < iters) {
      val pmap = p.agg(map_from_entries(collect_list(
        struct(col("item"), struct(col("__w").as("w"), col("p").as("p"))))).as("m"))
      // per-round localCheckpoint (the gr_pagerank lineage discipline):
      // the checkpoint is O(items) rows; 15 tiny jobs is the honest cost
      p = edges.crossJoin(broadcast(pmap))
        .select(col("i"),
          (col("n").cast("double") /
            (col("m")(col("i")).getField("p") + col("m")(col("j")).getField("p")))
            .as("__t"),
          col("m")(col("i")).getField("w").as("__w"))
        .groupBy(col("i").as("item"))
        // __w is constant per group (the item's win count); max() carries
        // it through the aggregate without a second join
        .agg(round(sum(col("__t")), 12).as("__d"), max(col("__w")).as("__w"))
        .select(col("item"), col("__w"),
          (col("__w").cast("double") / col("__d")).as("__q"))
        .withColumn("__s", round(sum(col("__q")).over(fullW), 12))
        .select(col("item"), col("__w"), round(col("__q") / col("__s"), 12).as("p"))
        .transform(Iter.checkpoint)
      it += 1
    }
    }
    wtot.join(broadcast(p.select(col("item"), col("p"))), Seq("item"))
      .select(col("item"), col("n_wins"), col("n_duels"),
        round(col("p"), 6).as("strength"))
      .orderBy("item")
  }
}
