package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the "unit tests for data" gate
  * a corpus passes before a training run is allowed to read it (the
  * published Deequ shape: Schelter et al., VLDB 2018, "Automating
  * Large-Scale Data Quality Verification"; same surface as
  * Great Expectations' expectation suites).
  *
  * A contract is a list of [[Expectation]]s; [[validate]] evaluates ALL
  * of them in ONE aggregation pass over the table — each expectation is
  * an aggregate column, so the whole suite costs a single scan with
  * map-side partial aggregation regardless of how many checks it
  * carries, and the result is an O(#checks) frame
  * `(metric, value, op, threshold, passed)`.
  *
  * Scale notes (100 TB): every builder below except [[uniqueness]]
  * composes algebraic aggregates (sum/count/min/max) — one narrow scan,
  * partials combine on the map side, the reduce state is O(#checks)
  * scalars. [[uniqueness]] is the one exact-distinct check (a shuffle of
  * the column's distinct values); at full-corpus scale swap it for
  * [[uniquenessApprox]] (HLL++ sketch, mergeable, no distinct shuffle) —
  * kept out of the oracle entry because DuckDB's approx_distinct sketch
  * differs.
  */
object DataQuality {

  /** One declared check: `metric` names it in the report, `agg` is the
    * aggregate expression producing its DOUBLE value, and the contract
    * asserts `value <op> threshold` (`op` ∈ `>=`, `<=`). Values are
    * rounded to 6 places before comparison — sums of doubles are
    * order-dependent across partitions, and the gate must not flap on
    * reduction order. */
  final case class Expectation(metric: String, agg: Column,
                               op: String, threshold: Double) {
    require(op == ">=" || op == "<=", s"unsupported op '$op'")
  }

  /** Fraction of non-null rows in `c` must be at least `atLeast`. */
  def completeness(c: String, atLeast: Double): Expectation =
    Expectation(s"completeness($c)",
      avg(when(col(c).isNotNull, lit(1.0)).otherwise(lit(0.0))),
      ">=", atLeast)

  /** `count(distinct c) / count(*)` must be at least `atLeast` (1.0 =
    * primary-key check). Exact distinct — see [[uniquenessApprox]]. */
  def uniqueness(c: String, atLeast: Double): Expectation =
    Expectation(s"uniqueness($c)",
      countDistinct(col(c)).cast("double") / count(lit(1)).cast("double"),
      ">=", atLeast)

  /** Sketch twin of [[uniqueness]] for full-corpus scale: HLL++ keeps
    * the check algebraic/mergeable (±rsd instead of exact). */
  def uniquenessApprox(c: String, atLeast: Double,
                       rsd: Double = 0.05): Expectation =
    Expectation(s"uniqueness_approx($c)",
      approx_count_distinct(col(c), rsd).cast("double") /
        count(lit(1)).cast("double"),
      ">=", atLeast)

  /** Fraction of non-null rows of `c` matching `regex` ≥ `atLeast`. */
  def matchRate(c: String, regex: String, atLeast: Double): Expectation =
    Expectation(s"match_rate($c)",
      avg(when(col(c).isNull, lit(null))
        .when(col(c).rlike(regex), lit(1.0)).otherwise(lit(0.0))),
      ">=", atLeast)

  /** Minimum of `c` must be at least `atLeast` (nulls ignored). */
  def minOf(c: String, atLeast: Double): Expectation =
    Expectation(s"min($c)", min(col(c)).cast("double"), ">=", atLeast)

  /** Maximum of `c` must be at most `atMost` (nulls ignored). */
  def maxOf(c: String, atMost: Double): Expectation =
    Expectation(s"max($c)", max(col(c)).cast("double"), "<=", atMost)

  /** Mean of `c` must satisfy `op threshold`. */
  def meanOf(c: String, op: String, threshold: Double): Expectation =
    Expectation(s"mean($c)", avg(col(c).cast("double")), op, threshold)

  /** Table must have at least `n` rows. */
  def rowCountAtLeast(n: Long): Expectation =
    Expectation("row_count", count(lit(1)).cast("double"), ">=", n.toDouble)

  /** Evaluate the contract: ONE aggregation over `df`, then the 1-row
    * wide result pivots to the long report frame entirely plan-side (no
    * driver collect) via an inline struct-array explode. Output:
    * `(metric, value, op, threshold, passed)` ordered by metric. */
  def validate(df: DataFrame, contract: Seq[Expectation]): DataFrame = {
    require(contract.nonEmpty, "empty contract")
    val aggs = contract.zipWithIndex.map { case (e, i) =>
      round(e.agg.cast("double"), 6).as(s"__m$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val report = array(contract.zipWithIndex.map { case (e, i) =>
      struct(
        lit(e.metric).as("metric"),
        col(s"__m$i").as("value"),
        lit(e.op).as("op"),
        lit(e.threshold).cast("double").as("threshold"),
        (if (e.op == ">=") col(s"__m$i") >= e.threshold
         else col(s"__m$i") <= e.threshold).as("passed"))
    }: _*)
    wide.select(explode(report).as("r")).select("r.*").orderBy("metric")
  }

  /** Population Stability Index drift between a BASELINE window and a
    * CURRENT window of the same numeric column — the standard production
    * drift gate for model inputs and corpus snapshots (credit-scoring
    * lineage; rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * act):
    *
    *   PSI = Σ_bins (cur% − base%) · ln(cur% / base%)
    *
    * Bin edges are the BASELINE's `bins`-quantiles (exact interpolated
    * percentile — swap in `approx_percentile` at full-corpus scale, same
    * plan), ROUND(6)-pinned so bucketing replays identically anywhere
    * (the published-stats discipline of ml_ece/emb_whiten). Empty-bin
    * rates are floored at `floor` before the log, the standard PSI
    * regularization. NULL values are EXCLUDED from both windows' rates
    * (the edge probe already ignores them): a null is missing data, not
    * a low value, and silently counting it in the bottom bin would let
    * a broken upstream masquerade as low-value drift — track nullness
    * with a [[completeness]] expectation instead. Returns one row per
    * bin with the per-bin term and the repeated total.
    *
    * Scale shape: the edge probe is ONE aggregation on the baseline
    * producing O(bins) scalars (driver-side round is an O(bins) probe,
    * not data motion); each window then takes one narrow bucket
    * projection + map-side-combined count; the rate/term algebra runs on
    * the O(bins)-row frame. No corpus-sized shuffle, no sort. */
  def psiDrift(base: DataFrame, cur: DataFrame, valCol: String,
               bins: Int = 10, floor: Double = 1e-6): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val probs = (1 until bins).map(_.toDouble / bins)
    val v = col(valCol).cast("double")
    val edges: Seq[Double] = base
      .agg(percentile(v, lit(probs.toArray)).as("e"))
      .head.getSeq[Double](0)
      .map(e => BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    def bucketOf(c: Column): Column =
      edges.map(e => when(c >= lit(e), 1).otherwise(0))
        .reduce(_ + _).cast("int")
    def rates(df: DataFrame, n: String): DataFrame =
      df.filter(v.isNotNull).select(bucketOf(v).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(n))
    val joined = rates(base, "n_base")
      .join(rates(cur, "n_cur"), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val baseRate = col("n_base").cast("double") / sum(col("n_base")).over(w).cast("double")
    val curRate = col("n_cur").cast("double") / sum(col("n_cur")).over(w).cast("double")
    val fb = greatest(baseRate, lit(floor))
    val fc = greatest(curRate, lit(floor))
    joined
      .withColumn("base_rate", round(baseRate, 6))
      .withColumn("cur_rate", round(curRate, 6))
      .withColumn("psi_term", round((fc - fb) * log(fc / fb), 6))
      .withColumn("psi_total", round(sum(col("psi_term")).over(w), 6))
      .orderBy("bucket")
  }

  /** Embedding-space drift between two corpus snapshots — the
    * representation-level companion to [[psiDrift]] (scalar stats) and
    * [[snapshotDiff]] (content): per-dimension mean shift, plus the L1
    * drift and the cosine between the two mean vectors as whole-frame
    * verdicts. An embedding model swap, a data-mix change, or an
    * upstream normalization bug all move the mean vector long before
    * they show up in task metrics. Per-dim means are ONE map-side
    * combinable aggregation over the exploded (dim, value) stream (no
    * corpus shuffle beyond the O(dims) partials); the drift algebra and
    * the two whole-frame windows run on the O(dims)-row frame. Means
    * are ROUND(6)-published so both engines derive drift from identical
    * operands. */
  def embeddingDrift(base: DataFrame, cur: DataFrame,
                     vecCol: String): DataFrame = {
    def dimMeans(df: DataFrame, n: String) =
      df.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy("dim").agg(round(avg(col("x").cast("double")), 6).as(n))
    val j = dimMeans(base, "mean_a").join(dimMeans(cur, "mean_b"), Seq("dim"))
      .withColumn("drift", col("mean_b") - col("mean_a"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    j.withColumn("l1_drift", round(sum(abs(col("drift"))).over(w), 6))
      .withColumn("cos_shift", round(
        sum(col("mean_a") * col("mean_b")).over(w) /
          (sqrt(sum(col("mean_a") * col("mean_a")).over(w)) *
            sqrt(sum(col("mean_b") * col("mean_b")).over(w))), 6))
      .select(col("dim"), col("mean_a"), col("mean_b"), col("drift"),
        col("l1_drift"), col("cos_shift"))
      .orderBy("dim")
  }

  /** Snapshot diff — the corpus-versioning report run between two
    * builds of the same dataset: per group, how many rows were added,
    * removed, changed, or untouched. Content comparison goes through a
    * scan-side md5 DIGEST, so the full-outer join on the id shuffles two
    * narrow (id, group, 32-char hash) projections — document text never
    * moves. One join + one map-side-combined aggregation; output is
    * O(groups). */
  def snapshotDiff(base: DataFrame, cur: DataFrame, idCol: String,
                   contentCol: String, groupCol: String): DataFrame = {
    val b = base.select(col(idCol).as("id"), col(groupCol).as("grp_b"),
      md5(col(contentCol).cast("string")).as("h_base"))
    val c = cur.select(col(idCol).as("id"), col(groupCol).as("grp_c"),
      md5(col(contentCol).cast("string")).as("h_cur"))
    b.join(c, Seq("id"), "full_outer")
      .select(coalesce(col("grp_b"), col("grp_c")).as(groupCol),
        when(col("h_base").isNull, "added")
          .when(col("h_cur").isNull, "removed")
          .when(col("h_base") =!= col("h_cur"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(groupCol)
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
      .orderBy(groupCol)
  }

  /** l-diversity (Machanavajjhala et al., ICDE 2006) — the companion
    * gate to [[Analytics.kAnonymity]]: a k-anonymous class is still a
    * disclosure if every member shares the same SENSITIVE value, so each
    * quasi-identifier class must carry at least `l` distinct sensitive
    * values. One aggregation over the QI projection (count + exact
    * per-group distinct — group-local, no global distinct shuffle);
    * returns per-class rows with the at-risk flag, same consumption
    * shape as the k-anonymity frame. */
  def lDiversity(df: DataFrame, qiCols: Seq[(String, Column)],
                 sensitiveCol: Column, l: Int): DataFrame = {
    val named = qiCols.map { case (n, c) => c.as(n) }
    val keys = qiCols.map { case (n, _) => col(n) }
    df.select(named :+ sensitiveCol.as("__sens"): _*)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("__sens")).as("distinct_sensitive"))
      .withColumn("at_risk", col("distinct_sensitive") < l)
      .orderBy(keys: _*)
  }

  /** Column profile — the table-stakes profiling report (what every
    * warehouse "describe" / expectation-suite bootstrap runs first):
    * per column, row count, non-null/null counts, EXACT distinct
    * cardinality, and min/max rendered as strings so the report has one
    * schema across types (longs render canonically and strings compare
    * in binary order on both engines).
    *
    * Scale shape: one aggregation per profiled column, each scanning
    * ONLY its column (Catalyst prunes the per-branch scan), unioned into
    * the O(columns) report. Exact countDistinct shuffles per column by
    * design — profiling is an offline audit; swap approx_count_distinct
    * for the always-on flavor (the ad_distinct_counts split). */
  def columnProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile at least one column")
    columns.map { c =>
      df.agg(count(lit(1)).as("n_rows"),
          count(col(c)).as("n_nonnull"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_str"),
          max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nonnull"),
          (col("n_rows") - col("n_nonnull")).as("n_nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _).orderBy("column")
  }

  /** Benford first-digit audit (Newcomb 1881 / Benford 1938; the classic
    * forensic-accounting screen, Nigrini 2012) — the data-quality gate
    * for VALUE columns the expectation/drift family doesn't cover:
    * naturally-occurring multi-magnitude amounts follow
    * `P(d) = log10(1 + 1/d)`; fabricated, clipped, or unit-mangled
    * amounts don't. Per first significant digit: count, observed
    * fraction, Benford expectation, absolute deviation.
    *
    * Determinism: values convert to integer cents with explicit half-up
    * (`floor(x·100 + 0.5)` — the gov_dp rounding convention) and the
    * digit comes from the INTEGER's string head — never from
    * `floor(log10(x))`, whose libm last-ulp at power-of-10 boundaries
    * could flip a digit between engines. This pins a TWO-DECIMAL
    * CURRENCY domain: the audited digit is the first digit of the
    * rounded cent amount, so sub-cent magnitudes are out of scope (a
    * value of 0.004 rounds to 0 cents — digit 0, whose Benford
    * expectation log10(1 + 1/0) is undefined and engine-divergent:
    * NULL under Spark's null-on-division-by-zero, ±Inf under IEEE
    * float division). Null, non-positive, AND sub-half-cent values are
    * therefore excluded (`cents >= 1`) — no first significant digit to
    * audit.
    *
    * Scale shape: one map-side aggregation to 9 rows + a broadcast
    * single-row total. */
  def benfordAudit(df: DataFrame, valueCol: Column): DataFrame = {
    val cents = floor(valueCol.cast("double") * lit(100.0) + lit(0.5)).cast("long")
    val counts = df.filter(valueCol.isNotNull && valueCol > 0)
      .select(cents.as("__cents")).filter(col("__cents") >= 1)
      .select(substring(col("__cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__t"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6).as("observed"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6).as("expected"))
      .withColumn("abs_dev", round(abs(col("observed") - col("expected")), 6))
      .orderBy("digit")
  }

  /** t-closeness audit (Li et al. 2007) — the fourth governance gate
    * after k-anonymity / l-diversity / the DP simulation: a k-anonymous,
    * l-diverse class whose sensitive-value DISTRIBUTION differs sharply
    * from the corpus-wide one still leaks (a class that is 90% one
    * segment against a 20% base rate discloses by skew, not by
    * uniqueness). Per QI equivalence class, reports the total variation
    * distance `tvd = ½·Σ_v |p_class(v) − p_global(v)|` between the
    * class's categorical sensitive distribution and the global one
    * (the categorical special case of the paper's EMD), plus the
    * `at_risk = tvd > t` flag. Values ABSENT from a class still
    * contribute their global mass: the sum decomposes as
    * `Σ_present |p_c − p_g| + (1 − Σ_present p_g)`, so only the class's
    * own value list is ever materialized.
    *
    * Scale shape: one (class, value) aggregation, then one class-keyed
    * aggregation that collects the class's value histogram — bounded by
    * the SENSITIVE attribute's cardinality, never by class size — and
    * folds the TVD row-locally against a broadcast global-distribution
    * map (O(values) entries, one row). Two map-side-combined shuffles
    * total; no window, no per-class join. `tvd` is ROUND(6)ed before
    * the flag because the fold order over the value list is
    * engine-defined (the usual order-dependent-double convention). */
  def tCloseness(df: DataFrame, qiCols: Seq[(String, Column)],
                 sensitiveCol: Column, t: Double): DataFrame = {
    val named = qiCols.map { case (n, c) => c.as(n) }
    val keys = qiCols.map { case (n, _) => col(n) }
    val cell = df.select(named :+ sensitiveCol.as("__sens"): _*)
      .groupBy(keys :+ col("__sens"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val glob = cell.groupBy(col("__sens"))
      .agg(sum(col("__cnt")).as("__g"))
      .agg(map_from_entries(collect_list(struct(col("__sens"),
          col("__g").cast("double")))).as("__gmap"),
        sum(col("__g")).cast("double").as("__n"))
    val classes = cell
      .groupBy(keys: _*)
      .agg(sum(col("__cnt")).as("class_size"),
        collect_list(struct(col("__sens").as("v"),
          col("__cnt").cast("double").as("c"))).as("__hist"))
    val presentAbs = aggregate(col("__hist"), lit(0.0), (acc, x) =>
      acc + abs(x.getField("c") / col("class_size").cast("double") -
        element_at(col("__gmap"), x.getField("v")) / col("__n")))
    val presentG = aggregate(col("__hist"), lit(0.0), (acc, x) =>
      acc + element_at(col("__gmap"), x.getField("v")) / col("__n"))
    classes.crossJoin(broadcast(glob))
      .withColumn("tvd",
        round(lit(0.5) * (presentAbs + (lit(1.0) - presentG)), 6))
      .withColumn("at_risk", col("tvd") > t)
      .select(keys ++ Seq(col("class_size"), col("tvd"), col("at_risk")): _*)
      .orderBy(keys: _*)
  }

  /** SIMULATED ε-DP count release (Dwork et al. 2006: Laplace mechanism,
    * sensitivity 1 for counting queries): per-group counts plus
    * Laplace(1/ε)-distributed noise via the inverse CDF over a SEEDED
    * md5-uniform per group key (the engine's standard deterministic-
    * noise device — dsirResample's Gumbel trick with the Laplace
    * quantile function). The released integer is floored at 0 (a count
    * cannot be negative) and computed as `floor(count + noise + 0.5)` —
    * explicit half-up rounding shared with the oracle, immune to
    * round-half-even differences between engines.
    *
    * PRIVACY CAVEAT — this is a SIMULATION, not a private release. The
    * noise is a pure function of `seed` and the PUBLIC group key,
    * independent of the data: anyone who knows the seed recomputes the
    * noise exactly and recovers `true_count` from `released`. That is
    * the point here — the deterministic replay is what lets the DuckDB
    * oracle and reruns certify the mechanism's arithmetic bit-for-bit —
    * but it provides ZERO differential privacy under a known seed, which
    * is why `seed` is REQUIRED with no default. A production release
    * must (a) draw the seed from a secret high-entropy source kept out
    * of the published artifact and never reused, or better (b) replace
    * the seeded uniform with a non-reproducible CSPRNG draw per group
    * and forgo replayability. Even then the returned frame is only the
    * AUDIT view: `true_count` and `noise` ride along for verification;
    * the publishable artifact is the `(group, released)` projection.
    *
    * Scale shape: ONE map-side-combined aggregation; noise is O(groups)
    * row-local arithmetic on the aggregate frame. A NULL group key
    * yields NULL noise/release (md5 of NULL is NULL) — filter or
    * fill-label nulls upstream if they must be released. */
  def simulatedDpCounts(df: DataFrame, groupCol: String, epsilon: Double,
                        seed: String): DataFrame = {
    require(epsilon > 0, "epsilon must be > 0")
    val u = (conv(substring(md5(concat(lit(seed), col(groupCol).cast("string"))),
      1, 15), 16, 10).cast("long").cast("double") + lit(0.5)) /
      lit(1152921504606846976.0) // 2^60: u in (0, 1)
    val lap = -lit(1.0 / epsilon) * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("true_count"))
      .withColumn("noise", round(lap, 6))
      .withColumn("released", greatest(lit(0L),
        floor(col("true_count").cast("double") + col("noise") + lit(0.5))
          .cast("long")))
      .orderBy(groupCol)
  }
}
