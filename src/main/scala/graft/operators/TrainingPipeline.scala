package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** The end-to-end training-data pipeline as ONE composed plan: quality
  * gate → near-dup prune → deterministic split → per-language corpus
  * report. Each stage is an already-oracled operator; the composition
  * proves they chain without materialization seams — one logical plan,
  * Catalyst free to push the gate predicate into the scan feeding BOTH
  * the signature stream and the prune side.
  *
  * Scale shape: the gate is a pushed base-column predicate; near-dup
  * pairs come from banded MinHash (candidates via band-bucket join,
  * exact-Jaccard verify on candidates only — NOT the all-pairs shingle
  * self-join, which dominated this pipeline's cost at sf1); the prune's
  * drop set is O(duplicates) and anti-joins the gated corpus; the split
  * is arithmetic on the stable id (no RNG, no shuffle); the report is
  * one map-side-combined aggregate over O(langs) groups.
  */
object TrainingPipeline {

  /** Per-language report of the train split after gating and dedup:
    * `(lang, n_docs, total_tokens, avg_tokens)`. */
  def corpusReport(docs: DataFrame, minChars: Int = 30,
                   shingleN: Int = 4, k: Int = 32, bands: Int = 8,
                   minJaccard: Double = 0.5,
                   family: Dedup.MinhashFamily = Dedup.PortableFamily): DataFrame = {
    val gated = docs.filter(col("n_chars") >= minChars)
    val pairs = Dedup.minhashNearDupPairs(gated.select("doc_id", "text"),
      "text", "doc_id", n = shingleN, k = k, bands = bands,
      minJaccard = minJaccard, family = family)
    val pruned = Dedup.pruneToCanonical(gated, pairs, "doc_id")
    val train = pruned
      .filter(TextAnalysis.datasetSplit(col("doc_id")) === "train")
    train
      .select(col("lang"), size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"))
      .withColumn("avg_tokens",
        round(col("total_tokens").cast("double") /
          col("n_docs").cast("double"), 6))
      .orderBy("lang")
  }

  /** SFT shard-prep composed end-to-end in ONE plan: conversation turns
    * → chat-template examples ([[Serving.sftExamples]] — one bounded
    * per-conversation window) → snake-draft shard assignment over the
    * rendered example SIZE ([[TextAnalysis.shardPlanBy]] on `n_chars`,
    * the cost a shard writer actually pays) → per-shard balance report
    * `(shard, n_examples, total_chars, load_ratio)`. Every stage is an
    * already-oracled operator; the composition stays lazy, so Catalyst
    * prunes the prompt/target strings out of everything downstream of
    * the `n_chars` projection.
    *
    * Example identity: `turn_seq` is DENSE 0-based within its
    * conversation (the SFT family contract), so it collides across
    * conversations and cannot serve as the shard-plan id on its own —
    * the plan's rank tie-break on equal `n_chars` would be ambiguous.
    * The unique `ex_id` is `conv_id * maxTurnsPerConv + turn_seq`
    * (collision-free while every conversation stays under
    * `maxTurnsPerConv` turns and `conv_id < 2^63 / maxTurnsPerConv`;
    * the 2^20 default leaves 2^43 conversation ids). */
  def sftShardReport(turns: DataFrame, nShards: Int,
                     maxTurnsPerConv: Long = 1L << 20): DataFrame = {
    require(maxTurnsPerConv > 0, "maxTurnsPerConv must be > 0")
    val ex = Serving.sftExamples(turns)
    val plan = TextAnalysis.shardPlanBy(
      ex.select((col("conv_id").cast("long") * lit(maxTurnsPerConv) +
          col("turn_seq").cast("long")).as("ex_id"), col("n_chars")),
      "n_chars", "ex_id", nShards)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    plan.groupBy("shard")
      .agg(count(lit(1)).as("n_examples"), sum("n_chars").as("total_chars"))
      .select(col("shard"), col("n_examples"), col("total_chars"),
        round(col("total_chars").cast("double") * lit(nShards.toDouble) /
          sum(col("total_chars")).over(w).cast("double"), 6).as("load_ratio"))
      .orderBy("shard")
  }

  /** The FULL pretraining-curation funnel composed in ONE plan — the
    * FineWeb/RefinedWeb stage sequence (Penedo et al. 2023/2024), each
    * stage an already-oracled operator, reported as the survivor funnel
    * a curation run publishes: per stage, document count and token mass.
    *
    *  0. raw corpus;
    *  1. eval holdout removed (every 17th doc plays the benchmark — the
    *     dc_decontaminate convention — and eval data never trains);
    *  2. language-ID gate ([[TextAnalysis.languageId]] ≠ 'und');
    *  3. Gopher quality rules ([[TextAnalysis.gopherGate]] keep);
    *  4. exact dedup (first occurrence per raw text);
    *  5. MinHash near-dup prune to component canonicals
    *     ([[Dedup.minhashNearDupPairs]] → [[Dedup.pruneToCanonical]],
    *     banded candidates + exact-Jaccard verify — never all-pairs);
    *  6. decontamination against the holdout's 4-gram shingles
    *     ([[Dedup.decontaminate]], broadcast bench set).
    *
    * Scale shape: each stage's filter is the documented shape of its
    * standalone operator. The stage frames MATERIALIZE ONCE
    * (localCheckpoint after the expensive gates) because the funnel
    * reads every stage several times — once for its count branch and
    * once per downstream stage; Catalyst has no cross-branch
    * common-subexpression reuse, so the lazy form re-derives the whole
    * chain per branch (measured 19.5 s → 4 s at sf0.01). At true corpus
    * scale the same frames persist to disk-backed storage; the
    * composition is still one operator call producing one report. */
  def finewebFunnel(docs: DataFrame): DataFrame = {
    val ntok = size(TextFns.tokens(col("text"))).cast("long")
    // Round 16 (guide §2.4 duplicated subtrees): tokenize each document
    // ONCE and carry the token count through the funnel as a column. The
    // round-15 before-plan showed the tokens() subtree re-evaluated in
    // EVERY stage's aggregate (7 re-tokenizations of text that later
    // stages had already materialized); the checkpointed stage frames now
    // carry `__ntok`, so each survivor report sums an 8-byte long.
    val base = docs.select(col("doc_id"), col("text"), ntok.as("__ntok"))
    val holdoutCond = col("doc_id") % 17 =!= 0
    val c1 = base.filter(holdoutCond)
    val c2 = c1.filter(TextAnalysis.languageId(col("text")) =!= "und")
      .localCheckpoint(eager = true)
    val gateKeep = TextAnalysis.gopherGate(c2, "text", "doc_id")
      .filter(col("keep")).select("doc_id")
    val c3 = c2.join(gateKeep, Seq("doc_id"), "left_semi")
      .localCheckpoint(eager = true)
    val firsts = c3.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val c4 = c3.join(firsts, Seq("doc_id"), "left_semi")
      .localCheckpoint(eager = true)
    val pairs = Dedup.minhashNearDupPairs(c4.select("doc_id", "text"),
      "text", "doc_id", n = 4, k = 32, bands = 8, minJaccard = 0.5,
      family = Dedup.PortableFamily)
    val c5 = Dedup.pruneToCanonical(c4, pairs, "doc_id")
      .localCheckpoint(eager = true)
    val clean = Dedup.decontaminate(c5, docs.filter(col("doc_id") % 17 === 0),
        "text", "doc_id", n = 4)
      .filter(!col("contaminated")).select("doc_id")
    val c6 = c5.join(clean, Seq("doc_id"), "left_semi")
    // stages 0 and 1 read the same raw scan — ONE conditional aggregate
    // pass serves both reports instead of two full tokenize-and-scan jobs
    val s01 = base.agg(
        count(lit(1)).as("n0"),
        coalesce(sum(col("__ntok")), lit(0L)).as("t0"),
        count(when(holdoutCond, 1)).as("n1"),
        coalesce(sum(when(holdoutCond, col("__ntok"))), lit(0L)).as("t1"))
      .select(explode(array(
        struct(lit(0).as("stage_idx"), lit("0_raw").as("stage"),
          col("n0").as("n_docs"), col("t0").as("total_tokens")),
        struct(lit(1).as("stage_idx"), lit("1_eval_holdout").as("stage"),
          col("n1").as("n_docs"), col("t1").as("total_tokens")))).as("r"))
      .select("r.*")
    val stages = Seq(
      (2, "2_lang_id", c2), (3, "3_gopher_gate", c3),
      (4, "4_exact_dedup", c4), (5, "5_near_dup", c5),
      (6, "6_decontaminated", c6))
    (s01 +: stages.map { case (i, nm, df) =>
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("__ntok")), lit(0L)).as("total_tokens"))
        .select(lit(i).as("stage_idx"), lit(nm).as("stage"),
          col("n_docs"), col("total_tokens"))
    }).reduce(_ unionAll _).orderBy("stage_idx")
  }

  /** CCNet-style language/perplexity bucket filter composed end to end
    * (Wenzek et al. 2020 §4: lang-ID each document, bucket it into
    * head/middle/tail by LM perplexity WITHIN its language, keep
    * head+middle): per (predicted lang, bucket), the doc/token mass and
    * the keep verdict — the report a CCNet-descendant curation run
    * publishes before materializing the filtered corpus. The LM is the
    * corpus unigram model ([[TextAnalysis.unigramLogPerplexity]] — the
    * exactly-reproducible degenerate case of CCNet's KenLM), lang-ID
    * the lexicon-hit classifier ([[TextAnalysis.languageId]]), both
    * already oracled standalone; this entry proves the composition.
    *
    * Bucket boundaries are the per-language exact interpolated 1/3 and
    * 2/3 perplexity percentiles, ROUND(6)ed — as are the per-doc
    * bits/token — before the <= comparisons, so the bucket edges are
    * engine-deterministic (the p10_percentile_gate convention). Exact
    * `percentile` buffers each language group in the aggregation
    * buffer; at true 100 TB scale swap `percentile_approx` in (the
    * qt_quantiles exact/approx split — the sketch twin is
    * bounds-checked there), kept exact here for the oracle.
    *
    * Scale shape: the perplexity frame is one co-partitioned token join
    * (its own documented shape); lang-ID is a scan projection; the
    * bucket bounds are O(langs) rows broadcast back; the report is one
    * map-side aggregation. */
  def ccnetBucketReport(docs: DataFrame): DataFrame = {
    val ppl = TextAnalysis.unigramLogPerplexity(docs, "text", "doc_id")
    val langed = docs.select(col("doc_id"),
      TextAnalysis.languageId(col("text")).as("lang_guess"))
    val scored = langed.join(ppl, Seq("doc_id"))
    val bounds = scored.groupBy("lang_guess")
      .agg(round(percentile(col("bits_per_token"), lit(1.0 / 3.0)), 6).as("__b1"),
        round(percentile(col("bits_per_token"), lit(2.0 / 3.0)), 6).as("__b2"))
    scored.join(broadcast(bounds), Seq("lang_guess"))
      .withColumn("bucket",
        when(col("bits_per_token") <= col("__b1"), "head")
          .when(col("bits_per_token") <= col("__b2"), "middle")
          .otherwise("tail"))
      .groupBy("lang_guess", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("bits_per_token")), 6).as("avg_bits_per_token"))
      .withColumn("kept", col("bucket") =!= "tail")
      .orderBy("lang_guess", "bucket")
  }

  /** DPO/RLHF preference-pair construction (Rafailov et al. 2023): from
    * a frame of scored candidate responses `(promptCol, idCol,
    * rewardCol)`, emit ONE (chosen, rejected) pair per prompt — the
    * highest- and lowest-reward candidates — kept only when the reward
    * margin clears `minMargin` (a pair the reward model barely separates
    * teaches the policy noise, the standard margin filter). Ties on
    * reward break deterministically on the candidate id (highest id
    * wins the chosen side, lowest the rejected), so the pair set is
    * engine- and layout-independent. Returns `(prompt, chosen_id,
    * rejected_id, chosen_reward, rejected_reward, margin,
    * n_candidates)`; callers join response text back on the ids.
    *
    * Scale shape: ONE map-side-combined aggregation on the prompt key —
    * `max_by`/`min_by` carry a single (id, reward) struct per partial
    * and merge in O(1), so a 100 TB response log reduces to O(prompts)
    * rows with one shuffle and no window sort. The margin filter runs
    * on the aggregate frame (row-local). */
  def dpoPairs(responses: DataFrame, promptCol: String, idCol: String,
               rewardCol: String, minMargin: Double): DataFrame = {
    val key = struct(col(rewardCol), col(idCol))
    val cand = struct(col(idCol).as("id"), col(rewardCol).as("r"))
    responses
      .groupBy(col(promptCol))
      .agg(count(lit(1)).as("n_candidates"),
        max_by(cand, key).as("__c"),
        min_by(cand, key).as("__j"))
      .where(col("__c.r") - col("__j.r") >= minMargin)
      .select(col(promptCol),
        col("__c.id").as("chosen_id"), col("__j.id").as("rejected_id"),
        col("__c.r").as("chosen_reward"), col("__j.r").as("rejected_reward"),
        round(col("__c.r") - col("__j.r"), 6).as("margin"),
        col("n_candidates"))
      .orderBy(promptCol)
  }
}
