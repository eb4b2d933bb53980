package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EP3 serving-layer assembly (SURVEY.md §3 EP3, §2.9 L3): the reference's
  * chatbot builds a deterministic context prompt from the engine outputs
  * (distribution + top words + top examples, ref
  * `chatbot_analyzer.py:120-182`); the LLM call itself is out of engine
  * scope, the assembly is a pure aggregation and is oracle-checked.
  *
  * Number formatting note: percentages are rendered via integer permille
  * arithmetic (never double→string, which differs across engines).
  */
object Serving {

  private def joinedLines(sortKey: Column, line: Column): Column =
    array_join(transform(sort_array(collect_list(struct(sortKey.as("k"), line.as("v")))),
      s => s.getField("v")), ", ")

  /** Single-row context frame: distribution_ctx, top_words_ctx, examples_ctx. */
  def chatContext(scored: DataFrame, topWords: DataFrame): DataFrame = {
    val total = Window.partitionBy()
    val dist = scored.groupBy("sentiment").agg(count(lit(1)).as("cnt"))
      .withColumn("pm", round(col("cnt") * lit(1000.0) / sum("cnt").over(total), 0).cast("long"))
      .withColumn("line", concat(col("sentiment"), lit(": "), col("cnt"),
        lit(" ("), (col("pm") / 10).cast("long"), lit("."), pmod(col("pm"), lit(10)), lit("%)")))
      .agg(joinedLines(col("sentiment"), col("line")).as("distribution_ctx"))

    val words = topWords
      .withColumn("line", concat(col("word"), lit(" ("), col("cnt"), lit(")")))
      .agg(joinedLines(struct((-col("cnt")).as("nc"), col("word")), col("line"))
        .as("top_words_ctx"))

    // argmax per class via max_by (declarative aggregate, map-side
    // partial) — a row_number window here would sort every fact row into
    // one task per sentiment class
    val examples = scored.groupBy("sentiment")
      .agg(max_by(substring(col("text"), 1, 80),
        struct(col("confidence"), (-col("doc_id")).as("neg_id"))).as("ex"))
      .withColumn("line", concat(col("sentiment"), lit(": "), col("ex")))
      .agg(joinedLines(col("sentiment"), col("line")).as("examples_ctx"))

    broadcast(dist).crossJoin(broadcast(words)).crossJoin(broadcast(examples))
  }

  /** EP2/S12 — the `/api/results/{job}/data` artifact merge
    * (ref `routes.py:182-231`): ONE nested row joining the trends array,
    * per-sentiment summaries, recommendations, and the statistics block
    * the frontend consumes. Summary/recommendation GENERATION is the
    * external-LLM seam (out of engine scope per SURVEY §2.9); the
    * deterministic assembly carries exactly the per-class evidence the
    * generator consumes — class count + highest-confidence example
    * (ref `summarize_sentiments_fun.py:134-143`,
    * `recommendation_fun.py:39-45`).
    *
    * Shape: everything reduces to single-row aggregates before the
    * broadcast cross-joins — O(1) assembled data at any input scale. */
  def resultsDocument(scored: DataFrame, trends: DataFrame): DataFrame = {
    val trendsArr = trends.agg(sort_array(collect_list(struct(
      col("date"), col("positive"), col("negative"), col("neutral"),
      col("total")))).as("trends"))
    val per = scored.groupBy("sentiment").agg(
      count(lit(1)).as("cnt"),
      max_by(substring(col("text"), 1, 80),
        struct(col("confidence"), (-col("doc_id")).as("neg_id"))).as("ex"))
    def summaryOf(cls: String): Column =
      max(when(col("sentiment") === cls, struct(
        lit(cls).as("sentiment_type"),
        col("cnt").as("num_comments_analyzed"),
        col("ex").as("summary")))).as(cls.toLowerCase + "_summary")
    def cntOf(cls: String): Column =
      coalesce(max(when(col("sentiment") === cls, col("cnt"))), lit(0L))
    val merged = per.agg(
      summaryOf("POSITIVE"), summaryOf("NEGATIVE"), summaryOf("NEUTRAL"),
      struct(
        // coalesce: an empty input must yield a zero-count statistics
        // block, not a NULL one (ref routes.py empty-results document)
        coalesce(sum(col("cnt")), lit(0L)).as("total_reviews"),
        cntOf("POSITIVE").as("positive"),
        cntOf("NEGATIVE").as("negative"),
        cntOf("NEUTRAL").as("neutral")).as("statistics"))
      .withColumn("recommendations", struct(
        col("positive_summary.summary").as("positive_basis"),
        col("negative_summary.summary").as("negative_basis")))
    broadcast(trendsArr).crossJoin(broadcast(merged))
      .select("trends", "positive_summary", "negative_summary",
        "neutral_summary", "recommendations", "statistics")
  }

  /** EP4 — the COMPLETE report document: every data-bearing field of the
    * reference's 10-section PDF report in ONE composed plan, one
    * flattened row (the data half of `pdf_generation/pdf_sections.py:
    * 20-561`; the ReportLab renderer stays out of engine scope per
    * SURVEY S11). Section → fields:
    *  - 1 title / 2 TOC / 4 methodology: static renderer text — no data;
    *  - 3 executive summary (`pdf_sections.py:76-110`): `source_info`,
    *    `total_comments`, per-class counts and `{:.1f}%` shares rendered
    *    via integer permille arithmetic (the F13 convention — never
    *    double→string);
    *  - 5 visualizations (`:205-254`): images (oos); the data feeding
    *    them is already the a1/a4/a8 catalog entries;
    *  - 6 vector-mean comments (`:286-318`): one representative + its
    *    confidence per class. The oracle-replayable representative here
    *    is the comment whose confidence is NEAREST THE CLASS MEAN
    *    (ties → lower doc_id) — "closest to the class centroid" in the
    *    one dimension DuckDB can replay bit-for-bit; the TF-IDF/KMeans
    *    V3 selection ([[graft.ml.Representatives]]) stays the library
    *    surface with its own rows-only entry. Text truncated at 300 +
    *    "..." (`:307-309`, F9);
    *  - 7 highest confidence (`:321-366`): per-class argmax-confidence
    *    comment (ties → lower doc_id = pandas idxmax-first), trunc 300;
    *  - 8 LLM summaries (`:369-416`) / 9 recommendations (`:419-453`):
    *    generation is the external-LLM seam; the per-class evidence the
    *    generator consumes (80-char top example, the ep2 convention) is
    *    the data — `summary_positive_basis` / `summary_negative_basis`;
    *  - 10 insurance risk (`:456-534`) + technical details (`:537-560`):
    *    the full [[Risk.insuranceRisk]] multiplier breakdown plus
    *    average confidence; `total_samples` ≡ `total_comments`.
    *
    * Scale shape: two map-side-combinable aggregations over the scored
    * corpus (class mean pass, then the per-class argmin/argmax pass —
    * the mean must exist before the nearest-to-mean reduction), the A4
    * trends aggregation, then everything is single-row broadcast
    * cross-joins — O(1) assembled data at any input scale. */
  def reportDocument(scored: DataFrame, trends: DataFrame,
                     sourceInfo: String = "documents"): DataFrame = {
    val cavg = scored.groupBy("sentiment")
      .agg(round(avg(col("confidence")), 9).as("cavg"))
    val t300 = graft.functions.TextFns.truncateWithEllipsis(col("text"), 300)
    val per = scored.join(broadcast(cavg), "sentiment")
      .groupBy("sentiment")
      .agg(
        count(lit(1)).as("cnt"),
        min_by(struct(t300.as("text"), col("confidence")),
          struct(abs(col("confidence") - col("cavg")).as("d"), col("doc_id")))
          .as("rep"),
        max_by(struct(t300.as("text"), col("confidence")),
          struct(col("confidence"), (-col("doc_id")).as("neg_id"))).as("hc"),
        max_by(substring(col("text"), 1, 80),
          struct(col("confidence"), (-col("doc_id")).as("neg_id"))).as("ex80"))
    def cOf(cls: String): Column =
      coalesce(max(when(col("sentiment") === cls, col("cnt"))), lit(0L))
    def fOf(cls: String, field: String): Column =
      max(when(col("sentiment") === cls, col(field)))
    val merged = per.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("total_comments"),
      cOf("POSITIVE").as("positive_cnt"),
      cOf("NEGATIVE").as("negative_cnt"),
      cOf("NEUTRAL").as("neutral_cnt"),
      fOf("POSITIVE", "rep.text").as("rep_positive_text"),
      fOf("POSITIVE", "rep.confidence").as("rep_positive_confidence"),
      fOf("NEGATIVE", "rep.text").as("rep_negative_text"),
      fOf("NEGATIVE", "rep.confidence").as("rep_negative_confidence"),
      fOf("NEUTRAL", "rep.text").as("rep_neutral_text"),
      fOf("NEUTRAL", "rep.confidence").as("rep_neutral_confidence"),
      fOf("POSITIVE", "hc.text").as("hc_positive_text"),
      fOf("POSITIVE", "hc.confidence").as("hc_positive_confidence"),
      fOf("NEGATIVE", "hc.text").as("hc_negative_text"),
      fOf("NEGATIVE", "hc.confidence").as("hc_negative_confidence"),
      fOf("NEUTRAL", "hc.text").as("hc_neutral_text"),
      fOf("NEUTRAL", "hc.confidence").as("hc_neutral_confidence"),
      fOf("POSITIVE", "ex80").as("summary_positive_basis"),
      fOf("NEGATIVE", "ex80").as("summary_negative_basis"))
    // {:.1f}% share via integer permille (the chatContext convention)
    def pct(cnt: Column): Column = {
      val pm = round(cnt * lit(1000.0) / col("total_comments"), 0).cast("long")
      concat((pm / 10).cast("long"), lit("."), pmod(pm, lit(10)))
    }
    val withPct = merged
      .withColumn("positive_pct", pct(col("positive_cnt")))
      .withColumn("negative_pct", pct(col("negative_cnt")))
      .withColumn("neutral_pct", pct(col("neutral_cnt")))
    val risk = Risk.insuranceRisk(scored, trends).select(
      col("insurance_cost"), col("risk_level"), col("risk_score"),
      col("sentiment_multiplier"), col("confidence_multiplier"),
      col("sample_multiplier"), col("trend_multiplier"), col("trend_status"),
      col("average_confidence").as("avg_confidence"))
    broadcast(withPct).crossJoin(broadcast(risk))
      .select(lit(sourceInfo).as("source_info") +: withPct.columns.map(col) ++:
        risk.columns.map(col): _*)
  }

  /** Renders a confidence as the reference's `{c:.2f}` (two decimals) via
    * integer-cent arithmetic — never double→string, which differs across
    * engines (see F13 conventions).
    *
    * Rounding convention: Spark `round` is HALF_UP (half away from zero),
    * Python's `{c:.2f}` is HALF_EVEN, so an exactly-representable .xx5
    * confidence renders 0.13 here vs the reference's 0.12. Deliberate: the
    * F13 convention pins HALF_UP engine-wide (engine and oracle agree);
    * model confidences are never exact half-cents in practice. */
  private def fmt2(c: Column): Column = {
    val cents = round(c * lit(100.0), 0).cast("long")
    concat((cents / 100).cast("long"), lit("."),
      lpad(pmod(cents, lit(100L)).cast("string"), 2, "0"))
  }

  /** L1 — the per-class summary prompt body (ref
    * `summarize_sentiments_fun.py:39-56`): the k highest-confidence
    * comments per sentiment class rendered as a numbered
    * `i. [Confidence: x.xx] text` list joined by blank lines, wrapped in
    * the reference's summary-prompt template. The LLM call itself is the
    * external seam; this assembly is the engine's deterministic output.
    *
    * Scale shape: per-class top-k via the bounded-heap [[graft.plans.TopK]]
    * aggregate (<= k rows per (task, class) shuffled) — never a window over
    * the fact rows partitioned by a 3-value key. */
  def summaryPrompts(scored: DataFrame, k: Int = 10): DataFrame = {
    val top = scored.groupBy("sentiment").agg(
      graft.plans.TopK.topKByScore(
        col("confidence"), col("doc_id"),
        struct(col("confidence"), col("text")), k).as("comments"))
    val lines = transform(col("comments"), (x, i) =>
      concat((i + lit(1)).cast("string"), lit(". [Confidence: "),
        fmt2(x.getField("confidence")), lit("] "), x.getField("text")))
    top.select(
      col("sentiment"),
      concat(
        lit("Analyze the following "), upper(col("sentiment")),
        lit(" comments from customer reviews and provide a concise summary in EXACTLY 2-3 sentences.\n\n"),
        upper(col("sentiment")), lit(" COMMENTS:\n"),
        array_join(lines, "\n\n"),
        lit("\n\nWrite a brief summary (2-3 sentences ONLY) explaining what aspects the commenters found "),
        lower(col("sentiment")),
        lit(". Focus on the main themes and common patterns.\n\nSummary:")).as("prompt"))
      .orderBy("sentiment")
  }

  /** L2 — the recommendation prompt (ref `recommendation_fun.py:39-51`):
    * composes the caller's base prompt with the positive/negative evidence
    * carried by [[resultsDocument]]'s `recommendations` block. Single-row,
    * O(1) assembled data. */
  def recommendationPrompt(scored: DataFrame, trends: DataFrame,
      basePrompt: String): DataFrame =
    resultsDocument(scored, trends).select(
      concat(
        lit(basePrompt),
        lit("\n\nPOSITIVE FEEDBACK SUMMARY:\n"),
        col("recommendations.positive_basis"),
        lit("\n\nNEGATIVE FEEDBACK SUMMARY:\n"),
        col("recommendations.negative_basis"),
        lit("\n\nPlease provide 3 actionable recommendations:")).as("reco_prompt"))

  /** [[resultsDocument]] re-shaped for scalar-cell consumers (the
    * correctness gate hashes cells with pandas, which cannot hash a
    * struct): every nested field becomes a dotted top-level column and the
    * trends array becomes one compact-JSON string column. Same single
    * broadcast row; the nested [[resultsDocument]] stays the library
    * surface. */
  def resultsDocumentFlat(scored: DataFrame, trends: DataFrame): DataFrame = {
    def cls(prefix: String): Seq[Column] = Seq(
      col(s"${prefix}_summary.sentiment_type").as(s"${prefix}_summary_sentiment_type"),
      col(s"${prefix}_summary.num_comments_analyzed").as(s"${prefix}_summary_num_comments"),
      col(s"${prefix}_summary.summary").as(s"${prefix}_summary_summary"))
    resultsDocument(scored, trends).select(
      to_json(col("trends")).as("trends_json") +:
        (cls("positive") ++ cls("negative") ++ cls("neutral") ++ Seq(
          col("recommendations.positive_basis").as("recommendations_positive_basis"),
          col("recommendations.negative_basis").as("recommendations_negative_basis"),
          col("statistics.total_reviews").as("statistics_total_reviews"),
          col("statistics.positive").as("statistics_positive"),
          col("statistics.negative").as("statistics_negative"),
          col("statistics.neutral").as("statistics_neutral"))): _*)
  }

  /** The reference's static suggested-question pool
    * (ref `chatbot_analyzer.py:252-263`), in order. */
  val SuggestedQuestionPool: Seq[String] = Seq(
    "What are the main issues customers are complaining about?",
    "What do customers like most about the service?",
    "What should we prioritize fixing first?",
    "Show me examples of negative feedback about food quality",
    "What percentage of reviews are positive?",
    "What are the common themes in negative reviews?",
    "What improvements would have the biggest impact?",
    "Are there any seasonal trends in the sentiment?",
    "What specific words appear most in negative reviews?",
    "How does the positive feedback compare to negative?")

  /** EP3/L3 — the chatbot's suggested-questions list
    * (ref `chatbot_analyzer.py:250-272`): the 10-item static pool with two
    * data-dependent inserts — "Summarize the negative feedback" prepended
    * when a negative summary exists, "What are your top recommendations?"
    * inserted at position 1 when recommendations exist — trimmed to 8.
    *
    * The reference's existence checks are on artifact files; the
    * deterministic engine analog: a negative summary exists iff the
    * results document carries one (NEGATIVE class non-empty), and
    * recommendations exist iff both evidence bases are present (the
    * recommendation generator consumes both, ref
    * `recommendation_fun.py:39-45`). Rows (rank, question) — O(1) data. */
  def suggestedQuestions(scored: DataFrame, trends: DataFrame): DataFrame = {
    val hasNeg = col("negative_summary.summary").isNotNull
    val hasReco = col("recommendations.positive_basis").isNotNull &&
      col("recommendations.negative_basis").isNotNull
    val base = array(SuggestedQuestionPool.map(lit): _*)
    val l1 = when(hasNeg,
      concat(array(lit("Summarize the negative feedback")), base)).otherwise(base)
    val l2 = when(hasReco,
      concat(slice(l1, 1, 1), array(lit("What are your top recommendations?")),
        slice(l1, lit(2), size(l1) - 1))).otherwise(l1)
    resultsDocument(scored, trends)
      .select(posexplode(slice(l2, 1, 8)))
      .select((col("pos") + 1).cast("int").as("rank"), col("col").as("question"))
      .orderBy("rank")
  }

  /** L3 — the chat-message assembly with the reference's history window
    * (ref `chatbot_analyzer.py:228-236`): the LAST FOUR history messages
    * (two exchanges) by sequence, then the current user question appended.
    * Rows (pos, role, content). History is conversation state — bounded
    * (tens of rows), so the collect_list is O(conversation), never
    * O(corpus). */
  def chatMessages(history: DataFrame, question: String): DataFrame = {
    val all = sort_array(collect_list(struct(
      col("seq"), col("role"), col("content"))))
    // Python's [-4:] keeps a shorter list whole; Spark's slice returns []
    // when |start| exceeds the size, so clamp the start to -size (and skip
    // the slice entirely for an empty history — slice(_, 0, _) throws)
    val m = when(size(all) === 0, all)
      .otherwise(slice(all, greatest(lit(-4), -size(all)), lit(4)))
    history.agg(m.as("m"))
      .select(posexplode(concat(col("m"), array(struct(
        lit(Long.MaxValue).as("seq"), lit("user").as("role"),
        lit(question).as("content"))))))
      .select((col("pos") + 1).cast("int").as("pos"),
        col("col.role").as("role"), col("col.content").as("content"))
      .orderBy("pos")
  }

  /** SFT training-example construction — the turn-level companion to the
    * doc-level packing ops (`pk_sequence_packing`): from a conversation
    * frame `(convCol, seqCol, roleCol, contentCol)`, emit ONE training
    * example per ASSISTANT turn, rendered with a fixed chat template
    * (`<|role|>\n content \n` per turn):
    *
    *  - `prompt` — every prior turn rendered in sequence order, plus the
    *    `<|assistant|>\n` generation header;
    *  - `target` — the assistant turn's content (the completion the loss
    *    is computed on);
    *  - `loss_start` — the char offset where the target begins
    *    (= `length(prompt)`), the loss-mask boundary a tokenizing writer
    *    downstream converts to a token index;
    *  - `n_context_turns`, `n_chars` — curriculum/packing metadata.
    *
    * Scale shape: ONE window partitioned by conversation (bounded per-
    * conversation group — conversations are tens of turns, never
    * corpus-sized) builds the running rendered prefix with a
    * rows-between collect_list; everything else is row-local string
    * algebra in the projection. No corpus-wide window, no driver
    * collect; examples shuffle once on the conversation key. */
  def sftExamples(turns: DataFrame, convCol: String = "conv_id",
                  seqCol: String = "seq", roleCol: String = "role",
                  contentCol: String = "content"): DataFrame = {
    val w = Window.partitionBy(convCol).orderBy(seqCol)
    val withPrefix = turns
      .withColumn("__block", concat(lit("<|"), col(roleCol), lit("|>\n"),
        col(contentCol), lit("\n")))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prefix", concat_ws("", collect_list(col("__block"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))))
    withPrefix.filter(col(roleCol) === "assistant")
      .select(col(convCol), col(seqCol).as("turn_seq"),
        (col("__rn") - 1).cast("int").as("n_context_turns"),
        concat(col("__prefix"), lit("<|assistant|>\n")).as("prompt"),
        col(contentCol).as("target"))
      .withColumn("loss_start", length(col("prompt")).cast("int"))
      .withColumn("n_chars",
        (length(col("prompt")) + length(col("target"))).cast("int"))
      .orderBy(convCol, "turn_seq")
  }
}
