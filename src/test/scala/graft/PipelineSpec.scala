package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("EP1 end-to-end: analyze + write produces the full artifact set") {
    val out = Files.createTempDirectory("graft-pipeline").toString
    val r = Pipeline.analyzeAndWrite(spark, sf0001, out)
    assert(r.distribution.count() == 3)
    assert(r.trends.count() == 30)
    assert(r.stats.collect()(0).getAs[Long]("total_samples") == 500L)
    val risk = r.risk.collect()(0)
    assert(Set("Low", "Medium", "High", "Critical").contains(risk.getAs[String]("risk_level")))
    assert(r.representatives.count() > 0)
    assert(r.chatContext.count() == 1)
    assert(r.resultsDocument.count() == 1)
    assert(r.summaryPrompts.count() == 3) // one prompt per sentiment class
    // artifacts on disk
    assert(spark.read.json(s"$out/comments").count() == 500)
    assert(spark.read.json(s"$out/insurance_risk").count() == 1)
    assert(new java.io.File(s"$out/complete_results").exists())
    assert(new java.io.File(s"$out/blocks").exists())
  }

  test("TrainingPipeline.corpusReport: composition invariants vs stagewise recompute") {
    val docs = Tables.documents(spark, sf0001)
    val out = operators.TrainingPipeline.corpusReport(docs).collect()
    assert(out.nonEmpty)
    // stagewise recompute: the report's doc total equals gate -> prune ->
    // split applied one stage at a time
    val gated = docs.filter(col("n_chars") >= 30)
    val pruned = operators.Dedup.pruneToCanonical(gated,
      operators.Dedup.minhashNearDupPairs(gated.select("doc_id", "text"),
        "text", "doc_id", n = 4, k = 32, bands = 8, minJaccard = 0.5,
        family = operators.Dedup.PortableFamily), "doc_id")
    val nTrain = pruned
      .filter(operators.TextAnalysis.datasetSplit(col("doc_id")) === "train").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nTrain)
    // avg consistency per row
    out.foreach { r =>
      val want = BigDecimal(r.getAs[Long]("total_tokens").toDouble / r.getAs[Long]("n_docs"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("avg_tokens") == want)
    }
  }

  test("sftShardReport: every example lands exactly once, load ratios centre on 1") {
    val s = spark
    import s.implicits._
    // 40 turns -> 10 conversations of 4 -> 20 assistant-turn examples
    val turns = (0L until 40L).map(i => (i / 4, i,
      if (i % 2 == 0) "user" else "assistant", s"m$i words " * (i % 7 + 1).toInt))
      .map { case (c, q, r, t) => (c, q, r, t.trim) }
      .toDF("conv_id", "seq", "role", "content")
    val out = operators.TrainingPipeline.sftShardReport(turns, nShards = 4).collect()
    assert(out.map(_.getAs[Long]("n_examples")).sum == 20L)
    assert(out.length == 4)
    val ratios = out.map(_.getAs[Double]("load_ratio"))
    assert(math.abs(ratios.sum - 4.0) < 1e-4) // ratios average to 1
    // snake balance: no shard more than 60% above or below the mean
    assert(ratios.forall(r => r > 0.4 && r < 1.6), ratios.mkString(","))
    // composition consistency: total chars equals the standalone stages
    val exChars = operators.Serving.sftExamples(turns)
      .agg(org.apache.spark.sql.functions.sum("n_chars")).collect().head.getLong(0)
    assert(out.map(_.getAs[Long]("total_chars")).sum == exChars)
  }

  test("sftShardReport: dense per-conversation seqs stay unique — deterministic under n_chars ties") {
    val s = spark
    import s.implicits._
    // 8 conversations with the DENSE 0-based per-conversation seq the SFT
    // family documents, IDENTICAL content so every example's n_chars ties:
    // the shard plan's rank tie-break must come from the (conv_id, seq)
    // derived ex_id, never from seq alone (which collides across convs)
    val turns = (for { c <- 0L until 8L; q <- 0 to 3 } yield
      (c, q.toLong, if (q % 2 == 0) "user" else "assistant", "same text"))
      .toDF("conv_id", "seq", "role", "content")
    def run(df: org.apache.spark.sql.DataFrame) =
      operators.TrainingPipeline.sftShardReport(df, nShards = 4)
        .collect().map(r => (r.getInt(0), r.getAs[Long]("n_examples"),
          r.getAs[Long]("total_chars"))).toSeq
    val a = run(turns)
    val b = run(turns.repartition(7))
    assert(a == b) // total order on (n_chars, ex_id) -> layout-independent
    assert(a.map(_._2).sum == 16L) // exactly once: 2 assistant turns x 8
  }

  test("finewebFunnel: monotone survivor counts, stages reconcile with the standalone operators") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, "/root/testdata/sf0.001")
    val out = operators.TrainingPipeline.finewebFunnel(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens")))
    assert(out.map(_._1).toSeq == (0 to 6))
    // the funnel only ever removes: counts and token mass non-increasing
    assert(out.sliding(2).forall { case Array(a, b) => b._3 <= a._3 && b._4 <= a._4 })
    // stage 0 is the raw corpus; stage 1 removes exactly the holdout
    assert(out(0)._3 == docs.count())
    assert(out(1)._3 == docs.filter(col("doc_id") % 17 =!= 0).count())
    // stage 2 reconciles with the standalone language-ID gate
    val langKept = docs.filter(col("doc_id") % 17 =!= 0)
      .filter(operators.TextAnalysis.languageId(col("text")) =!= "und").count()
    assert(out(2)._3 == langKept)
    assert(out(6)._3 > 0) // something survives the whole funnel
  }

  test("ccnetBucketReport: buckets partition each language, tail dropped, masses conserved") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, "/root/testdata/sf0.001")
    val out = operators.TrainingPipeline.ccnetBucketReport(docs).collect()
    // buckets partition: per-lang doc mass equals the lang's doc count
    val perLang = out.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val scoredDocs = out.map(_.getAs[Long]("n_docs")).sum
    val nonEmpty = docs.filter(org.apache.spark.sql.functions.expr(
      "size(filter(split(trim(regexp_replace(text, '\\\\s+', ' ')), ' '), t -> t != '')) > 0")).count()
    assert(scoredDocs == nonEmpty) // empty docs have no entropy, rest bucketed
    // the keep verdict is exactly bucket != tail
    assert(out.forall(r => r.getAs[Boolean]("kept") == (r.getString(1) != "tail")))
    // within every language with >= 3 docs, all three buckets appear and
    // head mean <= middle mean <= tail mean (buckets order by perplexity)
    for ((lang, rows) <- out.groupBy(_.getString(0)) if perLang(lang) >= 3) {
      val m = rows.map(r => r.getString(1) -> r.getAs[Double]("avg_bits_per_token")).toMap
      assert(m.contains("head") && m.contains("tail"), s"$lang: ${m.keySet}")
      assert(m("head") <= m.getOrElse("middle", m("tail")))
      assert(m.getOrElse("middle", m("head")) <= m("tail"))
    }
  }

  test("dpoPairs: argmax/argmin pairing, margin filter, deterministic tie-breaks") {
    val s = spark
    import s.implicits._
    val resp = Seq(
      // prompt 1: clear margin 0.8
      (1L, 10L, 1.0), (1L, 11L, 0.5), (1L, 12L, 0.2),
      // prompt 2: margin 0.1 < 0.3 -> filtered
      (2L, 20L, 0.5), (2L, 21L, 0.4),
      // prompt 3: single candidate, margin 0 -> filtered
      (3L, 30L, 0.9),
      // prompt 4: reward ties everywhere -> chosen = max id, rejected =
      // min id, margin 0 -> filtered (a tie teaches nothing)
      (4L, 40L, 0.7), (4L, 41L, 0.7),
      // prompt 5: tie on the max only -> chosen id 51 (highest), margin ok
      (5L, 50L, 0.9), (5L, 51L, 0.9), (5L, 52L, 0.1))
      .toDF("prompt_id", "resp_id", "reward")
    val out = operators.TrainingPipeline.dpoPairs(
        resp, "prompt_id", "resp_id", "reward", minMargin = 0.3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6)))).toMap
    assert(out.keySet == Set(1L, 5L))
    assert(out(1L) == ((10L, 12L, 1.0, 0.2, 0.8, 3L)))
    // chosen breaks the 0.9 tie to the HIGHEST id (51); rejected is the
    // true argmin (52 at 0.1), so the margin is 0.8
    assert(out(5L) == ((51L, 52L, 0.9, 0.1, 0.8, 3L)))
  }
}
