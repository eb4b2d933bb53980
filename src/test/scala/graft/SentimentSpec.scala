package graft

import org.apache.spark.sql.functions._
import graft.functions.Sentiment
import graft.operators.Analytics

class SentimentSpec extends SparkSpec {

  private def scoreOf(text: String) = {
    val s = spark
    import s.implicits._
    Sentiment.score(Seq((1L, text)).toDF("doc_id", "text")).collect()(0)
  }

  test("lexicon scorer: positive dominance → POSITIVE with high confidence") {
    val r = scoreOf("fast fast fast fast small value ok ok")
    assert(r.getAs[String]("raw_label") == "POSITIVE")
    assert(r.getAs[String]("sentiment") == "POSITIVE")
    // pos=6, neg=0, wc=8 → min(0.99, 0.5 + 0.72 + 0.03) = 0.99
    assert(math.abs(r.getAs[Double]("confidence") - 0.99) < 1e-12)
  }

  test("lexicon scorer: negative dominance → NEGATIVE") {
    val r = scoreOf("slow slow big big dup and more words here")
    assert(r.getAs[String]("sentiment") == "NEGATIVE")
  }

  test("F8 thresholding: weak polarity → NEUTRAL (keeps raw label)") {
    val r = scoreOf("just some plain words")
    assert(r.getAs[String]("sentiment") == "NEUTRAL")
    assert(Set("POSITIVE", "NEGATIVE").contains(r.getAs[String]("raw_label")))
  }

  test("F7 original score: wc <= 4 floor, then 0.05/word + 0.1/keyword") {
    assert(scoreOf("one two three four").getAs[Double]("original_score") == 0.0)
    // wc=10, POSITIVE (6 pos hits), contains fast+small+value → 0.05*6 + 0.1*3
    val r = scoreOf("fast fast fast fast fast small value pad pad pad")
    assert(r.getAs[String]("sentiment") == "POSITIVE")
    assert(math.abs(r.getAs[Double]("original_score") - (0.05 * 6 + 0.1 * 3)) < 1e-12)
  }

  test("A3 normalization: [0,1] within group, degenerate group → 0.5") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("POSITIVE", 1.0), ("POSITIVE", 2.0), ("POSITIVE", 3.0),
      ("NEGATIVE", 7.0), ("NEGATIVE", 7.0)
    ).toDF("sentiment", "original_score")
    val out = Analytics.normalizeScores(df)
      .select("sentiment", "original_score", "normalized_score")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(out == Set(
      ("POSITIVE", 1.0, 0.0), ("POSITIVE", 2.0, 0.5), ("POSITIVE", 3.0, 1.0),
      ("NEGATIVE", 7.0, 0.5), ("NEGATIVE", 7.0, 0.5)))
  }

  test("F8 totality: every corpus row lands in one of the three classes") {
    val classes = Sentiment.score(Tables.documents(spark, sf0001))
      .select("sentiment").distinct().collect().map(_.getString(0)).toSet
    assert(classes.subsetOf(Set("POSITIVE", "NEGATIVE", "NEUTRAL")))
    assert(classes.size == 3) // calibrated to populate all three on testdata
  }

  test("V4 seam: mapPartitions batch scorer is bit-identical to the expression path") {
    val docs = Tables.documents(spark, sf0001)
    val cols = Seq("doc_id", "raw_label", "confidence", "sentiment", "original_score")
    val viaExpr = Sentiment.score(docs)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val viaModel = Sentiment.scoreWithModel(docs, Sentiment.lexiconBatchScorer)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(viaModel == viaExpr)
    assert(viaModel.nonEmpty)
  }

  test("hash60 byte math equals the md5 hex-prefix expression (oracle contract)") {
    // the driver-side scorer's hash must agree bit-for-bit with the SQL
    // expression the oracle replays: CAST(conv(substr(md5(t),1,15),16,10))
    val s = spark
    import s.implicits._
    val toks = Seq("tok", "w:123", "alpha", "value", "Ωθ-mixed", "")
    val exprVals = toks.toDF("t")
      .select(org.apache.spark.sql.functions.conv(
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("t")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .collect().map(_.getLong(0))
    toks.zip(exprVals).foreach { case (t, expect) =>
      assert(Sentiment.hash60(t) == expect, s"hash60('$t')")
    }
  }

  test("V4 seam: hashed scorer genuinely disagrees with the lexicon, downstream intact") {
    val docs = Tables.documents(spark, sf0001)
    val lex = Sentiment.score(docs)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("sentiment").as("lex"))
    val seam = Sentiment.scoreWithModel(
        docs.select("doc_id", "text"), Sentiment.hashedBatchScorer)
    // a real second opinion: off-diagonal mass is non-empty
    val joined = lex.join(seam.select(
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("sentiment").as("hm")), "doc_id")
    assert(joined.filter("lex <> hm").count() > 0,
      "hashed scorer never disagreed with the lexicon — not a real model swap")
    // F8 produces all three classes from the hashed confidences too
    val classes = seam.select("sentiment").distinct()
      .collect().map(_.getString(0)).toSet
    assert(classes == Set("POSITIVE", "NEGATIVE", "NEUTRAL"))
    // downstream F7 stays model-agnostic: original_score honors the wc<=4
    // floor and the per-class keyword formula regardless of the scorer
    val bad = seam.filter("wc <= 4 AND original_score <> 0.0").count()
    assert(bad == 0)
  }

  test("MLP model runtime: artifact round-trips bit-exactly") {
    val m = graft.ml.MlpSentiment.defaultModel
    val p = java.nio.file.Files.createTempDirectory("mlp").resolve("m.bin").toString
    graft.ml.MlpSentiment.save(m, p)
    val r = graft.ml.MlpSentiment.load(p)
    assert(r.v == m.v && r.h == m.h)
    assert(r.w1.flatten.toSeq == m.w1.flatten.toSeq)
    assert(r.b1.sameElements(m.b1))
    assert(r.w2.flatten.toSeq == m.w2.flatten.toSeq)
    assert(r.b2.sameElements(m.b2))
    // the session cache hands back the loaded artifact, and only loads once
    assert(graft.ml.MlpSentiment.sessionFor(p) eq graft.ml.MlpSentiment.sessionFor(p))
  }

  test("MLP model runtime: batch size never changes the scores") {
    val m = graft.ml.MlpSentiment.defaultModel
    val p = java.nio.file.Files.createTempDirectory("mlp").resolve("m.bin").toString
    graft.ml.MlpSentiment.save(m, p)
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    def run(bs: Int) = Sentiment.scoreWithModel(docs,
        graft.ml.MlpSentiment.batchScorer(p), batchSize = bs)
      .select("doc_id", "raw_label", "confidence").orderBy("doc_id")
      .collect().toSeq
    // batch boundaries are pure amortization — per-row results identical
    assert(run(3) == run(1000))
  }

  test("MLP model runtime: a real third opinion, all classes reachable") {
    val m = graft.ml.MlpSentiment.defaultModel
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val texts = docs.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    val scored = graft.ml.MlpSentiment.forward(m, texts)
    // margins spread enough that F8 yields all three classes
    val classes = scored.map { case (lbl, conf) =>
      if (conf > Sentiment.ConfidenceThreshold) lbl else "NEUTRAL" }.toSet
    assert(classes == Set("POSITIVE", "NEGATIVE", "NEUTRAL"),
      s"degenerate class set $classes")
    // and it disagrees with the lexicon on some documents
    val lex = Sentiment.lexiconBatchScorer(texts)
    assert(scored.map(_._1).zip(lex.map(_._1)).exists { case (a, b) => a != b },
      "MLP never disagreed with the lexicon — not a real model swap")
  }
}
