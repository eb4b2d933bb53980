package graft

import graft.ml.AttnSentiment
import graft.functions.Sentiment

class AttnSentimentSpec extends SparkSpec {

  private val m = AttnSentiment.defaultModel

  test("artifact roundtrip: saved weights reload bit-identical and score identically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_attn_t").toString
    val path = s"$tmp/m.bin"
    AttnSentiment.save(m, path)
    val loaded = AttnSentiment.load(path)
    assert(loaded.d == m.d && loaded.maxLen == m.maxLen)
    assert(loaded.wq.flatten.toSeq == m.wq.flatten.toSeq)
    assert(loaded.w2.flatten.toSeq == m.w2.flatten.toSeq)
    val texts = Seq("the room was great", "slow service bad food", "", "one")
    assert(AttnSentiment.forward(loaded, texts) == AttnSentiment.forward(m, texts))
    sources.Artifacts.deleteRecursively(new java.io.File(tmp))
  }

  test("order-awareness: permuting tokens changes the score (not a bag-of-words)") {
    // the positional encoding makes token ORDER part of the
    // representation — the structural property no other seam scorer
    // (lexicon, hashed-logistic, MLP bag) has
    val a = "service was slow but the view made up for it completely"
    val b = a.split(" ").reverse.mkString(" ")
    val Seq((_, ca), (_, cb)) = AttnSentiment.forward(m, Seq(a, b))
    assert(ca != cb, "reversed token order must change the confidence")
  }

  test("bag-of-words scorers are order-blind on the same input (contrast)") {
    val a = "service was slow but the view made up for it completely"
    val b = a.split(" ").reverse.mkString(" ")
    assert(Sentiment.hashedBatchScorer(Seq(a, b)).distinct.size == 1)
  }

  test("empty and whitespace-only texts score (POSITIVE, 0.5)") {
    assert(AttnSentiment.forward(m, Seq("", "   ", "\t\n")) ==
      Seq(("POSITIVE", 0.5), ("POSITIVE", 0.5), ("POSITIVE", 0.5)))
  }

  test("batch invariance: a text scores identically alone and inside a batch") {
    val texts = Seq("good clean fast", "terrible rude broken mess",
      "the location is central and the price fair")
    val solo = texts.map(t => AttnSentiment.forward(m, Seq(t)).head)
    assert(AttnSentiment.forward(m, texts) == solo)
  }

  test("max-seq-len truncation: tokens beyond MaxLen never affect the score") {
    val head = (1 to AttnSentiment.MaxLen).map(i => s"tok$i").mkString(" ")
    val Seq(s1, s2) =
      AttnSentiment.forward(m, Seq(head, head + " extra words beyond the window"))
    assert(s1._2 == s2._2 && s1._1 == s2._1)
    // ...but a token INSIDE the window does
    val inside = ("CHANGED" +: (2 to AttnSentiment.MaxLen).map(i => s"tok$i")).mkString(" ")
    assert(AttnSentiment.forward(m, Seq(inside)).head._2 != s1._2)
  }

  test("calibration: all three classes appear downstream of F8 on the corpus") {
    val localModel = AttnSentiment.defaultModel // local: the task closure
    // must not capture the (non-serializable) spec instance via a field
    val scored = Sentiment.scoreWithModel(
      Tables.documents(spark, sf0001).select("doc_id", "text"),
      AttnSentiment.forward(localModel, _))
    val classes = scored.select("sentiment").distinct()
      .collect().map(_.getString(0)).toSet
    assert(classes.contains("NEUTRAL") &&
      (classes.contains("POSITIVE") || classes.contains("NEGATIVE")))
  }

  test("integer bounds hold on adversarial input (no overflow in the Long math)") {
    // MaxLen copies of the token whose embedding components are extreme
    // would be the worst case; a long pathological string exercises the
    // audited bound chain end to end without exceptions
    val big = Array.fill(200)("zzzzzzzzzz").mkString(" ")
    val (_, conf) = AttnSentiment.forward(m, Seq(big)).head
    assert(conf >= 0.5 && conf <= 0.99)
  }
}
