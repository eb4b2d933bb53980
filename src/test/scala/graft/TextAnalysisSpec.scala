package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("language ID: function-word argmax with und fallback") {
    assert(evalText("the cat and the dog is here")(TextAnalysis.languageId(col("text"))) == "en")
    assert(evalText("el perro es una maravilla y los gatos")(TextAnalysis.languageId(col("text"))) == "es")
    assert(evalText("der Hund und die Katze ist da")(TextAnalysis.languageId(col("text"))) == "de")
    assert(evalText("xyzzy plugh frobnicate")(TextAnalysis.languageId(col("text"))) == "und")
  }

  test("quality score stays in [0,1] and rewards longer clean text") {
    val short = evalText("hi")(TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    val long = evalText(("the word " * 40).trim)(TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    assert(short >= 0.0 && short <= 1.0 && long >= 0.0 && long <= 1.0)
    assert(long > short)
  }

  test("token counts: whitespace vs BPE-ish segmentation") {
    assert(evalText("ab cd-ef 12")(TextAnalysis.whitespaceTokenCount(col("text"))) == 3L)
    // [ab][cd][-][ef][12] → 5
    assert(evalText("ab cd-ef 12")(TextAnalysis.bpeishTokenCount(col("text")).cast("long")) == 5L)
  }

  test("fingerprint: deterministic, order-sensitive, bounded") {
    val a = evalText("alpha beta gamma")(TextAnalysis.fingerprint(col("text"))).asInstanceOf[Long]
    val b = evalText("alpha beta gamma")(TextAnalysis.fingerprint(col("text"))).asInstanceOf[Long]
    val c = evalText("gamma beta alpha")(TextAnalysis.fingerprint(col("text"))).asInstanceOf[Long]
    assert(a == b)
    assert(a != c)
    assert(a >= 0 && a < 1000000007L)
  }
}
