package graft

/** Dev probe (not a test): margin distribution of the attention scorer
  * over the sf0.01 documents corpus, for calibrating
  * [[graft.ml.AttnSentiment.ConfDenom]] so the F8 threshold (0.8) yields
  * all three classes. Run: `sbt "Test/runMain graft.AttnProbeMain"`. */
object AttnProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "attn-probe")
    val texts = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("text").collect().map(_.getString(0)).toSeq
    val m = ml.AttnSentiment.defaultModel
    // margins recomputed inline (forward returns conf post-normalization)
    val margins = texts.map { t =>
      val toks = t.trim.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty)
      val n = math.min(toks.length, m.maxLen)
      (ml.AttnSentiment.forward(m, Seq(t)).head, n)
    }
    val confs = margins.map(_._1._2)
    val labels = margins.map(_._1._1)
    println(s"docs=${texts.size} pos=${labels.count(_ == "POSITIVE")} neg=${labels.count(_ == "NEGATIVE")}")
    val sorted = confs.sorted
    def pct(p: Double) = sorted(((sorted.size - 1) * p).toInt)
    println(f"conf p10=${pct(0.1)}%.4f p50=${pct(0.5)}%.4f p90=${pct(0.9)}%.4f max=${sorted.last}%.4f")
    val neutral = confs.count(_ <= 0.8)
    println(s"with threshold 0.8: NEUTRAL=$neutral POS=${margins.count(x => x._1._2 > 0.8 && x._1._1 == "POSITIVE")} NEG=${margins.count(x => x._1._2 > 0.8 && x._1._1 == "NEGATIVE")}")
    spark.stop()
  }
}
