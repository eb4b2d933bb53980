package graft

/** Measurement probe for tok_bpe_train round cost (not a test). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "bpe-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val wc = operators.Tokenizer.wordCounts(Tables.documents(spark, "/root/testdata/sf0.1"))
    val n = wc.count()
    println(s"vocab=$n")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    t("warm train 16")(operators.Tokenizer.bpeTrain(wc, 16).collect())
    t("train 16")(operators.Tokenizer.bpeTrain(wc, 16).collect())
    t("train 4")(operators.Tokenizer.bpeTrain(wc, 4).collect())
    t("train 1")(operators.Tokenizer.bpeTrain(wc, 1).collect())
    spark.stop()
  }
}
