package graft.tools

import graft._
import graft.functions.Sentiment
import graft.ml.MlpSentiment

/** Measurement probe for the V4 model runtime (SCALE.md): batched MLP
  * inference throughput through [[Sentiment.scoreWithModel]]'s
  * mapPartitions seam at batch sizes 100 and 1000 — the reference's
  * batch-100 loop vs a wider amortization window (ref
  * `Context_analyzer_RoBERTa_fun.py:623-647`). Prints one JSON line.
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.MlpBench"`. */
object MlpBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "mlp-bench")
    val p = java.nio.file.Files.createTempDirectory("mlpbench")
      .resolve("m.bin").toString
    MlpSentiment.save(MlpSentiment.defaultModel, p)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      // fan out BEFORE the checkpoint: the documents scan is one file
      // split at every SF (few-MB parquet), so without this the "seam
      // throughput" was a SINGLE-CORE number; at deployment scale input
      // splits provide this parallelism for free
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true) // isolate inference cost from the scan
    val n = docs.count()

    def run(bs: Int): Double = {
      val t0 = System.nanoTime()
      Sentiment.scoreWithModel(docs, MlpSentiment.batchScorer(p), batchSize = bs)
        .select("raw_label").filter("raw_label IS NOT NULL").count()
      (System.nanoTime() - t0) / 1e9
    }
    run(100) // warmup (session load + codegen)
    val t100 = Seq.fill(3)(run(100)).min
    val t1000 = Seq.fill(3)(run(1000)).min
    val fmt = (v: Double) => String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"sf":"$sfDir","rows":$n,"batch100_sec":${fmt(t100)},"batch1000_sec":${fmt(t1000)},"batch100_rows_per_sec":${fmt(n / t100)},"batch1000_rows_per_sec":${fmt(n / t1000)}}""")
    spark.stop()
  }
}
