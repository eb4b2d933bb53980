package graft.tools

import graft._
import graft.functions.Sentiment
import graft.ml.AttnSentiment

/** Measurement probe for the attention runtime (SCALE.md): batched
  * single-block self-attention inference through
  * [[Sentiment.scoreWithModel]]'s mapPartitions seam — arrival-order vs
  * length-sorted-within-partition input (the v4_length_batching
  * discipline: attention cost is quadratic in sequence length, so
  * mixed-length batches are max-bound while sorted batches are
  * near-uniform). Prints one JSON line. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.AttnBench"`. */
object AttnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "attn-bench")
    import org.apache.spark.sql.functions._
    val p = java.nio.file.Files.createTempDirectory("attnbench")
      .resolve("m.bin").toString
    AttnSentiment.save(AttnSentiment.defaultModel, p)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      // fan out BEFORE the checkpoint: the documents scan is one file
      // split at every SF (few-MB parquet), so without this the "seam
      // throughput" was a SINGLE-CORE number; at deployment scale input
      // splits provide this parallelism for free
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true) // isolate inference cost from the scan
    val sorted = docs
      .sortWithinPartitions(size(functions.TextFns.tokens(col("text"))))
      .localCheckpoint(true)
    val n = docs.count()

    def run(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      Sentiment.scoreWithModel(df, AttnSentiment.batchScorer(p), batchSize = 100)
        .select("raw_label").filter("raw_label IS NOT NULL").count()
      (System.nanoTime() - t0) / 1e9
    }
    run(docs) // warmup (session load + codegen)
    val tArr = Seq.fill(3)(run(docs)).min
    val tSrt = Seq.fill(3)(run(sorted)).min
    val fmt = (v: Double) => String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"sf":"$sfDir","rows":$n,"arrival_sec":${fmt(tArr)},"sorted_sec":${fmt(tSrt)},"arrival_rows_per_sec":${fmt(n / tArr)},"sorted_rows_per_sec":${fmt(n / tSrt)}}""")
    spark.stop()
  }
}
