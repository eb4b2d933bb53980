package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MLEval

/** Streaming OLS — model fitting as a STREAMING AGGREGATION: the six
  * sufficient statistics `(n, Σx, Σy, Σx², Σy², Σxy)` are plain
  * map-side-combinable sums, so the regression "trains" incrementally as
  * micro-batches arrive and the closed-form coefficients are a
  * snapshot-time projection over ONE state row. The production shape for
  * fit-on-live-traffic diagnostics (drift of a chars-per-token line, a
  * calibration slope): no gradient loop, no replay — state is six
  * numbers, and every micro-batch folds in with ordinary aggregation
  * semantics.
  *
  * The st16 catalog entry stages the corpus across three micro-batch
  * files, runs the aggregation in complete mode, projects the final
  * snapshot through the SAME closed form the batch operator uses
  * ([[MLEval.olsStatsFromSums]]), and hash-gates against the batch
  * oracle — integer sums make stream ≡ batch exact, not approximate
  * (the st13/st14/st15 discipline). MAE is deliberately absent: it
  * needs a residual pass over the raw rows under the FINAL coefficients,
  * which is a batch join, not an incremental statistic. */
object OlsStream {

  /** Correctness-gate harness: documents → (tokens, n_chars) rows staged
    * as THREE micro-batch files keyed on `doc_id % 3`, streamed through
    * the sufficient-statistics aggregation, closed form off the final
    * snapshot. */
  def runOlsToCompletion(spark: SparkSession, dir: String,
                         queryName: String = "stream_ols_out"): DataFrame = {
    import java.nio.file.{Files, Paths}
    val rows = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("x"),
        col("n_chars").cast("long").as("y"))
    val tmp = Files.createTempDirectory("graft_ols_").toString
    val inDir = tmp + "/in"
    Files.createDirectories(Paths.get(inDir))
    def writeOne(df: DataFrame, stage: String, target: String, mtime: Long): Unit = {
      val stageDir = s"$tmp/$stage"
      df.coalesce(1).write.parquet(stageDir)
      val part = new java.io.File(stageDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(inDir, target)
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 180000
    writeOne(rows.filter(col("doc_id") % 3 === 0), "b1", "1.parquet", t0)
    writeOne(rows.filter(col("doc_id") % 3 === 1), "b2", "2.parquet", t0 + 60000)
    writeOne(rows.filter(col("doc_id") % 3 === 2), "b3", "3.parquet", t0 + 120000)
    val aggs = MLEval.olsSumAggs(col("x"), col("y"))
    // stop + staging cleanup in finally: a failed replay must leak
    // neither the query nor the temp directory
    try {
      val q = spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .agg(aggs.head, aggs.tail: _*)
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    } finally graft.sources.Artifacts.deleteRecursively(new java.io.File(tmp))
    MLEval.olsStatsFromSums(spark.table(queryName))
      .select(col("n"),
        round(col("__b"), 6).as("slope"),
        round(col("__a"), 6).as("intercept"),
        round(col("__r2"), 6).as("r2"),
        round(col("__rmse"), 6).as("rmse"))
  }
}
