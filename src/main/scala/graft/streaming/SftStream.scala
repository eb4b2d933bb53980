package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SFT example emission — the incremental form of
  * [[graft.operators.Serving.sftExamples]]: conversation turns arrive as
  * a stream (out of order, split across micro-batches), and each
  * ASSISTANT turn emits its chat-templated training example exactly once,
  * in the micro-batch where the turn's full prefix first becomes
  * contiguous. The production shape for SFT-on-live-traffic: examples
  * leave the pipeline while the conversation is still growing, instead of
  * waiting for a nightly batch over the transcript store.
  *
  * Ordering contract: `seq` is the DENSE 0-based turn index within its
  * conversation (the transcript position, not an arrival timestamp).
  * Per-conversation state holds the received turns and the contiguous
  * frontier; an assistant turn at index k is ready exactly when turns
  * 0..k are all present, so arbitrary arrival disorder is tolerated and
  * emission order is deterministic. State is O(conversation length) per
  * key — bounded by transcript length, never by stream length; a
  * production deployment adds an event-time timeout to retire abandoned
  * conversations (NoTimeout here keeps the correctness gate exact).
  *
  * Template parity is byte-for-byte with the batch operator
  * (`<|role|>\n content \n` blocks, `<|assistant|>\n` generation header,
  * `loss_start` = prompt length) — the st14 catalog entry hash-gates the
  * stream output against the SAME DuckDB oracle the batch entry uses,
  * the st13 stream-equals-batch discipline. Char counts use
  * `codePointCount` so `loss_start`/`n_chars` match the batch
  * operator's codepoint `length()` on ALL inputs — a UTF-16-unit
  * `String.length` would silently diverge on any non-BMP character
  * (emoji, rare CJK) and break the stream-equals-batch contract. */
object SftStream {

  case class Turn(conv_id: Long, seq: Int, role: String, content: String)
  case class ConvState(roles: Map[Int, String], contents: Map[Int, String],
                       doneUpTo: Int)
  case class SftExample(conv_id: Long, turn_seq: Int, n_context_turns: Int,
                        prompt: String, target: String, loss_start: Int,
                        n_chars: Int)

  def sftExamplesStateful(turns: DataFrame): Dataset[SftExample] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .select(col("conv_id").cast("long").as("conv_id"),
        col("seq").cast("int").as("seq"), col("role"), col("content"))
      .as[Turn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (conv: Long, it: Iterator[Turn], state: GroupState[ConvState]) =>
          val st = state.getOption.getOrElse(ConvState(Map.empty, Map.empty, -1))
          var roles = st.roles
          var contents = st.contents
          it.foreach { t =>
            roles += t.seq -> t.role
            contents += t.seq -> t.content
          }
          // advance the contiguous frontier; everything at or below it is
          // final (dense indices below can never change)
          var f = st.doneUpTo
          while (roles.contains(f + 1)) f += 1
          val out = ((st.doneUpTo + 1) to f).collect {
            case k if roles(k) == "assistant" =>
              val prompt = (0 until k)
                .map(i => s"<|${roles(i)}|>\n${contents(i)}\n").mkString +
                "<|assistant|>\n"
              val target = contents(k)
              // codepoint counts (= Spark/DuckDB length()), NOT UTF-16
              // units — the batch-parity contract on non-BMP text
              val lossStart = prompt.codePointCount(0, prompt.length)
              SftExample(conv, k, k, prompt, target, lossStart,
                lossStart + target.codePointCount(0, target.length))
          }
          state.update(ConvState(roles, contents, f))
          out.iterator
      }
  }

  /** Correctness-gate harness: documents → dense-indexed 4-turn
    * conversations, staged as THREE micro-batch files keyed on
    * `doc_id % 3` — every conversation's turns straddle batches and
    * arrive out of transcript order, so the frontier logic (not batch
    * luck) is what the oracle hash certifies. */
  def runSftToCompletion(spark: SparkSession, dir: String,
                         queryName: String = "stream_sft_out"): DataFrame = {
    import java.nio.file.{Files, Paths}
    val turns = graft.Tables.documents(spark, dir).select(
      expr("doc_id div 4").as("conv_id"),
      (col("doc_id") % 4).cast("int").as("seq"),
      when(col("doc_id") % 2 === 0, "user").otherwise("assistant").as("role"),
      col("text").as("content"))
    val tmp = Files.createTempDirectory("graft_sft_").toString
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
    val byMod = turns.withColumn("__m", expr("conv_id * 4 + seq") % 3)
    writeOne(byMod.filter(col("__m") === 2).drop("__m"), "b1", "1_m2.parquet", t0)
    writeOne(byMod.filter(col("__m") === 0).drop("__m"), "b2", "2_m0.parquet", t0 + 60000)
    writeOne(byMod.filter(col("__m") === 1).drop("__m"), "b3", "3_m1.parquet", t0 + 120000)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = try {
      sftExamplesStateful(
        spark.readStream.schema(turns.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(inDir))
        .toDF()
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    spark.table(queryName).orderBy("conv_id", "turn_seq")
  }
}
