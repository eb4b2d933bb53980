package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming duel pairing — the incremental form of
  * [[graft.operators.MLEval.pairwiseWinMatrix]]'s duel reduction: the
  * two sides of a preference duel arrive as separate stream rows, in
  * any order, possibly in different micro-batches; per-duel GroupState
  * holds the first side until the second lands, then emits the
  * completed outcome exactly once, in the micro-batch where the duel
  * first completes. The production shape for an arena-style live eval:
  * the win matrix (and the Bradley-Terry ranking over it) updates while
  * voting is still open, instead of waiting for a batch job over the
  * full vote log.
  *
  * Outcome semantics match the batch operator on WELL-FORMED two-side
  * duels (the production contract): winner = argmax of (score, id) —
  * the dpoPairs tie convention — and self-duels (both sides the same
  * item) emit nothing, exactly like the batch `__w.item =!= __l.item`
  * filter. Malformed duels with >2 sides diverge by construction: the
  * batch `pairwiseWinMatrix` drops them entirely (its exactly-two
  * filter), while the stream has already emitted an outcome from
  * whichever two sides arrived first and cannot retract it in append
  * mode — extra sides are ignored (StreamsSpec pins this divergence).
  * State is O(1) per duel: an open duel holds its first side; a
  * completed duel retains an O(1) `done` tombstone so late extra sides
  * stay ignored rather than re-opening the duel. Total state therefore
  * grows with DISTINCT duels seen, not just the open-duel frontier — a
  * production deployment adds an event-time timeout
  * (`GroupStateTimeout.EventTimeTimeout` past the watermark) to retire
  * both abandoned duels and old tombstones once late data is
  * impossible.
  *
  * The st15 catalog entry stages duel sides across three shuffled
  * micro-batches, aggregates the emitted outcomes into the canonical
  * win matrix, and hash-gates it against the SAME DuckDB oracle the
  * batch entry uses — the st13/st14 stream-equals-batch discipline. */
object ArenaStream {

  case class DuelSide(duel: Long, item: String, score: Double, id: Long)
  case class DuelState(item: String, score: Double, id: Long, done: Boolean)
  case class Outcome(duel: Long, winner: String, loser: String)

  def duelOutcomesStateful(rows: DataFrame): Dataset[Outcome] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col("duel").cast("long").as("duel"), col("item"),
        col("score").cast("double").as("score"), col("id").cast("long").as("id"))
      .as[DuelSide]
      .groupByKey(_.duel)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (duel: Long, it: Iterator[DuelSide], state: GroupState[DuelState]) =>
          var held: Option[(String, Double, Long)] =
            state.getOption.filter(!_.done).map(s => (s.item, s.score, s.id))
          var decided = state.getOption.exists(_.done)
          val out = scala.collection.mutable.ArrayBuffer.empty[Outcome]
          it.foreach { side =>
            if (!decided) held match {
              case None => held = Some((side.item, side.score, side.id))
              case Some((hi, hs, hid)) =>
                // the duel completes NOW: argmax of (score, id) wins
                val first = (hs, hid) ;  val second = (side.score, side.id)
                val (w, l) =
                  if (Ordering[(Double, Long)].gt(second, first)) (side.item, hi)
                  else (hi, side.item)
                if (w != l) out += Outcome(duel, w, l) // self-duel: nothing
                decided = true
                held = None
            } // extra sides after decision: ignored, duel already decided
          }
          state.update(held match {
            case Some((i, s, id)) => DuelState(i, s, id, done = false)
            case None => DuelState("", 0.0, 0L, done = decided)
          })
          out.iterator
      }
  }

  /** Correctness-gate harness: the ml_winrate_matrix duel frame
    * (doc_id//2 duels on the F7 reward) staged as THREE micro-batch
    * files keyed on `doc_id % 3` — consecutive doc ids land in
    * DIFFERENT batches, so most duels straddle a batch boundary and the
    * pairing state (not batch luck) is what the oracle hash certifies.
    * Emitted outcomes aggregate to the canonical win matrix in batch,
    * over the memory sink. */
  def runArenaToCompletion(spark: SparkSession, dir: String,
                           queryName: String = "stream_arena_out"): DataFrame = {
    import java.nio.file.{Files, Paths}
    val duels = graft.functions.Sentiment.score(graft.Tables.documents(spark, dir))
      .select(expr("doc_id div 2").as("duel"), col("source").as("item"),
        col("original_score").as("score"), col("doc_id").as("id"))
    val tmp = Files.createTempDirectory("graft_arena_").toString
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
    writeOne(duels.filter(col("id") % 3 === 2), "b1", "1_m2.parquet", t0)
    writeOne(duels.filter(col("id") % 3 === 0), "b2", "2_m0.parquet", t0 + 60000)
    writeOne(duels.filter(col("id") % 3 === 1), "b3", "3_m1.parquet", t0 + 120000)
    // the conf override must stay in force until the LAST micro-batch
    // has been planned (planning is async after start(), so restoring
    // immediately could plan the stateful shuffle at the session
    // default); restore + stop + temp cleanup all sit in finally so a
    // failed run leaks neither the override, the query, nor the staging
    // directory
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = duelOutcomesStateful(
        spark.readStream.schema(duels.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(inDir))
        .toDF()
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.sources.Artifacts.deleteRecursively(new java.io.File(tmp))
    }
    // canonical matrix over the streamed outcomes (batch agg on the
    // memory sink — O(completed duels) rows)
    spark.table(queryName)
      .select(least(col("winner"), col("loser")).as("item_a"),
        greatest(col("winner"), col("loser")).as("item_b"),
        when(col("winner") <= col("loser"), 1L).otherwise(0L).as("__wa"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_duels"), sum(col("__wa")).as("wins_a"))
      .withColumn("wins_b", col("n_duels") - col("wins_a"))
      .withColumn("win_rate_a",
        round(col("wins_a").cast("double") / col("n_duels").cast("double"), 6))
      .orderBy("item_a", "item_b")
  }
}
