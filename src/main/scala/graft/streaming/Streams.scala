package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-streaming restatement of the trend aggregations (SURVEY.md
  * §2.10: the reference is batch-only; this is the engine's incremental
  * path for the same semantics).
  */
object Streams {

  /** Streaming read of an events directory (file-arrival micro-batches).
    *
    * readStream needs a declared schema, but the physical `ts` type varies
    * by writer (nano LONG under nanosAsLong, TIMESTAMP_NTZ from tz-naive
    * writers, or plain TIMESTAMP) — so probe it from one batch footer read
    * of the same glob (metadata-only, no row scan) and normalize through
    * the SAME [[graft.Tables.normalizeTs]] the batch loader uses. A
    * hardcoded raw schema here silently mis-reads regenerated inputs. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // An empty directory is a normal state for a file-arrival source (the
    // stream should wait for data, not throw at definition time), so the
    // probe falls back to the documented events schema — `ts` as nano
    // LONG, the writer form every other variant normalizes from. The
    // probed schema is pinned for the stream's lifetime; later files must
    // match it (standard file-source contract).
    val fallback = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rawSchema =
      try spark.read.option("pathGlobFilter", "events.parquet").parquet(dir).schema
      catch { case e: org.apache.spark.sql.AnalysisException
        if e.getMessage != null && e.getMessage.contains("PATH_NOT_FOUND") ||
          e.getErrorClass == "UNABLE_TO_INFER_SCHEMA" => fallback }
    graft.Tables.normalizeTs(
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir),
      spark)
  }

  /** Tumbling 1-hour event-time window counts per event type, with a
    * 2-hour watermark bounding state (A4's semantics, incremental). */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 6).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Streaming exact deduplication: `dropDuplicates` on the id column
    * keeps one state entry per id (with a watermark the state would be
    * GC'd; unbounded here since the run is finite). The input is the
    * events stream unioned with itself — every id arrives twice, so the
    * per-type counts prove the dedup (oracle = plain batch counts). */
  def dedupedTypeCounts(events: DataFrame): DataFrame =
    events
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Runs [[dedupedTypeCounts]] over a doubled read of the directory to
    * completion (memory sink) and returns the final table. */
  def runDedupToCompletion(spark: SparkSession, dir: String,
                           queryName: String = "stream_dedup_out"): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = try {
      dedupedTypeCounts(readEvents(spark, dir).unionByName(readEvents(spark, dir)))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Bounded-state streaming dedup — `dropDuplicatesWithinWatermark`, the
    * 100 TB posture: dedup state lives only `delay` past each key's event
    * time (plain `dropDuplicates` keeps every key ever seen, which on an
    * unbounded stream is an OOM on a timer). The price is bounded-window
    * semantics: a key REAPPEARING after its state was evicted is admitted
    * again. This harness pins that eviction rule deterministically with a
    * 3-file mtime-ordered replay (the [[runLateDataToCompletion]]
    * methodology): batch 1 = all events; batch 2 = a sentinel re-send of
    * the max-ts row (advances nothing, absorbs the one-batch watermark
    * lag); batch 3 = every event re-sent with the SAME event_id but event
    * time shifted +60 days (at-least-once redelivery, hours later).
    * At batch 3 the operator's watermark is `max(ts) - delay`; a replayed
    * key is re-ADMITTED iff its original state expired, i.e.
    * `orig_ts + delay < max(ts) - delay`. The DuckDB oracle replays
    * exactly that predicate in SQL — this streaming run is oracle-gated,
    * not just stream==batch. */
  def dedupWithinWatermarkCounts(events: DataFrame,
                                 delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Runs [[dedupWithinWatermarkCounts]] over the 3-file replay layout to
    * completion (complete mode, memory sink) and returns the final
    * per-type counts. */
  def runDedupWithinWatermarkToCompletion(spark: SparkSession, dir: String,
                                          queryName: String = "stream_dedup_wm")
      : DataFrame = {
    import java.nio.file.{Files, Paths}
    // the replay prep reads the events table FOUR times (max-ts probe +
    // three staged files) — persist the 3-column projection once and let
    // the writes read cached blocks (released before the stream starts;
    // within-query reuse only, guide §2.4)
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"))
      .persist()
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val tmp = Files.createTempDirectory("graft_dwm_").toString
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
    writeOne(ev, "b1", "1_all.parquet", t0)
    writeOne(ev.filter(col("ts") === lit(maxTs)).limit(1),
      "b2", "2_sentinel.parquet", t0 + 60000)
    writeOne(ev.withColumn("ts", col("ts") + expr("INTERVAL 60 DAYS")),
      "b3", "3_replay.parquet", t0 + 120000)
    ev.unpersist()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = try {
      dedupWithinWatermarkCounts(
          spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(inDir))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    def rmTree(f: java.io.File): Unit = {
      if (!Files.isSymbolicLink(f.toPath))
        Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete()
    }
    rmTree(new java.io.File(tmp))
    spark.table(queryName).orderBy("event_type")
  }

  /** Stream-static enrichment join: the streaming fact joined to a
    * dimension read as a plain batch table. Spark re-plans the static
    * side each micro-batch and broadcasts it (size permitting), so the
    * stream side never shuffles for the join and NO join state is kept —
    * unlike a stream-stream join there is nothing to watermark on the
    * static side. This is the canonical dimension-enrichment shape at
    * 100 TB: facts stream, dims stay tables. */
  def enrichedSegmentCounts(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 6).as("sum_value"))

  /** Runs [[enrichedSegmentCounts]] to completion (complete mode — the
    * per-segment aggregate is tiny) and returns the final table. */
  def runStreamStaticToCompletion(spark: SparkSession, dir: String,
                                  queryName: String = "stream_static_out"): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = try {
      enrichedSegmentCounts(readEvents(spark, dir),
          spark.read.parquet(s"$dir/customer.parquet"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    spark.table(queryName).orderBy("c_mktsegment")
  }

  /** Stream-stream interval join: each error event joined to the same
    * user's purchases in the preceding hour. Both sides watermarked; the
    * join condition's time bounds let Spark GC join state past
    * `watermark - interval` (unbounded state otherwise). Output is a
    * per-user count so the oracle stays compact. */
  def errorsAfterPurchase(events: DataFrame): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    errors.join(purchases,
      col("e_user") === col("p_user") &&
        col("p_ts") <= col("e_ts") &&
        col("p_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR"))
  }

  /** Runs [[errorsAfterPurchase]] to completion and aggregates to
    * per-user pair counts (append mode; the join emits matched pairs). */
  def runStreamJoinToCompletion(spark: SparkSession, dir: String,
                                queryName: String = "stream_join_out"): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // stream-stream join instantiates FOUR state stores per partition
    // (keyToNumValues + keyWithIndexToValue per side) — store setup, not
    // data, dominates this single-batch run: measured at sf0.1, 4
    // partitions = 6.2 s, 2 = 2.6 s, 1 = 3.2 s (join compute wants some
    // parallelism); 2 is the local sweet spot
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val q = try {
      errorsAfterPurchase(readEvents(spark, dir))
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    import org.apache.spark.sql.functions.{count => cnt}
    spark.table(queryName)
      .groupBy(col("e_user").as("user_id"))
      .agg(cnt(lit(1)).as("n_pairs"))
  }

  /** Stream-stream LEFT OUTER interval join: [[errorsAfterPurchase]]'s
    * shape with null-extension for errors that never see a purchase in
    * their preceding hour. Outer rows cannot emit eagerly — Spark holds
    * an unmatched left row in state until the watermark proves no future
    * match can arrive, then emits it null-extended in a later (possibly
    * no-data) micro-batch. With the whole directory as one batch, the
    * final global watermark is `min(max e_ts, max p_ts) - 2h`, and the
    * condition `p_ts <= e_ts` finalizes exactly the unmatched errors
    * with `e_ts < watermark` (later errors stay open in state) — the
    * eviction rule the oracle replays. */
  def errorsAfterPurchaseOuter(events: DataFrame): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    errors.join(purchases,
      col("e_user") === col("p_user") &&
        col("p_ts") <= col("e_ts") &&
        col("p_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
  }

  /** Runs [[errorsAfterPurchaseOuter]] to completion: per-user matched
    * pair count + finalized unmatched-error count. `processAllAvailable`
    * covers the trailing no-data micro-batch that flushes outer state
    * once the watermark advances (noDataMicroBatches on by default). */
  def runStreamOuterJoinToCompletion(spark: SparkSession, dir: String,
      queryName: String = "stream_outer_join_out"): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2") // st4's measured sweet spot
    val q = try {
      errorsAfterPurchaseOuter(readEvents(spark, dir))
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    import org.apache.spark.sql.functions.{count => cnt}
    spark.table(queryName)
      .groupBy(col("e_user").as("user_id"))
      .agg(
        cnt(col("p_user")).as("n_pairs"),
        sum(when(col("p_user").isNull, 1L).otherwise(0L)).as("n_unmatched"))
  }

  /** Runs [[Sessionize.sessionizeStateful]] (NoTimeout) over the events
    * directory to completion. Emitted rows are every session CLOSED by an
    * observed gap; each user's final session stays open in state by
    * definition of NoTimeout, so the batch-equivalence oracle is the
    * batch sessionization minus each user's last session. */
  def runSessionizeToCompletion(spark: SparkSession, dir: String,
                                queryName: String = "stream_sessionize_out"): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = try {
      Sessionize.sessionizeStateful(readEvents(spark, dir))
        .toDF()
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"), round(col("sum_value"), 6).as("sum_value"))
  }

  /** One batch step of incremental snapshot maintenance: merge
    * `batchLatest` (at most one row per key) into the parquet snapshot at
    * `snapshotDir` with [[graft.operators.Analytics.upsertByKey]], writing
    * to a temp dir and swapping so readers never observe a partial
    * snapshot. Replay-idempotent: re-merging rows already in the snapshot
    * rewrites identical content. */
  def upsertSnapshotBatch(spark: SparkSession, snapshotDir: String,
                          batchLatest: DataFrame, keyCol: String): Unit = {
    val snap = new java.io.File(snapshotDir)
    val old = new java.io.File(snapshotDir + ".old")
    // crash recovery: a previous run that died between "snapshot moved
    // aside" and "tmp renamed in" leaves only the .old copy — restore it
    // so no committed state is ever lost (the batch that was being merged
    // replays: foreachBatch is at-least-once and the merge is idempotent)
    if (!snap.exists() && old.exists() && !old.renameTo(snap))
      throw new java.io.IOException(s"snapshot recovery failed: $old -> $snap")
    val cur =
      if (snap.exists()) spark.read.parquet(snapshotDir)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), batchLatest.schema)
    val merged = graft.operators.Analytics.upsertByKey(cur, batchLatest, keyCol)
    val tmp = new java.io.File(snapshotDir + ".tmp")
    if (tmp.exists()) org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    merged.write.parquet(tmp.getPath) // materializes BEFORE the old snapshot moves
    // swap via rename-aside, never delete-then-rename: at every instant
    // either the live dir or the .old dir holds a complete snapshot
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
    if (snap.exists() && !snap.renameTo(old))
      throw new java.io.IOException(s"snapshot swap failed: $snap -> $old")
    if (!tmp.renameTo(snap)) {
      old.renameTo(snap) // restore the previous snapshot before failing
      throw new java.io.IOException(s"snapshot swap failed: $tmp -> $snap")
    }
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
  }

  /** One micro-batch of streaming near-dup-deduplicated ingest: probe the
    * batch against the CURRENT snapshot's documents with banded MinHash
    * ([[graft.operators.Dedup.minhashProbePairs]] — band-key joins only,
    * the corpus side is the persisted index at scale), drop every batch
    * doc with a verified match, self-dedup the survivors within the batch
    * ([[graft.operators.Dedup.pruneToCanonical]]), and append what
    * remains via the crash-safe snapshot swap of [[upsertSnapshotBatch]].
    *
    * Replay-idempotent (foreachBatch is at-least-once): a replayed batch
    * finds its own previously-appended survivors in the snapshot at
    * jaccard 1, so every doc drops as a dup and the merge is a no-op. */
  def dedupIngestBatch(spark: SparkSession, snapshotDir: String,
                       batch: DataFrame,
                       minJaccard: Double = 0.5): Unit = {
    import graft.operators.Dedup
    val snap =
      if (new java.io.File(snapshotDir).exists()) spark.read.parquet(snapshotDir)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), batch.schema)
    // ONE tagged signature pass yields both the corpus-probe pairs and
    // the within-batch pairs ([[Dedup.minhashIngestPairs]]); the result
    // is eagerly checkpointed, so the filters below don't re-run it
    val pairs = Dedup.minhashIngestPairs(
      batch.select("doc_id", "text"), snap.select("doc_id", "text"),
      "text", "doc_id", n = 4, k = 32, bands = 8, minJaccard = minJaccard,
      family = Dedup.PortableFamily)
    val hits = pairs.filter(col("vs_corpus"))
      .select(col("id_a").as("doc_id")).distinct()
    val fresh = batch.join(hits, Seq("doc_id"), "left_anti")
    // within-batch pairs among fresh docs only == minhashNearDupPairs on
    // the fresh subset (banding is per-document, verify is per-pair)
    val freshPairs = pairs.filter(!col("vs_corpus"))
      .join(hits.select(col("doc_id").as("id_a")), Seq("id_a"), "left_anti")
      .join(hits.select(col("doc_id").as("id_b")), Seq("id_b"), "left_anti")
      .select("id_a", "id_b", "jaccard")
    val kept = Dedup.pruneToCanonical(fresh, freshPairs, "doc_id")
    upsertSnapshotBatch(spark, snapshotDir, kept, "doc_id")
  }

  /** Streaming near-dup-deduplicated corpus ingest, run to completion —
    * the continual-ingest shape of a 100 TB training-data pipeline as ONE
    * streaming query: documents arrive in file micro-batches
    * (`maxFilesPerTrigger=1`, mtime-ordered: even doc_ids then odd), each
    * batch is deduplicated against everything already accepted and
    * against itself, and survivors append to the parquet snapshot.
    * Deterministic end to end (portable MinHash family, fixed batch
    * split), so the FINAL SNAPSHOT is oracle-checkable: batch-1 self-dedup
    * + batch-2 probe-then-self-dedup replayed in SQL. At scale the
    * snapshot carries its band table as the persisted index (bucketed by
    * band key) instead of re-signaturing on every probe — same dataflow,
    * one fewer pass. Returns the final snapshot `(doc_id, lang, source)`
    * ordered by id. */
  def runDedupIngestToCompletion(spark: SparkSession, dir: String,
                                 queryName: String = "stream_dedup_ingest")
      : DataFrame = {
    import java.nio.file.{Files, Paths}
    // one cached scan feeds both staged files (guide §2.4; released
    // before the stream starts)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .persist()
    val tmp = Files.createTempDirectory("graft_ingest_").toString
    val inDir = tmp + "/in"
    val snapshotDir = tmp + "/snapshot"
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
    writeOne(docs.filter(col("doc_id") % 2 === 0), "b1", "1_even.parquet", t0)
    writeOne(docs.filter(col("doc_id") % 2 =!= 0), "b2", "2_odd.parquet", t0 + 60000)
    val docsSchema = docs.schema
    docs.unpersist()
    // per-batch state pinning (the runDedupToCompletion discipline): the
    // foreachBatch pipeline re-plans per micro-batch under the SESSION
    // shuffle-partition setting — at local[32] every tiny batch's band
    // self-join, verify join and component rounds shuffled to 32
    // near-empty partitions and the snapshot re-merge wrote 32-file
    // snapshots that the NEXT batch re-listed and re-read. 8 keeps the
    // batch-sized work parallel without the fixed per-partition tax;
    // at production scale the batch contract sizes this to the batch,
    // not the cluster.
    // NOTE: unlike the fixed-plan harnesses (whose state partitioning is
    // pinned at query START), foreachBatch builds fresh batch plans at
    // EXECUTION time against the live session conf — the pin must cover
    // processAllAvailable, not just start(). The batch partition count is
    // a conf knob (`spark.graft.stream.batchShufflePartitions`): size it
    // to the MICRO-BATCH, not the cluster — the default 8 fits the
    // harness's file-sized batches; a production deployment sizes it to
    // its trigger volume.
    val batchParts = spark.conf
      .getOption("spark.graft.stream.batchShufflePartitions").getOrElse("8")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", batchParts)
    try {
      val q = spark.readStream.schema(docsSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
        .writeStream
        .queryName(queryName)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          dedupIngestBatch(spark, snapshotDir, batch)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.read.parquet(snapshotDir)
      .select("doc_id", "lang", "source").orderBy("doc_id")
  }

  /** Incremental keyed-snapshot maintenance via `foreachBatch` — the
    * pattern that keeps a "current state per key" table fresh from an
    * event stream without a table format: each micro-batch is reduced to
    * its latest row per key (`reduceBatch`), then upserted into the
    * parquet snapshot. foreachBatch is at-least-once; the merge is
    * replay-idempotent (see [[upsertSnapshotBatch]]), which is exactly the
    * idempotent-sink discipline exactly-once pipelines rely on.
    * Conflict resolution is last-writer-wins in BATCH order (a later
    * micro-batch's row replaces the snapshot row unconditionally) — right
    * for in-order sources; an event-time-resolving variant would merge by
    * `reduceBatch(snapshot ∪ batch)` instead. At 100 TB the same loop
    * runs with the snapshot bucketed by the key so each merge is a
    * co-located anti-join, not a re-shuffle. */
  def maintainSnapshot(stream: DataFrame, keyCol: String, snapshotDir: String,
                       reduceBatch: DataFrame => DataFrame,
                       queryName: String = "snapshot_maintenance")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    stream.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertSnapshotBatch(spark, snapshotDir, reduceBatch(batch), keyCol)
      }
      .start()
  }

  /** Runs the hourly-count stream over a static directory to completion
    * (memory sink) and returns the final table — used by tests to prove
    * stream/batch equivalence. */
  /** Watermark late-data semantics, demonstrated end to end and
    * deterministically: the events table is split at `min(ts) + 20 days`
    * into an EARLY file and a file holding the REMAINING events plus a
    * full replay of the early ones — so every early event arrives a
    * second time, late by construction. A 2-file file-source stream
    * (`maxFilesPerTrigger=1`, mtime-ordered) makes the batch boundary
    * exact: a replayed event is DROPPED iff its hour-window end is at or
    * below the watermark in effect when the replay batch runs (state
    * already finalized) and DOUBLE-COUNTED iff its window was still
    * open — precisely the at-least-once downstream arithmetic a pipeline
    * must reason about. Append mode emits only watermark-finalized
    * windows: rows never revise.
    *
    * THREE files (early / rest / replay), not two — measured Spark 4.1.2
    * behavior: the late-drop filter of batch N uses the watermark derived
    * from data through batch N-2 (the progress line's `eventTime
    * .watermark` is already one batch ahead of the filter). With replay
    * as batch 2, its filter watermark is exactly `max(early ts) - 2h`;
    * a 2-file layout replays against a still-1970 watermark and drops
    * NOTHING. Verified against per-batch `numRowsDroppedByWatermark` and
    * the doubled boundary windows.
    *
    * The whole construction is replayable in SQL (the DuckDB oracle
    * computes both watermarks and applies the same drop/emit predicates),
    * so THIS streaming run is oracle-gated, not just stream==batch. */
  def runLateDataToCompletion(spark: SparkSession, dir: String,
                              queryName: String = "stream_late_out"): DataFrame = {
    import java.nio.file.{Files, Paths}
    // the split prep reads events four times (min-ts probe + early + rest
    // + the early replay) — one cached projection serves all of them
    // (released before the stream starts; the st11 discipline)
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .persist()
    val minTs = ev.agg(min(col("ts"))).collect()(0).getTimestamp(0)
    val cut = new java.sql.Timestamp(minTs.getTime + 20L * 24 * 3600 * 1000)
    val early = ev.filter(col("ts") < lit(cut))
    val rest = ev.filter(col("ts") >= lit(cut))
    val tmp = Files.createTempDirectory("graft_late_").toString
    val inDir = tmp + "/in"
    Files.createDirectories(Paths.get(inDir))
    def writeOne(df: org.apache.spark.sql.DataFrame, stage: String,
                 target: String, mtime: Long): Unit = {
      val stageDir = s"$tmp/$stage"
      df.coalesce(1).write.parquet(stageDir)
      val part = new java.io.File(stageDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(inDir, target)
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 180000
    writeOne(early, "b1", "1_early.parquet", t0)
    writeOne(rest, "b2", "2_rest.parquet", t0 + 60000)
    writeOne(early, "b3", "3_replay.parquet", t0 + 120000)
    ev.unpersist()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = try {
      spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("cnt"))
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    // the memory sink owns the rows now; the staging files can go
    def rmTree(f: java.io.File): Unit = {
      if (!Files.isSymbolicLink(f.toPath))
        Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete()
    }
    rmTree(new java.io.File(tmp))
    spark.table(queryName)
  }

  /** Streaming leaderboard state: per-(event_type, user) counts maintained
    * by the streaming aggregation. State is O(types × active users) — at
    * 100 TB posture this runs in update mode over the RocksDB store
    * ([[graft.Sessions]] `RocksDbProvider` knob) with the sink keeping
    * the top-k; the finite harness uses complete mode + memory sink and
    * ranks the final snapshot. */
  def userTypeCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))

  /** Runs [[userTypeCounts]] to completion and returns the final
    * per-(type, user) count snapshot. */
  def runLeaderboardToCompletion(spark: SparkSession, dir: String,
                                 queryName: String = "stream_leaderboard")
      : DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = try {
      userTypeCounts(readEvents(spark, dir))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Streaming IVF index maintenance, run to completion — the vector
    * twin of [[runDedupIngestToCompletion]]: embedding vectors arrive in
    * file micro-batches (`maxFilesPerTrigger=1`, mtime-ordered: even
    * vec_ids then odd), each batch is cell-assigned against the PINNED
    * coarse quantizer ([[graft.operators.Similarity.ivfAssignments]] —
    * centroids trained offline before ingest begins; no production index
    * retrains its quantizer per micro-batch, that would invalidate every
    * stored assignment), and the `(vec_id, cell)` assignments merge into
    * the parquet index snapshot via the crash-safe swap. Replay-idempotent
    * (foreachBatch is at-least-once): assignment is deterministic given
    * the pinned centroids, so a replayed batch upserts identical rows.
    *
    * Returns the FINAL INDEX ordered by vec_id — every assignment, not
    * just a probed cell, so the oracle (static full-corpus assignment
    * replayed in SQL) hash-proves the streaming build ≡ a batch rebuild.
    * At 100 TB the snapshot is written `partitionBy(cell)` and each
    * micro-batch merge touches only the cells the batch lands in. */
  def runVectorIngestToCompletion(spark: SparkSession, dir: String,
                                  queryName: String = "stream_vector_ingest")
      : DataFrame = {
    import java.nio.file.{Files, Paths}
    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val tmp = Files.createTempDirectory("graft_vecingest_").toString
    val inDir = tmp + "/in"
    val indexDir = tmp + "/index"
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
    writeOne(emb.filter(col("vec_id") % 2 === 0), "b1", "1_even.parquet", t0)
    writeOne(emb.filter(col("vec_id") % 2 =!= 0), "b2", "2_odd.parquet", t0 + 60000)
    // quantizer pinned BEFORE the stream starts (the offline-training
    // posture); materialized once so every micro-batch broadcasts the
    // same 16 rows instead of re-deriving them from the source table
    val cents = Similarity.ivfCentroids(emb, 16).localCheckpoint()
    val q = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
      .writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertSnapshotBatch(spark, indexDir,
          Similarity.ivfAssignments(batch, cents), "vec_id")
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(indexDir).orderBy("vec_id")
  }

  def runToCompletion(spark: SparkSession, dir: String,
                      queryName: String = "stream_out"): DataFrame = {
    // Stateful-stream partitioning is pinned at query start from
    // spark.sql.shuffle.partitions; each partition instantiates its own
    // state store, and store setup dwarfs the per-batch work for this
    // window count (the keyspace is hours x event_type — tiny). Pin a
    // small state partition count for the query, then restore.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = try {
      hourlyEventCounts(readEvents(spark, dir))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
