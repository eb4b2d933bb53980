package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

class StreamsSpec extends SparkSpec {

  test("readEvents: empty directory defines the stream on the fallback schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-events").toString
    // no events.parquet yet — a normal state for a file-arrival source;
    // the stream must define (fallback nano-long schema) rather than throw
    val df = Streams.readEvents(spark, dir)
    assert(df.isStreaming)
    assert(df.schema("ts").dataType.typeName == "timestamp") // normalized
    assert(df.schema.fieldNames.toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  test("streaming hourly windows == batch hourly windows") {
    val streamed = Streams.runToCompletion(spark, sf0001, "streams_spec_out")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("st_hourly_windows")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("dedup ingest stream == decomposed two-stage batch computation") {
    import graft.operators.Dedup
    val got = Streams.runDedupIngestToCompletion(spark, sf0001, "st10_spec")
      .collect().map(_.getAs[Long]("doc_id")).sorted
    // decomposed reference: batch-1 self-dedup, then batch-2 probe
    // against the survivors + self-dedup — the unfused operator chain
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang", "source")
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 =!= 0)
    def selfDedup(df: org.apache.spark.sql.DataFrame) =
      Dedup.pruneToCanonical(df,
        Dedup.minhashNearDupPairs(df.select("doc_id", "text"), "text", "doc_id",
          n = 4, k = 32, bands = 8, minJaccard = 0.5,
          family = Dedup.PortableFamily), "doc_id")
    val b1k = selfDedup(b1).localCheckpoint(true)
    val hits = Dedup.minhashProbePairs(b2.select("doc_id", "text"),
        b1k.select("doc_id", "text"), "text", "doc_id",
        n = 4, k = 32, bands = 8, minJaccard = 0.5,
        family = Dedup.PortableFamily)
      .select(col("probe_id").as("doc_id")).distinct()
    val b2k = selfDedup(b2.join(hits, Seq("doc_id"), "left_anti")
      .localCheckpoint(true))
    val want = (b1k.collect() ++ b2k.collect())
      .map(_.getAs[Long]("doc_id")).sorted
    assert(got.sameElements(want), s"stream=${got.length} batch=${want.length}")
    assert(got.nonEmpty)
  }

  test("RocksDB state store: stateful windowed agg identical to default provider") {
    // provider is read at query start, so flipping the session conf swaps
    // the store for the next stream only — results must be bit-identical
    // (the provider changes WHERE state lives, never what it holds)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val base = Streams.runToCompletion(spark, sf0001, "st_store_base")
      .collect().map(_.toSeq).toSet
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Sessions.RocksDbProvider)
    try {
      val rocks = Streams.runToCompletion(spark, sf0001, "st_store_rocksdb")
        .collect().map(_.toSeq).toSet
      assert(rocks == base && rocks.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("late replay: finalized windows keep batch counts, open boundary windows double") {
    import org.apache.spark.sql.functions._
    val out = Streams.runLateDataToCompletion(spark, sf0001, "streams_spec_late")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ev = Tables.events(spark, sf0001)
    val batch = ev
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("ws"), col("event_type"))
      .count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // watermark in effect for the replay batch = max(early ts) - 2h
    val minTs = ev.agg(min(col("ts"))).collect()(0).getTimestamp(0)
    val cut = new java.sql.Timestamp(minTs.getTime + 20L * 24 * 3600 * 1000)
    val wm1 = new java.sql.Timestamp(
      ev.filter(col("ts") < lit(cut)).agg(max(col("ts")))
        .collect()(0).getTimestamp(0).getTime - 2 * 3600 * 1000)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    assert(out.nonEmpty)
    var doubled, kept = 0
    for (((ws, et), cnt) <- out) {
      val wStartMs = fmt.parse(ws).getTime
      val wEnd = new java.sql.Timestamp(wStartMs + 3600 * 1000)
      if (wEnd.getTime <= cut.getTime && wEnd.after(wm1)) {
        // fully-replayed window still open at the replay batch: exact 2x
        assert(cnt == 2 * batch((ws, et)), s"open boundary window $ws $et")
        doubled += 1
      } else if (wStartMs < cut.getTime && cut.getTime < wEnd.getTime &&
        wEnd.after(wm1)) {
        // window straddling the cut: only its early-side sliver replays
        assert(cnt >= batch((ws, et)) && cnt <= 2 * batch((ws, et)),
          s"straddling window $ws $et")
      } else {
        assert(cnt == batch((ws, et)), s"finalized window $ws $et")
        kept += 1
      }
    }
    assert(doubled > 0, "expected at least one double-counted boundary window")
    assert(kept > doubled, "most windows must be finalized-and-protected")
  }

  test("session_window merge rule: exact-gap event MERGES (inclusive), beyond-gap splits") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // measured Spark 4.1.2 semantics (pinned here because ev_sessionize
    // and the ev_session_window_native oracle both depend on it): an
    // event exactly `gap` after the previous one still merges — the
    // split needs diff > gap. Third event is gap+1s after the second.
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val df = Seq(base, base + 1800, base + 1800 + 1801)
      .map(sec => (1L, sec)).toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val out = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("session_window.start")).as("st"),
        unix_micros(col("session_window.end")).as("en"), col("n"))
      .orderBy("st").collect()
    assert(out.length == 2, s"expected 2 sessions, got ${out.toSeq}")
    assert(out(0).getLong(2) == 2 && out(1).getLong(2) == 1)
    // window.end = last event + gap
    assert(out(0).getLong(1) == (base + 1800 + 1800) * 1000000L)
    assert(out(1).getLong(1) == (base + 1800 + 1801 + 1800) * 1000000L)
  }

  test("foreachBatch snapshot maintenance: latest row per key across micro-batches") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString + "/snap"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)](s)
    val stream = mem.toDF().toDF("user_id", "us", "state")
    def latestPerKey(b: org.apache.spark.sql.DataFrame) = b
      .groupBy(col("user_id"))
      .agg(max(struct(col("us"), col("state"))).as("m"))
      .select(col("user_id"), col("m.us").as("us"), col("m.state").as("state"))
    val q = Streams.maintainSnapshot(stream, "user_id", dir, latestPerKey,
      "streams_spec_snap")
    mem.addData((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "x"))
    q.processAllAvailable()
    // batch 2: update user 1, stale row for user 2 wins nothing, new user 3
    mem.addData((1L, 30L, "c"), (3L, 1L, "z"))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"), r.getAs[String]("state")))
      .toSet
    assert(out == Set((1L, 30L, "c"), (2L, 5L, "x"), (3L, 1L, "z")))
  }

  test("stateful stream sessionization == batch sessions minus final open per user") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val streamed = Streams.runSessionizeToCompletion(spark, sf0001, "streams_spec_sess")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy("user_id")
    val batch = graft.streaming.Sessionize.sessionizeBatch(Tables.events(spark, sf0001))
      .withColumn("max_sess", max(col("session_id")).over(w))
      .filter(col("session_id") < col("max_sess"))
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join == batch interval join") {
    import org.apache.spark.sql.functions._
    val streamed = Streams.runStreamJoinToCompletion(spark, sf0001, "streams_join_spec_out")
      .collect().map(_.toSeq).toSet

    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
    val e = ev.filter(col("event_type") === "error").select(col("user_id"), col("us").as("e_us"))
    val p = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("us").as("p_us"))
    val batch = e.join(p, Seq("user_id"))
      .filter(col("p_us") <= col("e_us") && col("p_us") >= col("e_us") - 3600000000L)
      .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup over doubled input == plain batch counts") {
    import org.apache.spark.sql.functions._
    val streamed = Streams.runDedupToCompletion(spark, sf0001, "streams_dedup_spec_out")
      .collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, sf0001)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("checkpoint restart: file offsets AND aggregation state survive a stop/start") {
    import java.nio.file.{Files, Paths}
    val s = spark
    val ev = Tables.events(s, sf0001).select("event_id", "event_type", "ts")
    val tmp = Files.createTempDirectory("graft_restart_").toString
    val inDir = tmp + "/in"; val chk = tmp + "/chk"
    Files.createDirectories(Paths.get(inDir))
    def writeOne(df: org.apache.spark.sql.DataFrame, stage: String, target: String): Unit = {
      val stageDir = s"$tmp/$stage"
      df.coalesce(1).write.parquet(stageDir)
      val part = new java.io.File(stageDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, new java.io.File(inDir, target).toPath)
    }
    def startQ() = s.readStream.schema(ev.schema).parquet(inDir)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("restart_spec_out")
      .option("checkpointLocation", chk)
      .start()
    // run 1: only the even half exists
    writeOne(ev.filter(col("event_id") % 2 === 0), "b1", "1_even.parquet")
    val q1 = startQ(); q1.processAllAvailable(); q1.stop()
    val afterB1 = s.table("restart_spec_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // run 2: a NEW query from the same checkpoint sees only the odd file
    // (offsets recovered) yet reports FULL counts (agg state recovered)
    writeOne(ev.filter(col("event_id") % 2 =!= 0), "b2", "2_odd.parquet")
    val q2 = startQ(); q2.processAllAvailable(); q2.stop()
    val afterB2 = s.table("restart_spec_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchEven = ev.filter(col("event_id") % 2 === 0)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterB1 == batchEven)
    assert(afterB2 == batch)
    // restart added only the odd half: strictly more than a fresh run
    // over file 2 alone would show if state had been lost
    assert(afterB2.values.sum == ev.count())
  }

  test("dropDuplicatesWithinWatermark: expired keys re-admitted, live keys deduped") {
    import org.apache.spark.sql.functions._
    val streamed = Streams.runDedupWithinWatermarkToCompletion(
        spark, sf0001, "streams_dwm_spec_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // replayed key re-admitted iff its original state expired before the
    // replay batch: orig_ts + 2h < max(ts) - 2h
    val ev = Tables.events(spark, sf0001)
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val expect = ev.groupBy("event_type").agg(
        (count(lit(1)) + count(when(
          col("ts") + expr("INTERVAL 2 HOURS") <
            lit(maxTs) - expr("INTERVAL 2 HOURS"), 1))).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == expect)
    // the re-admissions actually happened: counts strictly above plain dedup
    val plain = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.exists { case (k, v) => v > plain(k) })
  }

  test("stream-static enrichment join == batch join (no join state kept)") {
    import org.apache.spark.sql.functions._
    val streamed = Streams.runStreamStaticToCompletion(spark, sf0001, "streams_static_spec_out")
      .collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, sf0001)
      .join(Tables.customer(spark, sf0001).select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 6).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("snapshot swap survives a crash between move-aside and rename-in") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_crash").toString + "/snap"
    Streams.upsertSnapshotBatch(spark, dir, Seq((1L, "a")).toDF("k", "v"), "k")
    // simulate the crash window the round-3 delete-then-rename left open:
    // the live dir is gone, only the moved-aside copy exists
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".old")))
    assert(!new java.io.File(dir).exists())
    Streams.upsertSnapshotBatch(spark, dir, Seq((2L, "b")).toDF("k", "v"), "k")
    val out = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "b"))) // pre-crash state recovered, new batch merged
    assert(!new java.io.File(dir + ".old").exists())
  }

  test("stream-stream LEFT OUTER join == batch left join with watermark-finalized outer rows") {
    val s = spark
    import s.implicits._
    val got = graft.streaming.Streams
      .runStreamOuterJoinToCompletion(spark, sf0001, "st9_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ev = Tables.events(spark, sf0001)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val wm = {
      val me = errors.agg(max("e_ts")).collect()(0).getTimestamp(0).getTime
      val mp = purchases.agg(max("p_ts")).collect()(0).getTimestamp(0).getTime
      new java.sql.Timestamp(math.min(me, mp) - 2L * 3600 * 1000)
    }
    val joined = errors.join(purchases,
      col("e_user") === col("p_user") &&
        col("p_ts") <= col("e_ts") &&
        col("p_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
    val want = joined
      // outer (null-extended) rows only count once finalized: e_ts < wm
      .filter(col("p_user").isNotNull || col("e_ts") < lit(wm))
      .groupBy(col("e_user").as("user_id"))
      .agg(count(col("p_user")).as("n_pairs"),
        sum(when(col("p_user").isNull, 1L).otherwise(0L)).as("n_unmatched"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"stream=${got.size} batch=${want.size}")
  }

  test("st12 leaderboard snapshot equals the batch per-(type,user) counts") {
    val snap = Streams.runLeaderboardToCompletion(spark, sf0001, "lb_spec_out")
    val batch = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    assert(snap.exceptAll(batch).isEmpty && batch.exceptAll(snap).isEmpty)
    assert(snap.count() > 0)
  }

  test("vector ingest stream: final index == static full-corpus assignment") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf0001)
    val streamed = Streams.runVectorIngestToCompletion(spark, sf0001, "st13_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val static = Similarity.ivfAssignments(
        emb, Similarity.ivfCentroids(emb, 16))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.toSeq == static.toSeq)
    assert(streamed.length == emb.count())
  }

  test("streaming OLS sufficient statistics == batch fit (exact, not approximate)") {
    val s = spark
    val streamed = graft.streaming.OlsStream
      .runOlsToCompletion(s, "/root/testdata/sf0.001", "ols_spec_out")
      .collect().head
    val batch = graft.operators.MLEval.olsFit(
        graft.Tables.documents(s, "/root/testdata/sf0.001")
          .select(org.apache.spark.sql.functions.size(
              graft.functions.TextFns.tokens(col("text"))).as("x"),
            col("n_chars").as("y")),
        col("x"), col("y")).collect().head
    // integer sufficient statistics: the streamed fit is BIT-identical
    // to the batch fit, not within-epsilon
    for (c <- Seq("slope", "intercept", "r2", "rmse"))
      assert(streamed.getAs[Double](c) == batch.getAs[Double](c), c)
    assert(streamed.getAs[Long]("n") == batch.getAs[Long]("n"))
  }

  test("state rescale: OLS stream restarted under a DIFFERENT shuffle-partition conf stays bit-identical") {
    // the st16 GroupState/agg-state restore contract (r11 VERDICT task
    // 8): Spark PINS a stateful query's state-store partitioning in the
    // checkpoint metadata — a restart under a different session
    // `spark.sql.shuffle.partitions` must neither crash nor change the
    // state layout, and the resumed aggregation must fold the new
    // micro-batch into the RESTORED six-number OLS state exactly. The
    // assertion is the strongest available: the restarted stream's
    // closed-form fit is BIT-identical (integer sufficient statistics)
    // to the uninterrupted batch fit over the full corpus.
    import java.nio.file.{Files, Paths}
    val s = spark
    import graft.operators.MLEval
    val rows = Tables.documents(s, sf0001)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("x"),
        col("n_chars").cast("long").as("y"))
    val tmp = Files.createTempDirectory("graft_rescale_").toString
    val inDir = tmp + "/in"; val chk = tmp + "/chk"
    Files.createDirectories(Paths.get(inDir))
    def writeOne(df: org.apache.spark.sql.DataFrame, stage: String, target: String): Unit = {
      val stageDir = s"$tmp/$stage"
      df.coalesce(1).write.parquet(stageDir)
      val part = new java.io.File(stageDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, new java.io.File(inDir, target).toPath)
    }
    val aggs = MLEval.olsSumAggs(col("x"), col("y"))
    def runOnce(shufflePartitions: String): Unit = {
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      try {
        val q = s.readStream.schema(rows.schema).parquet(inDir)
          .agg(aggs.head, aggs.tail: _*)
          .writeStream.outputMode("complete").format("memory")
          .queryName("rescale_spec_out")
          .option("checkpointLocation", chk)
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }
    // run 1 plans the stateful shuffle at 3 partitions...
    writeOne(rows.filter(col("doc_id") % 2 === 0), "b1", "1_even.parquet")
    runOnce("3")
    // ...run 2 restarts from the checkpoint under a conf of 13 — the
    // checkpoint's recorded partitioning must win, state intact
    writeOne(rows.filter(col("doc_id") % 2 =!= 0), "b2", "2_odd.parquet")
    runOnce("13")
    val streamed = MLEval.olsStatsFromSums(s.table("rescale_spec_out"))
      .select(col("n"),
        round(col("__b"), 6).as("slope"),
        round(col("__a"), 6).as("intercept"),
        round(col("__r2"), 6).as("r2"),
        round(col("__rmse"), 6).as("rmse"))
      .collect().head
    val batch = MLEval.olsFit(rows.select(col("x"), col("y")), col("x"), col("y"))
      .collect().head
    assert(streamed.getAs[Long]("n") == batch.getAs[Long]("n"))
    for (c <- Seq("slope", "r2", "rmse"))
      assert(streamed.getAs[Double](c) == batch.getAs[Double](c), c)
    sources.Artifacts.deleteRecursively(new java.io.File(tmp))
  }

  test("streaming duel pairing: outcomes exactly once, self-duels silent, extras ignored") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // duel 1 straddles batches; B wins on score
      (1L, "A", 0.2, 10L), (1L, "B", 0.9, 11L),
      // duel 2: score tie -> higher id (B) wins
      (2L, "A", 0.5, 20L), (2L, "B", 0.5, 21L),
      // duel 3: self-duel -> no outcome
      (3L, "A", 0.9, 30L), (3L, "A", 0.1, 31L),
      // duel 4: a THIRD side arrives after the duel is decided -> ignored
      (4L, "A", 0.7, 40L), (4L, "B", 0.3, 41L), (4L, "C", 1.0, 42L),
      // duel 5 stays open (one side) -> nothing emitted
      (5L, "C", 0.8, 50L))
      .toDF("duel", "item", "score", "id")
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft_arena_spec_").toString
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
    // three arrival waves by id % 3: every duel straddles batches, and
    // duel 4's "extra" side (42) arrives FIRST so the matchup it joins
    // is arrival-defined — the contract pinned below
    writeOne(rows.filter(col("id") % 3 === 0), "b1", "1.parquet", t0)
    writeOne(rows.filter(col("id") % 3 === 1), "b2", "2.parquet", t0 + 60000)
    writeOne(rows.filter(col("id") % 3 === 2), "b3", "3.parquet", t0 + 120000)
    val q = graft.streaming.ArenaStream.duelOutcomesStateful(
        spark.readStream.schema(rows.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir))
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("arena_spec_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("arena_spec_out").orderBy("duel")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // duel 4's winner depends on which two sides arrive first (arrival
    // order defines the matchup once a third side exists); with id%3
    // batching, 42 arrives first wave alongside nothing else from duel 4,
    // then 40 completes it: winner C (1.0 > 0.7), 41 ignored
    assert(got.toSet == Set((1L, "B", "A"), (2L, "B", "A"), (4L, "C", "A")))
    // duel 3 (self) and duel 5 (open) emitted nothing; nothing twice
    assert(got.length == 3)
  }

  test("streaming SFT examples == batch operator under out-of-order arrival") {
    val s = spark
    import s.implicits._
    // two conversations, turns delivered in three shuffled micro-batches.
    // The non-BMP emoji (U+1F916, 2 UTF-16 units / 1 codepoint) pins the
    // codepoint-count contract: a String.length-based stream would report
    // loss_start/n_chars one high per emoji and diverge from the batch op
    val turns = Seq(
      (0L, 0, "user", "q one 🤖"), (0L, 1, "assistant", "a one 🤖"),
      (0L, 2, "user", "q two"), (0L, 3, "assistant", "a two"),
      (1L, 0, "user", "solo q"), (1L, 1, "assistant", "solo a"))
      .toDF("conv_id", "seq", "role", "content")
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft_sft_spec_").toString
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
    // batch 1 delivers LATER turns first: the frontier must hold them back
    writeOne(turns.filter(col("seq") >= 2), "b1", "1_tail.parquet", t0)
    writeOne(turns.filter(col("seq") === 1), "b2", "2_mid.parquet", t0 + 60000)
    writeOne(turns.filter(col("seq") === 0), "b3", "3_head.parquet", t0 + 120000)
    val q = graft.streaming.SftStream.sftExamplesStateful(
        spark.readStream.schema(turns.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir))
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("sft_spec_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sft_spec_out")
      .orderBy("conv_id", "turn_seq").collect().map(_.toSeq)
    val want = graft.operators.Serving.sftExamples(turns)
      .orderBy("conv_id", "turn_seq").collect().map(_.toSeq)
    assert(got.length == 3)
    assert(got.toSeq == want.toSeq)
  }
}
