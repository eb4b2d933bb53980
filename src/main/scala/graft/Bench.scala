package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-bench")
    // Warmup pass (codegen compile + JIT), then two measured passes taking
    // the per-query minimum: the bench grades engine throughput, and this
    // host shows transient multi-second kernel stalls that would otherwise
    // land on random queries.
    // optional comma-separated query filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
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
    def measure(): Seq[(String, Double)] = {
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        name -> t
      }
    }
    val m1 = measure().toMap
    val results = measure().map { case (name, t) => name -> math.min(t, m1(name)) }
    def fmt(v: Double): String = f"$v%.3f"
    val total = results.map(_._2).sum
    // Full per-query detail goes to a FILE: with 130 queries the map is
    // ~4 KB, and the driver's log capture keeps only the final ~2000
    // characters — a full inline map truncates its own opening brace and
    // the line never parses. The stdout line stays compact (headliners
    // only) so it survives the tail buffer; BENCH_DETAIL.json has it all.
    val detail = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"queries":$detail,"sf":"$sfDir"}""")
    val headline = Seq(
      "h1_pricing_summary", "h3_top_customers_by_revenue", "h5_regional_revenue",
      "p1_quality_filter", "a4_daily_trends", "j1_containment_dedup",
      "dd_minhash_neardup", "dd_prune_canonical", "sim_bruteforce_topk",
      "sim_ivf_ann", "v3_representatives", "ev_sessionize", "st4_stream_join",
      "o4_head_per_group", "f5_date_extract",
      "sim_binary_ann", "dd_incr_minhash", "pipe_corpus_report")
    val rmap = results.toMap
    val qs = headline.flatMap(h => rmap.get(h).map(v => "\"" + h + "\":" + fmt(v)))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"queries":$qs,"detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
