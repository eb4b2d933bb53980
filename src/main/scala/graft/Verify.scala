package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // --dry-oracle <outDir>: dump oracle_sql.json ONLY (no Spark session,
    // no query execution) so `tools/check_oracle.py --parse-only` can
    // assert every oracle parses in DuckDB before a full gate run — a
    // typo'd oracle fails this pre-flight instead of surfacing as a
    // round-end `err` row.
    if (args.length == 2 && args(0) == "--dry-oracle") {
      new java.io.File(args(1)).mkdirs()
      Files.writeString(Paths.get(s"${args(1)}/oracle_sql.json"), oracleJson)
      println(s"[verify] dry-oracle: ${SparkEntry.oracleSql.size} oracle entries -> ${args(1)}/oracle_sql.json")
      return
    }
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-verify")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated query filter for local iteration (same
    // contract as Bench); the driver sets no filter and dumps everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        // Materialize in parallel first; a bare coalesce(1).write would pull
        // the entire plan into a single task. Coalescing from the cached
        // partitions preserves partition order, so sorted output stays sorted.
        val df = fn(spark, sfDir).persist()
        df.count()
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        df.unpersist()
        // operators may persist() reused intermediates (dedup shingle
        // stream, component labels); drop them so 60+ queries in one
        // session don't accumulate block-manager pressure
        spark.catalog.clearCache()
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)
    spark.stop()
  }

  /** oracle_sql.json body. JSON string escape: backslash, quote, and ALL
    * control chars (<0x20) — a tab or CR in builder-authored SQL would
    * otherwise make the driver's json.load fail and silently zero the
    * round's correctness. */
  private def oracleJson: String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
  }
}
