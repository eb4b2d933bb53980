package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB lake needs: streaming ingest and fine-grained upserts leave
  * thousands of KB-scale parquet files per partition, and each one costs
  * a scan task, a footer read, and a name-node entry. Compaction
  * rewrites a directory into ≈`targetBytes` files, sized from the
  * table's OWN on-disk footprint rather than a guessed row count.
  *
  * Scale shape: the size probe is a filesystem listing (no data read);
  * the rewrite is one `repartition(n)` round-robin shuffle — the only
  * full-data pass, unavoidable for re-binning — or `repartitionByRange`
  * over a sort key to preserve min/max pruning (the [[graft.functions.ZOrder]]
  * companion: compact AND cluster in the same pass). Runs per-partition
  * at scale (each date/tenant directory compacts independently), so the
  * shuffle never spans the whole table. */
object Compaction {

  /** Total bytes of data files under `dir` (recursive, hidden/_-files
    * excluded — the same set a parquet scan would read). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(p).map { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0L
        else if (st.isDirectory) walk(st.getPath)
        else st.getLen
      }.sum
    walk(path)
  }

  /** Target file count for `bytes` of data at `targetBytes` per file —
    * never 0, and capped so a tiny table compacts to ONE file. */
  def targetFiles(bytes: Long, targetBytes: Long): Int =
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

  /** Compact the parquet directory `dir` in place to ≈`targetBytes`
    * files: read, round-robin `repartition`, write to a side directory,
    * then swap via two renames. With `sortCols` non-empty the rewrite
    * uses `repartitionByRange` + in-partition sort instead, so the
    * compacted files carry min/max-prunable ranges on those columns
    * (compaction and clustering in one shuffle). Returns (filesBefore,
    * filesAfter, bytes).
    *
    * Crash/failure discipline (HDFS `rename` reports failure by
    * returning FALSE, not throwing — every return value is checked):
    *  - stale `_compact_tmp`/`_compact_bak` from a crashed prior run
    *    fail fast — their presence needs operator attention, never a
    *    silent clobber;
    *  - if the second rename fails, the original directory is restored
    *    from the backup and the method throws; the backup is deleted
    *    ONLY after the new directory is verified in place, so no failure
    *    path destroys the last remaining copy of the table.
    *
    * Visibility caveat, by design: the two-rename swap is not atomic —
    * a concurrent reader landing between the renames sees the table
    * briefly missing. That is the documented posture for this
    * maintenance pass (run it in the table's maintenance window); a
    * serving table wants a versioned-directory + pointer-swap layout
    * (one rename of a manifest, the table-format approach) instead. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
              sortCols: Seq[String] = Nil): (Int, Int, Long) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) dataFiles(st.getPath)
        else Seq(st)
      }
    // one listing serves both the before-count and the byte sizing
    val listing = dataFiles(path)
    val before = listing.size
    val bytes = listing.map(_.getLen).sum
    val n = targetFiles(bytes, targetBytes)
    val tmp = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "_compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "_compact_bak")
    if (fs.exists(tmp) || fs.exists(bak))
      throw new java.io.IOException(
        s"compact($dir): stale $tmp or $bak from a prior crashed run — " +
          "inspect and remove manually before compacting")
    val df = spark.read.parquet(dir)
    val rebinned =
      if (sortCols.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    rebinned.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(path, bak)) {
      fs.delete(tmp, true) // original untouched; drop the side copy
      throw new java.io.IOException(s"compact($dir): rename($path -> $bak) failed")
    }
    if (!fs.rename(tmp, path)) {
      // restore the original before failing — bak holds the only copy
      if (!fs.rename(bak, path))
        throw new java.io.IOException(
          s"compact($dir): swap failed AND restore failed; data is intact at $bak")
      fs.delete(tmp, true)
      throw new java.io.IOException(
        s"compact($dir): rename($tmp -> $path) failed; original restored")
    }
    if (!fs.exists(path))
      throw new java.io.IOException(
        s"compact($dir): new directory missing after swap; backup kept at $bak")
    fs.delete(bak, true)
    (before, dataFiles(path).size, bytes)
  }

  /** Data-skipping audit for a parquet directory: per-file row count and
    * min/max of `keyCol`, plus each file's range-overlap degree — how
    * many OTHER files' [min,max] ranges intersect its own. A well
    * clustered table (post-[[compact]] with `sortCols`, or Z-ordered)
    * audits at overlap 0: a point/range predicate prunes to ~one file.
    * An append-ordered table audits at overlap ≈ n_files: every file
    * must be read for any key. This is the measurement that says whether
    * re-clustering is worth the rewrite — run it BEFORE paying for one.
    *
    * The per-file stats come from one scan grouped by `input_file_name`
    * (file count is the group cardinality — small); the overlap join is
    * an interval self-join over that O(files) frame, never over rows. */
  def layoutAudit(spark: SparkSession, dir: String,
                  keyCol: String): DataFrame = {
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"))
    val other = stats.select(col("file").as("f2"),
      col("key_min").as("lo2"), col("key_max").as("hi2"))
    stats.join(other,
        col("file") =!= col("f2") &&
          col("key_min") <= col("hi2") && col("key_max") >= col("lo2"),
        "left")
      .groupBy("file", "rows", "key_min", "key_max")
      .agg(sum(when(col("f2").isNotNull, 1L).otherwise(0L)).as("overlapping_files"))
      .orderBy("key_min", "file")
  }
}
