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
    * atomically swap. With `sortCols` non-empty the rewrite uses
    * `repartitionByRange` + in-partition sort instead, so the compacted
    * files carry min/max-prunable ranges on those columns (compaction
    * and clustering in one shuffle). Returns (filesBefore, filesAfter,
    * bytes). */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
              sortCols: Seq[String] = Nil): (Int, Int, Long) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) dataFiles(st.getPath)
        else Seq(st.getPath)
      }
    val before = dataFiles(path).size
    val bytes = dataBytes(spark, dir)
    val n = targetFiles(bytes, targetBytes)
    val df = spark.read.parquet(dir)
    val rebinned =
      if (sortCols.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    val tmp = dir.stripSuffix("/") + "_compact_tmp"
    rebinned.write.mode("overwrite").parquet(tmp)
    val bak = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "_compact_bak")
    fs.rename(path, bak)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), path)
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
