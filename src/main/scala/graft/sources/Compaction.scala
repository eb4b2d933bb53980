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
}
