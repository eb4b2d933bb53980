package graft

import org.apache.spark.sql.functions._
import graft.sources.Compaction

/** Compaction over a deliberately fragmented table: content identity,
  * file-count targets, and the clustered (range) variant's min/max
  * ordering are each pinned. */
class CompactionSpec extends SparkSpec {

  private def fragmented(dir: String, parts: Int): Unit =
    Tables.documents(spark, sf0001)
      .repartition(parts)
      .write.mode("overwrite").parquet(dir)

  test("compact: many small files become one, content identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp").toString + "/t"
    fragmented(dir, 40)
    val beforeRows = spark.read.parquet(dir).orderBy("doc_id").collect()
    val (before, after, bytes) = Compaction.compact(spark, dir, targetBytes = 1L << 30)
    assert(before == 40 && after == 1 && bytes > 0)
    val afterRows = spark.read.parquet(dir).orderBy("doc_id").collect()
    assert(afterRows.toSeq == beforeRows.toSeq)
  }

  test("compact: targetBytes splits into multiple right-sized files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp2").toString + "/t"
    fragmented(dir, 20)
    val bytes = Compaction.dataBytes(spark, dir)
    val target = bytes / 3 // expect ceil(total/target) ≈ 3-4 files
    val (_, after, _) = Compaction.compact(spark, dir, targetBytes = target)
    assert(after == Compaction.targetFiles(bytes, target).min(20))
    assert(after >= 3)
  }

  test("compact with sortCols: files carry disjoint prunable ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp3").toString + "/t"
    fragmented(dir, 30)
    val bytes = Compaction.dataBytes(spark, dir)
    Compaction.compact(spark, dir, targetBytes = bytes / 4 + 1,
      sortCols = Seq("doc_id"))
    // per-file min/max of the sort key must not overlap across files
    val ranges = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("doc_id"))
      .groupBy("f").agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // content survives the clustered rewrite too
    assert(spark.read.parquet(dir).count() ==
      Tables.documents(spark, sf0001).count())
  }

  test("layoutAudit: clustered files audit at overlap 0, random layout does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_la").toString + "/t"
    fragmented(dir, 10) // round-robin: every file spans ~the full id range
    val before = Compaction.layoutAudit(spark, dir, "doc_id").collect()
    assert(before.length == 10)
    assert(before.forall(_.getAs[Long]("overlapping_files") == 9L))
    val bytes = Compaction.dataBytes(spark, dir)
    Compaction.compact(spark, dir, targetBytes = bytes / 4 + 1,
      sortCols = Seq("doc_id"))
    val after = Compaction.layoutAudit(spark, dir, "doc_id").collect()
    assert(after.length >= 2)
    assert(after.forall(_.getAs[Long]("overlapping_files") == 0L))
    assert(after.map(_.getAs[Long]("rows")).sum == before.map(_.getAs[Long]("rows")).sum)
  }

  test("targetFiles: never zero, rounds up") {
    assert(Compaction.targetFiles(1L, 1000L) == 1)
    assert(Compaction.targetFiles(1000L, 1000L) == 1)
    assert(Compaction.targetFiles(1001L, 1000L) == 2)
  }
}
