package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The index-export lifecycle's compaction half (r13 VERDICT task 3):
  * append a delta to an exported IVF-PQ layout, compact into the next
  * version, and prove (1) compacted layout ≡ from-scratch rebuild over
  * the merged corpus, (2) the query replay is identical on both, (3)
  * readers of v=N are untouched mid-compaction (version immutability),
  * (4) delta-wins upsert semantics on vec_id collision, and (5) dynamic
  * partition pruning still fires on the compacted postings scan. */
class IndexCompactSpec extends SparkSpec {

  private def emb: DataFrame = Tables.embeddings(spark, sf0001)

  /** First-16 deterministic quantizers — sim_index_export's convention. */
  private def quantizers(e: DataFrame): (DataFrame, DataFrame) = {
    val e0 = e.select(col("vec_id"), Similarity.toDoubleArray(col("embedding")).as("v"))
    val cents = e0.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    val cb = e0.filter(col("vec_id") < 16).select(col("vec_id"),
      posexplode(array((0 until 8).map(ss =>
        slice(col("v"), ss * 8 + 1, 8)): _*)).as(Seq("s", "vs")))
      .select(col("s"), col("vec_id").cast("int").as("code"), col("vs").as("cw"))
    (cents, cb)
  }

  private def batchOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 17 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))

  private def postingsSet(df: DataFrame): Set[(Long, Long, Seq[Int], Seq[Double], Double)] =
    df.select(col("vec_id"), col("cell").cast("long"), col("codes"), col("v"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList,
        r.getSeq[Double](3).toList, r.getDouble(4)))
      .toSet

  private def replayRows(dir: String, version: Int): Seq[(Long, Long, Double, Double)] =
    Similarity.ivfPqTopKFromIndex(
      Similarity.readIvfPqIndex(spark, dir, version),
      queryId = 20, k = 10, nprobe = 4, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq

  test("compacted layout equals a from-scratch rebuild over the merged corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val (cents, cb) = quantizers(emb)
    Similarity.writeIvfPqIndex(emb, cents, cb, dir, version = 1)
    Similarity.appendIvfPqDelta(batchOf(emb), dir, version = 1)

    // reader isolation: snapshot the v=1 replay AND the v=1 file listing
    // before compaction; both must be untouched after
    val v1Before = replayRows(dir, 1)
    def fileListing(v: Int): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/v=$v"))
        .filterNot(f => f.getPath.contains("/delta/")) // delta is append state, not layout
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val v1Files = fileListing(1)

    val newV = Similarity.compactIvfPqIndex(spark, dir, fromVersion = 1)
    assert(newV == 2)

    assert(fileListing(1) == v1Files, "v=1 layout files must be untouched by compaction")
    assert(replayRows(dir, 1) == v1Before, "v=1 replay must be identical mid-lifecycle")

    // from-scratch rebuild over corpus ∪ batch with the SAME quantizers
    val rebuildDir = java.nio.file.Files.createTempDirectory("graft_idx_rb").toString
    Similarity.writeIvfPqIndex(emb.select("vec_id", "embedding").unionByName(batchOf(emb)),
      cents, cb, rebuildDir, version = 1)

    val compacted = Similarity.readIvfPqIndex(spark, dir, 2)
    val rebuilt = Similarity.readIvfPqIndex(spark, rebuildDir, 1)
    assert(postingsSet(compacted.postings) == postingsSet(rebuilt.postings),
      "compacted postings must equal the from-scratch rebuild's")
    assert(compacted.nVectors == rebuilt.nVectors)
    assert(compacted.dim == rebuilt.dim && compacted.m == rebuilt.m &&
      compacted.nCodes == rebuilt.nCodes && compacted.nCells == rebuilt.nCells &&
      compacted.residual == rebuilt.residual)
    assert(compacted.version == 2)

    // and the replay agrees between the two layouts
    val fromCompact = replayRows(dir, 2)
    assert(fromCompact == replayRows(rebuildDir, 1),
      "query replay must be bit-identical on compacted vs rebuilt layout")

    sources.Artifacts.deleteRecursively(new java.io.File(dir))
    sources.Artifacts.deleteRecursively(new java.io.File(rebuildDir))
  }

  test("upsert semantics: a delta row replaces its base vec_id; appends accumulate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_up").toString
    val (cents, cb) = quantizers(emb)
    Similarity.writeIvfPqIndex(emb, cents, cb, dir, version = 1)
    val base = Similarity.readIvfPqIndex(spark, dir, 1)
    val nBase = base.nVectors

    // delta 1: vec_id 33 re-ingested with vec_id 20's embedding (an
    // update), plus a genuinely new vector
    val v20 = emb.filter(col("vec_id") === 20).select(col("embedding")).collect()(0)
      .getSeq[Float](0).toArray
    val s = spark; import s.implicits._
    val upd = Seq((33L, v20), (3000001L, v20)).toDF("vec_id", "embedding")
    Similarity.appendIvfPqDelta(upd, dir, version = 1)
    // delta 2 (accumulation): re-send 3000001 with a DIFFERENT vector —
    // last write wins inside the delta too
    val v21 = emb.filter(col("vec_id") === 21).select(col("embedding")).collect()(0)
      .getSeq[Float](0).toArray
    Similarity.appendIvfPqDelta(Seq((3000001L, v21)).toDF("vec_id", "embedding"),
      dir, version = 1)

    Similarity.compactIvfPqIndex(spark, dir, fromVersion = 1)
    val v2 = Similarity.readIvfPqIndex(spark, dir, 2)
    assert(v2.nVectors == nBase + 1, "one update + one insert = +1 vector")
    def codesOf(r: org.apache.spark.sql.Row): List[Int] =
      r.getAs[scala.collection.Seq[Int]]("codes").toList
    val p33 = v2.postings.filter(col("vec_id") === 33).collect()
    assert(p33.length == 1, "updated vec_id must appear exactly once")
    val p20 = v2.postings.filter(col("vec_id") === 20).collect()(0)
    assert(codesOf(p33(0)) == codesOf(p20) &&
      p33(0).getAs[Long]("cell") == p20.getAs[Long]("cell"),
      "the update must carry the new embedding's encoding (v20's twin)")
    val pNew = v2.postings.filter(col("vec_id") === 3000001L).collect()
    val p21 = v2.postings.filter(col("vec_id") === 21).collect()(0)
    assert(pNew.length == 1 && codesOf(pNew(0)) == codesOf(p21),
      "re-sent delta row must carry the LAST write's encoding")
    sources.Artifacts.deleteRecursively(new java.io.File(dir))
  }

  test("compaction without a delta is a pure version roll (copy)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_nd").toString
    val (cents, cb) = quantizers(emb)
    Similarity.writeIvfPqIndex(emb, cents, cb, dir, version = 1)
    Similarity.compactIvfPqIndex(spark, dir, fromVersion = 1)
    val v1 = Similarity.readIvfPqIndex(spark, dir, 1)
    val v2 = Similarity.readIvfPqIndex(spark, dir, 2)
    assert(postingsSet(v2.postings) == postingsSet(v1.postings))
    assert(v2.nVectors == v1.nVectors && v2.version == 2)
    sources.Artifacts.deleteRecursively(new java.io.File(dir))
  }

  test("base ∪ un-compacted delta overlay: postings and replay equal the compacted layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_ov").toString
    val (cents, cb) = quantizers(emb)
    Similarity.writeIvfPqIndex(emb, cents, cb, dir, version = 1)
    // inserts (batchOf) AND an update (vec_id 33 re-ingested with 20's
    // embedding) so the overlay's delta-wins-on-collision path is live
    val v20 = emb.filter(col("vec_id") === 20).select(col("embedding")).collect()(0)
      .getSeq[Float](0).toArray
    val s = spark; import s.implicits._
    Similarity.appendIvfPqDelta(batchOf(emb), dir, version = 1)
    Similarity.appendIvfPqDelta(Seq((33L, v20)).toDF("vec_id", "embedding"),
      dir, version = 1)

    // the overlay read — BEFORE compaction exists
    val overlay = Similarity.readIvfPqIndexWithDelta(spark, dir, version = 1)
    val overlayReplay = Similarity.ivfPqTopKFromIndex(overlay,
      queryId = 20, k = 10, nprobe = 4, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val overlayPosts = postingsSet(overlay.postings)

    Similarity.compactIvfPqIndex(spark, dir, fromVersion = 1)
    val compacted = Similarity.readIvfPqIndex(spark, dir, 2)
    assert(overlayPosts == postingsSet(compacted.postings),
      "base ∪ delta overlay must present exactly the compacted postings")
    assert(overlayReplay == replayRows(dir, 2),
      "a query over base ∪ delta must equal the same query over compacted v=2 — " +
        "the invariant that makes compaction transparent to readers")
    sources.Artifacts.deleteRecursively(new java.io.File(dir))
  }

  test("overlay read without a committed delta is the plain versioned read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_ov_nd").toString
    val (cents, cb) = quantizers(emb)
    Similarity.writeIvfPqIndex(emb, cents, cb, dir, version = 1)
    val plain = Similarity.readIvfPqIndex(spark, dir, 1)
    val overlay = Similarity.readIvfPqIndexWithDelta(spark, dir, 1)
    assert(postingsSet(overlay.postings) == postingsSet(plain.postings))
    assert(overlay.nVectors == plain.nVectors && overlay.version == plain.version)
    sources.Artifacts.deleteRecursively(new java.io.File(dir))
  }

  test("DPP: the unioned base ∪ delta postings scan is partition-pruned by the probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_ov_dpp").toString
    val (cents, cb) = quantizers(emb)
    Similarity.writeIvfPqIndex(emb, cents, cb, dir, version = 1)
    Similarity.appendIvfPqDelta(batchOf(emb), dir, version = 1)
    val q = Similarity.ivfPqTopKFromIndex(
      Similarity.readIvfPqIndexWithDelta(spark, dir, 1),
      queryId = 20, k = 10, nprobe = 4, shortlist = 50)
    q.collect() // executed plan — DPP subqueries only show post-execution
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "the nprobe probe must dynamically prune the corpus-sized base branch " +
        "of the unioned postings scan")
    sources.Artifacts.deleteRecursively(new java.io.File(dir))
  }

  test("DPP: the compacted postings scan is partition-pruned by the probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_dpp").toString
    val (cents, cb) = quantizers(emb)
    Similarity.writeIvfPqIndex(emb, cents, cb, dir, version = 1)
    Similarity.appendIvfPqDelta(batchOf(emb), dir, version = 1)
    Similarity.compactIvfPqIndex(spark, dir, fromVersion = 1)
    val q = Similarity.ivfPqTopKFromIndex(
      Similarity.readIvfPqIndex(spark, dir, 2),
      queryId = 20, k = 10, nprobe = 4, shortlist = 50)
    q.collect() // executed plan — DPP subqueries only show post-execution
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "the nprobe probe must dynamically prune the compacted cell partitions")
    sources.Artifacts.deleteRecursively(new java.io.File(dir))
  }
}
