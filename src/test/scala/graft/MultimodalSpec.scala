package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("stub decode: checksum/byte-length arithmetic on known payload") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "abc")).toDF("doc_id", "text")
    val r = Multimodal.extractFeatures(spark, Multimodal.withPayload(docs)).collect()(0)
    assert(r.getAs[String]("media_kind") == "image") // doc_id % 3 == 0
    assert(r.getAs[Long]("n_bytes") == 3L)
    // fold: ((0*31+97)*31+98)*31+99 = 97*31+98 = 3105; 3105*31+99 = 96354
    assert(r.getAs[Long]("checksum") == 96354L)
    assert(r.getSeq[Float](r.fieldIndex("features")).length == 8)
  }

  test("feature stats cover all media kinds and every row") {
    val out = Multimodal.featureStats(spark, Tables.documents(spark, sf0001)).collect()
    assert(out.map(_.getAs[String]("media_kind")).toSet == Set("image", "audio", "video"))
    assert(out.map(_.getAs[Long]("cnt")).sum == 500L)
  }

  test("frame sample: index arithmetic, stride, and one row per sampled frame") {
    val s = spark
    import s.implicits._
    // doc_id % 3 == 2 -> video; n_chars=100 -> n_frames = 100*2 DIV 5 = 40
    // stride 8 -> frames 0,8,16,24,32 (5 samples, last 32)
    val docs = Seq((2L, "x", 100L), (3L, "y", 100L)) // doc 3 is not video
      .toDF("doc_id", "text", "n_chars")
    val frames = Multimodal.frameSample(docs, stride = 8).collect()
    assert(frames.forall(_.getAs[Long]("doc_id") == 2L))
    assert(frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq ==
      Seq(0L, 8L, 16L, 24L, 32L))
    val sum = Multimodal.frameSampleSummary(docs, stride = 8).collect()
    assert(sum.length == 1)
    assert(sum(0).getAs[Long]("n_sampled") == 5L)
    assert(sum(0).getAs[Long]("last_frame") == 32L)
    // checksum: sum over f in {0,8,16,24,32} of (2*131 + f*7919) % 1e9+7
    val expect = Seq(0L, 8L, 16L, 24L, 32L)
      .map(f => (2L * 131 + f * 7919) % 1000000007L).sum
    assert(sum(0).getAs[Long]("sum_checksum") == expect)
  }

  test("frame sample: tiny docs still yield at least one frame") {
    val s = spark
    import s.implicits._
    val docs = Seq((2L, "x", 1L)).toDF("doc_id", "text", "n_chars")
    val sum = Multimodal.frameSampleSummary(docs).collect()
    assert(sum.length == 1 && sum(0).getAs[Long]("n_sampled") == 1L)
  }
}
