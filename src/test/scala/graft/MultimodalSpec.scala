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
}
