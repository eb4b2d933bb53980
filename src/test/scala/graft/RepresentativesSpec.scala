package graft

import org.apache.spark.sql.functions._
import graft.functions.Sentiment
import graft.ml.Representatives

class RepresentativesSpec extends SparkSpec {

  test("V2/V3 invariants: ≤k reps per class, one per cluster, sizes add up") {
    val scored = Sentiment.score(Tables.documents(spark, sf0001))
    val classSizes = scored.groupBy("sentiment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reps = Representatives.representatives(scored, k = 10).collect()
    assert(reps.nonEmpty)
    for ((cls, n) <- classSizes) {
      val classReps = reps.filter(_.getAs[String]("sentiment") == cls)
      if (n < 10) {
        // small-input bypass (ref :87-133): every doc is its own representative
        assert(classReps.length == n)
        assert(classReps.forall(_.getAs[Int]("cluster_id") == 0))
        assert(classReps.forall(_.getAs[Long]("cluster_size") == n))
      } else {
        assert(classReps.length <= 10)
        // one representative per cluster
        val ids = classReps.map(_.getAs[Int]("cluster_id"))
        assert(ids.distinct.length == ids.length)
        // cluster sizes partition the class
        assert(classReps.map(_.getAs[Long]("cluster_size")).sum == n)
      }
    }
  }

  test("all classes empty: returns an empty, correctly-typed frame (no crash)") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String, Double, String)]
      .toDF("doc_id", "text", "confidence", "sentiment")
    val reps = Representatives.representatives(empty)
    assert(reps.columns.toSeq ==
      Seq("sentiment", "doc_id", "text", "confidence", "cluster_id", "cluster_size"))
    assert(reps.count() == 0)
  }
}
