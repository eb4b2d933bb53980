package graft

import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("EP1 end-to-end: analyze + write produces the full artifact set") {
    val out = Files.createTempDirectory("graft-pipeline").toString
    val r = Pipeline.analyzeAndWrite(spark, sf0001, out)
    assert(r.distribution.count() == 3)
    assert(r.trends.count() == 30)
    assert(r.stats.collect()(0).getAs[Long]("total_samples") == 500L)
    val risk = r.risk.collect()(0)
    assert(Set("Low", "Medium", "High", "Critical").contains(risk.getAs[String]("risk_level")))
    assert(r.representatives.count() > 0)
    assert(r.chatContext.count() == 1)
    assert(r.resultsDocument.count() == 1)
    assert(r.summaryPrompts.count() == 3) // one prompt per sentiment class
    // artifacts on disk
    assert(spark.read.json(s"$out/comments").count() == 500)
    assert(spark.read.json(s"$out/insurance_risk").count() == 1)
    assert(new java.io.File(s"$out/complete_results").exists())
    assert(new java.io.File(s"$out/blocks").exists())
  }
}
