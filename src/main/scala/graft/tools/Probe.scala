package graft.tools
import graft._

/** Plan-audit probe: dumps formatted plans for representative queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "probe")
    val d = "/root/testdata/sf0.01"
    for (n <- Seq("p1_quality_filter", "h1_pricing_summary", "h3_top_customers_by_revenue",
                  "a4_daily_trends", "o1_topk_by_score", "dd_ngram_jaccard")) {
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
