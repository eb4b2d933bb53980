package graft

import org.apache.spark.sql.functions._

object P1ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "p1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val df = functions.Sentiment.score(Tables.documents(spark, "/tmp/sf1"))
      .filter(col("original_score") >= 0.3 && col("n_chars") >= 30)
      .select("doc_id", "text", "sentiment", "original_score")
    df.count()
    println(df.queryExecution.executedPlan.toString.split("\n")
      .map(_.take(120)).mkString("\n"))
  }
}
