package graft.tools
import graft._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the shipped surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "scratch")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val scored = functions.Sentiment.score(Tables.documents(spark, d))
    val w = Window.partitionBy("sentiment")
      .orderBy(col("confidence").desc, col("doc_id"))
    def viaWindow() = scored
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 50)
      .select("sentiment", "doc_id", "confidence")
    def viaHeap() = scored.groupBy("sentiment")
      .agg(graft.plans.TopK.topKByScore(col("confidence"), col("doc_id"),
        struct(col("doc_id"), col("confidence")), 50).as("top"))
      .select(col("sentiment"), explode(col("top")).as("e"))
      .select(col("sentiment"), col("e.doc_id"), col("e.confidence"))
    // warmup both
    viaWindow().count(); viaHeap().count()
    for (_ <- 1 to 3) {
      time("window-top50")(viaWindow().count())
      time("heap-top50")(viaHeap().count())
    }
    spark.stop()
  }
}
