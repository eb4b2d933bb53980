package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.functions.TextFns
import graft.operators.Dedup

/** Throwaway profiling probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "scratch")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"## $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val toks = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    time("tokenize only")(toks.count())
    val shs = toks.select(col("doc_id"), Dedup.shinglesFromTokens(col("toks"), 3).as("shs"))
    time("shingle arrays n=3")(shs.count())
    val sh = shs.select(col("doc_id"), explode(col("shs")).as("sh"))
    time("exploded shingles n=3")(println("rows=" + sh.count()))
    time("distinct shingles")(println("distinct=" + sh.select("sh").distinct().count()))
    val hot = sh.groupBy("sh").count().orderBy(desc("count")).limit(10)
    time("hot shingles")(hot.show(10, false))
    val a = sh.select(col("doc_id").as("id_a"), col("sh"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh"))
    time("pair join rows")(println("pairs=" +
      a.join(b, Seq("sh")).filter(col("id_a") < col("id_b")).count()))
    spark.stop()
  }
}
