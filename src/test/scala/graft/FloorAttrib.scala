package graft

import org.apache.spark.sql.functions._

/** Scratch attribution probe: the three sf0.1 drifters timed with the
  * floored documents loader vs a plain load, same session. */
object FloorAttribMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "floor-attrib")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def variants(docs: org.apache.spark.sql.DataFrame) =
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat_ws(" ",
            slice(functions.TextFns.tokens(col("text")), lit(1),
              greatest(size(functions.TextFns.tokens(col("text"))) - 8, lit(4)))).as("text"))
    def run(tag: String, docs: () => org.apache.spark.sql.DataFrame): Unit = {
      // warmup + 2 measured, min (Bench protocol)
      def j1() = time(operators.Dedup.containmentAntiJoin(
        docs().filter(col("doc_id") % 2 === 1),
        docs().filter(col("doc_id") % 2 === 0), "text", "doc_id", n = 4).count())
      def mh() = time(operators.Dedup.minhashNearDupPairs(
        docs().select("doc_id", "text").unionByName(variants(docs())),
        "text", "doc_id", n = 4, k = 32, bands = 8, minJaccard = 0.5,
        family = operators.Dedup.PortableFamily).count())
      def pr() = time(operators.Dedup.minhashPrCurve(
        docs().select("doc_id", "text").unionByName(variants(docs())),
        "text", "doc_id", n = 4, k = 32, bands = 8,
        family = operators.Dedup.PortableFamily).count())
      j1(); mh(); pr()
      val j = math.min(j1(), j1()); val m = math.min(mh(), mh()); val p = math.min(pr(), pr())
      println(f"$tag: j1=$j%.2f minhash=$m%.2f pr=$p%.2f")
    }
    run("floored", () => Tables.documents(spark, d))
    run("plain  ", () => Tables.load(spark, d, "documents"))
  }
}
