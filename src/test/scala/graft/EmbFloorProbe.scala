package graft

import org.apache.spark.sql.functions._

/** Scratch probe: embeddings entries with a plain vs floored embeddings
  * frame at both bench scales — re-testing the r12 "floor is
  * net-negative for embeddings" decision per-operator. */
object EmbFloorProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "emb-floor")
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("PROBE_SF", "/tmp/sf1")
    def time(f: => Long): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def run(tag: String, emb: () => org.apache.spark.sql.DataFrame): Unit = {
      def sq() = time(operators.Similarity.sqTopK(emb(), queryId = 0, k = 10, shortlist = 50).count())
      def pq() = time(operators.Similarity.pqTopK(emb(), queryId = 0, k = 10, m = 8, nCodes = 16, dim = 64).count())
      def occ() = time({
        val e = emb()
        val cents = e.select(col("vec_id"), operators.Similarity.toDoubleArray(col("embedding")).as("v"))
          .filter(col("vec_id") < 16).select(col("vec_id").as("cell"), col("v").as("cv"))
        operators.Similarity.cellOccupancy(e, cents, expectedOccupancy = 24L, factor = 4.0).count()
      })
      def cells() = time(operators.Similarity.cellNearDupPairsAuto(emb(), threshold = 0.4).count())
      sq(); pq(); occ(); cells()
      println(f"$tag: sq=${math.min(sq(), sq())}%.2f pq=${math.min(pq(), pq())}%.2f occ=${math.min(occ(), occ())}%.2f cells=${math.min(cells(), cells())}%.2f")
    }
    run("plain  ", () => Tables.embeddings(spark, d))
    val floor = spark.sparkContext.defaultParallelism
    run("floored", () => Tables.embeddings(spark, d).repartition(floor))
  }
}
