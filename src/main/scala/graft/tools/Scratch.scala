package graft.tools
import graft._
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
    // warmup
    time("pairs-warm") {
      graft.operators.Dedup.ngramJaccardPairs(
        Tables.documents(spark, d), "text", "doc_id", n = 3, minJaccard = 0.1).count()
    }
    spark.catalog.clearCache()
    val pairs = time("pairs") {
      val p = graft.operators.Dedup.ngramJaccardPairs(
        Tables.documents(spark, d), "text", "doc_id", n = 3, minJaccard = 0.1)
      println("[scratch] n_pairs=" + p.count()); p
    }
    spark.catalog.clearCache()
    time("components") {
      val c = graft.operators.Dedup.canonicalComponents(pairs)
      println("[scratch] n_nodes=" + c.count())
    }
    spark.catalog.clearCache()
    // instrumented copy of the loop to see where the time goes
    time("components-instrumented") {
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct().persist()
      println("[scratch] n_edges=" + edges.count())
      var labels = time("init-checkpoint") {
        edges.select(col("src").as("id")).distinct()
          .withColumn("lbl", col("id")).localCheckpoint()
      }
      var prevSum = time("init-sum") { labels.agg(sum(col("lbl"))).collect()(0).getLong(0) }
      var iter = 0
      var converged = false
      while (!converged && iter < 20) {
        val neighborMin = edges
          .join(labels.withColumnRenamed("id", "dst_id"), col("dst") === col("dst_id"))
          .groupBy(col("src").as("id")).agg(min(col("lbl")).as("nlbl"))
        val propagated = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        val next = time(s"round-$iter-checkpoint") {
          propagated.as("x")
            .join(propagated.select(col("id").as("lid"), col("lbl").as("lbl2")).as("y"),
              col("x.lbl") === col("y.lid"), "left")
            .select(col("x.id").as("id"),
              least(col("x.lbl"), coalesce(col("lbl2"), col("x.lbl"))).as("lbl"))
            .localCheckpoint()
        }
        val nextSum = time(s"round-$iter-sum") { next.agg(sum(col("lbl"))).collect()(0).getLong(0) }
        labels = next
        converged = nextSum == prevSum
        prevSum = nextSum
        iter += 1
      }
      println(s"[scratch] rounds=$iter")
    }
    spark.stop()
  }
}
