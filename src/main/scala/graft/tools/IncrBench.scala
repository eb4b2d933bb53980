package graft.tools

import org.apache.spark.sql.functions._

import graft._
import graft.functions.TextFns
import graft.operators.Dedup

/** Measurement probe for the incremental-components claim (SCALE.md):
  * with corpus labels and pair frames held constant (checkpointed), time
  * a FULL component recompute over corpus ∪ batch pairs against
  * [[Dedup.incrementalComponents]] over the same batch — the per-ingest
  * label-maintenance cost a production pipeline actually pays. Prints
  * one JSON line. Run:
  * `SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.IncrBench"`. */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "incr-bench")
    val docs = Tables.documents(spark, sfDir)
    // native family: this probe measures the LABEL algebra, not the
    // oracle-parity hash family
    val corpusPairs = Dedup.minhashNearDupPairs(
        docs.select("doc_id", "text"), "text", "doc_id",
        n = 4, k = 32, bands = 8, minJaccard = 0.5)
      .select("id_a", "id_b").localCheckpoint(true)
    val every = sys.env.getOrElse("SPARK_GRAFT_EVERY", "17").toInt
    val batch = docs.filter(col("doc_id") % every === 0)
      .select((col("doc_id") + 2000000).as("doc_id"),
        concat_ws(" ", slice(TextFns.tokens(col("text")), lit(1),
          greatest(size(TextFns.tokens(col("text"))) - 6, lit(4)))).as("text"))
    val newPairs = Dedup.minhashProbePairs(batch, docs.select("doc_id", "text"),
        "text", "doc_id", n = 4, k = 32, bands = 8, minJaccard = 0.5)
      .select(col("probe_id").as("id_a"), col("corpus_id").as("id_b"))
      .localCheckpoint(true)
    val labels = Dedup.canonicalComponents(corpusPairs).localCheckpoint(true)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warmup both paths once, then min-of-2
    def full() = Dedup.canonicalComponents(
      corpusPairs.unionByName(newPairs)).count()
    def incr() = Dedup.incrementalComponents(labels, newPairs).count()
    full(); incr()
    val fulls = Seq.fill(2)(time(full()))
    val incrs = Seq.fill(2)(time(incr()))
    val fmt = (v: Double) => String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"sf":"$sfDir","corpus_pairs":${corpusPairs.count()},"new_pairs":${newPairs.count()},"labels":${labels.count()},"full_recompute_sec":${fmt(fulls.map(_._1).min)},"incremental_sec":${fmt(incrs.map(_._1).min)},"rows":${incrs.head._2}}""")
    spark.stop()
  }
}
