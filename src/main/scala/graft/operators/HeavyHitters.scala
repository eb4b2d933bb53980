package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact heavy hitters in two passes with a Misra–Gries candidate sketch.
  *
  * The naive "GROUP BY item HAVING count > n/k" shuffles one row per
  * DISTINCT item — at 100 TB of text tokens that is a multi-billion-key
  * exchange to find a handful of answers. The two-pass plan instead:
  *
  *  1. runs a Misra–Gries summary with k counters INSIDE each partition
  *     (`mapPartitions`, amortized O(1) per element — every decrement is
  *     paid for by a prior increment), emitting ≤ k candidate items per
  *     partition. The merged-summary guarantee: any item with global
  *     frequency f > n/k satisfies Σ_p est_p ≥ f − Σ_p n_p/k = f − n/k > 0,
  *     so it survives in at least one partition's summary — the union of
  *     per-partition candidates is a SUPERSET of the true heavy hitters;
  *  2. exactly counts ONLY the candidates: a broadcast left-semi join
  *     prunes the corpus map-side to ≤ k×partitions keys before the one
  *     remaining (tiny) shuffle, and the true threshold n/k filters the
  *     false candidates out.
  *
  * The result is exactly the naive GROUP BY's (the DuckDB oracle runs the
  * naive form), but the exchanged data is O(k × partitions), not
  * O(distinct items). */
object HeavyHitters {

  /** Per-partition Misra–Gries: returns the ≤ k tracked items. */
  private def misraGries(k: Int)(it: Iterator[String]): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      counters.get(x) match {
        case Some(c) => counters.update(x, c + 1)
        case None if counters.size < k => counters.update(x, 1L)
        case None =>
          // decrement-all round: amortized against the increments that
          // funded these counters, so the whole pass stays O(n)
          val dead = List.newBuilder[String]
          counters.mapValuesInPlace { (item, c) =>
            if (c == 1L) dead += item; c - 1
          }
          dead.result().foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** All items of `itemCol` (NULLs excluded) with frequency strictly
    * greater than total/k, with exact counts and corpus share, ROUND(6). */
  def exactHeavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    val candidates: Dataset[String] =
      items.as[String].mapPartitions(misraGries(k))
    val total = items.agg(count(lit(1)).as("__total"))
    items
      .join(broadcast(candidates.toDF("item").distinct()), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") > col("__total").cast("double") / k)
      .withColumn("share",
        round(col("cnt").cast("double") / col("__total").cast("double"), 6))
      .select(col("item"), col("cnt"), col("share"))
      .orderBy(col("cnt").desc, col("item"))
  }

  /** Heavy-hitter words of a text corpus: same tokenization + stoplist as
    * [[Analytics.wordCounts]] (A8), threshold total/k. */
  def heavyHitterWords(docs: DataFrame, textCol: String, k: Int,
                       stop: Seq[String] = Analytics.StopWords): DataFrame = {
    val toks = graft.functions.TextFns.tokens(
      graft.functions.TextFns.wordcloudClean(col(textCol)))
    val words = docs
      .select(explode(toks).as("word"))
      .filter(!col("word").isin(stop: _*) && length(col("word")) > 2)
    exactHeavyHitters(words, "word", k)
      .withColumnRenamed("item", "word")
  }
}
