package graft.ml

import org.apache.spark.ml.feature.{CountVectorizer, IDF, NGram, RegexTokenizer}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** V1-V3 (ref `Context_analyzer_RoBERTa_fun.py:73-133`): TF-IDF
  * vectorization + K-means clustering + cosine-to-centroid representative
  * selection, per sentiment class.
  *
  * Spark-first restatement of the sklearn pipeline:
  *  - V1 TF-IDF: RegexTokenizer → NGram(2) unioned with unigrams →
  *    CountVectorizer(vocabSize=1000, minDF=4, maxDF=0.8) → IDF
  *    (ref defaults `:484-486`); MLlib consumes the sparse vectors
  *    natively — no dense-ification (the reference's `.toarray()` is
  *    strictly worse, SURVEY §4);
  *  - V2 KMeans(k = min(10, n), seed=42) (ref `:104-106`; sklearn's
  *    n_init=10 has no MLlib analog — structural invariants, not centroid
  *    parity, are the contract, SURVEY §7.4);
  *  - V3 representative = cosine-argmax member per cluster, carrying
  *    `cluster_id`, `cluster_size`; inputs smaller than k bypass
  *    clustering with `cluster_id=0, cluster_size=n` (ref `:87-133`).
  *
  * Cosine-to-centroid is computed with a broadcast of the k centroid
  * vectors (k <= 10) — no shuffle beyond KMeans' own iterations.
  */
object Representatives {

  private val cosineToCentroid = udf { (v: Vector, c: Vector) =>
    var dot = 0.0
    v.foreachActive((i, x) => dot += x * c(i))
    val n = Math.sqrt(v.toArray.map(x => x * x).sum) *
      Math.sqrt(c.toArray.map(x => x * x).sum)
    if (n == 0.0) 0.0 else dot / n
  }

  /** Output schema of [[forClass]] / [[representatives]] minus the
    * `sentiment` tag column. */
  private val outputSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("confidence", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("cluster_id", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("cluster_size", org.apache.spark.sql.types.LongType)))

  /** Representatives for one class subset. Expects columns
    * (doc_id, text, confidence). An empty input yields an empty frame WITH
    * the output schema, so unions over class subsets stay well-typed. */
  def forClass(df: DataFrame, k: Int = 10, seed: Long = 42): DataFrame = {
    val n = df.count()
    if (n == 0) return df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], outputSchema)
    if (n < k) // ref :87-133 small-input bypass
      return df.withColumn("cluster_id", lit(0))
        .withColumn("cluster_size", lit(n))
        .select("doc_id", "text", "confidence", "cluster_id", "cluster_size")

    // The iterative fits (CountVectorizer vocab, IDF, ~20 KMeans rounds)
    // each launch jobs over every partition; for a class subset far below
    // one partition-worth per core, per-task overhead dominates. Pack the
    // subset into few partitions sized ~8k rows each (at 100 TB the input
    // arrives already right-sized and this coalesce is a no-op cap).
    val parts = math.max(1, math.min(df.rdd.getNumPartitions, n / 8192 + 1)).toInt
    val dfp = df.coalesce(parts)

    val tok = new RegexTokenizer().setInputCol("text").setOutputCol("toks")
      .setPattern("\\s+")
    val ngram = new NGram().setN(2).setInputCol("toks").setOutputCol("bigrams")
    val withToks = ngram.transform(tok.transform(dfp))
      .withColumn("terms", concat(col("toks"), col("bigrams")))
    val cv = new CountVectorizer().setInputCol("terms").setOutputCol("tf")
      .setVocabSize(1000).setMinDF(4).setMaxDF(0.8 * n)
    val cvModel = cv.fit(withToks)
    val tf = cvModel.transform(withToks)
    val idf = new IDF().setInputCol("tf").setOutputCol("features").fit(tf)
    val feats = idf.transform(tf).cache()

    val kk = math.min(k, n).toInt
    val km = new KMeans().setK(kk).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("cluster_id")
    val model = km.fit(feats)
    val assigned = model.transform(feats)

    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c) }
    val centroidDf = broadcast(
      df.sparkSession.createDataFrame(centroids.toSeq)
        .toDF("cluster_id", "centroid"))

    val withCos = assigned.join(centroidDf, Seq("cluster_id"))
      .withColumn("cos", cosineToCentroid(col("features"), col("centroid")))
    val wSize = Window.partitionBy("cluster_id")
    val wRank = Window.partitionBy("cluster_id")
      .orderBy(col("cos").desc, col("doc_id"))
    val reps = withCos
      .withColumn("cluster_size", count(lit(1)).over(wSize))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === 1)
      .select("doc_id", "text", "confidence", "cluster_id", "cluster_size")
    // ≤ k (=10) rows: materialize locally so the cached feature frame can
    // be released now instead of leaking per class
    val local = reps.collect().toSeq
    feats.unpersist()
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(local, 1), outputSchema)
  }

  /** Per-sentiment representatives over the scored frame (the reference's
    * per-class fan-out, ref `:726-792` — three small fits; each class
    * subset is filtered once from the cached scored frame). */
  def representatives(scored: DataFrame, k: Int = 10, seed: Long = 42): DataFrame = {
    val classes = Seq("NEGATIVE", "NEUTRAL", "POSITIVE")
    // cache the projected input once: the per-class loop + KMeans passes
    // would otherwise recompute the whole upstream pipeline per class
    val base = scored.select("doc_id", "text", "confidence", "sentiment").persist()
    // every forClass result carries the output schema (even when empty),
    // so the union is always well-typed — no isEmpty probe jobs, no
    // reduce-on-empty edge case. The three fits are independent job
    // sequences on small subsets; run them concurrently so their many
    // short jobs interleave on the scheduler instead of serializing.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val futs = classes.map { cls => Future {
      forClass(base.filter(col("sentiment") === cls)
        .select("doc_id", "text", "confidence"), k, seed)
        .withColumn("sentiment", lit(cls))
    } }
    // finite timeout: one wedged fit must fail loudly, not hang the
    // pipeline forever (the three sub-fits are small; 30 min is orders of
    // magnitude above any healthy run at bench scales)
    val out = Await.result(Future.sequence(futs), Duration(30, "min"))
      .reduce(_ unionByName _)
      .select("sentiment", "doc_id", "text", "confidence", "cluster_id", "cluster_size")
      .orderBy("sentiment", "cluster_id")
    // localCheckpoint (not cache): forces the ≤3k-row result before the
    // input cache is released, and leaves the session's CacheManager
    // clean — checkpoint blocks are reclaimed by the ContextCleaner when
    // the frame is GC'd, so nothing accumulates per call
    val materialized = out.localCheckpoint(eager = true)
    base.unpersist()
    materialized
  }
}
