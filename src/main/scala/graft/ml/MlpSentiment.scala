package graft.ml

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, FileOutputStream}

import graft.functions.Sentiment

/** A REAL model runtime behind the V4 inference seam — the piece the seam
  * entries (`v4_seam_*`) proved the shape of but never exercised: an
  * actual neural network (hashed-bag-of-words → ReLU hidden layer →
  * 2-class logits) executed as batched tensor arithmetic from a LOADED
  * MODEL ARTIFACT, with the full production runtime boundary the
  * reference's DistilBERT stage has (ref
  * `Context_analyzer_RoBERTa_fun.py:520-532` session setup, `:623-647`
  * batch-100 inference loop):
  *
  *  - **model artifact**: weights serialized to one binary file
  *    ([[save]]/[[load]] — magic + dims + row-major doubles), the
  *    swap-one-file deployment posture of any ONNX/TorchScript bundle;
  *  - **per-JVM session cache** ([[sessionFor]]): each executor loads the
  *    artifact ONCE and reuses it across partitions/batches — the
  *    `OrtEnvironment`/session-singleton pattern; the task closure
  *    carries only the path string, never the weights;
  *  - **batched inference** ([[forward]]): one call scores a whole batch
  *    (B×V count matrix → B×H hidden → B×2 logits, nested fixed-order
  *    loops), amortizing the per-call boundary exactly where a JNI/GPU
  *    runtime would;
  *  - **unchanged downstream**: wired through
  *    [[Sentiment.scoreWithModel]]'s `mapPartitions` seam, so F8
  *    thresholding, F7 original_score, and every A* aggregation consume
  *    it untouched.
  *
  * Scoped honest: this container has no ONNX runtime jar and no way to
  * bundle released transformer weights (zero egress), so the network is
  * tiny and its weights are derived deterministically — but nothing
  * about the RUNTIME shape is stubbed: artifact I/O, session caching,
  * batch tensor math, and the seam plumbing are all real and measured
  * (SCALE.md carries rows/s at batch 100 vs 1000). Every forward-pass
  * operation is plain double arithmetic in pinned evaluation order, so
  * the DuckDB oracle ([[oracleCtes]], generated FROM the model object —
  * SQL and weights cannot drift) replays the network bit-for-bit and
  * the downstream catalog entry stays hash-green.
  */
object MlpSentiment {

  /** Model: `w1` is H×V (row-major per hidden unit), `w2` is 2×H;
    * logit index 1 is the POSITIVE class. */
  final case class Model(v: Int, h: Int,
                         w1: Array[Array[Double]], b1: Array[Double],
                         w2: Array[Array[Double]], b2: Array[Double])

  /** F8 threshold shared with the rest of the pipeline. */
  val V = 64
  val H = 8

  /** Deterministic weight derivation (training stand-in): the
    * `ta_hashed_classifier` md5 family — w = (hash60(tag) mod 2001 −
    * 1000)/1000 ∈ [−1, 1]. A real training run would overwrite the
    * artifact; everything downstream only ever sees [[load]]ed bytes. */
  private def dw(tag: String): Double =
    (Sentiment.hash60(tag) % 2001L - 1000L).toDouble / 1000.0

  def defaultModel: Model = Model(
    v = V, h = H,
    w1 = Array.tabulate(H, V)((j, k) => dw(s"mlp:w1:$j:$k")),
    b1 = Array.tabulate(H)(j => dw(s"mlp:b1:$j")),
    w2 = Array.tabulate(2, H)((i, j) => dw(s"mlp:w2:$i:$j")),
    b2 = Array.tabulate(2)(i => dw(s"mlp:b2:$i")))

  private val Magic = 0x47524d4c // "GRML"

  def save(m: Model, path: String): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    // write-to-temp + atomic rename: a crash mid-write must never leave a
    // truncated artifact at the published path — callers gate the rewrite
    // on existence, so a partial file would poison every later session
    // (the parquet-state _SUCCESS discipline, applied to a single file)
    val tmp = new java.io.File(path + ".tmp")
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(tmp)))
    try {
      out.writeInt(Magic); out.writeInt(1)
      out.writeInt(m.v); out.writeInt(m.h)
      m.w1.foreach(_.foreach(out.writeDouble))
      m.b1.foreach(out.writeDouble)
      m.w2.foreach(_.foreach(out.writeDouble))
      m.b2.foreach(out.writeDouble)
    } finally out.close()
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def load(path: String): Model =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), path)

  private def parse(bytes: Array[Byte], path: String): Model = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, s"not a graft MLP artifact: $path")
    require(in.readInt() == 1, "unsupported MLP artifact version")
    val v = in.readInt(); val h = in.readInt()
    Model(v, h,
      Array.fill(h)(Array.fill(v)(in.readDouble())),
      Array.fill(h)(in.readDouble()),
      Array.fill(2)(Array.fill(h)(in.readDouble())),
      Array.fill(2)(in.readDouble()))
  }

  /** Per-JVM model session cache keyed on (path, CRC32-of-content) —
    * load once per executor, share across tasks (the runtime-session
    * singleton every inference engine keeps). CONTENT-keyed, not
    * stat-keyed: an artifact retrained in place is picked up at the
    * next batch even when the rewrite lands inside one mtime tick and
    * the (fixed-layout) size never changes — the stat key could serve
    * generation-1 weights against generation-2 oracle SQL. The cost is
    * one read+CRC of a few-KB file per BATCH, noise next to the
    * batch's matmuls. Entries for superseded generations linger but
    * are bounded by the number of generations a JVM ever observes. */
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Model]()

  def sessionFor(path: String): Model = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val crc = new java.util.zip.CRC32()
    crc.update(bytes)
    sessions.computeIfAbsent((path, crc.getValue), _ => parse(bytes, path))
  }

  /** Batched forward pass: tokenize (the engine-wide whitespace
    * convention), hash-bag into a B×V count matrix, then the two matmuls
    * with ReLU between, all in ascending-index evaluation order so the
    * SQL replay is bit-identical. Returns (raw_label, confidence) per
    * text — the [[Sentiment.scoreWithModel]] contract. Empty-token texts
    * score (POSITIVE, 0.5) (→ NEUTRAL after F8), the hashedBatchScorer
    * convention. */
  def forward(m: Model, texts: Seq[String]): Seq[(String, Double)] =
    texts.map { t =>
      val toks = t.trim.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) ("POSITIVE", 0.5)
      else {
        val c = new Array[Double](m.v)
        toks.foreach(tk => c((Sentiment.hash60(tk) % m.v).toInt) += 1.0)
        val hid = new Array[Double](m.h)
        var j = 0
        while (j < m.h) {
          var acc = m.b1(j)
          val row = m.w1(j)
          var k = 0
          while (k < m.v) { acc += row(k) * c(k); k += 1 }
          hid(j) = if (acc > 0.0) acc else 0.0
          j += 1
        }
        val logits = new Array[Double](2)
        var i = 0
        while (i < 2) {
          var acc = m.b2(i)
          val row = m.w2(i)
          var jj = 0
          while (jj < m.h) { acc += row(jj) * hid(jj); jj += 1 }
          logits(i) = acc
          i += 1
        }
        val margin = logits(1) - logits(0)
        val conf = math.min(0.99,
          0.5 + 0.3 * math.abs(margin) / math.sqrt(toks.length.toDouble))
        (if (margin >= 0.0) "POSITIVE" else "NEGATIVE", conf)
      }
    }

  /** The seam-shaped batch scorer: resolves the session from the path
    * INSIDE the closure (per-executor, cached), then one [[forward]] per
    * batch — plug straight into [[Sentiment.scoreWithModel]]. */
  def batchScorer(modelPath: String): Seq[String] => Seq[(String, Double)] =
    texts => forward(sessionFor(modelPath), texts)

  // --------------------------------------------------------------------
  // DuckDB oracle rendering — generated FROM the model object, so the
  // SQL weights and the artifact weights cannot drift. Requires the
  // `toks` CTE (Sentiment.oracleCte) in scope; exposes `msent` (through
  // 3-class sentiment) and `mscored` (+original_score), the seamCteSql
  // naming convention.
  // --------------------------------------------------------------------

  private def d(x: Double): String = s"CAST($x AS DOUBLE)"

  /** One hidden-unit linear expression: left-assoc chain starting from
    * the bias, ascending k — the exact [[forward]] accumulation order. */
  private def linSql(bias: Double, w: Array[Double], cell: Int => String): String =
    w.zipWithIndex.foldLeft(d(bias)) { case (acc, (wk, k)) =>
      s"($acc + ${d(wk)} * ${cell(k)})"
    }

  def oracleCtes(m: Model): String = {
    val hCols = (0 until m.h).map { j =>
      val lin = linSql(m.b1(j), m.w1(j), k => s"c[${k + 1}]")
      s"CASE WHEN $lin > ${d(0.0)} THEN $lin ELSE ${d(0.0)} END AS h$j"
    }.mkString(",\n    ")
    val lCols = (0 until 2).map { i =>
      s"${linSql(m.b2(i), m.w2(i), j => s"h$j")} AS l$i"
    }.mkString(",\n    ")
    def likeSum(c: String, words: Seq[String]): String =
      words.map(w => s"(CASE WHEN $c LIKE '%$w%' THEN 1 ELSE 0 END)").mkString(" + ")
    s"""mc AS (
       |  SELECT doc_id, text, CAST(len(tokens) AS INT) AS wc,
       |    list_transform(range(0, ${m.v}), k -> CAST(len(list_filter(
       |      list_transform(tokens, t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % ${m.v}),
       |      b -> b = k)) AS DOUBLE)) AS c
       |  FROM toks),
       |mh AS (SELECT doc_id, text, wc,
       |    $hCols
       |  FROM mc),
       |ml AS (SELECT doc_id, text, wc,
       |    $lCols
       |  FROM mh),
       |mw AS (SELECT doc_id, text, wc,
       |    CASE WHEN wc = 0 THEN ${d(0.5)}
       |         ELSE LEAST(${d(0.99)}, ${d(0.5)}
       |           + ${d(0.3)} * abs(l1 - l0) / sqrt(CAST(wc AS DOUBLE))) END
       |      AS confidence,
       |    CASE WHEN wc = 0 OR (l1 - l0) >= ${d(0.0)}
       |         THEN 'POSITIVE' ELSE 'NEGATIVE' END AS raw_label
       |  FROM ml),
       |msent AS (SELECT *, CASE WHEN confidence > ${d(0.8)}
       |    THEN raw_label ELSE 'NEUTRAL' END AS sentiment FROM mw),
       |mscored AS (SELECT *, CASE WHEN wc <= 4 THEN ${d(0.0)}
       |    ELSE ${d(0.05)} * CAST(wc - 4 AS DOUBLE) + ${d(0.1)} * CAST(
       |      CASE WHEN sentiment = 'POSITIVE' THEN ${likeSum("text", Sentiment.PositiveWords)}
       |           WHEN sentiment = 'NEGATIVE' THEN ${likeSum("text", Sentiment.NegativeWords)}
       |           ELSE ${likeSum("text", Sentiment.NeutralWords)} END AS DOUBLE)
       |    END AS original_score
       |  FROM msent)""".stripMargin
  }
}
