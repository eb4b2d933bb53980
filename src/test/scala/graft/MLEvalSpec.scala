package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.operators.MLEval

/** Hand-computed goldens for the classifier-evaluation operators. AUC
  * cases cover perfect separation, perfect inversion, ties (the ½ term),
  * and the undefined single-class case — the rank-sum identity is easy
  * to get subtly wrong at exactly those edges. */
class MLEvalSpec extends SparkSpec {

  private def scored(rows: Seq[(Double, Int)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("score", "y")
  }

  test("rocAuc: perfect separation is 1.0, perfect inversion is 0.0") {
    val perfect = scored(Seq(0.9 -> 1, 0.8 -> 1, 0.2 -> 0, 0.1 -> 0))
    val r1 = MLEval.rocAuc(perfect, "score", "y").collect().head
    assert(r1.getAs[Double]("auc") == 1.0)
    assert(r1.getAs[Double]("gini") == 1.0)
    val inverted = scored(Seq(0.9 -> 0, 0.8 -> 0, 0.2 -> 1, 0.1 -> 1))
    val r2 = MLEval.rocAuc(inverted, "score", "y").collect().head
    assert(r2.getAs[Double]("auc") == 0.0)
    assert(r2.getAs[Double]("gini") == -1.0)
  }

  test("rocAuc: ties contribute half a pair each") {
    // pos scores {0.5, 0.7}, neg scores {0.5, 0.3}: pairs
    //   (0.5 pos vs 0.5 neg) tie → 0.5, (0.5 vs 0.3) win → 1,
    //   (0.7 vs 0.5) win → 1, (0.7 vs 0.3) win → 1  ⇒ AUC = 3.5/4
    val r = MLEval.rocAuc(
      scored(Seq(0.5 -> 1, 0.7 -> 1, 0.5 -> 0, 0.3 -> 0)), "score", "y")
      .collect().head
    assert(r.getAs[Double]("auc") == 0.875)
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
  }

  test("rocAuc: single-class input yields NULL, not an invented 0.5") {
    val r = MLEval.rocAuc(scored(Seq(0.9 -> 1, 0.1 -> 1)), "score", "y")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("auc")))
    assert(r.isNullAt(r.fieldIndex("gini")))
  }

  test("rocAuc agrees with the brute-force pair count on a mixed sample") {
    // deterministic pseudo-random sample with repeated scores
    val rows = (1 to 200).map { i =>
      val sc = (i * 37 % 19).toDouble / 19.0
      val y = if ((i * 53 % 7) < 3 == (sc > 0.4)) 1 else 0
      (sc, y)
    }
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val pairs = for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    val expected = math.round(pairs.sum / (pos.size * neg.size) * 1e6) / 1e6
    val r = MLEval.rocAuc(scored(rows), "score", "y").collect().head
    assert(r.getAs[Double]("auc") == expected)
  }

  test("calibrationBins: per-bin counts, rates, and the top-edge clamp") {
    val r = MLEval.calibrationBins(
      scored(Seq(0.05 -> 0, 0.05 -> 1, 0.55 -> 1, 0.95 -> 1, 1.0 -> 1)),
      "score", "y", bins = 10)
      .collect().map(x => x.getAs[Long]("bin") ->
        (x.getAs[Long]("cnt"), x.getAs[Double]("pos_rate"))).toMap
    assert(r(0L) == (2L, 0.5))
    assert(r(5L) == (1L, 1.0))
    assert(r(9L) == (2L, 1.0)) // score 1.0 clamps into bin 9
  }

  test("confusionStats: hand-computed cells and the integer-form F1") {
    // threshold 0.5: tp=2 (0.9,0.5 pos), fp=1 (0.6), fn=1 (0.2 pos), tn=1
    val r = MLEval.confusionStats(
      scored(Seq(0.9 -> 1, 0.5 -> 1, 0.2 -> 1, 0.6 -> 0, 0.3 -> 0)),
      "score", "y")
      .collect().head
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fp") == 1L)
    assert(r.getAs[Long]("fn") == 1L && r.getAs[Long]("tn") == 1L)
    assert(r.getAs[Double]("accuracy") == 0.6)
    assert(r.getAs[Double]("precision") == 0.666667)
    assert(r.getAs[Double]("recall") == 0.666667)
    assert(r.getAs[Double]("f1") == 0.666667) // 2·2/(2·2+1+1)
  }

  test("rocAucBy: per-key AUC equals rocAuc run on each key alone") {
    val s = spark
    import s.implicits._
    val rows = (1 to 120).map { i =>
      val key = if (i % 2 == 0) "a" else "b"
      val sc = (i * 37 % 17).toDouble / 17.0
      val y = if ((i * 31 % 5) < 2 == (sc > 0.5)) 1 else 0
      (key, sc, y)
    }
    val df = rows.toDF("k", "score", "y")
    val grouped = MLEval.rocAucBy(df, "k", "score", "y").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Double]("auc")).toMap
    for (key <- Seq("a", "b")) {
      val solo = MLEval.rocAuc(df.filter(col("k") === key), "score", "y")
        .collect().head.getAs[Double]("auc")
      assert(grouped(key) == solo, s"key $key: ${grouped(key)} vs $solo")
    }
  }

  test("ksStatistic: perfect separation has KS 1.0 at the top negative score") {
    // neg scores {0.1, 0.2}, pos {0.8, 0.9}: at s=0.2 CDF_neg=1, CDF_pos=0
    val r = MLEval.ksStatistic(
      scored(Seq(0.8 -> 1, 0.9 -> 1, 0.1 -> 0, 0.2 -> 0)), "score", "y")
      .collect().head
    assert(r.getAs[Double]("ks") == 1.0)
    assert(r.getAs[Double]("ks_score") == 0.2)
  }

  test("ksStatistic: hand-computed mixed case with a tie") {
    // scores asc: 0.2(n) 0.4(p,n) 0.6(p)
    //   s=0.2: |0/2 − 1/2| = 0.5
    //   s=0.4: |1/2 − 2/2| = 0.5  (tie — first attained at 0.2)
    //   s=0.6: |2/2 − 2/2| = 0
    val r = MLEval.ksStatistic(
      scored(Seq(0.2 -> 0, 0.4 -> 1, 0.4 -> 0, 0.6 -> 1)), "score", "y")
      .collect().head
    assert(r.getAs[Double]("ks") == 0.5)
    assert(r.getAs[Double]("ks_score") == 0.2)
  }

  test("prCurve: hand-computed cells at every distinct threshold") {
    val out = MLEval.prCurve(
      scored(Seq(0.2 -> 0, 0.4 -> 1, 0.4 -> 0, 0.6 -> 1)), "score", "y")
      .collect().map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
          r.getAs[Double]("precision"), r.getAs[Double]("recall"))).toMap
    assert(out(0.2) == (2L, 2L, 0.5, 1.0))
    assert(out(0.4) == (2L, 1L, 2.0 / 3.0, 1.0))
    assert(out(0.6) == (1L, 0L, 1.0, 0.5))
  }

  test("prCurve: endpoints and monotonicity on a mixed sample") {
    val rows = (1 to 150).map { i =>
      ((i * 41 % 23).toDouble / 23.0, if (i * 29 % 3 == 0) 1 else 0)
    }
    val out = MLEval.prCurve(scored(rows), "score", "y")
      .collect().sortBy(_.getAs[Double]("threshold"))
    val p = rows.count(_._2 == 1)
    val n = rows.size - p
    // lowest threshold predicts everything positive
    assert(out.head.getAs[Long]("tp") == p && out.head.getAs[Long]("fp") == n)
    assert(out.head.getAs[Double]("recall") == 1.0)
    // tp and fp never increase as the threshold rises
    val tps = out.map(_.getAs[Long]("tp"))
    val fps = out.map(_.getAs[Long]("fp"))
    assert(tps.zip(tps.tail).forall { case (a, b) => a >= b })
    assert(fps.zip(fps.tail).forall { case (a, b) => a >= b })
    // highest threshold keeps at least one prediction (its own group)
    assert(out.last.getAs[Long]("tp") + out.last.getAs[Long]("fp") >= 1L)
  }

  test("cohensKappa: hand-computed chance-corrected agreement") {
    val r = MLEval.cohensKappa(
      scored(Seq(0.9 -> 1, 0.5 -> 1, 0.2 -> 1, 0.6 -> 0, 0.3 -> 0)),
      "score", "y").collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("po") == 0.6)
    assert(r.getAs[Double]("pe") == 0.52)
    assert(r.getAs[Double]("kappa") == 0.166667) // 0.08/0.48
  }

  test("calibrationError: ECE/MCE reconcile with the published bins") {
    // bin 0: cnt 2, mean 0.05, pos 0.5 → gap 0.45
    // bin 9: cnt 2, mean 0.975, pos 1.0 → gap 0.025
    val df = scored(Seq(0.05 -> 0, 0.05 -> 1, 0.95 -> 1, 1.0 -> 1))
    val r = MLEval.calibrationError(df, "score", "y").collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("ece") == 0.2375) // (2·0.45 + 2·0.025)/4
    assert(r.getAs[Double]("mce") == 0.45)
  }

  test("brierLogLoss: hand-computed on two rows") {
    // (0.8, 1): sq err 0.04, ll −ln(0.8); (0.4, 0): sq err 0.16, ll −ln(0.6)
    val r = MLEval.brierLogLoss(
      scored(Seq(0.8 -> 1, 0.4 -> 0)), "score", "y").collect().head
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("brier") == 0.1) // (0.04+0.16)/2
    val expected = math.round(
      (-math.log(0.8) - math.log(0.6)) / 2 * 1e6) / 1e6
    assert(r.getAs[Double]("logloss") == expected)
  }

  test("brierBootstrapCI: constant squared error collapses the CI to a point") {
    val s = spark
    import s.implicits._
    // every row scores 0.8 on label 1 -> sq err 0.04 in EVERY resample,
    // whatever the Poisson weights: the interval must be exactly [c, c]
    val df = (1L to 200L).map(i => (i, 0.8, 1)).toDF("doc_id", "score", "y")
    val r = MLEval.brierBootstrapCI(df, "score", "y", "doc_id").collect().head
    assert(r.getAs[Int]("n_resamples") == 32)
    val c = math.round((0.2 * 0.2) * 1e6) / 1e6
    assert(r.getAs[Double]("brier_mean") == c)
    assert(r.getAs[Double]("brier_lo95") == c)
    assert(r.getAs[Double]("brier_hi95") == c)
  }

  test("brierBootstrapCI: mixed errors give a proper, deterministic interval") {
    val s = spark
    import s.implicits._
    val df = (1L to 400L).map(i =>
      (i, if (i % 4 == 0) 0.9 else 0.6, if (i % 2 == 0) 1 else 0))
      .toDF("doc_id", "score", "y")
    val r1 = MLEval.brierBootstrapCI(df, "score", "y", "doc_id").collect().head
    val r2 = MLEval.brierBootstrapCI(df, "score", "y", "doc_id").collect().head
    assert(r1.toSeq == r2.toSeq) // seeded -> identical across runs
    val (lo, m, hi) = (r1.getAs[Double]("brier_lo95"),
      r1.getAs[Double]("brier_mean"), r1.getAs[Double]("brier_hi95"))
    assert(lo < m && m < hi)
    // the point estimate must sit near the full-sample Brier
    val full = MLEval.brierLogLoss(df, "score", "y").collect().head.getAs[Double]("brier")
    assert(math.abs(m - full) < 0.02, s"mean $m vs full $full")
  }

  test("rankingQuality: hand-computed nDCG/MRR/precision/recall, k=3") {
    val s = spark
    import s.implicits._
    // truth for q1: docs {10, 11, 12} at ranks 1..3 (idcg = 1 + 1/log2(3) + 1/2)
    // system q1:   [20, 11, 12] -> hits at ranks 2,3; first hit rank 2
    // q2: truth {10}; system [10, 20, 30] -> perfect first hit
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (2L, 10L, 1))
      .toDF("query_id", "vec_id", "rank")
    val sys = Seq((1L, 20L, 1), (1L, 11L, 2), (1L, 12L, 3), (2L, 10L, 1),
      (2L, 20L, 2), (2L, 30L, 3)).toDF("query_id", "vec_id", "rank")
    val out = MLEval.rankingQuality(sys, truth, k = 3).collect()
    val q1 = out(0)
    assert(q1.getAs[Long]("hits") == 2L)
    assert(q1.getAs[Double]("precision_at_k") == math.round(2.0 / 3 * 1e6) / 1e6)
    assert(q1.getAs[Double]("recall_at_k") == math.round(2.0 / 3 * 1e6) / 1e6)
    assert(q1.getAs[Double]("mrr") == 0.5)
    val dcg1 = 1.0 / (math.log(3) / math.log(2)) + 1.0 / 2
    val idcg1 = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 1.0 / 2
    assert(q1.getAs[Double]("ndcg") == math.round(dcg1 / idcg1 * 1e6) / 1e6)
    val q2 = out(1)
    assert(q2.getAs[Long]("n_truth") == 1L)
    assert(q2.getAs[Double]("recall_at_k") == 1.0)
    assert(q2.getAs[Double]("mrr") == 1.0)
    assert(q2.getAs[Double]("ndcg") == 1.0)
    // precision counts the k-list, not the truth size
    assert(q2.getAs[Double]("precision_at_k") == math.round(1.0 / 3 * 1e6) / 1e6)
  }

  test("rankingQuality: zero overlap yields all-zero metrics, not nulls") {
    val s = spark
    import s.implicits._
    val truth = Seq((1L, 10L, 1)).toDF("query_id", "vec_id", "rank")
    val sys = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "vec_id", "rank")
    val r = MLEval.rankingQuality(sys, truth, k = 3).collect().head
    assert(r.getAs[Long]("hits") == 0L)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Double]("ndcg") == 0.0)
    assert(r.getAs[Double]("recall_at_k") == 0.0)
  }

  test("rankingQuality: non-contiguous truth ranks still yield nDCG <= 1") {
    val s = spark
    import s.implicits._
    // a FILTERED relevance set: ranks 3 and 7 survive. The ideal DCG must
    // be computed at positions 1..2, not 3 and 7 — a perfect system list
    // scores exactly 1.0, never more.
    val truth = Seq((1L, 10L, 3), (1L, 11L, 7)).toDF("query_id", "vec_id", "rank")
    val sys = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 30L, 3))
      .toDF("query_id", "vec_id", "rank")
    val r = MLEval.rankingQuality(sys, truth, k = 3).collect().head
    assert(r.getAs[Long]("n_truth") == 2L)
    assert(r.getAs[Double]("ndcg") == 1.0)
    assert(r.getAs[Double]("recall_at_k") == 1.0)
  }

  test("rankingQuality: a truth-less query is kept with NULL recall/nDCG") {
    val s = spark
    import s.implicits._
    val truth = Seq((1L, 10L, 1)).toDF("query_id", "vec_id", "rank")
    val sys = Seq((1L, 10L, 1), (2L, 20L, 1), (2L, 30L, 2))
      .toDF("query_id", "vec_id", "rank")
    val out = MLEval.rankingQuality(sys, truth, k = 3).collect()
    assert(out.length == 2) // q2 survives the left join
    val q2 = out(1)
    assert(q2.getAs[Long]("query_id") == 2L)
    assert(q2.getAs[Long]("n_truth") == 0L)
    assert(q2.getAs[Long]("hits") == 0L)
    assert(q2.getAs[Double]("mrr") == 0.0)
    assert(q2.isNullAt(q2.fieldIndex("recall_at_k")))
    assert(q2.isNullAt(q2.fieldIndex("ndcg")))
  }

  test("lengthBatchingReport: hand-computed waste, sorted order eliminates it") {
    val s = spark
    import s.implicits._
    // arrival order interleaves short/long: batches of 2 -> {1,10},{1,10}
    // padded 2*10 + 2*10 = 40 vs 22 tokens; length-sorted -> {1,1},{10,10}
    // padded 2*1 + 2*10 = 22 = exact, zero waste
    val docs = Seq(
      (1L, "a"), (2L, Seq.fill(10)("w").mkString(" ")),
      (3L, "b"), (4L, Seq.fill(10)("x").mkString(" ")))
      .toDF("doc_id", "text")
    val rep = operators.MLEval.lengthBatchingReport(docs, "text", "doc_id", 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rep("arrival_order") == ((2L, 22L, 40L, 0.45)))
    assert(rep("length_sorted") == ((2L, 22L, 22L, 0.0)))
  }

  test("confusionStats: empty-denominator metrics are NULL") {
    // every score below threshold, all labels negative: tp=fp=fn=0
    val r = MLEval.confusionStats(
      scored(Seq(0.1 -> 0, 0.2 -> 0)), "score", "y").collect().head
    assert(r.getAs[Long]("tn") == 2L)
    assert(r.isNullAt(r.fieldIndex("precision")))
    assert(r.isNullAt(r.fieldIndex("f1")))
    assert(r.getAs[Double]("accuracy") == 1.0)
  }

  test("targetEncode: own label excluded, smoothing toward prior, singleton encodes to prior") {
    val s = spark
    import s.implicits._
    // cat A: labels 1,1,0 (sum 2); cat B: single row label 1. prior = 3/4
    val df = Seq((1L, "A", 1), (2L, "A", 1), (3L, "A", 0), (4L, "B", 1))
      .toDF("id", "cat", "y")
    val out = MLEval.targetEncode(df, "cat", col("y"), "id", m = 4.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val prior = 0.75
    def enc(sumMinus: Long, cntMinus: Long) =
      math.round((sumMinus + 4.0 * prior) / (cntMinus + 4.0) * 1e6) / 1e6
    assert(out(1L) == enc(1, 2)) // A, own 1 excluded: (1 + 3)/(2 + 4)
    assert(out(3L) == enc(2, 2)) // A, own 0 excluded: (2 + 3)/6
    // singleton category: nothing left after LOO -> exactly the prior
    assert(out(4L) == prior)
    // leakage check: rows with different labels in the SAME category get
    // different encodings (the label is genuinely subtracted out)
    assert(out(1L) != out(3L))
  }

  test("olsFit: exact line recovered, hand-checked noisy fit, zero-variance degenerate") {
    val s = spark
    import s.implicits._
    // y = 3x + 2 exactly: slope/intercept exact, r2 = 1, rmse = mae = 0
    val exact = (1L to 10L).map(x => (x, 3 * x + 2)).toDF("x", "y")
    val e = MLEval.olsFit(exact, col("x"), col("y")).collect().head
    assert(e.getAs[Double]("slope") == 3.0 && e.getAs[Double]("intercept") == 2.0)
    assert(e.getAs[Double]("r2") == 1.0 && e.getAs[Double]("rmse") == 0.0 &&
      e.getAs[Double]("mae") == 0.0)
    // hand-checked noisy fit: points (0,0),(1,2),(2,2) -> slope 1,
    // intercept 1/3, r2 = 3/4, sse = 2/3 -> rmse = sqrt(2/9), mae residuals
    // |0-1/3|,|2-4/3|,|2-7/3| -> mean 4/9
    val noisy = Seq((0L, 0L), (1L, 2L), (2L, 2L)).toDF("x", "y")
    val nf = MLEval.olsFit(noisy, col("x"), col("y")).collect().head
    assert(nf.getAs[Double]("slope") == 1.0)
    assert(nf.getAs[Double]("intercept") == 0.333333)
    assert(nf.getAs[Double]("r2") == 0.75)
    assert(nf.getAs[Double]("rmse") == math.round(math.sqrt(2.0 / 9.0) * 1e6) / 1e6)
    assert(nf.getAs[Double]("mae") == 0.444444)
    // zero-variance x: every metric NULL, no division error
    val flat = Seq((5L, 1L), (5L, 2L)).toDF("x", "y")
    val d = MLEval.olsFit(flat, col("x"), col("y")).collect().head
    assert(d.getAs[Long]("n") == 2L)
    for (c <- Seq("slope", "intercept", "r2", "rmse", "mae"))
      assert(d.isNullAt(d.fieldIndex(c)), c)
  }

  test("mcnemar: hand-counted discordant cells, continuity correction, degenerate agreement") {
    val s = spark
    import s.implicits._
    // (predA, predB, label): b (A right, B wrong) = 3, c = 1, both_right = 2,
    // both_wrong = 1 -> chi2 = (|3-1|-1)^2 / 4 = 0.25, not significant
    val df = Seq(
      (1, 0, 1), (1, 0, 1), (1, 0, 1), // b x3
      (0, 1, 1),                       // c x1
      (1, 1, 1), (0, 0, 0),            // both right x2
      (0, 0, 1))                       // both wrong x1
      .toDF("a", "b", "y")
    val r = MLEval.mcnemar(df, col("a") === 1, col("b") === 1, col("y") === 1)
      .collect().head
    assert(r.getAs[Long]("b_only_a") == 3L && r.getAs[Long]("c_only_b") == 1L)
    assert(r.getAs[Long]("both_right") == 2L && r.getAs[Long]("both_wrong") == 1L)
    assert(r.getAs[Double]("chi2") == 0.25)
    assert(!r.getAs[Boolean]("significant"))
    // models that never disagree: chi2 NULL, calmly not significant
    val same = Seq((1, 1, 1), (0, 0, 1)).toDF("a", "b", "y")
    val d = MLEval.mcnemar(same, col("a") === 1, col("b") === 1, col("y") === 1)
      .collect().head
    assert(d.isNullAt(d.fieldIndex("chi2")) && !d.getAs[Boolean]("significant"))
    // a heavily one-sided disagreement IS significant: b=12, c=0 ->
    // chi2 = (12-1)^2/12 = 10.08 > 3.841
    val oneSided = (Seq.fill(12)((1, 0, 1)) ++ Seq((1, 1, 1))).toDF("a", "b", "y")
    val o = MLEval.mcnemar(oneSided, col("a") === 1, col("b") === 1, col("y") === 1)
      .collect().head
    assert(o.getAs[Boolean]("significant") && o.getAs[Double]("chi2") > 10.0)
  }

  test("pairwiseWinMatrix: canonical pairs, tie convention, self/odd duels dropped") {
    val s = spark
    import s.implicits._
    val duels = Seq(
      // duel 1: B beats A
      (1L, "A", 0.2, 10L), (1L, "B", 0.9, 11L),
      // duel 2: A beats B
      (2L, "B", 0.1, 20L), (2L, "A", 0.5, 21L),
      // duel 3: score tie -> higher id (31, B) wins
      (3L, "A", 0.5, 30L), (3L, "B", 0.5, 31L),
      // duel 4: self-duel, dropped
      (4L, "A", 0.9, 40L), (4L, "A", 0.1, 41L),
      // duel 5: singleton, dropped
      (5L, "C", 0.8, 50L))
      .toDF("duel", "item", "score", "id")
    val out = MLEval.pairwiseWinMatrix(duels, "duel", "item", "score", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out.keySet == Set(("A", "B")))
    // 3 counted duels: A won 1, B won 2 (incl. the id tie-break)
    assert(out(("A", "B")) == ((3L, 1L, 2L, 0.333333)))
  }

  test("bradleyTerry: two-item strengths hit the closed-form win ratio; zero-win item decays to 0") {
    val s = spark
    import s.implicits._
    // A beats B 3 of 4: two-item BT MLE is p_A = 3/4 under sum-1
    val m1 = Seq(("A", "B", 3L, 4L)).map { case (a, b, w, n) =>
      (a, b, w, n - w, n) }.toDF("item_a", "item_b", "wins_a", "wins_b", "n_duels")
    val r1 = MLEval.bradleyTerry(m1, iters = 15)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(r1("A") - 0.75) < 1e-6 && math.abs(r1("B") - 0.25) < 1e-6)
    // C never wins: its BT MLE is 0; survivors still order by dominance
    val m2 = Seq(("A", "B", 3L, 1L, 4L), ("A", "C", 4L, 0L, 4L),
      ("B", "C", 4L, 0L, 4L)).toDF("item_a", "item_b", "wins_a", "wins_b", "n_duels")
    val out = MLEval.bradleyTerry(m2, iters = 15).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(out("C")._1 == 0L && out("C")._2 == 0.0)
    assert(out("A")._2 > out("B")._2 && out("B")._2 > 0.0)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-5) // normalized
  }
}
