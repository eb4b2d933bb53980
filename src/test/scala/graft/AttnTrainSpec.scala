package graft

import graft.ml.{AttnSentiment, AttnTrain}
import graft.functions.Sentiment

/** The in-repo attention training loop (round-13 VERDICT task): fit
  * quality vs the hand-derived baseline, determinism, the
  * training-path/forward-path arithmetic equivalence the generated
  * oracle depends on, calibration, and the recorded negative result on
  * the Q/K alternation. */
class AttnTrainSpec extends SparkSpec {

  private lazy val (trainSet, holdout) = AttnTrain.splitDocs()
  private lazy val trained = AttnTrain.trainedModel

  test("trained probe beats the hand-derived baseline on HELD-OUT accuracy") {
    val baseAcc = AttnTrain.accuracy(AttnSentiment.defaultModel, holdout)
    val trainedAcc = AttnTrain.accuracy(trained, holdout)
    // measured 0.712 vs 0.740 on the current driver corpus; gate with
    // slack so a testdata regen shifts values without flaking, while
    // still requiring a real (>= 2pt) improvement
    assert(trainedAcc > baseAcc + 0.02,
      s"trained $trainedAcc must beat hand-derived $baseAcc by > 2pts")
    assert(trainedAcc >= 0.70, s"trained held-out accuracy $trainedAcc")
  }

  test("training is deterministic: re-train == re-train, and the Q/K half stays frozen") {
    val a = AttnTrain.train(AttnTrain.zeroProbe, trainSet)._1
    val b = AttnTrain.train(AttnTrain.zeroProbe, trainSet)._1
    assert(a.wv.flatten.toSeq == b.wv.flatten.toSeq)
    assert(a.bv.toSeq == b.bv.toSeq)
    assert(a.w2.flatten.toSeq == b.w2.flatten.toSeq)
    assert(a.b2.toSeq == b.b2.toSeq)
    // the probe trains ONLY the value path + head
    val base = AttnSentiment.defaultModel
    assert(a.wq.flatten.toSeq == base.wq.flatten.toSeq)
    assert(a.wk.flatten.toSeq == base.wk.flatten.toSeq)
    // and weights stay inside the int4 quantization range
    val all = a.wv.flatten ++ a.bv ++ a.w2.flatten ++ a.b2
    assert(all.forall(w => w >= -7L && w <= 7L))
  }

  test("training-path margin == forward-path margin (the oracle-bearing equivalence)") {
    // the trainer's precompute/margin fast path and the generic
    // fullMargin must reproduce AttnSentiment.forward bit-for-bit:
    // reconstruct forward's (label, conf) from the training-side margin
    val texts = trainSet.take(40).map(_._1).filter(_.trim.nonEmpty)
    val fwd = AttnSentiment.forward(trained, texts, AttnTrain.trainedConfDenom)
    texts.zip(fwd).foreach { case (t, (lbl, conf)) =>
      val p = AttnTrain.precompute(trained, t, 1).get
      val mFast = AttnTrain.margin(p, trained.wv, trained.bv, trained.w2, trained.b2)
      val mFull = AttnTrain.fullMargin(trained,
        AttnTrain.tokenMatrix(t, AttnSentiment.MaxLen).get)
      assert(mFast == mFull)
      assert((mFast >= 0L) == (lbl == "POSITIVE"))
      val n = p.wsum.length
      val expectConf = math.min(0.99, 0.5 + math.abs(mFast).toDouble /
        (AttnTrain.trainedConfDenom * math.sqrt(n.toDouble)))
      assert(conf == expectConf)
    }
  }

  test("calibration: median train doc at the F8 boundary, >= 2 classes downstream") {
    val cd = AttnTrain.trainedConfDenom
    assert(cd > 0.0)
    val texts = (trainSet ++ holdout).map(_._1).filter(_.trim.nonEmpty)
    val classes = AttnSentiment.forward(trained, texts, cd).map { case (l, c) =>
      if (c > Sentiment.ConfidenceThreshold) l else "NEUTRAL"
    }
    assert(classes.distinct.size >= 2,
      s"calibrated split collapsed to ${classes.distinct}")
    // the p50 convention: roughly half the corpus clears the threshold
    val confident = classes.count(_ != "NEUTRAL").toDouble / classes.size
    assert(confident > 0.3 && confident < 0.7, s"confident share $confident")
  }

  test("alternation negative result, pinned: the Q/K phase accepts zero moves from the probe optimum") {
    // trainAlternating(round=1) = train -> trainQK -> train; if the Q/K
    // phase is a no-op (the measured d=8 rank-limit result documented in
    // AttnTrain), the outcome must equal the plain probe exactly
    val alt = AttnTrain.trainAlternating(trainSet, altRounds = 1, qkSweeps = 1)
    assert(alt.wq.flatten.toSeq == trained.wq.flatten.toSeq) // untouched
    assert(alt.wk.flatten.toSeq == trained.wk.flatten.toSeq)
    assert(alt.wv.flatten.toSeq == trained.wv.flatten.toSeq)
    assert(alt.w2.flatten.toSeq == trained.w2.flatten.toSeq)
    assert(alt.b2.toSeq == trained.b2.toSeq)
  }
}
