package graft

/** Scratch probe: can trainable per-token embedding DELTAS (over the
  * frozen hash embeddings) beat the 0.740 frozen-backbone ceiling? */
object EmbDeltaProbeMain {
  def main(args: Array[String]): Unit = {
    import graft.ml.{AttnSentiment, AttnTrain}
    val (tr, ho) = AttnTrain.splitDocs()
    val d = AttnSentiment.D
    // base model = the shipped trained probe (value/head fitted)
    var m = AttnTrain.trainedModel
    println(f"start: tr=${AttnTrain.accuracy(m, tr)}%.4f ho=${AttnTrain.accuracy(m, ho)}%.4f")

    // vocabulary: distinct train-set tokens by descending frequency, cap 40
    val freq = tr.flatMap(_._1.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(40).map(_._1).toArray
    println(s"vocab: ${freq.length} tokens")
    val delta = scala.collection.mutable.HashMap.empty[(String, Int), Long]

    // doc token lists (truncated) + labels
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).take(AttnSentiment.MaxLen)
    val docs = tr.filter(_._1.trim.nonEmpty).map { case (t, y) => (toks(t), y) }.toArray

    def xOf(ts: Array[String]): Array[Array[Long]] = {
      val base = AttnTrain.tokenMatrix(ts.mkString(" "), AttnSentiment.MaxLen).get
      Array.tabulate(ts.length, d)((i, k) => base(i)(k) + delta.getOrElse((ts(i), k), 0L))
    }
    def loss(): Long = {
      var acc = 0L
      for ((ts, y) <- docs) {
        val mg = AttnTrain.fullMargin(m, xOf(ts))
        if ((mg >= 0L) != (y > 0)) acc += 100000000000000L
        val ym = y.toLong * mg
        if (ym < 20000000L) acc += 20000000L - ym
      }
      acc
    }
    // coordinate climb over (token, dim) deltas in [-7, 7]
    val t0 = System.nanoTime()
    var best = loss()
    var improved = true; var sweeps = 0
    while (improved && sweeps < 4) {
      improved = false; sweeps += 1
      for (tok <- freq; k <- 0 until d) {
        val cur = delta.getOrElse((tok, k), 0L)
        var bestVal = cur
        for (dl <- Seq(3L, -3L, 1L, -1L)) {
          val cand = math.max(-7L, math.min(7L, cur + dl))
          if (cand != cur && cand != bestVal) {
            delta((tok, k)) = cand
            val l = loss()
            if (l < best) { best = l; bestVal = cand; improved = true }
          }
        }
        delta((tok, k)) = bestVal
      }
      // re-fit the head against the new embeddings between sweeps:
      // emulate by evaluating accuracy only (head refit needs Precomp path)
      println(f"sweep $sweeps: loss=$best time=${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    // holdout accuracy with deltas
    def acc(set: Seq[(String, Int)]): Double = {
      val ne = set.filter(_._1.trim.nonEmpty)
      val hits = ne.count { case (t, y) =>
        (AttnTrain.fullMargin(m, xOf(toks(t))) >= 0L) == (y > 0) }
      hits.toDouble / ne.size
    }
    println(f"with deltas: tr=${acc(tr)}%.4f ho=${acc(ho)}%.4f nonzero=${delta.count(_._2 != 0L)}")
  }
}
