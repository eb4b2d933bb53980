package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Analytics, AsOf, Risk}

/** Property-based invariants (SURVEY §5 strategy: normalization bounds &
  * degenerate case, threshold totality, trend-multiplier domain), driven
  * by ScalaCheck generators with fixed seeds (no scalatestplus bridge in
  * the offline dependency set — sampling is explicit). */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("A3 property: normalized scores in [0,1]; extremes map to 0/1; degenerate → 0.5") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    for (xs <- samples(gen, 10) :+ List(7.5, 7.5, 7.5)) {
      val s = spark
      import s.implicits._
      val df = xs.map(x => ("G", x)).toDF("sentiment", "original_score")
      val out = Analytics.normalizeScores(df).select("normalized_score")
        .collect().map(_.getDouble(0))
      assert(out.forall(v => v >= 0.0 && v <= 1.0), s"out of bounds for $xs")
      if (xs.distinct.size == 1) assert(out.forall(_ == 0.5))
      else { assert(out.contains(0.0)); assert(out.contains(1.0)) }
    }
  }

  test("as-of property: union-tag formulation == naive theta-join argmax") {
    import org.apache.spark.sql.functions._
    val evGen = for {
      key <- Gen.chooseNum(1L, 4L)
      t <- Gen.chooseNum(0L, 50L)
    } yield (key, t)
    val caseGen = for {
      ls <- Gen.nonEmptyListOf(evGen)
      rs <- Gen.listOf(evGen)
    } yield (ls, rs)
    val s = spark
    import s.implicits._
    for (((ls, rs), i) <- samples(caseGen, 8).zipWithIndex) {
      val left = ls.zipWithIndex.map { case ((k, t), j) => (j.toLong, k, t) }
        .toDF("event_id", "k", "t")
      val right = rs.toDF("k", "t")
      val viaWindow = AsOf.asOfJoin(left, right, "k", "t", col("t"), "asof_t")
        .collect().map(r => (r.getLong(0), Option(r.get(3)))).toMap
      // naive reference: theta join + per-left-row max of matching right times
      val naive = left.as("l").join(right.as("r"),
          col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
        .groupBy(col("l.event_id"))
        .agg(max(col("r.t")).as("asof_t"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(viaWindow == naive, s"case $i: $ls vs $rs")
    }
  }

  test("components property: distributed min-label propagation == driver union-find") {
    val s = spark
    import s.implicits._
    val pairGen = for {
      a <- Gen.chooseNum(0L, 19L)
      b <- Gen.chooseNum(0L, 19L)
      if a != b
    } yield (math.min(a, b), math.max(a, b))
    val caseGen = Gen.nonEmptyListOf(pairGen).map(_.distinct)
    for ((edges, i) <- samples(caseGen, 8).zipWithIndex) {
      val got = graft.operators.Dedup.canonicalComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: plain union-find on the driver
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      assert(got == want, s"case $i: $edges")
    }
  }

  test("incremental components property: update(labels(P1), P2) == components(P1 ∪ P2)") {
    val s = spark
    import s.implicits._
    val pairGen = for {
      a <- Gen.chooseNum(0L, 19L)
      b <- Gen.chooseNum(0L, 19L)
      if a != b
    } yield (math.min(a, b), math.max(a, b))
    val caseGen = for {
      p1 <- Gen.nonEmptyListOf(pairGen).map(_.distinct)
      p2 <- Gen.nonEmptyListOf(pairGen).map(_.distinct)
    } yield (p1, p2)
    for (((p1, p2), i) <- samples(caseGen, 6).zipWithIndex) {
      val labels = graft.operators.Dedup.canonicalComponents(p1.toDF("id_a", "id_b"))
      val got = graft.operators.Dedup
        .incrementalComponents(labels, p2.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = graft.operators.Dedup
        .canonicalComponents((p1 ++ p2).distinct.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"case $i: p1=$p1 p2=$p2")
      // the distributed relabel fallback (driverEdgeLimit = 0 forces it)
      // must agree with the driver union-find fast path bit-for-bit
      val gotDist = graft.operators.Dedup
        .incrementalComponents(labels, p2.toDF("id_a", "id_b"),
          driverEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist == want, s"distributed path diverged, case $i")
    }
  }

  test("passageDedup property: all-unique corpus is untouched; doubling a doc strikes its chunks") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // docs over DISJOINT token alphabets: no chunk can repeat, so the op
    // must reassemble every doc verbatim with n_removed = 0
    val docGen = Gen.chooseNum(5, 40)
    val lens = samples(docGen, 8)
    val docs = lens.zipWithIndex.map { case (len, i) =>
      (i.toLong, (0 until len).map(j => s"d${i}t$j").mkString(" "))
    }
    val out = graft.operators.Dedup
      .passageDedup(docs.toDF("doc_id", "text"), "text", "doc_id", width = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    docs.foreach { case (id, text) =>
      assert(out(id) == ((0L, text)), s"doc $id mutated by dedup")
    }
    // append an exact re-send of doc 0 under a later id: every one of its
    // chunks is already owned by doc 0, so the copy reassembles to ""
    val withCopy = (docs :+ (999L, docs.head._2)).toDF("doc_id", "text")
    val out2 = graft.operators.Dedup
      .passageDedup(withCopy, "text", "doc_id", width = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out2(999L)._2 == "")
    assert(out2(0L) == ((0L, docs.head._2)))
  }

  test("A11 property: trend multiplier always in its documented domain") {
    val dayGen = for {
      neg <- Gen.chooseNum(0L, 20L)
      other <- Gen.chooseNum(0L, 20L)
    } yield (neg, neg + other)
    val gen = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, dayGen))
    for (days <- samples(gen, 10)) {
      val s = spark
      import s.implicits._
      val trends = days.zipWithIndex.map { case ((neg, total), i) =>
        (f"2024-d$i%03d", total - neg, neg, 0L, total)
      }.toDF("date", "positive", "negative", "neutral", "total")
      val m = Risk.trendRisk(trends).collect()(0).getAs[Double]("trend_multiplier")
      assert(Set(0.9, 1.0, 1.2, 1.3, 1.4).contains(m), s"multiplier $m for $days")
    }
  }

  test("F8 property: any (pos, neg) hit combination yields exactly one class") {
    val gen = for {
      pos <- Gen.chooseNum(0, 30)
      neg <- Gen.chooseNum(0, 30)
    } yield (pos, neg)
    val s = spark
    import s.implicits._
    val rows = samples(gen, 20).zipWithIndex.map { case ((pos, neg), i) =>
      (i.toLong, (List.fill(pos)("fast") ++ List.fill(neg)("slow") ++ List("pad")).mkString(" "))
    }
    val out = graft.functions.Sentiment.score(rows.toDF("doc_id", "text")).collect()
    for (r <- out) {
      val sentiment = r.getAs[String]("sentiment")
      val conf = r.getAs[Double]("confidence")
      assert(Set("POSITIVE", "NEGATIVE", "NEUTRAL").contains(sentiment))
      assert(conf >= 0.5 && conf <= 0.99)
      if (sentiment != "NEUTRAL") assert(conf > 0.8)
    }
  }

  test("hashed seam scorer property: label/confidence domain on arbitrary text") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.const(""), Gen.const("  "), Gen.const("a b"),
      Gen.const("\ttab\nnewline ")))
    for (texts <- samples(gen, 8); if texts.nonEmpty) {
      val out = graft.functions.Sentiment.hashedBatchScorer(texts)
      assert(out.length == texts.length)
      out.foreach { case (label, conf) =>
        assert(label == "POSITIVE" || label == "NEGATIVE")
        assert(conf >= 0.5 && conf <= 0.99, s"confidence $conf out of domain")
      }
      // pure function: a second invocation is identical (memo is per-batch)
      assert(graft.functions.Sentiment.hashedBatchScorer(texts) == out)
    }
  }

  test("overlapF1 scorer property: [0,1] bounds, 1 iff token set == query set") {
    val terms = Seq("hash", "join", "vector")
    val scorer = graft.operators.TextAnalysis.overlapF1Scorer(terms)
    val word = Gen.oneOf("hash", "join", "vector", "alpha", "beta", "gamma")
    val gen = Gen.listOf(word).map(_.mkString(" "))
    for (texts <- samples(Gen.listOfN(20, gen), 5)) {
      val scores = scorer(texts)
      scores.zip(texts).foreach { case (s0, t) =>
        assert(s0 >= 0.0 && s0 <= 1.0, s"score $s0 for '$t'")
        val distinct = t.split("\\s+").filter(_.nonEmpty).distinct.toSet
        if (distinct == terms.toSet) assert(s0 == 1.0)
        if (distinct.intersect(terms.toSet).isEmpty) assert(s0 == 0.0)
      }
    }
  }

  test("spanScrub property: token conservation, keeper survival, naive-reference parity") {
    val s = spark
    import s.implicits._
    // random corpora over a 4-token alphabet: dense duplicated 2-grams
    val docGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))
      .map(_.take(12).mkString(" "))
    val corpusGen = Gen.listOfN(6, docGen)
    for ((docs, ci) <- samples(corpusGen, 6).zipWithIndex) {
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = operators.Dedup.spanScrub(df, "text", "doc_id", width = 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      // naive reference: enumerate grams on the driver, elect keepers,
      // union covered positions, rebuild
      val toks = docs.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
      val occ = toks.toSeq.flatMap { case (id, ts) =>
        ts.sliding(2).zipWithIndex.collect {
          case (g, p) if g.length == 2 => (g.mkString(" "), id, p) } }
      val dupGrams = occ.groupBy(_._1).filter(_._2.size >= 2)
      val struck: Map[Long, Set[Int]] = dupGrams.values.toSeq
        .flatMap { os =>
          val keeper = os.minBy(o => (o._2, o._3))
          os.filterNot(_ == keeper).flatMap(o => Seq((o._2, o._3), (o._2, o._3 + 1)))
        }.groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
      for ((id, ts) <- toks) {
        val cuts = struck.getOrElse(id, Set.empty)
        val want = ts.zipWithIndex.collect { case (t, p) if !cuts(p) => t }.mkString(" ")
        val (n, rm, clean) = out(id)
        assert(n == ts.length, s"case $ci doc $id token count")
        assert(rm == cuts.size, s"case $ci doc $id removed")
        assert(clean == want, s"case $ci doc $id text")
      }
    }
  }

  test("shardPlanBy property: exactly-once placement, valid shards, deterministic") {
    val s = spark
    import s.implicits._
    val lensGen = Gen.nonEmptyListOf(Gen.chooseNum(1L, 500L)).map(_.take(40))
    for (lens <- samples(lensGen, 6)) {
      val df = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("id", "n")
      val plan = operators.TextAnalysis.shardPlanBy(df, "n", "id", nShards = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(plan.map(_._1).toSet == lens.indices.map(_.toLong).toSet)
      assert(plan.forall(p => p._3 >= 0 && p._3 < 4))
      val again = operators.TextAnalysis.shardPlanBy(df, "n", "id", nShards = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(plan.toSeq == again.toSeq)
    }
  }

  test("winMatrix/bradleyTerry property: duel conservation, strengths simplex-normalized, label-permutation equivariant") {
    val s = spark
    import s.implicits._
    // random duel logs: 2 rows per duel over a small item alphabet
    val duelGen = for {
      n <- Gen.chooseNum(3, 12)
      items <- Gen.listOfN(2 * n, Gen.oneOf("A", "B", "C", "D"))
      scores <- Gen.listOfN(2 * n, Gen.chooseNum(0, 100))
    } yield (0 until 2 * n).map(k =>
      ((k / 2).toLong, items(k), scores(k).toDouble, k.toLong))
    for (rows <- samples(duelGen, 5)) {
      val df = rows.toDF("duel", "item", "score", "id")
      val m = operators.MLEval.pairwiseWinMatrix(df, "duel", "item", "score", "id")
      val mc = m.collect()
      // duel conservation: matrix duels == non-self duels in the log
      val nonSelf = rows.grouped(2).count { case Seq(a, b) => a._2 != b._2 }
      assert(mc.map(_.getAs[Long]("n_duels")).sum == nonSelf)
      assert(mc.forall { r =>
        r.getAs[Long]("wins_a") + r.getAs[Long]("wins_b") == r.getAs[Long]("n_duels")
      })
      if (mc.nonEmpty) {
        val bt = operators.MLEval.bradleyTerry(m, iters = 8).collect()
          .map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
        assert(bt.values.forall(v => v >= 0.0 && v <= 1.0))
        assert(math.abs(bt.values.sum - 1.0) < 1e-4, bt.toString)
        // label-permutation equivariance: renaming items permutes strengths
        val perm = Map("A" -> "X", "B" -> "Y", "C" -> "Z", "D" -> "W")
        val df2 = rows.map { case (d, i, sc, id) => (d, perm(i), sc, id) }
          .toDF("duel", "item", "score", "id")
        val bt2 = operators.MLEval.bradleyTerry(
            operators.MLEval.pairwiseWinMatrix(df2, "duel", "item", "score", "id"),
            iters = 8).collect()
          .map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
        assert(bt.map { case (k, v) => perm(k) -> v } == bt2)
      }
    }
  }

  test("tCloseness property: tvd in [0,1]; a class mirroring the global distribution scores 0") {
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.chooseNum(5, 40)
      cls <- Gen.listOfN(n, Gen.oneOf("P", "Q", "R"))
      sens <- Gen.listOfN(n, Gen.oneOf("u", "v", "w"))
    } yield cls.zip(sens)
    for (rows <- samples(gen, 6)) {
      val df = rows.toDF("cls", "sens")
      val out = operators.DataQuality.tCloseness(df,
        Seq("cls" -> org.apache.spark.sql.functions.col("cls")),
        org.apache.spark.sql.functions.col("sens"), t = 0.3).collect()
      assert(out.forall { r =>
        val tvd = r.getAs[Double]("tvd"); tvd >= 0.0 && tvd <= 1.0
      })
      // a single-class frame IS the global distribution: tvd exactly 0
      val one = rows.map { case (_, v) => ("only", v) }.toDF("cls", "sens")
      val o1 = operators.DataQuality.tCloseness(one,
        Seq("cls" -> org.apache.spark.sql.functions.col("cls")),
        org.apache.spark.sql.functions.col("sens"), t = 0.3).collect()
      assert(o1.length == 1 && o1.head.getAs[Double]("tvd") == 0.0)
    }
  }

  test("dpoPairs property: margin filter total, chosen reward >= rejected + margin bound") {
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.chooseNum(4, 30)
      prompts <- Gen.listOfN(n, Gen.chooseNum(0L, 5L))
      rewards <- Gen.listOfN(n, Gen.chooseNum(0, 20))
    } yield prompts.zip(rewards).zipWithIndex.map { case ((p, r), i) =>
      (p, i.toLong, r.toDouble / 10.0) }
    for (rows <- samples(gen, 6)) {
      val df = rows.toDF("prompt_id", "resp_id", "reward")
      val out = operators.TrainingPipeline.dpoPairs(
        df, "prompt_id", "resp_id", "reward", minMargin = 0.5).collect()
      assert(out.forall { r =>
        val m = r.getAs[Double]("chosen_reward") - r.getAs[Double]("rejected_reward")
        m >= 0.5 && r.getAs[Double]("margin") == math.round(m * 1e6) / 1e6 &&
          r.getAs[Long]("n_candidates") >= 2
      })
      // exactly the prompts whose (max - min) reward clears the margin
      val want = rows.groupBy(_._1).count { case (_, g) =>
        g.map(_._3).max - g.map(_._3).min >= 0.5 }
      assert(out.length == want)
    }
  }

  test("fertilityByLang property: fertility >= 1, token mass >= word mass, chars reconcile") {
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.chooseNum(2, 10)
      langs <- Gen.listOfN(n, Gen.oneOf("en", "de"))
      texts <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.identifier.map(_.take(6)))
        .map(_.take(8).mkString(" ")))
    } yield langs.zip(texts)
    for (rows <- samples(gen, 5)) {
      val df = rows.toDF("lang", "text")
      val out = operators.Tokenizer.fertilityByLang(df,
        operators.Tokenizer.PinnedMerges).collect()
      for (r <- out) {
        val (w, t, c) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_chars"))
        assert(t >= w) // every word is at least one subword (</w> merges in)
        assert(r.getAs[Double]("fertility") >= 1.0)
        // chars reconcile exactly with the raw per-lang word-char mass
        val wantChars = rows.filter(_._1 == r.getString(0))
          .flatMap(_._2.split("\\s+")).filter(_.nonEmpty).map(_.length.toLong).sum
        assert(c == wantChars)
      }
    }
  }

  test("tokenDropout property: kept text is an in-order subsequence, counts reconcile") {
    val s = spark
    import s.implicits._
    val docGen = Gen.nonEmptyListOf(Gen.identifier.map(_.take(5))).map(_.take(15))
    for ((ws, i) <- samples(docGen, 5).zipWithIndex; p <- Seq(0.2, 0.6)) {
      val text = ws.mkString(" ")
      val df = Seq((i.toLong, text)).toDF("doc_id", "text")
      for (portable <- Seq(true, false)) {
        val r = operators.TextAnalysis.tokenDropout(df, "text", "doc_id", p,
          portable = portable).collect().head
        val kept = r.getAs[String]("aug_text").split(" ").filter(_.nonEmpty)
        val orig = text.split("\\s+").filter(_.nonEmpty)
        assert(r.getAs[Long]("n_tokens") == orig.length)
        assert(r.getAs[Long]("n_dropped") == orig.length - kept.length)
        // in-order subsequence check
        var j = 0
        for (t <- orig) if (j < kept.length && kept(j) == t) j += 1
        assert(j == kept.length, s"not a subsequence: $text -> ${kept.mkString(" ")}")
      }
    }
  }

  test("RiffWav property: encode/decode round-trips arbitrary int16 signals; decode never throws on junk") {
    import graft.operators.RiffWav
    val sigGen = for {
      n <- Gen.chooseNum(1, 400)
      rate <- Gen.oneOf(8000, 16000, 44100)
      xs <- Gen.listOfN(n, Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (rate, xs)
    for ((rate, xs) <- samples(sigGen, 25)) {
      val pcm = new Array[Byte](xs.length * 2)
      xs.indices.foreach { i =>
        pcm(2 * i) = (xs(i) & 0xff).toByte
        pcm(2 * i + 1) = ((xs(i) >> 8) & 0xff).toByte
      }
      val Some((fmt, back)) = RiffWav.decodeInt16Mono(RiffWav.encode(pcm, rate))
      assert(fmt == RiffWav.Format(rate, 16, 1))
      assert(back.toSeq == xs, s"round-trip mismatch at rate $rate n=${xs.length}")
    }
    // never-throw on arbitrary junk bytes (the error-row contract)
    val junkGen = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue.toInt, Byte.MaxValue.toInt)))
    for (bs <- samples(junkGen, 50)) {
      val arr = bs.map(_.toByte).toArray
      RiffWav.decode(arr) // must not throw; result may be Some only for real WAVs
    }
    // ...including junk that starts with the RIFF/WAVE magic but lies
    val liar = "RIFF".getBytes ++ Array[Byte](64, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ Array[Byte](16, 0, 0, 0) ++ Array.fill[Byte](10)(1)
    assert(RiffWav.decode(liar).isEmpty)
  }
}
