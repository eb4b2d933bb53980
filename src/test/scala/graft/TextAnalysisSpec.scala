package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("language ID: function-word argmax with und fallback") {
    assert(evalText("the cat and the dog is here")(TextAnalysis.languageId(col("text"))) == "en")
    assert(evalText("el perro es una maravilla y los gatos")(TextAnalysis.languageId(col("text"))) == "es")
    assert(evalText("der Hund und die Katze ist da")(TextAnalysis.languageId(col("text"))) == "de")
    assert(evalText("xyzzy plugh frobnicate")(TextAnalysis.languageId(col("text"))) == "und")
  }

  test("quality score stays in [0,1] and rewards longer clean text") {
    val short = evalText("hi")(TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    val long = evalText(("the word " * 40).trim)(TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    assert(short >= 0.0 && short <= 1.0 && long >= 0.0 && long <= 1.0)
    assert(long > short)
  }

  test("token counts: whitespace vs BPE-ish segmentation") {
    assert(evalText("ab cd-ef 12")(TextAnalysis.whitespaceTokenCount(col("text"))) == 3L)
    // [ab][cd][-][ef][12] → 5
    assert(evalText("ab cd-ef 12")(TextAnalysis.bpeishTokenCount(col("text")).cast("long")) == 5L)
  }

  test("fingerprint: deterministic, order-sensitive, bounded") {
    val a = evalText("alpha beta gamma")(TextAnalysis.fingerprint(col("text"))).asInstanceOf[Long]
    val b = evalText("alpha beta gamma")(TextAnalysis.fingerprint(col("text"))).asInstanceOf[Long]
    val c = evalText("gamma beta alpha")(TextAnalysis.fingerprint(col("text"))).asInstanceOf[Long]
    assert(a == b)
    assert(a != c)
    assert(a >= 0 && a < 1000000007L)
  }

  test("chunking: overlap windows cover every token; short docs survive whole") {
    val s = spark
    import s.implicits._
    val doc = (1 to 25).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkTokens(df, "text", "doc_id", chunkSize = 10, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // stride 6: chunks start at tokens 1, 7, 13, 19
    assert(doc1.length == 4)
    assert(doc1.head.startsWith("t1 ") && doc1(1).startsWith("t7 "))
    // every token appears in some chunk
    val covered = doc1.flatMap(_.split(" ")).toSet
    assert((1 to 25).forall(i => covered.contains(s"t$i")))
    // consecutive chunks share the 4-token overlap
    assert(doc1.head.split(" ").takeRight(4).toSeq == doc1(1).split(" ").take(4).toSeq)
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b c")))
  }

  test("redact: emails, urls, digit runs replaced; order-of-application safe") {
    val out = evalText("mail a.b+c@x-y.co visit https://a.b/c?d=1234567 ref 123456789 ok 12345")(
      TextAnalysis.redact(col("text"))).asInstanceOf[String]
    assert(out == "mail <EMAIL> visit <URL> ref <NUM> ok 12345", out)
  }

  test("dataset split: deterministic, total, roughly 80/10/10") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).toDF("doc_id")
    val counts = df.groupBy(TextAnalysis.datasetSplit(col("doc_id")).as("split"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000L)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 150)
    assert(counts("test") > 50 && counts("test") < 150)
  }

  test("hash stratified sample: per-stratum fractions, deterministic, subset-stable") {
    val s = spark
    import s.implicits._
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val sampled = TextAnalysis.hashStratifiedSample(
      df, "doc_id", "lang", Map("en" -> 0.1), defaultFraction = 0.6)
    val counts = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") > 50 && counts("en") < 150, counts.toString)   // ~100 of 1000
    assert(counts("de") > 1050 && counts("de") < 1350, counts.toString) // ~1200 of 2000
    // deterministic: identical row set on re-evaluation
    val ids1 = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = TextAnalysis.hashStratifiedSample(
      df, "doc_id", "lang", Map("en" -> 0.1), defaultFraction = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // monotone: lowering a fraction yields a SUBSET (hash thresholding,
    // not an independent redraw) — the property that makes sample sizes
    // tunable without churning the corpus between pipeline runs
    val smaller = TextAnalysis.hashStratifiedSample(
      df, "doc_id", "lang", Map("en" -> 0.1), defaultFraction = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(ids1))
  }

  test("repetitionProfile: hand-computed repetition fractions") {
    val s = spark
    import s.implicits._
    // doc 1: "a b c a b c a b" -> 8 tokens (5 distinct? a,b,c -> 3), 6 trigrams:
    //   "a b c" x2, "b c a" x2, "c a b" x2 -> total 6, distinct 3, top 2
    // doc 2: all-distinct tokens -> no repetition
    // doc 3: one token -> no trigrams, fractions 0
    val df = Seq(
      (1L, "a b c a b c a b"),
      (2L, "one two three four"),
      (3L, "x")).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionProfile(df, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows(1L) == ((8L, 6L, 0.5, 2.0 / 6.0, 1.0 - 3.0 / 8.0)))
    assert(rows(2L) == ((4L, 2L, 0.0, 0.5, 0.0)))
    assert(rows(3L) == ((1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("packSequences: contiguous-stream packing within buckets") {
    val s = spark
    import s.implicits._
    // one bucket (buckets=1), budget 5; docs of 3,3,4 tokens ->
    // starts 0,3,6 -> seqs 0,0,1; offsets 0,3,1
    val df = Seq(
      (1L, "a b c"), (2L, "d e f"), (3L, "g h i j")).toDF("doc_id", "text")
    val rows = TextAnalysis.packSequences(df, "text", "doc_id", budget = 5, buckets = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq((1L, 3L, 0L, 0L, 0L), (2L, 3L, 0L, 0L, 3L), (3L, 4L, 0L, 1L, 1L)))
    // bucket independence: same docs, 2 buckets -> doc 1,3 pack together
    val rows2 = TextAnalysis.packSequences(df, "text", "doc_id", budget = 5, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(rows2 == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 3L)))
  }

  test("winnowFingerprints: single-window min, short-doc empty, pinned hash") {
    val s = spark
    import s.implicits._
    // doc 1: 6 tokens -> 4 trigrams -> exactly one window-4 -> 1 fp = the
    // min of the four 60-bit md5-prefix hashes (pinned here in JVM md5,
    // the same contract the DuckDB oracle replays); doc 2: 3 trigrams < 4
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e")).toDF("doc_id", "text")
    def h(g: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      java.lang.Long.parseLong(dig.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val expected = Seq("a b c", "b c d", "c d e", "d e f").map(h).min
    val rows = TextAnalysis.winnowFingerprints(df, "text", "doc_id", n = 3, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, expected)))
  }

  test("winnowFingerprints: spans >= window+n-1 tokens share a fingerprint") {
    val s = spark
    import s.implicits._
    // a 6-token span (= window+n-1) yields one full shared gram window in
    // both docs, whose min both sides must select — the MOSS guarantee
    val df = Seq(
      (1L, "x1 x2 s1 s2 s3 s4 s5 s6 x3"),
      (2L, "y1 s1 s2 s3 s4 s5 s6 y2 y3 y4")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, "text", "doc_id", n = 3, window = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty)
  }

  test("unigramLogPerplexity: hand-computed bits/token, empty doc absent") {
    val s = spark
    import s.implicits._
    // corpus counts: a=2, b=2, c=1, N=5 -> p(a)=p(b)=0.4, p(c)=0.2
    // doc 1 ("a a b"): mean -log2(0.4)            = 1.321928
    // doc 2 ("b c"):   (-log2(0.4)-log2(0.2)) / 2 = 1.821928
    val df = Seq((1L, "a a b"), (2L, "b c"), (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogPerplexity(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - 1.321928) < 1e-6)
    assert(out(2L)._1 == 2L && math.abs(out(2L)._2 - 1.821928) < 1e-6)
  }

  test("topCollocations: hand-computed PMI over a tiny corpus") {
    val s = spark
    import s.implicits._
    // "x y x y z": unigrams x=2 y=2 z=1 (N=5); bigrams "x y"x2 "y x" "y z"
    // (N=4). minCount 2 keeps only "x y":
    //   pmi = log2((2/4) / ((2/5)*(2/5))) = log2(3.125) = 1.643856
    val df = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.topCollocations(df, "text", minCount = 2, k = 10).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "x y" && r.getLong(1) == 2L &&
      r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(math.abs(r.getDouble(4) - 1.643856) < 1e-6)
  }

  test("gopherGate: each rule flags its own violation") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat sat mat"),   // passes every rule
      (2L, "a b"),               // too short, mean wl 1.0, no stopwords
      (3L, "the the the the"),   // dup_token_frac 0.75 -> repetition fails
      (4L, "see ### now ...")    // symbol ratio 1.0 -> symbols fail
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherGate(df, "text", "doc_id",
        minWords = 3, maxWords = 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[Double]("mean_word_len") == 3.0)
    assert(!out(2L).getAs[Boolean]("ok_words") &&
      !out(2L).getAs[Boolean]("ok_mean_word_len") &&
      !out(2L).getAs[Boolean]("ok_stopwords"))
    assert(!out(3L).getAs[Boolean]("ok_repetition") &&
      out(3L).getAs[Double]("dup_token_frac") == 0.75)
    assert(!out(4L).getAs[Boolean]("ok_symbols") &&
      out(4L).getAs[Double]("symbol_ratio") == 1.0)
    assert(Seq(2L, 3L, 4L).forall(i => !out(i).getAs[Boolean]("keep")))
  }

  test("tokenBudgetMixture: shares and repeat factors, unlisted domain -> 0") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c", "d1"), (2L, "a b c d e", "d1"), (3L, "x y", "d2"))
      .toDF("doc_id", "text", "source")
    // d1: 2 docs / 8 tokens, d2: 1 doc / 2 tokens, total 10
    val out = TextAnalysis.tokenBudgetMixture(df, "text", "source",
        Map("d1" -> 0.3, "d2" -> 0.7))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out("d1") == ((2L, 8L, 0.8, 0.3, 0.3 * 10.0 / 8.0)))
    assert(out("d2") == ((1L, 2L, 0.2, 0.7, 0.7 * 10.0 / 2.0)))
    val none = TextAnalysis.tokenBudgetMixture(df, "text", "source", Map("d1" -> 1.0))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(none("d2") == 0.0)
  }

  test("epochPlan: cap binds exactly when want exceeds avail, shortfall reconciles") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c", "d1"), (2L, "a b c d e", "d1"), (3L, "x y", "d2"))
      .toDF("doc_id", "text", "source")
    // d1: 8 tokens, d2: 2 tokens, total 10; budget = 2x = 20, cap 3 epochs
    val out = TextAnalysis.epochPlan(df, "text", "source",
        Map("d1" -> 0.5, "d2" -> 0.5), budgetMultiple = 2.0, maxEpochs = 3.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6),
          r.getDouble(7)))).toMap
    // d1 wants 10, avail 24 -> uncapped, 1.25 epochs, no shortfall
    assert(out("d1") == ((10.0, 10.0, 1.25, false, 0.0)))
    // d2 wants 10, avail 6 -> capped at 3 epochs, shortfall 4
    assert(out("d2") == ((10.0, 6.0, 3.0, true, 4.0)))
  }

  test("temperatureMixture: alpha<1 upsamples the small domain, weights sum to 1") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c d e f g h", "d1"), (2L, "x y", "d2"))
      .toDF("doc_id", "text", "source")
    // p = (0.8, 0.2); alpha=0.5 -> pa = (sqrt(.8), sqrt(.2)), mirrored below
    val out = TextAnalysis.temperatureMixture(df, "text", "source", alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = math.pow(0.8, 0.5) + math.pow(0.2, 0.5)
    assert(out("d1") == ((0.8, r6(math.pow(0.8, 0.5) / z), r6(math.pow(0.8, 0.5) / z / 0.8))))
    assert(out("d2") == ((0.2, r6(math.pow(0.2, 0.5) / z), r6(math.pow(0.2, 0.5) / z / 0.2))))
    assert(out("d1")._3 < 1.0 && out("d2")._3 > 1.0) // flattening direction
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("hashedEmbedding: deterministic, dims independent, values bounded") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.hashedEmbedding(
        graft.functions.TextFns.tokens(col("text")), dims = 8, buckets = 256).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1) == out(2))            // same text -> same vector
    assert(out(1) != out(3))            // different text -> different vector
    assert(out(1).length == 8)
    assert(out.values.flatten.forall(x => x >= -1.0 && x <= 1.0))
    assert(out(1).distinct.length > 1)  // per-dim keys actually vary
  }

  test("chunkDocuments: overlap shared between windows, short tail kept, empty doc dropped") {
    val s = spark
    import s.implicits._
    // 10 tokens, chunk 4, overlap 2 -> starts 0,2,4,6,8: windows of 4
    // sharing 2, the last two short (t9 t10 / t9 t10... no: start 8 -> t9 t10)
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "text", "doc_id",
      chunkTokens = 4, overlapTokens = 2).collect()
    assert(out.forall(_.getLong(0) == 1L)) // empty doc emits nothing
    val chunks = out.map(r => r.getInt(1) -> r.getString(3)).toMap
    assert(chunks(0) == "t1 t2 t3 t4")
    assert(chunks(1) == "t3 t4 t5 t6") // 2-token overlap with chunk 0
    assert(chunks(4) == "t9 t10")      // short tail kept
    assert(out.map(_.getLong(2)).sum == 4 + 4 + 4 + 4 + 2)
  }

  test("bm25ExpandedTopK: expansion recovers a vocabulary-mismatch doc plain BM25 misses") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "anchor rope harbor anchor"), // feedback doc for 'anchor'
      (2L, "rope harbor dock mooring"),  // relevant but never says 'anchor'
      (3L, "compiler register opcode"))  // unrelated
      .toDF("doc_id", "text")
    val plain = TextAnalysis.bm25TopK(df, "text", "doc_id", Seq("anchor"), k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(plain == Set(1L)) // vocabulary mismatch: doc 2 invisible
    val expanded = TextAnalysis.bm25ExpandedTopK(df, "text", "doc_id",
      Seq("anchor"), fbDocs = 1, expand = 2, k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(expanded.contains(2L), expanded.toString) // recovered via rope/harbor
    assert(!expanded.contains(3L))
  }

  test("bm25TopK: mirrored arithmetic on a tiny corpus, non-matching doc absent") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "hash join hash"), (2L, "join the table"), (3L, "the the the"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(df, "text", "doc_id", Seq("hash", "join"), k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // mirror: N=3, dl=3 for all, avgdl=3; nt(hash)=1, nt(join)=2
    def idf(nt: Int) = math.log((3.0 - nt + 0.5) / (nt + 0.5) + 1.0)
    def term(tf: Double, nt: Int) =
      idf(nt) * tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * 3.0 / 3.0))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(1L, 2L)) // doc 3 matches nothing
    assert(out(1L) == ((2L, r6(term(2.0, 1) + term(1.0, 2)))))
    assert(out(2L) == ((1L, r6(term(1.0, 2)))))
    assert(out(1L)._2 > out(2L)._2) // two matched terms outrank one
  }

  test("tfidfKeywords: rare term ranks first, term-string tiebreak") {
    val s = spark
    import s.implicits._
    // "rare" appears in 1 of 3 docs; "common" in all 3. In doc 1 both have
    // tf=1/dl -> idf decides; ties inside doc 3 break on the term string.
    val df = Seq((1L, "rare common"), (2L, "common common"), (3L, "b a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(df, "text", "doc_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(out((1L, 1)) == "rare" && out((1L, 2)) == "common")
    // doc 3: "a" and "b" have identical tf/df -> lexicographic order
    assert(out((3L, 1)) == "a" && out((3L, 2)) == "b")
  }

  test("domainCap: caps each domain at k, keeps the k smallest md5 keys") {
    val s = spark
    import s.implicits._
    val df = (1L to 9L).map(i => (i, if (i <= 6) "d1" else "d2"))
      .toDF("doc_id", "source")
    val out = TextAnalysis.domainCap(df, "doc_id", "source", k = 2).collect()
    assert(out.length == 4) // 2 kept per domain
    def hk(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    // per domain: survivors are exactly the 2 smallest md5-derived keys,
    // in ascending key order (the deterministic-sample contract)
    for ((dom, ids) <- Seq("d1" -> (1L to 6L), "d2" -> (7L to 9L))) {
      val expect = ids.sortBy(hk).take(2)
      val got = out.filter(_.getString(0) == dom).sortBy(_.getInt(2))
        .map(_.getLong(1)).toSeq
      assert(got == expect, s"$dom: got $got expected $expect")
    }
  }

  test("dsirImportance: target-only vocabulary scores above raw-only vocabulary") {
    val s = spark
    import s.implicits._
    // target docs speak "alpha beta", raw-only docs speak "gamma delta";
    // a candidate written in target language must outweigh one in raw slang
    val df = Seq(
      (1L, "alpha beta alpha beta", true), (2L, "beta alpha beta alpha", true),
      (3L, "gamma delta gamma delta", false), (4L, "delta gamma delta gamma", false),
      (5L, "alpha beta alpha beta", false), // candidate in target language
      (6L, "gamma delta gamma delta", false)) // candidate in raw-only language
      .toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.dsirImportance(df, "text", "doc_id", col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == (1L to 6L).toSet)
    assert(out(5L)._1 == 7L) // 4 unigrams + 3 bigrams
    assert(out(5L)._2 > out(6L)._2, s"target-like doc must score higher: $out")
    // raw-only vocabulary is strictly less likely under the target LM; the
    // target-like doc's ABSOLUTE sign depends on the smoothing mass (B >>
    // counts here), so only the raw-only side has a guaranteed sign
    assert(out(6L)._2 < 0)
  }

  test("dsirImportance: identical texts get identical weights regardless of side") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "same words here", true), (2L, "same words here", false))
      .toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.dsirImportance(df, "text", "doc_id", col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) == out(2L)) // weight depends on content, not membership
  }

  test("bigramLogPerplexity: mirrored JM arithmetic; single-token doc absent") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogPerplexity(df, "text", "doc_id", lambda = 0.7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // corpus: cb(a b)=3, cb(b a)=1, cb(b c)=1; cw: a=3 b=3 c=1 x=1, N=8
    def bits(p: Double) = -math.log(p) / math.log(2.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = 0.7 * 3 / 3 + 0.3 * 3 / 8
    val pBA = 0.7 * 1 / 3 + 0.3 * 3 / 8
    val pBC = 0.7 * 1 / 3 + 0.3 * 1 / 8
    assert(out.keySet == Set(1L, 2L)) // "x" has no bigram positions
    assert(out(1L) == ((3L, r6((bits(pAB) + bits(pBA) + bits(pAB)) / 3))))
    assert(out(2L) == ((2L, r6((bits(pAB) + bits(pBC)) / 2))))
    // the doc built from the corpus' dominant bigram is less surprising
    assert(out(1L)._2 < out(2L)._2)
  }

  test("percentileQualityGate: per-group median keeps the upper half") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "zz", "g1"), // low: no stopwords, tiny
      (2L, "the cat is in the hat and it is fine today okay yes", "g1"),
      (3L, "the quick brown fox jumps over the lazy dog and it is a very fine day in the park with many happy people walking around enjoying all of it together now", "g1"),
      (4L, "qq ww", "g2"),
      (5L, "the dog is in a house and it is warm in there", "g2"),
      (6L, "the sun is up and the sky is blue and it is time to go out and see all of the town before it gets dark again tonight my friend", "g2"))
      .toDF("doc_id", "text", "lang")
    val scores = df.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = TextAnalysis.percentileQualityGate(df, "text", "doc_id", "lang", p = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 3 docs per group -> quantile_cont(0.5) is the middle score; the
    // middle and top docs survive, the bottom is cut
    assert(out.map(_._1).toSet == Set(2L, 3L, 5L, 6L))
    for ((id, g, q, thr) <- out) {
      assert(q == scores(id))
      assert(thr == r6(scores(if (g == "g1") 2L else 5L)), s"group $g threshold")
      assert(r6(q) >= thr) // the operator's own (rounded-both-sides) boundary
    }
  }

  test("zipfFit: mirrors a driver-side least-squares fit on a tiny corpus") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(df, "text").collect()(0)
    // freq: a=5 b=3 c=1 d=1 -> ranks 1,2,3,4 (freq desc, token asc)
    val pts = Seq((1.0, 5.0), (2.0, 3.0), (3.0, 1.0), (4.0, 1.0))
      .map { case (rk, c) => (math.log(rk), math.log(c)) }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sx2 = pts.map(p => p._1 * p._1).sum
    val sy2 = pts.map(p => p._2 * p._2).sum
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    assert(r.getAs[Long]("vocab_size") == 4L)
    assert(r.getAs[Long]("total_tokens") == 10L)
    assert(r.getAs[Double]("slope") == r6(slope))
    assert(r.getAs[Double]("intercept") == r6((sy - slope * sx) / n))
    assert(r.getAs[Double]("r2") == r6(
      (n * sxy - sx * sy) * (n * sxy - sx * sy) /
        ((n * sx2 - sx * sx) * (n * sy2 - sy * sy))))
    assert(r.getAs[Double]("slope") < 0.0) // frequency falls with rank
  }

  test("lengthOutliers: Tukey fences per group, only the extreme doc flagged") {
    val s = spark
    import s.implicits._
    // g1 lengths: 4,5,6,7,100 -> q1=5 q3=7 IQR=2 fences [2, 10] -> only
    // the 100-token doc is an outlier; g2 uniform -> none
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val df = Seq(
      (1L, words(4), "g1"), (2L, words(5), "g1"), (3L, words(6), "g1"),
      (4L, words(7), "g1"), (5L, words(100), "g1"),
      (6L, words(10), "g2"), (7L, words(10), "g2"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.lengthOutliers(df, "text", "doc_id", "lang")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out(5L)._4 && out.filter(_._1 != 5L).values.forall(!_._4))
    assert(out(1L)._2 == 2.0 && out(1L)._3 == 10.0) // exact fences
    assert(out(6L)._2 == 10.0 && out(6L)._3 == 10.0) // zero-IQR group
  }

  test("dsirResample: deterministic Gumbel-top-k, key mirrors the md5 uniform") {
    val s = spark
    import s.implicits._
    val df = (1L to 20L).map(i =>
      (i, if (i <= 5) "alpha beta gamma" else "delta epsilon zeta", i <= 5))
      .toDF("doc_id", "text", "tgt")
    val run1 = TextAnalysis.dsirResample(df, "text", "doc_id", col("tgt"), buckets = 64, n = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    val run2 = TextAnalysis.dsirResample(df, "text", "doc_id", col("tgt"), buckets = 64, n = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(run1.toSeq == run2.toSeq) // reproducible sample, stable order
    assert(run1.length == 8)
    // keys are sorted descending with doc_id tiebreak
    assert(run1.map(_._2).toSeq == run1.map(_._2).sortBy(-_).toSeq)
    // gumbel mirrors the md5-uniform construction
    val g1 = TextAnalysis.dsirResample(df, "text", "doc_id", col("tgt"), buckets = 64, n = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def hk(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (id <- Seq(1L, 7L, 13L)) {
      val u = (hk(s"g:$id").toDouble + 0.5) / 1152921504606846976.0
      assert(g1(id) == r6(-math.log(-math.log(u))), s"doc $id gumbel")
    }
  }

  test("hashedLinearScore: mirrors the md5 weight table, sigmoid bounds, label cut") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "gamma gamma gamma"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(df, "text", "doc_id", buckets = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getString(4)))
    assert(out.map(_._1).toSet == Set(1L, 2L)) // empty doc filtered
    def w(t: String): Double = {
      def h60(x: String): Long = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
        java.lang.Long.parseLong(hex, 16)
      }
      ((h60("w:" + (h60(t) % 1024)) % 2001) - 1000.0) / 1000.0
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((id, n, margin, score, label) <- out) {
      val toks = if (id == 1L) Seq("alpha", "beta") else Seq("gamma", "gamma", "gamma")
      val m = toks.map(w).sum / n
      assert(margin == r6(m), s"doc $id margin")
      assert(score == r6(1.0 / (1.0 + math.exp(-m))), s"doc $id score")
      assert(score > 0.0 && score < 1.0)
      assert(label == (if (score >= 0.5) "keep" else "drop"))
    }
  }

  test("textrankKeywords: matches a plain-Scala weighted PageRank on a tiny graph") {
    val s = spark
    import s.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma beta")).toDF("doc_id", "text")
    val out = TextAnalysis.textrankKeywords(docs, "text", "doc_id", 10, stop = Nil)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    // reference: edges alpha-beta w=2, beta-gamma w=1
    val edges = Map(("alpha", "beta") -> 2.0, ("beta", "gamma") -> 1.0)
    val nbrs = (edges.keys.flatMap { case (a, b) => Seq(a -> (b, edges((a, b))), b -> (a, edges((a, b)))) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val wd = nbrs.view.mapValues(_.map(_._2).sum).toMap
    var r = nbrs.keys.map(_ -> 1.0 / 3).toMap
    for (_ <- 1 to 3)
      r = r.keys.map { v =>
        v -> (0.15 / 3 + 0.85 * nbrs(v).map { case (u, w) => w / wd(u) * r(u) }.sum)
      }.toMap
    val expect = r.toSeq.map { case (w, x) =>
      w -> BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sortBy { case (w, x) => (-x, w) }
    assert(out.toSeq == expect)
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-3) // PageRank conserves mass
  }

  test("driftWords: disjoint words contribute 0.5*p*log2(2), shared drift is small") {
    val s = spark
    import s.implicits._
    import graft.operators.TextAnalysis
    val a = Seq((1L, "apple apple banana")).toDF("doc_id", "text")
    val b = Seq((2L, "apple cherry")).toDF("doc_id", "text")
    val out = TextAnalysis.driftWords(a, b, "text", 20, stop = Nil)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    // cherry only in B with p=1/2: contrib = 0.5 * 0.5 * log2(2) = 0.25
    assert(out("cherry") == ((0L, 1L, 0.25)))
    // banana only in A with p=1/3: contrib = 0.5/3 = 0.166667
    assert(out("banana") == ((2L - 1L, 0L, 0.166667)))
    // apple in both: tiny but nonzero drift (2/3 vs 1/2)
    assert(out("apple")._3 > 0.0 && out("apple")._3 < 0.02)
    assert(out.size == 3)
  }

  test("phraseMatch: counts overlapping consecutive occurrences per doc") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "hash join hash join vector"),     // 2 non-overlapping hits
      (2L, "hash hash join join hash join"),  // positions 2 and 5: 2 hits
      (3L, "join hash vector"),               // reversed order: 0 hits
      (4L, "hash join")                       // exactly the phrase: 1 hit
    ).toDF("doc_id", "text")
    val out = operators.TextAnalysis.phraseMatch(docs, "text", "doc_id",
        Seq("hash", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (4L, 1L)))
    // 3-token phrase exercises the positional join depth
    val tri = operators.TextAnalysis.phraseMatch(docs, "text", "doc_id",
        Seq("hash", "join", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tri.toSeq == Seq((1L, 1L))) // "hash join hash" only in doc 1
  }

  test("ctfidfLabels: tiny two-class corpus, hand-computed scores") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", "x x y"),   // class a: x:2 y:1  (3 tokens)
      ("b", "y z z")    // class b: y:1 z:2  (3 tokens)
    ).toDF("src", "text")
    val out = TextAnalysis.ctfidfLabels(df, "text", "src", k = 2)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Int]("rank"),
        r.getAs[String]("term"), r.getAs[Double]("score")))
    // A = 6/2 = 3; f_x=2, f_y=2, f_z=2 -> idf = ln(1 + 3/2) = ln(2.5)
    val idf = math.log(2.5)
    def sc(tf: Long) = BigDecimal(tf * idf)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      ("a", 1, "x", sc(2)), ("a", 2, "y", sc(1)),
      ("b", 1, "z", sc(2)), ("b", 2, "y", sc(1))))
  }

  test("sourceEntropy: uniform dist -> ln(k), single token -> 0, TTR exact") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("u", "a b c d"),   // uniform over 4 -> ln(4)
      ("z", "x x x x")    // single type -> entropy 0, TTR 1/4
    ).toDF("src", "text")
    val out = TextAnalysis.sourceEntropy(df, "text", "src")
      .collect().map(r => r.getAs[String]("src") ->
        ((r.getAs[Double]("entropy_nats"), r.getAs[Long]("distinct_tokens"),
          r.getAs[Long]("total_tokens"), r.getAs[Double]("type_token_ratio")))).toMap
    val ln4 = BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("u") == ((ln4, 4L, 4L, 1.0)))
    assert(out("z") == ((0.0, 1L, 4L, 0.25)))
  }

  test("oovRate: vocab cut by count then token, rates exact") {
    val s = spark
    import s.implicits._
    // corpus counts: a:3, b:2, c:1, d:1 -> vocab(top-2) = {a, b}
    val df = Seq(("s1", "a a b c"), ("s2", "a b d")).toDF("src", "text")
    val out = TextAnalysis.oovRate(df, "text", "src", vocabSize = 2)
      .collect().map(r => r.getAs[String]("src") ->
        ((r.getAs[Long]("total_tokens"), r.getAs[Long]("oov_tokens"),
          r.getAs[Double]("oov_rate")))).toMap
    assert(out("s1") == ((4L, 1L, 0.25)))   // c is OOV
    assert(out("s2") == ((3L, 1L, BigDecimal(1.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("lengthBuckets: ladder edges inclusive, waste arithmetic exact") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(3)(i => ("d", Seq.fill(16)("w").mkString(" "))) ++
      Seq(("d", Seq.fill(17)("w").mkString(" ")))
    val out = TextAnalysis.lengthBuckets(df.toDF("id", "text"), "text")
      .collect().map(r => r.getAs[Int]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Double]("padding_waste")))).toMap
    assert(out(16) == ((3L, 48L, 48L, 0.0)))      // exactly-16 docs waste nothing
    assert(out(32) == ((1L, 17L, 32L, BigDecimal(1.0 - 17.0 / 32.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("lengthBuckets: overlong docs clamp padding_waste at 0, never negative") {
    val s = spark
    import s.implicits._
    // 5000 tokens > top bucket 4096: padded (4096) < total (5000), so raw
    // waste would be negative — published value must clamp to 0
    val df = Seq(("d", Seq.fill(5000)("w").mkString(" "))).toDF("id", "text")
    val out = TextAnalysis.lengthBuckets(df, "text").collect()
    assert(out.length == 1 && out(0).getAs[Int]("bucket") == 4096)
    assert(out(0).getAs[Long]("padded_tokens") == 4096L)
    assert(out(0).getAs[Double]("padding_waste") == 0.0)
  }

  test("rerankWithModel: seam scorer bit-identical to the expression twin, candidates from BM25") {
    val docs = Tables.documents(spark, sf0001)
    val terms = Seq("hash", "join", "vector")
    val out = TextAnalysis.rerankWithModel(docs, "text", "doc_id", terms,
      candidateK = 20, k = 10, TextAnalysis.overlapF1Scorer(terms)).collect()
    assert(out.length == 10)
    // every result is a BM25 top-20 candidate, rank carried through
    val cands = TextAnalysis.bm25TopK(docs, "text", "doc_id", terms, 20)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    out.foreach { r =>
      assert(cands(r.getAs[Long]("doc_id")))
      assert(r.getAs[Int]("bm25_rank") >= 1 && r.getAs[Int]("bm25_rank") <= 20)
    }
    // expression-path twin of the F1 scorer: identical doubles
    val twin = docs
      .select(col("doc_id"),
        round((lit(2.0) * size(array_intersect(
            array_distinct(graft.functions.TextFns.tokens(col("text"))),
            typedLit(terms))).cast("double")) /
          (size(array_distinct(graft.functions.TextFns.tokens(col("text")))) +
            lit(terms.size)).cast("double"), 6).as("f1"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("f1")).toMap
    out.foreach { r =>
      assert(r.getAs[Double]("rerank_score") == twin(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: seam ${r.getAs[Double]("rerank_score")} " +
          s"!= expr ${twin(r.getAs[Long]("doc_id"))}")
    }
    // descending rank with doc-id tiebreak
    val scores = out.map(r => (r.getAs[Double]("rerank_score"), r.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sortBy { case (s0, id) => (-s0, id) }))
  }

  test("shardPlan: snake draft balances token totals exactly on a linear ramp") {
    val s = spark
    import s.implicits._
    // doc i carries i tokens; ranks 1..8 ascending -> snake 0,1,2,3,3,2,1,0
    val df = (1 to 8).map(i => (i.toLong, Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val plan = TextAnalysis.shardPlan(df, "text", "doc_id", nShards = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(plan(1L) == ((1L, 0)) && plan(2L) == ((2L, 1)))
    assert(plan(4L) == ((4L, 3)) && plan(5L) == ((5L, 3)))
    assert(plan(8L) == ((8L, 0)))
    // every shard totals exactly 9 tokens (1+8, 2+7, 3+6, 4+5) — the
    // balance a plain rank%S deal does NOT achieve (shard 0 would get 1+5)
    val totals = plan.values.groupBy(_._2).view.mapValues(_.map(_._1).sum).toMap
    assert(totals == Map(0 -> 9L, 1 -> 9L, 2 -> 9L, 3 -> 9L))
  }

  test("tokenDropout: seeded per-position drops replay exactly; p=0 is identity") {
    val s = spark
    import s.implicits._
    val df = Seq((7L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    // replicate the md5-uniform per (seed, id, 0-based position)
    def u(id: Long, i: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"aug:$id:$i".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 1.152921504606846976e18
    }
    val words = "alpha beta gamma delta epsilon zeta".split(" ")
    for (p <- Seq(0.0, 0.3, 0.7)) {
      val kept = words.zipWithIndex.collect { case (w, i) if u(7L, i) >= p => w }
      val r = TextAnalysis.tokenDropout(df, "text", "doc_id", p).collect().head
      assert(r.getAs[Long]("n_tokens") == 6L)
      assert(r.getAs[String]("aug_text") == kept.mkString(" "), s"p=$p")
      assert(r.getAs[Long]("n_dropped") == 6L - kept.length)
    }
    // a different seed yields an independent (here: different) variant
    val alt = TextAnalysis.tokenDropout(df, "text", "doc_id", 0.5, seed = "aug2:")
      .collect().head.getAs[String]("aug_text")
    val base = TextAnalysis.tokenDropout(df, "text", "doc_id", 0.5)
      .collect().head.getAs[String]("aug_text")
    assert(alt != base)
  }

  test("tokenDropout: native xxhash64 family is deterministic and drops near rate p") {
    val s = spark
    import s.implicits._
    val df = (1L to 50L).map(i => (i, Seq.fill(40)("tok").zipWithIndex
      .map { case (t, j) => s"$t$j" }.mkString(" "))).toDF("doc_id", "text")
    val r1 = TextAnalysis.tokenDropout(df, "text", "doc_id", 0.25, portable = false)
    val r2 = TextAnalysis.tokenDropout(df, "text", "doc_id", 0.25, portable = false)
    assert(r1.collect().map(_.toSeq).toSeq == r2.collect().map(_.toSeq).toSeq)
    val agg = r1.agg(sum("n_dropped"), sum("n_tokens")).collect().head
    val rate = agg.getLong(0).toDouble / agg.getLong(1)
    assert(rate > 0.18 && rate < 0.32, s"drop rate $rate far from p=0.25")
  }

  test("packManifest: spill flags and offset-ordered layout per packed sequence") {
    val s = spark
    import s.implicits._
    // budget 4, one bucket: offsets 0,3,6 -> doc2 straddles the seq-0/1
    // boundary (3+3>4), doc3 fills seq 1 exactly (2+2<=4, no spill)
    val df = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h")).toDF("doc_id", "text")
    val out = TextAnalysis.packManifest(df, "text", "doc_id", budget = 4, buckets = 1)
      .collect().map(r => (r.getLong(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(out(0L) == ((2L, 6L, 1L, "1@0,2@3")))
    assert(out(1L) == ((1L, 2L, 0L, "3@2")))
  }
}
