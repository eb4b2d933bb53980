package graft

import org.apache.spark.sql.functions._
import graft.operators.Tokenizer

/** BPE goldens, hand-computed (Sennrich et al. 2016 greedy merge rule with
  * lexicographic tie-break pinned for engine determinism). */
class TokenizerSpec extends SparkSpec {

  private def wc(rows: Seq[(String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("word", "cnt")
  }

  test("bpePairCounts: char pairs + end-of-word, frequency-weighted") {
    // "abc"×3: (a,b)3 (b,c)3 (c,</w>)3; "abd"×2: (a,b)2 (b,d)2 (d,</w>)2
    val out = Tokenizer.bpePairCounts(wc(Seq("abc" -> 3L, "abd" -> 2L)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("a", "b")) == 5L)
    assert(out(("b", "c")) == 3L)
    assert(out(("c", "</w>")) == 3L)
    assert(out(("b", "d")) == 2L)
    assert(out(("d", "</w>")) == 2L)
    assert(out.size == 5)
  }

  test("bpeLearn: greedy merges with lexicographic tie-break") {
    // round 1: (a,b)=5 wins; round 2: (ab,c)=3 ties (c,</w>)=3, "ab"<"c"
    // wins; round 3: (abc,</w>)=3
    val merges = Tokenizer.bpeLearn(wc(Seq("abc" -> 3L, "abd" -> 2L)), 3)
    assert(merges == Seq(("a", "b"), ("ab", "c"), ("abc", "</w>")))
  }

  test("bpeLearn stops when no pair repeats") {
    val merges = Tokenizer.bpeLearn(wc(Seq("ab" -> 1L, "cd" -> 1L)), 10)
    assert(merges.isEmpty)
  }

  test("mergeOnce is greedy leftmost on overlaps") {
    val s = spark
    import s.implicits._
    val out = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(Tokenizer.mergeOnce(col("syms"), "a", "a").as("m"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }

  test("applyBpeMerges reproduces the learned segmentation") {
    val s = spark
    import s.implicits._
    val merges = Seq(("a", "b"), ("ab", "c"), ("abc", "</w>"))
    val out = Seq("abc", "abd", "xab").toDF("word")
      .select(col("word"),
        Tokenizer.applyBpeMerges(Tokenizer.initialSymbols(col("word")), merges).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("abc") == Seq("abc</w>"))
    assert(out("abd") == Seq("ab", "d", "</w>"))
    assert(out("xab") == Seq("x", "ab", "</w>"))
  }

  test("bpeTokenCounts: frequency-weighted subword counts") {
    val merges = Seq(("a", "b"))
    val out = Tokenizer.bpeTokenCounts(wc(Seq("ab" -> 4L, "abd" -> 2L)), merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("ab") == 6L)
    assert(out("</w>") == 6L)
    assert(out("d") == 2L)
  }

  test("fold-apply equals the oracle's replace-chain on corpus words") {
    // the tok_subword_counts oracle replays merges as a bracketed replace
    // chain (each symbol wrapped chr(1)...chr(2)); prove the encoding
    // equivalence against the real aggregate() fold over every sf0.001
    // corpus word. (A one-sided separator encoding fails exactly here:
    // merge (i,n) must not fire against the symbol "n</w>" in "join".)
    val s = spark
    val (o, c) = ("\u0001", "\u0002")
    val words = Tokenizer.wordCounts(Tables.documents(s, sf0001))
      .where(!col("word").contains(o) && !col("word").contains(c))
    val viaFold = words.select(col("word"),
      Tokenizer.applyBpeMerges(Tokenizer.initialSymbols(col("word")),
        Tokenizer.PinnedMerges).as("syms"))
    val encoded = concat(
      array_join(transform(filter(split(col("word"), ""), ch => ch =!= lit("")),
        ch => concat(lit(o), ch, lit(c))), ""),
      lit(o + "</w>" + c))
    val chain = Tokenizer.PinnedMerges.foldLeft(encoded) { case (col0, (a, b)) =>
      replace(col0, lit(o + a + c + o + b + c), lit(o + a + b + c))
    }
    val viaReplace = words.select(col("word"),
      filter(transform(split(chain, c), t => regexp_replace(t, o, "")),
        t => t =!= lit("")).as("syms"))
    assert(viaFold.exceptAll(viaReplace).isEmpty &&
      viaReplace.exceptAll(viaFold).isEmpty)
  }

  test("bpeLearn on corpus words is deterministic across runs") {
    val base = Tokenizer.wordCounts(Tables.documents(spark, sf0001))
    val m1 = Tokenizer.bpeLearn(base, 8)
    val m2 = Tokenizer.bpeLearn(base, 8)
    assert(m1 == m2 && m1.length == 8)
  }

  test("bpeTrain (in-plan) equals bpeLearn (driver loop) and re-derives PinnedMerges") {
    val base = Tokenizer.wordCounts(Tables.documents(spark, sf0001))
    val trained = Tokenizer.bpeTrain(base, 16).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(trained.map(_._1) == (1 to 16), "one merge per rank, in order")
    assert(trained.map(t => (t._2, t._3)) == Tokenizer.bpeLearn(base, 16),
      "the in-plan learner must equal the driver-loop learner")
    assert(trained.map(t => (t._2, t._3)) == Tokenizer.PinnedMerges,
      "PinnedMerges IS the learned artifact on the sf0.001 corpus")
  }

  test("bpeTrain greedy rounds and tie-break on a hand-checked corpus") {
    val trained = Tokenizer.bpeTrain(wc(Seq("abc" -> 3L, "abd" -> 2L)), 3)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(trained == Seq(("a", "b"), ("ab", "c"), ("abc", "</w>")))
  }

  test("bpeTrain collapses identically to bpeLearn's early stop on degenerate input") {
    // no pair repeats: bpeLearn returns Nil; bpeTrain's argmax frame is
    // empty every round, so the crossJoin empties the state and no
    // merge rows are emitted — the documented parity
    val trained = Tokenizer.bpeTrain(wc(Seq("ab" -> 1L, "cd" -> 1L)), 4)
    assert(trained.collect().isEmpty)
  }

  test("fertilityByLang: hand-counted words/subwords/chars and ratios") {
    val s = spark
    import s.implicits._
    // merges: (a,b)->ab. "ab ab" (en): each word -> [ab, </w>] = 2 subwords.
    // "cd" (de): [c, d, </w>] = 3 subwords
    val docs = Seq(("en", "ab ab"), ("de", "cd")).toDF("lang", "text")
    val out = Tokenizer.fertilityByLang(docs, Seq(("a", "b")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    // en: 2 words, 2*2=4 subword tokens, 4 chars -> fertility 2.0, cpt 1.0
    assert(out("en") == ((2L, 4L, 4L, 2.0, 1.0)))
    // de: 1 word, 3 tokens, 2 chars -> fertility 3.0, cpt 0.666667
    assert(out("de") == ((1L, 3L, 2L, 3.0, 0.666667)))
  }
}
