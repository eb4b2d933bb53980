package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Analytics, RangeJoin}

class RangeJoinSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("bucketed interval join: boundary containment, inclusive both ends") {
    val s = spark
    import s.implicits._
    val points = Seq((1L, 100L), (2L, 150L), (3L, 200L), (4L, 201L), (5L, 99L))
      .toDF("pid", "us")
    val intervals = Seq((10L, 100L, 200L)).toDF("iid", "w_start", "w_end")
    val got = RangeJoin.bucketedIntervalJoin(points, intervals,
        "us", "w_start", "w_end", bucketWidth = 30L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L)) // 100 and 200 inclusive; 99 and 201 out
  }

  test("bucketed interval join: matches the naive theta join on random data") {
    val s = spark
    import s.implicits._
    val ptGen = for {
      id <- Gen.chooseNum(1L, 1000L)
      t <- Gen.chooseNum(0L, 5000L)
    } yield (id, t)
    val ivGen = for {
      id <- Gen.chooseNum(1L, 1000L)
      a <- Gen.chooseNum(0L, 5000L)
      len <- Gen.chooseNum(0L, 700L)
    } yield (id, a, a + len)
    val points = samples(ptGen, 300).toDF("pid", "us")
    val intervals = samples(ivGen, 60).toDF("iid", "w_start", "w_end")
    for (width <- Seq(1L, 100L, 1000L, 10000L)) {
      val fast = RangeJoin.bucketedIntervalJoin(points, intervals,
          "us", "w_start", "w_end", width)
        .select("pid", "us", "iid", "w_start", "w_end")
      val slow = RangeJoin.naiveIntervalJoin(points, intervals, "us", "w_start", "w_end")
        .select("pid", "us", "iid", "w_start", "w_end")
      // exact multiset equality both directions
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
        s"mismatch at bucketWidth=$width")
    }
  }

  test("bucketed interval join: each match produced exactly once (no dup pairs)") {
    val s = spark
    import s.implicits._
    // interval spanning many buckets; point matches once regardless
    val points = Seq((1L, 500L)).toDF("pid", "us")
    val intervals = Seq((10L, 0L, 1000L)).toDF("iid", "w_start", "w_end")
    val n = RangeJoin.bucketedIntervalJoin(points, intervals,
      "us", "w_start", "w_end", bucketWidth = 7L).count()
    assert(n == 1L)
  }

  test("salted join: row-identical to the plain join, salt column dropped") {
    val s = spark
    import s.implicits._
    val fact = samples(for {
      id <- Gen.chooseNum(1L, 10000L)
      k <- Gen.oneOf("a", "b", "c", "z") // z has no dim row
      v <- Gen.chooseNum(-100.0, 100.0)
    } yield (id, k, v), 500).toDF("event_id", "k", "v")
    val dim = Seq(("a", 1.0), ("b", 2.0), ("c", -1.0)).toDF("k", "w")
    val salted = Analytics.saltedJoin(fact, dim, "k", col("event_id"), salts = 8)
      .select("event_id", "k", "v", "w")
    val plain = fact.join(dim, Seq("k")).select("event_id", "k", "v", "w")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(!salted.columns.contains("__salt"))
  }
}
