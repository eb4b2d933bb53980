package graft

/** Driver-contract shape checks. */
class EntrySpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; catalog is non-trivial") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 30)
    assert(SparkEntry.oracleSql.size >= 25)
  }

  test("every query runs and returns rows on sf0.001") {
    val slow = Set("v3_representatives", "dd_minhash_neardup") // covered by their own specs
    for ((name, fn) <- SparkEntry.queries if !slow(name)) {
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
