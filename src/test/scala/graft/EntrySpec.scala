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

  test("oracle SQL static sanity: no truncated interpolation, balanced structure") {
    // cheap typo-catchers that run at sbt-test time; the full parse gate
    // is `tools/check_oracle.py --parse-only` over Verify's --dry-oracle
    // dump (DuckDB is driver-side tooling, not a library dependency)
    for ((name, sql) <- SparkEntry.oracleSql) {
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(sql.toUpperCase.contains("SELECT"), s"$name: no SELECT")
      val parens = sql.foldLeft(0) {
        case (acc, '(') => acc + 1
        case (acc, ')') => acc - 1
        case (acc, _) => acc
      }
      assert(parens == 0, s"$name: unbalanced parentheses ($parens)")
      assert(sql.count(_ == '\'') % 2 == 0, s"$name: odd quote count")
      // an unfilled Scala interpolation ships the literal text "null" in
      // place of a fragment builder — catch the two shapes that produces
      assert(!sql.contains("nullAS") && !sql.contains(", null,"),
        s"$name: likely unfilled interpolation")
    }
  }
}
