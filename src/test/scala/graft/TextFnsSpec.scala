package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** F1-F10 scalar functions (fixtures from FIXTURES.md §7 / the reference's
  * documented tests, code semantics winning over doc where they conflict —
  * SURVEY §5). */
class TextFnsSpec extends SparkSpec {

  test("F1 cleanText collapses whitespace runs and trims") {
    assert(evalText("  a \t b\n\nc  ")(TextFns.cleanText(col("text"))) == "a b c")
  }

  test("F4 sentence split keeps >15-char fragments") {
    val r = evalText("Short. This sentence is long enough to keep! Tiny? Another keeper sentence here.")(
      TextFns.sentences(col("text")))
    assert(r == Seq("This sentence is long enough to keep", "Another keeper sentence here"))
  }

  test("F5 date extract: month-name pattern, zero-padded") {
    assert(evalText("Date of visit: October 1, 2025")(TextFns.extractDateStr(col("text"))) == "2025-10-01")
    assert(evalText("DATE OF VISIT: march 15 2024 was fun")(TextFns.extractDateStr(col("text"))) == "2024-03-15")
  }

  test("F5 date extract: ISO fallback and null") {
    assert(evalText("Posted on 2024-03-15")(TextFns.extractDateStr(col("text"))) == "2024-03-15")
    assert(evalText("no date in here")(TextFns.extractDateStr(col("text"))) == null)
    // invalid month name, no ISO → null (pattern 1 fails month map)
    assert(evalText("Date of visit: Frobuary 1, 2025")(TextFns.extractDateStr(col("text"))) == null)
    // slash dates are NOT supported (code truth over doc, SURVEY §5)
    assert(evalText("visited 10/01/2025")(TextFns.extractDateStr(col("text"))) == null)
  }

  test("F9 truncation adds ellipsis only beyond the cap") {
    val long = "x" * 450
    assert(evalText(long)(TextFns.truncateWithEllipsis(col("text"), 400)) == "x" * 400 + "...")
    assert(evalText("short")(TextFns.truncateWithEllipsis(col("text"), 400)) == "short")
  }

  test("F2 separator split keeps separators attached to following fragment") {
    val r = evalText("Great food here • Nice staff indeed Written by Bob on Monday")(
      TextFns.splitBySeparators(col("text"), Seq("•", "Written "), minLen = 5))
    assert(r == Seq("Great food here", "• Nice staff indeed", "Written by Bob on Monday"))
  }

  test("F3 quoted/citation classifier") {
    assert(evalText("He said it was great")(TextFns.isQuotedOrCitation(col("text"))) == true)
    assert(evalText("\"quoted span\" here")(TextFns.isQuotedOrCitation(col("text"))) == true)
    assert(evalText("plainly positive text")(TextFns.isQuotedOrCitation(col("text"))) == false)
  }

  test("F10 wordcloud cleaning strips urls, handles, non-alpha") {
    assert(evalText("Visit http://x.co @user #tag 123 Great!")(
      TextFns.wordcloudClean(col("text"))) == "visit great")
  }

  test("normalizedKey: case, punctuation, and spacing respellings share a key") {
    import org.apache.spark.sql.functions.col
    val k = (t: String) => evalText(t)(TextFns.normalizedKey(col("text")))
    assert(k("Hello,  World!") == "hello world")
    assert(k("  HELLO --- world  ") == "hello world")
    assert(k("hello world") == "hello world")
    // digits survive; distinct content stays distinct
    assert(k("room 42!") == "room 42")
    assert(k("room 43!") != k("room 42!"))
    // all-punctuation text normalizes to the empty key
    assert(k("?!... --") == "")
  }

  test("F12 source-name heuristic") {
    assert(evalText("cache/tripadvisor_page.html")(TextFns.sourceName(col("text"))) == "TripAdvisor")
    assert(evalText("whatever.html")(TextFns.sourceName(col("text"))) == "Unknown Source")
  }
}
