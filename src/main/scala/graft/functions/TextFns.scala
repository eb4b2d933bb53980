package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions (SURVEY.md §2.7), re-expressed as composed
  * Catalyst column expressions.
  *
  * Deliberately **no UDFs**: every function here is built from
  * `org.apache.spark.sql.functions` primitives, so the whole scalar layer
  * stays inside whole-stage codegen, is serialization-free, and remains
  * eligible for constant folding / pushdown at 100 TB scale.
  */
object TextFns {

  /** F1 `clean_text` (ref `extract_text_fun.py:18-24`): collapse every
    * whitespace run to a single space and trim. */
  def cleanText(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Whitespace tokens of the cleaned text; empty tokens dropped. */
  def tokens(c: Column): Column =
    filter(split(cleanText(c), " "), t => t =!= lit(""))

  /** Dolma-style normalization key for exact dedup on NORMALIZED text:
    * lowercase, punctuation → space, whitespace runs collapsed, trimmed.
    * Two documents differing only in case, punctuation, or spacing share
    * a key — the standard "fuzzy-exact" dedup stage between byte-exact
    * dedup and MinHash. Pure column algebra: the key is computed in the
    * scan's projection and the dedup downstream is one groupBy on it. */
  def normalizedKey(c: Column): Column =
    cleanText(regexp_replace(lower(c), "[^a-z0-9\\s]", " "))

  /** F4 sentence split (ref `extract_text_fun.py:69-71`): split on runs of
    * `.!?`, trim fragments, keep those strictly longer than `minLen`. */
  def sentences(c: Column, minLen: Int = 15): Column =
    filter(transform(split(c, "[.!?]+"), s => trim(s)), s => length(s) > minLen)

  private val monthNames: Seq[(String, String)] = Seq(
    "january" -> "01", "february" -> "02", "march" -> "03", "april" -> "04",
    "may" -> "05", "june" -> "06", "july" -> "07", "august" -> "08",
    "september" -> "09", "october" -> "10", "november" -> "11", "december" -> "12")

  /** Regex for F5 pattern 1 (shared with the DuckDB oracle). */
  val visitDatePattern = "date of visit:\\s*([a-z]+)\\s+(\\d{1,2}),?\\s*(\\d{4})"
  /** Regex for F5 pattern 2: bare ISO date. */
  val isoDatePattern = "(\\d{4}-\\d{2}-\\d{2})"

  /** F5 `extract_date_from_text` (ref `Context_analyzer_RoBERTa_fun.py:34-70`):
    * pattern 1 `Date of visit: <MonthName> <D>[,] <YYYY>` (case-insensitive,
    * month name mapped to number, day zero-padded); fallback pattern 2 bare
    * `\d{4}-\d{2}-\d{2}`; else NULL. Returns a `YYYY-MM-DD` string. */
  def extractDateStr(c: Column): Column = {
    val lc = lower(c)
    // Cheap contains() guard: the `when` short-circuits at runtime, so the
    // three capture-group extractions only run on rows that can match —
    // and the expression stays small enough for the JIT (a map-literal
    // variant of the month lookup generated code too large to compile,
    // turning this projection interpreter-bound).
    val mon = regexp_extract(lc, visitDatePattern, 1)
    val day = regexp_extract(lc, visitDatePattern, 2)
    val yr = regexp_extract(lc, visitDatePattern, 3)
    // month number = 1-based index in the canonical month list (0 = no match)
    val monIdx = array_position(array(monthNames.map(m => lit(m._1)): _*), mon)
    val iso = regexp_extract(c, isoDatePattern, 1)
    when(lc.contains("date of visit:") && monIdx > 0,
      concat_ws("-", yr, lpad(monIdx.cast("string"), 2, "0"), lpad(day, 2, "0")))
      .when(iso =!= "", iso)
  }

  /** DuckDB-SQL rendering of [[extractDateStr]] applied to column `col`
    * (kept adjacent so the two can never drift apart). */
  def extractDateSql(col: String): String = {
    val p = "date of visit:\\s*([a-z]+)\\s+(\\d{1,2}),?\\s*(\\d{4})"
    val monthCase = monthNames
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }
      .mkString(" ")
    s"""CASE
       |  WHEN regexp_extract(lower($col), '$p', 1) <> ''
       |   AND (CASE regexp_extract(lower($col), '$p', 1) $monthCase END) IS NOT NULL
       |  THEN concat_ws('-',
       |    regexp_extract(lower($col), '$p', 3),
       |    CASE regexp_extract(lower($col), '$p', 1) $monthCase END,
       |    lpad(regexp_extract(lower($col), '$p', 2), 2, '0'))
       |  WHEN regexp_extract($col, '(\\d{4}-\\d{2}-\\d{2})', 1) <> ''
       |  THEN regexp_extract($col, '(\\d{4}-\\d{2}-\\d{2})', 1)
       |  ELSE NULL
       |END""".stripMargin
  }

  /** F9 truncation with "..." suffix (ref `Context_analyzer_RoBERTa_fun.py:172-175`):
    * texts longer than `n` chars become the first `n` chars + "...". */
  def truncateWithEllipsis(c: Column, n: Int): Column =
    when(length(c) > n, concat(substring(c, 1, n), lit("..."))).otherwise(c)

  /** F10 wordcloud/word-frequency cleaning (ref `vizualization.py:208-214`):
    * lowercase, strip URLs, @/# handles, and non-alphabetic chars. */
  def wordcloudClean(c: Column): Column =
    cleanText(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(c), "http\\S+|www\\.\\S+", " "),
          "@\\w+|#\\w+", " "),
        "[^a-z\\s]", " "))

  /** F12 filename → source-name heuristic
    * (ref `Context_analyzer_RoBERTa_fun.py:136-167`). */
  def sourceName(path: Column): Column = {
    val lp = lower(path)
    when(lp.contains("tripadvisor"), "TripAdvisor")
      .when(lp.contains("yelp"), "Yelp")
      .when(lp.contains("google"), "Google Reviews")
      .when(lp.contains("extracted_text"), "Extracted Text")
      .otherwise("Unknown Source")
  }

  /** F2 `split_by_separators` (ref `extract_text_fun.py:87-122`): split text
    * on each separator keyword, keeping the separator attached to the
    * fragment that follows it (lookahead split); drop fragments whose
    * trimmed length is <= minLen. Returns an array column. */
  def splitBySeparators(c: Column, separators: Seq[String], minLen: Int = 20): Column = {
    val pat = separators.map(s => "(?=" + java.util.regex.Pattern.quote(s) + ")").mkString("|")
    filter(transform(split(c, pat), s => trim(s)), s => length(s) > minLen)
  }

  /** F3 `is_quoted_or_citation` (ref `extract_text_fun.py:26-55`): quoted
    * spans, bracketed/parenthesized spans, or attribution verbs. */
  def isQuotedOrCitation(c: Column): Column =
    c.rlike("\"[^\"]*\"") || c.rlike("'[^']*'") || c.rlike("\\[[^\\]]*\\]") ||
      c.rlike("\\([^)]*\\)") ||
      lower(c).rlike("according to|said|quoted|states|mentioned")
}
