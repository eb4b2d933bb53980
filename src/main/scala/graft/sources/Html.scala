package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** S3/S4 (SURVEY.md §2.1): HTML file scan + text-block extraction.
  *
  * The reference drives a headless browser + BeautifulSoup; the engine's
  * scope starts at "HTML text in, categorized blocks out". The extraction
  * is a dependency-free regex approximation of the reference's
  * strip-scripts/pull-title/pull-paragraphs pass
  * (ref `extract_text_fun.py:136-232`), expressed as column functions so
  * it runs distributed over millions of files at scale.
  */
object Html {

  /** S3: scan a directory of files, newest first (mtime desc), as
    * (path, modificationTime, content) (ref `extract_text_fun.py:356-379`). */
  def newestFirst(spark: SparkSession, dir: String, glob: String = "*.html"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("modificationTime"),
        col("content").cast("string").as("html"))
      .orderBy(col("modificationTime").desc, col("path"))

  /** Drop script/style/noscript/iframe blocks, then all tags; collapse
    * whitespace. */
  def stripTags(html: Column): Column =
    TextFns.cleanText(
      regexp_replace(
        regexp_replace(html, "(?is)<(script|style|noscript|iframe)[^>]*>.*?</\\1>", " "),
        "<[^>]+>", " "))

  def title(html: Column): Column =
    TextFns.cleanText(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))

  /** All <p> block texts longer than minLen (tags inside stripped). */
  def paragraphs(html: Column, minLen: Int = 20): Column =
    filter(
      transform(regexp_extract_all(html, lit("(?is)<p[^>]*>(.*?)</p>"), lit(1)),
        p => stripTags(p)),
      p => length(p) > minLen)

  /** F6 block categorization (ref `extract_text_fun.py:176-208`):
    * contains-any keyword routing into reviews / ratings (requires a
    * digit) / descriptions / other. */
  def categorize(text: Column): Column = {
    val lc = lower(text)
    when(lc.rlike("review|visited|stayed|came here|experience"), "reviews")
      .when(lc.rlike("rating|stars|score") && text.rlike("[0-9]"), "ratings")
      .when(lc.rlike("menu|cuisine|location|hours|about"), "descriptions")
      .otherwise("other_text")
  }
}
