package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** S3/S4 (SURVEY.md §2.1): HTML file scan + text-block extraction.
  *
  * The reference drives a headless browser + BeautifulSoup; the engine's
  * scope starts at "HTML text in, categorized blocks out". Two tiers:
  *  - lightweight column functions ([[stripTags]]/[[title]]/
  *    [[paragraphs]]) — regex approximations that stay inside codegen for
  *    cheap bulk passes;
  *  - the faithful DOM pass ([[extractBlocks]]/[[categorizedBlocks]] over
  *    [[HtmlDom]]) reproducing the reference's selector semantics
  *    (ref `extract_text_fun.py:136-245`), including class-contains
  *    review/comment container selection and sentence-level duplicate
  *    suppression, which no regex pass can express.
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

  // ---------------------------------------------------------------------
  // S4 proper: DOM-selector extraction (ref `extract_text_fun.py:136-245`)
  // — the full BeautifulSoup pass over [[HtmlDom]]: decompose non-visible
  // elements, title, h1 → restaurant_info, find_all('p'), review/comment-
  // class div/span containers, substantial divs, sentence-level dedup,
  // per-category order-preserving dedup + length floor.
  // ---------------------------------------------------------------------

  private def cleanStr(s: String): String = s.replaceAll("\\s+", " ").trim

  /** ref `extract_text_fun.py:26-54` — quote/citation probe used to
    * exempt sentences from duplicate suppression. */
  private[graft] def isQuotedOrCitationStr(s: String): Boolean =
    java.util.regex.Pattern.compile("[\"'].*?[\"']").matcher(s).find() ||
      Seq("\\[.*?\\]", "\\(.*?\\)", "(?i)according to", "(?i)said",
        "(?i)quoted", "(?i)states", "(?i)mentioned")
        .exists(p => java.util.regex.Pattern.compile(p).matcher(s).find())

  /** ref `:56-86` — any non-quoted sentence of `text` appearing inside a
    * non-quoted existing block marks `text` as duplicate. */
  private[graft] def hasDuplicateSentence(text: String, existing: Iterable[String]): Boolean = {
    val sentences = text.split("[.!?]+").map(_.trim).filter(_.length > 15)
    sentences.exists { s =>
      !isQuotedOrCitationStr(s) &&
        existing.exists(e => e.contains(s) && !isQuotedOrCitationStr(e))
    }
  }

  /** ref `:88-122` — iterative keyword split keeping the separator with
    * the following text; drops blocks of length <= 20. */
  private[graft] def splitBySeparators(text: String, seps: Seq[String]): Seq[String] = {
    var blocks = Seq(text)
    seps.foreach { sep =>
      blocks = blocks.flatMap { b =>
        val parts = b.split(java.util.regex.Pattern.quote(sep), -1)
        if (parts.length > 1)
          (if (parts(0).trim.nonEmpty) Seq(parts(0).trim) else Nil) ++
            parts.tail.filter(_.trim.nonEmpty).map(p => sep + p.trim)
        else if (b.trim.nonEmpty) Seq(b.trim)
        else Nil
      }
    }
    blocks.filter(_.length > 20)
  }

  private val ReviewWords = Seq("review", "visited", "stayed", "experience")
  private val ReviewWordsP = ReviewWords ++ Seq("excellent", "terrible", "good", "bad")
  private val RatingWords = Seq("rating", "star", "score")

  /** The reference's whole categorized extraction as a pure function:
    * (category, block) pairs in the reference's dict order — title,
    * restaurant_info, reviews, ratings, descriptions, other_text
    * (ref `extract_text_fun.py:136-245`). */
  def extractBlocks(html: String, separators: Seq[String]): Seq[(String, String)] = {
    import scala.collection.mutable.ArrayBuffer
    val root = HtmlDom.decompose(HtmlDom.parse(html))
    val title = HtmlDom.title(root).map(cleanStr).getOrElse("")
    val restaurantInfo = ArrayBuffer.empty[String]
    val reviews = ArrayBuffer.empty[String]
    val ratings = ArrayBuffer.empty[String]
    val descriptions = ArrayBuffer.empty[String]
    val otherText = ArrayBuffer.empty[String]
    HtmlDom.firstH1(root).foreach(h1 =>
      restaurantInfo += s"Restaurant Name: ${cleanStr(h1)}")
    def rawText(n: HtmlDom.Node): String = {
      val sb = new StringBuilder
      def walk(x: HtmlDom.Node): Unit = x.children.foreach {
        case s: String        => sb.append(s)
        case c: HtmlDom.Node  => walk(c)
      }
      walk(n)
      sb.toString
    }
    // all <p> blocks (natural separators), length > 30, keyword-split,
    // categorized by the paragraph keyword set
    val allParagraphs = HtmlDom.findAll(root, Set("p"))
      .map(p => cleanStr(rawText(p))).filter(_.length > 30)
    allParagraphs.foreach { para =>
      splitBySeparators(para, separators).foreach { block =>
        val lc = block.toLowerCase
        if (ReviewWordsP.exists(lc.contains)) reviews += block
        else if (block.exists(_.isDigit) && RatingWords.exists(lc.contains)) ratings += block
        else descriptions += block
      }
    }
    // review containers: div/span whose class matches review|comment —
    // the selector the regex strip-tags pass could not express
    HtmlDom.findAllByClass(root, Set("div", "span"), "review|comment").foreach { c =>
      val text = cleanStr(c.text("\n"))
      if (text.length > 50) {
        text.split("\n").map(_.trim).filter(_.nonEmpty).foreach { para =>
          splitBySeparators(para, separators).foreach { block =>
            val lc = block.toLowerCase
            if (ReviewWords.exists(lc.contains)) {
              if (!reviews.contains(block) && !hasDuplicateSentence(block, reviews))
                reviews += block
            } else if (block.exists(_.isDigit) && RatingWords.exists(lc.contains)) {
              if (!ratings.contains(block) && !hasDuplicateSentence(block, ratings))
                ratings += block
            } else if (!otherText.contains(block) && !hasDuplicateSentence(block, otherText))
              otherText += block
          }
        }
      }
    }
    // remaining substantial divs → other_text unless any category already
    // captured the block (exact or by shared sentence)
    HtmlDom.findAll(root, Set("div")).foreach { d =>
      val text = cleanStr(d.text("\n"))
      if (text.length > 50) {
        text.split("\n").map(_.trim).filter(p => p.nonEmpty && p.length > 30).foreach { para =>
          splitBySeparators(para, separators).foreach { block =>
            val all = Seq(restaurantInfo, reviews, ratings, descriptions, otherText)
            val isDup = all.exists(l => l.contains(block) || hasDuplicateSentence(block, l))
            if (!isDup) otherText += block
          }
        }
      }
    }
    def dedup(xs: Seq[String]): Seq[String] = {
      val seen = scala.collection.mutable.Set.empty[String]
      xs.filter(x => x.length > 20 && seen.add(x))
    }
    (if (title.nonEmpty) Seq("title" -> title) else Nil) ++
      dedup(restaurantInfo.toSeq).map("restaurant_info" -> _) ++
      dedup(reviews.toSeq).map("reviews" -> _) ++
      dedup(ratings.toSeq).map("ratings" -> _) ++
      dedup(descriptions.toSeq).map("descriptions" -> _) ++
      dedup(otherText.toSeq).map("other_text" -> _)
  }

  private val extractBlocksUdf =
    udf((html: String, seps: Seq[String]) =>
      if (html == null) Seq.empty[(String, String)]
      else extractBlocks(html, Option(seps).getOrElse(Nil)))

  /** S4 as a distributed operator: one (category, pos, block) row per
    * extracted block. The per-document parse is a deterministic scalar
    * UDF — embarrassingly parallel, no shuffle; at 100 TB this runs in
    * the ingest pass next to the parquet scan. */
  def categorizedBlocks(df: DataFrame, htmlCol: String,
                        separators: Seq[String] = Nil): DataFrame =
    df.select(col("*"),
        posexplode(extractBlocksUdf(col(htmlCol), typedLit(separators))))
      .select((df.columns.map(col) :+ col("pos") :+
        col("col._1").as("category") :+ col("col._2").as("block")): _*)
      .drop(htmlCol)
}
