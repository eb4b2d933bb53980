package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Hand-rolled PDF 1.4 writer — the S11 pixel renderer, closing the one
  * reference artifact the engine previously could not emit (ref
  * `pdf_generation/pdf_generator.py:44-132` renders the report through
  * ReportLab; this container has no PDF library, so like [[RiffWav]]
  * the honest fix is to write the container format by hand).
  *
  * Scope: the subset of PDF the reference report actually uses — A4
  * pages, the 8%-of-page-height header stripe with the company name
  * (`pdf_header.draw_header_stripe`), flowed Helvetica text with
  * per-section headers and page breaks, page numbers, and the
  * visualization section's five chart families (distribution bar,
  * daily trend, per-class confidence histogram, top-words bars,
  * word-frequency cloud stand-in) — rendered by [[Charts]]
  * and embedded below as indexed-palette RunLengthDecode image
  * XObjects (the matplotlib-PNG equivalent of `pdf_sections
  * .create_visualizations_section`; RLE is hand-rolled from the PDF
  * spec, so image bytes carry no zlib-build dependence and the whole
  * file is byte-identical across JVMs — PdfSpec pins a golden SHA-256).
  *
  * Format notes (PDF 1.4 spec, public):
  *  - objects are numbered byte ranges; the `xref` table at the end
  *    records the byte offset of every object and `startxref` records
  *    the xref table's own offset — all offsets must be exact, so the
  *    writer assembles object bodies first and accumulates offsets;
  *  - content streams here are UNCOMPRESSED (`/Length` = exact bytes):
  *    deterministic output, and the spec's own parse-back tests read
  *    the text operators straight out of the bytes;
  *  - text is latin-1 literal strings: `(`, `)`, `\` escaped, anything
  *    outside latin-1 replaced with `?` (the report corpus is ASCII);
  *  - layout is integer/half-point arithmetic only — bytes are
  *    bit-identical across runs and JVMs (PdfSpec pins determinism).
  *
  * The render itself is DRIVER-side on an O(1)-size frame: the report
  * row is the already-reduced output of `Serving.reportDocument` (two
  * map-side-combined aggregation passes over the corpus); at 100 TB
  * the PDF is one small artifact written after the distributed reduce,
  * exactly like the reference's single report file. */
object Pdf {

  /** A4 in points (ReportLab's A4 = 595.27 × 841.89; integer-rounded —
    * the stripe fraction and margins mirror `pdf_generator.py:76-82`). */
  val PageW = 595
  val PageH = 842
  /** 8% of page height — `stripe_height = A4[1] * 0.08`. */
  val StripeH = 67
  val MarginX = 72
  val BottomY = 56

  private val HeaderSize = 14
  private val BodySize = 10
  private def leading(size: Int): Int = size + 4

  /** Escape a line into a PDF literal string (latin-1; parens and
    * backslash escaped; non-latin-1 → '?'). */
  private[graft] def escape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '('  => "\\("
      case ')'  => "\\)"
      case c if c.toInt > 255 || c.toInt < 32 => "?"
      case c => c.toString
    }

  /** Greedy word wrap at a deterministic width estimate: Helvetica
    * averages ~0.5 em per glyph, so a `size`-pt line fits
    * `2·(PageW − 2·margin)/size` characters. Words longer than a line
    * are hard-split (URLs in comment text). */
  private[graft] def wrap(text: String, size: Int): Seq[String] = {
    val maxChars = math.max(8, 2 * (PageW - 2 * MarginX) / size)
    val words = text.split("\\s+").filter(_.nonEmpty)
      .flatMap(_.grouped(maxChars))
    if (words.isEmpty) Seq("")
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      for (w <- words) {
        if (cur.isEmpty) cur ++= w
        else if (cur.length + 1 + w.length <= maxChars) { cur += ' '; cur ++= w }
        else { out += cur.toString; cur.clear(); cur ++= w }
      }
      out += cur.toString
      out.toSeq
    }
  }

  /** A report section: header, body lines, and inline raster images
    * (drawn after the lines — the reference's visualization section
    * shape). */
  final case class Section(title: String, lines: Seq[String],
                           images: Seq[java.awt.image.BufferedImage] = Nil)

  /** Display box for an embedded chart, points (480×280 px at 0.9). */
  private val ImgW = 432
  private val ImgH = 252

  /** One positioned text line: (content, font size). */
  private final case class L(text: String, size: Int)
  private sealed trait Item
  private final case class TextItem(y: Int, l: L) extends Item
  /** y = BOTTOM edge of the placed image box. */
  private final case class ImgItem(y: Int, imgIdx: Int) extends Item

  /** Flow section lines + images into pages: each page holds the header
    * stripe; a section header never strands alone at a page bottom
    * (one-line widow guard); an image that does not fit the remaining
    * space moves whole to the next page. */
  private def paginate(title: String,
                       sections: Seq[Section]): Seq[Seq[Item]] = {
    val topY = PageH - StripeH - 40
    val pages = scala.collection.mutable.ArrayBuffer.empty[Seq[Item]]
    var page = scala.collection.mutable.ArrayBuffer.empty[Item]
    var y = topY
    var imgIdx = 0
    def breakPage(): Unit = { pages += page.toSeq; page = scala.collection.mutable.ArrayBuffer.empty; y = topY }
    def put(l: L): Unit = {
      if (y - leading(l.size) < BottomY) breakPage()
      y -= leading(l.size)
      page += TextItem(y, l)
    }
    def putImg(): Unit = {
      if (y - ImgH - 8 < BottomY) breakPage()
      y -= ImgH + 8
      page += ImgItem(y, imgIdx)
      imgIdx += 1
    }
    // title page: document title centered-ish high, alone
    put(L(title, 20))
    breakPage()
    for (sec <- sections) {
      // widow guard: header + first body line must fit together
      if (y - leading(HeaderSize) - leading(BodySize) < BottomY) breakPage()
      put(L(sec.title, HeaderSize))
      for (line <- sec.lines; w <- wrap(line, BodySize)) put(L(w, BodySize))
      for (_ <- sec.images) putImg()
      y -= leading(BodySize) // blank gap between sections
    }
    if (page.nonEmpty) pages += page.toSeq
    pages.toSeq
  }

  /** Content-stream source for one page: stripe, company name on the
    * stripe in white, the flowed lines and images, the page number. */
  private def pageContent(company: String, items: Seq[Item],
                          pageNo: Int, pageCount: Int): String = {
    val sb = new StringBuilder
    // header stripe: the reference's red banner (draw_header_stripe)
    sb ++= s"q 0.86 0.08 0.08 rg 0 ${PageH - StripeH} $PageW $StripeH re f Q\n"
    sb ++= s"BT 1 1 1 rg /F1 16 Tf $MarginX ${PageH - StripeH + 24} Td (${escape(company)}) Tj ET\n"
    for (item <- items) item match {
      case TextItem(y, l) =>
        sb ++= s"BT 0 0 0 rg /F1 ${l.size} Tf $MarginX $y Td (${escape(l.text)}) Tj ET\n"
      case ImgItem(y, idx) =>
        sb ++= s"q $ImgW 0 0 $ImgH $MarginX $y cm /Im${idx + 1} Do Q\n"
    }
    sb ++= s"BT 0 0 0 rg /F1 9 Tf ${PageW / 2 - 20} 40 Td (Page $pageNo of $pageCount) Tj ET\n"
    sb.toString
  }

  /** Tuple-section convenience overload (text-only sections). */
  def render(company: String, title: String,
             sections: Seq[(String, Seq[String])]): Array[Byte] =
    renderSections(company, title,
      sections.map { case (t, ls) => Section(t, ls) })

  /** Assemble a complete PDF byte array: catalog(1), pages(2), font(3),
    * per page 2 objects (page, contents), then one image XObject per
    * embedded chart (8-bit `/Indexed /DeviceRGB` samples, hand-rolled
    * [[rleEncode RunLengthDecode]] — every byte a pure function of the
    * chart raster). Exact xref offsets. */
  def renderSections(company: String, title: String,
                     sections: Seq[Section]): Array[Byte] = {
    val paged = paginate(title, sections)
    val images = sections.flatMap(_.images)
    val n = paged.length
    val pageObjIds = (0 until n).map(i => 4 + 2 * i)
    val imgObjId = (k: Int) => 4 + 2 * n + k // k is 0-based image index
    val objs = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    objs += 1 -> "<< /Type /Catalog /Pages 2 0 R >>"
    objs += 2 -> s"<< /Type /Pages /Kids [${pageObjIds.map(id => s"$id 0 R").mkString(" ")}] /Count $n >>"
    objs += 3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    val xobjDict =
      if (images.isEmpty) ""
      else " /XObject << " + images.indices
        .map(k => s"/Im${k + 1} ${imgObjId(k)} 0 R").mkString(" ") + " >>"
    for ((items, i) <- paged.zipWithIndex) {
      val content = pageContent(company, items, i + 1, n)
      objs += (4 + 2 * i) ->
        (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $PageW $PageH] " +
          s"/Contents ${5 + 2 * i} 0 R /Resources << /Font << /F1 3 0 R >>$xobjDict >> >>")
      // the EOL before `endstream` is REQUIRED by ISO 32000-1 §7.3.8.1
      // and not counted in /Length (same framing as the image objects)
      objs += (5 + 2 * i) ->
        s"<< /Length ${content.getBytes("ISO-8859-1").length} >>\nstream\n${content}\nendstream"
    }
    for ((img, k) <- images.zipWithIndex) {
      val (pal, idx) = Charts.indexedBytes(img)
      val data = rleEncode(idx)
      val palHex = pal.map(b => f"${b & 0xff}%02X").mkString
      objs += imgObjId(k) ->
        (s"<< /Type /XObject /Subtype /Image /Width ${img.getWidth} " +
          s"/Height ${img.getHeight} " +
          s"/ColorSpace [/Indexed /DeviceRGB ${pal.length / 3 - 1} <$palHex>] " +
          s"/BitsPerComponent 8 /Filter /RunLengthDecode /Length ${data.length} >>" +
          s"\nstream\n${new String(data, "ISO-8859-1")}\nendstream")
    }
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val offsets = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    for ((id, body) <- objs.sortBy(_._1)) {
      offsets(id) = out.size()
      w(s"$id 0 obj\n$body\nendobj\n")
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${objs.length + 1}\n")
    w("0000000000 65535 f \n")
    for (id <- objs.map(_._1).sorted)
      w(f"${offsets(id)}%010d 00000 n \n")
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n")
    w("%%EOF\n")
    out.toByteArray
  }

  /** PDF `RunLengthDecode` (PackBits) encoder, ISO 32000-1 §7.4.5:
    * a length byte `l < 128` copies the next `l+1` bytes literally;
    * `l > 128` repeats the next byte `257-l` times; `128` is EOD.
    * Hand-rolled (like the xref writer) so the compressed bytes are a
    * pure function of the input — no zlib-build dependence. Runs of
    * ≥2 identical bytes are run-encoded; over [[Charts.indexedBytes]]
    * output (flat-color rasters, one byte per pixel) this beats Flate
    * while staying deterministic. */
  private[graft] def rleEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (run < 128 && i + run < data.length && data(i + run) == data(i)) run += 1
      if (run >= 2) { out.write(257 - run); out.write(data(i) & 0xff); i += run }
      else {
        val start = i
        var lit = 0
        while (lit < 128 && i < data.length &&
               !(i + 1 < data.length && data(i) == data(i + 1))) { i += 1; lit += 1 }
        out.write(lit - 1); out.write(data, start, lit)
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  /** Inverse of [[rleEncode]] — spec-facing, so PdfSpec verifies the
    * writer against its own bytes (the RiffWav interop posture). */
  private[graft] def rleDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0; var done = false
    while (!done && i < data.length) {
      val l = data(i) & 0xff; i += 1
      if (l == 128) done = true
      else if (l < 128) { out.write(data, i, l + 1); i += l + 1 }
      else {
        val n = 257 - l; val b = data(i) & 0xff; i += 1
        var k = 0; while (k < n) { out.write(b); k += 1 }
      }
    }
    out.toByteArray
  }

  private def fmt2(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))

  /** The report row → the reference's section sequence
    * (`pdf_sections.create_*`, called in `pdf_generator.py:97-126`).
    * Consumes the `Serving.reportDocument` single-row frame;
    * `trendDays` (date, total) rows feed the visualization section's
    * line chart when supplied. */
  def reportSections(r: Row,
                     trendDays: Seq[(String, Long)] = Nil,
                     histRows: Seq[(String, Long, Long)] = Nil,
                     topWords: Seq[(String, Long)] = Nil,
                     cloudWords: Seq[(String, Long)] = Nil): Seq[Section] = {
    def s(c: String): String = Option(r.getAs[Any](c)).map(_.toString).getOrElse("n/a")
    def d(c: String): String =
      Option(r.getAs[Any](c)).map(v => fmt2(v.toString.toDouble)).getOrElse("n/a")
    val toc = Seq("Executive Summary", "Methodology", "Visualizations",
      "Comment Analysis Methodology", "Representative Comments",
      "Highest Confidence Comments", "LLM Summaries", "Recommendations",
      "Insurance Risk Assessment", "Technical Details")
    def cls(prefix: String, label: String): Seq[String] = Seq(
      s"$label [Confidence: ${d(prefix + "_confidence")}]:",
      s(prefix + "_text"))
    def cnt(c: String): Long =
      Option(r.getAs[Any](c)).map(_.toString.toLong).getOrElse(0L)
    val bar = Charts.sentimentBar(Seq(
      ("POSITIVE", cnt("positive_cnt"), s("positive_pct")),
      ("NEGATIVE", cnt("negative_cnt"), s("negative_pct")),
      ("NEUTRAL", cnt("neutral_cnt"), s("neutral_pct"))))
    // the reference's five PNG families (vizualization.py:60-300):
    // distribution bar, daily trend, per-class confidence histogram,
    // top-words bars, wordcloud — each rendered only when its
    // already-reduced data frame was supplied
    val vizImages = Seq(Some(bar),
      if (trendDays.isEmpty) None else Some(Charts.trendLine(trendDays)),
      if (histRows.isEmpty) None else Some(Charts.classHistogram(histRows)),
      if (topWords.isEmpty) None else Some(Charts.topWordsBar(topWords)),
      if (cloudWords.isEmpty) None else Some(Charts.wordCloud(cloudWords))
    ).flatten
    Seq(
      Section("Table of Contents",
        toc.zipWithIndex.map { case (t, i) => s"${i + 1}. $t" }),
      Section("Executive Summary", Seq(
        s"Source: ${s("source_info")}",
        s"Total comments analyzed: ${s("total_comments")}",
        s"Positive: ${s("positive_cnt")} (${s("positive_pct")}%)",
        s"Negative: ${s("negative_cnt")} (${s("negative_pct")}%)",
        s"Neutral: ${s("neutral_cnt")} (${s("neutral_pct")}%)")),
      Section("Methodology", Seq(
        "Sentiment classification over the ingested corpus with " +
          "confidence thresholding; class shares, representative and " +
          "highest-confidence exemplars, and the insurance risk formula " +
          "are computed from the scored table.")),
      Section("Visualizations", Seq(
        "Sentiment distribution, daily event trend, per-class " +
          "confidence histogram, top words and word frequencies, " +
          "rendered from the report aggregates:"),
        vizImages),
      Section("Comment Analysis Methodology", Seq(
        "Representative comment per class = nearest to the class mean " +
          "confidence (ties to lower id); highest confidence per class " +
          "= argmax confidence (ties to lower id). Texts truncated at " +
          "300 characters.")),
      Section("Representative Comments",
        cls("rep_positive", "POSITIVE") ++ cls("rep_negative", "NEGATIVE") ++
          cls("rep_neutral", "NEUTRAL")),
      Section("Highest Confidence Comments",
        cls("hc_positive", "POSITIVE") ++ cls("hc_negative", "NEGATIVE") ++
          cls("hc_neutral", "NEUTRAL")),
      Section("LLM Summaries", Seq(
        s"Positive basis: ${s("summary_positive_basis")}",
        s"Negative basis: ${s("summary_negative_basis")}",
        "Summary generation is the external-LLM seam; the bases above " +
          "are the evidence the generator consumes.")),
      Section("Recommendations", Seq(
        "Derived from the class balance and the summary bases above " +
          "(the recommendation prompt is the l2_reco_prompt entry).")),
      Section("Insurance Risk Assessment", Seq(
        s"Insurance cost: ${s("insurance_cost")}",
        s"Risk level: ${s("risk_level")} (score ${s("risk_score")})",
        s"Multipliers: sentiment ${s("sentiment_multiplier")}, " +
          s"confidence ${s("confidence_multiplier")}, " +
          s"sample ${s("sample_multiplier")}, trend ${s("trend_multiplier")}",
        s"Trend status: ${s("trend_status")}")),
      Section("Technical Details", Seq(
        s"Total samples: ${s("total_comments")}",
        s"Average confidence: ${d("avg_confidence")}")))
  }

  /** Render the `Serving.reportDocument` frame to a PDF file — the S11
    * sink. The frame is one row by construction (assert, not assume). */
  def writeReportPdf(report: DataFrame, path: String,
                     company: String = "graft",
                     trends: Option[DataFrame] = None,
                     histogram: Option[DataFrame] = None,
                     topWords: Option[DataFrame] = None,
                     cloudWords: Option[DataFrame] = None): Array[Byte] = {
    val rows = report.collect()
    require(rows.length == 1, s"report frame must be one row, got ${rows.length}")
    // chart inputs are the ALREADY-AGGREGATED oracled frames — O(days)/
    // O(bins)/O(top-k) rows, the same reductions the reference plots
    // (a4 trends, a7b histogram, a8 top words, a8b wordcloud words):
    // the driver-side collect here is report-sized, never corpus-sized
    val days = trends.toSeq.flatMap(_.select("date", "total").collect()
      .map(r => (r.getString(0), r.getLong(1))))
    val hist = histogram.toSeq.flatMap(_.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    def wordRows(df: Option[DataFrame]): Seq[(String, Long)] =
      df.toSeq.flatMap(_.select("word", "cnt").collect()
        .map(r => (r.getString(0), r.getLong(1))))
    val bytes = renderSections(company, "Sentiment Analysis Report",
      reportSections(rows(0), days, hist, wordRows(topWords),
        wordRows(cloudWords)))
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val tmp = new java.io.File(path + ".tmp")
    java.nio.file.Files.write(tmp.toPath, bytes)
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    bytes
  }

  // ------------------------------------------------------------------
  // Parse-back helpers (spec-facing): enough of a PDF reader to verify
  // the writer against its own bytes — the RiffWav interop posture,
  // minus an external library to interop with.
  // ------------------------------------------------------------------

  /** All text-show operands `Td (...) Tj` in document order, unescaped
    * (the `Td ` anchor keeps accidental byte coincidences inside the
    * compressed image streams out). */
  private[graft] def extractTextLines(pdf: Array[Byte]): Seq[String] = {
    val txt = new String(pdf, "ISO-8859-1")
    val re = "Td \\(((?:[^()\\\\]|\\\\.)*)\\) Tj".r
    re.findAllMatchIn(txt).map { m =>
      m.group(1)
        .replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")
    }.toSeq
  }

  /** Verify the xref table: every recorded offset must be the exact
    * byte position of its `i 0 obj` header, and startxref must point at
    * the `xref` keyword. The offsets are the part of the format a
    * hand-rolled writer most easily gets wrong, and exactly what a
    * conforming reader navigates by. */
  private[graft] def xrefValid(pdf: Array[Byte]): Boolean = {
    val txt = new String(pdf, "ISO-8859-1")
    // LAST match: binary image streams could in principle contain the
    // keyword bytes; the real startxref is always in the trailer
    val sx = "startxref\\n(\\d+)\\n".r.findAllMatchIn(txt).toSeq.lastOption
      .map(_.group(1).toInt).getOrElse(return false)
    if (!txt.startsWith("%PDF-1.4\n") || !txt.regionMatches(sx, "xref", 0, 4))
      return false
    val entries = "\\n(\\d{10}) 00000 n ".r.findAllMatchIn(txt.substring(sx))
      .map(_.group(1).toInt).toSeq
    entries.nonEmpty && entries.zipWithIndex.forall { case (off, i) =>
      txt.regionMatches(off, s"${i + 1} 0 obj", 0, s"${i + 1} 0 obj".length)
    }
  }
}
