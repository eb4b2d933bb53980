package graft.operators

import java.awt.image.BufferedImage

/** Chart rendering for the report PDF — the reference's visualization
  * section (`pdf_sections.create_visualizations_section` embeds
  * matplotlib PNGs; this container has no plotting library, so the
  * charts are rasterized here and embedded into the PDF as image
  * XObjects by [[Pdf]]).
  *
  * Determinism: the raster is byte-identical across runs AND across
  * JVMs/hosts. Nothing here touches the java2d pipeline — no
  * `Graphics2D`, no font stack, no stroking engine. Every mark is
  * pure integer arithmetic over the pixel array: axis-aligned fills,
  * Bresenham polylines with a square stamp for stroke width, and a
  * hand-rolled 5×7 bitmap font ([[Glyphs]]) for all labels. PdfSpec
  * pins a golden SHA-256 over a full rendered report on the strength
  * of this (the round-13 renderer used `SansSerif` glyphs, which made
  * chart bytes a function of the host font stack and golden-byte
  * tests impossible).
  *
  * Driver-side by design, like [[Pdf]]: inputs are the already-reduced
  * O(1) report aggregates, never corpus rows. */
object Charts {

  private val Bg = 0xFFFFFF
  private val Axis = 0x3C3C3C // rgb(60,60,60)
  private val Trend = 0x1565C0 // rgb(21,101,192)
  private val ClassColors = Map(
    "POSITIVE" -> 0x2E7D32, // rgb(46,125,50)
    "NEGATIVE" -> 0xB71C1C, // rgb(183,28,28)
    "NEUTRAL" -> 0x757575) // rgb(117,117,117)

  /** Glyph pixel scale: a 5×7 glyph renders 10×14 px, readable at the
    * charts' 480×280 canvas. Advance = 6 columns (5 + 1 gap). */
  private val TextScale = 2

  /** Pixel width of a rendered label (used for right-alignment). */
  private[operators] def textWidth(s: String): Int =
    if (s.isEmpty) 0 else s.length * 6 * TextScale - TextScale

  /** Deterministic integer raster over a `TYPE_INT_RGB` image — the
    * entire drawing surface; no `createGraphics()` anywhere. */
  private final class Raster(val w: Int, val h: Int) {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    fillRect(0, 0, w, h, Bg)

    def fillRect(x: Int, y: Int, rw: Int, rh: Int, rgb: Int): Unit = {
      var yy = math.max(0, y); val y1 = math.min(h, y + rh)
      while (yy < y1) {
        var xx = math.max(0, x); val x1 = math.min(w, x + rw)
        while (xx < x1) { img.setRGB(xx, yy, rgb); xx += 1 }
        yy += 1
      }
    }

    /** Bresenham segment stamped with a t×t square at each step — the
      * stroke-width substitute; pure integer, no java2d stroking. */
    def line(x0: Int, y0: Int, xe: Int, ye: Int, t: Int, rgb: Int): Unit = {
      val dx = math.abs(xe - x0); val sx = if (x0 < xe) 1 else -1
      val dy = -math.abs(ye - y0); val sy = if (y0 < ye) 1 else -1
      var err = dx + dy; var x = x0; var y = y0
      var done = false
      while (!done) {
        fillRect(x, y, t, t, rgb)
        if (x == xe && y == ye) done = true
        else {
          val e2 = 2 * err
          if (e2 >= dy) { err += dy; x += sx }
          if (e2 <= dx) { err += dx; y += sy }
        }
      }
    }

    /** Draw `s` with the bitmap font; `y` is the BASELINE (the glyph
      * box spans `[y - 7*scale, y - scale)`), matching the
      * `drawString` contract the chart layouts were designed against. */
    def text(s: String, x: Int, y: Int, rgb: Int): Unit =
      textScaled(s, x, y, TextScale, rgb)

    /** [[text]] at an explicit glyph pixel scale — the word-frequency
      * raster sizes words by count with this. */
    def textScaled(s: String, x: Int, y: Int, scale: Int, rgb: Int): Unit = {
      var cx = x
      for (c <- s) {
        val rows = Glyphs.of(c)
        var r = 0
        while (r < 7) {
          var col = 0
          while (col < 5) {
            if (((rows(r) >> (4 - col)) & 1) == 1)
              fillRect(cx + col * scale, y - (7 - r) * scale,
                scale, scale, rgb)
            col += 1
          }
          r += 1
        }
        cx += 6 * scale
      }
    }
  }

  /** Sentiment distribution bar chart: one bar per class, count label
    * above each bar, percent under the class name. */
  def sentimentBar(classes: Seq[(String, Long, String)],
                   w: Int = 480, h: Int = 280): BufferedImage = {
    val ra = new Raster(w, h)
    val maxCnt = math.max(1L, classes.map(_._2).max)
    val plotTop = 30; val plotBottom = h - 40
    val plotH = plotBottom - plotTop
    val slot = w / math.max(1, classes.length)
    ra.fillRect(10, plotBottom, w - 20, 1, Axis) // x axis
    for (((cls, cnt, pct), i) <- classes.zipWithIndex) {
      val barW = slot * 6 / 10
      val x = i * slot + (slot - barW) / 2
      val barH = (cnt * plotH / maxCnt).toInt
      ra.fillRect(x, plotBottom - barH, barW, barH,
        ClassColors.getOrElse(cls, Axis))
      ra.text(cnt.toString, x, plotBottom - barH - 6, Axis)
      ra.text(cls, x, plotBottom + 16, Axis)
      ra.text(s"$pct%", x, plotBottom + 32, Axis)
    }
    ra.img
  }

  /** Daily total-events line chart over the trends frame's (date,
    * total) rows, with min/max gridline labels and first/last date
    * ticks. */
  def trendLine(days: Seq[(String, Long)],
                w: Int = 480, h: Int = 280): BufferedImage = {
    val ra = new Raster(w, h)
    val left = 50; val right = w - 15; val top = 20; val bottom = h - 35
    ra.fillRect(left, top, 1, bottom - top, Axis) // y axis
    ra.fillRect(left, bottom, right - left, 1, Axis) // x axis
    if (days.nonEmpty) {
      val maxV = math.max(1L, days.map(_._2).max)
      val n = days.length
      def px(i: Int): Int =
        if (n == 1) (left + right) / 2
        else left + (right - left) * i / (n - 1)
      def py(v: Long): Int = bottom - ((bottom - top) * v / maxV).toInt
      for (i <- 1 until n)
        ra.line(px(i - 1), py(days(i - 1)._2), px(i), py(days(i)._2), 2, Trend)
      ra.text(maxV.toString, 8, top + 5, Axis)
      ra.text("0", 8, bottom + 5, Axis)
      ra.text(days.head._1, left, bottom + 16, Axis)
      val last = days.last._1
      ra.text(last, right - textWidth(last), bottom + 16, Axis)
    }
    ra.img
  }

  /** Per-class confidence histogram — the reference's "Confidence
    * Distribution by Sentiment" overlaid hist (`vizualization.py:
    * 287-297`, bins=20 per class), rendered as GROUPED bars (side-by-
    * side per bin) because flat-color rasters have no alpha blending.
    * `rows` is the `a7b_histogram_per_group` frame: (class, bin, cnt);
    * bins are the per-class equi-width indices, classes are drawn in
    * fixed POSITIVE/NEGATIVE/NEUTRAL legend order (extras appended
    * sorted — deterministic for any input). */
  def classHistogram(rows: Seq[(String, Long, Long)],
                     w: Int = 480, h: Int = 280): BufferedImage = {
    val ra = new Raster(w, h)
    val classOrder = {
      val fixed = Seq("POSITIVE", "NEGATIVE", "NEUTRAL")
      val present = rows.map(_._1).distinct
      fixed.filter(present.contains) ++ present.filterNot(fixed.contains).sorted
    }
    val left = 40; val right = w - 12; val top = 34; val bottom = h - 24
    ra.fillRect(left, top, 1, bottom - top, Axis)
    ra.fillRect(left, bottom, right - left, 1, Axis)
    // legend: colored swatch + class name across the top
    var lx = left
    for (cls <- classOrder) {
      ra.fillRect(lx, 8, 10, 10, ClassColors.getOrElse(cls, Trend))
      ra.text(cls, lx + 14, 18, Axis)
      lx += 14 + textWidth(cls) + 16
    }
    if (rows.nonEmpty) {
      val nBins = (rows.map(_._2).max + 1).toInt
      val maxCnt = math.max(1L, rows.map(_._3).max)
      val slot = (right - left) / math.max(1, nBins)
      val sub = math.max(1, (slot - 2) / math.max(1, classOrder.length))
      val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
      for (b <- 0 until nBins; (cls, ci) <- classOrder.zipWithIndex) {
        val cnt = byKey.getOrElse((cls, b.toLong), 0L)
        if (cnt > 0) {
          val barH = math.max(1L, cnt * (bottom - top) / maxCnt).toInt
          ra.fillRect(left + 1 + b * slot + ci * sub, bottom - barH, sub, barH,
            ClassColors.getOrElse(cls, Trend))
        }
      }
      ra.text(maxCnt.toString, 4, top + 6, Axis)
      ra.text("0", left, bottom + 16, Axis)
      val lastLbl = (nBins - 1).toString
      ra.text(lastLbl, left + (nBins - 1) * slot, bottom + 16, Axis)
    }
    ra.img
  }

  /** Top-words frequency chart — the reference's per-sentiment "Top
    * Words" bars (`vizualization.py:263-286`, vertical bars with
    * rotated tick labels and count labels). The bitmap font does not
    * rotate, so the bars are HORIZONTAL: word label left, count label
    * at the bar's end — same data, deterministic raster. Caller passes
    * rows already ordered (cnt DESC, word) — the `a8_word_frequency` /
    * `a9_top_words_per_lang` convention; the first `maxRows` render. */
  def topWordsBar(words: Seq[(String, Long)], color: Int = Trend,
                  maxRows: Int = 10, w: Int = 480, h: Int = 280): BufferedImage = {
    val ra = new Raster(w, h)
    val take = words.take(maxRows)
    val labelW = 120; val top = 14; val bottom = h - 10
    ra.fillRect(labelW, top, 1, bottom - top, Axis)
    if (take.nonEmpty) {
      val maxCnt = math.max(1L, take.map(_._2).max)
      val rowH = (bottom - top) / take.length
      val barMax = w - labelW - 60
      for (((word, cnt), i) <- take.zipWithIndex) {
        val y = top + i * rowH
        val barW = math.max(1L, cnt * barMax / maxCnt).toInt
        val label = if (word.length > 9) word.take(9) else word
        ra.text(label, labelW - 6 - textWidth(label), y + rowH / 2 + 7, Axis)
        ra.fillRect(labelW + 1, y + rowH / 5, barW, rowH * 3 / 5, color)
        ra.text(cnt.toString, labelW + 1 + barW + 6, y + rowH / 2 + 7, Axis)
      }
    }
    ra.img
  }

  /** Word-frequency raster standing in for the reference's wordcloud
    * (`vizualization.py:226-245`, `WordCloud(max_words=100,
    * random_state=42)`): same input (the `a8b_wordcloud_words`
    * frequencies), same visual contract (bigger = more frequent), but
    * DETERMINISTIC layout — greedy row packing in (cnt DESC, word)
    * order with glyph scale 1 + ⌊3·cnt/max⌋, colors cycling a fixed
    * 4-color palette by rank. A random-placement cloud can never be
    * byte-pinned; this raster is, and carries the same information. */
  def wordCloud(words: Seq[(String, Long)],
                w: Int = 480, h: Int = 280): BufferedImage = {
    val ra = new Raster(w, h)
    val palette = Array(Trend, ClassColors("POSITIVE"),
      ClassColors("NEGATIVE"), ClassColors("NEUTRAL"))
    if (words.nonEmpty) {
      val maxCnt = math.max(1L, words.map(_._2).max)
      var x = 8; var y = 8; var rowMaxScale = 0
      var i = 0
      val it = words.iterator
      var full = false
      while (it.hasNext && !full) {
        val (word, cnt) = it.next()
        val scale = 1 + (3L * cnt / maxCnt).toInt
        val width = if (word.isEmpty) 0 else word.length * 6 * scale - scale
        if (x + width > w - 8 && x > 8) { // wrap
          y += rowMaxScale * 8 + 4; x = 8; rowMaxScale = 0
        }
        if (y + scale * 8 > h - 4) full = true
        else if (width > 0) {
          ra.textScaled(word, x, y + scale * 7, scale, palette(i % palette.length))
          x += width + 4 * scale
          rowMaxScale = math.max(rowMaxScale, scale)
          i += 1
        }
      }
    }
    ra.img
  }

  /** Row-major RGB24 bytes of a raster — the exact sample layout a PDF
    * `/DeviceRGB /BitsPerComponent 8` image XObject carries. */
  def rgbBytes(img: BufferedImage): Array[Byte] = {
    val out = new Array[Byte](img.getWidth * img.getHeight * 3)
    var i = 0; var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        out(i) = ((p >> 16) & 0xff).toByte
        out(i + 1) = ((p >> 8) & 0xff).toByte
        out(i + 2) = (p & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Palette + 8-bit indexed pixels of a raster — the sample layout of
    * the PDF `/Indexed /DeviceRGB` XObject [[Pdf]] emits. Palette
    * order is first-occurrence scan order (deterministic); charts use
    * a handful of flat colors, so indexed-8 always fits and makes the
    * byte stream run-length-friendly (bars and background become runs
    * of one index byte — the RLE filter then beats Flate on these
    * rasters while staying hand-rolled and zlib-independent). */
  def indexedBytes(img: BufferedImage): (Array[Byte], Array[Byte]) = {
    val idx = new Array[Byte](img.getWidth * img.getHeight)
    val palette = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    var i = 0; var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y) & 0xFFFFFF
        val k = palette.getOrElseUpdate(p, palette.size)
        require(k < 256, "indexed chart raster exceeded 256 colors")
        idx(i) = k.toByte
        i += 1; x += 1
      }
      y += 1
    }
    val pal = new Array[Byte](palette.size * 3)
    for ((rgb, k) <- palette) {
      pal(3 * k) = ((rgb >> 16) & 0xff).toByte
      pal(3 * k + 1) = ((rgb >> 8) & 0xff).toByte
      pal(3 * k + 2) = (rgb & 0xff).toByte
    }
    (pal, idx)
  }
}

/** Hand-rolled 5×7 bitmap font — fixed bit patterns, so label rasters
  * are identical on every JVM and host (the font-stack seam the
  * round-13 `SansSerif` renderer carried). Covers the report charts'
  * alphabet: digits, A–Z, `.` `%` `-` `/` `:` and space; lowercase
  * folds to uppercase; anything else renders a hollow box
  * (deterministic and visibly wrong rather than silently absent). */
private[operators] object Glyphs {
  private def rows(bits: String*): Array[Int] =
    bits.map(Integer.parseInt(_, 2)).toArray

  private val Box = rows("11111", "10001", "10001", "10001", "10001", "10001", "11111")

  private val Defs: Map[Char, Array[Int]] = Map(
    '0' -> rows("01110", "10001", "10011", "10101", "11001", "10001", "01110"),
    '1' -> rows("00100", "01100", "00100", "00100", "00100", "00100", "01110"),
    '2' -> rows("01110", "10001", "00001", "00010", "00100", "01000", "11111"),
    '3' -> rows("11111", "00010", "00100", "00010", "00001", "10001", "01110"),
    '4' -> rows("00010", "00110", "01010", "10010", "11111", "00010", "00010"),
    '5' -> rows("11111", "10000", "11110", "00001", "00001", "10001", "01110"),
    '6' -> rows("00110", "01000", "10000", "11110", "10001", "10001", "01110"),
    '7' -> rows("11111", "00001", "00010", "00100", "01000", "01000", "01000"),
    '8' -> rows("01110", "10001", "10001", "01110", "10001", "10001", "01110"),
    '9' -> rows("01110", "10001", "10001", "01111", "00001", "00010", "01100"),
    'A' -> rows("01110", "10001", "10001", "11111", "10001", "10001", "10001"),
    'B' -> rows("11110", "10001", "10001", "11110", "10001", "10001", "11110"),
    'C' -> rows("01110", "10001", "10000", "10000", "10000", "10001", "01110"),
    'D' -> rows("11100", "10010", "10001", "10001", "10001", "10010", "11100"),
    'E' -> rows("11111", "10000", "10000", "11110", "10000", "10000", "11111"),
    'F' -> rows("11111", "10000", "10000", "11110", "10000", "10000", "10000"),
    'G' -> rows("01110", "10001", "10000", "10111", "10001", "10001", "01111"),
    'H' -> rows("10001", "10001", "10001", "11111", "10001", "10001", "10001"),
    'I' -> rows("01110", "00100", "00100", "00100", "00100", "00100", "01110"),
    'J' -> rows("00111", "00010", "00010", "00010", "00010", "10010", "01100"),
    'K' -> rows("10001", "10010", "10100", "11000", "10100", "10010", "10001"),
    'L' -> rows("10000", "10000", "10000", "10000", "10000", "10000", "11111"),
    'M' -> rows("10001", "11011", "10101", "10101", "10001", "10001", "10001"),
    'N' -> rows("10001", "10001", "11001", "10101", "10011", "10001", "10001"),
    'O' -> rows("01110", "10001", "10001", "10001", "10001", "10001", "01110"),
    'P' -> rows("11110", "10001", "10001", "11110", "10000", "10000", "10000"),
    'Q' -> rows("01110", "10001", "10001", "10001", "10101", "10010", "01101"),
    'R' -> rows("11110", "10001", "10001", "11110", "10100", "10010", "10001"),
    'S' -> rows("01111", "10000", "10000", "01110", "00001", "00001", "11110"),
    'T' -> rows("11111", "00100", "00100", "00100", "00100", "00100", "00100"),
    'U' -> rows("10001", "10001", "10001", "10001", "10001", "10001", "01110"),
    'V' -> rows("10001", "10001", "10001", "10001", "10001", "01010", "00100"),
    'W' -> rows("10001", "10001", "10001", "10101", "10101", "10101", "01010"),
    'X' -> rows("10001", "10001", "01010", "00100", "01010", "10001", "10001"),
    'Y' -> rows("10001", "10001", "10001", "01010", "00100", "00100", "00100"),
    'Z' -> rows("11111", "00001", "00010", "00100", "01000", "10000", "11111"),
    '.' -> rows("00000", "00000", "00000", "00000", "00000", "01100", "01100"),
    '-' -> rows("00000", "00000", "00000", "01110", "00000", "00000", "00000"),
    '%' -> rows("11001", "11010", "00010", "00100", "01000", "01011", "10011"),
    '/' -> rows("00001", "00001", "00010", "00100", "01000", "10000", "10000"),
    ':' -> rows("00000", "01100", "01100", "00000", "01100", "01100", "00000"),
    ' ' -> rows("00000", "00000", "00000", "00000", "00000", "00000", "00000"))

  def of(c: Char): Array[Int] =
    Defs.getOrElse(Character.toUpperCase(c), Box)
}
