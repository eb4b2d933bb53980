package graft.operators

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage

/** Chart rendering for the report PDF — the reference's visualization
  * section (`pdf_sections.create_visualizations_section` embeds
  * matplotlib PNGs; this container has no plotting library, so the
  * charts are drawn directly with the JDK's headless `Graphics2D`
  * raster and embedded into the PDF as raw RGB image XObjects by
  * [[Pdf]]).
  *
  * Determinism scope: rasterization (including text) is deterministic
  * WITHIN a JVM (PdfSpec pins double-render byte equality); across
  * JVMs/font stacks glyph rasters may differ, which is why no oracle
  * or golden-byte test covers chart pixels — the structural PDF tests
  * (xref, round-trip of the embedded RGB buffer) are JVM-independent.
  *
  * Driver-side by design, like [[Pdf]]: inputs are the already-reduced
  * O(1) report aggregates, never corpus rows. */
object Charts {

  private val Bg = Color.WHITE
  private val Axis = new Color(60, 60, 60)
  private val ClassColors = Map(
    "POSITIVE" -> new Color(46, 125, 50),
    "NEGATIVE" -> new Color(183, 28, 28),
    "NEUTRAL" -> new Color(117, 117, 117))

  private def canvas(w: Int, h: Int): (BufferedImage, Graphics2D) = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    // no antialiasing: hard pixel edges keep the raster simple and the
    // in-JVM double-render equality trivially stable
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_OFF)
    g.setColor(Bg); g.fillRect(0, 0, w, h)
    g.setFont(new Font("SansSerif", Font.PLAIN, 12))
    (img, g)
  }

  /** Sentiment distribution bar chart: one bar per class, count label
    * above each bar, percent under the class name. */
  def sentimentBar(classes: Seq[(String, Long, String)],
                   w: Int = 480, h: Int = 280): BufferedImage = {
    val (img, g) = canvas(w, h)
    val maxCnt = math.max(1L, classes.map(_._2).max)
    val plotTop = 30; val plotBottom = h - 40
    val plotH = plotBottom - plotTop
    val slot = w / math.max(1, classes.length)
    g.setColor(Axis)
    g.drawLine(10, plotBottom, w - 10, plotBottom) // x axis
    for (((cls, cnt, pct), i) <- classes.zipWithIndex) {
      val barW = slot * 6 / 10
      val x = i * slot + (slot - barW) / 2
      val barH = (cnt * plotH / maxCnt).toInt
      g.setColor(ClassColors.getOrElse(cls, Axis))
      g.fillRect(x, plotBottom - barH, barW, barH)
      g.setColor(Axis)
      g.drawString(cnt.toString, x, plotBottom - barH - 6)
      g.drawString(cls, x, plotBottom + 16)
      g.drawString(s"$pct%", x, plotBottom + 32)
    }
    g.dispose()
    img
  }

  /** Daily total-events line chart over the trends frame's (date,
    * total) rows, with min/max gridline labels and first/last date
    * ticks. */
  def trendLine(days: Seq[(String, Long)],
                w: Int = 480, h: Int = 280): BufferedImage = {
    val (img, g) = canvas(w, h)
    val left = 50; val right = w - 15; val top = 20; val bottom = h - 35
    g.setColor(Axis)
    g.drawLine(left, top, left, bottom)
    g.drawLine(left, bottom, right, bottom)
    if (days.nonEmpty) {
      val maxV = math.max(1L, days.map(_._2).max)
      val n = days.length
      def px(i: Int): Int =
        if (n == 1) (left + right) / 2
        else left + (right - left) * i / (n - 1)
      def py(v: Long): Int = bottom - ((bottom - top) * v / maxV).toInt
      g.setColor(new Color(21, 101, 192))
      g.setStroke(new BasicStroke(2f))
      for (i <- 1 until n)
        g.drawLine(px(i - 1), py(days(i - 1)._2), px(i), py(days(i)._2))
      g.setColor(Axis)
      g.drawString(maxV.toString, 8, top + 5)
      g.drawString("0", 8, bottom + 5)
      g.drawString(days.head._1, left, bottom + 16)
      val last = days.last._1
      g.drawString(last, right - 7 * last.length, bottom + 16)
    }
    g.dispose()
    img
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
}
