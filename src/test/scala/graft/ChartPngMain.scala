package graft

/** One-off visual check: dumps the two report charts as PNGs under
  * /tmp so the bitmap-font render can be eyeballed. Not a test. */
object ChartPngMain {
  def main(args: Array[String]): Unit = {
    import graft.operators.Charts
    val bar = Charts.sentimentBar(Seq(
      ("POSITIVE", 42L, "42.0"), ("NEGATIVE", 33L, "33.0"), ("NEUTRAL", 25L, "25.0")))
    val line = Charts.trendLine(Seq(
      "2024-01-01" -> 5L, "2024-01-02" -> 9L, "2024-01-03" -> 2L,
      "2024-01-04" -> 7L, "2024-01-05" -> 11L))
    javax.imageio.ImageIO.write(bar, "png", new java.io.File("/tmp/chart_bar.png"))
    javax.imageio.ImageIO.write(line, "png", new java.io.File("/tmp/chart_line.png"))
    println("wrote /tmp/chart_bar.png /tmp/chart_line.png")
  }
}
