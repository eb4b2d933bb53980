package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder

class ZOrderSpec extends SparkSpec {

  test("zorder key: exact interleave on known values") {
    val s = spark
    import s.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(ZOrder.zorderKey(col("x"), col("y"), bits = 4).as("z"))
      .collect().map(_.getLong(0))
    // x bits at even positions, y bits at odd: (5,3)=x101,y011 ->
    // z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 = 1 | 2 | 0 | 8 | 16 = 27
    assert(out.toSeq == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("zorder locality: points in one 2^k-aligned square share the z prefix") {
    val s = spark
    import s.implicits._
    val k = 4 // 16x16 squares
    val pts = for (x <- 0L until 64L by 7L; y <- 0L until 64L by 5L) yield (x, y)
    val rows = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zorderKey(col("x"), col("y")).as("z"),
        ZOrder.zorderKey(
          shiftleft(shiftrightunsigned(col("x"), k), k),
          shiftleft(shiftrightunsigned(col("y"), k), k)).as("zcorner"))
      .collect()
    // the prefix property that makes min/max pruning work: z >> 2k of any
    // point equals z >> 2k of its square's corner
    rows.foreach { r =>
      assert(r.getAs[Long]("z") >> (2 * k) == r.getAs[Long]("zcorner") >> (2 * k),
        s"prefix mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }
}
