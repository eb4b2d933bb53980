package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — beyond the reference surface, but a core
  * primitive of any event/feature pipeline at scale: for each left row,
  * attach the most recent right-side observation with
  * `right.time <= left.time` for the same key.
  *
  * Spark has no native ASOF JOIN; the naive formulations do not survive
  * 100 TB — a theta join (`l.key = r.key AND r.t <= l.t` + argmax) builds
  * a per-key cross product, and a broadcast-range join needs one side
  * small. This implementation is the scalable union-tag formulation:
  * union both sides, ONE shuffle on the key, one window sort pass, and a
  * `last(payload, ignoreNulls)` forward fill. Cost is O(shuffle(|L|+|R|))
  * regardless of key skew between matches; no row explosion, AQE-friendly.
  */
object AsOf {

  /** Left as-of join. `payload` is the right-side column to carry (use a
    * `struct` to carry several); emitted as `asOfName`. Right rows at
    * equal time sort before left rows (i.e. `r.t <= l.t` matches). Ties
    * among right rows at identical (key, time) resolve to the greatest
    * payload value for determinism. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, payload: Column, asOfName: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("_tag", lit(1)).withColumn("_pl", lit(null).cast(
      right.select(payload).schema.head.dataType))
    // resolve the payload against the FULL right frame before projecting —
    // selecting (key, time) first would drop the columns a struct payload
    // or any non-time payload references
    val r = right.withColumn("_pl", payload)
      .select(col(keyCol), col(timeCol), lit(0).as("_tag"), col("_pl"))
    val unioned = l.select((Seq(col(keyCol), col(timeCol), col("_tag"), col("_pl")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("_tag"), col("_pl"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(asOfName, last(col("_pl"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) :+ col(asOfName): _*)
  }
}
