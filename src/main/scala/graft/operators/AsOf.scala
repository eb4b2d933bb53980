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
    * equal time sort before left rows (i.e. `r.t <= l.t` matches). When
    * the payload type is orderable, ties among right rows at identical
    * (key, time) resolve to the greatest payload value for determinism;
    * non-orderable payloads (e.g. maps) still join, with tie order
    * unspecified. Internal tag/payload columns are freshened against both
    * inputs' columns, so user columns of any name survive untouched. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, payload: Column, asOfName: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val taken = (leftCols ++ right.columns).toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(!taken(_)).get
    val tagC = fresh("__asof_tag")
    val plC = fresh("__asof_pl")
    val plType = right.select(payload).schema.head.dataType
    val l = left.withColumn(tagC, lit(1)).withColumn(plC, lit(null).cast(plType))
    // resolve the payload against the FULL right frame before projecting —
    // selecting (key, time) first would drop the columns a struct payload
    // or any non-time payload references
    val r = right.withColumn(plC, payload)
      .select(col(keyCol), col(timeCol), lit(0).as(tagC), col(plC))
    val unioned = l.select((Seq(col(keyCol), col(timeCol), col(tagC), col(plC)) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    val tieBreak =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(plType))
        Seq(col(plC))
      else Seq.empty
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol) +: col(tagC) +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(asOfName, last(col(plC), ignoreNulls = true).over(w))
      .filter(col(tagC) === 1)
      .select(leftCols.map(col) :+ col(asOfName): _*)
  }
}
