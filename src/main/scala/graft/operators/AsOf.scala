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

  /** Interpolating as-of join: for each left row, linearly interpolate
    * the right-side `valCol` between the surrounding observations of the
    * same key — the sensor/feature enrichment that plain as-of rounds
    * down. Semantics per left time t: both neighbors present → linear
    * interpolation between (pt, pv) and (nt, nv); only earlier → pv;
    * only later → nv; a right row exactly at t → its value (the backward
    * neighbor, degenerate lerp). Neither → null.
    *
    * Same scalable union-tag shape as [[asOfJoin]] (ONE shuffle on the
    * key, one sort), with a second mirrored window for the forward
    * neighbor: `last(ignoreNulls)` backward fill + `first(ignoreNulls)`
    * forward fill over the SAME sort order — no extra shuffle, no row
    * explosion, skew-safe. Right rows at equal (key, time) tie-break by
    * value on both windows, so the result is deterministic. `timeCol`
    * must be NUMERIC (convert timestamps with `unix_micros` first — the
    * [[asOfJoin]] call-site convention): the lerp fraction is exact long
    * arithmetic. Emitted as `outName` (double, ROUND(6)). */
  def interpJoin(left: DataFrame, right: DataFrame, keyCol: String,
                 timeCol: String, valCol: String,
                 outName: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val taken = (leftCols ++ right.columns).toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(!taken(_)).get
    val tagC = fresh("__it_tag")
    val rvC = fresh("__it_v")
    val l = left
      .withColumn(tagC, lit(1)).withColumn(rvC, lit(null).cast("double"))
    val r = right
      .select(col(keyCol), col(timeCol), lit(0).as(tagC),
        col(valCol).cast("double").as(rvC))
    val unioned = l.select((Seq(col(keyCol), col(timeCol), col(tagC), col(rvC)) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    val usC = timeCol
    // right rows at equal time sort BEFORE left rows (tag 0 < 1): the
    // backward window is inclusive of them, the forward window (starting
    // at the left row itself) excludes them — so an exact-time match
    // resolves through the backward branch, never a 0/0 lerp
    val ord = Seq(col(usC), col(tagC), col(rvC))
    val back = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(0, Window.unboundedFollowing)
    // pt/nt guard on the VALUE being non-null too, so a null-valued right
    // row can never desynchronize the (time, value) neighbor pair
    val isObs = col(tagC) === 0 && col(rvC).isNotNull
    val pv = last(col(rvC), ignoreNulls = true).over(back)
    val pt = last(when(isObs, col(usC)), ignoreNulls = true).over(back)
    val nv = first(col(rvC), ignoreNulls = true).over(fwd)
    val nt = first(when(isObs, col(usC)), ignoreNulls = true).over(fwd)
    val lerp = when(pv.isNull, nv)
      .when(nv.isNull || pt === col(usC), pv)
      .otherwise(pv + (nv - pv) *
        (col(usC) - pt).cast("double") / (nt - pt).cast("double"))
    unioned
      .withColumn(outName, round(lerp, 6))
      .filter(col(tagC) === 1)
      .select(leftCols.map(col) :+ col(outName): _*)
  }
}
