package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — the scale path for joining points to
  * intervals when there is NO equi key to shuffle on.
  *
  * A naive formulation (`points JOIN intervals ON ts BETWEEN start AND
  * end`) has no equi-join key, so Spark plans a broadcast nested loop —
  * O(|points| x |intervals|) compares and a broadcast requirement on one
  * side. This operator manufactures the equi key: quantize the time axis
  * into fixed-width buckets, explode each interval to every bucket it
  * overlaps, map each point to its single containing bucket, hash-join on
  * the bucket id, then apply the exact range predicate. Each (point,
  * interval) match is produced exactly once — a point lives in exactly one
  * bucket — so no post-join dedup is needed.
  *
  * Cost: shuffle of |points| + |intervals| x avg-buckets-per-interval
  * rows. `bucketWidth` tunes the trade: near the median interval length,
  * intervals explode to ~2 buckets while each bucket pairs points only
  * with intervals actually near them. This is the standard bucketed
  * range-join scheme (Spark has no native range-join strategy; engines
  * that do — e.g. the Databricks range-join hint — implement exactly
  * this binning underneath).
  */
object RangeJoin {

  /** Join `points` (with a long `pointTs` column) to `intervals` (with
    * long `[startCol, endCol]` columns, start <= end, end inclusive) on
    * containment. All three columns are integral (e.g. epoch micros);
    * bucket arithmetic uses integer `DIV` so there is no floating-point
    * boundary risk at epoch magnitudes. */
  def bucketedIntervalJoin(points: DataFrame, intervals: DataFrame,
                           pointTs: String, startCol: String, endCol: String,
                           bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals.withColumn("__bkt",
      explode(sequence(
        expr(s"`$startCol` DIV ${bucketWidth}L"),
        expr(s"`$endCol` DIV ${bucketWidth}L"))))
    val pt = points.withColumn("__bkt", expr(s"`$pointTs` DIV ${bucketWidth}L"))
    pt.join(iv, Seq("__bkt"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bkt")
  }

  /** Reference formulation for tests: the same join as a broadcast
    * nested-loop theta join. Correct at any size, quadratic at scale —
    * kept only to property-check [[bucketedIntervalJoin]]. */
  def naiveIntervalJoin(points: DataFrame, intervals: DataFrame,
                        pointTs: String, startCol: String, endCol: String): DataFrame =
    points.join(intervals,
      col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
}
