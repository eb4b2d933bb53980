package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys: bit-interleave two column values so one
  * sort key preserves locality in BOTH dimensions. The multi-column
  * cousin of partitionBy/bucketBy (see SCALE.md storage-layout section):
  * writing a 100 TB table `repartitionByRange(zorder(a, b)).sortWithinPartitions`
  * gives every file a narrow min/max envelope on BOTH a and b, so a
  * range predicate on EITHER column prunes files/row-groups — a plain
  * sort by `a` gives pruning on `a` only.
  *
  * Composed from shift/and/or primitives — whole-stage-codegen'd, and
  * exactly reproducible in SQL for the oracle (same integer ops). */
object ZOrder {

  /** Interleaved key of the low `bits` bits of two non-negative longs:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB twin of [[zorderKey]] (shared with the catalog oracle). */
  def zorderKeySql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
}
