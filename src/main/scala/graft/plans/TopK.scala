package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bounded-heap top-k as a native aggregate — the scale-correct per-group
  * top-k (SURVEY §2.5 O4-O7 at 100 TB).
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY s
  * DESC)` + filter) shuffles and sorts EVERY row of every group. This
  * aggregate keeps a k-entry heap per group per map task, so partial
  * aggregation reduces the shuffle to <= k rows per (task, group) and no
  * sort ever sees more than k elements per group. Same reason Spark plans
  * global `ORDER BY+LIMIT` as `TakeOrderedAndProject` — this is the
  * per-group analogue, packaged as a `TypedImperativeAggregate` so the
  * standard hash-aggregate machinery (partial/merge/final, spill-safe
  * serialization) does the orchestration.
  *
  * Ordering is (score DESC, tiebreak ASC) — the mixed-direction
  * deterministic order the oracle queries pin. (Spark's internal
  * `CollectTopK` orders by a single expression in one direction, which
  * cannot express a mixed-direction tiebreak without negation tricks.)
  * Rows with a null score or tiebreak are skipped; the payload may be any
  * data type including structs.
  *
  * Returns `array<payloadType>` sorted by (score DESC, tiebreak ASC).
  */
case class TopKByScore(
    score: Expression, tiebreak: Expression, payload: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with TernaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def first: Expression = score
  override def second: Expression = tiebreak
  override def third: Expression = payload

  override def prettyName: String = "graft_top_k"
  override def dataType: DataType = ArrayType(payload.dataType, payload.nullable)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, tiebreak.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, t) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double score, bigint tiebreak, any payload), " +
          s"got (${s.sql}, ${t.sql})")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val t = tiebreak.eval(input)
    if (s != null && t != null) {
      // copy: the payload may reference the (reused) input row buffer
      val p = InternalRow.copyValue(payload.eval(input))
      buf.offer(s.asInstanceOf[Double], t.asInstanceOf[Long], p)
    }
    buf
  }

  override def merge(a: TopKHeap, b: TopKHeap): TopKHeap = { a.absorb(b); a }

  override def eval(buf: TopKHeap): Any = new GenericArrayData(buf.sortedPayloads)

  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array(payload.dataType))
  @transient private lazy val payloadHolder = new GenericInternalRow(1)

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.entries
    out.writeInt(entries.length)
    entries.foreach { e =>
      out.writeDouble(e.score)
      out.writeLong(e.tie)
      payloadHolder.update(0, e.payload)
      val row = payloadProj(payloadHolder)
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKHeap(k)
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val t = in.readLong()
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      buf.offer(s, t, row.get(0, payload.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKByScore =
    copy(score = newFirst, tiebreak = newSecond, payload = newThird)
}

final case class TopKEntry(score: Double, tie: Long, payload: Any)

/** k-bounded min-heap keyed worst-first: the root is the entry that drops
  * next — lowest score, then HIGHEST tiebreak (since the kept order is
  * score DESC, tiebreak ASC). */
final class TopKHeap(k: Int) {
  import graft.plans.{TopKEntry => Entry}

  private val worstFirst = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.tie, a.tie)
    }
  }
  private val heap = new java.util.PriorityQueue[Entry](k, worstFirst)

  def offer(score: Double, tie: Long, payload: Any): Unit = {
    if (heap.size < k) heap.offer(Entry(score, tie, payload))
    else {
      // total-order comparison, SAME relation as the heap comparator:
      // primitive >/== would disagree with Double.compare on NaN (admitted
      // under capacity, never evicted, always rejected when full →
      // arrival-order-dependent results) and on -0.0 vs 0.0. Under
      // Double.compare NaN sorts greatest — consistent with Spark SQL's
      // ORDER BY semantics.
      val worst = heap.peek()
      val c = java.lang.Double.compare(score, worst.score)
      val better = c > 0 || (c == 0 && tie < worst.tie)
      if (better) { heap.poll(); heap.offer(Entry(score, tie, payload)) }
    }
  }

  def absorb(other: TopKHeap): Unit =
    other.entries.foreach(e => offer(e.score, e.tie, e.payload))

  def entries: Array[Entry] = heap.toArray(Array.empty[Entry])

  /** Payloads in final output order: score DESC, tiebreak ASC — via the
    * same total-order comparator as the heap (NaN-safe). */
  def sortedPayloads: Array[Any] =
    entries.sortWith((a, b) => worstFirst.compare(a, b) > 0).map(_.payload)
}

object TopK {
  /** Per-group top-k payloads ordered by (score DESC, tiebreak ASC):
    * `groupBy(g).agg(topKByScore(score, tie, payload, k))`. */
  def topKByScore(score: Column, tiebreak: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(tiebreak),
        ColumnBridge.expression(payload), k).toAggregateExpression())
}
