package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise vector sum as a native aggregate — the scale-correct
  * embedding pooling reduction (mean/sum-pool chunk vectors to a parent
  * vector).
  *
  * The relational formulation (posexplode → groupBy(group, dim) →
  * collect_list reassembly, [[graft.operators.Similarity.meanPoolEmbeddings]])
  * inflates the shuffle by `dim` rows per vector and pays a per-group
  * sort to reassemble. This aggregate keeps ONE fixed-length
  * `Array[Double]` buffer per group per map task, so partial aggregation
  * reduces the shuffle to one dim-length buffer per (task, group) — the
  * [[TopKByScore]] rationale applied to dense vectors.
  *
  * Null vectors are skipped. All non-null vectors in a group must share
  * one dimensionality; a mismatch fails the task (fail-fast beats a
  * silently ragged sum). Empty/all-null groups evaluate to null.
  *
  * Summation order follows partial/merge scheduling, so the last ulp of
  * each element is run-dependent (exactly like the built-in `avg` over a
  * shuffle) — gate queries round the output (F13). */
case class VectorSum(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "graft_vector_sum"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      buf.add(arr.toDoubleArray())
    }
    buf
  }

  override def merge(a: VecSumBuffer, b: VecSumBuffer): VecSumBuffer = {
    if (b.sums != null) a.add(b.sums)
    a
  }

  override def eval(buf: VecSumBuffer): Any =
    if (buf.sums == null) null else new GenericArrayData(buf.sums.clone())

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      buf.sums.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecSumBuffer
    val n = in.readInt()
    if (n >= 0) {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = in.readDouble(); i += 1 }
      buf.sums = sums
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}

/** Mutable element-wise accumulator: null until the first vector lands. */
final class VecSumBuffer {
  var sums: Array[Double] = _

  def add(v: Array[Double]): Unit = {
    if (sums == null) sums = v.clone()
    else {
      require(sums.length == v.length,
        s"graft_vector_sum: dimension mismatch (${sums.length} vs ${v.length})")
      var i = 0
      while (i < v.length) { sums(i) += v(i); i += 1 }
    }
  }
}

object VectorAgg {
  /** Element-wise sum of `array<double>` vectors per group:
    * `groupBy(g).agg(vectorSum(v))`. */
  def vectorSum(v: Column): Column =
    ColumnBridge.column(
      VectorSum(ColumnBridge.expression(v)).toAggregateExpression())
}
