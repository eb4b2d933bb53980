package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (SURVEY §7.3:
  * preference order (b) — a custom `Expression` with `doGenCode` beats a
  * Scala UDF beats interpreted higher-order functions).
  *
  * Semantics are the exact ascending left fold used everywhere else
  * (`Similarity.dot`/`dotFast`, DuckDB `list_reduce`), so all three
  * implementations are bit-identical. Unlike the UDF, these participate
  * in whole-stage codegen: no Scala-function dispatch, no
  * `Seq[Double]` materialization per row — the generated loop reads the
  * unsafe array buffers directly.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // null also on length mismatch / null element (see nullSafeEval), so the
  // result can be null even when both inputs are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got (${l.sql}, ${r.sql})")
    }

  // Null semantics mirror the composed twin
  // `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`:
  // zip_with pads the shorter array with null and a null product nulls the
  // running sum, so a length mismatch or any null element yields NULL.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = $a.numElements();
         |double ${ev.value}_acc = 0.0;
         |if ($b.numElements() != ${ev.value}_n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |    if ($a.isNullAt(${ev.value}_i) || $b.isNullAt(${ev.value}_i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    ${ev.value}_acc += $a.getDouble(${ev.value}_i) * $b.getDouble(${ev.value}_i);
         |  }
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm with the same fold order as [[DotProduct]]. */
case class L2Norm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2norm"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }

  // Null semantics mirror `sqrt(aggregate(transform(a, x -> x * x), 0.0,
  // (acc, v) -> acc + v))`: any null element nulls the sum.
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i); acc += v * v; i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |int ${ev.value}_n = $a.numElements();
         |double ${ev.value}_acc = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  if ($a.isNullAt(${ev.value}_i)) { ${ev.isNull} = true; break; }
         |  double ${ev.value}_v = $a.getDouble(${ev.value}_i);
         |  ${ev.value}_acc += ${ev.value}_v * ${ev.value}_v;
         |}
         |${ev.value} = java.lang.Math.sqrt(${ev.value}_acc);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2NormNative(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))

  /** SQL registration: `graft_dot(a, b)`, `graft_l2norm(a)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2norm", exprs => L2Norm(exprs.head), "built-in")
  }
}
