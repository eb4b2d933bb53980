package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal

import graft.plans.{DotProduct, L2Norm, NearestCell, NoPushdown, ShingleArray, TopKByScore, VectorSum}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions at session build time
  * (`spark.sql.extensions=graft.GraftExtensions`, set by
  * [[Sessions.local]]). A cluster deployment gets the same functions in
  * every session — including pure-SQL users — without driver-side
  * registration calls. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_l2norm"),
      (exprs: Seq[Expression]) => L2Norm(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleArray].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(toks, Literal(n: Int, _)) => ShingleArray(toks, n)
        case other => throw new IllegalArgumentException(
          "graft_shingles(tokens, n) expects exactly (array<string>, integer literal), " +
            s"got ${other.length} argument(s)")
      }))
    e.injectFunction((
      FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_top_k"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(score, tie, payload, Literal(k: Int, _)) =>
          TopKByScore(score, tie, payload, k).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          "graft_top_k(score, tiebreak, payload, k) expects k as an integer " +
            s"literal, got ${other.length} argument(s)")
      }))
    e.injectFunction((
      FunctionIdentifier("graft_vector_sum"),
      new ExpressionInfo(classOf[VectorSum].getName, "graft_vector_sum"),
      (exprs: Seq[Expression]) => VectorSum(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("graft_nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "graft_nearest_cell"),
      (exprs: Seq[Expression]) => NearestCell(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("graft_no_pushdown"),
      new ExpressionInfo(classOf[NoPushdown].getName, "graft_no_pushdown"),
      (exprs: Seq[Expression]) => NoPushdown(exprs.head)))
  }
}
