package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.plans.VectorExpressions

class VectorExpressionsSpec extends SparkSpec {

  test("native dot/norm agree bit-exactly with HOF expression and UDF forms") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), Similarity.toDoubleArray(col("embedding")).as("v"))
      .withColumn("w", reverse(col("v")))
    val diffs = e.select(
      (VectorExpressions.dotNative(col("v"), col("w")) -
        Similarity.dot(col("v"), col("w"))).as("d1"),
      (VectorExpressions.dotNative(col("v"), col("w")) -
        Similarity.dotUdf(col("v"), col("w"))).as("d2"),
      (VectorExpressions.l2NormNative(col("v")) -
        Similarity.normUdf(col("v"))).as("d3"))
      .agg(sum(abs(col("d1"))), sum(abs(col("d2"))), sum(abs(col("d3"))))
      .collect()(0)
    assert(diffs.getDouble(0) == 0.0 && diffs.getDouble(1) == 0.0 && diffs.getDouble(2) == 0.0)
  }

  test("native expressions run inside whole-stage codegen") {
    val e = Tables.embeddings(spark, sf0001)
      .select(Similarity.toDoubleArray(col("embedding")).as("v"))
      .select(VectorExpressions.dotNative(col("v"), col("v")).as("d"))
    // evaluate first so the executed-plan string reflects final stages
    // whatever the plan shape (harmless on the current plain load)
    e.collect()
    // the `*(n)` prefix marks a WholeStageCodegen stage; the graft_dot
    // projection must carry it (CodegenFallback expressions don't)
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_dot.*"), plan)
    // and they evaluate correctly through the generated path
    assert(e.agg(min(col("d"))).collect()(0).getDouble(0) > 0.0)
  }

  test("null semantics match the zip_with/aggregate twins: null element or length mismatch -> NULL") {
    val rows = spark.sql(
      """SELECT v, w FROM VALUES
        |  (array(1.0d, 2.0d), array(3.0d, 4.0d)),
        |  (array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)),
        |  (array(1.0d, 2.0d), array(3.0d)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(3.0d)) AS t(v, w)""".stripMargin)
    val both = rows.select(
      graft.plans.VectorExpressions.dotNative(col("v"), col("w")).as("native"),
      Similarity.dot(col("v"), col("w")).as("hof"),
      graft.plans.VectorExpressions.l2NormNative(col("v")).as("nnative"),
      Similarity.norm(col("v")).as("nhof")).collect()
    for (r <- both) {
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
      assert(r.isNullAt(2) == r.isNullAt(3), r.toString)
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3))
    }
    assert(both.count(_.isNullAt(0)) == 3) // null element, length mismatch, null array
  }

  test("SQL type check: wrong-typed input raises AnalysisException, not a runtime cast error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect()
    }
    assert(e.getMessage.contains("graft_dot") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("SQL registration via SparkSessionExtensions: graft_dot / graft_l2norm / graft_shingles") {
    // no manual register(): Sessions.local wires graft.GraftExtensions
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_l2norm(array(3.0d, 4.0d)) AS n").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    val sh = spark.sql("SELECT graft_shingles(array('a','b','c','b','c'), 2) AS s")
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c b"))
    // the pushdown fence is SQL-reachable too, and is a value identity
    assert(spark.sql("SELECT graft_no_pushdown(1 + 1) AS v").collect()(0).getInt(0) == 2)
  }

  test("graft_nearest_cell: argmax cosine, ties to lowest cell, sentinel on empty") {
    // unit x along e1 vs centroids on e1 (cells 0 and 2, tied) and e2
    // (cell 1, orthogonal): best = cell 0 (lowest of the tied pair)
    val r = spark.sql(
      """SELECT graft_nearest_cell(array(1.0d, 0.0d), 1.0d, array(
        |  named_struct('cell', 0L, 'cv', array(2.0d, 0.0d), 'cnrm', 2.0d),
        |  named_struct('cell', 1L, 'cv', array(0.0d, 1.0d), 'cnrm', 1.0d),
        |  named_struct('cell', 2L, 'cv', array(1.0d, 0.0d), 'cnrm', 1.0d))) AS b""".stripMargin)
      .collect()(0).getStruct(0)
    assert(r.getLong(0) == 0L && r.getDouble(1) == 1.0)
    // empty centroid array -> the (-1, -2.0) sentinel
    val s = spark.sql(
      """SELECT graft_nearest_cell(array(1.0d), 1.0d,
        |  CAST(array() AS array<struct<cell:bigint, cv:array<double>, cnrm:double>>)) AS b""".stripMargin)
      .collect()(0).getStruct(0)
    assert(s.getLong(0) == -1L && s.getDouble(1) == -2.0)
  }

  test("noPush: value identity (incl. nulls), flagged nondeterministic, codegen passthrough") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, length}
    val df = Seq(Some("abc"), Some(""), None).toDF("t")
    // identity on values and nulls, through the codegen'd path
    val got = df.select(VectorExpressions.noPush(length(col("t")) > 1).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(got.toSeq == Seq(true, false, null))
    // the whole point: the wrapped expression reports nondeterministic,
    // so the optimizer refuses to move predicates containing it
    val expr = org.apache.spark.sql.graftbridge.ColumnBridge.expression(
      VectorExpressions.noPush(col("t") === "abc"))
    assert(!expr.deterministic)
  }
}
