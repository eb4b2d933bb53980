package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst handles column
  * pruning and predicate pushdown into the parquet scan — at 100 TB this
  * is the difference between reading one column and reading the table.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** [[documents]] carries an adaptive parallelism floor: the synthetic
    * documents.parquet is a SINGLE parquet row group at every bench SF,
    * so the plain scan is one split and every compute-heavy narrow stage
    * above it (regex/shingle/HOF text analytics, per-token md5, the V4
    * inference seam) ran one-task while the rest of the machine idled —
    * the source of the catalog-wide 4.5-9.5x sf1/sf0.1 band (the Gopher
    * gate alone measured 29.1 → 2.6 s at sf1 from this fix). If the scan
    * already has at least core-count partitions — any production-sized
    * table — the floor is the IDENTITY: no exchange in the plan, 100 TB
    * behavior unchanged. Otherwise: round-robin repartition to
    * defaultParallelism (deterministic under sortBeforeRepartition;
    * filters and column pruning push straight through the exchange — the
    * PlanShapeSpec pushdown/pruning guards pin it).
    *
    * `embeddings` deliberately does NOT get the floor: its entries'
    * heavy stages sit behind shuffles already, several make multiple
    * passes over the table (recall panels, trained-vs-deterministic
    * twins), and the measured effect of fanning it was net-negative
    * (extra AQE stages per pass) — though round 13 re-measured
    * per-operator and moved the scan-compute similarity operators onto
    * [[scanFloor]] individually (see that method's doc). The round-12
    * audio clamp this note once pointed at is GONE: the hand-rolled
    * [[graft.operators.RiffWav]] codec removed the JVM-global provider
    * lock, and audio fans out like the image family. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    scanFloor(load(spark, dir, "documents"))

  /** The adaptive scan-parallelism floor as a reusable transform:
    * round-robin repartition to core count IF the frame's file scan has
    * fewer partitions — the IDENTITY on any production-sized table (no
    * exchange in the plan) and on non-file frames (unit-test DFs, where
    * the probe finds no file scan). Besides the documents loader, the
    * embeddings-scanning operators that are COMPUTE-bound on the scan
    * side (SQ/PQ code scans, cell assignment) apply this to their
    * corpus frame — measured per-operator in SCALE.md round 13; the
    * multi-pass operators where the extra exchange measured
    * net-negative (semDedupAuto) deliberately do not. */
  private[graft] def scanFloor(df: DataFrame): DataFrame = {
    val floor = df.sparkSession.sparkContext.defaultParallelism
    if (scanParallelism(df) >= floor) df else df.repartition(floor)
  }

  /** Scan-task count of a freshly-loaded frame, read off the physical
    * file scan's input RDD — file listing + split arithmetic only, NOT
    * `df.rdd.getNumPartitions`, which converts the whole plan to an RDD
    * lineage (a deserializer stage bolted onto every load just to read
    * a number). A bare parquet load has no exchange, so AQE never wraps
    * it and the `FileSourceScanExec` sits directly in the executed
    * plan; if the plan shape is ever something else, fall back to
    * "already parallel" so the production invariant — no extra exchange
    * on big tables — is preserved. */
  private def scanParallelism(df: DataFrame): Int = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.inputRDDs().map(_.getNumPartitions).sum
    }
    if (scans.isEmpty) Int.MaxValue else scans.sum
  }
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark does not model;
    * sessions set `spark.sql.legacy.parquet.nanosAsLong=true` (see
    * [[Sessions.configure]]) and this loader converts the raw nanos to a
    * microsecond TIMESTAMP so downstream date/window logic is standard. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"), spark)

  /** Normalize an events frame's `ts` to a microsecond TIMESTAMP whatever
    * the physical input type — nano LONG (TIMESTAMP(NANOS) under
    * nanosAsLong), TIMESTAMP_NTZ (tz-naive writers, e.g. duckdb), or
    * already TIMESTAMP. Shared by the batch loader and the streaming
    * reader so both ingest paths agree byte-for-byte. */
  def normalizeTs(raw: DataFrame, spark: SparkSession): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // tz-naive inputs: interpret the wall-clock as UTC INDEPENDENT of
        // the session timezone. A bare cast interprets it in the session
        // zone, silently shifting every event time in externally created
        // non-UTC sessions; the from_utc round-trip cancels that zone
        // offset exactly (a no-op under the Sessions factory's UTC
        // default).
        raw.withColumn("ts", from_utc_timestamp(col("ts").cast("timestamp"),
          spark.conf.get("spark.sql.session.timeZone")))
      case _ => raw
    }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
}
