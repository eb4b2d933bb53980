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

  /** Adaptive parallelism floor for the COMPUTE-HEAVY tables (documents,
    * embeddings): their few-MB synthetic files are a single parquet row
    * group, so the scan is ONE split and every expensive narrow stage
    * above it (regex/shingle/HOF text analytics, vector norms, the V4
    * inference seam) ran on one core with the rest of the machine idle —
    * measured 29.1 → 2.6 s for the Gopher gate at sf1. When the scan
    * already has at least core-count partitions — every production-sized
    * table — this is the identity: no exchange appears in the plan, so
    * at 100 TB the loaders behave exactly as before. The repartition is
    * round-robin under sortBeforeRepartition (deterministic given scan
    * order), Catalyst pushes filters and column pruning straight through
    * it, and the shuffled payload is by definition a few MB. TPC-H
    * tables keep their natural splits (their entries are scan+agg shapes
    * where an extra exchange only costs). */
  private def withParallelismFloor(spark: SparkSession, df: DataFrame): DataFrame = {
    val floor = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= floor) df else df.repartition(floor)
  }

  def documents(spark: SparkSession, dir: String): DataFrame =
    withParallelismFloor(spark, load(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    withParallelismFloor(spark, load(spark, dir, "embeddings"))
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
