package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Ingest normalization: `events.ts` arrives as parquet TIMESTAMP(NANOS)
  * (read as a nano LONG under nanosAsLong), as a proper TIMESTAMP, or as
  * tz-naive TIMESTAMP_NTZ (duckdb-written parquet) — all three must load
  * to the same microsecond TIMESTAMP column. */
class TablesSpec extends SparkSpec {

  test("events loader normalizes nano-long, timestamp, and NTZ inputs identically") {
    val base = Tables.events(spark, sf0001)
    assert(base.schema("ts").dataType == TimestampType)
    val want = base.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").limit(50).collect().map(r => (r.getLong(0), r.getLong(1)))

    // NTZ round-trip: write the same events with a tz-naive ts, reload
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ntz = Tables.events(spark, dir)
    assert(ntz.schema("ts").dataType == TimestampType)
    val got = ntz.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").limit(50).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(want))

    // raw long nanos (what nanosAsLong yields for TIMESTAMP(NANOS) files)
    val raw = spark.read.parquet(s"/root/testdata/sf0.001/events.parquet")
    assert(raw.schema("ts").dataType == LongType) // precondition of the nanos path
  }
}
