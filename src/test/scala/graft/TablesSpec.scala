package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Ingest normalization: `events.ts` may arrive as parquet
  * TIMESTAMP(NANOS) (read as a nano LONG under nanosAsLong), as a proper
  * TIMESTAMP, or as tz-naive TIMESTAMP_NTZ (duckdb-written parquet) — all
  * three must load to the same microsecond TIMESTAMP column. The driver
  * regenerates testdata between rounds and has shipped both the nano and
  * the NTZ form, so each variant is synthesized here rather than assumed
  * of the testdata files. */
class TablesSpec extends SparkSpec {

  test("events loader normalizes nano-long, timestamp, and NTZ inputs identically") {
    val base = Tables.events(spark, sf0001)
    assert(base.schema("ts").dataType == TimestampType)
    val want = base.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").limit(50).collect().map(r => (r.getLong(0), r.getLong(1)))

    def roundTrip(mutate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Array[(Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_ts").toString
      mutate(base).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val re = Tables.events(spark, dir)
      assert(re.schema("ts").dataType == TimestampType)
      re.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").limit(50).collect().map(r => (r.getLong(0), r.getLong(1)))
    }

    // NTZ writer (what the driver currently generates)
    assert(roundTrip(_.withColumn("ts", col("ts").cast("timestamp_ntz"))).sameElements(want))
    // plain TIMESTAMP writer (already normalized — loader must pass through)
    assert(roundTrip(identity).sameElements(want))
    // nano-LONG writer (TIMESTAMP(NANOS) under nanosAsLong reads as LONG;
    // synthesized as the raw nano count the legacy flag would surface)
    assert(roundTrip(_.withColumn("ts", unix_micros(col("ts")) * 1000L)).sameElements(want))
  }
}
