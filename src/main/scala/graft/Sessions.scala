package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for drivers and tests. */
object Sessions {
  /** Builds a local session with the engine's required configs:
    *  - shuffle partitions sized to the local cores (not the 200 default);
    *  - AQE on (runtime coalescing / skew handling — the 100 TB posture);
    *  - UTC session time zone (oracle parity);
    *  - legacy nanos-as-long parquet read (events.ts is TIMESTAMP(NANOS),
    *    which Spark cannot model natively; [[Tables.events]] converts).
    */
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
