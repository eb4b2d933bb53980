package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for drivers and tests. */
object Sessions {
  /** RocksDB state store provider class — the streaming-state posture for
    * large state (SCALE.md "Streaming state at scale"): state lives
    * off-heap/on-disk per task instead of in executor heap, with
    * changelog checkpointing for fault tolerance. The default HDFS-backed
    * store holds every version of every key in an in-memory map — fine
    * for the bench's bounded-state queries, an OOM risk when
    * watermark × rate pushes state past executor memory. */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Builds a local session with the engine's required configs:
    *  - shuffle partitions sized to the local cores (not the 200 default);
    *  - AQE on (runtime coalescing / skew handling — the 100 TB posture);
    *  - UTC session time zone (oracle parity);
    *  - legacy nanos-as-long parquet read (events.ts is TIMESTAMP(NANOS),
    *    which Spark cannot model natively; [[Tables.events]] converts);
    *  - optional RocksDB streaming state store via
    *    `SPARK_GRAFT_STATESTORE=rocksdb` (state-store providers are
    *    per-query-checkpoint, so flipping it never changes results —
    *    StreamsSpec pins batch equivalence under both providers).
    */
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val withState = sys.env.get("SPARK_GRAFT_STATESTORE") match {
      case Some("rocksdb") => builder
        .config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
        // changelog checkpointing ships per-batch deltas instead of full
        // RocksDB snapshots — the recommended posture for large state
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      case _ => builder
    }
    val spark = withState.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
