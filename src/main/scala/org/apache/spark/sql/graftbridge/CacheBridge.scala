package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Test-visibility shim: `SharedState.cacheManager` is the authoritative
  * registry of DataFrame-level persist()s (RDD localCheckpoint storage is
  * tracked separately and reclaimed by the ContextCleaner). Library
  * operators must leave this registry exactly as they found it — the
  * leak-regression specs assert through here. */
object CacheBridge {
  def noCachedPlans(spark: SparkSession): Boolean =
    spark.asInstanceOf[ClassicSession].sharedState.cacheManager.isEmpty
}
