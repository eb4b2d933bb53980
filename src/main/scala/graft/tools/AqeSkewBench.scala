package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Measurement probe for AQE skew-join handling (SCALE.md): a planted
  * hot key (90% of the fact) joined to a dim under forced sort-merge,
  * with `spark.sql.adaptive.skewJoin.enabled` on vs off — the adaptive
  * counterpart of ev_salted_join's manual fix. Prints one JSON line.
  * Run: `sbt "runMain graft.tools.AqeSkewBench"`. */
object AqeSkewBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "aqe-skew")
    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "4000000").toLong
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    val fact = spark.range(0, n)
      .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 997).as("k"),
        md5(col("id").cast("string")).as("payload"))
    val dim = spark.range(0, 997).select(col("id").as("k"),
      md5(concat(lit("d"), col("id"))).as("name"))

    def run(skewOn: Boolean): (Double, Boolean) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      val t0 = System.nanoTime()
      val q = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("cnt"), max(col("payload")).as("mx"))
      q.collect()
      val t = (System.nanoTime() - t0) / 1e9
      (t, q.queryExecution.executedPlan.toString.contains("skew=true"))
    }
    run(skewOn = true) // warm
    val (tOn, firedOn) = Seq.fill(3)(run(skewOn = true)).minBy(_._1)
    val (tOff, firedOff) = Seq.fill(3)(run(skewOn = false)).minBy(_._1)
    val fmt = (v: Double) => String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"rows":$n,"skew_on_sec":${fmt(tOn)},"skew_on_fired":$firedOn,"skew_off_sec":${fmt(tOff)},"skew_off_fired":$firedOff,"speedup":${fmt(tOff / tOn)}}""")
    spark.stop()
  }
}
