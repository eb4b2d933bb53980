package graft

import graft.streaming.Streams

class StreamsSpec extends SparkSpec {

  test("streaming hourly windows == batch hourly windows") {
    val streamed = Streams.runToCompletion(spark, sf0001, "streams_spec_out")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("st_hourly_windows")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
