package graft

import graft.streaming.StreamOps

class StreamingSpec extends SparkSpec {

  test("streaming window agg equals the batch aggregation") {
    val streamed = StreamOps.runToBatch(spark,
      StreamOps.windowAgg(StreamOps.eventsStream(spark, sf)))
      .collect().map(_.toSeq).toSet
    val batch = StreamOps.windowAgg(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
