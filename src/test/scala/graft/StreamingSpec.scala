package graft

import graft.streaming.StreamOps

class StreamingSpec extends SparkSpec {

  test("stateful sessionization emits exactly the closed sessions") {
    val gap = 30L * 60 * 1000 * 1000 * 1000 // 30 min in ns
    val streamed = StreamOps.runToBatch(spark,
      StreamOps.sessionize(StreamOps.eventsStream(spark, sf), gap).toDF(),
      mode = "append")
      .collect().map(_.toSeq).toSet
    val batchAll = StreamOps.sessionizeBatch(Tables.events(spark, sf), gap)
    // streaming append mode holds back each user's final open session
    val lastEnd = batchAll.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("end_ns").as("end_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val closed = batchAll.collect().map(_.toSeq)
      .filterNot(r => lastEnd.contains((r(0).asInstanceOf[Long], r(2).asInstanceOf[Long])))
      .toSet
    assert(streamed.nonEmpty)
    assert(streamed == closed)
  }

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
