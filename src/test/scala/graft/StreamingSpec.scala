package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming daily windows equal the batch aggregation") {
    val got = StreamPipeline.streamWindowQuery(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = Tables.events(spark, TestSpark.sfDir)
      .groupBy(to_date($"ts").cast("string").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"day", $"event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.sameElements(want))
  }

  test("streaming sink is exactly-once across a checkpointed restart") {
    val cfg = SinkConfig(
      tableName = "events_stream",
      warehousePath = TestSpark.tmpDir("stream_sink"),
      batchIntervalSeconds = 1,
      partitionSpec = Seq(PartitionField("event_type", Transform.Identity)))
    val sink = new TableSink(cfg)
    val cp = TestSpark.tmpDir("stream_cp")
    val src = StreamPipeline.eventsStream(spark, TestSpark.sfDir)

    val q1 = sink.startStream(src, cp)
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = sink.read(spark).count()
    assert(afterFirst == 1000, s"expected all 1000 fixture rows, got $afterFirst")

    // restart on the same checkpoint: nothing new to process, no re-writes
    val q2 = sink.startStream(StreamPipeline.eventsStream(spark, TestSpark.sfDir), cp)
    q2.processAllAvailable()
    q2.stop()
    val afterSecond = sink.read(spark).count()
    assert(afterSecond == afterFirst,
      s"restart duplicated rows: $afterFirst -> $afterSecond")

    // a streaming-sink table refuses batch appends: the _spark_metadata
    // log would hide batch files from readers
    val ex = intercept[IllegalArgumentException] {
      sink.append(Tables.events(spark, TestSpark.sfDir).limit(1))
    }
    assert(ex.getMessage.contains("_spark_metadata"))
  }
}
