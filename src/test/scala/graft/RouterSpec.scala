package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RouterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch routing fans records out to per-table sinks completely") {
    val wh = TestSpark.tmpDir("router")
    val e = Tables.events(spark, TestSpark.sfDir)
      .withColumn("dest", when($"value" < 100, "small").otherwise("large"))
    TableRouter.appendRouted(e, "dest",
      t => SinkConfig(tableName = t, warehousePath = wh))
    val small = spark.read.parquet(s"$wh/small")
    val large = spark.read.parquet(s"$wh/large")
    assert(small.count() == e.filter($"value" < 100).count())
    assert(large.count() == e.filter($"value" >= 100).count())
    assert(small.count() + large.count() == 1000)
    assert(!small.columns.contains("dest"), "routing column dropped")
  }

  test("streaming routing fans out per micro-batch with a checkpoint") {
    val wh = TestSpark.tmpDir("router_stream")
    val q = TableRouter.startRoutedStream(
      StreamPipeline.eventsStream(spark, TestSpark.sfDir)
        .withColumn("dest", concat(lit("t_"), $"event_type")),
      "dest",
      t => SinkConfig(tableName = t, warehousePath = wh,
        partitionSpec = Seq(PartitionField("ts", Transform.Day, Some("d")))),
      TestSpark.tmpDir("router_cp"), intervalSeconds = 1)
    q.processAllAvailable()
    q.stop()
    val types = Tables.events(spark, TestSpark.sfDir)
      .select("event_type").distinct().as[String].collect()
    val total = types.map(t => spark.read.parquet(s"$wh/t_$t").count()).sum
    assert(total == 1000)
  }
}
