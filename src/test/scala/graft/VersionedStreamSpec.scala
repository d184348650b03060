package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[TableSink.startStreamVersioned]]: streaming ingest through the
  * versioned manifest protocol — each micro-batch is ONE snapshot, so
  * time travel / changelog / catalog reads work on a live streaming
  * table, and checkpoint replays are EXACTLY-ONCE via the txn line the
  * commit embeds in its claimed snapshot. */
class VersionedStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wh = TestSpark.tmpDir("vstream_wh")

  private def mkSink(name: String): TableSink =
    new TableSink(SinkConfig(tableName = name, warehousePath = wh,
      batchIntervalSeconds = 1, versioned = true,
      partitionSpec = Seq(PartitionField("cat", Transform.Identity))))

  test("each micro-batch commits one snapshot: time travel + changelog " +
    "work on a live streaming table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sink = mkSink("vs_t1")
    val src = MemoryStream[(Long, String, Double)]
    val q = sink.startStreamVersioned(
      src.toDF().toDF("id", "cat", "v"),
      checkpointLocation = TestSpark.tmpDir("vs_t1_cp"))
    try {
      src.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable()
      src.addData((3L, "a", 3.0))
      q.processAllAvailable()
      val vs = sink.snapshotVersions()
      assert(vs.size >= 2, s"one snapshot per non-empty micro-batch: $vs")
      assert(sink.readVersion(spark, vs.head).count() == 2,
        "the first batch is time-travelable while the stream runs")
      assert(sink.readVersion(spark, vs.last).count() == 3)
      // row-level CDC over the streamed commits
      val changes = sink.readChangelog(spark, 0, vs.last)
      assert(changes.where($"_change_type" === "insert").count() == 3)
    } finally q.stop()
  }

  test("a replayed batch id is skipped before staging — exactly-once") {
    val sink = mkSink("vs_t2")
    val b1 = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v")
    val b2 = Seq((3L, "a", 3.0)).toDF("id", "cat", "v")
    assert(sink.appendStreamBatch(b1, "streamA", 0L))
    assert(sink.appendStreamBatch(b2, "streamA", 1L))
    // crash-replay of batch 1 (and an ancient batch 0): both no-ops
    assert(!sink.appendStreamBatch(b2, "streamA", 1L))
    assert(!sink.appendStreamBatch(b1, "streamA", 0L))
    assert(sink.read(spark).count() == 3, "no duplicate rows")
    assert(sink.snapshotVersions() == Seq(1, 2), "no duplicate snapshots")
    // a DIFFERENT stream's ids are independent
    assert(sink.appendStreamBatch(b1, "streamB", 0L))
    assert(sink.read(spark).count() == 5)
    assert(sink.snapshotVersions() == Seq(1, 2, 3))
  }

  test("restart from the checkpoint does not re-commit the last batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sink = mkSink("vs_t3")
    val cp = TestSpark.tmpDir("vs_t3_cp")
    val src = MemoryStream[(Long, String, Double)]
    val df = src.toDF().toDF("id", "cat", "v")
    val q1 = sink.startStreamVersioned(df, cp, streamId = Some("vs3"))
    try {
      src.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    val n1 = sink.read(spark).count()
    // restart on the same checkpoint: MemoryStream re-offers its data,
    // the checkpoint replays the batch — the txn line must absorb it
    val q2 = sink.startStreamVersioned(df, cp, streamId = Some("vs3"))
    try {
      src.addData((3L, "a", 3.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = sink.read(spark).select($"id").as[Long].collect().sorted
    assert(n1 == 2 && rows.sameElements(Array(1L, 2L, 3L)),
      s"replayed batch must not double-land: ${rows.toSeq}")
  }

  test("startStreamVersioned refuses unversioned configs; batch append " +
    "and streaming commits interleave on one table") {
    val flat = new TableSink(SinkConfig("vs_flat", wh))
    intercept[IllegalArgumentException](
      flat.startStreamVersioned(spark.range(1).toDF(), "/tmp/x"))
    val sink = mkSink("vs_mix")
    assert(sink.appendStreamBatch(
      Seq((1L, "a", 1.0)).toDF("id", "cat", "v"), "s", 0L))
    sink.append(Seq((2L, "b", 2.0)).toDF("id", "cat", "v"))
    assert(sink.appendStreamBatch(
      Seq((3L, "a", 3.0)).toDF("id", "cat", "v"), "s", 1L))
    assert(sink.snapshotVersions() == Seq(1, 2, 3),
      "batch and streaming commits share one optimistic log")
    assert(sink.read(spark).count() == 3)
  }
}
