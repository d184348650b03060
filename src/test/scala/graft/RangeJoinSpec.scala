package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("countWithin counts inclusively at the radius boundary and keeps zero-match probes") {
    val probes = Seq((1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 18:00:00"))).toDF("event_id", "ts")
    val points = Seq(
      ts("2024-01-01 11:30:00"),   // exactly at -radius: inclusive
      ts("2024-01-01 12:29:59"),   // inside
      ts("2024-01-01 12:30:00"),   // exactly at +radius: inclusive
      ts("2024-01-01 12:30:01"),   // just outside
      ts("2024-01-01 06:00:00"))   // far away
      .map(Tuple1(_)).toDF("ts")
    val out = RangeJoin.countWithin(probes, "event_id", "ts", points, "ts",
      radiusMicros = 30L * 60 * 1000 * 1000)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 3L, s"boundary points must count inclusively: $out")
    assert(out(2L) == 0L, "zero-match probe must survive with count 0")
  }

  test("cell-bucketed counts equal the naive range-join on the fixture") {
    val e = Tables.events(spark, TestSpark.sfDir)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"ts")
    val clicks = e.filter($"event_type" === "click").select($"ts".as("cts"))
    val r = 30L * 60 * 1000 * 1000
    val got = RangeJoin.proximityQuery(spark, TestSpark.sfDir)
      .as[(Long, Long)].collect().toMap
    val want = purchases.join(clicks,
        abs(unix_micros($"ts") - unix_micros($"cts")) <= r, "left")
      .groupBy($"event_id").agg(count($"cts").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("plan is an equi-join on the cell id, not a nested-loop range join") {
    val plan = RangeJoin.proximityQuery(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "range predicate must ride an equi-join on the cell, not a nested loop")
  }
}
