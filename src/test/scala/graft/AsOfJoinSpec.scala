package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOf picks the greatest build ts <= probe ts per key, inclusive") {
    val probe = Seq((1L, 1L, 10L), (2L, 1L, 5L), (3L, 2L, 7L), (4L, 3L, 1L))
      .toDF("event_id", "k", "t")
    val build = Seq((1L, 5L), (1L, 9L), (1L, 11L), (2L, 7L), (3L, 2L))
      .toDF("k", "t")
    val out = AsOfJoin.asOf(probe, build, "k", "t", "m")
      .select($"event_id", $"m").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) == Some(9L), "9 is the greatest build ts <= 10 (11 is later)")
    assert(out(2L) == Some(5L), "equal timestamps must match (inclusive)")
    assert(out(3L) == Some(7L))
    assert(out(4L) == None, "no build row precedes -> null")
    // probe columns pass through, build contributes nothing else
    val cols = AsOfJoin.asOf(probe, build, "k", "t", "m").columns.toSeq
    assert(cols == Seq("event_id", "k", "t", "m"))
  }

  test("NULL keys never match, per join semantics") {
    val probe = Seq((1L, Option(5L), 10L), (2L, Option.empty[Long], 10L))
      .toDF("event_id", "k", "t")
    val build = Seq((Option(5L), 8L), (Option.empty[Long], 9L)).toDF("k", "t")
    val out = AsOfJoin.asOf(probe, build, "k", "t", "m")
      .select($"event_id", $"m").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) == Some(8L))
    assert(out(2L) == None,
      "a NULL-keyed probe must not match NULL-keyed build rows")
  }

  test("asOf plan is one shuffle + sort, never a range self-join") {
    val plan = AsOfJoin.attributionQuery(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"), "the running-max sweep must be a Window")
  }

  test("attribution matches a per-row subquery reference on the fixture") {
    val e = Tables.events(spark, TestSpark.sfDir)
    val got = AsOfJoin.attributionQuery(spark, TestSpark.sfDir)
      .select($"event_id", $"click_ts")
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    // independent reference: correlated max via a plain aggregate join
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"))
    val want = p.join(c, $"user_id" === $"cu" && $"cts" <= $"ts", "left")
      .groupBy($"event_id").agg(max($"cts").as("click_ts"))
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    assert(got == want)
  }
}
