package graft

import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile counts rows, nulls, and exact distincts per column") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")),
      (None, Some("b"))).toDF("x", "y")
    val r = Profile.profile(df, Seq("x", "y")).orderBy("col_name")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("x", 4L, 1L, 2L), ("y", 4L, 1L, 2L)), s"got $r")
  }

  test("profile is a single scan: one Expand, no union of per-column jobs") {
    val df = Seq((1, "a", 2.0)).toDF("a", "b", "c")
    val plan = Profile.profile(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Union"), "profiling must not rescan per column")
  }
}
