package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx distinct stays within 5% of exact; quantiles bracket the data") {
    val rows = Sketches.eventSketches(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
      val (p50, p95, p99) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p50 <= p95 && p95 <= p99)
    }
  }

  test("sketchBounds booleans hold (the oracle pins them TRUE)") {
    val rows = Sketches.sketchBounds(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: hll_ok false")
      assert(r.getBoolean(3), s"${r.getString(0)}: q_ok false")
    }
  }

  test("percentile_approx p50 is near the exact median") {
    val exact = Tables.events(spark, TestSpark.sfDir)
      .stat.approxQuantile("value", Array(0.5), 0.0)(0) // rel err 0 = exact
    val approx = Tables.events(spark, TestSpark.sfDir)
      .agg(percentile_approx($"value", lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02)
  }
}
