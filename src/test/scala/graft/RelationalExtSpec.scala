package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity assertions for the extended TPC-H-adapted queries; exact values
  * are pinned by the DuckDB oracle harness (tools/check.py), these guard
  * structural invariants at the unit level. */
class RelationalExtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sfDir

  test("Q4 exists-semantics counts each qualifying order once") {
    val out = RelationalExt.orderPriorityCheck(spark, sf)
    val total = out.agg(org.apache.spark.sql.functions.sum($"order_count"))
      .head().getLong(0)
    val direct = Tables.orders(spark, sf)
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
      .count()
    assert(total <= direct, "semi join must not duplicate orders")
    assert(total > 0)
  }

  test("Q8 market share is a valid ratio per year") {
    RelationalExt.marketShare(spark, sf).collect().foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share $share out of range")
    }
  }

  test("Q13 histogram masses sum to the customer count") {
    val out = RelationalExt.orderDistribution(spark, sf)
    val total = out.agg(org.apache.spark.sql.functions.sum($"custdist"))
      .head().getLong(0)
    assert(total == Tables.customer(spark, sf).count())
  }

  test("Q15 returns exactly the argmax supplier(s)") {
    val out = RelationalExt.topSupplier(spark, sf).collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getDouble(2)).toSet
    assert(revs.size == 1, "all returned suppliers must share the max revenue")
  }

  test("Q17 threshold filter keeps a strict subset of brand line items") {
    val n = RelationalExt.smallQtyRevenue(spark, sf).head().getLong(1)
    val all = Tables.lineitem(spark, sf).join(
      Tables.part(spark, sf).filter($"p_brand" === "Brand#1"),
      $"l_partkey" === $"p_partkey").count()
    assert(n > 0 && n < all)
  }

  test("stream-stream join equals the batch time-bounded join") {
    val streamed = StreamPipeline.streamStreamJoin(spark, sf)
      .as[(Long, Long)].collect().toMap
    val e = Tables.events(spark, sf)
    val batch = e.as("a").join(e.as("b"),
        $"a.user_id" === $"b.user_id" &&
          $"a.event_type" === "click" && $"b.event_type" === "purchase" &&
          $"b.ts" >= $"a.ts" &&
          $"b.ts" <= $"a.ts" + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
      .groupBy($"a.user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("streaming dedup emits each (user, type) key exactly once") {
    val out = StreamPipeline.streamDedup(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(out.as[(String, Long)].collect().toMap == batch)
  }
}
