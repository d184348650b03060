package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val o = Tables.orders(spark, TestSpark.sfDir)
      val l = Tables.lineitem(spark, TestSpark.sfDir)
        .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
      Bucketing.writeBucketed(o, "orders_b", "o_orderkey")
      Bucketing.writeBucketed(l, "lineitem_b", "o_orderkey")
      val joined = Bucketing.colocatedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it is still correct
      val n = joined.count()
      val want = o.join(l, "o_orderkey").count()
      assert(n == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
