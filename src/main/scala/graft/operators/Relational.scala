package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational showcase queries over the TPC-H-ish fixtures.
  *
  * The reference connector has no joins/aggregations/windows of its own
  * (SURVEY.md §2.5); these queries exercise the Spark built-ins the engine
  * composes with, and double as the benchmark headliners.
  *
  * Float-determinism convention (for DuckDB oracle hash-parity): monetary
  * aggregates are summed as exact DECIMAL(18,2) and cast to DOUBLE only at
  * the end, so Spark and the oracle produce bit-identical doubles regardless
  * of accumulation order. Averages are exact-sum / count in double space.
  */
object Relational {

  /** sum an exact-decimal view of a 2-dp double column, emit double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** TPC-H Q1-style pricing summary (agg over ~all of lineitem). */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
    val price = $"l_extendedprice".cast("decimal(18,2)")
    val disc = $"l_discount".cast("decimal(18,2)")
    val tax = $"l_tax".cast("decimal(18,2)")
    l.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(price * (lit(1).cast("decimal(18,2)") - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1).cast("decimal(18,2)") - disc) * (lit(1).cast("decimal(18,2)") + tax))
          .cast("double").as("sum_charge"),
        (sum($"l_quantity".cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum($"l_extendedprice".cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style shipping priority: 3-way join, revenue top-10.
    * customer grows with scale factor, so no forced broadcast hint — AQE
    * picks a broadcast join while the filtered side fits under
    * autoBroadcastJoinThreshold and falls back to shuffle join at scale;
    * orders⋈lineitem shuffles on the join key only after both sides are
    * filtered.
    */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" < lit("1995-03-15").cast("timestamp"))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")
    val l = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" > lit("1995-03-15").cast("timestamp"))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val revenue = ($"l_extendedprice".cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum(revenue).as("rev_exact"))
      .orderBy($"rev_exact".desc, $"l_orderkey")
      .limit(10)
      .select($"l_orderkey", $"o_orderdate",
        $"rev_exact".cast("double").as("revenue"))
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(rev_exact AS DOUBLE) AS revenue
      |FROM (
      |  SELECT l_orderkey, o_orderdate,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev_exact
      |  FROM customer, orders, lineitem
      |  WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |    AND l_orderkey = o_orderkey
      |    AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |    AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |  GROUP BY l_orderkey, o_orderdate
      |  ORDER BY rev_exact DESC, l_orderkey LIMIT 10)
      |ORDER BY revenue DESC, l_orderkey""".stripMargin

  /** Window-function showcase: top-3 orders per customer by price, with
    * deterministic (price desc, orderkey) tie-break.
    */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    o.select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rk".cast("long").as("rk"))
      .orderBy($"o_custkey", $"rk")
  }

  val topOrdersPerCustomerSql: String =
    """SELECT o_custkey, o_orderkey, CAST(rk AS BIGINT) AS rk FROM (
      |  SELECT o_custkey, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** Analytic-function breadth: lag, ntile, and a bounded moving-frame
    * aggregate (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — the frame
    * semantics row_number alone doesn't exercise. The frame sum is exact
    * decimal then cast, and the ordering carries an orderkey tie-break, so
    * every column is deterministic and oracle-checkable. */
  def windowAnalytics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    val frame = w.rowsBetween(-2, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey",
        lag($"o_orderkey", 1).over(w).as("prev_order"),
        sum($"o_totalprice".cast("decimal(18,2)")).over(frame)
          .cast("double").as("moving_total"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val windowAnalyticsSql: String =
    """SELECT o_custkey, o_orderkey,
      |  lag(o_orderkey) OVER w AS prev_order,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_total,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Rollup aggregation (grouping-sets family) over orders. */
  def orderRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    o.rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val orderRollupSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** CUBE aggregation — all grouping sets of (status, priority). */
  def orderCube(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val orderCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS with `grouping()` provenance flags — the
    * general form [[orderRollup]]/[[orderCube]] specialize: an arbitrary
    * subset of grouping combinations (here (status, priority), (status),
    * (priority), ()) computed in ONE pass with `grouping()` columns
    * disambiguating a grouped-out NULL from a data NULL. One Expand +
    * one shuffle, exactly like rollup/cube — no per-set rescan. */
  def orderGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupingSets(
        Seq(Seq($"o_orderstatus", $"o_orderpriority"), Seq($"o_orderstatus"),
          Seq($"o_orderpriority"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(grouping($"o_orderstatus").cast("long").as("g_status"),
        grouping($"o_orderpriority").cast("long").as("g_priority"),
        count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy($"g_status", $"g_priority",
        $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val orderGroupingSetsSql: String =
    """SELECT CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |  (o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_priority,
      |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** TPC-H Q5-style local-supplier revenue: 5-way join through the full
    * star schema (region→nation→{customer,supplier}→orders→lineitem).
    * region and nation are fixed-cardinality (5/25 rows at any SF) →
    * forced broadcast; customer is SF-proportional, so its join is left
    * to AQE (broadcast while small, shuffle join at scale).
    */
  def localSupplierRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val r = Tables.region(spark, sfDir)
    val n = Tables.nation(spark, sfDir).join(broadcast(r),
      $"n_regionkey" === $"r_regionkey")
    val c = Tables.customer(spark, sfDir).join(broadcast(n),
      $"c_nationkey" === $"n_nationkey")
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir)
    val revenue = $"l_extendedprice".cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  val localSupplierRevenueSql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** TPC-H Q6-style forecasting revenue change: the selective-scan
    * aggregate — every predicate reaches the parquet scan as a pushed
    * filter, no shuffle at all until the single-row aggregate.
    */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
    l.filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
        $"l_discount".cast("decimal(18,2)"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val forecastRevenueSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q10-style returned-item revenue: which customers returned the
    * most value. Filter on the fact side reaches the scan; the customer
    * join carries no forced hint (SF-proportional — AQE decides). */
  def returnedItemRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir).filter($"l_returnflag" === "R")
    val o = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
    val c = Tables.customer(spark, sfDir).select($"c_custkey", $"c_name")
    val revenue = $"l_extendedprice".cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name")
      .agg(sum(revenue).as("rev_exact"), count(lit(1)).as("n_items"))
      .orderBy($"rev_exact".desc, $"c_custkey")
      .limit(20)
      .select($"c_custkey", $"c_name", $"rev_exact".cast("double").as("revenue"),
        $"n_items")
  }

  val returnedItemRevenueSql: String =
    """SELECT c_custkey, c_name, CAST(rev_exact AS DOUBLE) AS revenue, n_items
      |FROM (
      |  SELECT c_custkey, c_name,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev_exact,
      |    COUNT(*) AS n_items
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE l_returnflag = 'R'
      |  GROUP BY c_custkey, c_name
      |  ORDER BY rev_exact DESC, c_custkey LIMIT 20)
      |ORDER BY revenue DESC, c_custkey""".stripMargin

  /** TPC-H Q12-style shipping-priority counts by order priority class. */
  def shipModePriority(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_linestatus")
    val o = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_orderpriority")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  val shipModePrioritySql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Semi/anti join showcase: customers with vs without any order (EXISTS /
    * NOT EXISTS). Both sides broadcast the key set at real scale when the
    * dim is small; here the semi/anti hash join needs only the key column.
    */
  def semiAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).select($"o_custkey")
    val withOrders = c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .select(lit("with_orders").as("status"), $"c_custkey")
    val withoutOrders = c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select(lit("no_orders").as("status"), $"c_custkey")
    withOrders.unionAll(withoutOrders)
      .groupBy($"status").agg(count(lit(1)).as("n"))
      .orderBy($"status")
  }

  val semiAntiJoinSql: String =
    """SELECT status, COUNT(*) AS n FROM (
      |  SELECT 'with_orders' AS status, c_custkey FROM customer c
      |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  UNION ALL
      |  SELECT 'no_orders' AS status, c_custkey FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
      |GROUP BY status ORDER BY status""".stripMargin

  /** Outer join + distinct aggregation: per-customer order stats including
    * order-less customers (the LEFT OUTER + countDistinct surface). */
  def outerJoinStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir).select($"c_custkey", $"c_mktsegment")
    val o = Tables.orders(spark, sfDir)
    c.join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_mktsegment")
      .agg(countDistinct($"c_custkey").as("n_customers"),
        count($"o_orderkey").as("n_orders"),
        countDistinct($"o_orderpriority").as("n_priorities"))
      .orderBy($"c_mktsegment")
  }

  val outerJoinStatsSql: String =
    """SELECT c_mktsegment,
      |  COUNT(DISTINCT c_custkey) AS n_customers,
      |  COUNT(o_orderkey) AS n_orders,
      |  COUNT(DISTINCT o_orderpriority) AS n_priorities
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Set-operation showcase: users who clicked INTERSECT/EXCEPT purchased
    * (distinct set semantics — the reference's branch split is disjoint
    * partitioning, these are the real relational set ops).
    */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    def users(t: String) = e.filter($"event_type" === t).select($"user_id")
    val both = users("click").intersect(users("purchase"))
      .select(lit("click_and_purchase").as("cohort"), $"user_id")
    val onlyClick = users("click").except(users("purchase"))
      .select(lit("click_only").as("cohort"), $"user_id")
    both.unionAll(onlyClick).orderBy($"cohort", $"user_id")
  }

  val setOpsSql: String =
    """SELECT 'click_and_purchase' AS cohort, user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |UNION ALL
      |SELECT 'click_only' AS cohort, user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |ORDER BY cohort, user_id""".stripMargin
}
