package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extended TPC-H-adapted relational coverage (Q4/Q7/Q8/Q13/Q14/Q15/Q17/
  * Q18/Q19/Q22 shapes, adapted to the reduced fixture schema — no partsupp,
  * no l_commitdate/l_receiptdate/l_shipmode, no c_phone/p_container).
  *
  * Exercises the remaining classic relational surfaces: correlated EXISTS,
  * bidirectional nation-pair joins, market-share ratio aggregates,
  * outer-join histograms, conditional-ratio aggregates, subquery-max,
  * correlated-average filters, IN-subquery with HAVING, disjunctive
  * multi-predicate scans, and anti-join + scalar-subquery threshold.
  *
  * Same float-determinism convention as [[Relational]]: monetary sums go
  * through DECIMAL(18,2) then cast to DOUBLE, ratios divide two exact sums
  * in double space (both engines perform the identical single rounding).
  *
  * Scale notes: only fixed-cardinality legs (nation: 25 rows, region: 5
  * rows, single-row scalar aggregates) carry a forced broadcast hint.
  * customer/supplier/part grow with scale factor, so their joins carry no
  * hint — AQE broadcasts them while they fit under
  * autoBroadcastJoinThreshold and falls back to a shuffle join at 100 TB,
  * where a forced hint would OOM the driver. Correlated subqueries are
  * rewritten as aggregate-then-join (no per-row re-scan, which is the only
  * plan that survives 100 TB).
  */
object RelationalExt {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private val one = lit(1).cast("decimal(18,2)")
  private def revenue: Column = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))

  /** Q4: order-priority checking — orders in a quarter-year window with at
    * least one line item shipped >60 days after the order date (correlated
    * EXISTS → left-semi join with an inequality condition). */
  def orderPriorityCheck(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_shipdate")
    o.join(l, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val orderPriorityCheckSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q7: volume shipping between two nations, by direction and year —
    * the same fact scan feeds both (supplier-nation, customer-nation)
    * directions through two broadcast nation legs. */
  def nationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n1 = Tables.nation(spark, sfDir)
      .select($"n_nationkey".as("s_nkey"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .select($"n_nationkey".as("c_nkey"), $"n_name".as("cust_nation"))
    val s = Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_nationkey")
    val c = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
    val o = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
    val l = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(s, $"l_suppkey" === $"s_suppkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"s_nationkey" === $"s_nkey")
      .join(broadcast(n2), $"c_nationkey" === $"c_nkey")
      .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
        ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1") ||
        ($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_4") ||
        ($"supp_nation" === "NATION_4" && $"cust_nation" === "NATION_3"))
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(sum(revenue).cast("double").as("volume"), count(lit(1)).as("n_items"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val nationVolumeSql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(volume_exact AS DOUBLE) AS volume, n_items
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS volume_exact,
      |    COUNT(*) AS n_items
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |      OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_4')
      |      OR (n1.n_name = 'NATION_4' AND n2.n_name = 'NATION_3'))
      |  GROUP BY 1, 2, 3)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8: market share of one supplier nation within a customer region for
    * PROMO-type parts, by year — conditional-sum / total-sum ratio of two
    * exact decimal aggregates, single double division at the end. */
  def marketShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val r = Tables.region(spark, sfDir).filter($"r_name" === "ASIA")
    val nC = Tables.nation(spark, sfDir).join(broadcast(r),
      $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("c_nkey"))
    val nS = Tables.nation(spark, sfDir)
      .select($"n_nationkey".as("s_nkey"), $"n_name".as("supp_nation"))
    val c = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
    val s = Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_nationkey")
    val p = Tables.part(spark, sfDir).filter($"p_type" === "PROMO")
      .select($"p_partkey")
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val l = Tables.lineitem(spark, sfDir)
    l.join(p, $"l_partkey" === $"p_partkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(nC), $"c_nationkey" === $"c_nkey")
      .join(s, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nS), $"s_nationkey" === $"s_nkey")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(
        (sum(when($"supp_nation" === "NATION_3", revenue)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(revenue).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_year")
  }

  val marketShareSql: String =
    """SELECT o_year,
      |  CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS mkt_share,
      |  n_items
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    SUM(CASE WHEN n2.n_name = 'NATION_3'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_rev,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev,
      |    COUNT(*) AS n_items
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY 1)
      |ORDER BY o_year""".stripMargin

  /** Q13: customer order-count distribution — outer join with an ON-clause
    * filter, two-level aggregation (per-customer count → histogram). */
  def orderDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir).select($"c_custkey")
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" =!= "5-LOW")
      .select($"o_custkey", $"o_orderkey")
    val perCust = c.join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val orderDistributionSql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q14: promo revenue percentage — conditional ratio over one month. */
  def promoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, sfDir).select($"p_partkey", $"p_type")
    val l = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
    l.join(p, $"l_partkey" === $"p_partkey")
      .agg(
        (sum(when($"p_type" === "PROMO", revenue)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") * 100 /
          sum(revenue).cast("double")).as("promo_pct"),
        count(lit(1)).as("n_items"))
  }

  val promoRevenueSql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  /** Q15: top supplier(s) — revenue per supplier over a quarter, keep the
    * max (scalar-subquery max against the same aggregate, exact decimal
    * comparison so ties are well-defined). */
  def topSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val l = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
    val rev = l.groupBy($"l_suppkey")
      .agg(sum(revenue).as("total_exact"))
    // the scalar max rides a global window over the per-supplier aggregate
    // (supplier-cardinality rows — tiny), so lineitem is scanned ONCE; a
    // separate agg + rejoin would scan the fact table twice
    val s = Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_name")
    rev.withColumn("mx", max($"total_exact").over(Window.partitionBy()))
      .filter($"total_exact" === $"mx")
      .join(s, $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        $"total_exact".cast("double").as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  val topSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_exact
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_exact AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_exact = (SELECT MAX(total_exact) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q17: small-quantity-order revenue — line items under half the part's
    * average quantity, for one brand. The correlated per-part average is an
    * aggregate-then-broadcast-join (never a per-row subquery re-scan); the
    * threshold is exact-sum/count so the inequality is bit-deterministic. */
  def smallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(spark, sfDir).filter($"p_brand" === "Brand#1")
      .select($"p_partkey")
    val l = Tables.lineitem(spark, sfDir)
    // per-part average as a window over the single filtered scan — one
    // lineitem pass and one shuffle on l_partkey (an aggregate-then-rejoin
    // would scan the fact table twice)
    val w = Window.partitionBy($"l_partkey")
    l.join(p, $"l_partkey" === $"p_partkey")
      .withColumn("avg_qty",
        sum(dec($"l_quantity")).over(w).cast("double") /
          count(lit(1)).over(w))
      .filter($"l_quantity" < $"avg_qty" * 0.5)
      .agg(dsumOf($"l_extendedprice").as("total_price"),
        count(lit(1)).as("n_items"))
  }

  private def dsumOf(c: Column): Column = sum(dec(c)).cast("double")

  val smallQtyRevenueSql: String =
    """WITH lp AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#1'),
      |aq AS (
      |  SELECT l_partkey AS ak,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lp GROUP BY 1)
      |SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  COUNT(*) AS n_items
      |FROM lp JOIN aq ON l_partkey = ak
      |WHERE l_quantity < avg_qty * 0.5""".stripMargin

  /** Q18: large-volume orders — IN-subquery with HAVING over an exact
    * decimal sum; the same pre-aggregated key set then rejoins the star. */
  def largeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
    val big = l.groupBy($"l_orderkey".as("bk"))
      .agg(sum(dec($"l_quantity")).as("sum_qty_exact"))
      .filter($"sum_qty_exact" > lit(150).cast("decimal(18,2)"))
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir).select($"c_custkey", $"c_name")
    o.join(big, $"o_orderkey" === $"bk")
      .join(c, $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        $"o_orderdate", $"o_totalprice",
        $"sum_qty_exact".cast("double").as("sum_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(20)
  }

  val largeOrdersSql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(sum_qty_exact AS DOUBLE) AS sum_qty
      |FROM (
      |  SELECT l_orderkey AS bk,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_exact
      |  FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150) big
      |JOIN orders ON o_orderkey = bk
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Q19: disjunctive predicate revenue — three OR'd brand/size/quantity
    * predicate bundles evaluated in one scan (no union of three scans). */
  def disjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, sfDir).select($"p_partkey", $"p_brand", $"p_size")
    val l = Tables.lineitem(spark, sfDir)
    l.join(p, $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
          $"l_quantity".between(1, 20)) ||
        ($"p_brand" === "Brand#2" && $"p_size".between(10, 30) &&
          $"l_quantity".between(10, 30)) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(20, 50) &&
          $"l_quantity".between(20, 40)))
      .agg(sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val disjunctiveRevenueSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  /** Q22: well-funded idle customers — account balance above the positive
    * average (scalar subquery, exact-sum/count threshold) with no RECENT
    * orders (anti join; every fixture customer has *some* order, so the
    * date-filtered variant keeps the anti-join non-vacuous), grouped by a
    * nation-derived code. */
  def idleCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
      .select($"o_custkey")
    val avgBal = c.filter($"c_acctbal" > 0.0)
      .agg((sum(dec($"c_acctbal")).cast("double") / count(lit(1))).as("ab"))
    c.join(broadcast(avgBal), $"c_acctbal" > $"ab")
      .join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy(($"c_nationkey" % 5).cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        dsumOf($"c_acctbal").as("totacctbal"))
      .orderBy($"cntrycode")
  }

  val idleCustomersSql: String =
    """SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
      |  COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q9 (product-type profit), adapted: no partsupp in the fixture, so
    * supply cost is approximated by `p_retailprice · l_quantity` — the
    * five-table star join and its plan shape (fact shuffles once; every
    * dimension joins on its own key; only the 25-row nation leg is
    * hint-broadcast) are the point, not the costing model. */
  def productProfit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val amount = (revenue - dec($"p_retailprice") * dec($"l_quantity"))
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter($"p_name".contains("red"))
        .select($"p_partkey", $"p_retailprice"),
        $"l_partkey" === $"p_partkey")
      .join(Tables.supplier(spark, sfDir)
        .select($"s_suppkey", $"s_nationkey"), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(spark, sfDir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.nation(spark, sfDir)),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy($"nation", $"o_year")
  }

  val productProfitSql: String =
    """SELECT n_name AS nation,
      |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |    - CAST(p_retailprice AS DECIMAL(18,2))
      |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q21 (suppliers who kept orders waiting), adapted: the fixture has no
    * l_commitdate/l_receiptdate, so "waiting" becomes: in a multi-supplier
    * order, THIS supplier was the unique latest shipper. Same relational
    * skeleton as the original — EXISTS (another supplier) + NOT EXISTS
    * (another equally-late supplier) — rewritten as aggregate-then-join:
    * per-(order, supplier) max ship date, per-order max + supplier count,
    * then the at-max count distinguishes the unique-latest case. Every
    * stage before the supplier name join is keyed on l_orderkey (one
    * shuffle, reused); the supplier join is keyed s_suppkey and unhinted
    * (SF-proportional). Final ranking is TakeOrdered top-10. */
  def lateSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val perSupp = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"l_shipdate").as("m"))
    // OPTIMIZATION r14 (guide §2.4): the aggregate-then-join cascade
    // (perOrder / atMax / nAtMax / blamed) referenced perSupp four times,
    // so the plan scanned lineitem 4× and repeated the (orderkey, suppkey)
    // aggregate 4× across 24 exchanges. One window pass over perSupp
    // computes the same three per-order facts behind a single exchange:
    // ordered by m DESC, the row at rn=1 is the latest supplier, it is
    // UNIQUELY latest iff the next row ships strictly earlier
    // (lead/lag-free: the full-frame count gives n_supp, and with rn=1
    // the "next" value is just the second-largest m — read via the
    // 1-row-following frame max). Identical blame set: rn=1 ∧ n_supp≥2 ∧
    // next_m < m  ⟺  m = max ∧ n_supp≥2 ∧ |at-max| = 1.
    val wo = Window.partitionBy($"l_orderkey").orderBy($"m".desc)
    val flagged = perSupp
      .withColumn("rn", row_number().over(wo))
      .withColumn("next_m", lead($"m", 1).over(wo))
      .withColumn("n_supp", count(lit(1)).over(
        Window.partitionBy($"l_orderkey")
          .orderBy($"m".desc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val blamed = flagged
      .filter($"rn" === 1 && $"n_supp" >= 2 && $"next_m" < $"m")
    val counts = blamed
      .join(Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_name"),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name".asc).limit(10)
    val w = Window.partitionBy().orderBy($"numwait".desc, $"s_name".asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .select($"rank", $"s_name", $"numwait")
  }

  val lateSuppliersSql: String =
    """WITH per_supp AS (
      |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS m
      |  FROM lineitem GROUP BY 1, 2),
      |per_order AS (
      |  SELECT l_orderkey, max(m) AS mx, count(*) AS n_supp
      |  FROM per_supp GROUP BY 1),
      |at_max AS (
      |  SELECT p.l_orderkey, p.l_suppkey, o.n_supp
      |  FROM per_supp p JOIN per_order o USING (l_orderkey)
      |  WHERE p.m = o.mx),
      |n_at_max AS (
      |  SELECT l_orderkey, count(*) AS n_max FROM at_max GROUP BY 1),
      |counts AS (
      |  SELECT s_name, count(*) AS numwait
      |  FROM at_max a JOIN n_at_max USING (l_orderkey)
      |  JOIN supplier ON a.l_suppkey = s_suppkey
      |  WHERE a.n_supp >= 2 AND n_max = 1
      |  GROUP BY 1
      |  ORDER BY numwait DESC, s_name LIMIT 10)
      |SELECT CAST(row_number() OVER (ORDER BY numwait DESC, s_name)
      |    AS BIGINT) AS rank, s_name, numwait
      |FROM counts ORDER BY rank""".stripMargin
}
