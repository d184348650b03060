package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The four remaining classic TPC-H shapes (Q2/Q11/Q16/Q20), adapted to the
  * fixture schema. All four originally revolve around `partsupp`, which the
  * fixture does not have, so each derives a virtual part–supplier relation
  * from `lineitem`: `cost(part, supp) = min(l_extendedprice)` (an exact
  * double min — hash-stable across engines) or
  * `qty(part, supp) = sum(l_quantity)` (sums of small integral doubles —
  * exact in any addition order). The *relational shapes* are preserved:
  *
  *  - Q2: correlated scalar-MIN subquery over a restricted supplier set
  *  - Q11: GROUP BY … HAVING > scalar-subquery-fraction-of-global-total
  *  - Q16: COUNT(DISTINCT) with a NOT IN supplier-exclusion subquery
  *  - Q20: nested IN subqueries gated by a fraction-of-aggregate threshold
  *
  * Spark side rewrites every correlated subquery as aggregate-then-join
  * (the only plan that survives 100 TB — no per-row re-scan); the DuckDB
  * oracles keep the textbook correlated/nested-subquery form so the oracle
  * independently exercises the decorrelation the Spark plan hand-rolls.
  *
  * Scale notes: the virtual part–supplier relation aggregates lineitem
  * FIRST (one shuffle with map-side partial aggregation, output bounded by
  * |part|·|supplier-per-part| ≪ |lineitem|), and every later join runs on
  * that reduced relation. Only the fixed-cardinality nation/region legs are
  * hint-broadcast; supplier/part joins are unhinted so AQE broadcasts them
  * while small and falls back to shuffle joins at 100 TB.
  */
object RelationalFull {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Q2 (minimum-cost supplier), adapted: for STANDARD parts in five size
    * buckets, the EUROPE suppliers whose per-part cost equals the per-part
    * minimum over all EUROPE suppliers. Cost = min(l_extendedprice) per
    * (part, supplier). The correlated MIN decorrelates to a per-part
    * window min over the already-aggregated (part, supplier) relation —
    * lineitem is scanned and aggregated ONCE (an aggregate-then-join
    * rewrite would recompute the whole lineitem subtree for the min leg).
    * The part filter semi-reduces the relation BEFORE the window shuffle;
    * that is sound because the filter is per-part, so whole window
    * partitions survive or die together. Window partitions are bounded by
    * suppliers-per-part, so no partition outgrows an executor at 100 TB.
    */
  def minCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val eurNations = Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val eur = Tables.supplier(spark, sfDir)
      .join(broadcast(eurNations), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val cost = Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"l_extendedprice").as("supply_cost"))
    val parts = Tables.part(spark, sfDir)
      .filter($"p_type" === "STANDARD" && $"p_size".isin(5, 15, 25, 35, 45))
      .select($"p_partkey", $"p_name")
    val w = Window.partitionBy($"l_partkey")
    cost.join(eur, $"l_suppkey" === $"s_suppkey")
      .join(parts, $"l_partkey" === $"p_partkey")
      .withColumn("min_cost", min($"supply_cost").over(w))
      .filter($"supply_cost" === $"min_cost")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name",
        $"supply_cost")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  val minCostSupplierSql: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supply_cost
      |  FROM lineitem GROUP BY 1, 2),
      |eur AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
      |FROM part p, eur, cost
      |WHERE p.p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_type = 'STANDARD' AND p_size IN (5, 15, 25, 35, 45)
      |  AND supply_cost = (
      |    SELECT min(c2.supply_cost)
      |    FROM cost c2 JOIN eur e2 ON c2.l_suppkey = e2.s_suppkey
      |    WHERE c2.l_partkey = p.p_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** Q11 (important stock), adapted: per-part shipped value through
    * NATION_3 suppliers, keeping parts whose value exceeds 0.1% of the
    * national total (exact DECIMAL sums on both sides of the comparison;
    * the single-row total is broadcast). */
  def importantStock(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n3 = Tables.nation(spark, sfDir).filter($"n_name" === "NATION_3")
      .select($"n_nationkey")
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(n3), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    // The threshold is a true global scalar, so a window can't express it
    // without a single-partition shuffle; materialize the (small, per-part)
    // aggregate once so the lineitem scan+join+agg isn't recomputed for
    // the total leg.
    val value = Tables.lineitem(spark, sfDir)
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(sum(dec($"l_extendedprice")).as("v"))
      .localCheckpoint()
    val total = value.agg(sum($"v").as("tv"))
    value.join(broadcast(total), $"v" > $"tv" * lit(0.001).cast("decimal(4,3)"))
      .select($"l_partkey".as("p_partkey"), $"v".cast("double").as("part_value"))
      .orderBy($"part_value".desc, $"p_partkey")
  }

  val importantStockSql: String =
    """WITH val AS (
      |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_3' GROUP BY 1)
      |SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
      |FROM val
      |WHERE v > (SELECT SUM(v) FROM val) * CAST(0.001 AS DECIMAL(4,3))
      |ORDER BY part_value DESC, p_partkey""".stripMargin

  /** Q16 (parts/supplier relationship), adapted: distinct supplier count
    * per (brand, type, size) over eight size buckets, excluding one brand,
    * one type, and the NOT IN supplier set (names ending in 7 stand in for
    * the original complaints filter). NOT IN over a non-null key column is
    * exactly a left-anti join, which is how the Spark side spells it. */
  def supplierCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val excluded = Tables.supplier(spark, sfDir)
      .filter($"s_name".endsWith("7")).select($"s_suppkey")
    val parts = Tables.part(spark, sfDir)
      .filter($"p_brand" =!= "Brand#5" && $"p_type" =!= "PROMO" &&
        $"p_size".isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    Tables.lineitem(spark, sfDir).select($"l_partkey", $"l_suppkey")
      .join(excluded, $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(parts, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val supplierCountSql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q20 (potential part promotion), adapted: suppliers in three nations
    * who shipped more than 1.5× the average per-supplier share of some
    * red-named part's total quantity (the original's
    * `availqty > 0.5 · sum(qty)` fraction-of-aggregate gate, made
    * scale-stable: a fixed 50% share vanishes as supplier count grows with
    * SF). Both per-supplier and per-part totals derive from ONE
    * (part, supplier) aggregate; the per-part roll-up reuses its shuffle.
    * Quantities are integral doubles, so every sum is exact and the
    * `1.5 · total / n` threshold is computed in the identical operand
    * order on both engines. */
  def dominantSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val redParts = Tables.part(spark, sfDir)
      .filter($"p_name".startsWith("red")).select($"p_partkey")
    import org.apache.spark.sql.expressions.Window
    val spq = Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity").as("sup_qty"))
    // Per-part totals as a window over the (part, supplier) aggregate —
    // one shuffle, no second lineitem scan; the red-part semi-join runs
    // first (per-part filter, whole window partitions survive together).
    val w = Window.partitionBy($"l_partkey")
    val dominant = spq
      .join(redParts, $"l_partkey" === $"p_partkey", "left_semi")
      .withColumn("total_qty", sum($"sup_qty").over(w))
      .withColumn("n_sup", count(lit(1)).over(w))
      .filter($"sup_qty" > lit(1.5) * $"total_qty" / $"n_sup")
      .select($"l_suppkey").distinct()
    val nations = Tables.nation(spark, sfDir)
      .filter($"n_name".isin("NATION_3", "NATION_8", "NATION_13"))
      .select($"n_nationkey")
    Tables.supplier(spark, sfDir)
      .join(broadcast(nations), $"s_nationkey" === $"n_nationkey", "left_semi")
      .join(dominant, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_name", $"s_acctbal")
      .orderBy($"s_name")
  }

  val dominantSuppliersSql: String =
    """WITH spq AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS sup_qty
      |  FROM lineitem GROUP BY 1, 2),
      |pq AS (
      |  SELECT l_partkey, sum(sup_qty) AS total_qty, count(*) AS n_sup
      |  FROM spq GROUP BY 1)
      |SELECT s_name, s_acctbal FROM supplier
      |WHERE s_suppkey IN (
      |    SELECT l_suppkey FROM spq JOIN pq USING (l_partkey)
      |    WHERE l_partkey IN (
      |        SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |      AND sup_qty > 1.5 * total_qty / n_sup)
      |  AND s_nationkey IN (
      |    SELECT n_nationkey FROM nation
      |    WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_13'))
      |ORDER BY s_name""".stripMargin

  /** ABC / Pareto analysis of part revenue — the inventory-management
    * classic: rank parts by discounted revenue, take the running share of
    * the total, and band A (first 80%), B (to 95%), C (tail). Revenue is
    * exact DECIMAL carried in integer 10⁻⁴-currency units, the class
    * boundaries are integer cross-products (cum·100 vs total·80 in
    * DECIMAL(38,0)), so no share ratio is ever floated.
    *
    * Scale shape: one map-side-partial aggregate over lineitem keyed on
    * partkey, then the rank/cumsum window runs over the PART DIMENSION
    * (catalog-sized, not fact-sized) — the standard ABC shape; the fact
    * table is touched once. */
  def abcAnalysis(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg((sum(expr(
        "CAST(l_extendedprice AS DECIMAL(18,2))" +
          " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"))
        * 10000).cast("long").as("revenue_e4"))
    val w = Window.orderBy(col("revenue_e4").desc, col("l_partkey"))
    val cumw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_e4", sum(col("revenue_e4")).over(cumw))
      .crossJoin(broadcast(rev.agg(sum(col("revenue_e4")).as("tot_e4"))))
      .withColumn("abc_class",
        when(expr("CAST(cum_e4 AS DECIMAL(38,0)) * 100 <= CAST(tot_e4 AS DECIMAL(38,0)) * 80"), "A")
          .when(expr("CAST(cum_e4 AS DECIMAL(38,0)) * 100 <= CAST(tot_e4 AS DECIMAL(38,0)) * 95"), "B")
          .otherwise("C"))
      .select(col("l_partkey"), col("revenue_e4"), col("rank"),
        col("cum_e4"), col("abc_class"))
  }

  val abcAnalysisSql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |      * 10000 AS BIGINT) AS revenue_e4
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT l_partkey, revenue_e4,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
      |    CAST(SUM(revenue_e4) OVER (ORDER BY revenue_e4 DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_e4,
      |    (SELECT SUM(revenue_e4) FROM rev) AS tot
      |  FROM rev
      |  WINDOW w AS (ORDER BY revenue_e4 DESC, l_partkey))
      |SELECT l_partkey, revenue_e4, rank, cum_e4,
      |  CASE WHEN CAST(cum_e4 AS HUGEINT) * 100 <= CAST(tot AS HUGEINT) * 80
      |       THEN 'A'
      |       WHEN CAST(cum_e4 AS HUGEINT) * 100 <= CAST(tot AS HUGEINT) * 95
      |       THEN 'B' ELSE 'C' END AS abc_class
      |FROM r ORDER BY rank""".stripMargin
}
