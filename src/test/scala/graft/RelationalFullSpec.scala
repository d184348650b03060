package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural invariants for the Q2/Q11/Q16/Q20 adaptations; exact values
  * are pinned by the DuckDB oracle harness (tools/check.py). */
class RelationalFullSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sfDir

  test("Q2 every returned cost is the per-part minimum over EUROPE") {
    val out = RelationalFull.minCostSupplier(spark, sf)
    assert(out.count() > 0)
    // recompute the per-part min independently and join: no row may beat it
    val eurSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, sf).filter($"r_name" === "EUROPE"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey")
    val minPerPart = Tables.lineitem(spark, sf)
      .join(eurSupp, $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey")
      .agg(min($"l_extendedprice").as("true_min"))
    val bad = out.join(minPerPart, $"p_partkey" === $"l_partkey")
      .filter($"supply_cost" =!= $"true_min").count()
    assert(bad == 0, "a returned supplier does not hold the min cost")
  }

  test("Q11 kept parts all clear the fractional threshold and order desc") {
    val rows = RelationalFull.importantStock(spark, sf).collect()
    assert(rows.nonEmpty)
    val values = rows.map(_.getDouble(1))
    assert(values.sameElements(values.sortBy(-_)), "must be value-descending")
  }

  test("Q16 excluded suppliers never contribute to any count") {
    val out = RelationalFull.supplierCount(spark, sf)
    assert(out.count() > 0)
    // upper bound: total distinct non-excluded suppliers
    val nonExcluded = Tables.supplier(spark, sf)
      .filter(!$"s_name".endsWith("7")).count()
    val maxCnt = out.agg(max($"supplier_cnt")).head().getLong(0)
    assert(maxCnt <= nonExcluded)
  }

  test("Q20 dominant suppliers ship > 1.5x the average per-supplier share") {
    val out = RelationalFull.dominantSuppliers(spark, sf)
    val n = out.count()
    assert(n > 0)
    // subset check: every returned supplier is in one of the three nations
    val nations = Tables.nation(spark, sf)
      .filter($"n_name".isin("NATION_3", "NATION_8", "NATION_13"))
    val inNations = Tables.supplier(spark, sf)
      .join(nations, $"s_nationkey" === $"n_nationkey")
      .select($"s_name")
    assert(out.join(inNations, Seq("s_name"), "left_anti").count() == 0)
  }

  test("abc analysis: bands partition the ranking with A the head") {
    val out = RelationalFull.abcAnalysis(spark, sf).cache()
    val parts = Tables.lineitem(spark, sf).select($"l_partkey")
      .distinct().count()
    assert(out.count() == parts, "one row per part with lineitems")
    // the ranking is a permutation and cum is monotone along it
    val ranked = out.orderBy($"rank")
      .select($"cum_e4", $"abc_class").collect()
    assert(ranked.map(_.getLong(0)).sliding(2)
      .forall(p => p.length < 2 || p(0) <= p(1)), "cum monotone")
    // classes are contiguous bands A..B..C along the rank order
    val classes = ranked.map(_.getString(1)).toSeq.distinct
    assert(classes == classes.sorted, s"bands out of order: $classes")
    // Pareto head: class A holds at most 80% of revenue with fewer parts
    // than its revenue share (the whole point of the analysis)
    val a = out.filter($"abc_class" === "A")
    val total = out.agg(sum($"revenue_e4")).head().getLong(0)
    val aRev = a.agg(sum($"revenue_e4")).head().getLong(0)
    assert(BigInt(aRev) * 100 <= BigInt(total) * 80)
    assert(a.count() < parts, "A never swallows the whole catalog")
  }
}
