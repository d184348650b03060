package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks in the broadcast-hint policy: forced `broadcast()` is reserved
  * for fixed-cardinality legs (nation: 25 rows, region: 5 rows, single-row
  * scalar aggregates, probe batches). SF-proportional tables (customer,
  * supplier, part) must carry NO hint — at 100× scale a forced hint OOMs
  * where AQE would pick a shuffle join; these counts fail if one sneaks
  * back in.
  */
class PlanHintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def hintCount(name: String): Int = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
    "ResolvedHint".r.findAllIn(df.queryExecution.analyzed.toString).length
  }

  test("queries touching only SF-proportional dimensions carry no forced hints") {
    Seq("q3_shipping_priority", "q4_order_priority", "q10_returned_revenue",
      "q12_ship_priority", "q13_order_distribution", "q14_promo_revenue",
      "q15_top_supplier", "q17_small_qty_revenue", "q18_large_orders",
      "q19_disjunctive_revenue").foreach { q =>
      assert(hintCount(q) == 0, s"$q must leave join strategy to the planner")
    }
  }

  test("fixed-cardinality legs keep exactly their intended hints") {
    assert(hintCount("q5_local_revenue") == 2, "region + nation")
    assert(hintCount("q7_nation_volume") == 2, "two nation legs")
    assert(hintCount("q8_market_share") == 3, "region + two nation legs")
    assert(hintCount("q22_idle_customers") == 1, "single-row avg-balance scalar")
    assert(hintCount("q9_product_profit") == 1, "25-row nation leg only")
    assert(hintCount("q21_late_suppliers") == 0, "supplier join stays planner-owned")
  }

  test("pipeline operators hint only bounded-metadata legs") {
    // histogram/threshold tables are bounded by group cardinality or
    // quantization grain, never by corpus size — hints are principled
    assert(hintCount("text_rebalance") == 2, "single-row n_min + per-group thresholds")
    assert(hintCount("text_quality_floor") == 2, "per-lang totals + kept buckets")
    assert(hintCount("text_mixture") == 1, "single-row corpus total")
    // hash-order operators must leave everything to the planner
    Seq("q_epoch_shuffle", "q_sample_per_source", "dedup_canonical",
      "q_embed_quantize", "q_embed_project", "text_token_rarity").foreach { q =>
      assert(hintCount(q) == 0, s"$q must leave join strategy to the planner")
    }
  }

  test("retrieval/analytics operators hint only query-bounded or 1-row legs") {
    assert(hintCount("text_bm25") == 2, "df (≤|query terms| rows) + 1-row corpus")
    assert(hintCount("text_unigram_lp") == 1, "1-row token total only — vocab join stays free")
    assert(hintCount("text_pmi") == 2, "1-row unigram + bigram totals — count joins stay free")
    assert(hintCount("text_domain_kl") == 1, "1-row corpus total — marginal joins stay free")
    assert(hintCount("sim_centroid_classify") == 1,
      "|labels|-row centroid table only")
    // user-keyed chains and cell self-joins: entirely planner-owned
    Seq("q_event_funnel", "q_cohort_retention", "dedup_semantic",
      "dedup_semantic_full").foreach { q =>
      assert(hintCount(q) == 0, s"$q must leave join strategy to the planner")
    }
  }

  test("round-5 additions: fingerprint shuffle and decode paths stay hint-free") {
    // dedup_paragraph: one shuffle on the fingerprint, window per group —
    // no join at all; the real-decode queries are scan + mapPartitions
    Seq("dedup_paragraph", "multimodal_decode_real").foreach { q =>
      assert(hintCount(q) == 0, s"$q must carry no forced hints")
    }
  }
}
