package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch aggregates — the constant-memory summaries a 100 TB pipeline
  * substitutes for exact distinct/quantile computations (HyperLogLog++ and
  * Greenwald-Khanna via Spark built-ins; no custom Aggregator needed).
  *
  * Sketch *outputs* are engine-specific, so [[eventSketches]] is rows-only
  * for the oracle (all columns scalar — an array column would break the
  * driver's sorted compare). [[sketchBounds]] is the oracle-checked
  * counterpart: the exact aggregates are cross-checked value-for-value
  * against DuckDB, and the sketch columns are folded into error-bound
  * booleans the oracle pins to TRUE — i.e. the oracle verifies "the sketch
  * is within its published error of the (independently verified) exact
  * answer".
  */
object Sketches {

  /** The one sketch configuration both queries bound: rsd 0.01 → ~1%
    * standard error on the HLL; GK accuracy 10000 → ≤ n/10000 rank error
    * per quantile. Shared so [[sketchBounds]]' pinned error bounds always
    * test exactly the configuration [[eventSketches]] ships. */
  private def sketchAggs: Seq[org.apache.spark.sql.Column] = Seq(
    approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
    countDistinct(col("user_id")).as("exact_users"),
    percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
    percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95"),
    percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99"))

  /** Per-event-type approx vs exact distinct users + approx p50/p95/p99 of
    * the value column, all scalar. */
  def eventSketches(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(sketchAggs.head, sketchAggs.tail: _*)
      .orderBy($"event_type")
  }

  /** Oracle-checked sketch error bounds: HLL within 5% (5 standard errors
    * at rsd 0.01) of exact; GK quantiles quantile-ordered and inside the
    * stratum's [min, max]. The quantile booleans assert only what GK
    * GUARANTEES (it returns actual samples in rank order) — a value-band
    * check against interpolated exact quantiles would legitimately fail on
    * small or heavy-tailed strata, where a correct rank-ε sample can sit
    * far from the interpolated value. Rank-accuracy itself is asserted in
    * SketchesSpec against an exact quantile on the dense fixture.
    * `exact_users` is genuinely cross-checked against DuckDB
    * COUNT(DISTINCT); the booleans must come out TRUE to hash-match. */
  def sketchBounds(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(sketchAggs.head, (sketchAggs.tail ++ Seq(
        min($"value").as("v_min"),
        max($"value").as("v_max"))): _*)
      .select(
        $"event_type",
        $"exact_users",
        (abs($"approx_users" - $"exact_users") <=
          $"exact_users" * 0.05).as("hll_ok"),
        ($"p50" <= $"p95" && $"p95" <= $"p99" &&
          $"p50" >= $"v_min" && $"p99" <= $"v_max").as("q_ok"))
      .orderBy($"event_type")
  }

  val sketchBoundsSql: String =
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS hll_ok, TRUE AS q_ok
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
}
