package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch aggregates — the constant-memory summaries a 100 TB pipeline
  * substitutes for exact distinct/quantile computations (HyperLogLog++ and
  * Greenwald-Khanna via Spark built-ins; no custom Aggregator needed).
  * Sketch outputs are engine-specific, so these queries are rows-only for
  * the oracle; SketchesSpec bounds their error against exact answers.
  */
object Sketches {

  /** Per-event-type approx vs exact distinct users + approx quantiles of
    * the value column. rsd 0.01 → ~1% standard error on the HLL. */
  def eventSketches(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", rsd = 0.01).as("approx_users"),
        countDistinct($"user_id").as("exact_users"),
        percentile_approx($"value", array(lit(0.5), lit(0.95), lit(0.99)),
          lit(10000)).as("value_quantiles"))
      .orderBy($"event_type")
  }
}
