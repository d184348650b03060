package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the 100 TB answer to repeated fact⋈fact
  * joins on the same key: persist both sides bucketed by the join key and
  * Spark's planner elides the shuffle entirely (both children report
  * HashPartitioning over the bucket columns).
  *
  * The reference has no join surface at all (SURVEY.md §2.5); this is the
  * engine-side extension that makes its table layout *useful* for joins:
  * `partitionBy` gives read pruning, `bucketBy` gives shuffle-free joins.
  */
object Bucketing {

  /** Persist a DataFrame as a bucketed managed table (bucket metadata only
    * lives in the session catalog; files are plain parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int = 8): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plan contains no
    * shuffle exchange (asserted in BucketingSpec). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
