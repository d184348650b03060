package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling (the Deequ/dbt-style pre-flight a pipeline runs
  * before trusting an input table): per-column row, null, and exact
  * distinct counts. Counts only — min/max/mean are deliberately excluded
  * from the cross-engine surface because their portable representation is
  * type-dependent (double formatting, timestamp zones); the typed
  * aggregates already live in `q_agg_breadth`.
  */
object Profile {

  /** One output row per profiled column: (col_name, n_rows, n_nulls,
    * n_distinct).
    *
    * Scale shape: ONE aggregation pass computes every column's stats —
    * the multiple count(DISTINCT) aggregates make Catalyst plan a single
    * Expand (one input row → |cols| tagged rows) feeding one partial +
    * final aggregate, instead of |cols| separate scans; the output is a
    * 1-row wide record exploded driver-free into the long report shape.
    * Cost is |cols| × |rows| expanded rows through map-side partial
    * aggregation — the standard profiling trade, bounded by column count,
    * with no per-column rescans. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct")))
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    row.select(col("n_rows"), explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__distinct").as("n_distinct"))): _*)).as("p"))
      .select(col("p.col_name"), col("n_rows"),
        col("p.n_nulls"), col("p.n_distinct"))
  }

  /** DuckDB oracle generator for [[profile]] over a named table. Each
    * entry is (output column name, SQL expression) — the expression lets a
    * column the Spark loader transforms (e.g. `events.ts`, truncated
    * ns→µs by [[Tables.events]]) be profiled over the SAME values. */
  def profileSql(table: String, cols: Seq[(String, String)]): String = {
    val stats = cols.map { case (c, e) =>
      s"""    CAST(sum(CASE WHEN $e IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ${c}__nulls,
         |    count(DISTINCT $e) AS ${c}__distinct""".stripMargin
    }.mkString(",\n")
    val rows = cols.map { case (c, _) =>
      s"""SELECT '$c' AS col_name, n_rows, ${c}__nulls AS n_nulls,
         |  ${c}__distinct AS n_distinct FROM stats""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH stats AS (
       |  SELECT count(*) AS n_rows,
       |$stats
       |  FROM $table)
       |$rows
       |ORDER BY col_name""".stripMargin
  }

  /** Events-table profile, every column. `ts` is profiled at the µs
    * precision both engines actually query at (TIMESTAMP_NS raw in the
    * fixture; [[Tables.events]] truncates on load, the oracle casts). */
  private val eventCols = Seq(
    "event_id" -> "event_id",
    "ts" -> "CAST(ts AS TIMESTAMP)",
    "user_id" -> "user_id",
    "event_type" -> "event_type",
    "value" -> "value",
    "props" -> "props")

  def qProfileEvents(spark: SparkSession, sfDir: String): DataFrame =
    profile(Tables.events(spark, sfDir), eventCols.map(_._1))
      .orderBy(col("col_name"))

  val profileEventsSql: String = profileSql("events", eventCols)
}
