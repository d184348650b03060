package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series lookup operator (for each probe event, the
  * most recent build-side event at or before it, per key). Spark has no
  * native ASOF JOIN; the naive encodings are a per-key range self-join
  * (O(events-per-key²) pairs before aggregation) or a broadcast of the
  * build side (impossible when both sides are fact-sized).
  *
  * Spark-first single-pass form instead: UNION the two streams with a
  * source tag, shuffle ONCE on the key, and sweep each key group in
  * event-time order with a running max over build timestamps only. One
  * shuffle + one sort — the same cost class as a groupBy over the union —
  * at any per-key density, so the plan survives 100 TB fact×fact inputs.
  * Ties at equal timestamps order build-before-probe, making the match
  * inclusive (build_ts <= probe_ts) — exactly DuckDB ASOF JOIN semantics,
  * which is what makes the operator oracle-checkable.
  */
object AsOfJoin {

  /** Probe rows with `asofCol` = greatest build `ts` <= the probe `ts`
    * within the same `key` group (null when no build row precedes). All
    * probe columns pass through untouched; the build side contributes only
    * its timestamp (the deterministic core of as-of semantics — carrying
    * arbitrary build columns needs a tie-break rule among equal-ts build
    * rows, which callers add as an equi-join back on (key, matched ts)).
    */
  def asOf(probe: DataFrame, build: DataFrame, key: String, ts: String,
      asofCol: String = "asof_ts"): DataFrame = {
    val src = "__asof_src"
    val p = probe.withColumn(src, lit(1))
    // NULL-keyed build rows can never match under join semantics (NULL =
    // NULL is not true) — but Window.partitionBy groups NULL keys into one
    // partition, so without this filter a NULL-keyed probe would "match"
    // NULL-keyed build rows, diverging from ASOF JOIN. Dropping them keeps
    // NULL-keyed probes at asof = null, exactly the join result.
    val b = build.select(col(key), col(ts)).filter(col(key).isNotNull)
      .withColumn(src, lit(0))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col(src).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(b, allowMissingColumns = true)
      .withColumn(asofCol, max(when(col(src) === 0, col(ts))).over(w))
      .filter(col(src) === 1)
      .drop(src)
  }

  /** Attribution query: each purchase matched to the same user's most
    * recent click at or before it. */
  def attributionQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    asOf(purchases, clicks, "user_id", "ts", "click_ts")
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("click_ts"))
      .orderBy(col("event_id"))
  }

  val attributionSql: String =
    """SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
      |FROM (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts FROM events
      |                WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin
}
