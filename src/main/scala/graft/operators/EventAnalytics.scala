package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral analytics over the events stream — the funnel / cohort
  * queries a product-analytics deployment of the engine runs next to its
  * data-pipeline workloads. Both operators are pure relational plans
  * (joins + aggregates on user_id), so Catalyst owns the physical strategy
  * and every shuffle is keyed on the same column.
  */
object EventAnalytics {

  /** Ordered-step funnel: how many users performed step 1, then step 2
    * strictly after their first step-1 event, then step 3 strictly after
    * that, … Each stage keeps one row per user — the timestamp of the
    * user's first qualifying event — so the data volume SHRINKS
    * monotonically down the funnel.
    *
    * Scale shape: every group-by and join in the chain is keyed on
    * user_id, so after the first shuffle the stages reuse the same hash
    * partitioning (Spark's EnsureRequirements sees the co-partitioning;
    * no re-shuffle between stages). No broadcast hints: per-step reach
    * tables start at |users| and shrink, but |users| grows with the
    * corpus, so AQE must stay free to pick the join side. The final
    * output is one row per step — bounded metadata. */
  def funnel(events: DataFrame,
      steps: Seq[String] = Seq("signup", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    var prev: DataFrame = null
    val stages = steps.zipWithIndex.map { case (step, i) =>
      val cur =
        if (i == 0)
          events.filter(col("event_type") === step)
            .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
        else
          events.filter(col("event_type") === step)
            .join(prev.select(col("user_id"), col("t").as("t_prev")),
              "user_id")
            .filter(col("ts") > col("t_prev"))
            .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      prev = cur
      cur.agg(count(lit(1)).as("users"))
        .select(lit(i + 1L).as("step_idx"), lit(step).as("step"),
          col("users"))
    }
    stages.reduce(_ union _).orderBy(col("step_idx"))
  }

  /** DuckDB oracle for [[funnel]] with the default three steps. */
  val funnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
      |SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step,
      |         count(*) AS users FROM s1
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
      |  UNION ALL
      |  SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3)
      |ORDER BY step_idx""".stripMargin

  /** Weekly cohort retention: users are cohorted by the ISO week
    * (date_trunc 'week' — Monday in both Spark and DuckDB) of their FIRST
    * event; for each (cohort, week-offset) cell, how many distinct cohort
    * members were active that week. All week arithmetic is exact integer
    * (both weeks are Monday-truncated, so the day difference is a
    * multiple of 7) — no float anywhere.
    *
    * Scale shape: first-event and active-week tables both aggregate on
    * user_id (map-side partials; active weeks are DISTINCT so the
    * per-user row count is bounded by the observation window, not the
    * event count); their join is keyed user_id with no broadcast hint
    * (|users| grows with data — AQE decides). The final cell aggregation
    * uses count(DISTINCT user_id), which Spark expands into a two-phase
    * exact aggregate; cells are |cohorts| × |offsets| — bounded by the
    * calendar, not the data. */
  def cohortRetention(events: DataFrame): DataFrame = {
    // cohort/activity weeks stay TIMESTAMP (Monday 00:00): parquet DATE
    // round-trips as a different dtype than DuckDB's in the driver compare
    val first = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    active.join(first, "user_id")
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / lit(7))
          .cast("long").as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** DuckDB oracle for [[cohortRetention]]. */
  val cohortRetentionSql: String =
    """WITH first AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP)
      |           AS cohort_week
      |  FROM events GROUP BY 1),
      |active AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP)
      |           AS week
      |  FROM events),
      |j AS (
      |  SELECT f.cohort_week,
      |         CAST(date_diff('day', f.cohort_week, a.week) // 7 AS BIGINT)
      |           AS week_offset,
      |         a.user_id
      |  FROM active a JOIN first f USING (user_id))
      |SELECT cohort_week, week_offset, count(DISTINCT user_id) AS users
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-user daily activity with rolling 7-day features — the
    * feature-engineering pass an events-driven model (churn, anomaly,
    * recommendation) trains on: events and value per active day, the
    * trailing-week RANGE-window aggregates, and the previous active day's
    * count. The window key is an exact integer day index (days since
    * 1970-01-01), so the RANGE frame `[-6, 0]` is calendar-correct across
    * gaps (a user inactive for a month does NOT drag old days into the
    * frame, which a ROWS frame would). Money-like sums go through
    * DECIMAL(18,2) (exact, order-independent) and cast to double only at
    * the output edge — the repo-wide float-sum armor.
    *
    * Scale shape: the daily aggregate shuffles once on (user_id, day) with
    * map-side partials — the row count drops from |events| to |active user
    * days| before any window runs; the rolling windows then re-shuffle the
    * AGGREGATED table on user_id and sort each user's days — bounded by
    * the observation window, never by event volume. */
  def rollingFeatures(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.groupBy(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day_idx"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("value_sum"))
    val range7 = Window.partitionBy(col("user_id")).orderBy(col("day_idx"))
      .rangeBetween(-6, 0)
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("day_idx"))
    daily
      .withColumn("roll7_events", sum(col("n_events")).over(range7))
      .withColumn("roll7_value",
        sum(col("value_sum")).over(range7).cast("double"))
      .withColumn("prev_n_events",
        coalesce(lag(col("n_events"), 1).over(byDay), lit(0L)))
      .select(col("user_id"), col("day_idx"), col("n_events"),
        col("value_sum").cast("double").as("value_sum"),
        col("roll7_events"), col("roll7_value"), col("prev_n_events"))
  }

  /** DuckDB oracle for [[rollingFeatures]]. */
  val rollingFeaturesSql: String =
    """WITH daily AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS day_idx,
      |    count(*) AS n_events,
      |    sum(CAST(value AS DECIMAL(18,2))) AS value_sum
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id, day_idx, n_events,
      |  CAST(value_sum AS DOUBLE) AS value_sum,
      |  CAST(sum(n_events) OVER w7 AS BIGINT) AS roll7_events,
      |  CAST(sum(value_sum) OVER w7 AS DOUBLE) AS roll7_value,
      |  CAST(COALESCE(lag(n_events) OVER
      |    (PARTITION BY user_id ORDER BY day_idx), 0) AS BIGINT)
      |    AS prev_n_events
      |FROM daily
      |WINDOW w7 AS (PARTITION BY user_id ORDER BY day_idx
      |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, day_idx""".stripMargin

  /** Anomalous-activity days: for each user with at least `minDays` active
    * days, flag days whose event count deviates from the user's mean by
    * more than `nSigma` population standard deviations — the volume-spike
    * detector that runs over the same daily aggregate as
    * [[rollingFeatures]].
    *
    * Engine portability: the per-user moments are EXACT integer sums
    * (Σx, Σx² of bigint counts — no float accumulation to disagree on);
    * mean, variance, and the z-score are then single double expressions
    * evaluated identically by DuckDB, with the z 9-dp-rounded. A constant
    * series has variance exactly 0 and is never flagged (no epsilon, no
    * division: the flag compares |x−μ| against nSigma·σ directly, and z
    * is emitted via a var>0 guard).
    *
    * Scale shape: daily aggregate shuffles once on (user, day); the
    * moment table aggregates that on user (map-side partials); their join
    * is keyed user_id, unhinted. Output is only the flagged days. */
  def anomalousDays(events: DataFrame, nSigma: Double = 3.0,
      minDays: Int = 7): DataFrame = {
    val daily = events.groupBy(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day_idx"))
      .agg(count(lit(1)).as("x"))
    val moments = daily.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= minDays)
    val mean = col("sx").cast("double") / col("n")
    val variance = (col("sxx").cast("double") / col("n")) -
      ((col("sx").cast("double") / col("n"))
        * (col("sx").cast("double") / col("n")))
    val diff = col("x").cast("double") - mean
    daily.join(moments, "user_id")
      .filter(abs(diff) > lit(nSigma) * sqrt(variance))
      .select(col("user_id"), col("day_idx"), col("x").as("n_events"),
        when(variance > 0, round(diff / sqrt(variance), 9))
          .otherwise(lit(0.0)).as("z9"))
  }

  /** DuckDB oracle for [[anomalousDays]] at the default (3σ, 7 days). */
  val anomalousDaysSql: String =
    """WITH daily AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS day_idx,
      |    count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT user_id, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM daily GROUP BY 1 HAVING count(*) >= 7)
      |SELECT d.user_id, d.day_idx, d.x AS n_events,
      |  CASE WHEN CAST(sxx AS DOUBLE) / n
      |         - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) > 0
      |    THEN round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n)
      |      / sqrt(CAST(sxx AS DOUBLE) / n
      |        - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)), 9)
      |    ELSE 0.0 END AS z9
      |FROM daily d JOIN m USING (user_id)
      |WHERE abs(CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n)
      |  > 3.0 * sqrt(CAST(sxx AS DOUBLE) / n
      |    - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
      |ORDER BY user_id, day_idx""".stripMargin

  // ------------------------------------------------ driver-contract hooks
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame =
    funnel(Tables.events(spark, sfDir))

  def qCohortRetention(spark: SparkSession, sfDir: String): DataFrame =
    cohortRetention(Tables.events(spark, sfDir))

  def qRollingFeatures(spark: SparkSession, sfDir: String): DataFrame =
    rollingFeatures(Tables.events(spark, sfDir))
      .orderBy(col("user_id"), col("day_idx"))

  def qAnomalousDays(spark: SparkSession, sfDir: String): DataFrame =
    anomalousDays(Tables.events(spark, sfDir))
      .orderBy(col("user_id"), col("day_idx"))

  /** Time-series gap-fill with forward-fill: each user's daily value
    * series expanded to EVERY day in their [first, last] active span,
    * missing days carrying the last observed daily total forward (with a
    * `filled` marker) — the resample step feature pipelines run before
    * fixed-window models. All-integer cents so no engine disagrees.
    *
    * Scale shape: one (user, day) aggregate, one bounded per-user span
    * expansion (`sequence` explode — output rows = user spans, the same
    * cardinality any calendar join produces), one ignore-nulls window
    * per user. Shuffles are keyed on user_id throughout; nothing global.
    */
  def gapFill(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.groupBy(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day_idx"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
    val span = daily.groupBy(col("user_id"))
      .agg(min(col("day_idx")).as("d0"), max(col("day_idx")).as("d1"))
    val calendar = span.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"))).as("day_idx"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar.join(daily, Seq("user_id", "day_idx"), "left")
      .select(col("user_id"), col("day_idx"),
        last(col("cents"), ignoreNulls = true).over(w).as("cents"),
        col("cents").isNull.as("filled"))
  }

  val gapFillSql: String =
    """WITH daily AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS day_idx,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |cal AS (
      |  SELECT user_id, unnest(generate_series(min(day_idx), max(day_idx)))
      |    AS day_idx
      |  FROM daily GROUP BY user_id)
      |SELECT cal.user_id, cal.day_idx,
      |  last_value(daily.cents IGNORE NULLS) OVER (
      |    PARTITION BY cal.user_id ORDER BY cal.day_idx
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents,
      |  daily.cents IS NULL AS filled
      |FROM cal LEFT JOIN daily
      |  ON cal.user_id = daily.user_id AND cal.day_idx = daily.day_idx
      |ORDER BY cal.user_id, cal.day_idx""".stripMargin

  def qGapFill(spark: SparkSession, sfDir: String): DataFrame =
    gapFill(Tables.events(spark, sfDir))
      .orderBy(col("user_id"), col("day_idx"))

  /** SCD2 history build: collapse each user's event stream into type-2
    * dimension rows — one row per consecutive run of the tracked
    * attribute (event_type), with [valid_from, valid_to) timestamps, the
    * observation count, and an is_current marker on the open row. The
    * standard warehouse shape for "what was this entity's state at time
    * t", produced with the islands trick (change marker → running island
    * id → per-island envelope).
    *
    * Determinism: the per-user order is (ts, event_id) — a total order —
    * and island envelopes inherit it, so the history is unique and
    * hash-stable on any engine.
    *
    * Scale shape: two windows and one aggregate, all partitioned by
    * user_id — per-user state only, no global sort, no collect. */
  def scd2(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val marked = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("chg", when(
        lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
        .otherwise(0L))
      .withColumn("grp", sum(col("chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = marked.groupBy(col("user_id"), col("grp"))
      .agg(max(col("event_type")).as("attr"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val w2 = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("grp"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .select(col("user_id"), col("attr"), col("valid_from"),
        col("valid_to"), col("n_obs"),
        col("valid_to").isNull.as("is_current"))
  }

  val scd2Sql: String =
    """WITH m AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (
      |  SELECT user_id, ts, event_type,
      |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS grp
      |  FROM m),
      |i AS (
      |  SELECT user_id, grp, max(event_type) AS attr,
      |    min(ts) AS valid_from, count(*) AS n_obs
      |  FROM g GROUP BY 1, 2)
      |SELECT user_id, attr, valid_from,
      |  lead(valid_from) OVER w2 AS valid_to,
      |  CAST(n_obs AS BIGINT) AS n_obs,
      |  lead(valid_from) OVER w2 IS NULL AS is_current
      |FROM i
      |WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, grp)
      |ORDER BY user_id, valid_from, grp""".stripMargin

  def qScd2(spark: SparkSession, sfDir: String): DataFrame =
    scd2(Tables.events(spark, sfDir))
      .orderBy(col("user_id"), col("valid_from"), col("attr"))

  /** Point-in-time (PIT) join against the [[scd2]] dimension — the
    * feature-store primitive: for every (user, day-boundary) probe, the
    * attribute that was valid AT that instant, resolved by the half-open
    * [valid_from, valid_to) containment rule (open rows match everything
    * after valid_from). Probes are each user's day boundaries from their
    * first event day + 1 through their last (the same calendar
    * [[gapFill]] expands) — probes before a user's first event correctly
    * match nothing and are dropped by the inner containment join.
    *
    * Scale shape: the dimension is per-user history (bounded by change
    * count, not event count); the join keys on user_id and the range
    * predicate fans out only within a user's own history rows — a
    * per-user interval lookup, never a cross join. */
  def pitJoin(events: DataFrame): DataFrame = {
    val hist = scd2(events)
    val daily = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
    // single-day users have no interior boundary: filtered here because
    // Spark's sequence() rejects start > stop (DuckDB's generate_series
    // returns empty — same final result)
    val probes = daily.filter(col("d1") > col("d0"))
      .select(col("user_id"),
        explode(sequence(date_add(col("d0"), 1), col("d1"))).as("probe_day"))
      .withColumn("probe_ts", col("probe_day").cast("timestamp"))
    probes.join(hist, Seq("user_id"))
      .filter(col("valid_from") <= col("probe_ts") &&
        (col("valid_to").isNull || col("probe_ts") < col("valid_to")))
      .select(col("user_id"),
        datediff(col("probe_day"), lit("1970-01-01").cast("date"))
          .cast("long").as("day_idx"),
        col("attr"))
  }

  val pitJoinSql: String =
    """WITH m AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (
      |  SELECT user_id, ts, event_type,
      |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM m),
      |i AS (
      |  SELECT user_id, grp, max(event_type) AS attr,
      |    min(ts) AS valid_from
      |  FROM g GROUP BY 1, 2),
      |hist AS (
      |  SELECT user_id, attr, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id
      |      ORDER BY valid_from, grp) AS valid_to
      |  FROM i),
      |probes AS (
      |  SELECT user_id,
      |    unnest(generate_series(d0 + 1, d1, INTERVAL 1 DAY)) AS probe_day
      |  FROM (SELECT user_id, CAST(min(ts) AS DATE) AS d0,
      |          CAST(max(ts) AS DATE) AS d1
      |        FROM events GROUP BY 1))
      |SELECT p.user_id,
      |  CAST(date_diff('day', DATE '1970-01-01', CAST(p.probe_day AS DATE))
      |    AS BIGINT) AS day_idx,
      |  h.attr
      |FROM probes p JOIN hist h ON p.user_id = h.user_id
      |WHERE h.valid_from <= CAST(p.probe_day AS TIMESTAMP)
      |  AND (h.valid_to IS NULL
      |       OR CAST(p.probe_day AS TIMESTAMP) < h.valid_to)
      |ORDER BY p.user_id, day_idx""".stripMargin

  def qPitJoin(spark: SparkSession, sfDir: String): DataFrame =
    pitJoin(Tables.events(spark, sfDir))
      .orderBy(col("user_id"), col("day_idx"))

  /** RFM (recency / frequency / monetary) customer scoring — the classic
    * segmentation every activation pipeline starts from. Per user:
    * days-since-last-event (vs the corpus's last day), event count, and
    * exact cents; each dimension scored 1–5 by population quintile with
    * the all-integer boundary rule score = 1 + (users_strictly_below · 5)
    * div n — ties share a score, no float percentile to disagree on.
    * Recency inverts (6 − score): most-RECENT users score 5.
    *
    * Scale design: quintiles normally need a global sort; instead each
    * dimension aggregates to its value histogram — recency is bounded by
    * the corpus day span, frequency by per-user activity, monetary is
    * pre-bucketed to 1000-cent steps — the cumulative runs over that
    * bounded histogram, and scores broadcast back, the same
    * [[TextAnalysis.lengthBand]] shape three times over. */
  def rfm(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.select(col("user_id"),
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("long").as("day"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val refDay = daily.agg(max(col("day")).as("ref_day"))
    val base = daily.groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
      .crossJoin(broadcast(refDay))
      .select(col("user_id"), (col("ref_day") - col("last_day")).as("recency_days"),
        col("frequency"), col("monetary_cents"),
        expr("monetary_cents div 1000").as("mb"))
    def quintile(metric: String): DataFrame = {
      val hist = base.groupBy(col(metric).as("v"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.withColumn("cum_le", sum(col("cnt")).over(w))
        .crossJoin(broadcast(base.agg(count(lit(1)).as("nu"))))
        .select(col("v"),
          (expr("((cum_le - cnt) * 5) div nu") + 1).as(s"score_$metric"))
    }
    base
      .join(broadcast(quintile("recency_days")),
        base("recency_days") === col("v")).drop("v")
      .join(broadcast(quintile("frequency")),
        base("frequency") === col("v")).drop("v")
      .join(broadcast(quintile("mb")), base("mb") === col("v")).drop("v")
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        (lit(6L) - col("score_recency_days")).as("r"),
        col("score_frequency").as("f"), col("score_mb").as("m"))
      .withColumn("rfm", col("r") * 100 + col("f") * 10 + col("m"))
  }

  val rfmSql: String =
    """WITH daily AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |base AS (
      |  SELECT user_id,
      |    (SELECT MAX(day) FROM daily) - MAX(day) AS recency_days,
      |    COUNT(*) AS frequency, SUM(cents) AS monetary_cents,
      |    SUM(cents) // 1000 AS mb
      |  FROM daily GROUP BY 1),
      |nu AS (SELECT COUNT(*) AS nu FROM base),
      |qr AS (SELECT v, ((cum_le - cnt) * 5) // (SELECT nu FROM nu) + 1 AS s
      |       FROM (SELECT recency_days AS v, COUNT(*) AS cnt,
      |               SUM(COUNT(*)) OVER (ORDER BY recency_days
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                 AS cum_le
      |             FROM base GROUP BY 1)),
      |qf AS (SELECT v, ((cum_le - cnt) * 5) // (SELECT nu FROM nu) + 1 AS s
      |       FROM (SELECT frequency AS v, COUNT(*) AS cnt,
      |               SUM(COUNT(*)) OVER (ORDER BY frequency
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                 AS cum_le
      |             FROM base GROUP BY 1)),
      |qm AS (SELECT v, ((cum_le - cnt) * 5) // (SELECT nu FROM nu) + 1 AS s
      |       FROM (SELECT mb AS v, COUNT(*) AS cnt,
      |               SUM(COUNT(*)) OVER (ORDER BY mb
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                 AS cum_le
      |             FROM base GROUP BY 1))
      |SELECT b.user_id, b.recency_days,
      |  CAST(b.frequency AS BIGINT) AS frequency,
      |  CAST(b.monetary_cents AS BIGINT) AS monetary_cents,
      |  CAST(6 - qr.s AS BIGINT) AS r, CAST(qf.s AS BIGINT) AS f,
      |  CAST(qm.s AS BIGINT) AS m,
      |  CAST((6 - qr.s) * 100 + qf.s * 10 + qm.s AS BIGINT) AS rfm
      |FROM base b
      |JOIN qr ON b.recency_days = qr.v
      |JOIN qf ON b.frequency = qf.v
      |JOIN qm ON b.mb = qm.v
      |ORDER BY b.user_id""".stripMargin

  def qRfm(spark: SparkSession, sfDir: String): DataFrame =
    rfm(Tables.events(spark, sfDir)).orderBy(col("user_id"))

  /** Robust outlier days by median absolute deviation — the companion to
    * [[anomalousDays]]' z-score: MAD shrugs off the very outliers that
    * inflate a standard deviation, so a user with one enormous spike
    * still gets that spike flagged (σ-based tests famously mask it).
    * Medians are the exact LOWER median (the element at rank
    * (n+1) div 2 under (value, day) order — a concrete total order both
    * engines replay; no midpoint averaging, no float). A day is an
    * outlier when |x − med| > nMads·MAD, integers throughout; MAD = 0
    * (constant-ish series) flags nothing, mirroring the z-score's
    * var > 0 guard.
    *
    * Scale shape: daily aggregate, then two per-user rank windows (counts,
    * deviations) and id-keyed joins — per-user state only. */
  def madOutlierDays(events: DataFrame, nMads: Long = 5L,
      minDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.groupBy(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day_idx"))
      .agg(count(lit(1)).as("n_events"))
    val eligible = daily.groupBy(col("user_id"))
      .agg(count(lit(1)).as("nd")).filter(col("nd") >= minDays)
    val d = daily.join(eligible, "user_id")
    val wMed = Window.partitionBy(col("user_id"))
      .orderBy(col("n_events"), col("day_idx"))
    val med = d.withColumn("rk", row_number().over(wMed))
      .filter(expr("rk = (nd + 1) div 2"))
      .select(col("user_id"), col("n_events").as("med"))
    val dev = d.join(med, "user_id")
      .withColumn("adev", abs(col("n_events") - col("med")))
    val wMad = Window.partitionBy(col("user_id"))
      .orderBy(col("adev"), col("day_idx"))
    val mad = dev.withColumn("rk", row_number().over(wMad))
      .filter(expr("rk = (nd + 1) div 2"))
      .select(col("user_id"), col("adev").as("mad"))
    dev.join(mad, "user_id")
      .filter(col("mad") > 0 && col("adev") > lit(nMads) * col("mad"))
      .select(col("user_id"), col("day_idx"), col("n_events"),
        col("med"), col("mad"))
  }

  val madOutlierDaysSql: String =
    """WITH daily AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS day_idx,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |el AS (SELECT user_id, COUNT(*) AS nd FROM daily
      |       GROUP BY 1 HAVING COUNT(*) >= 7),
      |d AS (SELECT daily.*, el.nd FROM daily JOIN el USING (user_id)),
      |med AS (
      |  SELECT user_id, n_events AS med FROM (
      |    SELECT user_id, n_events, nd,
      |      ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY n_events, day_idx) AS rk
      |    FROM d) WHERE rk = (nd + 1) // 2),
      |dev AS (
      |  SELECT d.user_id, d.day_idx, d.n_events, d.nd, med.med,
      |    abs(d.n_events - med.med) AS adev
      |  FROM d JOIN med USING (user_id)),
      |mad AS (
      |  SELECT user_id, adev AS mad FROM (
      |    SELECT user_id, adev, nd,
      |      ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY adev, day_idx) AS rk
      |    FROM dev) WHERE rk = (nd + 1) // 2)
      |SELECT dev.user_id, dev.day_idx,
      |  CAST(dev.n_events AS BIGINT) AS n_events,
      |  CAST(dev.med AS BIGINT) AS med, CAST(mad.mad AS BIGINT) AS mad
      |FROM dev JOIN mad USING (user_id)
      |WHERE mad.mad > 0 AND dev.adev > 5 * mad.mad
      |ORDER BY user_id, day_idx""".stripMargin

  def qMadOutliers(spark: SparkSession, sfDir: String): DataFrame =
    madOutlierDays(Tables.events(spark, sfDir))
      .orderBy(col("user_id"), col("day_idx"))
}
