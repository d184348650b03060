package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval-proximity) join — matching rows by a distance predicate
  * on time rather than key equality. Spark's planner turns a pure range
  * predicate into a broadcast-nested-loop or cartesian plan: O(|A|·|B|)
  * comparisons, which is the operator that dies first at 100 TB.
  *
  * Scale form — cell bucketing: quantize time into cells exactly as wide
  * as the match radius. Every point lives in ONE cell; every probe's
  * matches lie within its cell ±1, so exploding each probe to 3 candidate
  * cells turns the range predicate into an equi-join on the cell id (one
  * shuffle, skew bounded by events-per-cell), and the exact |Δt| ≤ radius
  * filter runs only on candidates. Microsecond integer arithmetic
  * (`unix_micros` here, `epoch_us` in the oracle) keeps both engines
  * bit-identical — no float time math.
  */
object RangeJoin {

  /** For each probe row: the number of point timestamps within
    * `radiusMicros` (inclusive). Probes with no nearby point are kept with
    * a zero count. `probeId` must uniquely identify probe rows. Timestamps
    * must be non-negative epochs (cell ids use integer division). */
  def countWithin(probes: DataFrame, probeId: String, probeTs: String,
      points: DataFrame, pointTs: String, radiusMicros: Long): DataFrame = {
    require(radiusMicros > 0, "radius must be positive")
    val pUs = unix_micros(col(probeTs))
    val qUs = unix_micros(col(pointTs))
    val probeCells = probes
      .select(col(probeId), pUs.as("__p_us"))
      .withColumn("__cell", explode(array(
        (col("__p_us") / radiusMicros).cast("long") - 1,
        (col("__p_us") / radiusMicros).cast("long"),
        (col("__p_us") / radiusMicros).cast("long") + 1)))
    val pointCells = points
      .select(qUs.as("__q_us"),
        (qUs / radiusMicros).cast("long").as("__cell"))
    val counts = probeCells.join(pointCells, Seq("__cell"))
      .filter(abs(col("__p_us") - col("__q_us")) <= radiusMicros)
      .groupBy(col(probeId))
      .agg(count(lit(1)).as("n_nearby"))
    probes.select(col(probeId))
      .join(counts, Seq(probeId), "left")
      .withColumn("n_nearby", coalesce(col("n_nearby"), lit(0L)))
  }

  /** Proximity query: for each purchase, how many clicks (any user)
    * happened within ±30 minutes. */
  def proximityQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click").select(col("ts"))
    countWithin(purchases, "event_id", "ts", clicks, "ts",
      radiusMicros = 30L * 60 * 1000 * 1000)
      .orderBy(col("event_id"))
  }

  val proximitySql: String =
    """WITH p AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT ts FROM events WHERE event_type = 'click')
      |SELECT p.event_id, CAST(COUNT(c.ts) AS BIGINT) AS n_nearby
      |FROM p LEFT JOIN c
      |  ON abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 1800000000
      |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin
}
