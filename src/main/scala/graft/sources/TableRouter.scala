package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Per-table routing — the reference declares `IcebergSinkMessage.table` as
  * a per-record destination override but never consults it in the write
  * path (models.py:62-63 vs connector.py:162-163; SURVEY.md §2.4 "treat as
  * aspirational"). This implements the declared semantics: fan records out
  * to different sinks based on a routing column, batch and streaming
  * (`foreachBatch`).
  *
  * Scale note: the only driver-side materialization is the distinct set of
  * TABLE NAMES (bounded metadata, not data); each table's rows are written
  * by a filtered scan of the (cached) batch, preserving the per-sink
  * partition-transform clustering.
  */
object TableRouter {

  /** Destination commits are INDEPENDENT (each table owns its manifest
    * log), so fan-out runs them concurrently on a bounded pool instead
    * of serializing N staged writes on the driver — a 100-destination
    * route is latency-bounded by the slowest slice, not the sum. Each
    * worker thread re-pins the active session (Spark's thread-local) so
    * warehouse IO resolves the session's Hadoop conf. Every destination
    * is awaited even when one fails; the first failure rethrows after
    * the rest settle (no abandoned in-flight commits). */
  private def eachConcurrently[A](tables: Seq[String], maxConcurrency: Int,
      spark: SparkSession)(f: String => A): Seq[A] = {
    if (tables.sizeIs <= 1 || maxConcurrency <= 1) return tables.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxConcurrency, tables.size))
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val settled = Await.result(
        Future.sequence(tables.map(t => Future {
          SparkSession.setActiveSession(spark)
          scala.util.Try(f(t))
        })), scala.concurrent.duration.Duration.Inf)
      settled.collectFirst { case scala.util.Failure(e) => throw e }
      settled.map(_.get)
    } finally { pool.shutdown(); () }
  }

  /** Batch fan-out: one atomic append per destination table, committed
    * concurrently (`maxConcurrency` bounds the in-flight destinations). */
  def appendRouted(df: DataFrame, tableCol: String,
      mkConfig: String => SinkConfig, maxConcurrency: Int = 8): Unit = {
    val cached = df.cache()
    try {
      val tables = cached.select(col(tableCol)).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      eachConcurrently(tables, maxConcurrency, df.sparkSession) { t =>
        new TableSink(mkConfig(t))
          .append(cached.filter(col(tableCol) === t).drop(tableCol))
      }
      ()
    } finally cached.unpersist()
  }

  /** Streaming fan-out via foreachBatch: each micro-batch routes its rows,
    * checkpointed as one unit.
    *
    * Delivery note: unlike the single-table file sink (whose
    * `_spark_metadata` log makes replays invisible to readers —
    * StreamingSpec), `foreachBatch` re-executes a batch whose write
    * completed but whose checkpoint commit did not, so routed fan-out is
    * AT-LEAST-ONCE unless the per-table write is idempotent. This matches
    * the reference's actual delivery semantics (its exactly-once tracking
    * is dead code — SURVEY.md §2.6); callers needing exactly-once routing
    * should dedupe downstream on a record key. */
  def startRoutedStream(df: DataFrame, tableCol: String,
      mkConfig: String => SinkConfig, checkpointLocation: String,
      intervalSeconds: Int = 15): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        appendRouted(batch, tableCol, mkConfig)
      }
      .start()

  /** One micro-batch of [[startRoutedStreamVersioned]] (also directly
    * callable from a hand-rolled foreachBatch): routes the batch and
    * commits each destination's slice through
    * [[TableSink.appendStreamBatch]] with this batch's id — a
    * destination that already committed it (a replay that crashed
    * BETWEEN destinations) skips before staging a byte. Returns the
    * tables that actually committed this call. */
  def routeBatchVersioned(batch: DataFrame, tableCol: String,
      mkConfig: String => SinkConfig, streamId: String,
      batchId: Long, maxConcurrency: Int = 8): Seq[String] = {
    val cached = batch.cache()
    try {
      val tables = cached.select(col(tableCol)).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      val committed = eachConcurrently(tables, maxConcurrency,
        batch.sparkSession) { t =>
        t -> new TableSink(mkConfig(t)).appendStreamBatch(
          cached.filter(col(tableCol) === t).drop(tableCol), streamId,
          batchId)
      }
      committed.collect { case (t, true) => t }
    } finally { cached.unpersist(); () }
  }

  /** Streaming fan-out with EXACTLY-ONCE per destination — the delivery
    * contract the reference DECLARES but never wires (its exactly-once
    * tracking is dead code, SURVEY.md §2.6), realized on the versioned
    * commit protocol: each destination's slice commits as one snapshot
    * carrying the `(streamId, batchId)` txn line, so a replayed
    * micro-batch re-routes but every destination that already committed
    * this batch id skips it. A crash BETWEEN destinations converges on
    * replay: committed tables skip, the rest commit — per-table
    * exactly-once with no cross-table transaction needed, because
    * destination commits are independent and idempotent per batch id.
    * Destinations must be versioned ([[TableSink.appendStreamBatch]]
    * enforces it). Scale shape: per batch, one bounded distinct of
    * table NAMES + per table one filtered write of the cached batch —
    * identical to [[startRoutedStream]] plus one small txn probe per
    * destination. */
  def startRoutedStreamVersioned(df: DataFrame, tableCol: String,
      mkConfig: String => SinkConfig, checkpointLocation: String,
      streamId: Option[String] = None,
      intervalSeconds: Int = 15): StreamingQuery = {
    val sid = streamId.getOrElse(checkpointLocation)
    df.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        routeBatchVersioned(batch, tableCol, mkConfig, sid, id)
        ()
      }
      .start()
  }
}
