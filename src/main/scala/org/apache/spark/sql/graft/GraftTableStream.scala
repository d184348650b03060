package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.{SinkConfig, TableSink}

/** Snapshot-consistent streaming source over a versioned graft table —
  * the streaming half of the Iceberg table contract (the reference's
  * README.md:95-105 "commit coordination" positioning): micro-batches
  * are COMMITS from the snapshot log, never directory listings, so a
  * consumer cannot observe a staged append's renamed-but-unclaimed
  * files, and files orphaned by a crashed/retracted append are never
  * emitted.
  *
  * Implemented as a V1 [[Source]] (the Delta Lake `DeltaSource` shape):
  * `getBatch` returns the engine's OWN manifest-driven batch read —
  * distributed scan, vectorized reader, partition-directory recovery,
  * merge-on-read visibility, all reused verbatim — wrapped as a
  * streaming DataFrame. The V2 `MicroBatchStream` API would instead
  * demand a hand-built `PartitionReader` stack for every file format.
  * Trade-off, documented: the wrapped plan is a barrier to downstream
  * filter pushdown into the scan (same as Delta's source); batch
  * boundaries, not per-file pruning, are the streaming unit.
  *
  * Offsets are `(history generation, version)`. The generation is the
  * snapshot log's identity — a rewriting op expires the log and restarts
  * numbering, so a checkpointed bare version could silently resume
  * against a DIFFERENT history; the pin turns that into a loud refusal.
  */
final class GraftTableStream extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def mkSink(parameters: Map[String, String]): TableSink = {
    val path = parameters.getOrElse("tablePath", throw new
        IllegalArgumentException("graft-table stream needs a tablePath " +
          "option — obtain the stream via TableSink.readStream"))
    new TableSink(SinkConfig(
      tableName = parameters.getOrElse("tableName",
        path.split('/').last),
      warehousePath = parameters.getOrElse("warehousePath", path),
      location = Some(path),
      fileFormat = parameters.getOrElse("fileFormat", "parquet"),
      versioned = true))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-table", schema.getOrElse(
      mkSink(parameters).read(sqlContext.sparkSession).schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val starting = parameters.get("startingVersion")
    starting.foreach(s => require(
      s.equalsIgnoreCase("latest") || s.toIntOption.exists(_ >= 0),
      s"startingVersion must be a non-negative snapshot version or " +
        s"'latest', got '$s'"))
    // startingTimestamp (the Delta option's dual): epoch millis or an
    // ISO-8601 instant; resolved against the same commit clock as
    // TIMESTAMP AS OF. Mutually exclusive with startingVersion.
    val startingTs = parameters.get("startingTimestamp").map { s =>
      require(starting.isEmpty,
        "startingVersion and startingTimestamp are mutually exclusive")
      s.toLongOption.getOrElse(try java.time.Instant.parse(s).toEpochMilli
      catch { case _: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"startingTimestamp must be epoch millis or an ISO-8601 " +
            s"instant (e.g. 2024-01-01T00:00:00Z), got '$s'")
      })
    }
    new GraftTableSource(sqlContext, mkSink(parameters),
      schema.getOrElse(
        mkSink(parameters).read(sqlContext.sparkSession).schema),
      changes = parameters.get("mode").contains("changes"),
      startingVersion = starting,
      startingTimestampMs = startingTs)
  }
}

/** One offset = one committed snapshot version of one history
  * generation, rendered as JSON for the checkpoint log. */
private[graft] final case class GraftStreamOffset(generation: String,
    version: Int) extends V1Offset {
  override def json: String =
    s"""{"generation":"$generation","version":$version}"""
}

private[graft] object GraftStreamOffset {
  private val Pat =
    """\{"generation":"([^"]*)","version":(\d+)\}""".r

  /** Parse any V1 offset handed back by the engine (a live
    * [[GraftStreamOffset]], or a `SerializedOffset` replayed from the
    * checkpoint log). */
  def of(o: V1Offset): GraftStreamOffset = o match {
    case g: GraftStreamOffset => g
    case other => other.json match {
      case Pat(g, v) => GraftStreamOffset(g, v.toInt)
      case j => throw new IllegalArgumentException(
        s"unreadable graft-table stream offset: $j")
    }
  }
}

private[graft] final class GraftTableSource(sqlContext: SQLContext,
    sink: TableSink, override val schema: StructType,
    changes: Boolean = false,
    startingVersion: Option[String] = None,
    startingTimestampMs: Option[Long] = None) extends Source {

  private val spark: SparkSession = sqlContext.sparkSession

  /** The EXCLUSIVE lower bound of the first batch (the Delta source's
    * `startingVersion` contract): a consumer started at version N sees
    * (N, head] instead of replaying the full retained history as batch
    * 0; `latest` pins the head AT SOURCE CREATION, so a new consumer of
    * a year-old table sees only post-start commits; a timestamp
    * resolves to the last version committed at or before it (the same
    * clock TIMESTAMP AS OF reads), so the consumer sees exactly the
    * commits after that instant — a pre-history timestamp resolves to
    * no floor = the default full replay. Only the FIRST batch consults
    * this — a checkpointed restart resumes from its own offset, which
    * is why capturing `latest` at (re)creation is safe: the engine
    * hands the checkpoint offset back as `start`. */
  private val initialFloor: Option[Int] = startingVersion.map {
    case s if s.equalsIgnoreCase("latest") => sink.streamHead()._2
    case s => s.toInt
  }.orElse(startingTimestampMs.flatMap(ms => sink.versionAtOrBefore(ms)))

  private def requireSameHistory(gen: String, cur: String): Unit =
    require(gen == cur,
      s"the table's snapshot history was rewritten mid-stream " +
        s"(generation $gen -> $cur): checkpointed offsets are " +
        "unrecoverable — run rewriting maintenance with the stream " +
        "down, then restart the consumer from a fresh checkpoint")

  override def getOffset: Option[V1Offset] = {
    val (gen, head) = sink.streamHead()
    if (head == 0) None else Some(GraftStreamOffset(gen, head))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val e = GraftStreamOffset.of(end)
    val batch: DataFrame = start match {
      case None if initialFloor.exists(_ >= e.version) =>
        // started at/after the current head: nothing to emit yet
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row],
          schema)
      case None if changes => initialFloor match {
        case Some(f) =>
          // startingVersion: first batch = changes in (f, head] only —
          // no full-history replay (refuses loudly if (f, head] needs
          // an expired snapshot, same as any changelog window)
          sink.readChangelog(spark, f, e.version)
        case None =>
          // CDC mode: replay the retained changelog up to `end` (an
          // expiry-orphaned oldest delete commit folds in as post-state
          // inserts — the consumer still reconstructs the table)
          sink.readChangelogAllUpTo(spark, e.version)
      }
      case None if initialFloor.isDefined =>
        // snapshot mode with a floor: appended rows in (f, head] only
        sink.readAppendedBetween(spark, initialFloor.get, e.version)
      case None =>
        // first batch: the table's consistent snapshot at `end` —
        // merge-on-read deletes applied, any history shape serves
        sink.readVersion(spark, e.version)
      case Some(s0) =>
        val s = GraftStreamOffset.of(s0)
        requireSameHistory(s.generation, e.generation)
        if (changes) sink.readChangelog(spark, s.version, e.version)
        else sink.readAppendedBetween(spark, s.version, e.version)
    }
    // the engine requires a streaming-tagged plan; the wrapped RDD is
    // the planned (lazy) batch scan, projected to the declared column
    // order so every micro-batch binds identically
    val aligned = batch.select(schema.fieldNames.map(batch.col): _*)
    sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic
      .SparkSession].internalCreateDataFrame(
      aligned.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableSource[${sink.config.tablePath}]"
}
