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
  *
  * Schema evolution UNDER a live stream (the schema pins at source
  * creation — round-13 matrix):
  *  - ADD COLUMNS: benign — batches keep serving the pinned shape
  *    faithfully; new columns appear on restart (fresh checkpoint).
  *  - RENAME / DROP COLUMN: refused per batch with the restart remedy
  *    ([[TableSink.renamesSince]] / [[TableSink.tombstonedIn]]) — both
  *    would otherwise NULL-fill the pinned shape silently for
  *    post-evolution commits. Delta's schema-change contract.
  *  - WIDENING retype: refused per batch with the restart remedy
  *    ([[TableSink.retypedSince]], round-14 — previously the raw
  *    parquet conversion error); the restart re-pins the WIDE declared
  *    schema (`_graft_schema` beats footer inference at pin time), so
  *    the remedy genuinely heals: old narrow files upcast under it.
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

  /** Schema pin for a source created without an explicit schema: the
    * ALTER-declared schema when one exists (after a type-widening ALTER
    * it is the only schema that reads the mixed narrow/wide file
    * generations — the reader upcasts under it, while footer inference
    * pins whichever type the sampled file carried), else inference. */
  private def pinSchema(sink: TableSink, spark: SparkSession): StructType =
    sink.alterDeclaredSchema.getOrElse(sink.read(spark).schema)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-table", schema.getOrElse(
      pinSchema(mkSink(parameters), sqlContext.sparkSession)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val starting = parameters.get("startingVersion")
    starting.foreach(s => require(
      s.equalsIgnoreCase("latest") || s.toIntOption.exists(_ >= 1),
      s"startingVersion must be a positive snapshot version or " +
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
    val ignoreChanges =
      parameters.get("ignoreChanges").exists(_.toBoolean)
    require(!(ignoreChanges && parameters.get("mode").contains("changes")),
      "ignoreChanges applies to the snapshot stream only — the CDC " +
        "stream (readChangesStream) already emits update/delete commits " +
        "as retraction rows")
    new GraftTableSource(sqlContext, mkSink(parameters),
      schema.getOrElse(
        pinSchema(mkSink(parameters), sqlContext.sparkSession)),
      changes = parameters.get("mode").contains("changes"),
      startingVersion = starting,
      startingTimestampMs = startingTs,
      ignoreChanges = ignoreChanges)
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
    startingTimestampMs: Option[Long] = None,
    ignoreChanges: Boolean = false) extends Source {

  private val spark: SparkSession = sqlContext.sparkSession

  /** The table-column slice of the source schema — the change-feed
    * metadata columns ride at the end in changes mode and are produced
    * by the changelog reader, never read from files. */
  private val tableSchema: StructType =
    if (changes)
      StructType(schema.fields.filterNot(f =>
        f.name == "_change_type" || f.name == "_change_version"))
    else schema

  /** Every micro-batch reads under this PINNED declared schema — never
    * footer inference. The streaming source plans batches against live
    * table files, and a concurrent copy-on-write rewrite may delete
    * them between manifest resolution and a footer read; with the
    * schema declared there are no planning-time footer reads at all
    * (only the file listing), which shrinks that window to the listing
    * itself — and [[getBatch]]'s missing-file re-check converts what
    * remains into the precise generation-flip refusal. */
  private val pinned: TableSink =
    if (sink.config.tableSchema.isDefined) sink
    else new TableSink(sink.config.copy(tableSchema = Some(tableSchema)))

  private val headAtCreation: Int = sink.streamHead()._2

  /** The exclusive lower bound the first batch derives from a STABLE
    * start option (numeric version or timestamp — NOT `latest`). The
    * public contract is Delta's, INCLUSIVE: `startingVersion = N`
    * emits changes starting from commit N, i.e. [N, head], so the
    * internal exclusive floor is N-1. A timestamp resolves to the last
    * version committed STRICTLY BEFORE it (the consumer sees every
    * commit at or after the instant — Delta's `startingTimestamp`);
    * a pre-history instant resolves to no floor = the default full
    * replay. The floor binds ONLY the first (checkpoint-less) batch:
    * the version cap above keeps `floor <= headAtCreation`, and a fresh
    * stream's first end offset is >= the creation head, so every later
    * checkpointed window already starts at or above the floor — while a
    * RESTART must resume from its offset and ignore the option (Delta's
    * contract; carrying `max(offset, floor)` there would let a restart
    * with a higher startingVersion silently skip (offset, N-1]). */
  private val stableFloor: Option[Int] = startingVersion.flatMap {
    case s if s.equalsIgnoreCase("latest") => None
    case s =>
      val n = s.toInt
      require(n <= headAtCreation + 1,
        s"startingVersion $n does not exist: the table head is " +
          s"v$headAtCreation (${headAtCreation + 1} = 'only commits " +
          "after stream start', same as 'latest' on a caught-up table)")
      Some(n - 1)
  }.orElse(startingTimestampMs.flatMap(ms => sink.versionBefore(ms)))

  /** `latest` pins the head AT SOURCE CREATION, and only the FIRST
    * batch consults it: a checkpointed restart resumes from its own
    * offset (the engine hands it back as `start`), and the re-pinned
    * creation head of the restarted source must NOT mask commits that
    * landed between the checkpoint and the restart. */
  private val latestFloor: Option[Int] =
    startingVersion.filter(_.equalsIgnoreCase("latest"))
      .map(_ => headAtCreation)

  private val initialFloor: Option[Int] = stableFloor.orElse(latestFloor)

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

  private def emptyBatch(): DataFrame = spark.createDataFrame(
    java.util.Collections.emptyList[org.apache.spark.sql.Row], schema)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val e = GraftStreamOffset.of(end)
    // a concurrent rewriting op can delete this batch's files between
    // the manifest resolution and any planning-time read (file listing,
    // delete-sidecar load): re-check the generation pin on ANY
    // missing-file symptom and refuse precisely — the raw
    // FileNotFoundException surfaces only if the history did NOT flip
    // (a genuinely corrupt table, which should stay loud and raw)
    try getBatchInner(start, e)
    catch {
      case t: Throwable if TableSink.isMissingFileError(t) =>
        requireSameHistory(e.generation, sink.streamHead()._1)
        throw t
    }
  }

  private def getBatchInner(start: Option[V1Offset],
      e: GraftStreamOffset): DataFrame = {
    // RENAME drift: a rename committed after this stream pinned its
    // schema means post-rename files read NULL under the pinned name and
    // the folded output column no longer matches the declared shape —
    // refuse precisely (Delta's schema-change contract: fail, restart
    // from a fresh checkpoint so the schema re-pins) instead of dying in
    // the projection's generic unresolved-column error
    val drift = sink.renamesSince(tableSchema)
    require(drift.isEmpty,
      "the table's columns were RENAMED after this stream pinned its " +
        s"schema (${drift.map { case (o, n) => s"$o -> $n" }.mkString(", ")}" +
        "): restart the stream from a fresh checkpoint so its schema " +
        "re-pins at the renamed head")
    // DROP drift, same contract: post-drop commits NULL-fill a dropped
    // column silently under the pinned shape — refuse, restart re-pins
    val droppedCols = sink.tombstonedIn(tableSchema)
    require(droppedCols.isEmpty,
      "columns were DROPPED after this stream pinned its schema " +
        s"(${droppedCols.mkString(", ")}): post-drop commits NULL-fill " +
        "them silently under the pinned shape; restart the stream from " +
        "a fresh checkpoint so its schema re-pins at the evolved head")
    // WIDEN drift, completing the evolution matrix (round-14): a
    // type-widening ALTER after the pin means post-widen files carry a
    // physically wider type — the parquet reader would fail the batch
    // with a raw conversion error under the pinned narrow shape. Same
    // named refusal + remedy as RENAME/DROP; the restart genuinely
    // heals because a fresh source pins the WIDE declared schema
    // (see [[GraftTableStream.pinSchema]]) and old narrow files upcast.
    val retyped = sink.retypedSince(tableSchema)
    require(retyped.isEmpty,
      "columns were RETYPED (type-widening ALTER) after this stream " +
        s"pinned its schema (${retyped.map { case (c, from, to) =>
          s"$c: ${from.sql} -> ${to.sql}" }.mkString(", ")}): post-widen " +
        "files carry the wider physical type and cannot serve the " +
        "pinned shape; restart the stream from a fresh checkpoint so " +
        "its schema re-pins at the widened head")
    val batch: DataFrame = start match {
      case None if initialFloor.exists(_ >= e.version) =>
        // started at/after the current head: nothing to emit yet
        emptyBatch()
      case None if changes => initialFloor match {
        case Some(f) =>
          // startingVersion/startingTimestamp: first batch = changes in
          // (f, head] only — no full-history replay (refuses loudly if
          // (f, head] needs an expired snapshot, same as any window)
          pinned.readChangelog(spark, f, e.version)
        case None =>
          // CDC mode: replay the retained changelog up to `end` (an
          // expiry-orphaned oldest delete commit folds in as post-state
          // inserts — the consumer still reconstructs the table)
          pinned.readChangelogAllUpTo(spark, e.version)
      }
      case None if initialFloor.isDefined =>
        // snapshot mode with a floor: appended rows in (f, head] only
        pinned.readAppendedBetween(spark, initialFloor.get, e.version,
          ignoreChanges)
      case None =>
        // first batch: the table's consistent snapshot at `end` —
        // merge-on-read deletes applied, any history shape serves
        pinned.readVersion(spark, e.version)
      case Some(s0) =>
        val s = GraftStreamOffset.of(s0)
        requireSameHistory(s.generation, e.generation)
        // checkpointed windows resume from their own offset — the floor
        // bound the first batch only (see [[stableFloor]])
        val from = s.version
        if (from >= e.version) emptyBatch()
        else if (changes) pinned.readChangelog(spark, from, e.version)
        else pinned.readAppendedBetween(spark, from, e.version,
          ignoreChanges)
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
