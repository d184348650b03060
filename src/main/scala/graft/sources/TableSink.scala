package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Partition-transform-aware table sink (reference: connector.py K1-K10,
  * SURVEY.md §2.3) on partitioned Parquet/ORC.
  *
  * Reference semantics → Spark mapping:
  *  - partition-key grouping before write (connector.py:326-335, a Python
  *    defaultdict) → `repartition(derivedCols)` shuffle + `partitionBy`,
  *    which clusters rows per partition value across the cluster and writes
  *    one file per (task, partition-value) — the same write-side clustering
  *    that enables read-side partition pruning, at any scale;
  *  - buffer + size/time flush (connector.py:147-199) → micro-batch
  *    boundaries (`Trigger.ProcessingTime`) in [[startStream]];
  *  - commit retry + backoff (connector.py:242-257) → realized
  *    Iceberg-style as OPTIMISTIC snapshot commits
  *    ([[commitAppendedFiles]]): the next version file is claimed by
  *    atomic write-then-rename, a losing committer re-reads the head and
  *    retries — append commits commute, so concurrent writers merge
  *    instead of serializing through one process (streaming keeps the
  *    file-sink `_spark_metadata` log's exactly-once contract);
  *  - create-if-missing (connector.py:358-393) → first write creates the
  *    table directory; [[read]] applies the declared schema if configured.
  *
  * Scale notes: the repartition keys on the *derived* partition values, so
  * low-cardinality specs (e.g. 5 event types) would bottleneck on 5 tasks;
  * `numPartitions > 1` adds a uniform salt to spread each partition value
  * over several writers (the reference's `num_partitions` parallel writers,
  * connector.py:456-468) while still writing into the same directories.
  */
object TableSink {

  /** True when any cause in `t`'s chain is a missing-file symptom — a
    * raw [[java.io.FileNotFoundException]] (scan task or footer read
    * hitting a deleted file), Spark's "Path does not exist" listing
    * error, or this engine's own "snapshot … does not exist" refusal.
    * The streaming source and the replication apply use it to tell a
    * concurrent history rewrite (files legitimately deleted mid-batch —
    * re-check the generation, refuse precisely) from genuine corruption
    * (rethrow raw). */
  def isMissingFileError(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).exists {
      case _: java.io.FileNotFoundException => true
      // message matches are pinned to the two KNOWN missing-path shapes
      // (Spark's listing error and this engine's snapshot refusal). A
      // bare "does not exist" substring would also catch unrelated
      // failures — e.g. an AnalysisException "Table or view does not
      // exist" raised inside a foreachBatch — and convert them into the
      // "rewritten mid-stream" refusal, masking the real error.
      case e => Option(e.getMessage).exists(m =>
        m.contains("Path does not exist") ||
          (m.contains("napshot") && m.contains("does not exist")))
    }

  /** Bit test against a hex Bloom bitmap (64-bit lanes, lane 0 first;
    * lane renders as 16 hex chars, most significant nibble first): bit
    * `p` lives in lane p/64 at bit p%64 — nibble char
    * lane*16 + (15 - (p%64)/4), bit (p%64)%4. Builtin codegen'd
    * expressions only. Shared by BloomSkip probes and the SQL door's
    * scan-planning pruner. */
  private[graft] def bloomBitSet(m: Column, p: Column): Column = {
    val j = pmod(p, lit(64))
    val lane = ((p - j) / lit(64)).cast("int")
    val nibOfLane = ((j - pmod(j, lit(4))) / lit(4)).cast("int")
    val charIdx = lane * lit(16) + lit(15) - nibOfLane + lit(1)
    val nib = conv(m.substr(charIdx, lit(1)), 16, 10).cast("int")
    val bitInNib = pmod(j, lit(4)).cast("int")
    val mask = when(bitInNib === 0, 1).when(bitInNib === 1, 2)
      .when(bitInNib === 2, 4).otherwise(8)
    nib.bitwiseAND(mask) =!= 0
  }

  /** Percent-decode a URI path component: %XX sequences ONLY. `url_decode`
    * / `URLDecoder` are FORM decoders — they also turn a literal '+' into
    * a space, and Spark's `escapePathName` does not escape '+', so a data
    * file under a partition value like `a+b` would decode to `a b`, fail
    * its path join, and silently lose its stats entry (pruning disabled
    * for that file) or skew metadata accounting. Pre-escaping '+' to %2B
    * makes the form decoder behave as a pure %XX decoder. */
  private[graft] def decodePath(c: Column): Column =
    url_decode(regexp_replace(c, "\\+", "%2B"))

  /** Driver-side twin of [[decodePath]]. */
  private[graft] def decodePath(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  /** Render a zone-stat bound for persistence. TIMESTAMP bounds persist
    * as EPOCH MICROS (timezone-independent) — a cast-to-string render
    * would use the WRITER's session timezone with no zone designator, and
    * a reader in a different session timezone would parse it back to a
    * different instant, shifting the bounds and letting pruning skip a
    * file that contains matching rows. `unix_micros` is monotonic, so
    * min/max commute with the encoding. All other types render by cast
    * (DATE and TIMESTAMP_NTZ strings carry no timezone). */
  private[graft] def zoneRender(v: Column, dt: String): Column =
    if (dt.equalsIgnoreCase("TIMESTAMP")) unix_micros(v).cast("string")
    else v.cast("string")

  /** Parse a persisted zone bound back to its typed value. TIMESTAMP
    * entries written before the epoch-micros encoding (session-rendered,
    * no designator) are NOT absolutely parseable — they yield NULL here
    * and [[zoneLegacy]] flags them so probes keep the file. */
  private[graft] def zoneBound(raw: Column, dt: String): Column =
    if (dt.equalsIgnoreCase("TIMESTAMP"))
      when(raw.rlike("^-?[0-9]+$"), timestamp_micros(raw.cast("long")))
    else raw.cast(dt)

  /** TRUE when `raw` is a legacy session-rendered TIMESTAMP bound whose
    * instant cannot be recovered — the probe must treat the file as
    * unanalyzed (keep), never prune on an unparseable bound. */
  private[graft] def zoneLegacy(raw: Column, dt: String): Column =
    if (dt.equalsIgnoreCase("TIMESTAMP"))
      raw.isNotNull && !raw.rlike("^-?[0-9]+$")
    else lit(false)

  /** One registered Bloom column: filter geometry + the hashed type
    * (xxhash64 is type-sensitive — probes cast to `dtype` first). */
  private[graft] final case class BloomSpec(col: String, bits: Int, k: Int,
      dtype: String) {
    require(bits > 0 && bits % 64 == 0 && bits <= 16384,
      s"bloom bits must be a positive multiple of 64 <= 16384, got $bits")
    require(k > 0, "bloom needs a positive hash count")
  }

  /** Fold each old physical column into its renamed successor: both
    * present → coalesce (exactly one is non-null per row, each file
    * carries one name generation); only old → plain rename. Column-wise
    * `withColumn`/`drop` so unrelated columns (`_metadata` included)
    * pass through untouched. Shared by the library read paths and the
    * SQL catalog's projected scan over renamed tables. */
  private[graft] def applyRenames(df: DataFrame,
      renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (old, nw)) =>
      def has(c: String) = d.columns.exists(_.equalsIgnoreCase(c))
      if (has(old) && has(nw))
        d.withColumn(nw, coalesce(col(nw), col(old))).drop(old)
      else if (has(old)) d.withColumnRenamed(old, nw)
      else d
    }

  /** A declared read schema for a renamed table must also REQUEST the
    * old physical names, or pre-rename files would serve NULL for the
    * renamed column; the extra fields read as null from post-rename
    * files and [[applyRenames]] folds them away. */
  private[graft] def augmentWithRenameSources(declared: StructType,
      renames: Map[String, String]): StructType =
    renames.foldLeft(declared) { case (s, (old, nw)) =>
      val tpe = s.fields.find(_.name.equalsIgnoreCase(nw)).map(_.dataType)
      if (tpe.isEmpty || s.fieldNames.exists(_.equalsIgnoreCase(old))) s
      else s.add(org.apache.spark.sql.types.StructField(old, tpe.get,
        nullable = true))
    }

  /** A relative data-file path's partition-directory SPINE signature:
    * the ordered `col=`-style directory names above the file. Files
    * written under the same partition spec share a spine; a table whose
    * manifest mixes spines has lived through partition-spec evolution
    * and cannot be read in one `basePath` load (see [[TableSink
    * .readFiles]]'s generation grouping). */
  private[graft] def spineOf(rel: String): Seq[String] =
    rel.split('/').dropRight(1)
      .takeWhile(_.contains('=')).map(_.takeWhile(_ != '=')).toSeq

  /** Name of the optional per-row partition-override map column consumed by
    * [[TableSink.withDerived]] (reference models.py:62-63 `partition_data`). */
  val PartitionDataCol = "_partition_data"

  /** Default [[TableSink.removeOrphans]] grace window (24 h) — generous
    * versus the seconds-scale life of a staged write so a concurrent
    * committer's not-yet-claimed files are never swept (Iceberg's
    * `older_than` defaults to 3 days for the same reason). */
  val DefaultOrphanGraceMs: Long = 24L * 60 * 60 * 1000
}

final class TableSink(val config: SinkConfig) {

  /** Derived partition columns per the spec (K7 `_partition_records`). */
  def derivedColumns(df: DataFrame): Seq[(String, Column)] =
    config.partitionSpec.map { pf =>
      // case-INSENSITIVE source lookup (round-14): Spark resolves the
      // col() reference case-insensitively, so the type probe must too —
      // StructType.apply is case-sensitive and threw on a batch whose
      // names differ only in case
      val dt = df.schema.fields
        .find(_.name.equalsIgnoreCase(pf.source))
        .getOrElse(throw new IllegalArgumentException(
          s"partition source column '${pf.source}' is missing from the " +
            s"batch (${df.columns.mkString(", ")})"))
        .dataType
      pf.columnName -> pf.transform(col(pf.source), dt)
    }

  /** Input df + derived partition columns appended (idempotent for identity
    * transforms, which reuse the source column).
    *
    * `partition_data` per-message override (reference models.py:62-63 — the
    * reference declares the field and never consumes it; here it is honored):
    * if the input carries a `_partition_data` MAP<STRING,STRING> column, an
    * entry keyed by a derived partition column's name overrides the
    * transform-derived value for that row (cast to the derived type); rows
    * without an entry fall back to the transform. The map column itself is
    * metadata, not record data, and is dropped before the write. Identity
    * partition columns that already exist in the data are the data — they
    * are not overridable (a row cannot carry two values in one column).
    */
  def withDerived(df: DataFrame): DataFrame = {
    val hasOverride = df.columns.contains(TableSink.PartitionDataCol)
    val derived = derivedColumns(df)
    // resolve each derived column's type once, from a plan-only probe (no
    // job): the override string is cast to exactly that type
    lazy val probeSchema = derived.foldLeft(df) { case (d, (name, c)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, c)
    }.schema
    val withCols = derived.foldLeft(df) { case (d, (name, c)) =>
      if (d.columns.contains(name)) d
      else {
        // try_element_at: under ANSI mode (Spark 4 default) element_at
        // THROWS on a missing key, but a row legitimately overrides only
        // some partition columns — absent keys must fall back, not fail.
        // A PRESENT but malformed value still fails the job (ANSI cast):
        // a caller-supplied partition value that cannot be honored is a
        // data error, not something to silently ignore.
        val value =
          if (hasOverride)
            coalesce(
              try_element_at(col(TableSink.PartitionDataCol), lit(name))
                .cast(probeSchema(name).dataType), c)
          else c
        d.withColumn(name, value)
      }
    }
    if (hasOverride) withCols.drop(TableSink.PartitionDataCol) else withCols
  }

  private def partitionColNames: Seq[String] =
    config.partitionSpec.map(_.columnName)

  /** Cluster rows by partition value (+ salt for writer parallelism) and
    * sort within each writer per `sortOrder` (honoring the knob the
    * reference declares but never uses — models.py:187-190).
    */
  private def clusterForWrite(df: DataFrame): DataFrame = {
    val parts = partitionColNames
    // OPTIMIZATION r14 (guide §6 file sizing, §2.2 scale-adaptive
    // partitioning): partitioned writes cluster via the REBALANCE hint on
    // the partition columns instead of the former fixed hash salt
    // (pmod(hash(all cols), numPartitions)). The salt unconditionally
    // fragmented EVERY partition value into ~numPartitions files — at
    // fixture scale that quadrupled the file count (266 → 68 data files
    // for the events roundtrip, measured) and charged every append and
    // every subsequent read ~per-file writer/open overhead; at 100 TB a
    // fixed spread is wrong in the other direction (4 writers for a
    // multi-TB partition value). AQE's rebalance derives writer
    // parallelism from the DATA: small values coalesce toward one file,
    // values above spark.sql.adaptive.advisoryPartitionSizeInBytes split
    // across writers — the adaptive form of exactly what the salt
    // approximated. numPartitions keeps its role for unpartitioned
    // layouts (and in config validation/presets); rows-per-file within a
    // value is layout only — reads, constraints, and the oracle compare
    // values, never file boundaries.
    val clustered =
      if (parts.isEmpty) df.repartition(config.numPartitions)
      else if (config.numPartitions > 1) df.hint("rebalance", parts: _*)
      else df.repartition(parts.map(col): _*)
    if (config.sortOrder.nonEmpty)
      clustered.sortWithinPartitions(config.sortOrder.map(col): _*)
    else clustered
  }

  /** Guard against mixing the batch and streaming writers on one table:
    * once a streaming file sink has created `_spark_metadata`, reads trust
    * only that log and batch-appended files would silently disappear. */
  private def requireNoStreamingLog(): Unit = {
    val meta = new org.apache.hadoop.fs.Path(
      config.tablePath, "_spark_metadata")
    require(!WarehouseIO.exists(meta),
      s"table ${config.tablePath} is a streaming-sink table " +
        "(_spark_metadata present); batch append would write files the " +
        "sink log hides from readers — use startStream, or a different table")
  }

  /** K5/K6 batch append: coerce → derive → cluster → atomic append. */
  def append(df: DataFrame): Unit = {
    requireNoStreamingLog()
    writeAndCommit(clusterForWrite(withDerived(Ops.ensureMessage(df))))
  }

  /** Batch append that PRESERVES the caller's physical clustering (e.g. a
    * [[ZOrder.cluster]] layout): the sink's own repartition/sort is
    * skipped — each incoming partition writes straight to one file — while
    * everything else (input coercion, derived partition columns, format,
    * snapshot log) matches [[append]]. The normal append would re-shuffle
    * into `numPartitions` writers and destroy the range-clustered layout
    * zone maps depend on. */
  def appendClustered(df: DataFrame): Unit = {
    requireNoStreamingLog()
    writeAndCommit(withDerived(Ops.ensureMessage(df)))
  }

  /** Append commit protocol — O(added files), WAP-safe. A versioned append
    * must NOT snapshot (or even LIST) the whole live directory: a
    * directory walk per commit is O(total files) driver work — quadratic
    * over table lifetime, the kind of metadata cost that kills a
    * 100 TB table with millions of files — and unpublished branch appends
    * share the directory, so a whole-directory snapshot would also
    * publish staged, unaudited rows. Instead the write is STAGED
    * ([[stagedWrite]]): the commit already knows exactly which files it
    * produced and records `head manifest + exactly those`, touching no
    * other file metadata. The one remaining walk on this path is the
    * FIRST commit over pre-existing unversioned data (bootstrapping the
    * manifest), paid once per table. Files referenced by no manifest
    * (staged branch files, crash orphans) stay out of main's history —
    * the same isolation Iceberg's manifest-list commit gives. */
  /** Persist the write-relevant config as a `_graft_config` sidecar so a
    * DIFFERENT writer reaching the same table — the SQL catalog's INSERT
    * path builds its own [[TableSink]] — applies the same
    * CHECK-constraint gate, sort order, writer parallelism, format, and
    * versioning instead of silently writing under defaults. Values are
    * URL-encoded (constraints are arbitrary SQL text); refreshed on
    * every append (tiny atomic overwrite). */
  private def persistConfigHints(): Unit = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val lines =
      Seq(s"fileFormat=${config.fileFormat}",
        s"numPartitions=${config.numPartitions}",
        s"versioned=${config.versioned}") ++
      (if (config.sortOrder.isEmpty) Nil
       else Seq(s"sortOrder=${config.sortOrder.map(enc).mkString(",")}")) ++
      config.checkConstraints.map(c => s"constraint=${enc(c)}") ++
      // the partition spec, so the catalog can rebuild THIS writer for
      // SQL DML on partitioned tables (identity specs become writable;
      // hidden transforms stay read-only — see GraftCatalog.fileTable)
      config.partitionSpec.map(pf => "partition=" + (Seq(enc(pf.source),
        enc(Transform.render(pf.transform))) ++
        pf.explicitName.map(enc)).mkString(":"))
    WarehouseIO.writeStringAtomic(
      new org.apache.hadoop.fs.Path(config.tablePath, "_graft_config"),
      lines.mkString("\n"))
  }

  private def writeAndCommit(prepared: DataFrame): Unit = {
    if (!config.versioned) {
      // no staging area to validate after the fact — check BEFORE the
      // write (one extra pass over the batch, the documented cost of
      // constraints without a snapshot log; a refused append must leave
      // no trace, so the hints persist only after the gate)
      requireConstraints(prepared, "append")
      persistConfigHints()
      val writer = prepared.write
        .mode("append")
        .format(config.fileFormat)
        .options(config.extraOptions)
      (if (partitionColNames.nonEmpty) writer.partitionBy(partitionColNames: _*)
       else writer).save(config.tablePath)
    } else {
      val added = stagedWrite(prepared) // validates constraints in staging
      persistConfigHints()
      // stats upkeep IS the commit: the delta manifest's entries carry
      // the new files' zone/bloom stats (one bounded job over exactly
      // the added files, driven by the log-resident registry)
      commitAppendedFiles(added,
        stats = manifestStatsFor(prepared.sparkSession, added,
          prepared.schema))
    }
  }

  // --------------------------------------- manifest-entry column stats
  // Per-file zone (min/max) and Bloom stats live IN the delta manifest
  // entry (`path\tjson` lines — Iceberg's lower_bounds/upper_bounds
  // model): one metadata source of truth, pruning reads no second
  // sidecar, upkeep is part of the commit itself, and stats die with
  // their manifest on expiry/rewrite — no separate GC. WHICH columns get
  // stats is the registry below, a tiny log-resident spec written by
  // ZoneMaps/BloomSkip.analyze (log-resident on purpose: a rewrite that
  // expires the log drops the spec with the stats — re-analyze, same
  // contract as before). Unversioned tables have no manifest to carry
  // stats, so they keep the parquet-sidecar analyze (with no upkeep
  // path — their appends never maintained stats anyway).

  private def statsSpecPath: org.apache.hadoop.fs.Path = logFile("stats_spec")

  /** (zone columns with their recorded type, bloom specs). */
  private[graft] def readStatsSpec(): (Seq[(String, String)], Seq[TableSink.BloomSpec]) = {
    if (!WarehouseIO.isFile(statsSpecPath)) return (Nil, Nil)
    def dec(x: String) = java.net.URLDecoder.decode(x, "UTF-8")
    val lines = WarehouseIO.readString(statsSpecPath).linesIterator.toSeq
    (lines.collect { case l if l.startsWith("z:") =>
      l.stripPrefix("z:").split(":", 2) match {
        case Array(c, dt) => dec(c) -> dec(dt)
      }
    },
      lines.collect { case l if l.startsWith("b:") =>
        l.stripPrefix("b:").split(":", 4) match {
          case Array(c, b, k, dt) =>
            TableSink.BloomSpec(dec(c), b.toInt, k.toInt, dec(dt))
        }
      })
  }

  private[graft] def writeStatsSpec(zone: Seq[(String, String)],
      bloom: Seq[TableSink.BloomSpec]): Unit = {
    def enc(x: String) = java.net.URLEncoder.encode(x, "UTF-8")
    WarehouseIO.writeStringAtomic(statsSpecPath,
      (zone.map { case (c, dt) => s"z:${enc(c)}:${enc(dt)}" } ++
        bloom.map(b => s"b:${enc(b.col)}:${b.bits}:${b.k}:${enc(b.dtype)}"))
        .mkString("\n"))
  }

  /** The k Bloom bit positions of `v` under (`bits`, `k`) — the same
    * xxhash64 family on write and probe, computed by Spark expressions
    * on both sides so no driver-side hash reimplementation can drift. */
  private[graft] def bloomPositions(v: Column, bits: Int, k: Int): Column =
    when(v.isNotNull, array((0 until k).map(i =>
      pmod(xxhash64(lit(i), v), lit(bits)).cast("int")): _*))

  /** ONE bounded Spark job over exactly `rels` (the files one commit
    * added, or a refold's full head): per-file stats JSON for every
    * registered column present in `schema` at its registered type —
    * `{"n":rows,"z":{col:[min,max]},"b":{col:{bits,k,dt,m}}}` with
    * min/max as strings (cast back at probe time) and the Bloom filter
    * as a hex bitmap (64-bit lanes, lane 0 first — ~2 chars/byte keeps a
    * 4096-bit filter at 1 KB per entry, vs ~20 KB as a position list).
    * Mismatched or absent columns skip — their files read as unanalyzed,
    * conservative by contract. Returns rel-path → json. */
  private[graft] def manifestStatsFor(spark: SparkSession,
      rels: Seq[String], schema: StructType): Map[String, String] = {
    if (rels.isEmpty || !config.versioned) return Map.empty
    val (zoneAll, bloomAll) = readStatsSpec()
    def typeOk(c: String, dt: String) =
      schema.fieldNames.contains(c) && schema(c).dataType.sql == dt
    val zone = zoneAll.filter { case (c, dt) => typeOk(c, dt) }
    val bloom = bloomAll.filter(b => typeOk(b.col, b.dtype))
    if (zone.isEmpty && bloom.isEmpty) return Map.empty
    if (rels.exists(_.startsWith("/"))) return Map.empty // clone: materialize first
    val df = spark.read.format(config.fileFormat).schema(schema)
      .option("basePath", config.tablePath)
      .load(rels.map(rel => s"${config.tablePath}/$rel"): _*)
    // zone layer: one plain aggregate per file (codegen'd min/max);
    // TIMESTAMP bounds render as epoch micros — timezone-independent
    val zoneAggs = zone.flatMap { case (c, dt) =>
      Seq(TableSink.zoneRender(min(col(c)), dt).as(s"__zmin_$c"),
        TableSink.zoneRender(max(col(c)), dt).as(s"__zmax_$c"))
    }
    val grouped = df.groupBy(input_file_name().as("__file"))
      .agg((count(lit(1)).as("__n") +: zoneAggs).head,
        (count(lit(1)).as("__n") +: zoneAggs).tail: _*)
    // bloom layer: explode → distinct → collect per (file, col) — the
    // shuffle key is (file, col, position), so partial aggregation
    // bounds executor state at `bits` ints per group; the hex bitmap
    // renders ONCE per (file, col) from the distinct-position array
    // (O(bits/64 · |ps|) driver-free expression work), never per row
    val bloomDf: Option[DataFrame] =
      if (bloom.isEmpty) None
      else {
        val tagged = array(bloom.map { b =>
          struct(lit(b.col).as("c"),
            bloomPositions(col(b.col), b.bits, b.k).as("ps"),
            lit(b.bits).as("bits"), lit(b.k).as("k"),
            lit(b.dtype).as("dt"))
        }: _*)
        Some(df.select(input_file_name().as("__file"), explode(tagged).as("t"))
          .select(col("__file"), col("t.c").as("c"), col("t.bits").as("bits"),
            col("t.k").as("k"), col("t.dt").as("dt"),
            explode(col("t.ps")).as("p"))
          .distinct()
          .groupBy("__file", "c", "bits", "k", "dt")
          .agg(sort_array(collect_set(col("p"))).as("ps"))
          .withColumn("m", expr("""concat_ws('', transform(
            transform(sequence(0, CAST(bits / 64 AS INT) - 1),
              L -> aggregate(filter(ps, p -> p div 64 = L),
                CAST(0 AS BIGINT),
                (acc, p) -> acc | shiftleft(CAST(1 AS BIGINT), pmod(p, 64)))),
            lane -> lpad(hex(lane), 16, '0')))"""))
          .groupBy(col("__file"))
          .agg(map_from_arrays(collect_list(col("c")),
            collect_list(struct(col("bits"), col("k"),
              col("dt"), col("m")))).as("__b")))
      }
    val zMap =
      if (zone.isEmpty) lit(null).cast("map<string,array<string>>")
      else map(zone.flatMap { case (c, _) =>
        Seq(lit(c), array(col(s"__zmin_$c"), col(s"__zmax_$c")))
      }: _*)
    val joined = bloomDf match {
      case Some(bdf) => grouped.join(bdf, Seq("__file"), "left")
      case None => grouped.withColumn("__b",
        lit(null).cast("map<string,struct<bits:int,k:int,dt:string,m:string>>"))
    }
    val rows = joined.select(col("__file"),
      to_json(struct(col("__n").as("n"), zMap.as("z"), col("__b").as("b")))
        .as("__json")).collect()
    val rootPath = new org.apache.hadoop.fs.Path(config.tablePath)
    val rootStr = WarehouseIO.fs(rootPath).makeQualified(rootPath).toString
    rows.flatMap { r =>
      val raw = TableSink.decodePath(r.getString(0))
      val rel =
        if (raw.startsWith(rootStr)) raw.stripPrefix(rootStr).stripPrefix("/")
        else raw.replaceFirst("^[a-z][a-zA-Z0-9+.-]*:(//)?", "")
          .stripPrefix(rootStr.replaceFirst("^[a-z][a-zA-Z0-9+.-]*:(//)?", ""))
          .stripPrefix("/")
      if (rels.contains(rel)) Some(rel -> r.getString(1)) else None
    }.toMap
  }

  /** Register the stats spec and FOLD the head into one stats-bearing
    * manifest, claimed as a metadata-only snapshot (compactManifests
    * with stats) — how analyze() backfills stats for every live file.
    * Returns the new head version. */
  private[graft] def commitStatsRefold(spark: SparkSession,
      zone: Seq[(String, String)], bloom: Seq[TableSink.BloomSpec],
      maxAttempts: Int = 20): Int = {
    require(config.versioned && snapshotVersions().nonEmpty,
      "manifest stats need a versioned table with at least one commit")
    writeStatsSpec(zone, bloom)
    val schema = config.tableSchema.getOrElse(read(spark).schema)
    var attempt = 0
    while (true) {
      attempt += 1
      val head = snapshotVersions().last
      val rels = manifestFiles(head)
      require(!rels.exists(_.startsWith("/")),
        "stats refold on a shallow clone is not supported — materialize " +
          "the clone first (compact)")
      val stats = manifestStatsFor(spark, rels, schema)
      val merged = WarehouseIO.writeManifestLines(logPath,
        rels.distinct.sorted.map(r => stats.get(r).fold(r)(j => s"$r\t$j")))
      if (WarehouseIO.writeStringIfAbsent(logFile(f"v${head + 1}%05d.list"),
          WarehouseIO.renderSnapshot(Seq(merged))))
        return head + 1
      WarehouseIO.delete(logFile(merged))
      require(attempt < maxAttempts,
        s"stats refold lost the version race $maxAttempts times")
    }
    -1 // unreachable
  }

  /** JSON schema of a manifest stats entry. */
  private val manifestStatsSchema =
    "n BIGINT, z MAP<STRING, ARRAY<STRING>>, " +
      "b MAP<STRING, STRUCT<bits: INT, k: INT, dt: STRING, m: STRING>>"

  /** SCAN-PLANNING file pruning for the SQL door — the Iceberg manifest
    * evaluation step: given the catalyst conjuncts a query pushed down,
    * consult the head manifests' per-file stats and return the SURVIVOR
    * subset of `allPaths` (absolute), or None when nothing prunes
    * (no stats, no translatable predicate, or every file survives — the
    * caller then scans the original table unchanged). Translation is
    * deliberately conservative: only top-level attribute-vs-literal
    * comparisons contribute (EqualTo/EqualNullSafe → zone bounds + a
    * Bloom probe when registered; >/>=/</<= → one-sided zone bounds);
    * anything else is ignored, and files lacking a stats entry for a
    * referenced column always survive. Cost: one bounded Spark job over
    * the manifest text at planning time — exactly the trade Iceberg
    * makes for reading 10 files instead of 10 000. */
  private[graft] def planCandidates(spark: SparkSession,
      allPaths: Seq[String],
      conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions._
    val hiddenSpec = config.partitionSpec
      .filter(_.transform != Transform.Identity)
    val statsOpt = manifestStatsDf(spark)
    // nothing to prune WITH: no manifest stats and no hidden transforms
    if (statsOpt.isEmpty && hiddenSpec.isEmpty) return None
    val schema = config.tableSchema.getOrElse(
      scala.util.Try(read(spark).schema).getOrElse(return None))
    def litCol(l: Literal): Column =
      org.apache.spark.sql.graft.Bridge.column(l)
    // (column, lo, hi) closed bounds; None side = unbounded
    val bounds = scala.collection.mutable.Buffer
      .empty[(String, Option[Column], Option[Column])]
    val probes = scala.collection.mutable.Buffer.empty[(String, Column)]
    // IN-lists: zone keeps the [least, greatest] ENVELOPE (a superset —
    // conservative); bloom keeps a file admitting ANY member
    val inProbes = scala.collection.mutable.Buffer
      .empty[(String, Seq[Column])]
    def name(e: Expression): Option[String] = e match {
      case a: Attribute => Some(a.name)
      case _ => None
    }
    conjuncts.foreach {
      case EqualTo(a, l: Literal) if name(a).isDefined && l.value != null =>
        bounds += ((name(a).get, Some(litCol(l)), Some(litCol(l))))
        probes += ((name(a).get, litCol(l)))
      case EqualTo(l: Literal, a) if name(a).isDefined && l.value != null =>
        bounds += ((name(a).get, Some(litCol(l)), Some(litCol(l))))
        probes += ((name(a).get, litCol(l)))
      case EqualNullSafe(a, l: Literal)
          if name(a).isDefined && l.value != null =>
        bounds += ((name(a).get, Some(litCol(l)), Some(litCol(l))))
        probes += ((name(a).get, litCol(l)))
      case GreaterThan(a, l: Literal) if name(a).isDefined && l.value != null =>
        bounds += ((name(a).get, Some(litCol(l)), None))
      case GreaterThanOrEqual(a, l: Literal)
          if name(a).isDefined && l.value != null =>
        bounds += ((name(a).get, Some(litCol(l)), None))
      case LessThan(a, l: Literal) if name(a).isDefined && l.value != null =>
        bounds += ((name(a).get, None, Some(litCol(l))))
      case LessThanOrEqual(a, l: Literal)
          if name(a).isDefined && l.value != null =>
        bounds += ((name(a).get, None, Some(litCol(l))))
      case GreaterThan(l: Literal, a) if name(a).isDefined && l.value != null =>
        bounds += ((name(a).get, None, Some(litCol(l))))
      case LessThan(l: Literal, a) if name(a).isDefined && l.value != null =>
        bounds += ((name(a).get, Some(litCol(l)), None))
      case In(a, vs) if name(a).isDefined && vs.nonEmpty && vs.sizeIs <= 32 &&
          vs.forall { case l: Literal => l.value != null; case _ => false } =>
        val lits = vs.map { case l: Literal => litCol(l) }
        bounds += ((name(a).get,
          Some(if (lits.sizeIs == 1) lits.head else least(lits: _*)),
          Some(if (lits.sizeIs == 1) lits.head else greatest(lits: _*))))
        inProbes += ((name(a).get, lits))
      case InSet(a, hset) if name(a).isDefined && hset.nonEmpty &&
          hset.sizeIs <= 32 && !hset.contains(null) =>
        val lits = hset.toSeq.map(v =>
          litCol(Literal.create(v, a.dataType)))
        bounds += ((name(a).get,
          Some(if (lits.sizeIs == 1) lits.head else least(lits: _*)),
          Some(if (lits.sizeIs == 1) lits.head else greatest(lits: _*))))
        inProbes += ((name(a).get, lits))
      case _ => () // non-translatable conjunct: contributes no pruning
    }
    val (zoneSpec, bloomSpec) = readStatsSpec()
    val zoneCols = zoneSpec.map(_._1.toLowerCase).toSet
    val zoneKeeps = bounds.toSeq.collect {
      case (c, lo, hi)
          if zoneCols.contains(c.toLowerCase) &&
            schema.fieldNames.exists(_.equalsIgnoreCase(c)) =>
        val dt = schema(schema.fieldIndex(
          schema.fieldNames.find(_.equalsIgnoreCase(c)).get)).dataType.sql
        val entry = element_at(col("z"), c)
        val zmin = TableSink.zoneBound(entry.getItem(0), dt)
        val zmax = TableSink.zoneBound(entry.getItem(1), dt)
        val hit = (lo, hi) match {
          case (Some(l), Some(h)) => zmax >= l && zmin <= h
          case (Some(l), None) => zmax >= l
          case (None, Some(h)) => zmin <= h
          case _ => lit(true)
        }
        when(entry.isNull || TableSink.zoneLegacy(entry.getItem(0), dt) ||
            TableSink.zoneLegacy(entry.getItem(1), dt), lit(true))
          .otherwise(coalesce(hit, lit(false)))
    }
    def bloomKeepOf(c: String, sp: TableSink.BloomSpec,
        values: Seq[Column]): Column = {
      val entry = element_at(col("b"), c)
      val m = entry.getField("m")
      val anyAdmitted = values.map { v =>
        val probe = v.cast(
          org.apache.spark.sql.types.DataType.fromDDL(sp.dtype))
        (0 until sp.k).map(i =>
          TableSink.bloomBitSet(m,
            pmod(xxhash64(lit(i), probe), lit(sp.bits)).cast("int")))
          .reduce(_ && _)
      }.reduce(_ || _)
      when(entry.isNull || entry.getField("bits") =!= sp.bits ||
          entry.getField("k") =!= sp.k, lit(true))
        .otherwise(coalesce(anyAdmitted, lit(false)))
    }
    val bloomKeeps =
      (probes.toSeq.map { case (c, v) => (c, Seq(v)) } ++ inProbes.toSeq)
        .flatMap { case (c, vs) =>
          bloomSpec.find(_.col.equalsIgnoreCase(c))
            .map(sp => bloomKeepOf(c, sp, vs))
        }
    val keeps = zoneKeeps ++ bloomKeeps
    import spark.implicits._
    val statsPruned: Set[String] = statsOpt match {
      case Some(stats) if keeps.nonEmpty =>
        stats.where(!keeps.reduce(_ && _))
          .select(col("path")).as[String].collect().toSet
      case _ => Set.empty
    }
    // HIDDEN-PARTITION pruning — the reference's headline semantic
    // (README.md:141-155): a predicate on the SOURCE column prunes the
    // derived partition DIRECTORIES, no analyze needed. Monotonic
    // transforms (year/month/day/hour/truncate) map the source bounds
    // to a derived-value interval; bucket admits equality probes only.
    // The derived literal is evaluated by the SAME Transform expression
    // the writer derived with (one 1-row local job), so write/prune
    // parity holds by construction; the null partition dir prunes under
    // any bound or probe (NULL satisfies neither).
    val partPruned: Set[String] =
      if (hiddenSpec.isEmpty) Set.empty
      else hiddenSpec.flatMap { pf =>
        val srcField = schema.fields
          .find(_.name.equalsIgnoreCase(pf.source))
        val monotonic = pf.transform match {
          case Transform.Year | Transform.Month | Transform.Day |
               Transform.Hour | Transform.Truncate(_) => true
          case _ => false
        }
        val numericDir = pf.transform match {
          case Transform.Year | Transform.Bucket(_) => true
          case Transform.Truncate(_) =>
            srcField.exists(f => Set("TINYINT", "SMALLINT", "INT", "BIGINT")
              .contains(f.dataType.sql))
          case _ => false
        }
        val myBounds = bounds.toSeq
          .filter(_._1.equalsIgnoreCase(pf.source))
        val myEqs = probes.toSeq.filter(_._1.equalsIgnoreCase(pf.source))
          .map(p => Seq(p._2)) ++
          inProbes.toSeq.filter(_._1.equalsIgnoreCase(pf.source)).map(_._2)
        if (srcField.isEmpty || (myBounds.isEmpty && myEqs.isEmpty)) Nil
        else {
          val dt = srcField.get.dataType
          def derive(cs: Seq[Column]): Seq[String] =
            if (cs.isEmpty) Nil
            else spark.range(1)
              .select(cs.map(c => pf.transform(c, dt).cast("string")): _*)
              .head().toSeq.map(v => if (v == null) null else v.toString)
          val los = derive(myBounds.flatMap(_._2).toIndexedSeq)
          val his = derive(myBounds.flatMap(_._3).toIndexedSeq)
          val eqSets: Seq[Set[String]] = myEqs.map(vs =>
            derive(vs.toIndexedSeq).filter(_ != null).toSet)
          def cmp(a: String, b: String): Int =
            if (numericDir) java.lang.Long.compare(a.toLong, b.toLong)
            else a.compareTo(b)
          val dirRe = java.util.regex.Pattern.compile(
            "(?:^|/)" + java.util.regex.Pattern.quote(pf.columnName) +
              "=([^/]+)/")
          allPaths.filter { path =>
            val m = dirRe.matcher(path)
            if (!m.find()) false // no derived dir: keep, conservative
            else {
              val raw = unescapeDirValue(m.group(1))
              if (raw == "__HIVE_DEFAULT_PARTITION__") true // null: prune
              else scala.util.Try {
                val outsideBounds = monotonic &&
                  (los.exists(l => l != null && cmp(raw, l) < 0) ||
                    his.exists(h => h != null && cmp(raw, h) > 0))
                val missesEqs = eqSets.exists(es =>
                  es.nonEmpty && !es.contains(raw))
                outsideBounds || missesEqs
              }.getOrElse(false) // unparsable value: keep, conservative
            }
          }
        }
      }.toSet
    val pruned = statsPruned ++ partPruned
    if (pruned.isEmpty) None
    else Some(allPaths.filterNot(pruned))
  }

  /** Undo Spark's partition-directory escaping (%XX hex sequences). */
  private def unescapeDirValue(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Stats-bearing entries of the HEAD snapshot as a DISTRIBUTED
    * DataFrame — (path [absolute], n, z, b); None when the table is
    * unversioned, empty, legacy, or carries no stats entry at all. The
    * manifests are read by executors (text scan), the driver touches
    * only names: the same scale shape as the batch read's metadata. */
  private[graft] def manifestStatsDf(spark: SparkSession): Option[DataFrame] = {
    if (!config.versioned) return None
    // registry-first probe: analyze always writes the spec before the
    // refold, so its absence means no stats anywhere — one file stat
    // instead of reading every manifest's contents (this probe runs at
    // SQL scan PLANNING, so it must be cheap on stats-less tables)
    if (!WarehouseIO.isFile(statsSpecPath)) return None
    val head = snapshotVersions().lastOption.getOrElse(return None)
    val names = manifestNames(head).getOrElse(return None)
    if (names.isEmpty) return None
    // cheap driver probe: any stats line at all? (names-only readers kept
    // honest — this reads content, so it counts as manifest reads)
    val hasStats = names.exists(n =>
      WarehouseIO.manifestLinesOf(logPath, n).exists(_.contains('\t')))
    if (!hasStats) return None
    val root = config.tablePath.stripSuffix("/")
    Some(spark.read.text(names.map(n => logFile(n).toString): _*)
      .where(col("value").contains("\t"))
      .select(
        substring_index(col("value"), "\t", 1).as("__rel"),
        from_json(expr("substring(value, instr(value, '\t') + 1)"),
          org.apache.spark.sql.types.StructType.fromDDL(manifestStatsSchema))
          .as("__s"))
      .select(
        when(col("__rel").startsWith("/"), col("__rel"))
          .otherwise(concat(lit(s"$root/"), col("__rel"))).as("path"),
        col("__s.n").as("n"), col("__s.z").as("z"), col("__s.b").as("b"))
      // map-typed columns refuse set ops; one entry per path is the
      // invariant anyway (the line-preserving merge dedupes by path)
      .dropDuplicates("path"))
  }

  /** CHECK-constraint gate ([[SinkConfig.checkConstraints]]): one
    * aggregate pass over `df` counting violations per constraint; any
    * violation refuses the write with the per-constraint counts. NULL
    * proves nothing → violation (SQL CHECK semantics). */
  private def requireConstraints(df: DataFrame, what: String): Unit = {
    if (config.checkConstraints.isEmpty) return
    // count(when(...)) — never NULL, so an EMPTY batch (zero rows) passes
    // as the no-op it is instead of NPE-ing on a null sum
    val counts = df.select(config.checkConstraints.zipWithIndex.map {
      case (c, i) =>
        count(when(!coalesce(expr(c), lit(false)), lit(1))).as(s"c$i")
    }: _*).head()
    val violated = config.checkConstraints.zipWithIndex
      .map { case (c, i) => c -> counts.getLong(i) }
      .filter(_._2 > 0)
    require(violated.isEmpty,
      s"$what refused: CHECK constraint violations — " +
        violated.map { case (c, n) => s"'$c' ($n rows)" }.mkString("; "))
  }

  /** OPTIMISTIC append commit (the reference's commit-retry surface,
    * connector.py:242-257, realized Iceberg-style): append commits
    * COMMUTE — each is `head manifest + its own files` — so concurrency
    * control is an exclusive create of the next version file. Each
    * attempt re-reads the head, merges, and tries to claim `head + 1`;
    * losing the claim (another committer landed first) just retries
    * against the new head, so no concurrent append's files are ever lost
    * to a stale-base overwrite. Bounded attempts turn a pathological
    * livelock into a loud error instead of an infinite loop. */
  private[graft] def commitAppendedFiles(added: Seq[String],
      maxAttempts: Int = 20, txn: Option[(String, Long)] = None,
      stats: Map[String, String] = Map.empty,
      posRef: Option[String] = None,
      keysRef: Option[String] = None,
      delRef: Option[String] = None): Int = {
    // LAYERED commit (Iceberg manifest-list shape): this commit's own
    // delta manifest is written ONCE — its content (exactly this write's
    // files) does not depend on which head it lands on — and the claimed
    // snapshot is `head's manifest NAMES + that one name`. Metadata IO
    // per commit: O(added files) manifest bytes + O(manifest count)
    // snapshot bytes, NEVER an O(table files) read-sort-rewrite; at ~1M
    // files / frequent commits the old full-list scheme rewrote a
    // ~50-100 MB driver-side text file per commit and stored K full
    // copies across K snapshots. [[compactManifests]] bounds the
    // manifest-count term as commit count grows.
    // per-file column stats (zone min/max, bloom bitmap) ride IN the
    // manifest entry — one metadata source, pruning reads no second
    // layer, and stats die with their manifest on expiry/rewrite
    val ownManifest =
      if (added.isEmpty) None
      else Some(WarehouseIO.writeManifestLines(logPath,
        added.distinct.sorted.map(r =>
          stats.get(r).fold(r)(j => s"$r	$j"))))
    // a manifest WE created to represent the base (bootstrap listing of
    // pre-existing unversioned data, or one-time migration of a legacy
    // inline-list head) — superseded and deleted if the claim is lost
    var baseManifest: Option[String] = None
    var mergedManifest: Option[String] = None
    def dropBaseManifest(): Unit = {
      baseManifest.foreach(n => WarehouseIO.delete(logFile(n)))
      baseManifest = None
      mergedManifest.foreach(n => WarehouseIO.delete(logFile(n)))
      mergedManifest = None
    }
    def commitLoop(): Int = {
    var attempt = 0
    while (true) {
      attempt += 1
      val head = snapshotVersions().lastOption
      // An append racing a REWRITE (delete/update/compact/cluster — ops
      // that swap the table root) can have its already-renamed files
      // swept with the old root before this claim lands; committing
      // anyway would publish a manifest referencing deleted files — a
      // broken table, not a lost race. Verify our own files still exist
      // right before claiming (O(added) metadata ops, same cost class as
      // the commit) and fail LOUDLY instead. Rewrites otherwise assume
      // the Iceberg single-rewriter convention: one maintenance process;
      // append-vs-append needs no such care (commits commute).
      def sweptFiles(): Seq[String] = added.filterNot(rel =>
        WarehouseIO.exists(
          new org.apache.hadoop.fs.Path(config.tablePath, rel)))
      def raceError(detail: String): Nothing =
        throw new IllegalStateException(
          s"append raced a table rewrite: $detail — retry the append " +
            "against the rewritten table")
      val swept = sweptFiles()
      if (swept.nonEmpty) raceError(
        s"its staged files were swept (${swept.take(3).mkString(", ")}" +
          s"${if (swept.sizeIs > 3) ", …" else ""})")
      // The check above is check-then-act: a rewrite can still land
      // INSIDE the check-to-claim window. Pin the log generation here and
      // re-verify both signals AFTER the claim, retracting our own
      // version file on a flip — the durable log never keeps a manifest
      // referencing swept files; readers can observe one only in the
      // claim-to-retract instant, and only under a rewrite that already
      // violated the single-rewriter maintenance-window convention.
      val genBefore = logGeneration()
      // O(manifest count) head read — a layered head contributes its
      // manifest NAMES verbatim; a legacy inline-list head is migrated
      // once (its list copied into a manifest); no head bootstraps from
      // a one-time listing of pre-existing unversioned data
      val headNames: Seq[String] = head match {
        case Some(h) => manifestNames(h) match {
          case Some(names) => names
          case None =>
            if (baseManifest.isEmpty)
              baseManifest =
                Some(WarehouseIO.writeManifest(logPath, manifestFiles(h)))
            baseManifest.toSeq
        }
        case None =>
          // a TXN (streaming) first commit must NOT bootstrap-sweep the
          // directory: a batch-0 attempt that crashed between its staged
          // rename and the claim leaves orphans the replay cannot
          // distinguish from pre-existing data — sweeping them into the
          // base manifest would commit the batch's rows twice. A
          // streaming table either starts empty or is explicitly adopted
          // (adoptExisting → head exists) before the stream starts; any
          // crash orphans stay unreferenced for removeOrphans.
          if (baseManifest.isEmpty && txn.isEmpty) {
            // the staged write already renamed THIS commit's files into
            // the table, so the bootstrap listing must exclude them —
            // they are the delta manifest's, not pre-existing data
            val preexisting = listDataFiles().filterNot(added.toSet)
            if (preexisting.nonEmpty)
              baseManifest =
                Some(WarehouseIO.writeManifest(logPath, preexisting))
          }
          baseManifest.toSeq
      }
      val v = head.getOrElse(0) + 1
      // amortized merge-on-commit: when this commit would push the head
      // past the manifest-count threshold, fold the whole chain into ONE
      // merged manifest instead — O(total) paid once per threshold
      // commits, bounding head-read and snapshot-file size at any commit
      // cadence (Iceberg's commit-time manifest merging)
      val chained = (headNames ++ ownManifest).distinct
      val mergeManifest: Option[String] =
        if (config.manifestMergeThreshold > 0 &&
            chained.size > config.manifestMergeThreshold)
          // line-preserving fold: a stats-bearing entry must survive the
          // merge, or compaction would silently drop file skipping
          Some(WarehouseIO.writeManifestLines(logPath,
            WarehouseIO.mergeManifestLines(
              chained.map(WarehouseIO.manifestLinesOf(logPath, _)))))
        else None
      mergedManifest = mergeManifest // exception-path cleanup owns it
      raceWindowCheckHook()
      if (WarehouseIO.writeStringIfAbsent(logFile(f"v$v%05d.list"),
          WarehouseIO.renderSnapshot(
            mergeManifest.map(Seq(_)).getOrElse(chained),
            // the streaming dedup record rides IN the claimed snapshot —
            // atomic with the commit, never a separate marker to drift;
            // the id is escaped (checkpoint-path ids can carry spaces).
            // A MoR UPDATE/MERGE's position-delete sidecar reference
            // rides the same way: the commit that APPENDS the
            // replacement rows must subtract the replaced rows in the
            // SAME claimed snapshot, or a concurrent reader would see
            // both copies in the sidecar-lands-later window
            txn.map(t =>
              s"txn ${WarehouseIO.encodeTxnId(t._1)} ${t._2}").toSeq ++
              posRef.map(n => s"pos $n").toSeq ++
              keysRef.map(n => s"keys $n").toSeq ++
              delRef.map(n => s"del $n").toSeq))) {
        val genFlip = genBefore != "none" && logGeneration() != genBefore
        val sweptAfter = if (genFlip) Nil else sweptFiles()
        if (genFlip || sweptAfter.nonEmpty) {
          WarehouseIO.delete(logFile(f"v$v%05d.list"))
          mergeManifest.foreach(n => WarehouseIO.delete(logFile(n)))
          raceError(s"a rewrite landed inside the commit window " +
            s"(manifest v$v retracted; the append may or may not be in " +
            "the rewritten snapshot)")
        }
        // sidecar commits re-verify the branch guard AFTER the claim
        // (round-14): createBranch can land inside the caller's
        // check-to-claim window, and a sidecar at a version ABOVE the
        // branch base would silently never apply to the branch's
        // two-slice read — the audit surface would diverge from main.
        // Retract our own claim (same pattern as the rewrite-race
        // retract above and consolidate's claim-to-retract) and refuse;
        // a branch whose base is at or above v sees the sidecar and is
        // fine. The caller's catch deletes the sidecar file itself.
        if (posRef.isDefined || keysRef.isDefined || delRef.isDefined) {
          val raced = branchesOrPending().filter(b =>
            branchBaseVersion(b).forall(_ < v))
          if (raced.nonEmpty) {
            WarehouseIO.delete(logFile(f"v$v%05d.list"))
            mergeManifest.foreach(n => WarehouseIO.delete(logFile(n)))
            throw new IllegalStateException(
              s"a branch (${raced.mkString(", ")}) was created inside " +
                s"the delete-commit window (snapshot v$v retracted): its " +
                "audit view would never apply this sidecar; publish or " +
                "drop the branch, then retry the delete")
          }
        }
        // a merge commit supersedes its own never-referenced delta
        if (mergeManifest.isDefined)
          ownManifest.foreach(n => WarehouseIO.delete(logFile(n)))
        return v
      }
      // lost the claim: the head moved, so any base/merge manifest this
      // attempt wrote is superseded by the new head's own chain — drop
      // them before retrying (the new head is read fresh next attempt)
      dropBaseManifest()
      // the commit we just lost to may BE this transaction — a zombie
      // duplicate writer (a stale executor replaying the same batch)
      // landing it first. The pre-staging dedup probe ran before the
      // race; without this re-check the retry would double-commit the
      // batch id. 0 = "already committed by someone else" (versions
      // start at 1) — the caller discards its staged files.
      if (txn.exists { case (id, b) => lastTxnBatch(id).exists(_ >= b) }) {
        ownManifest.foreach(n => WarehouseIO.delete(logFile(n)))
        return 0
      }
      require(attempt < maxAttempts,
        s"append commit lost the version race $maxAttempts times — " +
          "a committer storm or a stuck writer is holding the log")
    }
    -1 // unreachable
    }
    try commitLoop()
    catch { case e: Throwable =>
      // no snapshot references the delta on any failure path — the
      // version file was never claimed or was retracted — so the
      // manifest(s) this attempt wrote must go too, not linger as debris
      ownManifest.foreach(n => WarehouseIO.delete(logFile(n)))
      dropBaseManifest()
      throw e
    }
  }

  /** Stage-and-move write: land `prepared` in a fresh `_staging/` dir
    * under the table root, rename each produced data file into its
    * table-relative place, and return exactly those paths — the commit's
    * added-file list, discovered from the write itself rather than a
    * table-wide directory walk. `_staging` is underscore-prefixed, so
    * readers and [[listDataFiles]] never observe in-flight files; the
    * renames go through the Hadoop [[org.apache.hadoop.fs.FileSystem]]
    * API (metadata-only moves on HDFS-class stores, and the path to a
    * non-local warehouse). A crash mid-move leaves unreferenced files
    * that [[removeOrphans]] reclaims — the same contract as a crash
    * between write and manifest commit. */
  private def stagedWrite(prepared: DataFrame): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val stage = new HPath(config.tablePath,
      s"_staging/append-${java.util.UUID.randomUUID().toString.take(12)}")
    val writer = prepared.write.mode("overwrite")
      .format(config.fileFormat).options(config.extraOptions)
    (if (partitionColNames.nonEmpty) writer.partitionBy(partitionColNames: _*)
     else writer).save(stage.toString)
    val rels = WarehouseIO.listDataFilesRel(stage) // O(files just written)
    // CHECK constraints validate the STAGED files — one scan of exactly
    // the data this write produced (never the input lineage twice, never
    // the table), while nothing is promoted or committed: a violation
    // deletes the staging dir and aborts with zero cleanup debt. The
    // re-read carries the PREPARED frame's schema: inference would
    // re-type partition-directory values (cat=01 → INT 1) and make a
    // constraint evaluate differently than on the data as written. An
    // empty write stages no files — nothing to check (and nothing to
    // infer from).
    if (config.checkConstraints.nonEmpty && rels.nonEmpty) {
      val staged = prepared.sparkSession.read.format(config.fileFormat)
        .schema(prepared.schema)
        .option("basePath", stage.toString)
        .load(stage.toString)
      try requireConstraints(staged, "append")
      catch { case e: Throwable =>
        WarehouseIO.delete(stage, recursive = true); throw e
      }
    }
    val root = new HPath(config.tablePath)
    rels.foreach(rel =>
      WarehouseIO.rename(new HPath(stage, rel), new HPath(root, rel)))
    WarehouseIO.delete(stage, recursive = true)
    rels
  }

  // ------------------------------------------------------- snapshot log
  // Iceberg-style commit history, LAYERED like Iceberg's manifest lists:
  // each commit writes one immutable delta manifest
  // (_graft_log/m-<uuid>.mf, one data-file path per line) holding exactly
  // the files it added, and the snapshot file (_graft_log/vNNNNN.list) is
  // a SMALL manifest-name list ("#manifests" header). Readers union the
  // deltas; K snapshots share manifests instead of storing K full file
  // lists; commit metadata IO is O(added files + manifest count), never
  // O(table files). Legacy header-less snapshots (inline file lists) are
  // still resolved, and migrate into a manifest the first time a commit
  // chains off them. Appends never touch existing files, so every
  // recorded snapshot stays readable. Rewriting ops (upsert / delete /
  // compact) replace files in place, which invalidates earlier
  // manifests — they EXPIRE the history (log resets to a single snapshot
  // of the post-rewrite state), the same contract as Iceberg snapshot
  // expiry after rewrite-files maintenance; [[compactManifests]] bounds
  // the manifest count and [[gcManifests]] reclaims unreferenced deltas.

  // The snapshot log (_graft_log), every manifest/sidecar read-write, AND
  // the whole-table rewrite/swap protocols below go through
  // [[WarehouseIO]] — the Hadoop FileSystem API — so both the commit
  // metadata path and the maintenance ops work against any
  // Hadoop-resolvable warehouse, not just a local disk. The rewrite swap
  // commits through an atomic single-file INTENT marker and rolls
  // FORWARD from it ([[executeSwap]]/[[recoverSwap]]), so maintenance
  // ops stay crash-correct even where a directory rename is per-object
  // copy+delete (object stores) — only the in-flight visibility window
  // widens there, never the recovered state.
  private def logPath = new org.apache.hadoop.fs.Path(
    config.tablePath, "_graft_log")

  private def logFile(name: String) =
    new org.apache.hadoop.fs.Path(logPath, name)

  /** Live data-file paths relative to the table root (excludes `_`-prefixed
    * metadata dirs: snapshot log, staging, zone-map stats, streaming sink
    * log). */
  private[graft] def dataFilesRel(): Seq[String] = listDataFiles()

  /** Table-wide directory walks taken (test hook: the append commit path
    * must stay at zero once a manifest exists — O(added), not O(table)). */
  private[graft] var directoryWalks: Int = 0

  /** Test seam: runs inside [[commitAppendedFiles]]' check-to-claim
    * window (after the pre-claim verification, before the version claim)
    * so specs can land a simulated rewrite exactly where a real one
    * would race, and assert the post-claim retraction. No-op in
    * production. */
  private[graft] var raceWindowCheckHook: () => Unit = () => ()

  /** Test seam: runs inside [[consolidateDeletes]]' claim-to-retract
    * window (after the merged commit's claim lands, before the raced
    * interloper check / cleanup) so specs can crash exactly there and
    * prove the window is benign. No-op in production. */
  private[graft] var consolidateClaimHook: () => Unit = () => ()

  /** The table root as the URI PATH component (scheme/authority
    * stripped), absolutized for local relative paths — the form scan
    * columns like `_metadata.file_path` compare against once THEIR
    * scheme prefix is stripped. */
  private def rootUriPath(s: String): String = {
    val uri = new org.apache.hadoop.fs.Path(s).toUri
    val path = uri.getPath
    if (uri.getScheme == null && !path.startsWith("/"))
      new java.io.File(path).getAbsolutePath
    else path
  }

  private def listDataFiles(): Seq[String] = {
    directoryWalks += 1
    WarehouseIO.listDataFilesRel(
      new org.apache.hadoop.fs.Path(config.tablePath))
  }

  /** Record the current data-file set as the next snapshot version. ONLY
    * safe when no branch is live (a branch's staged files share the
    * directory and a whole-directory snapshot would publish them) — the
    * sole caller is [[expireSnapshots]], reached from rewriting ops, which
    * all [[requireNoBranches]] first. Appends commit via [[writeAndCommit]]. */
  private def writeSnapshot(): Int = writeSnapshotOf(listDataFiles())

  /** Rewriting ops rewrite/swap the live directory: staged branch rows
    * would be absorbed into the rewritten table and the swap destroys the
    * branch manifests. Refuse instead of silently publishing unaudited
    * data — publish or drop branches first (the documented WAP contract). */
  private def requireNoBranches(op: String): Unit = {
    // branchesOrPending: a branch mid-creation (base written, v1 not
    // yet) already pins a base version and must block rewrites too
    val live = branchesOrPending()
    require(live.isEmpty,
      s"$op rewrites the table and would absorb/destroy staged branch " +
        s"data; publish or drop live branches first: ${live.mkString(", ")}")
    val pinned = tags()
    require(pinned.isEmpty,
      s"$op rewrites the table and would invalidate the snapshots these " +
        s"tags pin; drop tags first: ${pinned.mkString(", ")}")
  }

  /** Adopt an EXISTING plain directory of data files as snapshot v1 —
    * Iceberg's `migrate`/`add_files` analogue: NO data rewrite, the
    * current listing becomes the first committed manifest, so time
    * travel, the changelog, and catalog snapshot reads start here and
    * the next append commits v2 off the manifest (walk-free). Refuses
    * when history already exists (nothing to adopt) and on an empty
    * directory (the first append creates v1 anyway). The one-time
    * listing is O(files) metadata — the same cost Spark's own file
    * index pays for the directory, never paid again after adoption. */
  def adopt(): Int = {
    require(config.versioned,
      "adopt needs versioned = true — the manifest log IS the adoption")
    require(snapshotVersions().isEmpty,
      s"table ${config.tableName} already has committed history; " +
        "adopt only converts a plain directory")
    val files = listDataFiles()
    require(files.nonEmpty,
      s"table ${config.tableName} has no data files to adopt — just " +
        "append; the first commit creates v1")
    writeSnapshotOf(files)
  }

  /** Record an EXPLICIT file set as the next main snapshot (used by
    * [[publishBranch]], whose published state is the branch head's file
    * list, not whatever happens to be in the live directory; and by
    * [[adopt]], which commits the pre-existing listing as v1). */
  private def writeSnapshotOf(files: Seq[String]): Int = {
    val v = snapshotVersions().lastOption.getOrElse(0) + 1
    val names =
      if (files.isEmpty) Nil
      else Seq(WarehouseIO.writeManifest(logPath, files.sorted))
    WarehouseIO.writeString(logFile(f"v$v%05d.list"),
      WarehouseIO.renderSnapshot(names))
    v
  }

  /** Drop all history and record the current state as version 1 — called
    * by rewriting ops, whose file replacement invalidates old manifests.
    * Branches expire too (their manifests reference the replaced files),
    * the same contract as Iceberg snapshot expiry after rewrite-files
    * maintenance — publish audit branches before running rewriting ops. */
  private def expireSnapshots(): Unit = {
    if (WarehouseIO.isDir(logPath)) WarehouseIO.delete(logPath, recursive = true)
    if (config.versioned) writeSnapshot()
  }

  /** Iceberg `expire_snapshots` (retain-last) analogue: drop every
    * snapshot except the newest `keepLast`, deleting their manifests and
    * any data file referenced ONLY by dropped manifests — the retention
    * policy that bounds time-travel history (and its storage) on a table
    * with a long commit log. Returns the expired versions.
    *
    * Refused when it would change live semantics rather than just
    * shortening history:
    *  - a TAG pins a to-be-dropped snapshot (the pin would dangle);
    *  - a to-be-dropped snapshot carries a merge-on-read delete sidecar
    *    of any kind — sidecars are version-keyed and apply to all later
    *    reads, so dropping the version would RESURRECT the deleted rows
    *    at the head; materialize with [[compact]] first.
    * Live-branch files stay referenced (same rule as [[removeOrphans]]).
    *
    * Scale shape: pure driver-side manifest metadata plus unlink calls —
    * O(history length + file count), no data read or rewritten. On an
    * append-only history every old file is still in the head manifest, so
    * only manifests are deleted; files die here only when earlier
    * rollbacks/branch drops left them referenced solely by old history. */
  def expireSnapshotsKeepLast(keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val vs = snapshotVersions()
    val drop = vs.dropRight(keepLast)
    if (drop.isEmpty) return Nil
    val dangling = tags().filter(t => drop.contains(tagVersion(t)))
    require(dangling.isEmpty,
      s"expiring snapshots ${drop.mkString(", ")} would orphan tags " +
        s"pinning them; drop the tags first: ${dangling.mkString(", ")}")
    val withSidecars = { val idx = sidecarIndex(); drop.filter(idx.any) }
    require(withSidecars.isEmpty,
      s"snapshots ${withSidecars.mkString(", ")} carry merge-on-read " +
        "delete sidecars that still apply to later reads — expiring them " +
        "would resurrect deleted rows; materialize first (compact)")
    val keepFiles = (vs.takeRight(keepLast).flatMap(manifestFiles) ++
      branches().flatMap(b => branchVersions(b).flatMap(branchManifest(b, _)))
      ).toSet
    val root = new org.apache.hadoop.fs.Path(config.tablePath)
    drop.flatMap(manifestFiles).distinct.filterNot(keepFiles)
      .foreach(rel => WarehouseIO.delete(
        new org.apache.hadoop.fs.Path(root, rel)))
    drop.foreach(v => WarehouseIO.delete(logFile(f"v$v%05d.list")))
    gcManifests() // manifests referenced only by the dropped snapshots
    drop
  }

  /** Iceberg `expire_snapshots(older_than => ts)` analogue: drop every
    * snapshot whose commit time is strictly before `cutoffMs` — except
    * the newest `keepLast` (default 1: the head always survives, however
    * old). Delegates to [[expireSnapshotsKeepLast]]'s machinery, so the
    * same refusals apply (dangling tags, live merge-on-read sidecars)
    * and files referenced only by dropped history are deleted. Returns
    * the expired versions. Age-based retention is the policy a scheduled
    * maintenance job runs ("keep 7 days of time travel"); count-based
    * [[expireSnapshotsKeepLast]] is the bound an operator reaches for
    * when a runaway committer floods the log. */
  def expireSnapshotsOlderThan(cutoffMs: Long, keepLast: Int = 1): Seq[Int] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val vs = snapshotVersions()
    // keep everything from the OLDEST post-cutoff version onward — with
    // clock skew between concurrent committers, mtimes need not be
    // monotonic in version order, and a count-based mapping could expire
    // a version NEWER than the cutoff sandwiched behind a slow clock;
    // indexWhere is skew-conservative (over-keeps, never over-drops)
    val firstYoung = vs.indexWhere(v =>
      WarehouseIO.modifiedAtMs(logFile(f"v$v%05d.list")) >= cutoffMs)
    val young = if (firstYoung < 0) 0 else vs.length - firstYoung
    expireSnapshotsKeepLast(math.max(keepLast, young))
  }

  /** Committed snapshot versions, oldest first (empty when unversioned). */
  def snapshotVersions(): Seq[Int] =
    WarehouseIO.childNames(logPath)
      .collect { case n if n.startsWith("v") && n.endsWith(".list") =>
        n.stripPrefix("v").stripSuffix(".list").toInt }
      .sorted

  /** Identity of the CURRENT snapshot history. Rewriting ops expire the
    * log (directory and all) and restart numbering at v1, so a bare
    * version number is ambiguous across a rewrite — a durable cursor
    * pinned to "v3" of the OLD history must not silently resume at "v3"
    * of the new one. The generation is a UUID file inside the log dir:
    * it dies with the history it names and a fresh one is claimed
    * (exclusive-create, racing claimants converge on one winner) on the
    * next read. "none" = no snapshot log yet. */
  private[graft] def logGeneration(): String = {
    val p = logFile("generation")
    if (WarehouseIO.isFile(p)) return WarehouseIO.readString(p).trim
    if (!WarehouseIO.isDir(logPath)) return "none"
    WarehouseIO.writeStringIfAbsent(p, java.util.UUID.randomUUID().toString)
    WarehouseIO.readString(p).trim
  }

  /** Delete manifest files referenced by NO surviving snapshot — main or
    * branch (tags pin versions, which resolve through main snapshots).
    * Called by every history-dropping op (expiry, rollback, consolidation
    * cleanup, branch drop); O(manifest count) name reads, no file lists
    * touched. Snapshot-history storage therefore grows O(Σ live deltas),
    * not O(snapshots × table files). */
  private def gcManifests(): Unit = {
    def namesOf(p: org.apache.hadoop.fs.Path): Seq[String] =
      WarehouseIO.snapshotManifestNames(p).getOrElse(Nil)
    val live = (snapshotVersions().map(v => logFile(f"v$v%05d.list")) ++
      branches().flatMap(b => branchVersions(b).map(v =>
        new org.apache.hadoop.fs.Path(branchLogPath(b), f"v$v%05d.list")))
      ).flatMap(namesOf).toSet
    // an optimistic append writes its delta (and possibly base/merge)
    // manifest BEFORE claiming a version — "referenced by no snapshot"
    // is the normal transient state of an in-flight commit, and some GC
    // callers (dropBranch via CALL system.publish) explicitly legalize
    // concurrent main appends. Reap only manifests old enough that no
    // live commit attempt can still be about to reference them; younger
    // orphans age into the next GC pass.
    val now = System.currentTimeMillis()
    WarehouseIO.childNames(logPath)
      .filter(n => n.startsWith("m-") && n.endsWith(".mf"))
      .filterNot(live)
      .filter(n => scala.util.Try(now - WarehouseIO.modifiedAtMs(logFile(n)) >=
        WarehouseIO.manifestGcGraceMs).getOrElse(false))
      .foreach(n => WarehouseIO.delete(logFile(n)))
  }

  /** MANIFEST compaction — Iceberg `rewrite_manifests`: fold the head
    * snapshot's manifest chain into ONE merged manifest and claim it as
    * a new metadata-only snapshot (data files untouched; row-identical
    * to the head). Every commit appends a manifest, so the O(manifest
    * count) term in commit/read metadata grows with commit cadence —
    * this op resets it to 1; run it periodically (or via
    * `CALL system.compact_manifests`). Older snapshots keep referencing
    * the original manifests until expiry GCs them, so time travel is
    * unaffected. Returns the new head version. */
  def compactManifests(maxAttempts: Int = 20): Int = {
    require(config.versioned && snapshotVersions().nonEmpty,
      "compactManifests needs a versioned table with at least one commit")
    var attempt = 0
    while (true) {
      attempt += 1
      val head = snapshotVersions().last
      // line-preserving fold (stats entries survive the compaction)
      val merged = manifestNames(head) match {
        case Some(names) => WarehouseIO.writeManifestLines(logPath,
          WarehouseIO.mergeManifestLines(
            names.map(WarehouseIO.manifestLinesOf(logPath, _))))
        case None => WarehouseIO.writeManifest(logPath, manifestFiles(head))
      }
      if (WarehouseIO.writeStringIfAbsent(logFile(f"v${head + 1}%05d.list"),
          WarehouseIO.renderSnapshot(Seq(merged))))
        return head + 1
      // lost to a concurrent append: the merge is stale — drop and retry
      WarehouseIO.delete(logFile(merged))
      require(attempt < maxAttempts,
        s"compactManifests lost the version race $maxAttempts times")
    }
    -1 // unreachable
  }

  private def snapshotFile(version: Int): org.apache.hadoop.fs.Path = {
    val manifest = logFile(f"v$version%05d.list")
    require(WarehouseIO.exists(manifest),
      s"snapshot v$version does not exist (expired by a rewrite, or never " +
        s"committed); available: ${snapshotVersions().mkString(", ")}")
    manifest
  }

  /** Manifest names snapshot `version` references (None = legacy
    * inline-list snapshot). O(manifest count) read — the cheap half of
    * the layered format, enough for commit chaining, expiry GC, and
    * per-version delta accounting without touching file lists. */
  private def manifestNames(version: Int): Option[Seq[String]] =
    WarehouseIO.snapshotManifestNames(snapshotFile(version))

  private def manifestFiles(version: Int): Seq[String] =
    WarehouseIO.readSnapshotFiles(logPath, snapshotFile(version))

  /** Shallow-clone sidecar: the source table root whose ABSOLUTE manifest
    * entries this table references (absent for ordinary tables). */
  private[graft] def cloneBasePath: Option[String] = {
    val p = logFile("clone_base")
    if (WarehouseIO.exists(p)) Some(WarehouseIO.readString(p).trim)
    else None
  }

  /** `capturePos = true` appends the `__graft_file`/`__graft_pos`
    * coordinates PER SCAN RELATION, before any union: `_metadata` is not
    * resolvable on a union frame, so a caller that will fold
    * position-delete sidecars ([[applyDeletes]]) must ask for the
    * capture here — a mixed-spine (partition-spec-evolved) or clone
    * manifest produces a multi-relation union. [[applyDeletes]] skips
    * its own capture when the columns are already present and drops
    * them unless asked to keep. */
  private def readFiles(spark: SparkSession, rels: Seq[String],
      capturePos: Boolean = false,
      captureFileMeta: Boolean = false): DataFrame = {
    // an empty file set cannot infer a schema — an empty diff (e.g.
    // readChanges(v, v)) borrows the live table's schema instead
    if (rels.isEmpty) read(spark).limit(0)
    else {
      val renames = renameMap
      // the declared layer lives in sidecars exactly like the rename
      // map (round-14): an ALTER-widened table mixes narrow/wide file
      // generations, and only the declared schema makes the reader
      // upcast — footer inference pins whichever width the sampled
      // file carried and fails the scan on the other generation. An
      // explicit config.tableSchema still wins (caller's pin).
      val declared = config.tableSchema.orElse(alterDeclaredSchema)
      def load(files: Seq[String], base: String): DataFrame = {
        val r0 = spark.read.format(config.fileFormat)
          .option("basePath", base)
        // renamed tables mix file generations (pre-rename files carry
        // the old physical name): surface BOTH names — merge-schema
        // when inferring, old columns appended when declared — so
        // applyRenames can coalesce them under the new name
        val r = if (renames.nonEmpty) r0.option("mergeSchema", "true") else r0
        declared.map(augmentWithRenameSources(_, renames))
          .fold(r)(s => r.schema(s)).load(files: _*)
      }
      // a shallow clone's manifest mixes ABSOLUTE entries (the source's
      // files, partition-deriving against the source root) with relative
      // entries (files this table appended itself): each group loads with
      // its own basePath and the groups union — Spark requires basePath
      // to be an ancestor of every loaded path, so one load cannot span
      // two roots
      val (ext, local) = rels.partition(_.startsWith("/"))
      // partition-spec evolution (round-13): one load cannot span files
      // written under DIFFERENT directory spines either — Spark derives
      // partition columns from the layout under basePath, and a mixed
      // list silently DROPS rows (measured: a root-level unpartitioned
      // file vanishes when identity dirs exist beside it). Group local
      // files by spine signature and load each generation with its own
      // layout; identity columns restore from their generation's dirs,
      // a generation's derived-only columns NULL-fill in the others.
      // One group in the uniform case — the plan is unchanged there.
      val localFileGroups = local.groupBy(TableSink.spineOf)
        .toSeq.sortBy(_._1.mkString(","))
      // capture ONLY when the union will have several relations: a
      // single-relation frame resolves `_metadata` lazily inside
      // applyDeletes when (and only when) a position sidecar actually
      // folds — capturing unconditionally here made every snapshot read
      // materialize `row_index` per row (measured 3.8x on q_time_travel,
      // same-window A/B) for sidecars that do not exist
      val multi = localFileGroups.size + (if (ext.isEmpty) 0 else 1) > 1
      def cap(df: DataFrame): DataFrame =
        if (captureFileMeta)
          // file-inventory capture for the metadata tables (round-14):
          // UNCONDITIONAL (unlike capturePos) because the caller groups
          // on these columns, and CHEAP — file_path/size/mtime are
          // per-file constants, not the per-row row_index
          // materialization the capturePos guard exists to avoid
          df.withColumn("__graft_file", col("_metadata.file_path"))
            .withColumn("__graft_size", col("_metadata.file_size"))
            .withColumn("__graft_mtime",
              col("_metadata.file_modification_time"))
        else if (!capturePos || !multi) df
        else df.withColumn("__graft_file", col("_metadata.file_path"))
          .withColumn("__graft_pos", col("_metadata.row_index"))
      val localGroups = localFileGroups
        .map { case (_, fs) =>
          cap(load(fs.map(rel => s"${config.tablePath}/$rel"),
            config.tablePath))
        }
      val parts = localGroups ++ (
        if (ext.isEmpty) None
        else Some(cap(load(ext, cloneBasePath.getOrElse(sys.error(
          "manifest has absolute entries but no clone_base sidecar"))))))
      applyRenames(
        parts.reduce(_.unionByName(_,
          allowMissingColumns = renames.nonEmpty || parts.sizeIs > 1)),
        renames)
    }
  }

  /** Old→new column mapping persisted by the SQL door's
    * `ALTER TABLE … RENAME COLUMN` (`_graft_renames` sidecar, one
    * URL-encoded `old:new` line per physical-name generation). Data
    * files are immutable and carry no field ids, so a rename is a
    * DECLARED-layer operation: pre-rename files keep the old physical
    * name and every read coalesces it under the new one. A chain of
    * renames keeps one line per physical name ever written (x->z and
    * y->z after x->y->z), since files of each generation persist. */
  private[graft] def renameMap: Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(config.tablePath, "_graft_renames")
    if (!WarehouseIO.isFile(p)) Map.empty
    else WarehouseIO.readString(p).linesIterator.flatMap { l =>
      l.split(":", 2) match {
        case Array(o, n) if o.nonEmpty && n.nonEmpty =>
          Some(java.net.URLDecoder.decode(o, "UTF-8") ->
            java.net.URLDecoder.decode(n, "UTF-8"))
        case _ => None
      }
    }.toMap
  }

  private def applyRenames(df: DataFrame,
      renames: Map[String, String]): DataFrame =
    TableSink.applyRenames(df, renames)

  private def augmentWithRenameSources(declared: StructType,
      renames: Map[String, String]): StructType =
    TableSink.augmentWithRenameSources(declared, renames)

  /** Time travel: read the table as of snapshot `version`. Partition
    * columns still derive from the directory layout (`basePath`). Fails if
    * the snapshot was expired by a rewriting op. Merge-on-read delete
    * predicates committed at or before `version` are applied
    * ([[deleteWhere]]) — the snapshot's semantics, not its raw files. */
  def readVersion(spark: SparkSession, version: Int): DataFrame =
    applyDeletes(readFiles(spark, manifestFiles(version),
      capturePos = true), version)

  /** [[readVersion]] with SCAN-PLANNING file pruning: the caller's
    * pushed-filter conjuncts consult manifest stats and hidden-partition
    * transform bounds ([[planCandidates]]) and only the SURVIVOR files
    * are read — so a merge-on-read-pending table served through the
    * catalog's library-read path keeps the same file skipping its raw
    * V2 scan would have had. Sound under the sidecar subtraction:
    * pruning removes files PROVEN to contain no matching rows, deletes
    * only subtract more. Conjuncts that don't translate simply prune
    * nothing (conservative). */
  private[graft] def readVersionCandidates(spark: SparkSession, version: Int,
      conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : DataFrame = {
    val rels = manifestFiles(version)
    if (conjuncts.isEmpty || rels.isEmpty) return readVersion(spark, version)
    val abs = rels.map(r =>
      if (r.startsWith("/")) r else s"${config.tablePath}/$r")
    // PRE-FOLD constant subtrees: a freshly-parsed conjunct carries
    // typed literals as Cast(Literal) (the analyzer's ConstantFolding
    // never ran on it), which planCandidates' attribute-vs-LITERAL
    // translation would skip — fold them to Literals first (timestamp
    // casts need the session timezone pinned to be resolvable; the
    // literal text itself is an absolute instant, so the fold is
    // timezone-exact). Anything unfoldable passes through untouched —
    // conservative, prunes nothing.
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val folded = conjuncts.map(_.transformUp {
      case c: Cast if c.timeZoneId.isEmpty && c.needsTimeZone =>
        c.withTimeZone(tz)
    }.transformUp {
      case e if e.resolved && e.foldable && !e.isInstanceOf[Literal] =>
        scala.util.Try(Literal.create(e.eval(null), e.dataType))
          .getOrElse(e)
    })
    planCandidates(spark, abs, folded) match {
      case Some(survivors) =>
        val keep = survivors.toSet
        applyDeletes(readFiles(spark,
          rels.zip(abs).collect { case (r, a) if keep(a) => r },
          capturePos = true), version)
      case None => applyDeletes(
        readFiles(spark, rels, capturePos = true), version)
    }
  }

  // --------------------------------------------- merge-on-read deletes
  // Iceberg-v2-style equality deletes: [[deleteWhere]] commits a delete
  // PREDICATE as pure metadata (the snapshot keeps the head's file list;
  // a sidecar records the predicate), readers subtract matching rows at
  // scan time, and [[compact]] materializes — rewriting files and
  // clearing the predicates. The 100 TB rationale: [[delete]] (copy-on-
  // write) rewrites every touched partition at delete time; merge-on-read
  // makes the delete O(metadata) and defers the rewrite until compaction
  // amortizes it across many deletes.

  private def deletesPath(v: Int): org.apache.hadoop.fs.Path =
    logFile(f"v$v%05d.deletes")

  private def keysPath(v: Int): org.apache.hadoop.fs.Path =
    logFile(f"v$v%05d_keys")

  private def posDeletesPath(v: Int): org.apache.hadoop.fs.Path =
    logFile(f"v$v%05d_pos")

  /** ALL position-delete sidecar directories of version `v`: the
    * standard post-claim `v%05d_pos` dir ([[deletePositions]] — whose
    * lands-later window legally shows the PRE-delete state) plus a
    * `#pos`-referenced sidecar committed ATOMICALLY inside the claimed
    * snapshot (the merge-on-read [[updateMor]] shape — the commit also
    * APPENDS replacement rows, so the subtraction may never lag the
    * claim or a reader would see both copies). O(1) metadata reads. */
  private def posDeleteDirs(v: Int): Seq[org.apache.hadoop.fs.Path] =
    sidecarIndex().posDirs(v)

  /** ONE-LISTING sidecar index: which versions carry which delete-sidecar
    * flavors, resolved from a SINGLE log-directory listing instead of
    * 3-4 metadata probes (and, for the `#pos` shape, a version-file
    * READ) per version per read — measured: the per-version probes
    * regressed q_rollback 2.2× the day they landed. `#pos` references
    * (the MoR UPDATE/MERGE commit shape) cost a version-file read ONLY
    * when some `pos-*` dir exists in the listing at all — on a table
    * with no pending MoR mutation the index is one `listStatus`, full
    * stop. An index is a point-in-time snapshot of the log, the same
    * consistency class as the per-version stats it replaces (each was
    * its own point-in-time probe anyway); hot paths build ONE index per
    * logical read instead of re-probing per version. */
  private final class SidecarIndex {
    private val names: Set[String] = WarehouseIO.childNames(logPath).toSet
    // ref-shaped sidecars (round-12: ALL delete flavors pre-write under
    // a unique name and are referenced INSIDE the claimed snapshot —
    // atomic, so a changelog consumer can never observe a version
    // before its sidecar exists and lose the delta). Their presence in
    // the ONE listing gates the per-version version-file reads.
    private val anyRef = names.exists(n => n.startsWith("pos-") ||
      n.startsWith("keys-") || n.startsWith("del-"))
    private val refCache = scala.collection.mutable.Map
      .empty[Int, (Option[String], Option[String], Option[String])]
    private def refs(v: Int)
        : (Option[String], Option[String], Option[String]) =
      if (!anyRef) (None, None, None)
      else refCache.getOrElseUpdate(v,
        if (!names(f"v$v%05d.list")) (None, None, None)
        else WarehouseIO.snapshotSidecarRefs(logFile(f"v$v%05d.list")))
    def hasPred(v: Int): Boolean =
      names(f"v$v%05d.deletes") || refs(v)._3.exists(names)
    /** Predicate SQL texts of version `v` (legacy std file and/or the
      * `#del`-referenced sidecar), in commit shape order. */
    def predicates(v: Int): Seq[String] =
      (if (names(f"v$v%05d.deletes"))
        Seq(WarehouseIO.readString(deletesPath(v))) else Nil) ++
        refs(v)._3.filter(names)
          .map(n => WarehouseIO.readString(logFile(n)))
    def keyDirs(v: Int): Seq[org.apache.hadoop.fs.Path] =
      (if (names(f"v$v%05d_keys")) Seq(keysPath(v)) else Nil) ++
        refs(v)._2.filter(names).map(logFile)
    def posDirs(v: Int): Seq[org.apache.hadoop.fs.Path] =
      (if (names(f"v$v%05d_pos")) Seq(posDeletesPath(v)) else Nil) ++
        refs(v)._1.filter(names).map(logFile)
    /** Referenced sidecar FILE/DIR names of `v` (cleanup loops must
      * capture these before deleting the version file). */
    def refNames(v: Int): Seq[String] = {
      val (p, k, d) = refs(v)
      (p.toSeq ++ k.toSeq ++ d.toSeq).filter(names)
    }
    def any(v: Int): Boolean =
      hasPred(v) || keyDirs(v).nonEmpty || posDirs(v).nonEmpty
  }

  private def sidecarIndex(): SidecarIndex = new SidecarIndex

  /** Delete predicates committed at or before `version`, in commit order.
    * Stored one per sidecar as SQL text. (Key-list deletes are separate —
    * [[deleteKeys]] — and counted by [[hasPendingDeletes]].) */
  def deletePredicates(version: Int): Seq[String] = {
    val idx = sidecarIndex()
    snapshotVersions().filter(_ <= version).flatMap(idx.predicates)
  }

  /** True when any merge-on-read delete (predicate, key list, or position
    * list) is committed at or before `version` and not yet materialized. */
  def hasPendingDeletes(version: Int): Boolean = {
    val idx = sidecarIndex()
    snapshotVersions().exists(v => v <= version && idx.any(v))
  }

  /** Apply the head snapshot's pending merge-on-read sidecars to a frame
    * scanned OUTSIDE [[read]] (the data-skipping readers load candidate
    * file subsets directly) — without this, a pruned read on a table with
    * pending deletes would resurrect the subtracted rows. */
  private[graft] def applyHeadDeletes(df: DataFrame): DataFrame =
    if (!config.versioned) df
    else snapshotVersions().lastOption.fold(df)(applyDeletes(df, _))

  /** True when the HEAD carries unmaterialized merge-on-read sidecars —
    * the state in which a partition-scoped rewrite (dynamic overwrite +
    * history expiry) would resurrect deleted rows in untouched
    * partitions; [[upsert]] and [[delete]] force the full rewrite-swap
    * instead. */
  private def pendingMorDeletes: Boolean =
    config.versioned && snapshotVersions().lastOption.exists(hasPendingDeletes)

  private def applyDeletes(df: DataFrame, version: Int,
      keepPosCols: Boolean = false): DataFrame = {
    val versions = snapshotVersions().filter(_ <= version)
    val idx = sidecarIndex() // ONE listing for the whole fold
    // position-list deletes anti-join on (file, row ordinal) — the
    // `_metadata` struct must be captured from the SCAN relation, before
    // any key-list anti-join makes it unresolvable, so the helper columns
    // ride along through the fold and drop at the end (kept when the
    // caller — deletePositions — needs the coordinates itself)
    val anyPos = keepPosCols || versions.exists(v =>
      idx.posDirs(v).nonEmpty)
    // a multi-relation union (mixed-spine or clone manifest) cannot
    // resolve `_metadata` — readFiles captured per relation already
    val hasCaptured = df.columns.contains("__graft_file")
    val d0 =
      if (anyPos && !hasCaptured)
        df.withColumn("__graft_file", col("_metadata.file_path"))
          .withColumn("__graft_pos", col("_metadata.row_index"))
      else df
    // a sidecar records column names AS OF ITS COMMIT; a later RENAME
    // folds those physical generations under the new name, so the
    // sidecar's references must fold identically (round-14). Without
    // this, a pending predicate on the OLD name resolved BENEATH the
    // rename projection (Spark lets a filter reference a dropped
    // column) — old files served their physical value but post-rename
    // files served NULL, and `not(NULL)` SILENTLY DROPPED every row
    // appended after the rename; a key-list anti-join on the old name
    // died in an unresolved-column error. Substitution is unambiguous:
    // the ALTER door refuses re-ADDing or renaming onto a superseded
    // physical name, so an attribute matching a rename key can only
    // mean that old generation.
    val renames = renameMap
    def foldRenamed(p: String): Column = {
      if (renames.isEmpty) expr(p)
      else {
        import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        val e = org.apache.spark.sql.graft.Bridge
          .parseExpression(df.sparkSession, p).transform {
            case a: UnresolvedAttribute if a.nameParts.lengthIs == 1 &&
                renames.keys.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
              UnresolvedAttribute(Seq(renames.collectFirst {
                case (o, n) if o.equalsIgnoreCase(a.nameParts.head) => n
              }.get))
          }
        org.apache.spark.sql.graft.Bridge.column(e)
      }
    }
    val folded = versions.foldLeft(d0) { (d, v) =>
      val afterSql = idx.predicates(v)
        .foldLeft(d)((dd, p) => dd.where(not(foldRenamed(p))))
      val kds = idx.keyDirs(v)
      val afterKeys = if (kds.nonEmpty) {
        val keys = applyRenames(
          kds.map(kd => df.sparkSession.read.parquet(kd.toString))
            .reduce(_ unionByName _), renames)
        // anti-join on the key list's own columns; Spark broadcasts a
        // small erasure list and shuffle-joins a huge one (AQE decides)
        afterSql.join(keys, keys.columns.toSeq, "left_anti")
      } else afterSql
      val pds = idx.posDirs(v)
      if (pds.nonEmpty) {
        val pos = pds.map(pd => df.sparkSession.read.parquet(pd.toString))
          .reduce(_ unionByName _)
          .withColumnRenamed("file_path", "__graft_file")
          .withColumnRenamed("row_pos", "__graft_pos")
        // a position list is bounded by the matched-row count at commit
        // time — small lists broadcast, huge ones shuffle (AQE decides)
        afterKeys.join(pos, Seq("__graft_file", "__graft_pos"), "left_anti")
      } else afterKeys
    }
    if ((anyPos || hasCaptured) && !keepPosCols)
      folded.drop("__graft_file", "__graft_pos")
    else folded
  }

  /** Merge-on-read POSITION delete: resolve `conditionSql` ONCE, at commit
    * time, to the (file, row-ordinal) pairs it matches at the current head
    * and commit that list as a sidecar — Iceberg v2's position-delete
    * flavor, completing the trio next to [[deleteWhere]] (predicate) and
    * [[deleteKeys]] (erasure list). The semantic difference from
    * [[deleteWhere]]: the predicate is evaluated against the snapshot the
    * delete commits on, so rows appended LATER that happen to match the
    * condition are untouched — "delete these physical rows", not "filter
    * all rows forever". Readers subtract with an anti-join on
    * (`_metadata.file_path`, `_metadata.row_index`) — data files are
    * immutable, so the physical coordinates stay valid until a rewrite
    * materializes everything ([[compact]], which clears the sidecars).
    *
    * Position lists store the scan-reported file path verbatim (the same
    * percent-encoded URI both commit and read observe) — normalizing it
    * would re-open the encoding mismatch [[compact]]'s sizing comment
    * documents. Parquet only: `_metadata.row_index` is a parquet reader
    * feature. Same commit rules as the other flavors: versioned tables
    * only, refused while a branch is live, version-scoped (time travel
    * before the commit shows the rows). Returns the committed version. */
  def deletePositions(spark: SparkSession, conditionSql: String): Int = {
    requireNoStreamingLog()
    require(config.versioned,
      "merge-on-read deletePositions needs versioned=true (position " +
        "lists are commit metadata); use delete() for copy-on-write on " +
        "unversioned tables")
    require(config.fileFormat == "parquet",
      s"deletePositions needs the parquet reader's _metadata.row_index; " +
        s"format '${config.fileFormat}' does not expose row ordinals")
    val live = branchesOrPending()
    require(live.isEmpty,
      "deletePositions while a branch is live would make the audit " +
        s"surface disagree with main; publish or drop first: " +
        live.mkString(", "))
    require(snapshotVersions().nonEmpty,
      "deletePositions needs at least one committed snapshot")
    val head = snapshotVersions().last
    // resolve against the head SNAPSHOT'S semantics (earlier deletes of
    // any flavor already applied) so a row deleted twice costs one entry
    val matched = applyDeletes(
      readFiles(spark, manifestFiles(head), capturePos = true), head,
        keepPosCols = true)
      .where(expr(conditionSql))
      .select(col("__graft_file").as("file_path"),
        col("__graft_pos").as("row_pos"))
    // pre-written sidecar + in-snapshot reference (see deleteWhere's
    // atomicity note)
    val sidecar = s"pos-${java.util.UUID.randomUUID().toString.take(12)}"
    matched.write.mode("overwrite").parquet(logFile(sidecar).toString)
    try commitAppendedFiles(Nil, posRef = Some(sidecar))
    catch { case e: Throwable =>
      WarehouseIO.delete(logFile(sidecar), recursive = true); throw e
    }
  }

  /** Merge-on-read delete: commit predicate `conditionSql` (a SQL boolean
    * over the table's columns, the `DELETE FROM … WHERE` convention) as
    * the next snapshot's delete metadata — NO data file is read,
    * rewritten, or removed (the new manifest is the head's file list plus
    * a predicate sidecar). Rows matching ANY committed predicate disappear
    * from [[read]]/[[readVersion]] at or after this commit; earlier
    * snapshots still show them (time travel preserves pre-delete history).
    * Materialize with [[compact]], which rewrites survivors and clears
    * predicates. Returns the committed version.
    *
    * Refused while a branch is live: [[readBranch]] is a raw-file surface
    * and would disagree with main about deleted rows mid-audit. Tags are
    * fine — a tag pins a version, and predicates are version-scoped, so a
    * tagged snapshot's semantics never change. */
  def deleteWhere(conditionSql: String): Int = {
    requireNoStreamingLog()
    require(config.versioned,
      "merge-on-read deleteWhere needs versioned=true (predicates are " +
        "commit metadata); use delete() for copy-on-write on " +
        "unversioned tables")
    val live = branchesOrPending()
    require(live.isEmpty,
      "deleteWhere while a branch is live would make the audit surface " +
        s"disagree with main; publish or drop first: ${live.mkString(", ")}")
    require(snapshotVersions().nonEmpty,
      "deleteWhere needs at least one committed snapshot")
    expr(conditionSql) // fail on unparseable SQL at commit, not first read
    // the sidecar is PRE-WRITTEN under a unique name and referenced
    // INSIDE the claimed snapshot (round-12, all delete flavors): a
    // sidecar landing after the claim was legal for snapshot readers
    // (they saw the pre-delete state) but LOSSY for changelog
    // consumers — one reading the version inside that window emitted an
    // empty change and advanced its offset past the delete forever.
    val sidecar = s"del-${java.util.UUID.randomUUID().toString.take(12)}"
    WarehouseIO.writeString(logFile(sidecar), conditionSql)
    try commitAppendedFiles(Nil, delRef = Some(sidecar))
    catch { case e: Throwable =>
      WarehouseIO.delete(logFile(sidecar)); throw e
    }
  }

  /** Merge-on-read ERASURE-LIST delete: commit the distinct `keyCols`
    * tuples of `keys` as a key-list sidecar — the opt-out / right-to-be-
    * forgotten path. No data file is touched; readers subtract matching
    * rows with an anti-join on the key list (broadcast when the list is
    * small, shuffle otherwise — AQE decides), so erasing a million users
    * from a 100 TB table is O(list) at commit time and one join term at
    * read time, materialized later by [[compact]]. Same commit rules as
    * [[deleteWhere]]: versioned tables only, refused while a branch is
    * live, version-scoped (time travel before the commit still shows the
    * rows). A NULL in the list is REFUSED (round-13): it never matches
    * the anti-join (SQL join semantics), so the erasure it stands for
    * would silently not happen — the one failure mode a
    * right-to-be-forgotten path must not have. Returns the committed
    * version. */
  def deleteKeys(keys: DataFrame, keyCols: Seq[String]): Int = {
    requireNoStreamingLog()
    require(keyCols.nonEmpty, "deleteKeys needs at least one key column")
    require(keyCols.forall(keys.columns.contains),
      s"key columns ${keyCols.filterNot(keys.columns.contains).mkString(", ")} " +
        "missing from the key DataFrame")
    // one bounded pass over the LIST (never the table): a NULL key tuple
    // anti-joins against nothing, so committing it would record an
    // erasure that never erases — refuse with the row, not a warning
    require(keys.where(keyCols.map(col(_).isNull).reduceLeft(_ || _))
      .limit(1).collect().isEmpty,
      s"deleteKeys list carries NULL in (${keyCols.mkString(", ")}): a " +
        "NULL key never matches the erasure anti-join, so those rows " +
        "would silently survive; filter or repair the list first")
    require(config.versioned,
      "merge-on-read deleteKeys needs versioned=true (key lists are " +
        "commit metadata); use delete() for copy-on-write on " +
        "unversioned tables")
    val live = branchesOrPending()
    require(live.isEmpty,
      "deleteKeys while a branch is live would make the audit surface " +
        s"disagree with main; publish or drop first: ${live.mkString(", ")}")
    require(snapshotVersions().nonEmpty,
      "deleteKeys needs at least one committed snapshot")
    // pre-written sidecar + in-snapshot reference (see deleteWhere's
    // atomicity note — changelog consumers must never observe the
    // version before its sidecar)
    val sidecar = s"keys-${java.util.UUID.randomUUID().toString.take(12)}"
    keys.select(keyCols.map(col): _*).distinct()
      .write.mode("overwrite").parquet(logFile(sidecar).toString)
    try commitAppendedFiles(Nil, keysRef = Some(sidecar))
    catch { case e: Throwable =>
      WarehouseIO.delete(logFile(sidecar), recursive = true); throw e
    }
  }

  /** MINOR compaction of the merge-on-read delete layer — Iceberg's
    * `rewrite_position_delete_files` maintenance analogue, extended to
    * all three sidecar flavors: every live delete sidecar is merged into
    * a single new commit (one OR-joined predicate, one erasure list, one
    * position list) and older history is dropped, WITHOUT rewriting any
    * data file. A table that has accumulated N delete commits pays N
    * predicate evaluations + N anti-joins on every read; after
    * consolidation it pays at most one of each, and [[compact]]'s full
    * data rewrite can wait until fragmentation (not read cost) demands
    * it. Exact by construction: all three flavors are row-wise set
    * subtractions, so folding them in one pass removes precisely the
    * rows the per-version fold removed.
    *
    * Like every history rewrite here, time travel below the new commit
    * is gone and the log GENERATION is reset, so changelog cursors and
    * view markers pinned to the old history refuse loudly rather than
    * silently misreading. Crash-ordered: the merged commit lands FIRST
    * (a crash before cleanup leaves old sidecars folding alongside the
    * merged ones — idempotent removals, still correct; re-running
    * finishes), cleanup of old manifests and sidecars second.
    *
    * Refuses mixed key-column erasure lists (one merged list must
    * anti-join on one column set — run [[compact]] instead) and live
    * branches (their manifests pin old history). Returns the new head
    * version. */
  def consolidateDeletes(spark: SparkSession): Int = {
    requireNoStreamingLog()
    requireNoBranches("consolidateDeletes")
    require(config.versioned && snapshotVersions().nonEmpty,
      "consolidateDeletes needs a versioned table with commits")
    // The merge below captures sidecars from the PRE-claim version set.
    // A concurrent delete flavor that wins a version between capture and
    // claim would have its sidecar dropped UNMERGED by the cleanup — a
    // silently lost delete. Detect it after winning vNext (cleanup has
    // not run yet, so retracting our own claim restores the exact
    // pre-commit table) and re-merge with the interloper included.
    var attempt = 0
    while (true) {
      attempt += 1
      val r = consolidateDeletesOnce(spark)
      if (r >= 0) return r
      require(attempt < 5,
        "consolidateDeletes lost 5 straight races to concurrent delete " +
          "commits; quiesce writers and re-run")
    }
    -1 // unreachable
  }

  /** One merge-and-claim attempt for [[consolidateDeletes]]. Returns the
    * new head version, or -1 when a sidecar-carrying commit won a
    * version inside the capture-to-claim window (own claim retracted;
    * caller re-runs with the interloper's sidecars in the capture). */
  private def consolidateDeletesOnce(spark: SparkSession): Int = {
    val vs = snapshotVersions()
    val head = vs.last
    val idx = sidecarIndex()
    // capture EVERY sidecar shape (standard files/dirs and the
    // snapshot-referenced ones) up front — the cleanup loop below
    // deletes version files before sidecars, after which a reference
    // is unreadable
    val predsByV = vs.map(v => v -> idx.predicates(v)).filter(_._2.nonEmpty)
    val keyDirsByV = vs.map(v => v -> idx.keyDirs(v)).filter(_._2.nonEmpty)
    val posDirsByV = vs.map(v => v -> idx.posDirs(v)).filter(_._2.nonEmpty)
    require(predsByV.nonEmpty || keyDirsByV.nonEmpty || posDirsByV.nonEmpty,
      "no delete sidecars to consolidate")
    if (vs.size == 1) return head // already consolidated: no-op
    val keySchemas = keyDirsByV.flatMap(_._2)
      .map(kd => spark.read.parquet(kd.toString).columns.toSeq)
      .distinct
    require(keySchemas.size <= 1,
      s"erasure lists use mixed key-column sets (${keySchemas.map(_.mkString("(", ",", ")")).mkString(", ")}) " +
        "— one merged list cannot anti-join them; materialize with " +
        "compact() instead")
    // (dangling tags need no dedicated check here: requireNoBranches
    // above already refuses when ANY tag exists)
    // 1. the merged sidecars PRE-WRITE under fresh names and the commit
    // references them atomically (same changelog-safety shape as the
    // flavors themselves; the generation flip at the end makes any
    // concurrent stream refuse loudly regardless)
    def uuid12 = java.util.UUID.randomUUID().toString.take(12)
    val delRef =
      if (predsByV.isEmpty) None
      else {
        val merged = predsByV.flatMap(_._2).map(p => s"($p)").mkString(" OR ")
        val n = s"del-$uuid12"
        WarehouseIO.writeString(logFile(n), merged)
        Some(n)
      }
    val keysRef =
      if (keyDirsByV.isEmpty) None
      else {
        val n = s"keys-$uuid12"
        keyDirsByV.flatMap(_._2)
          .map(kd => spark.read.parquet(kd.toString))
          .reduce(_ unionByName _).distinct()
          .write.mode("overwrite").parquet(logFile(n).toString)
        Some(n)
      }
    val posRef =
      if (posDirsByV.isEmpty) None
      else {
        val n = s"pos-$uuid12"
        posDirsByV.flatMap(_._2)
          .map(pd => spark.read.parquet(pd.toString))
          .reduce(_ unionByName _).distinct()
          .write.mode("overwrite").parquet(logFile(n).toString)
        Some(n)
      }
    val vNext =
      try commitAppendedFiles(Nil, posRef = posRef, keysRef = keysRef,
        delRef = delRef)
      catch { case e: Throwable =>
        (delRef.toSeq ++ keysRef.toSeq ++ posRef.toSeq)
          .foreach(n => WarehouseIO.delete(logFile(n), recursive = true))
        throw e
      }
    // A sidecar-carrying commit in the capture-to-claim window means the
    // merged set is INCOMPLETE — its deletes would vanish with cleanup.
    // Retract our own claim (the accepted post-claim retraction shape —
    // see commitAppendedFiles' generation re-check) and signal a re-run;
    // plain appends in the window are safe: their delta manifests are
    // layered into vNext's snapshot, only their time-travel point drops.
    // A crash ANYWHERE in the claim-to-retract window is benign: cleanup
    // has not run, every pre-existing version file (the interloper's
    // included) is still listed, and reads fold each listed version's
    // own sidecars — vNext's head read applies the merged refs AND the
    // interloper's still-listed sidecar; a later consolidation re-run
    // merges everything. The seam below lets a spec crash exactly here
    // and prove it.
    consolidateClaimHook()
    val raced = snapshotVersions()
      .filter(v => v > head && v < vNext).filter(sidecarIndex().any)
    if (raced.nonEmpty) {
      WarehouseIO.delete(logFile(f"v$vNext%05d.list"))
      (delRef.toSeq ++ keysRef.toSeq ++ posRef.toSeq)
        .foreach(n => WarehouseIO.delete(logFile(n), recursive = true))
      return -1
    }
    // 2. cleanup — RE-captured below vNext (a concurrent append that won
    // a version between our read and our claim must be dropped with the
    // rest, or its time-travel read would fold a now-incomplete sidecar
    // set), version FILES first and sidecars second: once every version
    // file below vNext is gone no read can reference an old sidecar, so
    // a crash anywhere in between leaves only correct reads (head folds
    // the merged sidecars; surviving old versions still see every
    // sidecar ≤ themselves). A crash between the loops strands orphaned
    // sidecar files in _graft_log — unreachable debris, never consulted
    // (applyDeletes only folds sidecars of LISTED versions).
    val below = snapshotVersions().filter(_ < vNext)
    // snapshot-referenced sidecar names must be captured while the
    // version files still exist (a RE-captured index: a concurrent
    // append that won a version between our read and our claim drops
    // with the rest)
    val belowIdx = sidecarIndex()
    val refsBelow = below.flatMap(belowIdx.refNames)
    below.foreach(v => WarehouseIO.delete(logFile(f"v$v%05d.list")))
    below.foreach { v =>
      WarehouseIO.delete(deletesPath(v))
      WarehouseIO.delete(keysPath(v), recursive = true)
      WarehouseIO.delete(posDeletesPath(v), recursive = true)
    }
    refsBelow.foreach(n => WarehouseIO.delete(logFile(n), recursive = true))
    WarehouseIO.delete(logFile("generation"))
    gcManifests() // deltas referenced only by the dropped history
    vNext
  }

  /** Fold pending delete sidecars when MORE than
    * [[SinkConfig.deleteConsolidateThreshold]] versions carry one — the
    * replication apply's amortized upkeep (replica reads stay bounded at
    * `threshold` sidecar anti-joins under any run of delete-only
    * batches). No-op when disabled (0), unversioned, or under the
    * threshold. Drops history below the merged commit, which is the
    * replica contract. */
  private[graft] def maybeConsolidateDeletes(spark: SparkSession): Unit = {
    val t = config.deleteConsolidateThreshold
    if (t <= 0 || !config.versioned) return
    val vs = snapshotVersions()
    val idx = sidecarIndex()
    val pending = vs.count(idx.any)
    if (pending > t) { consolidateDeletes(spark); () }
  }

  /** Incremental (CDC-style) read: exactly the rows appended after
    * `fromVersion`, up to and including `toVersion` — the file-set
    * difference of the two manifests, so the incremental consumer never
    * rescans history it has already processed. */
  def readChanges(spark: SparkSession, fromVersion: Int,
      toVersion: Int): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val before = manifestFiles(fromVersion).toSet
    readFiles(spark, manifestFiles(toVersion).filterNot(before))
  }

  /** Iceberg changelog-scan analogue: every ROW-level change committed
    * after `fromVersion` (exclusive; 0 = before the first snapshot) up to
    * `toVersion` (inclusive), as the original row plus
    * `_change_type` ∈ 'insert' | 'delete' and `_change_version`. Where
    * [[readChanges]] is the file-level incremental read (appends only),
    * the changelog also replays merge-on-read DELETE commits — predicate
    * sidecars ([[deleteWhere]]), erasure key lists ([[deleteKeys]]), and
    * position lists ([[deletePositions]]) — each evaluated against its
    * PRE-commit snapshot's semantics: exactly the rows that commit
    * removed from readers. Inserts are filtered by the sidecars in force
    * at their commit (a row appended under an older still-live predicate
    * was never visible, so it never enters the changelog); a row
    * appended and later deleted inside the range appears twice (its
    * insert and its delete) — the standard changelog contract.
    *
    * Scale shape: inserts are manifest file-set diffs (no rescan of
    * history); each delete commit replays as ONE filtered or
    * semi-joined scan of its pre-commit snapshot — O(changed rows +
    * one scan per delete commit), never a diff of materialized table
    * states. Rewriting ops expire history, so a changelog range only
    * ever spans append and merge-on-read commits. */
  def readChangelog(spark: SparkSession, fromVersion: Int,
      toVersion: Int): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val versions = snapshotVersions()
    val idx = sidecarIndex() // ONE listing for the whole range replay
    val rng = versions.filter(v => v > fromVersion && v <= toVersion)
    val parts: Seq[DataFrame] = rng.flatMap { v =>
      val prev = versions.filter(_ < v).lastOption
      val prevSet = prev.map(manifestFiles(_).toSet).getOrElse(Set.empty)
      val added = manifestFiles(v).filterNot(prevSet)
      val inserts =
        if (added.isEmpty) None
        else Some(applyDeletes(
          readFiles(spark, added, capturePos = true), v)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_change_version", lit(v.toLong)))
      val preds = idx.predicates(v)
      val keyDirs = idx.keyDirs(v)
      val posDirs = idx.posDirs(v)
      val deletes =
        if (preds.isEmpty && keyDirs.isEmpty && posDirs.isEmpty) None
        else {
          // a delete commit always has a predecessor at commit time, but
          // snapshot expiry may have dropped it later — the replay is
          // then impossible for this version, so refuse with the remedy
          // rather than crash (a legal table state via the public API)
          require(prev.isDefined,
            s"changelog cannot replay the delete commit at v$v: its " +
              "pre-commit snapshot was expired; start the range after " +
              s"v$v or retain more history (expireSnapshotsKeepLast)")
          val pv = prev.get
          // the pre-commit snapshot's SEMANTIC rows, physical coordinates
          // kept so a position list can be replayed against them
          val base = applyDeletes(
            readFiles(spark, manifestFiles(pv), capturePos = true), pv,
            keepPosCols = true)
          val byPred =
            if (preds.isEmpty) None
            else Some(base.where(preds
              .map(p => coalesce(expr(p), lit(false)))
              .reduce(_ || _)))
          val byKeys =
            if (keyDirs.isEmpty) None
            else {
              val keys = keyDirs
                .map(kd => spark.read.parquet(kd.toString))
                .reduce(_ unionByName _)
              Some(base.join(keys, keys.columns.toSeq, "left_semi"))
            }
          val byPos =
            if (posDirs.isEmpty) None
            else {
              val pos = posDirs
                .map(pd => spark.read.parquet(pd.toString))
                .reduce(_ unionByName _)
                .withColumnRenamed("file_path", "__graft_file")
                .withColumnRenamed("row_pos", "__graft_pos")
              Some(base.join(pos,
                Seq("__graft_file", "__graft_pos"), "left_semi"))
            }
          Some(Seq(byPred, byKeys, byPos).flatten.reduce(_ unionByName _)
            .drop("__graft_file", "__graft_pos")
            .withColumn("_change_type", lit("delete"))
            .withColumn("_change_version", lit(v.toLong)))
        }
      Seq(inserts, deletes).flatten
    }
    if (parts.isEmpty) {
      // a consumer may poll before the producer's first commit — an empty
      // TYPED batch, not an AnalysisException from loading a missing dir
      val base =
        if (WarehouseIO.exists(new org.apache.hadoop.fs.Path(config.tablePath)))
          read(spark).limit(0)
        else config.tableSchema match {
          case Some(s) => spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row], s)
          case None => throw new IllegalArgumentException(
            s"table ${config.tableName} has no commits and no declared " +
              "tableSchema, so an empty changelog batch cannot be typed — " +
              "set tableSchema or wait for the first commit")
        }
      base.withColumn("_change_type", lit(""))
        .withColumn("_change_version", lit(0L))
    } else {
      // schema-evolution guard: with no DECLARED schema each version's
      // file group infers its own shape, and a range spanning an ALTER
      // boundary would die inside unionByName with a generic resolver
      // error (or worse, resurrect a dropped column). Refuse precisely
      // with the remedy — a declared tableSchema conforms every version
      // (pre-evolution rows NULL-fill, dropped columns stay dropped),
      // which is what the SQL door's `<table>.changes` pins automatically.
      val shapes = parts.map(_.columns.toSet).distinct
      require(shapes.size == 1,
        "changelog range spans a schema-evolution boundary " +
          s"(${shapes.map(_.toSeq.sorted.mkString("(", ",", ")"))
            .mkString(" vs ")}) and this sink has no declared " +
          "tableSchema to conform the versions under — set " +
          "SinkConfig.tableSchema to the head schema, or read through " +
          "the SQL catalog's <table>.changes surface")
      parts.reduce(_ unionByName _)
    }
  }

  /** Whole-history changelog for parameterless surfaces (the SQL
    * `<table>.changes` metadata table): [[readChangelog]] over every
    * retained commit, EXCEPT that when snapshot expiry has left a
    * merge-on-read delete commit as the oldest retained version — whose
    * pre-commit snapshot is gone, so its delete replay is impossible —
    * that commit's POST-commit state folds in as inserts at its version
    * (exactly what [[readChangelog]] emits for an oldest commit WITHOUT
    * sidecars) and only the impossible delete replay is skipped. A
    * consumer replaying the whole stream therefore still reconstructs
    * the table: dropping the base commit outright would silently lose
    * every row that survived the expiry. Only the oldest retained
    * commit can lack a predecessor, so this is the one remedy
    * [[readChangelog]]'s error suggests that a no-argument caller could
    * not apply itself. */
  def readChangelogAll(spark: SparkSession): DataFrame =
    readChangelogAllUpTo(spark, snapshotVersions().lastOption.getOrElse(0))

  /** [[readChangelogAll]] bounded at `toVersion` — the streaming CDC
    * source's initial batch (its offset pins the head it planned
    * against, so commits landing during planning belong to the NEXT
    * batch, never half of this one). */
  def readChangelogAllUpTo(spark: SparkSession, toVersion: Int): DataFrame = {
    val vs = snapshotVersions()
    val unreplayable = vs.headOption.filter(v0 =>
      v0 <= toVersion && sidecarIndex().any(v0))
    unreplayable match {
      case None => readChangelog(spark, 0, toVersion)
      case Some(v0) =>
        val base = applyDeletes(
          readFiles(spark, manifestFiles(v0), capturePos = true), v0)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_change_version", lit(v0.toLong))
        base.unionByName(readChangelog(spark, v0, toVersion))
    }
  }

  /** Streaming CDC read — the change-feed twin of [[readStream]]: each
    * micro-batch is the CHANGELOG of the commits that landed since the
    * last trigger (`_change_type` insert/delete + `_change_version`
    * riding on the table schema), so delete commits STREAM as
    * retraction rows instead of refusing — the Delta
    * `readChangeFeed`-style source a replica/index keeps itself fresh
    * from. The first batch replays the retained history up to the head
    * ([[readChangelogAllUpTo]] — an expiry-orphaned oldest delete
    * commit folds in as its post-state inserts, so a consumer still
    * reconstructs the table); offsets pin (generation, version) exactly
    * like the snapshot stream. Versioned tables only. */
  /** Streaming CDC source. `startingVersion` (the Delta source option,
    * INCLUSIVE like Delta's) bounds the FIRST batch: `Some("N")` emits
    * the changes starting from commit N — [N, head] — and
    * `Some("latest")` only commits after stream start; by default
    * batch 0 replays the full retained changelog, which a new consumer
    * of a long-lived table rarely wants (a year of history in one
    * batch). `startingTimestampMs` emits every commit at or after the
    * instant. Checkpointed restarts resume from their offset and ignore
    * the option, exactly like Delta. */
  def readChangesStream(spark: SparkSession,
      startingVersion: Option[String] = None,
      startingTimestampMs: Option[Long] = None): DataFrame = {
    require(config.versioned,
      "readChangesStream consumes the snapshot changelog — versioned only")
    // ALTER-declared schema beats footer inference (round-14): after a
    // type-widening ALTER only the declared schema reads the mixed
    // narrow/wide file generations (the reader upcasts); inference
    // pins whichever type the sampled footer carried
    val schema = config.tableSchema.orElse(alterDeclaredSchema)
      .getOrElse(read(spark).schema)
      .add("_change_type", org.apache.spark.sql.types.StringType)
      .add("_change_version", org.apache.spark.sql.types.LongType)
    val r0 = spark.readStream
      .format("org.apache.spark.sql.graft.GraftTableStream")
      .schema(schema)
      .option("tableName", config.tableName)
      .option("warehousePath", config.warehousePath)
      .option("tablePath", config.tablePath)
      .option("fileFormat", config.fileFormat)
      .option("mode", "changes")
    val r1 = startingVersion.fold(r0)(v => r0.option("startingVersion", v))
    startingTimestampMs.fold(r1)(t =>
      r1.option("startingTimestamp", t.toString)).load()
  }

  /** Incremental changelog consumption with a DURABLE cursor — the
    * `Trigger.AvailableNow`-style micro-batch pattern for CDC pipelines
    * that run as periodic jobs rather than a resident stream. Returns the
    * change rows in `(cursor, head]` (same schema and semantics as
    * [[readChangelog]]) plus a `commit` thunk: the cursor file advances
    * to `head` ONLY when the caller invokes it, i.e. AFTER the batch is
    * durably processed. A crash between read and commit replays the same
    * batch next call — at-least-once by construction, exactly-once when
    * the downstream write is idempotent (e.g. an [[upsert]] keyed on the
    * change rows), which is precisely Structured Streaming's own
    * contract split between batch and checkpoint commit.
    *
    * The cursor is one tiny file at `cursorPath` via [[WarehouseIO]]
    * (any Hadoop-resolvable location); one consumer per cursor path —
    * concurrent consumers sharing a cursor would double-process, use
    * distinct paths. Interplay with retention: the cursor holds versions
    * alive only logically — pair the consumer's cadence with
    * [[expireSnapshotsKeepLast]]/[[expireSnapshotsOlderThan]] windows so
    * a delete commit's pre-commit snapshot is still present when the
    * batch replays it ([[readChangelog]] refuses loudly otherwise). */
  def readChangelogSince(spark: SparkSession, cursorPath: String,
      startingTimestampMs: Option[Long] = None): (DataFrame, () => Unit) = {
    val p = new org.apache.hadoop.fs.Path(cursorPath)
    val gen = logGeneration()
    // cursor format "<generation>:<version>": version numbers restart at
    // v1 after a rewriting op expires the log, so a bare number could
    // silently resume against a DIFFERENT history once the new head
    // catches up — the generation pin turns that divergence into a loud
    // refusal. (A bare-integer cursor from an older build is accepted as
    // generation-unknown.)
    val (curGen, from) =
      // `startingTimestampMs` (the stream sources' option, now on the
      // batch cursor too): a FRESH cursor floors at the last version
      // committed strictly before the instant — the consumer sees every
      // commit at or after it (the Delta contract; a pre-history
      // instant = no floor = the full replay). An EXISTING cursor wins,
      // exactly like a checkpointed stream restart ignores the option.
      if (!WarehouseIO.isFile(p))
        (gen, startingTimestampMs.flatMap(versionBefore).getOrElse(0))
      else WarehouseIO.readString(p).trim.split(':') match {
        case Array(g, v) => (g, v.toInt)
        case Array(v) => (gen, v.toInt) // legacy bare-version cursor
        case other => sys.error(
          s"unreadable changelog cursor at $cursorPath: " +
            s"'${other.mkString(":")}'")
      }
    require(curGen == gen,
      s"changelog cursor at $cursorPath was committed against a different " +
        s"table history (generation $curGen, current $gen): a rewriting op " +
        "expired and restarted the snapshot log, so the un-consumed " +
        "changes are unrecoverable — delete the cursor and rebuild the " +
        "consumer from a full read")
    val head = snapshotVersions().lastOption.getOrElse(0)
    require(from <= head,
      s"changelog cursor at $cursorPath points past the head " +
        s"($from > $head) — wrong table, or history was rolled back; " +
        "delete the cursor to restart from the beginning")
    val batch = readChangelog(spark, from, head)
    // atomic overwrite: a crash mid-commit must leave the OLD cursor
    // readable (batch replays), never a torn/empty file
    (batch, () => WarehouseIO.writeStringAtomic(p, s"$gen:$head"))
  }

  /** CDC REPLICATION: apply this table's changelog to the downstream
    * replica `dest`, keyed by `keyCols`, consuming through the durable
    * cursor at `cursorPath` ([[readChangelogSince]]). One call = one
    * micro-batch; run it on a schedule and `dest` tracks this table.
    *
    * The batch applies as NET CHANGES — per key, the highest-version
    * change wins (a commit is either all-insert or all-delete, so there
    * is no tie), surviving inserts land as ONE keyed [[upsert]] and net
    * deletes as ONE [[deleteKeys]] — the standard CDC change-compaction:
    * a backlog of N source commits costs two replica ops, not N
    * rewrites, and the result equals applying them in commit order
    * because the changelog already encodes visibility (a row re-inserted
    * under a still-live delete predicate never enters it). Intermediate
    * source states never materialize on the replica — the replica
    * contract is the final state of each consumed batch. Both ops are
    * IDEMPOTENT under the keys, so the cursor's at-least-once replay (a
    * crash between apply and commit re-applies the batch) converges to
    * exactly-once replica state. Keys must be unique within a source
    * commit (the same keyed-upsert contract the library API has).
    *
    * Returns the source versions consumed. The replica must be versioned
    * (deletes land as merge-on-read key lists). A MoR-capable replica
    * (parquet, no live branch) takes each insert batch as ONE
    * position-delete + append commit ([[upsertMor]]) — O(batch) data IO
    * per apply and PRESERVED replica history; other replicas keep the
    * copy-on-write apply, whose rewriting commits expire their history.
    * Sidecars fold past [[SinkConfig.deleteConsolidateThreshold]]. */
  def replicateTo(spark: SparkSession, dest: TableSink,
      keyCols: Seq[String], cursorPath: String): Seq[Long] = {
    require(keyCols.nonEmpty, "replicateTo needs at least one key column")
    requireReplica(dest)
    val (batch, commit) = readChangelogSince(spark, cursorPath)
    val b = batch.localCheckpoint() // pin the batch before dest ops run jobs
    import spark.implicits._
    val versions = b.select(col("_change_version"))
      .distinct().as[Long].collect().sorted // bounded: commit count
    applyChangeBatch(dest, b, keyCols)
    commit()
    versions.toSeq
  }

  private def requireReplica(dest: TableSink): Unit = {
    require(dest.config.versioned,
      "the replica must be versioned=true — changelog deletes apply as " +
        "merge-on-read key lists")
    require(dest.config.tablePath != config.tablePath,
      "a table cannot replicate onto itself")
  }

  /** Apply one changelog batch to `dest` as NET CHANGES (see
    * [[replicateTo]]'s contract notes — per key the highest-version
    * change wins, surviving inserts land as ONE keyed upsert and net
    * deletes as ONE deleteKeys, both idempotent under the keys). */
  private def applyChangeBatch(dest: TableSink, b: DataFrame,
      keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    // per key, the highest-version change wins; WITHIN one version a
    // merge-on-read UPDATE commit carries both the old row's delete and
    // the replacement's insert for the same key — the insert is the
    // post-state ('insert' > 'delete', so the desc tie-break is exact;
    // pure delete commits have no same-version insert to tie with)
    // OPTIMIZATION r14 (guide §5 caching): the net-change frame feeds up
    // to four separate actions (two isEmpty probes, deleteKeys,
    // upsertMor) — materialize the O(batch-keys) result once instead of
    // re-running the window per action.
    val net = b.withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("_change_version").desc, col("_change_type").desc)))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint()
    val del = net.filter(col("_change_type") === "delete")
      .select(keyCols.map(col): _*)
    val ins = net.filter(col("_change_type") === "insert")
      .drop("_change_type", "_change_version")
    // a fresh replica has nothing to delete yet (and deleteKeys would
    // rightly refuse a table with no committed snapshot)
    if (dest.snapshotVersions().nonEmpty && !del.isEmpty)
      dest.deleteKeys(del, keyCols)
    if (!ins.isEmpty) {
      // MERGE-ON-READ apply (round-12): a MoR-capable replica takes the
      // insert batch as ONE position-delete + append commit
      // ([[upsertMor]]) — O(batch) data IO instead of rewriting every
      // touched partition per apply, and the replica keeps history
      // (time travel across applies) instead of expiring it. Same
      // keyed idempotence, so the at-least-once replay contract holds.
      val morApply = dest.config.versioned &&
        dest.config.fileFormat == "parquet" && dest.branches().isEmpty
      if (morApply) dest.upsertMor(ins, keyCols)
      else dest.upsert(ins, keyCols)
    }
    // bounded read cost: sidecars stack one per apply (delete key lists
    // AND the MoR upsert's position lists) — fold past the replica
    // config's threshold (amortized, like the manifest merge). The
    // replication key set is uniform, so the merged list always
    // anti-joins cleanly.
    dest.maybeConsolidateDeletes(b.sparkSession)
  }

  /** RESIDENT-stream CDC replication — [[replicateTo]] as a continuous
    * query: the [[readChangesStream]] feed applies to `dest` per
    * micro-batch through the same net-change compaction, so the replica
    * tracks this table with the trigger's latency instead of a
    * scheduler's. Delivery: `foreachBatch` replays a batch whose apply
    * completed but whose checkpoint commit did not — at-least-once —
    * and both apply ops are IDEMPOTENT under the keys (keyed upsert,
    * keyed delete list), so replica STATE converges to exactly-once,
    * the same argument as the cursor variant. Source maintenance
    * windows apply: a history rewrite fails the stream loudly
    * (generation-pinned offsets); restart it from a fresh checkpoint
    * after the replica is rebuilt or verified. */
  def startReplication(spark: SparkSession, dest: TableSink,
      keyCols: Seq[String], checkpointLocation: String,
      intervalSeconds: Int = 15): StreamingQuery = {
    require(keyCols.nonEmpty, "startReplication needs at least one key column")
    requireReplica(dest)
    // the generation the stream starts against: an apply-time
    // missing-file error (a concurrent copy-on-write rewrite deleted a
    // planned source file between batch planning and execution) is told
    // apart from genuine corruption by re-checking it — a flip refuses
    // with the SAME precise message the offset pin raises, so the
    // operator's remedy (fresh checkpoint after maintenance) is
    // identical whichever window the race lands in
    val gen0 = logGeneration()
    readChangesStream(spark).writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        try {
          if (!batch.isEmpty)
            applyChangeBatch(dest, batch.localCheckpoint(), keyCols)
        } catch {
          case t: Throwable if TableSink.isMissingFileError(t) =>
            val cur = logGeneration()
            require(cur == gen0,
              s"the table's snapshot history was rewritten mid-stream " +
                s"(generation $gen0 -> $cur): checkpointed offsets are " +
                "unrecoverable — run rewriting maintenance with the " +
                "stream down, then restart the consumer from a fresh " +
                "checkpoint")
            throw t
        }
      }
      .start()
  }

  // --------------------------------------------------- metadata tables
  // Iceberg metadata-table analogues (`table.snapshots` / `table.history`
  // / `table.files`, reference connector.py loads catalogs whose
  // maintenance tooling queries exactly these): the commit log and the
  // file inventory exposed AS DataFrames, so audit/maintenance queries
  // compose with the rest of the engine instead of shelling out to file
  // listings.

  /** One row per committed snapshot — (version, parent_version,
    * committed_at, n_files, n_added_files, n_removed_files), oldest
    * first. DISTRIBUTED accounting: the driver touches only manifest
    * NAMES (O(versions × manifests) strings); the manifests' FILE LISTS
    * are read by executors — each distinct manifest exactly once via a
    * text scan — and per-version added/removed falls out of one
    * presence-gap pass over (file, version-rank) pairs. At ~1M files ×
    * long histories the old running driver-side `Set[String]` was the
    * largest remaining driver-memory term (Iceberg distributes its
    * metadata tables for the same reason); now the driver holds one
    * count pair per version. `committed_at` is the manifest's commit
    * wall-time at millisecond precision (the same clock
    * [[GraftCatalog]]'s TIMESTAMP AS OF resolves against). */
  def metaSnapshots(spark: SparkSession): DataFrame = {
    require(config.versioned && snapshotVersions().nonEmpty,
      "metaSnapshots needs a versioned table with at least one commit")
    val vs = snapshotVersions()
    // rank = position in the RETAINED chain (expiry leaves gaps in the
    // version numbers; parent = previous retained version, as before)
    val pairs: Seq[(Int, String)] = vs.zipWithIndex.flatMap { case (v, r) =>
      manifestNames(v) match {
        case Some(names) => names.map(n => r -> logFile(n).toString)
        // legacy inline-list snapshot: the version file IS the file list
        case None => Seq(r -> snapshotFile(v).toString)
      }
    }
    import spark.implicits._
    def stripScheme(s: String): String =
      s.replaceFirst("^[a-z][a-zA-Z0-9+.-]*:(//)?", "")
    val perRank: Map[Int, (Long, Long)] =
      if (pairs.isEmpty) Map.empty
      else {
        val maxRank = vs.length - 1
        val byPath = pairs.map { case (r, p) => (stripScheme(p), r) }
          .toDF("__mf_key", "rank")
        // one executor-side read per distinct manifest; a manifest shared
        // by many snapshots fans out through the (cheap) name join
        val members = spark.read
          .text(pairs.map(_._2).distinct: _*)
          // a manifest line may carry per-file stats after a TAB — the
          // membership key is the path part only
          .select(substring_index(col("value"), "\t", 1).as("file"),
            regexp_replace(TableSink.decodePath(col("_metadata.file_path")),
              "^[a-z][a-zA-Z0-9+.-]*:(//)?", "").as("__mf_key"))
          .where(length(col("file")) > 0 && !col("file").startsWith("#"))
          .join(broadcast(byPath), "__mf_key")
          .select(col("file"), col("rank"))
          .distinct()
        // presence-gap events per file: added where a presence run starts,
        // removed at the rank after one ends — O(1) events per run, so a
        // file appended once and never touched costs one event total
        val events = members
          .groupBy(col("file"))
          .agg(sort_array(collect_set(col("rank"))).as("ranks"))
          .select(explode(concat(
            expr("""transform(
                 filter(transform(ranks, (r, i) ->
                   CASE WHEN i = 0 OR element_at(ranks, i) < r - 1
                        THEN r END), x -> x IS NOT NULL),
                 r -> struct(r AS rank, 1 AS kind))"""),
            expr("""transform(concat(
                 filter(transform(ranks, (r, i) ->
                   CASE WHEN i > 0 AND element_at(ranks, i) < r - 1
                        THEN element_at(ranks, i) + 1 END),
                   x -> x IS NOT NULL),
                 CASE WHEN element_at(ranks, -1) < """ + maxRank +
              """ THEN array(element_at(ranks, -1) + 1)
                    ELSE array() END),
                 r -> struct(r AS rank, 0 AS kind))"""))).as("e"))
          .groupBy(col("e.rank").as("rank"), col("e.kind").as("kind"))
          .count()
          .collect() // O(versions) rows — the only driver materialization
        events.groupBy(_.getInt(0)).view.mapValues { rows =>
          val added = rows.find(_.getInt(1) == 1).map(_.getLong(2)).getOrElse(0L)
          val removed = rows.find(_.getInt(1) == 0).map(_.getLong(2)).getOrElse(0L)
          (added, removed)
        }.toMap
      }
    var running = 0L
    val rows = vs.zipWithIndex.zip(None +: vs.map(Some(_))).map {
      case ((v, r), parent) =>
        val (nAdded, nRemoved) = perRank.getOrElse(r, (0L, 0L))
        running += nAdded - nRemoved
        val namesOpt = manifestNames(v)
        val committedMs = WarehouseIO.modifiedAtMs(logFile(f"v$v%05d.list"))
        // manifest-layer observability: how many delta manifests this
        // snapshot references (merge-on-commit / compactManifests fold
        // shows as a drop to 1; 0 = legacy inline snapshot) and the
        // streaming txn line, if the commit carried one
        (v.toLong, parent.map(_.toLong), new java.sql.Timestamp(committedMs),
          running, nAdded, nRemoved,
          namesOpt.map(_.size.toLong).getOrElse(0L),
          WarehouseIO.snapshotTxn(snapshotFile(v))
            .map { case (id, b) => s"$id#$b" })
    }
    rows.toDF("version", "parent_version", "committed_at", "n_files",
      "n_added_files", "n_removed_files", "n_manifests", "txn")
  }

  /** One row per live data file — (file_path, record_count, size_bytes,
    * modified_at), Iceberg's `files` table. Fully DISTRIBUTED: the counts
    * come from one scan that reads only the `_metadata` struct (column
    * pruning leaves data columns untouched; parquet serves the row counts
    * from footers), so a 100 TB table's file inventory costs a
    * metadata-only scan across executors, never a driver-side loop over
    * millions of footers. */
  def metaFiles(spark: SparkSession): DataFrame = {
    val rels =
      if (config.versioned && snapshotVersions().nonEmpty)
        manifestFiles(snapshotVersions().last)
      else listDataFiles()
    // per-relation capture (round-14): a mixed-spine or clone manifest
    // unions several scan relations, where `_metadata` is unresolvable —
    // the inventory must come from columns captured inside each relation
    readFiles(spark, rels, captureFileMeta = true)
      .groupBy(col("__graft_file").as("file_path"))
      .agg(count(lit(1)).as("record_count"),
        first(col("__graft_size")).as("size_bytes"),
        first(col("__graft_mtime")).as("modified_at"))
  }

  /** Iceberg's `partitions` metadata table: one row per live partition —
    * (partition, record_count, file_count, size_bytes), the rollup a
    * maintenance pipeline reads to find skewed or fragmented partitions
    * before compaction. The partition identity is recovered from the data
    * file PATH (the `col=value` directory spine), not from data columns,
    * so derived-transform partitions (day/bucket/truncate) report their
    * transformed values exactly as written and the scan stays
    * metadata-only: like [[metaFiles]], the counts come from parquet
    * footers via the `_metadata` struct with every data column pruned.
    * Unpartitioned tables report one row with partition = ''. */
  def metaPartitions(spark: SparkSession): DataFrame = {
    val rels =
      if (config.versioned && snapshotVersions().nonEmpty)
        manifestFiles(snapshotVersions().last)
      else listDataFiles()
    // strip this table's root AND (for shallow clones) the source root,
    // so cloned files report the same partition spine as local ones; the
    // roots compare as URI PATHS (scheme/authority stripped by the lazy
    // prefix) so the spine is stable across file:/hdfs:/s3a: reporting
    val roots = (rootUriPath(config.tablePath) +:
        cloneBasePath.toSeq.map(rootUriPath))
      .map(java.util.regex.Pattern.quote).mkString("(", "|", ")")
    // same per-relation capture as [[metaFiles]] — `_metadata` does not
    // resolve across a mixed-spine/clone union (round-14)
    readFiles(spark, rels, captureFileMeta = true)
      .groupBy(regexp_replace(
          regexp_replace(col("__graft_file"),
            s"^[a-z][a-z0-9+.-]*:.*?$roots/?", ""),
          "/?[^/]+$", "").as("partition"),
        col("__graft_file").as("fp"))
      .agg(count(lit(1)).as("n"),
        first(col("__graft_size")).cast("long").as("sz"))
      .groupBy(col("partition"))
      .agg(sum(col("n")).as("record_count"),
        count(lit(1)).as("file_count"),
        sum(col("sz")).as("size_bytes"))
  }

  /** Iceberg `all_delete_files` metadata-table analogue: one row per
    * LIVE merge-on-read delete sidecar — `(version, flavor, n_entries,
    * detail)` where flavor ∈ 'predicate' | 'keys' | 'positions',
    * `n_entries` is the sidecar's entry count (1 for a predicate; list
    * rows otherwise) and `detail` names the predicate text or the key
    * columns. The maintenance dashboard behind
    * [[consolidateDeletes]]/[[compact]] decisions: read amplification is
    * proportional to the rows here. Cost: driver manifest metadata plus
    * one tiny parquet count per list sidecar. */
  def metaDeletes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(config.versioned,
      "delete sidecars are commit metadata — versioned tables only")
    val idx = sidecarIndex()
    val rows = snapshotVersions().flatMap { v =>
      val preds = idx.predicates(v)
      val pred =
        if (preds.isEmpty) None
        else Some((v.toLong, "predicate", preds.size.toLong,
          preds.mkString(" OR ")))
      val kds = idx.keyDirs(v)
      val keys =
        if (kds.isEmpty) None
        else {
          val k = kds.map(kd => spark.read.parquet(kd.toString))
            .reduce(_ unionByName _)
          Some((v.toLong, "keys", k.count(), k.columns.mkString(",")))
        }
      val pos = {
        val pds = idx.posDirs(v)
        if (pds.isEmpty) None
        else Some((v.toLong, "positions",
          pds.map(pd => spark.read.parquet(pd.toString))
            .reduce(_ unionByName _).count(),
          "file_path,row_pos"))
      }
      Seq(pred, keys, pos).flatten
    }
    rows.toDF("version", "flavor", "n_entries", "detail")
      .orderBy($"version", $"flavor")
  }

  /** Iceberg's `remove_orphan_files` analogue: delete data files present
    * in the table directory but referenced by NO committed snapshot — the
    * debris a crashed or killed write leaves behind (its files landed, its
    * manifest commit never did). Snapshot reads already ignore orphans
    * ([[readVersion]], GraftCatalog latest-commit resolution); this
    * reclaims the space and keeps the unversioned live-directory read
    * honest. Crashed `_staging/` write attempts past the grace window are
    * swept too. Returns the deleted relative paths.
    *
    * `graceMs` mirrors Iceberg's `older_than` and is what makes the sweep
    * safe under the optimistic commit protocol: a CONCURRENT staged write
    * renames its files into the table tree BEFORE claiming its version
    * ([[stagedWrite]]), so for a moment live-but-uncommitted files look
    * exactly like orphans. Only files whose modification time is at least
    * `graceMs` old are deleted — an in-flight commit finishes (or times
    * out on its bounded retries) long before the default window.
    * Pass `graceMs = 0` only when no writer can be live (maintenance
    * downtime, tests).
    *
    * Only meaningful on versioned tables — without manifests there is no
    * commit record to distinguish an orphan from data, so the call refuses
    * rather than guessing. Driver-side work is bounded file metadata (the
    * same listing the snapshot log itself writes, plus one mtime probe per
    * orphan CANDIDATE — not per table file). */
  def removeOrphans(
      graceMs: Long = TableSink.DefaultOrphanGraceMs): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    require(config.versioned && snapshotVersions().nonEmpty,
      "removeOrphans needs a versioned table with at least one commit — " +
        "an unversioned directory has no manifest to define 'orphan'")
    require(graceMs >= 0L, "graceMs must be >= 0")
    val now = System.currentTimeMillis()
    // live branches count as references: an unpublished audit branch's
    // files are staged-but-committed (to the branch), not debris
    val referenced = (snapshotVersions().flatMap(manifestFiles) ++
      branches().flatMap(b => branchVersions(b).flatMap(branchManifest(b, _)))
      ).toSet
    val root = new HPath(config.tablePath)
    val orphans = listDataFiles().filterNot(referenced)
      .filter(rel =>
        now - WarehouseIO.modifiedAtMs(new HPath(root, rel)) >= graceMs)
    orphans.foreach(rel => WarehouseIO.delete(new HPath(root, rel)))
    // crashed staged-write attempts: a successful stagedWrite removes its
    // own directory, so anything still under _staging past the grace
    // window is debris from a killed writer
    val staging = new HPath(root, "_staging")
    val deadStages = WarehouseIO.childNames(staging).filter { n =>
      now - WarehouseIO.modifiedAtMs(new HPath(staging, n)) >= graceMs
    }
    deadStages.foreach(n =>
      WarehouseIO.delete(new HPath(staging, n), recursive = true))
    // crashed MoR mutations and delete commits: a sidecar written
    // before a claim that never landed strands an unreferenced
    // `pos-*`/`keys-*`/`del-*` entry in the log — never consulted (only
    // snapshot-referenced sidecars of CLAIMED snapshots fold), pure
    // debris. Referenced = every live snapshot's #pos/#keys/#del line.
    val logNames = WarehouseIO.childNames(logPath).toSet
    val referencedSc = snapshotVersions().flatMap { v =>
      val (p, k, d) = WarehouseIO.snapshotSidecarRefs(
        logFile(f"v$v%05d.list"))
      p.toSeq ++ k.toSeq ++ d.toSeq
    }.toSet
    val deadSc = logNames.filter(n => n.startsWith("pos-") ||
        n.startsWith("keys-") || n.startsWith("del-"))
      .filterNot(referencedSc)
      .filter(n => now - WarehouseIO.modifiedAtMs(logFile(n)) >= graceMs)
      .toSeq.sorted
    deadSc.foreach(n => WarehouseIO.delete(logFile(n), recursive = true))
    orphans ++ deadStages.map(n => s"_staging/$n") ++
      deadSc.map(n => s"_graft_log/$n")
  }

  /** One-call maintenance sweep (Delta `VACUUM` + Iceberg
    * `expire_snapshots` in the order they must run): age-based snapshot
    * expiry first (files referenced only by dropped history become
    * orphans), then the grace-windowed orphan + dead-staging sweep.
    * Returns (expired versions, deleted paths). The individual ops carry
    * the refusal contracts (tag pins, live sidecars) and grace semantics;
    * this is just the scheduled-job composition. */
  def vacuum(cutoffMs: Long, keepLast: Int = 1,
      graceMs: Long = TableSink.DefaultOrphanGraceMs): (Seq[Int], Seq[String]) = {
    // `cutoffMs` is an ABSOLUTE epoch cutoff (same name and meaning as
    // the delegate) — NOT a retention age; passing "7 days in millis"
    // would be a January-1970 cutoff that silently expires nothing
    val expired = expireSnapshotsOlderThan(cutoffMs, keepLast)
    val removed = removeOrphans(graceMs)
    (expired, removed)
  }

  /** Roll the table back to snapshot `version`: data files not in that
    * manifest are deleted and later snapshots are dropped. Only reaches
    * files appends created after `version` (rewrites would have expired
    * the manifest first), so the restored state is exactly what
    * [[readVersion]] showed. */
  def rollbackTo(version: Int): Unit = {
    // a tag pinning a post-target snapshot would dangle after its
    // manifest is deleted — refuse loudly (same contract as rewrites)
    val dangling = tags().filter(tagVersion(_) > version)
    require(dangling.isEmpty,
      s"rollbackTo($version) would orphan tags pinning newer snapshots; " +
        s"drop them first: ${dangling.mkString(", ")}")
    // files a live branch still references survive the rollback — the
    // branch remains readable/publishable against the rolled-back main
    val keep = (manifestFiles(version) ++
      branches().flatMap(b => branchVersions(b).flatMap(branchManifest(b, _)))
      ).toSet
    val root = new org.apache.hadoop.fs.Path(config.tablePath)
    listDataFiles().filterNot(keep)
      .foreach(rel =>
        WarehouseIO.delete(new org.apache.hadoop.fs.Path(root, rel)))
    val rbIdx = sidecarIndex()
    snapshotVersions().filter(_ > version).foreach { v =>
      WarehouseIO.delete(deletesPath(v))
      // snapshot-referenced sidecars resolve via the version file, so
      // they are captured BEFORE it is deleted (the index covers every
      // shape: std files/dirs plus #pos/#keys/#del references)
      rbIdx.refNames(v).foreach(n =>
        WarehouseIO.delete(logFile(n), recursive = true))
      Seq(keysPath(v), posDeletesPath(v)).foreach { kd =>
        if (WarehouseIO.isDir(kd)) WarehouseIO.delete(kd, recursive = true)
      }
      WarehouseIO.delete(logFile(f"v$v%05d.list"))
    }
    gcManifests() // deltas referenced only by the rolled-off snapshots
  }

  // ------------------------------------------------- branches (WAP)
  // Iceberg-style named branches over the same snapshot-manifest machinery:
  // a branch is an independent head under _graft_log/branch_<name>/, whose
  // manifests use the identical one-relative-path-per-line format as main.
  // The flagship use is WRITE-AUDIT-PUBLISH (reference README.md:95-105
  // positions the connector as the commit-coordination layer; WAP is the
  // staging workflow Iceberg builds on exactly this primitive): stage a
  // batch on a branch, audit it with full queries — main's readers never
  // see a row of it — then publish (fast-forward main to the branch head)
  // or drop the branch and reclaim its files via removeOrphans.
  //
  // Scale shape: branching is pure manifest metadata — creating, reading,
  // publishing, and dropping a branch never copies or rewrites a data
  // file. An appendToBranch writes exactly the files a main append would.

  private def branchLogPath(name: String): org.apache.hadoop.fs.Path = {
    require(name.matches("[A-Za-z0-9_-]+"),
      s"branch name must be [A-Za-z0-9_-]+, got '$name'")
    logFile(s"branch_$name")
  }

  /** Live branch names (empty when none or unversioned). A branch is
    * LIVE only once it carries a committed version: [[createBranch]]
    * writes `base` before `v00001.list`, so a crash between the two
    * leaves a bare `branch_<name>` dir — counting that phantom as live
    * would block every MoR sidecar commit until someone hand-dropped it,
    * and re-running createBranch (which overwrites the stale base) is
    * the natural heal. [[dropBranch]] still removes a phantom dir (it
    * checks the directory, not liveness). */
  def branches(): Seq[String] =
    WarehouseIO.childNames(logPath)
      .collect { case n if n.startsWith("branch_") => n.stripPrefix("branch_") }
      .filter(n => branchVersions(n).nonEmpty)
      .sorted

  /** Branch names that are live OR mid-creation (`base` written,
    * `v00001.list` not yet — [[createBranch]] writes them in that
    * order). The REFUSAL surfaces (rewrites, sidecar commits) must
    * count a mid-creation branch as live: its base version is already
    * pinned, so a sidecar landing above it would silently never apply
    * to the branch's two-slice read — the audit view would diverge
    * from main. Read/serving paths keep [[branches]] (a phantom has no
    * versions to read and heals by re-running createBranch). */
  private[graft] def branchesOrPending(): Seq[String] =
    WarehouseIO.childNames(logPath)
      .collect { case n if n.startsWith("branch_") => n.stripPrefix("branch_") }
      .filter(n => branchVersions(n).nonEmpty || WarehouseIO.isFile(
        new org.apache.hadoop.fs.Path(branchLogPath(n), "base")))
      .sorted

  /** Committed versions on a branch, oldest first. */
  def branchVersions(name: String): Seq[Int] =
    WarehouseIO.childNames(branchLogPath(name))
      .collect { case n if n.startsWith("v") && n.endsWith(".list") =>
        n.stripPrefix("v").stripSuffix(".list").toInt }
      .sorted

  private def branchSnapshotFile(name: String,
      v: Int): org.apache.hadoop.fs.Path = {
    val m = new org.apache.hadoop.fs.Path(branchLogPath(name), f"v$v%05d.list")
    require(WarehouseIO.exists(m),
      s"branch '$name' has no version $v; available: " +
        branchVersions(name).mkString(", "))
    m
  }

  /** Branch snapshots use the same layered format as main and reference
    * manifests in the MAIN log dir — creating a branch shares the head's
    * manifests instead of copying a file list, and a branch append
    * commits one delta manifest exactly like a main append. */
  private def branchManifest(name: String, v: Int): Seq[String] =
    WarehouseIO.readSnapshotFiles(logPath, branchSnapshotFile(name, v))

  private def branchManifestNames(name: String, v: Int): Option[Seq[String]] =
    WarehouseIO.snapshotManifestNames(branchSnapshotFile(name, v))

  private def branchHeadFiles(name: String): Seq[String] = {
    val vs = branchVersions(name)
    require(vs.nonEmpty, s"branch '$name' does not exist; live branches: " +
      branches().mkString(", "))
    branchManifest(name, vs.last)
  }

  /** Create branch `name` at main snapshot `fromVersion` (default: the
    * latest commit). The branch's v1 is a copy of that manifest; the
    * BASE version is recorded alongside it, so branch reads under
    * pending merge-on-read sidecars know which sidecar slice applies
    * (round-12 — creation used to refuse outright, making WAP and MoR
    * deletes mutually exclusive until a compaction ran). */
  def createBranch(name: String, fromVersion: Option[Int] = None): Unit = {
    require(config.versioned && snapshotVersions().nonEmpty,
      "branches need a versioned table with at least one commit")
    require(branchVersions(name).isEmpty, s"branch '$name' already exists")
    val v = fromVersion.getOrElse(snapshotVersions().last)
    // share the snapshot's manifests by NAME (pure O(manifest count)
    // metadata); a legacy inline snapshot migrates into one manifest
    val names = manifestNames(v).getOrElse(
      Seq(WarehouseIO.writeManifest(logPath, manifestFiles(v))))
    // base BEFORE v1: the two-slice read must never see a branch whose
    // base slice it cannot scope (sidecar commits are refused while the
    // branch lives, so the set "sidecars <= base" is frozen from here)
    WarehouseIO.writeString(
      new org.apache.hadoop.fs.Path(branchLogPath(name), "base"), v.toString)
    WarehouseIO.writeString(
      new org.apache.hadoop.fs.Path(branchLogPath(name), "v00001.list"),
      WarehouseIO.renderSnapshot(names))
  }

  /** The main-snapshot version branch `name` was created at; None for a
    * pre-round-12 branch (creatable only with zero pending sidecars, so
    * the two-slice read never needs the base for one). */
  private[graft] def branchBaseVersion(name: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(branchLogPath(name), "base")
    if (WarehouseIO.isFile(p)) Some(WarehouseIO.readString(p).trim.toInt)
    else None
  }

  /** Append `df` to branch `name`: the physical write is identical to
    * [[append]] (coerce → derive → cluster → land files in the table
    * directory), but the commit goes to the BRANCH manifest — main's head
    * does not move, and snapshot-resolved readers (readVersion, the
    * catalog) cannot see the new files until [[publishBranch]]. */
  def appendToBranch(name: String, df: DataFrame): Unit = {
    requireNoStreamingLog()
    branchHeadFiles(name)                     // fails fast if no branch
    // same staged O(added)-commit protocol as [[append]], and the same
    // optimistic exclusive-create version claim (concurrent auditors on
    // one branch commute exactly like main appends)
    val added = stagedWrite(clusterForWrite(withDerived(Ops.ensureMessage(df))))
    val own = WarehouseIO.writeManifest(logPath, added.distinct.sorted)
    var attempt = 0
    var committed = false
    while (!committed) {
      attempt += 1
      val headV = branchVersions(name).last
      // O(manifest count) head read, same layered protocol as main; a
      // legacy inline branch head migrates into one manifest on the way
      val headNames = branchManifestNames(name, headV).getOrElse(
        Seq(WarehouseIO.writeManifest(logPath, branchManifest(name, headV))))
      committed = WarehouseIO.writeStringIfAbsent(
        new org.apache.hadoop.fs.Path(
          branchLogPath(name), f"v${headV + 1}%05d.list"),
        WarehouseIO.renderSnapshot((headNames :+ own).distinct))
      // only an actual loss counts against the bound — a win on the
      // final attempt is a durable commit, not an error
      require(committed || attempt < 20,
        s"branch '$name' commit lost the version race 20 times")
    }
  }

  /** Read the branch head — the audit surface of WAP: every query the
    * table supports runs against staged-plus-inherited data while main
    * stays untouched. Under pending merge-on-read sidecars (round-12 —
    * creation used to refuse, making WAP and MoR deletes mutually
    * exclusive) the read applies exactly the sidecars committed at or
    * before the BRANCH BASE to the whole head: the base slice gets the
    * same subtraction a main read performs, and the staged slice is
    * filtered the way it WILL be once published — predicate and
    * key-list sidecars are row-scoped on this engine (a later append
    * matching a live predicate is subtracted on main too), while
    * position sidecars reference only base-file coordinates, so staged
    * rows pass them untouched. Sidecar commits are refused while
    * branches live, so the base's sidecar set is frozen and the view is
    * stable for the audit's lifetime. */
  def readBranch(spark: SparkSession, name: String): DataFrame = {
    val head = branchHeadFiles(name)
    branchBaseVersion(name).filter(hasPendingDeletes) match {
      case None => readFiles(spark, head)
      // capturePos, like every other applyDeletes call site (round-14):
      // a branch over a mixed-spine or clone manifest is a
      // multi-relation union, where a position sidecar's `_metadata`
      // fold is unresolvable unless captured per relation
      case Some(b) => applyDeletes(readFiles(spark, head,
        capturePos = true), b)
    }
  }

  /** Publish: main's next snapshot becomes `current main head + the files
    * the branch staged` (branch head minus the branch's base manifest).
    * When main has not moved since [[createBranch]] this is exactly a
    * fast-forward to the branch head; when main took concurrent appends
    * (legal — rewriting ops are blocked while branches are live, so main
    * can only have GAINED files) it is Iceberg's append cherry-pick: the
    * staged files land without losing main's interim commits. Pure
    * metadata — no data file moves. Returns the new main version. The
    * branch stays live; drop it when done. */
  def publishBranch(name: String): Int = {
    val base = branchManifest(name, 1).toSet
    val staged = branchHeadFiles(name).filterNot(base)
    // optimistic append-commit of the staged file set: concurrent main
    // appends (legal while a branch is live) merge instead of being lost
    commitAppendedFiles(staged)
  }

  /** Drop branch `name`. Files only the branch referenced become orphans —
    * [[removeOrphans]] reclaims them (the abandoned-audit cleanup path). */
  def dropBranch(name: String): Unit = {
    val dir = branchLogPath(name)
    require(WarehouseIO.isDir(dir),
      s"branch '$name' does not exist; live branches: " +
        branches().mkString(", "))
    WarehouseIO.delete(dir, recursive = true)
    gcManifests() // delta manifests only the branch referenced
  }

  // ------------------------------------------------------------- tags
  // Immutable named refs to committed snapshots (Iceberg tags, reference
  // README's snapshot pinning use case): a tag is one small file in the
  // log mapping name → version. Reading through a tag is exactly
  // [[readVersion]]; unlike a branch a tag never moves and takes no
  // writes. Rewriting ops refuse while tags exist (the same loud-failure
  // contract as branches — a rewrite invalidates the manifests tags pin).

  private def tagPath(name: String): org.apache.hadoop.fs.Path = {
    require(name.matches("[A-Za-z0-9_-]+"),
      s"tag name must be [A-Za-z0-9_-]+, got '$name'")
    logFile(s"tag_$name")
  }

  /** Tag `name` pinning snapshot `version` (default: the current head). */
  def createTag(name: String, version: Option[Int] = None): Unit = {
    require(config.versioned && snapshotVersions().nonEmpty,
      "tags need a versioned table with at least one commit")
    require(!WarehouseIO.exists(tagPath(name)),
      s"tag '$name' already exists")
    val v = version.getOrElse(snapshotVersions().last)
    manifestFiles(v)                       // fails fast on a bad version
    WarehouseIO.writeString(tagPath(name), v.toString)
  }

  /** Live tag names (empty when none or unversioned). */
  def tags(): Seq[String] =
    WarehouseIO.childNames(logPath)
      .collect { case n if n.startsWith("tag_") => n.stripPrefix("tag_") }
      .sorted

  /** The snapshot version tag `name` pins. */
  def tagVersion(name: String): Int = {
    val p = tagPath(name)
    require(WarehouseIO.exists(p),
      s"tag '$name' does not exist; live tags: ${tags().mkString(", ")}")
    WarehouseIO.readString(p).trim.toInt
  }

  /** Read the snapshot a tag pins — time travel by name. */
  def readTag(spark: SparkSession, name: String): DataFrame =
    readVersion(spark, tagVersion(name))

  def dropTag(name: String): Unit = {
    val p = tagPath(name)
    require(WarehouseIO.exists(p),
      s"tag '$name' does not exist; live tags: ${tags().mkString(", ")}")
    WarehouseIO.delete(p)
    ()
  }

  /** Upsert (merge-by-key): rows whose `keyCols` match an incoming row are
    * replaced; all other rows are kept; incoming rows append. The copy-on-
    * write merge Iceberg-class tables provide and an append-only connector
    * cannot. `incoming` must carry at most one row per key (dedup upstream;
    * [[startStreamUpsert]] does).
    *
    * Scale shape: only AFFECTED partitions are rewritten — both the
    * partitions the incoming rows land in AND the partitions currently
    * holding a matching key (a key may move partitions; missing the old
    * home would leave a stale duplicate). Both sets are bounded
    * partition-value frames, broadcast into semi-joins; survivors
    * anti-join the incoming keys and the union lands via DYNAMIC partition
    * overwrite, which replaces exactly the partitions present in the
    * written frame. Unaffected partitions' files are never rewritten.
    *
    * When a key migration empties an affected partition entirely — which
    * dynamic overwrite cannot express — or the table is unpartitioned,
    * the merge falls back to a full crash-safe rewrite-and-swap
    * ([[delete]]'s protocol).
    *
    * The survivors are localCheckpoint-materialized before the dynamic
    * overwrite: Spark refuses to overwrite a path that is still being
    * lazily read.
    */
  /** Zero-copy shallow clone (Delta `SHALLOW CLONE` / Iceberg snapshot-ref
    * semantics): the clone is a NEW versioned table whose v1 manifest
    * references the source head's data files by ABSOLUTE path — an
    * O(metadata) operation that copies no data. From then on the tables
    * diverge independently: appends to the clone land in the clone's own
    * directory (its manifests mix absolute source entries with local
    * ones), and the first rewriting op (upsert/delete/compact) fully
    * materializes the clone — after which it no longer references the
    * source at all. The source never observes the clone.
    *
    * Guards (refuse rather than silently diverge):
    *  - source must be versioned with a non-empty head (the clone
    *    contract is "the head snapshot", and an empty manifest cannot
    *    seed a readable table);
    *  - no pending merge-on-read deletes on the source head — sidecars
    *    live in the SOURCE's log, which the clone does not read; compact
    *    the source first so the cloned manifest already reflects them;
    *  - no re-cloning a clone: its manifest mixes two roots and a
    *    grandchild would need per-root basePaths; clone the original.
    *
    * SOURCE-side rewrites are the clone's standing hazard (Delta's
    * shallow-clone + VACUUM trade, documented not guarded — the source
    * never observes the clone): a compact/delete/upsert or vacuum on
    * the SOURCE deletes physical files the clone's manifest references,
    * and the clone then fails at scan time with missing files.
    * Materialize the clone first (compact it — it stops referencing the
    * source entirely) or re-clone after source maintenance. */
  def shallowCloneTo(destConfig: SinkConfig): TableSink = {
    require(config.versioned, "shallow clone requires a versioned source")
    require(cloneBasePath.isEmpty,
      "cannot clone a clone; clone the original table instead")
    val head = snapshotVersions().lastOption
      .getOrElse(sys.error("shallow clone requires at least one snapshot"))
    require(!hasPendingDeletes(head),
      "source head has pending merge-on-read deletes; compact() it first")
    val files = manifestFiles(head)
    require(files.nonEmpty, "cannot shallow-clone an empty table")
    val srcRoot = rootUriPath(config.tablePath)
    val abs = files.map(rel =>
      if (rel.startsWith("/")) rel else s"$srcRoot/$rel")
    val dest = new TableSink(destConfig.copy(versioned = true,
      fileFormat = config.fileFormat,
      partitionSpec = config.partitionSpec,
      tableSchema = config.tableSchema))
    // refuse a non-empty destination: writing the clone manifest over an
    // existing table would hide its log and strand its data files (they
    // would be neither in the new manifest nor ever re-listed)
    require(!WarehouseIO.exists(dest.logPath),
      s"clone destination '${destConfig.tableName}' already has a " +
        "snapshot log; clone into a fresh table")
    require(dest.dataFilesRel().isEmpty,
      s"clone destination '${destConfig.tableName}' already contains data " +
        "files; clone into a fresh table")
    // a RENAME/DROP is a declared-layer mapping over the same physical
    // files the clone now references: without the source's mapping the
    // clone would read pre-rename files' renamed column as NULL, and an
    // ALTER ADD on the clone could resurrect a dropped column's bytes
    // (round-13). The ALTER-declared schema rides along too (round-14,
    // the WIDEN twin): a type-widened source leaves mixed narrow/wide
    // file generations, and a clone without the declared schema would
    // footer-infer — pinning whichever width the sampled file carried
    // and failing the read on the other generation. Copy the sidecars
    // BEFORE the version file so a crash mid-clone can never leave a
    // readable clone missing its mapping; from here the two tables'
    // declared layers diverge independently.
    Seq("_graft_renames", "_graft_tombstones", "_graft_schema").foreach { n =>
      val srcF = new org.apache.hadoop.fs.Path(config.tablePath, n)
      if (WarehouseIO.isFile(srcF))
        WarehouseIO.writeString(
          new org.apache.hadoop.fs.Path(dest.config.tablePath, n),
          WarehouseIO.readString(srcF))
    }
    // the clone's v1 is layered like every snapshot; its one manifest
    // lives in the DEST's log dir (a clone resolves names against its
    // own log, never the source's)
    WarehouseIO.writeString(dest.logFile("v00001.list"),
      WarehouseIO.renderSnapshot(
        Seq(WarehouseIO.writeManifest(dest.logPath, abs))))
    WarehouseIO.writeString(dest.logFile("clone_base"), srcRoot)
    dest
  }

  /** Refuse a keyed-apply batch whose columns don't align with the
    * table's CURRENT schema (round-13): both upsert flavors project the
    * incoming batch onto the table's columns, so an incoming column the
    * table lacks would be SILENTLY DROPPED — the CDC-replication shape
    * (source evolved via ALTER ADD, replica didn't) loses the new
    * column's values forever. Derived partition columns are exempt
    * (hidden-transform reads project them away while the write side
    * re-derives them). The remedy is real: declare the evolved head
    * schema on this table (SinkConfig.tableSchema — old files NULL-fill)
    * or run SQL ALTER TABLE ADD COLUMNS, then re-apply. */
  private def requireAlignedBatch(incomingCols: Seq[String],
      baseCols: Seq[String], op: String): Unit = {
    // names compare case-INSENSITIVELY (round-14): Spark resolution is
    // case-insensitive by default, so a batch column differing only in
    // case projects fine — refusing it as both extra and missing would
    // reject batches the apply itself handles (mirrors tombstonedIn)
    val baseLower = baseCols.map(_.toLowerCase).toSet
    val incomingLower = incomingCols.map(_.toLowerCase).toSet
    val derived = partitionColNames.map(_.toLowerCase).toSet
    val extra = incomingCols
      .filterNot(c => baseLower(c.toLowerCase))
      .filterNot(c => derived(c.toLowerCase))
    require(extra.isEmpty,
      s"$op batch carries columns the table lacks: " +
        s"${extra.mkString(", ")} — the table's schema is behind the " +
        "incoming rows (a source-side ALTER before a replication apply " +
        "hits this); evolve the table first — declare the new head " +
        "schema (SinkConfig.tableSchema) or SQL ALTER TABLE ADD COLUMNS " +
        "— instead of silently dropping the values")
    val missing = baseCols.filterNot(c => incomingLower(c.toLowerCase))
    require(missing.isEmpty,
      s"$op batch is missing table columns: ${missing.mkString(", ")} — " +
        "supply them explicitly (NULL if semantically absent)")
  }

  /** One bounded pass over the batch enforcing the keyed-apply contract
    * every join below ASSUMES: key tuples non-null and unique within the
    * batch. Both violations were silent before (round-13): a NULL key
    * never matches the semi/anti join, so the row re-inserts on EVERY
    * apply — a CDC replica fed one NULL-keyed source row accumulates a
    * duplicate per batch forever; a duplicate tuple lands BOTH copies
    * (the anti-join removes the old rows, the union appends the whole
    * batch). O(batch) key-column aggregation — the same shuffle shape as
    * the incomingKeys distinct the apply itself runs — never O(table). */
  private def requireKeyedBatch(incoming: DataFrame, keyCols: Seq[String],
      op: String): Unit = {
    val viol = incoming.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .where(keyCols.map(col(_).isNull).reduceLeft(_ || _) ||
        col("__graft_n") > 1)
      .limit(3).collect()
    require(viol.isEmpty,
      s"$op key contract violated on (${keyCols.mkString(", ")}): " +
        viol.map(r => s"${r.toSeq.init.mkString("(", ", ", ")")}×" +
          s"${r.getLong(r.length - 1)}").mkString("; ") +
        " — key tuples must be non-null and unique within the batch. A " +
        "NULL key never matches the keyed join (the row would re-insert " +
        "on every apply, silently duplicating); a repeated tuple would " +
        "land every copy. Pre-aggregate to one row per key (e.g. " +
        "dropDuplicates on the keys after ordering) and filter or repair " +
        "NULL keys upstream")
  }

  def upsert(df: DataFrame, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    requireNoStreamingLog()
    requireNoBranches("upsert")
    requireKeyedBatch(df, keyCols, "upsert")
    recoverSwap()
    val spark = df.sparkSession
    if (!WarehouseIO.exists(new org.apache.hadoop.fs.Path(config.tablePath))) {
      append(df); return
    }
    val incoming = withDerived(Ops.ensureMessage(df))
    // existing rows passed at their own append; only the incoming batch
    // needs the gate (one bounded pass over the batch, not the table)
    requireConstraints(incoming, "upsert")
    val parts = partitionColNames
    val current = read(spark)
    requireAlignedBatch(incoming.columns.toSeq, current.columns.toSeq,
      "upsert")
    val incomingKeys = incoming.select(keyCols.map(col): _*).distinct()
    def merged(base: DataFrame): DataFrame = {
      val survivors = base.join(incomingKeys, keyCols, "left_anti")
      survivors.unionByName(incoming.select(survivors.columns.map(col): _*))
    }
    if (parts.isEmpty || cloneBasePath.isDefined || pendingMorDeletes) {
      // unpartitioned: a merge is a full rewrite either way — swap protocol.
      // A shallow clone ALSO forces the full rewrite (its documented
      // materialization contract): dynamic overwrite would write only the
      // touched partitions into the clone's own directory, and the
      // post-rewrite re-snapshot (local listing) would silently drop every
      // untouched partition still referenced via the source's absolute
      // manifest entries.
      // Pending merge-on-read sidecars force it too: the partition-scoped
      // path leaves untouched partitions' files physically intact while
      // expireSnapshots drops the sidecars that still subtracted their
      // deleted rows — resurrecting them at the head. The full rewrite
      // materializes survivors (read() applies the sidecars) first.
      rewriteSwap(spark, merged(current), expectRows = None)
    } else {
      val affected = incoming.select(parts.map(col): _*)
        .unionByName(current.join(incomingKeys, keyCols, "left_semi")
          .select(parts.map(col): _*))
        .distinct() // bounded: partition values of the incoming batch + old key homes
      val touched = current.join(broadcast(affected), parts, "left_semi")
      val finalRows = merged(touched)
      val emptied = affected.join(
        finalRows.select(parts.map(col): _*).distinct(), parts, "left_anti")
        .limit(1).count() > 0
      if (emptied) rewriteSwap(spark, merged(current), expectRows = None)
      else {
        val survivors = touched.join(incomingKeys, keyCols, "left_anti")
          .localCheckpoint() // cut lineage off the files about to be replaced
        dynamicOverwrite(spark, clusterForWrite(
          survivors.unionByName(incoming.select(survivors.columns.map(col): _*))))
      }
    }
    if (config.versioned) expireSnapshots() // rewrites invalidate history
  }

  /** MERGE-ON-READ keyed upsert — the non-rewriting twin of [[upsert]]
    * and the CDC replication apply's O(batch) fast path: ONE commit
    * position-deletes the head rows whose key tuple appears in `df` and
    * appends `df`'s rows — no partition rewrite however big the
    * replica, no history expiry (time travel across applies comes
    * free). Same atomic `#pos`-in-snapshot shape as [[updateMor]], same
    * lost-race re-resolution, same key contract as [[upsert]] (keys
    * unique within the batch, non-null — ENFORCED since round-13, one
    * O(batch) pass). Sidecars stack one per apply —
    * pair with [[maybeConsolidateDeletes]] (the replication apply does)
    * or [[compact]]. Versioned parquet tables only; a table with no
    * commits yet takes the plain append. */
  def upsertMor(df: DataFrame, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "upsertMor needs at least one key column")
    requireNoStreamingLog()
    val liveBranches = branchesOrPending()
    require(liveBranches.isEmpty,
      "upsertMor while a branch is live would make the audit surface " +
        "disagree with main; publish or drop first: " +
        liveBranches.mkString(", "))
    requireKeyedBatch(df, keyCols, "upsertMor")
    recoverSwap()
    require(config.versioned,
      "merge-on-read upsert needs versioned=true (position sidecars are " +
        "commit metadata); use upsert() for copy-on-write")
    require(config.fileFormat == "parquet",
      s"upsertMor needs the parquet reader's _metadata.row_index; " +
        s"format '${config.fileFormat}' does not expose row ordinals")
    val spark = df.sparkSession
    if (snapshotVersions().isEmpty) { append(df); return }
    // derive partition columns UP FRONT (idempotent in the commit's own
    // withDerived) so the replacement aligns with the head frame's
    // columns on hidden-transform tables too
    val incoming = withDerived(Ops.ensureMessage(df))
    val incomingKeys = incoming.select(keyCols.map(col): _*).distinct()
    var attempt = 0
    while (attempt < 5) {
      attempt += 1
      val base = readHeadWithPos(spark)
      requireAlignedBatch(incoming.columns.toSeq,
        base.columns.toSeq.filterNot(c =>
          c == "__graft_file" || c == "__graft_pos"), "upsertMor")
      // pin ONE evaluation: the position list must describe exactly the
      // head rows this commit's appends replace
      val matched = base.join(incomingKeys, keyCols, "left_semi")
        .select(col("__graft_file").as("file_path"),
          col("__graft_pos").as("row_pos"))
        .localCheckpoint()
      try {
        // select resolves case-insensitively (a batch may legally carry
        // case-different names — round-14); toDF pins the TABLE's
        // canonical names on the written files either way
        val tableCols = base.columns.filterNot(c =>
          c == "__graft_file" || c == "__graft_pos")
        commitMorMutation(spark, matched,
          incoming.select(tableCols.map(col): _*).toDF(tableCols: _*))
        return
      } catch {
        case e: Throwable =>
          val lostRace = e.isInstanceOf[IllegalArgumentException] &&
            Option(e.getMessage).exists(_.contains("lost the version race"))
          if (!lostRace || attempt >= 5) throw e
        // else loop: re-resolve positions against the new head
      }
    }
  }

  /** Commit `df` with DYNAMIC partition overwrite: exactly the partitions
    * present in `df` are replaced, every other partition is untouched.
    * `df`'s lineage must not read the table's own files (checkpoint first).
    */
  private def dynamicOverwrite(spark: SparkSession, df: DataFrame): Unit = {
    val parts = partitionColNames
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      val writer = df.write.mode("overwrite")
        .format(config.fileFormat).options(config.extraOptions)
      (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
        .save(config.tablePath)
    } finally prevMode match {
      case Some(m) => spark.conf.set(key, m)
      case None => spark.conf.unset(key)
    }
  }

  // ------------------------------------------- crash-safe rewrite & swap
  // Shared by delete and upsert's fallback path. compact keeps its own
  // interleaved copy (its swap is entangled with file-sizing); the
  // _pre_* recovery contract is identical.

  private def rmTree(p: org.apache.hadoop.fs.Path): Unit = {
    WarehouseIO.delete(p, recursive = true)
    ()
  }

  /** A swap scratch directory NEXT TO the table root (it cannot live
    * inside — the swap renames the whole root), DOT-PREFIXED so neither
    * the SQL catalog's table listing nor any recursive data scan of the
    * warehouse can mistake a live `_rewriting` tmp dir or a crashed run's
    * `_pre_*` trash for a real table ("t_rewriting" used to surface in
    * SHOW TABLES mid-rewrite, and loadTable could read the half-written
    * dir). */
  private def scratchSibling(suffix: String): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(config.tablePath)
    val name = s".${p.getName}$suffix"
    val sib = Option(p.getParent)
      .map(par => new org.apache.hadoop.fs.Path(par, name))
      .getOrElse(new org.apache.hadoop.fs.Path(name))
    // naming must agree with the catalog's DROP cleanup
    assert(WarehouseIO.scratchSiblings(p).map(_.getName).contains(name))
    sib
  }

  /** The swap's durable INTENT marker (a scratch-sibling FILE — it must
    * survive the root moving out from under it). Content:
    * `phase\ntrashName\ntmpName`. */
  private def swapMarker: org.apache.hadoop.fs.Path = scratchSibling("_swap")

  /** Mutex over the swap roll-forward (a scratch-sibling lock FILE).
    * Exactly one actor — the live [[executeSwap]] writer or one healer —
    * may move the roots at a time: without it, two concurrent healers
    * (two SQL sessions both load-healing, or a reader racing the live
    * writer) can both read a phase-1 marker, and the slower one replays
    * `moveTree(root, trash)` against the already-HEALED root, then
    * `rmTree(trash)` deletes the entire new table. Acquired by exclusive
    * create ([[WarehouseIO.writeStringIfAbsent]] — one winner on any
    * store); released in-band; a crash strands it, so waiters break
    * locks older than [[WarehouseIO.swapLockStaleMs]] by mtime. */
  private def swapLock: org.apache.hadoop.fs.Path = scratchSibling("_swaplock")

  /** Block until this actor holds [[swapLock]]; returns the owner token
    * (release proves ownership before deleting — a broken-and-reclaimed
    * lock must not be deleted by its previous holder). */
  private def acquireSwapLock(): String = {
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + 600000L
    while (!WarehouseIO.writeStringIfAbsent(swapLock, token)) {
      val stale = scala.util.Try(
        System.currentTimeMillis() - WarehouseIO.modifiedAtMs(swapLock) >
          WarehouseIO.swapLockStaleMs).getOrElse(false)
      // crashed holder (a LIVE one heartbeats its mtime — see
      // swapLockHeartbeat — so only a process death ages out): break via
      // rename-to-tombstone, which admits exactly ONE breaker — the
      // old stale-check + delete could delete a FRESH lock another
      // waiter claimed between this thread's mtime read and its delete
      if (stale) WarehouseIO.breakLock(swapLock)
      else Thread.sleep(25)
      require(System.currentTimeMillis() < deadline,
        s"swap lock wait timed out for ${config.tablePath} — a healer or " +
          "rewriter has held the lock past the stale threshold without " +
          "its mtime aging out; inspect the _swaplock sibling")
    }
    token
  }

  /** Self-throttled heartbeat for a HELD [[swapLock]]: refreshes the
    * lock's mtime at most every staleMs/4, so however long the per-file
    * move of a large tree runs, waiters never see the live lock age past
    * the stale threshold and break it mid-swap (the hazard: a broken
    * live lock lets a second actor replay phase 1 against a root the
    * holder is still moving). Touch failures are swallowed — the lock
    * may legitimately be gone after release, and a missed beat only
    * risks an early break, which the phase-1 `exists(tmp)` guard and
    * idempotent per-file moves already make non-destructive. */
  private def swapLockHeartbeat(): () => Unit = {
    val interval = math.max(WarehouseIO.swapLockStaleMs / 4, 1L)
    var last = System.currentTimeMillis()
    () => {
      val now = System.currentTimeMillis()
      if (now - last >= interval) {
        last = now
        scala.util.Try(WarehouseIO.touch(swapLock))
        ()
      }
    }
  }

  private def releaseSwapLock(token: String): Unit = {
    if (scala.util.Try(WarehouseIO.readString(swapLock)).toOption
        .contains(token))
      WarehouseIO.delete(swapLock)
    ()
  }

  /** Execute a verified swap: `tmp` (the COMPLETE new table) replaces the
    * root, the old root lands in `trash` and is dropped. Object-store
    * SAFE: the commit point is one atomic single-file write (the intent
    * marker — object stores give atomic PUT even where directory rename
    * is per-object copy+delete); from the marker on, the swap only ever
    * rolls FORWARD ([[recoverSwap]] resumes the idempotent per-file
    * moves), so a crash at ANY step leaves a recoverable table and never
    * loses the rewrite. Before the marker, nothing moved — the abort
    * contract (table untouched) holds as before. On atomic-rename stores
    * the moves are the same two namespace renames as always; the marker
    * just makes the crash window self-healing instead of
    * restore-the-old. */
  private def executeSwap(tmp: org.apache.hadoop.fs.Path,
      trash: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val root = new HPath(config.tablePath)
    def mark(phase: Int): String =
      s"$phase\n${trash.getName}\n${tmp.getName}"
    // the mutex is held across marker + moves: a concurrent load-healer
    // seeing the marker blocks on the lock instead of racing the live
    // writer's moves (and finds the marker gone once we finish)
    val token = acquireSwapLock()
    val beat = swapLockHeartbeat()
    try {
      WarehouseIO.writeStringAtomic(swapMarker, mark(1)) // ← commit point
      WarehouseIO.swapStepHook("marker1")
      WarehouseIO.moveTree(root, trash, beat)
      WarehouseIO.writeStringAtomic(swapMarker, mark(2))
      WarehouseIO.swapStepHook("marker2")
      WarehouseIO.moveTree(tmp, root, beat)
      WarehouseIO.swapStepHook("moved")
      beat()
      rmTree(trash)
      WarehouseIO.delete(swapMarker)
      ()
    } finally releaseSwapLock(token)
  }

  /** Repair an interrupted swap. A live intent marker means the swap
    * COMMITTED — roll it forward: finish moving the old root out
    * (phase 1), then the new table in (phase 2), then clean up; every
    * move is per-file idempotent, so this is correct on stores without
    * atomic directory renames. A versioned table whose caller crashed
    * before its post-swap history reset gets its fresh v1 here. Without
    * a marker, the pre-marker-era contract applies to leftover trash
    * dirs: data stranded with no root is restored, trash beside an
    * intact root is dropped. */
  private[graft] def recoverSwap(): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val root = new HPath(config.tablePath)
    if (WarehouseIO.isFile(swapMarker)) {
      // serialize against the live writer and any other healer, then
      // RE-READ the marker under the lock: the common outcome of losing
      // the race is "already healed" (marker gone) — return, nothing to do
      val token = acquireSwapLock()
      val beat = swapLockHeartbeat()
      try {
      if (!WarehouseIO.isFile(swapMarker)) return
      val lines = WarehouseIO.readString(swapMarker).split("\n")
      val (phase, trashName, tmpName) = (lines(0), lines(1), lines(2))
      def sibling(name: String): HPath = Option(root.getParent)
        .map(par => new HPath(par, name)).getOrElse(new HPath(name))
      val (trash, tmp) = (sibling(trashName), sibling(tmpName))
      if (phase == "1") {
        // phase 1 is only meaningful while the NEW table still sits in
        // tmp; with tmp gone the swap already rolled forward (root IS the
        // new table) and moving root to trash would destroy it — the
        // guard makes a stale phase-1 marker harmless even if exclusion
        // were ever breached (e.g. a broken-then-reclaimed stale lock)
        if (WarehouseIO.exists(tmp)) {
          WarehouseIO.moveTree(root, trash, beat)
          WarehouseIO.writeStringAtomic(swapMarker, s"2\n$trashName\n$tmpName")
        }
      }
      if (WarehouseIO.exists(tmp)) WarehouseIO.moveTree(tmp, root, beat)
      beat()
      rmTree(trash)
      WarehouseIO.delete(swapMarker)
      // the interrupted caller never reached its post-swap history
      // reset: the rewritten root carries no _graft_log — snapshot the
      // recovered state as v1 so versioned reads resume. Versioned-ness
      // comes from the DURABLE declaration sidecars (carried through
      // every swap), not just this instance's config: a minimal recovery
      // handle (the SQL catalog healing a table on load) must restore
      // the owner's semantics, not its own.
      val declaredVersioned = config.versioned ||
        WarehouseIO.isFile(new HPath(root, "_graft_versioned")) ||
        (WarehouseIO.isFile(new HPath(root, "_graft_config")) &&
          WarehouseIO.readString(new HPath(root, "_graft_config"))
            .contains("versioned=true"))
      if (declaredVersioned && !WarehouseIO.isDir(logPath)) writeSnapshot()
      } finally releaseSwapLock(token)
      return
    }
    Seq("_pre_rewrite", "_pre_compact").foreach { sfx =>
      val trash = scratchSibling(sfx)
      if (WarehouseIO.exists(trash)) {
        if (!WarehouseIO.exists(root)) WarehouseIO.rename(trash, root)
        else rmTree(trash)
      }
    }
  }

  /** Durable table DECLARATIONS ride every rewrite swap: the CHECK
    * constraints / writer config (`_graft_config`), the SQL-declared or
    * ALTER-evolved schema (`_graft_schema`), and the versioned marker are
    * the table's identity, not its history — losing them to a rewrite
    * would silently drop the constraint gate from subsequent catalog
    * INSERTs and un-declare evolved schemas. Copied INTO the tmp dir
    * BEFORE the renames, so every crash point leaves them intact (the
    * recovery paths then restore whichever dir holds them). History-class
    * sidecars stay behind on purpose: `_graft_log` (rewrites invalidate
    * history; a new generation is snapshotted after the swap, and a
    * clone's `clone_base` pointer dies with it — materialization is the
    * documented contract) and `_graft_stats`/`_graft_bloom` (file-keyed
    * stats are meaningless for the rewritten files; pruning without stats
    * is conservative — re-run analyze). */
  private def carryDeclarationSidecars(root: org.apache.hadoop.fs.Path,
      tmp: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    Seq("_graft_config", "_graft_schema", "_graft_versioned",
        "_graft_tombstones", "_graft_renames").foreach { n =>
      val src = new HPath(root, n)
      if (WarehouseIO.isFile(src))
        WarehouseIO.writeString(new HPath(tmp, n), WarehouseIO.readString(src))
    }
  }

  /** Rewrite the whole table as `finalRows` via temp-dir + double rename.
    * When `expectRows` is set the rewrite aborts (table untouched) on a
    * row-count mismatch; None skips the check (callers whose expected
    * count is not independently known). */
  private def rewriteSwap(spark: SparkSession, finalRows: DataFrame,
      expectRows: Option[Long], preserveLayout: Boolean = false): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val root = new HPath(config.tablePath)
    val trash = scratchSibling("_pre_rewrite")
    val tmp = scratchSibling("_rewriting")
    if (WarehouseIO.exists(tmp)) rmTree(tmp)
    val parts = partitionColNames
    // preserveLayout: the caller already arranged the physical clustering
    // (a z-order rewrite) — the sink's own repartition would destroy it
    val arranged =
      if (preserveLayout) finalRows else clusterForWrite(finalRows)
    val writer = arranged.write.mode("overwrite")
      .format(config.fileFormat).options(config.extraOptions)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
      .save(tmp.toString)
    expectRows.foreach { expect =>
      val rewritten = spark.read.format(config.fileFormat)
        .load(tmp.toString).count()
      if (rewritten != expect) {
        rmTree(tmp)
        throw new IllegalStateException(
          s"rewrite produced $rewritten rows, expected $expect — aborted, " +
            "original table untouched")
      }
    }
    carryDeclarationSidecars(root, tmp)
    executeSwap(tmp, trash)
  }

  /** Z-ORDER clustered rewrite — Delta `OPTIMIZE ZORDER BY` / Iceberg
    * `rewrite_data_files(sort_order => zorder(...))` analogue: the whole
    * table rewrites range-clustered by the Morton interleave of
    * `dimExprs` (SQL expressions yielding longs, e.g. `unix_micros(ts)`,
    * `CAST(value * 100 AS BIGINT)`), so that with [[ZoneMaps]] stats a
    * rectangle predicate on ANY clustered dimension reads O(perimeter)
    * files instead of O(table). Bounds are computed in one aggregate;
    * the rewrite is [[rewriteSwap]]'s crash-safe swap with the sink's
    * own write repartition suppressed (it would destroy the layout).
    * Pending merge-on-read sidecars materialize through the rewrite
    * (the clustered rows come from [[read]]) and history expires — the
    * same contract as [[compact]]. Stale zone-map/Bloom stats become
    * conservative, not wrong; re-run analyze for the tight zones.
    * Row-count-verified before the destructive step. */
  /** Shared protocol of both clustered rewrites ([[clusterBy]],
    * [[clusterByHilbert]]): guards (streaming log, branches/tags, clone
    * manifest, TEMP-COLUMN CLASHES — a destructive rewrite silently
    * replacing-then-dropping a real column of a temp name would lose its
    * data with history expired), swap recovery, row-count-verified
    * rewrite-swap with the sink's own repartition suppressed, and
    * history expiry. One body so a guard added for one curve cannot
    * drift away from the other. */
  private def clusteredRewrite(spark: SparkSession, op: String,
      tempCols: Seq[String])(cluster: DataFrame => DataFrame): Unit = {
    requireNoStreamingLog()
    requireNoBranches(op)
    require(cloneBasePath.isEmpty || snapshotVersions().nonEmpty,
      s"$op on a clone needs a committed manifest")
    recoverSwap()
    val cur = read(spark)
    val totalRows = cur.count()
    if (totalRows == 0) return
    val clash = tempCols.filter(cur.columns.contains)
    require(clash.isEmpty,
      s"$op's temp layout columns collide with table columns " +
        s"${clash.mkString(", ")} — rename them first")
    rewriteSwap(spark, cluster(cur), Some(totalRows), preserveLayout = true)
    if (config.versioned) expireSnapshots() // rewrites invalidate history
  }

  def clusterBy(spark: SparkSession, dimExprs: Seq[String],
      nRanges: Int = 48, bits: Int = 16): Unit = {
    require(dimExprs.nonEmpty, "clusterBy needs at least one dimension")
    val dimCols = dimExprs.indices.map(i => s"__zd_$i")
    clusteredRewrite(spark, "clusterBy", dimCols :+ "__z") { cur =>
      val withDims = dimExprs.zipWithIndex.foldLeft(cur) {
        case (d, (e, i)) => d.withColumn(s"__zd_$i", expr(e).cast("long"))
      }
      val b = ZOrder.boundsOf(withDims, dimCols)
      ZOrder.cluster(withDims,
          dimCols.map(c => (c, b(c)._1, b(c)._2)), nRanges, bits)
        .drop(dimCols: _*)
    }
  }

  /** Hilbert-clustered rewrite — the space-filling-curve successor to
    * [[clusterBy]] (Databricks liquid clustering's curve; see
    * [[Hilbert]]): same crash-safe rewrite-swap and guards, but
    * consecutive cluster keys are always grid-adjacent, so the range
    * files cut from the curve are tighter rectangles and a 2-D predicate
    * touches fewer of them at the same file count. Exactly two
    * dimensions (the classic xy2d walk). */
  def clusterByHilbert(spark: SparkSession, xExpr: String, yExpr: String,
      nRanges: Int = 48, bits: Int = 8): Unit = {
    val dimCols = Seq("__zd_0", "__zd_1")
    // Hilbert.cluster/withHilbert inject their own temp columns too —
    // all of them must be clash-guarded, not just the dimension pair
    clusteredRewrite(spark, "clusterByHilbert",
        dimCols ++ Seq("__nx0", "__ny0", "__h")) { cur =>
      val withDims = cur
        .withColumn("__zd_0", expr(xExpr).cast("long"))
        .withColumn("__zd_1", expr(yExpr).cast("long"))
      val b = ZOrder.boundsOf(withDims, dimCols)
      Hilbert.cluster(withDims,
          ("__zd_0", b("__zd_0")._1, b("__zd_0")._2),
          ("__zd_1", b("__zd_1")._1, b("__zd_1")._2), nRanges, bits)
        .drop(dimCols: _*)
    }
  }

  /** Delete rows matching `condition`; returns the deleted count. A
    * condition evaluating to NULL keeps the row (SQL DELETE semantics —
    * the predicate is coalesced to false, never silently dropping
    * NULL-predicate rows).
    *
    * Two commit paths, chosen by what the predicate sweeps:
    *  - normal case — every touched partition keeps at least one row:
    *    rewrite ONLY the touched partitions via dynamic overwrite (same
    *    shape as [[upsert]]);
    *  - a partition is emptied entirely (or the table is unpartitioned):
    *    dynamic overwrite CANNOT express an emptied partition (it only
    *    replaces partitions present in the written frame — the stale
    *    directory would silently survive), so the whole surviving table
    *    rewrites and swaps via [[rewriteSwap]], row-count-verified before
    *    the destructive step.
    */
  def delete(spark: SparkSession, condition: Column): Long = {
    requireNoStreamingLog()
    requireNoBranches("delete")
    recoverSwap()
    if (!WarehouseIO.exists(new org.apache.hadoop.fs.Path(config.tablePath)))
      return 0L
    val current = read(spark)
    val cond = coalesce(condition, lit(false)) // NULL predicate keeps the row
    val parts = partitionColNames
    if (parts.isEmpty) {
      val totalRows = current.count()
      val nDeleted = current.filter(cond).count()
      if (nDeleted == 0L) return 0L
      rewriteSwap(spark, current.filter(!cond), Some(totalRows - nDeleted))
      if (config.versioned) expireSnapshots()
      return nDeleted
    }
    // matched partition values: a bounded, column-pruned projection —
    // cached so the count, the distinct set, and the sweep check share one
    // scan instead of re-reading the table per question
    val matchedParts = current.filter(cond).select(parts.map(col): _*).cache()
    try {
      val nDeleted = matchedParts.count()
      if (nDeleted == 0L) return 0L
      val touchedVals = matchedParts.distinct()
      val touched = current.join(broadcast(touchedVals), parts, "left_semi")
      val survivors = touched.filter(!cond)
      val emptied = touchedVals.join(
        survivors.select(parts.map(col): _*).distinct(), parts, "left_anti")
        .limit(1).count() > 0
      if (emptied || cloneBasePath.isDefined || pendingMorDeletes) {
        // emptied partition: dynamic overwrite cannot express it; shallow
        // clone: dynamic overwrite would materialize only the touched
        // partitions and the re-snapshot would drop the rest (see upsert);
        // pending merge-on-read sidecars: expireSnapshots would drop them
        // while untouched partitions' files still hold the subtracted
        // rows, resurrecting them (see upsert) — materialize fully
        val totalRows = current.count()
        rewriteSwap(spark, current.filter(!cond), Some(totalRows - nDeleted))
      } else {
        dynamicOverwrite(spark, clusterForWrite(survivors.localCheckpoint()))
      }
      if (config.versioned) expireSnapshots() // rewrites invalidate history
      nDeleted
    } finally matchedParts.unpersist()
  }

  /** SQL-standard UPDATE — rows matching `condition` take the `set`
    * values (cast to their column's type, ANSI store-assignment), every
    * other row is untouched; a NULL condition keeps the row unchanged
    * (same coalesce-to-false contract as [[delete]]). `set` columns are
    * name-resolved against [[read]]'s output, so callers pass
    * `functions.expr`/`col`-built Columns over the table's own columns
    * (the new value may reference the row's current values:
    * `"value" -> expr("value * 2")`).
    *
    * Partition-affecting assignments are REFUSED (a derived partition
    * column, or any source column a partition transform derives from):
    * an updated row could move between partitions, which neither the
    * partition-scoped commit below nor the stale derived column could
    * express correctly — re-home rows with [[delete]] + [[append]] or
    * [[upsert]] instead. With that guarantee every updated row stays in
    * its partition, so the commit rewrites ONLY the touched partitions
    * via dynamic overwrite ([[delete]]'s shape — at 100 TB an update
    * touching one partition rewrites one partition, not the table);
    * unpartitioned tables, shallow clones, and tables with pending
    * merge-on-read sidecars take the full row-count-verified
    * [[rewriteSwap]] for exactly [[upsert]]'s documented reasons.
    * Changed rows re-pass the CHECK-constraint gate (one bounded pass
    * over the matched rows, not the table). Returns the updated-row
    * count.
    */
  def update(spark: SparkSession, condition: Column,
      set: Seq[(String, Column)]): Long = {
    require(set.nonEmpty, "update needs at least one SET assignment")
    require(set.map(_._1).distinct.size == set.size,
      "update assigns a column more than once: " +
        set.map(_._1).diff(set.map(_._1).distinct).distinct.mkString(", "))
    requireNoStreamingLog()
    requireNoBranches("update")
    recoverSwap()
    if (!WarehouseIO.exists(new org.apache.hadoop.fs.Path(config.tablePath)))
      return 0L
    val current = read(spark)
    val missing = set.map(_._1).filterNot(current.columns.contains)
    require(missing.isEmpty,
      s"update SET references unknown columns: ${missing.mkString(", ")}")
    val partitionAffecting =
      (partitionColNames ++ config.partitionSpec.map(_.source)).toSet
    val partHit = set.map(_._1).filter(partitionAffecting)
    require(partHit.isEmpty,
      s"update SET touches partition-deriving columns ${partHit.mkString(", ")}" +
        " — an updated row could move partitions; use delete + append or upsert")
    val cond = coalesce(condition, lit(false)) // NULL predicate keeps the row
    val setMap = set.toMap
    val updatedCols = current.schema.fields.toIndexedSeq.map { f =>
      setMap.get(f.name) match {
        case Some(v) => when(cond, v.cast(f.dataType))
          .otherwise(col(f.name)).as(f.name)
        case None => col(f.name)
      }
    }
    requireConstraints(current.filter(cond).select(updatedCols: _*), "update")
    val parts = partitionColNames
    if (parts.isEmpty || cloneBasePath.isDefined || pendingMorDeletes) {
      val totalRows = current.count()
      val nUpdated = current.filter(cond).count()
      if (nUpdated == 0L) return 0L
      rewriteSwap(spark, current.select(updatedCols: _*), Some(totalRows))
      if (config.versioned) expireSnapshots() // rewrites invalidate history
      return nUpdated
    }
    val matchedParts = current.filter(cond).select(parts.map(col): _*).cache()
    try {
      val nUpdated = matchedParts.count()
      if (nUpdated == 0L) return 0L
      // NULL-SAFE semi join: a matched row living in the NULL partition
      // (cat=__HIVE_DEFAULT_PARTITION__) must still select its partition
      // for rewrite — the usingColumns join's null-unsafe equality would
      // silently drop it while nUpdated still reported it. (delete/upsert
      // don't need this: their `emptied` anti-join is null-unsafe the
      // conservative way — a NULL partition value routes them to the full
      // rewrite.) Renamed columns keep the self-join lineage unambiguous.
      val tvCols = parts.map(_ + "__graft_tv")
      val tvClash = tvCols.filter(current.columns.contains)
      require(tvClash.isEmpty,
        s"update bookkeeping columns collide with ${tvClash.mkString(", ")}" +
          " — rename those columns first")
      val touchedVals = broadcast(matchedParts.distinct().toDF(tvCols: _*))
      val semiCond = parts.zip(tvCols)
        .map { case (p, tv) => col(p) <=> col(tv) }.reduce(_ && _)
      val touched = current.join(touchedVals, semiCond, "left_semi")
      // partition columns are untouched by the SET (guarded above), so
      // every row stays home — rewrite exactly the touched partitions
      val rewritten = touched.select(updatedCols: _*).localCheckpoint()
      dynamicOverwrite(spark, clusterForWrite(rewritten))
      if (config.versioned) expireSnapshots() // rewrites invalidate history
      nUpdated
    } finally matchedParts.unpersist()
  }

  /** MERGE-ON-READ update — the non-rewriting twin of [[update]] and the
    * last O(table-bytes) DML shape retired: ONE commit both position-
    * deletes the matched rows (resolved against the head snapshot, like
    * [[deletePositions]]) and appends their replacements, so the
    * statement costs O(matched rows) data IO however large the table is.
    * History is PRESERVED (no rewrite, no expiry — time travel before
    * the commit shows the old values), the changelog replays it as the
    * matched rows' deletes plus the replacements' inserts at one
    * version, and [[compact]] materializes later.
    *
    * ATOMICITY: the sidecar is referenced INSIDE the claimed snapshot
    * (a `#pos <dir>` metadata line, the streaming `#txn` pattern) —
    * writing it after the claim, the [[deletePositions]] shape, would
    * open a window where a reader sees the replacement rows AND the
    * originals. For pure deletes that window legally shows the
    * PRE-delete state; for an update it would show duplicates, which no
    * snapshot ever contained.
    *
    * CONCURRENCY: the commit claims with `maxAttempts = 1`; losing the
    * version race re-resolves the positions against the new head and
    * retries (bounded) — first-committer-wins snapshot isolation, never
    * a position list resolved against one head landing on another.
    * A crash between sidecar/staging and the claim strands unreferenced
    * debris only ([[removeOrphans]]' contract).
    *
    * Unlike [[update]], SET may touch partition-deriving columns: the
    * replacement rows re-derive their partitions and land wherever they
    * now belong — the originals are position-deleted in place.
    * Versioned parquet tables only; refused while a branch is live.
    * Returns the matched-row count. */
  def updateMor(spark: SparkSession, condition: Column,
      set: Seq[(String, Column)]): Long = {
    require(set.nonEmpty, "updateMor needs at least one SET assignment")
    require(set.map(_._1).distinct.size == set.size,
      "updateMor assigns a column more than once: " +
        set.map(_._1).diff(set.map(_._1).distinct).distinct.mkString(", "))
    requireNoStreamingLog()
    // same branch contract as the delete flavors: a NEW sidecar while a
    // branch is live would change rows the branch's audit view reads
    // through (its base sidecar set is frozen at creation). Tags are
    // fine — sidecars are version-scoped, a tagged snapshot's semantics
    // never change.
    val liveBranches = branchesOrPending()
    require(liveBranches.isEmpty,
      "updateMor while a branch is live would make the audit surface " +
        "disagree with main; publish or drop first: " +
        liveBranches.mkString(", "))
    recoverSwap()
    require(config.versioned,
      "merge-on-read update needs versioned=true (position sidecars are " +
        "commit metadata); use update() for copy-on-write")
    require(config.fileFormat == "parquet",
      s"updateMor needs the parquet reader's _metadata.row_index; " +
        s"format '${config.fileFormat}' does not expose row ordinals")
    require(snapshotVersions().nonEmpty,
      "updateMor needs at least one committed snapshot")
    val cond = coalesce(condition, lit(false)) // NULL predicate keeps rows
    val setMap = set.toMap
    val colsKnown = read(spark).columns
    val missing = set.map(_._1).filterNot(colsKnown.contains)
    require(missing.isEmpty,
      s"updateMor SET references unknown columns: ${missing.mkString(", ")}")
    var attempt = 0
    while (true) {
      attempt += 1
      val base = readHeadWithPos(spark)
      // pin matched rows ONCE: the position list and the replacement
      // rows must describe the same physical rows
      val matched = base.where(cond).localCheckpoint()
      val n = matched.count()
      if (n == 0L) return 0L
      val dataCols = base.schema.fields.toIndexedSeq
        .filterNot(f => f.name == "__graft_file" || f.name == "__graft_pos")
        .map { f =>
          setMap.get(f.name) match {
            case Some(v) => v.cast(f.dataType).as(f.name)
            case None => col(f.name)
          }
        }
      try {
        commitMorMutation(spark,
          matched.select(col("__graft_file").as("file_path"),
            col("__graft_pos").as("row_pos")),
          matched.select(dataCols: _*))
        return n
      } catch {
        case e: Throwable =>
          val lostRace = e.isInstanceOf[IllegalArgumentException] &&
            Option(e.getMessage).exists(_.contains("lost the version race"))
          if (!lostRace || attempt >= 5) throw e
        // else loop: re-resolve positions against the new head
      }
    }
    -1L // unreachable
  }

  /** Rename entries whose OLD physical name is still a field of
    * `declared` — i.e. the table's columns were renamed AFTER that
    * schema was pinned. A streaming source pins its schema at start; a
    * non-empty result means post-rename files would read NULL under the
    * pinned name and the emitted shape would no longer match the
    * stream's declared schema, so the source refuses with the restart
    * remedy (Delta's schema-change contract) instead of dying in a
    * generic unresolved-column error at the batch's projection. */
  def renamesSince(declared: org.apache.spark.sql.types.StructType)
      : Map[String, String] =
    renameMap.filter { case (old, _) =>
      declared.fieldNames.exists(_.equalsIgnoreCase(old)) }

  /** Dropped-column tombstones (`_graft_tombstones`, written by the SQL
    * catalog's `ALTER TABLE … DROP COLUMN`) that are still fields of
    * `declared`. A streaming source whose pinned schema names a dropped
    * column cannot serve its declared shape faithfully for post-drop
    * commits — new files NULL-fill it silently — so it refuses, the
    * DROP twin of [[renamesSince]]. Batch surfaces stay permissive: a
    * declared schema may deliberately read a dropped column's
    * historical bytes. */
  def tombstonedIn(declared: org.apache.spark.sql.types.StructType)
      : Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(config.tablePath,
      "_graft_tombstones")
    if (!WarehouseIO.isFile(p)) Nil
    else {
      val dead = WarehouseIO.readString(p)
        .split("\n").filter(_.nonEmpty).map(_.toLowerCase).toSet
      declared.fieldNames.filter(f => dead.contains(f.toLowerCase)).toSeq
    }
  }

  /** Column names (lower-cased) referenced by LIVE merge-on-read delete
    * sidecars — predicate attribute references plus key-list key
    * columns. The ALTER door refuses DROP COLUMN on any of these
    * (round-14): a pending predicate over a vanished column resolves
    * BENEATH the projection — old files serve their physical value,
    * post-drop files NULL, and `not(NULL)` silently drops every
    * post-drop row — while a key-list anti-join dies unresolved. The
    * remedy is real: consolidate/compact materializes the sidecars,
    * then the DROP is a pure declared-layer projection again.
    * Cost: O(sidecars) metadata — predicate parse + one footer read
    * per key sidecar. RENAME needs no refusal: [[applyDeletes]] folds
    * sidecar references through the rename map. */
  def pendingSidecarColumnRefs(spark: SparkSession): Set[String] = {
    if (!config.versioned) return Set.empty
    val vs = snapshotVersions()
    if (vs.isEmpty) return Set.empty
    val idx = sidecarIndex()
    vs.iterator.flatMap { v =>
      val preds = idx.predicates(v).flatMap { p =>
        scala.util.Try(org.apache.spark.sql.graft.Bridge
          .parseExpression(spark, p)).toOption.toSeq.flatMap(_.collect {
            case a: org.apache.spark.sql.catalyst.analysis
                .UnresolvedAttribute => a.nameParts.head.toLowerCase
          })
      }
      val keys = idx.keyDirs(v).flatMap(kd =>
        spark.read.parquet(kd.toString).schema.fieldNames
          .map(_.toLowerCase))
      preds ++ keys
    }.toSet
  }

  /** The ALTER-evolved declared schema (`_graft_schema`, written
    * atomically by the SQL catalog's ALTER TABLE), when one governs
    * this table. Streaming sources pin against THIS when present:
    * after a type-widening ALTER the table mixes narrow and wide file
    * generations, and only the declared schema makes the parquet/orc
    * readers upcast the narrow ones — footer inference could pin
    * either type depending on which file it sampled. */
  def alterDeclaredSchema
      : Option[org.apache.spark.sql.types.StructType] = {
    val p = new org.apache.hadoop.fs.Path(config.tablePath, "_graft_schema")
    if (!WarehouseIO.isFile(p)) None
    else Some(org.apache.spark.sql.types.DataType
      .fromJson(WarehouseIO.readString(p))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Columns whose CURRENT declared type differs from `declared` —
    * i.e. the table was retyped (type-WIDENING ALTER, the only retype
    * the catalog admits) after that schema was pinned. A streaming
    * source serving the pinned narrow shape would die in the parquet
    * reader's raw conversion error on the first post-widen file;
    * non-empty here means the source must refuse with the restart
    * remedy instead — the WIDEN row of the round-13 evolution matrix,
    * completing [[renamesSince]] (RENAME) and [[tombstonedIn]] (DROP).
    * Returns `(column, pinnedType, declaredType)` triples. */
  def retypedSince(declared: org.apache.spark.sql.types.StructType)
      : Seq[(String, org.apache.spark.sql.types.DataType,
             org.apache.spark.sql.types.DataType)] =
    alterDeclaredSchema.fold(Seq.empty[(String,
        org.apache.spark.sql.types.DataType,
        org.apache.spark.sql.types.DataType)]) { cur =>
      declared.fields.toSeq.flatMap { f =>
        cur.fields.find(_.name.equalsIgnoreCase(f.name))
          .filter(_.dataType != f.dataType)
          .map(c => (f.name, f.dataType, c.dataType))
      }
    }

  /** The head snapshot's semantic rows WITH their physical coordinates
    * (`__graft_file`, `__graft_pos`) — the target frame a merge-on-read
    * mutation resolves its position list against. */
  private[graft] def readHeadWithPos(spark: SparkSession): DataFrame = {
    val head = snapshotVersions().last
    applyDeletes(readFiles(spark, manifestFiles(head), capturePos = true),
      head,
      keepPosCols = true)
  }

  /** ONE atomic merge-on-read MUTATION commit — the shared primitive
    * under [[updateMor]] and the SQL MERGE mor mode: `positions`
    * (`file_path`, `row_pos`) subtract and `replacement` rows append in
    * the SAME claimed snapshot (the sidecar is `#pos`-referenced inside
    * it — a reader can never see old and new copies together). SINGLE
    * claim attempt by design: the caller resolved the positions against
    * the current head, so a lost version race must re-resolve, not
    * retry blindly — [[updateMor]] loops with re-resolution; the SQL
    * MERGE surfaces the conflict (its join is pinned to the
    * analysis-time file set and cannot see the interloper's rows).
    * Replacement rows re-derive partitions and pass the staged
    * CHECK-constraint gate; any failure retracts the sidecar and the
    * staged files (nothing referenced them yet).
    *
    * An INSERT-ONLY mutation (no matched target rows — an insert-heavy
    * MERGE, or an [[upsertMor]] batch of all-new keys, the steady state
    * of a CDC replica ingesting fresh entities) commits a PLAIN append
    * instead: an empty `#pos` sidecar carries no delete semantics but
    * would flip `pendingMorDeletes` permanently — every subsequent read
    * folds a useless empty anti-join, SQL reads degrade to the projected
    * V1 bridge, and consolidation can never clear it. With nothing
    * pinned to the analysis-time head, a pure append also commutes with
    * concurrent commits, so it takes the normal retrying claim rather
    * than this primitive's single-attempt contract. */
  private[graft] def commitMorMutation(spark: SparkSession,
      positions: DataFrame, replacement: DataFrame): Int = {
    // callers localCheckpoint the frame positions derive from, so the
    // emptiness probe is a cheap scan of pinned partitions
    val sidecarOpt =
      if (positions.isEmpty) None
      else Some(s"pos-${java.util.UUID.randomUUID().toString.take(12)}")
    var added: Seq[String] = Nil
    try {
      sidecarOpt.foreach(s =>
        positions.write.mode("overwrite").parquet(logFile(s).toString))
      val prepared = clusterForWrite(withDerived(replacement))
      added = stagedWrite(prepared) // constraint gate runs in staging
      commitAppendedFiles(added,
        maxAttempts = if (sidecarOpt.isDefined) 1 else 20,
        stats = manifestStatsFor(spark, added, prepared.schema),
        posRef = sidecarOpt)
    } catch {
      case e: Throwable =>
        // the claim never landed: this attempt's sidecar and staged
        // files are unreferenced — drop them before propagating
        sidecarOpt.foreach(s =>
          WarehouseIO.delete(logFile(s), recursive = true))
        added.foreach(rel => WarehouseIO.delete(
          new org.apache.hadoop.fs.Path(config.tablePath, rel)))
        throw e
    }
  }

  /** Replace the table's entire row set with `finalRows` under the full
    * guard battery — the commit primitive behind the SQL `UPDATE` /
    * `MERGE INTO` front door ([[graft.plans.GraftDmlRule]]), whose final
    * rows are computed against the analyzer's own resolved plans and so
    * cannot be re-derived from [[read]] here. `finalRows` re-passes the
    * CHECK-constraint gate (updated/inserted rows included), partition
    * columns re-derive for any fresh rows, and the write is [[rewriteSwap]]'s
    * crash-safe swap (which also honors the shallow-clone materialization
    * contract — a full rewrite IS the materialization). */
  private[graft] def replaceAllRows(spark: SparkSession, finalRows: DataFrame,
      expectRows: Option[Long], op: String): Unit = {
    requireNoStreamingLog()
    requireNoBranches(op)
    recoverSwap()
    requireConstraints(finalRows, op)
    rewriteSwap(spark, withDerived(finalRows), expectRows)
    if (config.versioned) expireSnapshots() // rewrites invalidate history
  }

  /** SQL `INSERT OVERWRITE … PARTITION(...)` / `INSERT INTO … REPLACE
    * WHERE` semantics (the DSv2 SupportsOverwrite contract: delete the
    * rows matching `conditionSql`, insert `newRows` — one atomic
    * commit): the final row set is survivors ∪ new rows, and on an
    * identity-partitioned table the write rewrites ONLY the partitions
    * that lost rows plus the partitions receiving new rows
    * ([[replacePartitionsScoped]] — Delta's dynamic replaceWhere
    * shape); otherwise the guarded full rewrite. A NULL condition
    * deletes nothing (SQL three-valued logic). */
  private[graft] def replaceWhere(spark: SparkSession, newRows: DataFrame,
      conditionSql: String): Unit = {
    val cond = coalesce(expr(conditionSql), lit(false))
    // the empty/new-table degrade must trigger ONLY on the precise
    // no-committed-data condition — a versioned table with no snapshot,
    // or a bare directory with no data files. Swallowing a transient
    // read ERROR here (the old Try(read.isEmpty).getOrElse(true)) would
    // commit an append-only result that silently skipped the
    // delete-matching half of REPLACE WHERE; a genuine read failure now
    // propagates and the statement fails un-committed.
    val noData = snapshotVersions().isEmpty &&
      WarehouseIO.listDataFilesRel(
        new org.apache.hadoop.fs.Path(config.tablePath)).isEmpty
    if (noData) {
      // empty/new table: the overwrite is just the insert
      append(newRows); return
    }
    val current = read(spark)
    val finalRows = current.filter(!cond)
      .unionByName(newRows.select(current.columns.map(col): _*))
    val parts = partitionColNames
    val allIdentity = config.partitionSpec.nonEmpty &&
      config.partitionSpec.forall(p =>
        p.transform == Transform.Identity && p.explicitName.isEmpty)
    if (!allIdentity) {
      replaceAllRows(spark, finalRows, None, "INSERT OVERWRITE (filtered)")
      return
    }
    val touched = current.filter(cond).select(parts.map(col): _*).distinct()
      .unionByName(newRows.select(parts.map(col): _*).distinct())
      .distinct()
    replacePartitionsScoped(spark, finalRows, touched,
      "INSERT OVERWRITE (filtered)")
  }

  /** DYNAMIC partition overwrite (Spark's
    * `partitionOverwriteMode=dynamic` semantics as a LIBRARY API):
    * exactly the partitions the incoming rows land in are replaced,
    * every other partition is untouched. On a plain
    * identity-partitioned table this is ONE dynamic-overwrite write
    * (O(incoming)); an unpartitioned table replaces everything (the
    * mode's own semantics); hidden transforms, explicit partition
    * names, clones, and pending merge-on-read sidecars take the
    * guarded full-rewrite equivalent (survivors outside the touched
    * partitions ∪ incoming — same result, the documented conservative
    * cost). The pure-SQL `INSERT OVERWRITE` dynamic form reaches this
    * through [[graft.GraftDynamicOverwriteCommand]] (round-12): Spark's
    * dynamic-overwrite plan has no V1 write fallback, so the session
    * extension rule resolves it into this op before the capability
    * check — alongside the `PARTITION(...)` / `REPLACE WHERE` routes. */
  def overwriteDynamic(spark: SparkSession,
      data: DataFrame): Unit = {
    requireNoStreamingLog()
    requireNoBranches("INSERT OVERWRITE (dynamic)")
    recoverSwap()
    val parts = partitionColNames
    if (parts.isEmpty) {
      replaceAllRows(spark, data, None, "INSERT OVERWRITE (dynamic)")
      return
    }
    val allIdentity = config.partitionSpec.forall(p =>
      p.transform == Transform.Identity && p.explicitName.isEmpty)
    if (allIdentity && cloneBasePath.isEmpty && !pendingMorDeletes) {
      requireConstraints(data, "INSERT OVERWRITE (dynamic)")
      dynamicOverwrite(spark, clusterForWrite(data))
      if (config.versioned) expireSnapshots() // rewrites invalidate history
      return
    }
    // conservative equivalent: survivors outside the incoming rows'
    // partitions ∪ incoming, committed as the guarded full rewrite
    // (null-SAFE partition equality — rows landing in the NULL
    // partition replace it like any other)
    val current = read(spark)
    val dataD = withDerived(data)
    val tv = parts.map(_ + "__graft_dyn")
    val touched = broadcast(
      dataD.select(parts.map(col): _*).distinct().toDF(tv: _*))
    val cond = parts.zip(tv).map { case (p, t) => col(p) <=> col(t) }
      .reduce(_ && _)
    val survivors = current.join(touched, cond, "left_anti")
    val finalRows = survivors.select(current.columns.map(col).toIndexedSeq: _*)
      .unionByName(dataD.select(current.columns.map(col).toIndexedSeq: _*))
    replaceAllRows(spark, finalRows, None, "INSERT OVERWRITE (dynamic)")
  }

  /** PARTITION-SCOPED commit primitive for the SQL MERGE front door:
    * `finalRows` is the statement's COMPLETE final row set (computed
    * against the analyzer's own resolved plans — it cannot be re-derived
    * from [[read]] here) and `touchedVals` the distinct partition-column
    * tuples in which ANY merge action fired (update, delete, or insert).
    * Only those partitions rewrite (dynamic overwrite over `finalRows`
    * restricted to them) — O(touched), not O(table), the same commit
    * shape [[update]]'s scoped path uses. Falls back to the guarded full
    * rewrite exactly where [[delete]] does: a touched partition left
    * EMPTY (dynamic overwrite cannot express an emptied partition), a
    * NULL partition value among the touched tuples (conservative), a
    * shallow clone, or pending merge-on-read sidecars. */
  private[graft] def replacePartitionsScoped(spark: SparkSession,
      finalRows: DataFrame, touchedVals: DataFrame, op: String): Unit = {
    requireNoStreamingLog()
    requireNoBranches(op)
    recoverSwap()
    val parts = partitionColNames
    val touched = touchedVals.localCheckpoint() // bounded: distinct tuples
    def fullFallback(): Unit = {
      requireConstraints(finalRows, op)
      rewriteSwap(spark, withDerived(finalRows), None)
      if (config.versioned) expireSnapshots()
    }
    if (parts.isEmpty || parts.exists(p => !touched.columns.contains(p)) ||
        cloneBasePath.isDefined || pendingMorDeletes) { fullFallback(); return }
    if (touched.isEmpty) return // no action fired anywhere: a no-op
    val hasNullPart = touched
      .filter(parts.map(col(_).isNull).reduce(_ || _)).limit(1).count() > 0
    if (hasNullPart) { fullFallback(); return }
    val restricted = finalRows
      .join(broadcast(touched.select(parts.map(col): _*)), parts, "left_semi")
      .localCheckpoint()
    // a fully-emptied touched partition cannot be expressed by dynamic
    // overwrite (no rows -> no directory rewritten -> stale files remain)
    val emptied = touched.select(parts.map(col): _*)
      .join(restricted.select(parts.map(col): _*).distinct(),
        parts, "left_anti")
      .limit(1).count() > 0
    if (emptied) { fullFallback(); return }
    requireConstraints(restricted, op)
    dynamicOverwrite(spark, clusterForWrite(restricted))
    if (config.versioned) expireSnapshots() // rewrites invalidate history
  }

  /** Streaming path (§3.1): micro-batch append with checkpointed recovery.
    * The reference's size-OR-time buffer flush (connector.py:147-199) maps
    * to BOTH bounds natively:
    *  - time: `batchIntervalSeconds` → the processing-time trigger (no
    *    micro-batch waits longer than the interval);
    *  - size: `batchSize` → the writer's `maxRecordsPerFile`, so no data
    *    file exceeds batch_size records — the same unit the reference's
    *    buffer flush produces (one bounded file batch per flush), while
    *    the micro-batch commit stays atomic. Upstream admission control
    *    (maxFilesPerTrigger etc.) composes via `extraOptions`.
    */
  def startStream(df: DataFrame, checkpointLocation: String): StreamingQuery = {
    // the streaming file sink manages its own commit log (_spark_metadata)
    // and its table rejects all batch ops — the snapshot log would record
    // nothing; versioned streaming ingest goes through startStreamUpsert
    // (foreachBatch → batch commits, which DO snapshot)
    require(!config.versioned,
      "versioned=true is a batch-table feature: the streaming file sink " +
        "has its own exactly-once log; use startStreamUpsert for " +
        "versioned streaming ingest")
    // refuse loudly rather than silently skip the gate: the raw file
    // sink's own commit log bypasses the staged-write boundary where
    // batch constraints are enforced
    require(config.checkConstraints.isEmpty,
      "checkConstraints are not enforceable on the raw streaming file " +
        "sink — use startStreamUpsert (foreachBatch routes every batch " +
        "through the gated merge) or pre-filter with Ops.checkConstraints")
    val prepared = withDerived(Ops.ensureMessage(df))
    val writer = prepared.writeStream
      .format(config.fileFormat)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(s"${config.batchIntervalSeconds} seconds"))
      .option("checkpointLocation", checkpointLocation)
      .option("maxRecordsPerFile", config.batchSize.toLong)
      .options(config.extraOptions)
    (if (partitionColNames.nonEmpty) writer.partitionBy(partitionColNames: _*)
     else writer).start(config.tablePath)
  }

  /** CDC streaming path: every micro-batch MERGES into the table by key
    * instead of appending — `foreachBatch` + [[upsertMor]] on
    * MoR-capable sinks (one O(batch) position-delete + append commit
    * per trigger, sidecars folded past the consolidation threshold;
    * round-12) or [[upsert]] otherwise, the standard Spark shape for
    * change-data-capture sinks. foreachBatch alone gives at-least-once
    * (a crashed batch replays); the merge is idempotent — replaying the
    * same keys re-converges to the same table state — which upgrades
    * the end-to-end guarantee to effectively-once. Batch commits go
    * through the normal writer (no `_spark_metadata` sink log), so the
    * table stays readable by [[read]] and writable by batch [[upsert]]/
    * [[delete]] between runs.
    */
  def startStreamUpsert(df: DataFrame, keyCols: Seq[String],
      checkpointLocation: String): StreamingQuery = {
    df.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(s"${config.batchIntervalSeconds} seconds"))
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // a micro-batch can carry several events for one key; upsert
        // requires key-unique input, so collapse to one row per key first
        // (arbitrary winner — upstream supplies a sequence column and
        // pre-aggregates if last-writer ordering matters). A MoR-capable
        // sink takes the batch as ONE position-delete + append commit
        // ([[upsertMor]], round-12): the streaming CDC sink's per-batch
        // cost drops from rewriting touched partitions to O(batch) —
        // the cadence-critical term — with [[maybeConsolidateDeletes]]
        // bounding the sidecar stack at any trigger rate.
        if (!batch.isEmpty) {
          val deduped = batch.dropDuplicates(keyCols)
          val morApply = config.versioned &&
            config.fileFormat == "parquet" && branches().isEmpty
          if (morApply) {
            upsertMor(deduped, keyCols)
            maybeConsolidateDeletes(batch.sparkSession)
          } else upsert(deduped, keyCols)
        }
      }
      .start()
  }

  /** Newest committed batch id for `streamId`, scanning snapshots
    * newest-first (batch ids are monotonic per stream, so the first hit
    * is the max). Small-file reads, O(retained versions) worst case —
    * in practice 1-2: a live stream's txn line is at or near the head. */
  private def lastTxnBatch(streamId: String): Option[Long] =
    snapshotVersions().reverseIterator
      .flatMap(v => WarehouseIO.snapshotTxn(snapshotFile(v)))
      .collectFirst { case (id, b) if id == streamId => b }

  /** One micro-batch of [[startStreamVersioned]] (also callable directly
    * from a hand-rolled `foreachBatch`): a versioned append whose commit
    * embeds the `(streamId, batchId)` transaction line in its claimed
    * snapshot — atomic with the commit. A batch id at or below the
    * stream's newest committed id is a checkpoint REPLAY and is skipped
    * before a byte is staged. Returns true when the batch committed,
    * false when skipped as a duplicate. */
  def appendStreamBatch(df: DataFrame, streamId: String,
      batchId: Long): Boolean = {
    require(config.versioned,
      "appendStreamBatch commits through the snapshot log — versioned only")
    requireNoStreamingLog()
    if (lastTxnBatch(streamId).exists(_ >= batchId)) return false
    val prepared = clusterForWrite(withDerived(Ops.ensureMessage(df)))
    val added = stagedWrite(prepared)
    persistConfigHints()
    val v = commitAppendedFiles(added, txn = Some(streamId -> batchId),
      stats = manifestStatsFor(df.sparkSession, added, prepared.schema))
    if (v == 0) {
      // a zombie duplicate writer committed this batch id inside our
      // commit window — this attempt's staged files were never
      // referenced; reclaim them now rather than leaving orphans
      added.foreach(rel => WarehouseIO.delete(
        new org.apache.hadoop.fs.Path(config.tablePath, rel)))
      return false
    }
    true
  }

  /** VERSIONED streaming ingest — the Iceberg streaming-write contract
    * the reference positions the connector for (README.md:95-105 commit
    * coordination; connector.py:147-199 buffer flush → here a micro-batch,
    * connector.py:242-257 commit retry → the optimistic claim): every
    * micro-batch commits as ONE snapshot through the same staged write +
    * manifest claim as a batch append, so a streaming table gets time
    * travel, changelog/CDC, branches, expiry, and catalog reads while
    * the stream runs — none of which the raw file-sink log
    * ([[startStream]]) can offer.
    *
    * EXACTLY-ONCE: `foreachBatch` alone is at-least-once (a crashed
    * batch replays from the checkpoint); the commit embeds its
    * `(streamId, batchId)` txn line IN the claimed snapshot file — the
    * Delta `txnAppId`/`txnVersion` pattern on the manifest log — and
    * [[appendStreamBatch]] skips an already-committed id before staging,
    * upgrading the table-side guarantee to exactly-once. Caveat, same as
    * Delta's: history-expiring rewrites discard txn records — run them
    * only while the stream is down and its last batch is durably
    * committed (the standard maintenance-window discipline).
    *
    * Scale shape: per batch, one staged write (executors), one delta
    * manifest of exactly the batch's files, one O(manifest count)
    * snapshot claim; the dedup probe reads small snapshot files
    * newest-first and normally stops at the head. Nothing in the commit
    * grows with table size or stream lifetime (merge-on-commit bounds
    * the manifest count). */
  def startStreamVersioned(df: DataFrame, checkpointLocation: String,
      streamId: Option[String] = None): StreamingQuery = {
    require(config.versioned,
      "startStreamVersioned needs versioned = true — use startStream " +
        "(raw file sink) or startStreamUpsert otherwise")
    val sid = streamId.getOrElse(checkpointLocation)
    df.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(s"${config.batchIntervalSeconds} seconds"))
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendStreamBatch(batch, sid, id)
        ()
      }
      .start()
  }

  /** Read the table back (declared schema wins over inference — README.md:68
    * "static schemas only"). Partition pruning on derived columns is
    * automatic (`PruneFileSourcePartitions`).
    *
    * `mergeSchema = true` unions the schemas of all data files (additive
    * schema evolution: appends that introduced new columns read back with
    * nulls for pre-evolution rows — the Iceberg add-column behavior).
    * Ignored when a `tableSchema` is declared, since the declared schema
    * already pins the read shape.
    */
  def read(spark: SparkSession, mergeSchema: Boolean = false): DataFrame = {
    // a shallow clone has no data under its own directory: its live state
    // IS the head manifest (absolute source entries + local appends), so
    // the read goes through the manifest, never the directory listing
    cloneBasePath match {
      case Some(_) if snapshotVersions().nonEmpty &&
          manifestFiles(snapshotVersions().last).nonEmpty =>
        return readVersion(spark, snapshotVersions().last)
      case _ => ()
    }
    // partition-spec evolution (round-13): the directory-scan fast path
    // below silently DROPS or mis-derives rows when the table holds file
    // generations under different spines (measured: a root-level
    // unpartitioned file vanished beside identity dirs). The head
    // manifest pins the exact file set and readFiles reads each
    // generation under its own layout, so a versioned mixed-spine table
    // serves snapshot semantics instead. One manifest read to detect —
    // the same metadata class the sidecar fold below already pays.
    if (config.versioned) {
      val vs = snapshotVersions()
      if (vs.nonEmpty) {
        val expect = partitionColNames
        val mixed = manifestFiles(vs.last).exists(rel =>
          !rel.startsWith("/") && TableSink.spineOf(rel) != expect)
        if (mixed) return readVersion(spark, vs.last)
      }
    }
    val renames = renameMap
    val r0 = spark.read.format(config.fileFormat)
    val r =
      if (mergeSchema || renames.nonEmpty) r0.option("mergeSchema", "true")
      else r0
    // same sidecar-declared-schema fallback as readFiles (round-14):
    // an ALTER-widened table's mixed narrow/wide generations only read
    // under the declared schema. An explicit mergeSchema=true call
    // keeps inference — the caller asked for the union of the files.
    val declared =
      if (mergeSchema) config.tableSchema
      else config.tableSchema.orElse(alterDeclaredSchema)
    val df = applyRenames(
      declared.map(augmentWithRenameSources(_, renames))
        .fold(r)(s => r.schema(s)).load(config.tablePath),
      renames)
    // live read = head-snapshot semantics: merge-on-read predicates apply
    // (no-op on unversioned tables — no log, no predicates)
    snapshotVersions().lastOption.fold(df)(applyDeletes(df, _))
  }

  /** Like [[read]], but captures the scan's `_metadata.file_path` into
    * `pathCol` BEFORE merge-on-read delete anti-joins make the
    * `_metadata` struct unresolvable — the surface in-plan zone-map
    * skipping ([[ZoneMaps.readBetweenInPlan]]) builds on. */
  private[graft] def readWithScanPath(spark: SparkSession,
      pathCol: String): DataFrame = {
    def captured(df: DataFrame): DataFrame =
      df.withColumn(pathCol, col("_metadata.file_path"))
    cloneBasePath match {
      case Some(_) if snapshotVersions().nonEmpty &&
          manifestFiles(snapshotVersions().last).nonEmpty =>
        // a diverged clone's manifest is a multi-relation union where
        // `_metadata` is unresolvable — derive the path column from the
        // per-relation capture instead (round-13)
        val head = snapshotVersions().last
        val base = readFiles(spark, manifestFiles(head), capturePos = true)
        // multi-relation manifests carry the per-relation capture; a
        // single-relation one resolves `_metadata` directly
        val withPath =
          if (base.columns.contains("__graft_file"))
            base.withColumn(pathCol, col("__graft_file"))
          else base.withColumn(pathCol, col("_metadata.file_path"))
        return applyDeletes(withPath, head)
      case _ => ()
    }
    val r = spark.read.format(config.fileFormat)
    val df = captured(
      config.tableSchema.fold(r)(s => r.schema(s)).load(config.tablePath))
    snapshotVersions().lastOption.fold(df)(applyDeletes(df, _))
  }

  /** Row lineage — Iceberg's `_commit_version` metadata-column analogue:
    * the live table with an extra column naming the snapshot whose commit
    * INTRODUCED each row's data file. Appends never rewrite files, so
    * file→version is exactly "first manifest that lists the file"; the
    * mapping is bounded driver metadata (one pair per live file — the
    * same scale as the manifest itself), broadcast and joined against the
    * scan's own `_metadata.file_path` inside the plan. Composes with
    * merge-on-read deletes (the scan path is captured before their
    * anti-joins) and with shallow clones (absolute source-referenced
    * entries resolve as-is, so cloned rows report the SOURCE-era version
    * they were committed under — v1, the clone's import point).
    *
    * The audit queries this powers — "which commit brought these rows",
    * per-commit row counts, blast-radius of a bad backfill — otherwise
    * need a changelog replay; here they are one scan. */
  def readWithCommitVersion(spark: SparkSession,
      versionCol: String = "_commit_version"): DataFrame = {
    require(config.versioned && snapshotVersions().nonEmpty,
      "row lineage needs a versioned table with at least one commit")
    // "first manifest that lists the file", accumulated from each
    // version's NEW delta manifests (O(Σ deltas) — a merged/compacted
    // manifest re-listing old files never re-attributes them, because
    // already-seen paths are skipped)
    val introduced = snapshotVersions()
      .foldLeft((Map.empty[String, Int], Set.empty[String])) {
        case ((seen, seenNames), v) =>
          val names = manifestNames(v)
          val files = names match {
            case Some(ns) => ns.filterNot(seenNames)
              .flatMap(WarehouseIO.manifestFilesOf(logPath, _))
            case None => manifestFiles(v)
          }
          (seen ++ files.filterNot(seen.contains).map(_ -> v),
            seenNames ++ names.getOrElse(Nil))
      }._1
    val pairs = introduced.toSeq.map { case (rel, v) =>
      val abs =
        if (rel.startsWith("/")) rel else s"${config.tablePath}/$rel"
      (abs, v.toLong)
    }
    import spark.implicits._
    val byPath = pairs.toDF("__lin_path", versionCol)
    readWithScanPath(spark, "__lin_raw")
      .withColumn("__lin_scan",
        regexp_replace(TableSink.decodePath(col("__lin_raw")),
          "^file:(//)?", ""))
      .join(broadcast(byPath), col("__lin_scan") === col("__lin_path"), "left")
      .drop("__lin_raw", "__lin_scan", "__lin_path")
  }

  /** Current `(history generation, head version)` — the streaming
    * source's offset coordinates. The generation pins offsets to ONE
    * snapshot history: a rewriting op expires the log and restarts
    * numbering at v1, so a bare version in a checkpoint could silently
    * resume against a different history. */
  def streamHead(): (String, Int) =
    (logGeneration(), snapshotVersions().lastOption.getOrElse(0))

  /** Last committed snapshot version at or before `cutoffMs` (commit
    * wall-clock = the snapshot file's mtime — the same clock the SQL
    * door's TIMESTAMP AS OF resolves against); None when every retained
    * commit is later. The streaming sources' `startingTimestamp` floor. */
  def versionAtOrBefore(cutoffMs: Long): Option[Int] =
    snapshotVersions()
      .filter(v => WarehouseIO.modifiedAtMs(snapshotFile(v)) <= cutoffMs)
      .lastOption

  /** Last committed snapshot version STRICTLY before `cutoffMs`; None
    * when every retained commit is at or after it. The streaming
    * sources' `startingTimestamp` exclusive floor: the consumer must
    * see every commit at or after the instant (the Delta contract), so
    * a commit landing exactly at the cutoff is emitted, not floored. */
  def versionBefore(cutoffMs: Long): Option[Int] =
    snapshotVersions()
      .filter(v => WarehouseIO.modifiedAtMs(snapshotFile(v)) < cutoffMs)
      .lastOption

  /** The rows commits `(fromVersion, toVersion]` appended — the
    * snapshot-streaming micro-batch. INSERT-ONLY enforcement, precise:
    * a commit that removed or rewrote files (compact / delete / upsert /
    * cluster) or introduced merge-on-read delete sidecars refuses with
    * the commit id and the remedy, instead of silently double-counting
    * re-landed rows the way directory discovery would. Delete sidecars
    * committed AT OR BEFORE `fromVersion` still apply to the new rows
    * (a row appended under a still-live delete predicate never becomes
    * visible — same visibility rule as the batch read and changelog).
    *
    * Metadata cost per batch: O(manifest count) name reads + the two
    * file-set reads per commit in range; data cost: a scan of exactly
    * the appended files. */
  def readAppendedBetween(spark: SparkSession, fromVersion: Int,
      toVersion: Int, ignoreChanges: Boolean = false): DataFrame = {
    val versions = snapshotVersions()
    val idx = sidecarIndex()
    val rng = versions.filter(v => v > fromVersion && v <= toVersion)
    val parts: Seq[DataFrame] = rng.flatMap { v =>
      // `ignoreChanges` (Delta's escape hatch, round-13): an IDEMPOTENT
      // consumer may opt in to keep streaming over merge-on-read
      // UPDATE/DELETE commits — the commit's appended files (an
      // update's replacement rows) re-emit as plain appends, deletions
      // are NOT retracted, and a delete-only commit contributes nothing
      // (Delta's ignoreDeletes folded in). The default stays the loud
      // refusal: a non-idempotent consumer must not silently double-see
      // updated rows.
      require(ignoreChanges || !idx.any(v),
        s"snapshot streaming: commit v$v carries merge-on-read deletes — " +
          "a stream cannot retract rows it already emitted; run deletes " +
          "with the stream down, compact, and restart the consumer from " +
          "a fresh checkpoint — or opt in with ignoreChanges=true if the " +
          "downstream tolerates re-emitted replacement rows")
      val prevSet = versions.filter(_ < v).lastOption
        .map(manifestFiles(_).toSet).getOrElse(Set.empty)
      val cur = manifestFiles(v)
      val removed = prevSet -- cur
      require(removed.isEmpty,
        s"snapshot streaming: commit v$v removed or rewrote " +
          s"${removed.size} file(s) (compact/delete/overwrite) — only " +
          "insert-only commits stream; run maintenance with the stream " +
          "down and restart the consumer from a fresh checkpoint")
      val added = cur.filterNot(prevSet)
      if (added.isEmpty) None
      else Some(applyDeletes(
        readFiles(spark, added, capturePos = true), v))
    }
    if (parts.isEmpty) read(spark).limit(0) else parts.reduce(_ unionByName _)
  }

  /** Streaming read of the table — the Iceberg streaming-read contract
    * (incremental snapshot consumption; reference README.md:95-105 is
    * exactly this commit-coordination story): each micro-batch is the
    * set of COMMITS that landed since the last trigger, resolved through
    * the snapshot log, never a directory listing. A consumer therefore
    * cannot observe a staged append's files before its manifest claim
    * lands, and files orphaned by a crashed or retracted append are
    * never emitted — the visibility rule is the manifest, same as the
    * batch read.
    *
    * Semantics: the FIRST batch is the table's consistent snapshot at
    * the head (merge-on-read deletes applied — any history shape is
    * fine); every later batch is [[readAppendedBetween]] over the new
    * commits, which refuses non-insert commits precisely. Offsets are
    * `(generation, version)` — a mid-stream rewrite that restarts the
    * history fails the stream loudly instead of silently re-reading.
    *
    * An UNVERSIONED table has no snapshot log to stream, so it keeps the
    * file-discovery source (Spark's checkpointed file listing) — the
    * only contract a bare directory can offer.
    *
    * Scale shape: per trigger, one O(manifest count) head probe; per
    * batch, a scan of exactly the appended files. */
  def readStream(spark: SparkSession,
      startingVersion: Option[String] = None,
      startingTimestampMs: Option[Long] = None,
      ignoreChanges: Boolean = false): DataFrame = {
    if (!config.versioned) {
      val schema = config.tableSchema.getOrElse(read(spark).schema)
      return spark.readStream
        .format(config.fileFormat)
        .schema(schema)
        .option("basePath", config.tablePath)
        .load(config.tablePath)
    }
    // declared-schema preference mirrors readChangesStream (round-14):
    // a post-widen restart must re-pin the WIDE declared type, or the
    // refusal's restart remedy would not actually heal
    val schema = config.tableSchema.orElse(alterDeclaredSchema)
      .getOrElse(read(spark).schema)
    val r0 = spark.readStream
      .format("org.apache.spark.sql.graft.GraftTableStream")
      .schema(schema)
      .option("tableName", config.tableName)
      .option("warehousePath", config.warehousePath)
      .option("tablePath", config.tablePath)
      .option("fileFormat", config.fileFormat)
      .option("ignoreChanges", ignoreChanges.toString)
    val r1 = startingVersion.fold(r0)(v => r0.option("startingVersion", v))
    startingTimestampMs.fold(r1)(t =>
      r1.option("startingTimestamp", t.toString)).load()
  }

  /** Partition-spec-evolution-aware read: the table may hold file
    * GENERATIONS written under different partition specs (Iceberg's spec
    * evolution — change how new data is partitioned without rewriting old
    * files; a plain directory load would fail on the conflicting layouts).
    *
    * Files are grouped by their partition-directory signature and each
    * generation is read with its own layout. Which partition directories
    * are table DATA (identity transforms — `partitionBy` strips the column
    * from the files, the directory name is its only copy) versus derived
    * metadata (`day(ts)` etc. — the source column stays in the files) is
    * decided from the files themselves: a column physically present in any
    * generation's files is data, one that only ever appears in directory
    * names is derived and recomputable. Derived-only columns are dropped,
    * generations are unioned by name (missing columns null — additive
    * schema evolution composes), yielding the logical table schema.
    *
    * Scale shape: one footer read per generation (generation count is the
    * number of spec changes, a handful) + the per-generation scans Spark
    * plans normally; grouping is driver-side string work over the file
    * list, the same metadata [[listDataFiles]] already handles. */
  def readEvolved(spark: SparkSession): DataFrame = {
    // VERSIONED tables (round-13): the raw directory listing would
    // include unclaimed staged files and ignore merge-on-read sidecars
    // (deleted rows resurrected silently). The head manifest pins the
    // claimed file set; pending sidecars refuse precisely — a position
    // list cannot fold across this surface's generation union (it needs
    // per-scan file metadata), and compact() materializes both the
    // deletes and the spec migration. Clones materialize first for the
    // same reason their other rewrites do.
    require(cloneBasePath.isEmpty,
      "readEvolved on a shallow clone would scan across two table " +
        "roots; compact() materializes the clone first")
    val rels =
      if (config.versioned && snapshotVersions().nonEmpty) {
        val head = snapshotVersions().last
        require(!hasPendingDeletes(head),
          "readEvolved with pending merge-on-read deletes would " +
            "resurrect deleted rows (sidecars cannot fold across the " +
            "generation union); compact() first — it materializes them")
        manifestFiles(head)
      } else listDataFiles()
    require(rels.nonEmpty, s"table '${config.tableName}' has no data files")
    val groups = rels.groupBy(_.split('/').dropRight(1)
      .takeWhile(_.contains('=')).map(_.takeWhile(_ != '=')).toSeq)
    val fileCols: Set[String] = groups.valuesIterator.flatMap { files =>
      spark.read.format(config.fileFormat)
        .load(s"${config.tablePath}/${files.head}").schema.fieldNames
    }.toSet
    groups.toSeq.sortBy(_._1.mkString(","))
      .map { case (pcols, files) =>
        val df = spark.read.format(config.fileFormat)
          .option("basePath", config.tablePath)
          .load(files.map(f => s"${config.tablePath}/$f"): _*)
        pcols.filterNot(fileCols).foldLeft(df)(_.drop(_))
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Table maintenance: rewrite each partition's files into
    * ~`targetFileBytes` outputs — the compaction dual of the reference's
    * `batch_size` knob (small batches → small files; the reference has no
    * maintenance story for them). Per-partition output counts are derived
    * from on-disk bytes, so a hot partition compacts to many files while a
    * cold one collapses to one; rows are salted into exactly that many
    * writers. The rewrite lands in a temp dir and swaps in with directory
    * renames (single-FS semantics; an object-store deployment swaps a
    * metadata pointer instead — Iceberg's rewrite-files commit).
    */
  /** INCREMENTAL compaction — the 100 TB maintenance shape. Full
    * [[compact]] rewrites every partition (it is also the merge-on-read
    * materializer); at scale a maintenance job compacts only what
    * fragmentation pays for. This selects partitions with more than
    * `maxFiles` files (or, when `minAvgFileBytes` > 0, a mean file size
    * under it), rewrites ONLY those via dynamic partition overwrite
    * (salted to ~`targetFileBytes` outputs, sink sort order preserved),
    * and leaves every other partition's files physically untouched — the
    * rewrite cost is proportional to the FRAGMENTED bytes, not the
    * table. Returns the rewritten partition directory spines.
    *
    * Selection is driver-side file metadata (the same class the snapshot
    * log handles); the rewrite reads exactly the fragmented directories
    * with `basePath` partition derivation, so no filter over partition
    * VALUES (typed, hive-escaped) is ever reconstructed from strings.
    *
    * Refusals: pending merge-on-read deletes (a partial rewrite cannot
    * clear version-scoped sidecars without resurrecting rows in
    * untouched partitions — materialize with [[compact]] first), live
    * branches/tags (same contract as every rewriting op), shallow
    * clones (materialize first), unpartitioned tables (use
    * [[compact]]). Versioned history expires, as for any rewrite. */
  def compactPartitions(spark: SparkSession,
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxFiles: Int = 8,
      minAvgFileBytes: Long = 0L): Seq[String] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.hadoop.fs.{Path => HPath}
    requireNoStreamingLog()
    requireNoBranches("compactPartitions")
    require(cloneBasePath.isEmpty,
      "compactPartitions on a shallow clone would materialize only some " +
        "partitions; run compact() to materialize the clone first")
    require(partitionColNames.nonEmpty,
      "unpartitioned tables have no partition granularity; use compact()")
    snapshotVersions().lastOption.foreach(h => require(!hasPendingDeletes(h),
      "compactPartitions with pending merge-on-read deletes would have to " +
        "clear sidecars that still protect untouched partitions; " +
        "materialize with compact() first"))
    val root = new HPath(config.tablePath)
    val bySpine = listDataFiles()
      .groupBy(f => f.split('/').dropRight(1).mkString("/"))
      .filter(_._1.nonEmpty)
    val fsys = WarehouseIO.fs(root)
    // one listStatus per partition directory, memoized — NOT one
    // getFileStatus RPC per file (and never twice per selected spine):
    // on object-store warehouses per-file status calls would dominate
    // the selection phase in exactly the many-small-files regime this
    // op exists for
    val bytesBySpine = scala.collection.mutable.HashMap.empty[String, Long]
    def spineBytes(spine: String): Long =
      bytesBySpine.getOrElseUpdate(spine,
        fsys.listStatus(new HPath(root, spine)).iterator
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(_.getLen).sum)
    val fragmented = bySpine.filter { case (spine, fl) =>
      fl.size > maxFiles || (minAvgFileBytes > 0L && fl.size > 1 &&
        spineBytes(spine) / fl.size < minAvgFileBytes)
    }
    if (fragmented.isEmpty) return Nil
    val fragBytes = fragmented.keysIterator.map(spineBytes).sum
    // read exactly the fragmented directories; partition columns derive
    // from the spine via basePath. Checkpoint cuts lineage off the files
    // the dynamic overwrite is about to replace.
    val r = spark.read.format(config.fileFormat)
      .option("basePath", config.tablePath)
    val cur = config.tableSchema.fold(r)(s => r.schema(s))
      .load(fragmented.keys.toSeq.sorted.map(s => s"${config.tablePath}/$s"): _*)
      .localCheckpoint()
    val fragRows = cur.count()
    if (fragRows == 0) return Nil
    val bytesPerRow = fragBytes.toDouble / fragRows
    val parts = partitionColNames
    val nf = greatest(lit(1L),
      ceil(count(lit(1)).over(Window.partitionBy(parts.map(col): _*)) *
        lit(bytesPerRow) / lit(targetFileBytes.toDouble)).cast("long"))
    val withSalt = cur
      .withColumn("__salt", pmod(hash(cur.columns.map(col).toSeq: _*), nf))
    val clustered = withSalt
      .repartition((parts.map(col) :+ col("__salt")): _*)
      .drop("__salt")
    val prepared =
      if (config.sortOrder.nonEmpty)
        clustered.sortWithinPartitions(config.sortOrder.map(col): _*)
      else clustered
    dynamicOverwrite(spark, prepared)
    if (config.versioned) expireSnapshots() // rewrite invalidates history
    fragmented.keys.toSeq.sorted
  }

  def compact(spark: SparkSession,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.spark.sql.expressions.Window
    requireNoStreamingLog()
    requireNoBranches("compact")
    val root = new HPath(config.tablePath)
    val trash = scratchSibling("_pre_compact")
    // crash recovery BEFORE the existence check: an interrupted swap is
    // rolled forward (marker) or its stranded trash restored/dropped
    recoverSwap()
    if (!WarehouseIO.exists(root)) return
    // Sizing is bytes-per-row × per-partition row count — deliberately NOT
    // a join on file paths: input_file_name() is percent-encoded while the
    // FS listing is raw (and Hive-style dirs escape specials themselves),
    // and a silent key mismatch there would DROP the affected partition.
    // A shallow clone's bytes live (partly or wholly) under the SOURCE
    // root via absolute manifest entries — the local walk alone would see
    // zero bytes on a fresh clone and early-return, breaking the
    // documented "first rewriting op materializes" contract, and would
    // under-size bytesPerRow for clones with local appends.
    val cloneBytes = cloneBasePath.fold(0L) { _ =>
      snapshotVersions().lastOption.map(manifestFiles).getOrElse(Nil)
        .filter(_.startsWith("/"))
        .map(abs => WarehouseIO.sizeOf(new HPath(abs))).sum
    }
    val totalBytes = cloneBytes + WarehouseIO.totalDataBytes(root)
    if (totalBytes == 0) return
    val cur = read(spark)
    val totalRows = cur.count()
    if (totalRows == 0) return
    val bytesPerRow = totalBytes.toDouble / totalRows
    val parts = partitionColNames
    val nf =
      if (parts.isEmpty) // unpartitioned: global count is already known
        lit(math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes))
      else greatest(lit(1L),
        ceil(count(lit(1)).over(Window.partitionBy(parts.map(col): _*)) *
          lit(bytesPerRow) / lit(targetFileBytes.toDouble)).cast("long"))
    val tmp = scratchSibling("_compacting")
    if (WarehouseIO.exists(tmp)) rmTree(tmp) // stale leftover, crashed run
    // window expressions cannot ride inside repartition: materialize the
    // salt as a column, cluster on it, then drop it before the write
    val withSalt = cur
      .withColumn("__salt", pmod(hash(cur.columns.map(col).toSeq: _*), nf))
    val clustered = withSalt
      .repartition((parts.map(col) :+ col("__salt")): _*)
      .drop("__salt")
    val prepared = // preserve the sink's sorted-within-file invariant
      if (config.sortOrder.nonEmpty)
        clustered.sortWithinPartitions(config.sortOrder.map(col): _*)
      else clustered
    val writer = prepared.write.mode("overwrite")
      .format(config.fileFormat).options(config.extraOptions)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
      .save(tmp.toString)
    // verify BEFORE the destructive swap: a rewrite that lost rows aborts
    val rewrittenRows = spark.read.format(config.fileFormat)
      .load(tmp.toString).count()
    if (rewrittenRows != totalRows) {
      rmTree(tmp)
      throw new IllegalStateException(
        s"compaction rewrite produced $rewrittenRows rows, expected " +
          s"$totalRows — aborted, original table untouched")
    }
    // swap: old table -> trash, compacted -> table, drop trash (a crash
    // mid-swap rolls FORWARD via the intent marker on the next call)
    carryDeclarationSidecars(root, tmp)
    executeSwap(tmp, trash)
    if (config.versioned) expireSnapshots() // rewrite invalidates history
  }
}
