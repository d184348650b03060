package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TableSink.metaSnapshots]] / [[TableSink.metaFiles]] — the Iceberg
  * metadata-table analogues: commit history and the live file inventory as
  * DataFrames, consistent with the manifests and the data they describe. */
class MetaTablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wh = TestSpark.tmpDir("meta_wh")

  private def mkSink(name: String): TableSink = {
    val sink = new TableSink(SinkConfig(tableName = name, warehousePath = wh,
      versioned = true,
      partitionSpec = Seq(PartitionField("cat", Transform.Identity))))
    sink.append(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "cat", "v"))
    sink.append(Seq((4L, "b", 40.0), (5L, "c", 50.0)).toDF("id", "cat", "v"))
    sink
  }

  test("metaSnapshots mirrors the manifest log: lineage, counts, monotonic clock") {
    val sink = mkSink("ms1")
    val rows = sink.metaSnapshots(spark)
      .orderBy($"version")
      .select($"version", $"parent_version", $"n_files", $"n_added_files",
        $"n_removed_files")
      .as[(Long, Option[Long], Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(1L, 2L))
    assert(rows.map(_._2) == Seq(None, Some(1L)))
    // appends only add files: n_files is cumulative, nothing removed
    assert(rows.forall(_._5 == 0L), "append snapshots remove no files")
    assert(rows(0)._3 == rows(0)._4, "v1 adds exactly its file set")
    assert(rows(1)._3 == rows(0)._3 + rows(1)._4)
    // the clock is monotonic non-decreasing in version order
    val times = sink.metaSnapshots(spark).orderBy($"version")
      .select($"committed_at".cast("long")).as[Long].collect().toSeq
    assert(times == times.sorted)
  }

  test("metaFiles agrees with the data: counts sum to the table, sizes positive") {
    val sink = mkSink("ms2")
    val files = sink.metaFiles(spark)
    assert(files.agg(sum($"record_count")).as[Long].head() == 5L,
      "per-file record counts must sum to the live row count")
    assert(files.filter($"size_bytes" <= 0).count() == 0)
    // one inventory row per manifest entry at the head snapshot
    assert(files.count() ==
      sink.metaSnapshots(spark).orderBy($"version".desc)
        .select($"n_files").as[Long].head())
    // the scan is metadata-only: every data column pruned, the parquet
    // reader serves an EMPTY read schema (footer-only row counts)
    val plan = files.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<>"),
      s"metaFiles must prune all data columns from the scan, got:\n$plan")
  }

  test("metaFiles tracks the head snapshot, not stale history") {
    val sink = mkSink("ms3")
    val before = sink.metaFiles(spark).count()
    sink.append(Seq((6L, "d", 60.0)).toDF("id", "cat", "v"))
    val after = sink.metaFiles(spark)
    assert(after.count() > before)
    assert(after.agg(sum($"record_count")).as[Long].head() == 6L)
  }

  test("metaPartitions rolls up the file inventory by partition path") {
    val sink = mkSink("ms5")
    val parts = sink.metaPartitions(spark).cache()
    // the partition spine is the identity-transform directory names
    assert(parts.select($"partition").as[String].collect().toSet ==
      Set("cat=a", "cat=b", "cat=c"))
    // record counts agree with the data per partition value
    val expected = sink.read(spark).groupBy($"cat").count()
      .as[(String, Long)].collect().toMap
    parts.select($"partition", $"record_count").as[(String, Long)].collect()
      .foreach { case (p, n) => assert(n == expected(p.stripPrefix("cat="))) }
    // file-level invariants: counts and sizes consistent with metaFiles
    assert(parts.agg(sum($"file_count")).as[Long].head() ==
      sink.metaFiles(spark).count())
    assert(parts.filter($"size_bytes" <= 0 || $"file_count" < 1).count() == 0)
    // metadata-only scan here too: empty parquet read schema
    val plan = sink.metaPartitions(spark)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<>"),
      s"metaPartitions must prune all data columns, got:\n$plan")
  }

  test("metaPartitions reports one '' partition for unpartitioned tables") {
    val unv = new TableSink(SinkConfig(tableName = "ms6u", warehousePath = wh,
      versioned = true))
    unv.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v"))
    val parts = unv.metaPartitions(spark).collect()
    assert(parts.length == 1 && parts(0).getString(0) == "")
    assert(parts(0).getLong(1) == 2L)
  }

  test("metaSnapshots exposes the manifest layer: per-commit chain " +
    "growth, fold to 1 on compaction, txn line for streaming commits") {
    val sink = mkSink("ms_mf")                       // 2 append commits
    assert(sink.metaSnapshots(spark).orderBy($"version")
      .select($"n_manifests").as[Long].collect().toSeq == Seq(1L, 2L),
      "each append chains one delta manifest")
    val v3 = sink.compactManifests()
    val afterFold = sink.metaSnapshots(spark).orderBy($"version")
      .select($"version", $"n_manifests", $"n_added_files",
        $"n_removed_files").as[(Long, Long, Long, Long)].collect().toSeq
    assert(afterFold.last == ((v3.toLong, 1L, 0L, 0L)),
      s"a manifest fold is metadata-only: 1 manifest, no file churn — " +
        s"got $afterFold")
    // streaming commits surface their exactly-once txn line
    sink.appendStreamBatch(
      Seq((9L, "c0", 9.0)).toDF("id", "cat", "v"), "obs-stream", 7L)
    val txns = sink.metaSnapshots(spark).orderBy($"version")
      .select($"txn").as[Option[String]].collect().toSeq
    assert(txns.last.contains("obs-stream#7"), s"got $txns")
    assert(txns.init.forall(_.isEmpty), "plain commits carry no txn")
  }

  test("metaSnapshots accounting is DISTRIBUTED: no manifest file list " +
    "ever materializes on the driver") {
    val sink = mkSink("ms_dist")                     // 2 append commits
    sink.deleteWhere("cat = 'c'")                    // MoR delete commit
    sink.compact(spark)                              // rewrite: fresh v1
    sink.append(Seq((7L, "d", 70.0)).toDF("id", "cat", "v"))
    val before = WarehouseIO.manifestContentReads.get()
    val rows = sink.metaSnapshots(spark)
      .orderBy($"version")
      .select($"version", $"n_files", $"n_added_files", $"n_removed_files")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(WarehouseIO.manifestContentReads.get() == before,
      "metaSnapshots must not read any manifest's file list on the " +
        "driver — per-version added/removed is a distributed job")
    // counts still exact: cross-check against the driver-side resolver
    val logDir =
      new org.apache.hadoop.fs.Path(sink.config.tablePath, "_graft_log")
    val expect = sink.snapshotVersions().map(v =>
      WarehouseIO.readSnapshotFiles(logDir,
        new org.apache.hadoop.fs.Path(logDir, f"v$v%05d.list"))
        .length.toLong)
    assert(rows.map(_._2) == expect,
      s"n_files must equal each snapshot's actual file count: $rows")
    assert(rows.map(r => r._3 - r._4) ==
      (rows.map(_._2).head +: rows.map(_._2).sliding(2).map(p =>
        p(1) - p(0)).toSeq),
      s"added/removed must telescope to the per-version file deltas: $rows")
  }

  test("metaSnapshots refuses unversioned tables; metaFiles still serves them") {
    val unv = new TableSink(SinkConfig(tableName = "ms4u", warehousePath = wh))
    unv.append(Seq((1L, "a", 1.0)).toDF("id", "cat", "v"))
    assert(intercept[IllegalArgumentException](unv.metaSnapshots(spark))
      .getMessage.contains("versioned"))
    assert(unv.metaFiles(spark).agg(sum($"record_count")).as[Long].head() == 1L)
  }

  test("metaFiles/metaPartitions serve MIXED-SPINE (partition-spec-" +
    "evolved) tables: the inventory comes from per-relation capture, " +
    "never an unresolvable `_metadata` on the generation union (round-14)") {
    val gen1 = SinkConfig(tableName = "ms_mixed", warehousePath = wh,
      versioned = true,
      partitionSpec = Seq(PartitionField("cat", Transform.Identity)))
    new TableSink(gen1).append(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "cat", "v")) // v1
    val s2 = new TableSink(gen1.copy(partitionSpec = Nil))
    s2.append(Seq((3L, "c", 30.0), (4L, "c", 40.0))
      .toDF("id", "cat", "v"))                                      // v2
    // files: every generation's files inventoried, counts exact
    val files = s2.metaFiles(spark)
    assert(files.agg(sum($"record_count")).as[Long].head() == 4L,
      "counts must sum across BOTH spine generations")
    assert(files.filter($"size_bytes" <= 0).count() == 0)
    // partitions: gen-1 rows report their cat= spine, gen-2 report ''
    val parts = s2.metaPartitions(spark)
      .select($"partition", $"record_count")
      .as[(String, Long)].collect().toMap
    assert(parts.getOrElse("cat=a", 0L) == 1L, s"got: $parts")
    assert(parts.getOrElse("cat=b", 0L) == 1L, s"got: $parts")
    assert(parts.getOrElse("", 0L) == 2L,
      s"unpartitioned generation must roll up under '': $parts")
  }
}
