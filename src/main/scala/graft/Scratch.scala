package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: runs named queries twice (cold/warm) to separate
  * fixed session overhead from per-query cost. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong
    val stageCpu = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageIn = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageSr = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageSw = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            taskCpuNs.addAndGet(m.executorCpuTime)
            stageCpu.merge(te.stageId, m.executorCpuTime, _ + _)
            stageIn.merge(te.stageId, m.inputMetrics.recordsRead, _ + _)
            stageSr.merge(te.stageId,
              m.shuffleReadMetrics.recordsRead, _ + _)
            stageSw.merge(te.stageId,
              m.shuffleWriteMetrics.recordsWritten, _ + _)
          }
        }
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          stageName.put(s.stageInfo.stageId,
            s.stageInfo.name.take(80) + " | " +
              s.stageInfo.details.linesIterator
                .find(l => l.contains("graft") && !l.contains("Scratch"))
                .getOrElse("").trim.take(120))
      })
    val dumpStages = sys.env.contains("SPARK_GRAFT_STAGE_DUMP")
    def dumpTopStages(): Unit = if (dumpStages) {
      import scala.jdk.CollectionConverters._
      stageCpu.asScala.toSeq.sortBy(-_._2).take(10).foreach { case (id, ns) =>
        println(f"[stage] $id%5d cpu ${ns / 1e9}%7.3f s  " +
          s"in=${stageIn.getOrDefault(id, 0L)} " +
          s"sr=${stageSr.getOrDefault(id, 0L)} " +
          s"sw=${stageSw.getOrDefault(id, 0L)}  " +
          stageName.getOrDefault(id, "?"))
      }
      stageCpu.clear(); stageIn.clear(); stageSr.clear(); stageSw.clear()
    }
    args.foreach {
      case "split:changelog_replicate" => replicateSplit(spark, sfDir)
      case "split:changelog_incremental" => incrementalSplit(spark, sfDir)
      case "split:zonemap_prune" => statsSplit(spark, sfDir, bloom = false)
      case "split:bloom_prune" => statsSplit(spark, sfDir, bloom = true)
      case "split:sql_delete" => sqlDeleteSplit(spark, sfDir)
      case "split:mor_read" => morReadSplit(spark, sfDir)
      case "split:sql_partitioned" => sqlPartitionedSplit(spark, sfDir)
      case "split:stream_pushdown" => streamPushdownSplit(spark, sfDir)
      case "split:stream_join" => streamJoinSplit(spark, sfDir)
      case "split:sink_roundtrip" => sinkRoundtripSplit(spark, sfDir, "parquet")
      case "split:sink_roundtrip_orc" => sinkRoundtripSplit(spark, sfDir, "orc")
      case n =>
        (1 to 2).foreach { i =>
          Scratch.drainBus(spark)
          val cpu0 = taskCpuNs.get()
          val t0 = System.nanoTime()
          val c = SparkEntry.queries(n)(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          Scratch.drainBus(spark)
          val cpu = (taskCpuNs.get() - cpu0) / 1e9
          println(f"[scratch] $n run$i: $wall%.3f s (cpu $cpu%.3f s, $c rows)")
          dumpTopStages()
        }
    }
    spark.stop()
  }

  /** Cost attribution for q_changelog_replicate (the bench's slowest
    * query): replays its exact fixture with phase timers — source
    * commits (2 appends + 2 merge-on-read deletes) vs the two
    * replicateTo cursor batches vs the final aggregate — so the bench
    * number decomposes instead of reading as one opaque 5 s. */
  private def replicateSplit(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    (1 to 2).foreach { i =>
      val e = Tables.events(spark, sfDir)
      val dest = s"/root/repo/target/tmp/graft_wh_${java.util.UUID.randomUUID()}"
      def cfg(name: String) = SinkConfig(
        tableName = name, warehousePath = dest, numPartitions = 4,
        versioned = true,
        partitionSpec = Seq(PartitionField("event_type", Transform.Identity)),
        sortOrder = Seq("event_id"))
      val src = new TableSink(cfg("events_src"))
      val replica = new TableSink(cfg("events_replica"))
      val cursor = s"$dest/_repl_cursor"
      def timed[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[split] run$i $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      // exact interleave of the real query: appends → batch 1 → deletes
      // → batch 2 (the split sums to the same work, now attributed)
      timed("fixture: 2 append commits") {
        src.append(e.filter(pmod(col("event_id"), lit(3)) =!= 0))
        src.append(e.filter(pmod(col("event_id"), lit(3)) === 0))
      }
      timed("replicate batch 1 (insert versions)") {
        src.replicateTo(spark, replica, Seq("event_id"), cursor)
      }
      timed("fixture: 2 merge-on-read delete commits") {
        src.deleteWhere("value < 100.0")
        src.deleteKeys(
          e.filter(pmod(col("user_id"), lit(7)) === 0).select(col("user_id")),
          Seq("user_id"))
      }
      timed("replicate batch 2 (delete versions)") {
        src.replicateTo(spark, replica, Seq("event_id"), cursor)
      }
      // round-11 added a consolidate-fold probe into every delete-batch
      // apply (maybeConsolidateDeletes) — time the probe standalone so a
      // drift attributes to it rather than hiding inside batch 2. At the
      // bench's cadence the replica holds ONE pending key sidecar, far
      // under deleteConsolidateThreshold (16), so the fold itself never
      // fires here — only the pending-count probe is on the hot path.
      timed("consolidate-fold probe (pending-count check, no fold)") {
        replica.maybeConsolidateDeletes(spark)
      }
      timed("final aggregate") {
        replica.read(spark).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n")).count()
      }
    }
  }

  /** MoR-serving read-path attribution (VERDICT r11 #5): a table with a
    * pending position sidecar serves SQL reads through a V1 projected
    * relation (`df.rdd` → external Rows → back to internal rows). This
    * split measures that conversion's real share by timing the SAME
    * aggregate through (a) the SQL catalog (V1 bridge) and (b) the
    * library read (no bridge — identical scan, sidecar anti-join, and
    * aggregate, minus the Row round-trip). Decision rule from the
    * verdict: build a native DSv2 PartitionReader only if the bridge
    * costs >25% of the read phase. */
  /** Cost attribution for q_sql_partitioned (the round-12 three-signal
    * suspect): replays its exact fixture with phase timers — library
    * append vs SQL INSERT vs partition-scoped DELETE vs UPDATE vs final
    * aggregate — then times 20 consecutive trivial SQL statements on the
    * finished table to expose the per-statement loadTable metadata term
    * (the `pendingDeleteVersions` listing VERDICT r12 finding #2 names). */
  private def sqlPartitionedSplit(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val wh = s"/root/repo/target/tmp/sqp_wh_${java.util.UUID.randomUUID()}"
    spark.conf.set("spark.sql.catalog.gsqp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsqp.warehouse", wh)
    (1 to 2).foreach { i =>
      def timed[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[split] run$i $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val e = Tables.events(spark, sfDir)
      val tbl = s"events_sqp_$i"
      val src = s"sqp_src_$i"
      e.createOrReplaceTempView(src)
      val sink = new TableSink(SinkConfig(tableName = tbl,
        warehousePath = wh, versioned = true, numPartitions = 4,
        partitionSpec = Seq(PartitionField("event_type", Transform.Identity))))
      timed("fixture: library append (partitioned)") {
        sink.append(e.select(col("event_id"), col("user_id"), col("value"),
          col("event_type")))
      }
      timed("SQL INSERT (synthetic partition)") {
        spark.sql(s"INSERT INTO gsqp.$tbl " +
          s"SELECT event_id + 10000000, user_id, value, 'synthetic' " +
          s"FROM $src WHERE event_id % 100 = 0")
      }
      timed("SQL DELETE (partition-scoped COW)") {
        spark.sql(s"DELETE FROM gsqp.$tbl " +
          "WHERE event_type = 'click' AND value < 50.0")
      }
      timed("SQL UPDATE (COW rewrite of one partition)") {
        spark.sql(s"UPDATE gsqp.$tbl SET value = value + 10.0 " +
          "WHERE event_type = 'view'")
      }
      timed("final aggregate") {
        spark.sql(s"SELECT event_type, COUNT(*) FROM gsqp.$tbl " +
          "GROUP BY event_type").collect()
      }
      val l0 = WarehouseIO.dirListings.get()
      val r0 = WarehouseIO.metaReads.get()
      val t0 = System.nanoTime()
      (1 to 20).foreach { _ =>
        spark.sql(s"SELECT COUNT(*) FROM gsqp.$tbl WHERE event_type = " +
          "'nope'").collect()
      }
      println(f"[split] run$i 20x trivial statement (loadTable metadata " +
        f"term): ${(System.nanoTime() - t0) / 1e9 / 20}%.4f s/stmt, " +
        f"${(WarehouseIO.dirListings.get() - l0) / 20.0}%.1f listings/stmt, " +
        f"${(WarehouseIO.metaReads.get() - r0) / 20.0}%.1f metaReads/stmt")
      // the no-catalog floor: same count, raw path read resolved per
      // statement (file listing + footer inference each time) — the gap
      // to the trivial-statement number above IS the catalog door's own
      // per-statement term
      val t1 = System.nanoTime()
      (1 to 20).foreach { _ =>
        spark.read.parquet(s"$wh/$tbl")
          .filter(col("event_type") === "nope").count()
      }
      println(f"[split] run$i 20x raw-path floor (no catalog): " +
        f"${(System.nanoTime() - t1) / 1e9 / 20}%.4f s/stmt")
    }
  }

  /** VERDICT r12 task #4 measurement: is the V1 streaming source's
    * pushdown barrier (filters cannot reach the scan inside a
    * micro-batch) worth a DSv2 MicroBatchStream? Fixture: a versioned
    * documents table (wide text rows). Measures, warm, (a) a
    * SELECTIVE-filtered streaming consumer's incremental batch, (b) the
    * same filter as a pushdown batch read of the same commit, (c) the
    * unfiltered batch read (the scan floor). The barrier term is
    * (a - b) / a; the 25% rule decides — same rule that rejected the
    * MoR read bridge in round 12. */
  private def streamPushdownSplit(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val dest = s"/root/repo/target/tmp/spd_wh_${java.util.UUID.randomUUID()}"
    val docs = Tables.documents(spark, sfDir)
    // sorted layout: a SARGABLE range predicate prunes row groups in the
    // batch reader, which is exactly the pushdown the V1 stream loses
    val sink = new TableSink(SinkConfig(tableName = "docs_spd",
      warehousePath = dest, versioned = true, numPartitions = 4,
      sortOrder = Seq("doc_id")))
    sink.append(docs.filter(pmod(col("doc_id"), lit(2)) === 0))      // v1
    def timed(what: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[split] $what: $s%.3f s")
      s
    }
    val pred = col("doc_id") >= 100 && col("doc_id") < 120 // prunable
    (1 to 3).foreach { pass =>
      // noop sink: batch time is the SOURCE's cost, not a parquet write
      val q = sink.readStream(spark).filter(pred)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$dest/cp_$pass").start()
      try {
        q.processAllAvailable() // batch 0: the v1 snapshot (warms caches)
        sink.append(docs.filter(pmod(col("doc_id"), lit(2)) === 1))
        val a = timed(s"pass $pass (a) filtered STREAM incremental batch") {
          q.processAllAvailable()
        }
        val b = timed(s"pass $pass (b) filtered BATCH read of the commit " +
          "(pushdown prunes)") {
          val vs = sink.snapshotVersions()
          sink.readAppendedBetween(spark, vs.init.last, vs.last)
            .filter(pred).count(); ()
        }
        val c = timed(s"pass $pass (c) unfiltered batch read (scan floor)") {
          val vs = sink.snapshotVersions()
          sink.readAppendedBetween(spark, vs.init.last, vs.last).count(); ()
        }
        println(f"[split] pass $pass barrier term (a-b)/a = " +
          f"${(a - b) / a * 100}%.1f%% (floor c/a = ${c / a * 100}%.1f%%)")
        // reset for the next pass: drop the appended half again
        sink.rollbackTo(1)
      } finally q.stop()
    }
  }

  private def drainBus(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.Bridge.drainListeners(spark)

  /** Phase attribution for q_sink_roundtrip[_orc]: append vs read+agg,
    * plus the file count the partitioned write produced (r14: is the
    * 5 CPU-sec ORC number writer-per-file overhead?). */
  private def sinkRoundtripSplit(spark: SparkSession, sfDir: String,
      fmt: String): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    (1 to 2).foreach { i =>
      val e = Tables.events(spark, sfDir)
      val dest = s"/root/repo/target/tmp/graft_wh_${java.util.UUID.randomUUID()}"
      val sink = new TableSink(SinkConfig(
        tableName = "events_rt_split", warehousePath = dest,
        numPartitions = 4, fileFormat = fmt,
        partitionSpec = Seq(
          PartitionField("event_type", Transform.Identity),
          PartitionField("ts", Transform.Day, Some("event_date"))),
        sortOrder = Seq("event_id")))
      def timed[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[split] run$i $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      timed("append")(sink.append(e))
      val nFiles = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.walk(
          java.nio.file.Paths.get(sink.config.tablePath))
        try s.iterator().asScala.count(p =>
          java.nio.file.Files.isRegularFile(p) &&
            !p.getFileName.toString.startsWith("_") &&
            !p.getFileName.toString.startsWith("."))
        finally s.close()
      }
      println(s"[split] run$i data files: $nFiles")
      timed("read+agg")(sink.read(spark)
        .groupBy($"event_type", $"event_date".cast("string").as("event_date"))
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy($"event_type", $"event_date").count())
    }
  }

  /** Attribution for q_stream_join's wall time (r14: 9.2 s wall vs
    * ~1 s executor CPU): runs the exact declared query, then dumps every
    * micro-batch's StreamingQueryProgress durationMs breakdown
    * (addBatch / getBatch / walCommit / stateStore commit live there) so
    * the wait is attributable to a phase instead of read as one blob. */
  private def streamJoinSplit(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val progresses =
      new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.streaming.StreamingQueryProgress]()
    val l = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        progresses.add(e.progress)
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(l)
    try (1 to 2).foreach { i =>
      progresses.clear()
      val t0 = System.nanoTime()
      val c = SparkEntry.queries("q_stream_join")(spark, sfDir).count()
      println(f"[split] run$i total: ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        s" ($c rows, ${progresses.size} progress events)")
      import scala.jdk.CollectionConverters._
      progresses.asScala.zipWithIndex.foreach { case (p, bi) =>
        val dm = p.durationMs.asScala.map { case (k, v) => s"$k=$v" }
          .toSeq.sorted.mkString(" ")
        println(s"[split] run$i batch$bi rows=${p.numInputRows} $dm")
      }
    } finally spark.streams.removeListener(l)
  }

  private def morReadSplit(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    // ONE warehouse for the whole split: the catalog instance pins the
    // warehouse it was initialized with, so per-run warehouses would
    // strand run 2's table in run 1's directory
    val wh = s"/root/repo/target/tmp/morread_wh_${java.util.UUID.randomUUID()}"
    spark.conf.set("spark.sql.catalog.gmors", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmors.warehouse", wh)
    (1 to 2).foreach { i =>
      def timed[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[split] run$i $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val e = Tables.events(spark, sfDir)
      val tbl = s"events_morread_$i"
      timed("fixture: create + insert + mor DELETE") {
        e.createOrReplaceTempView("morread_src")
        spark.sql(s"CREATE TABLE gmors.$tbl " +
          "(event_id BIGINT, user_id BIGINT, value DOUBLE) " +
          "TBLPROPERTIES('versioned'='true')")
        spark.sql(s"INSERT INTO gmors.$tbl " +
          "SELECT event_id, user_id, value FROM morread_src")
        spark.conf.set("spark.graft.sql.deleteMode", "mor")
        try spark.sql(s"DELETE FROM gmors.$tbl WHERE user_id IN (0, 7, 14)")
        finally spark.conf.unset("spark.graft.sql.deleteMode")
      }
      val sink = new TableSink(SinkConfig(tableName = tbl,
        warehousePath = wh, versioned = true))
      (1 to 3).foreach { pass =>
        timed(s"pass $pass catalog read (V1 projected MoR serving)") {
          spark.sql(s"SELECT COUNT(*), SUM(value), MIN(event_id), " +
            s"MAX(event_id) FROM gmors.$tbl").collect()
        }
        timed(s"pass $pass library read (same scan, no V1 row bridge)") {
          sink.read(spark).agg(count(lit(1)), sum(col("value")),
            min(col("event_id")), max(col("event_id"))).collect()
        }
      }
    }
  }

  /** Cost attribution for the stats family (q_zonemap_prune /
    * q_bloom_prune — the round-10 movers): replays the exact fixture
    * with phase timers — clustered append commit vs analyze (stats scan
    * + manifest refold commit) vs the probe read + aggregate — so a
    * drift decomposes into "fixture write got slower" vs "the skipping
    * operator itself drifted". */
  private def statsSplit(spark: SparkSession, sfDir: String,
      bloom: Boolean): Unit = {
    import org.apache.spark.sql.functions._
    (1 to 2).foreach { i =>
      def timed[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[split] run$i $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val dest = s"/root/repo/target/tmp/graft_wh_${java.util.UUID.randomUUID()}"
      if (bloom) {
        val e = Tables.events(spark, sfDir)
        val sink = new TableSink(SinkConfig("events_bloom", dest,
          versioned = true))
        timed("fixture: hash-clustered versioned append") {
          sink.appendClustered(e.repartition(48, col("user_id")))
        }
        val bf = new BloomSkip(sink)
        timed("analyze: bloom scan + stats refold commit") {
          bf.analyze(spark, Seq("user_id"))
        }
        timed("probe read + aggregate") {
          bf.readEquals(spark, ("user_id", lit(7L)))
            .filter(col("user_id") === 7L)
            .agg(count(lit(1)), sum(col("value"))).count()
        }
      } else {
        val e = Tables.events(spark, sfDir)
          .withColumn("x_us", unix_micros(col("ts")))
          .withColumn("y_c",
            (col("value").cast("decimal(18,2)") * 100).cast("long"))
        val sink = new TableSink(SinkConfig("events_z", dest,
          versioned = true))
        val b = ZOrder.boundsOf(e, Seq("x_us", "y_c"))
        timed("fixture: z-clustered versioned append") {
          sink.appendClustered(ZOrder.cluster(e, Seq(
            ("x_us", b("x_us")._1, b("x_us")._2),
            ("y_c", b("y_c")._1, b("y_c")._2)), nRanges = 48, 16)
            .drop("x_us", "y_c"))
        }
        val zm = new ZoneMaps(sink)
        timed("analyze: zone scan + stats refold commit") {
          zm.analyze(spark, Seq("ts", "value"))
        }
        val lo = lit("2024-01-10 00:00:00").cast("timestamp")
        val hi = lit("2024-01-12 23:59:59.999999").cast("timestamp")
        timed("probe read + aggregate") {
          zm.readBetween(spark,
              ("ts", lo, hi), ("value", lit(100.0), lit(200.0)))
            .filter(col("ts").between(lo, hi) &&
              col("value").between(lit(100.0), lit(200.0)))
            .agg(count(lit(1)), sum(col("value"))).count()
        }
      }
    }
  }

  /** Cost attribution for q_sql_delete (a slow upward drifter in the
    * r9/r10 benches): CREATE+INSERT fixture vs the copy-on-write DELETE
    * statement vs the final aggregate through the catalog read. */
  private def sqlDeleteSplit(spark: SparkSession, sfDir: String): Unit = {
    (1 to 2).foreach { i =>
      def timed[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[split] run$i $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val e = Tables.events(spark, sfDir)
      val wh = "/root/repo/target/tmp/graft_catalog_wh"
      val tbl = s"events_sqld_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      spark.conf.set("spark.sql.catalog.graft_cat",
        classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_cat.warehouse", wh)
      e.createOrReplaceTempView(s"evsrc_${tbl.takeRight(8)}")
      timed("fixture: CREATE + INSERT") {
        spark.sql(s"CREATE TABLE graft_cat.$tbl " +
          "(event_id BIGINT, user_id BIGINT, value DOUBLE) " +
          "TBLPROPERTIES('versioned'='true')")
        spark.sql(s"INSERT INTO graft_cat.$tbl " +
          s"SELECT event_id, user_id, value FROM evsrc_${tbl.takeRight(8)}")
      }
      timed("copy-on-write DELETE statement") {
        spark.sql(s"DELETE FROM graft_cat.$tbl " +
          "WHERE value < 100.0 OR user_id IN (0, 7, 14)")
      }
      timed("final aggregate through the catalog read") {
        spark.sql(s"SELECT COUNT(*), SUM(value) FROM graft_cat.$tbl")
          .count()
      }
    }
  }

  /** Cost attribution for q_changelog_incremental (a repeat bench
    * "mover"): the query is fixture-dominated — 2 append commits, 2
    * merge-on-read delete commits, then two cursor reads whose change
    * rows localCheckpoint before the aggregate. The split shows which
    * phase carries any drift. */
  private def incrementalSplit(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    (1 to 2).foreach { i =>
      val e = Tables.events(spark, sfDir)
      val dest = s"/root/repo/target/tmp/graft_wh_${java.util.UUID.randomUUID()}"
      val sink = new TableSink(SinkConfig(
        tableName = "events_chg_inc", warehousePath = dest, numPartitions = 4,
        versioned = true,
        partitionSpec = Seq(PartitionField("event_type", Transform.Identity)),
        sortOrder = Seq("event_id")))
      val cursor = s"$dest/_chg_cursor"
      def timed[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[split] run$i $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      timed("fixture: 2 append commits") {
        sink.append(e.filter(pmod(col("event_id"), lit(3)) =!= 0))
        sink.append(e.filter(pmod(col("event_id"), lit(3)) === 0))
      }
      val b1 = timed("cursor batch 1 read + checkpoint") {
        val (b, c) = sink.readChangelogSince(spark, cursor)
        val r = b.localCheckpoint(); c(); r
      }
      timed("fixture: 2 merge-on-read delete commits") {
        sink.deleteWhere("value < 100.0")
        sink.deleteKeys(
          e.filter(pmod(col("user_id"), lit(7)) === 0).select(col("user_id")),
          Seq("user_id"))
      }
      val b2 = timed("cursor batch 2 read + checkpoint") {
        val (b, c) = sink.readChangelogSince(spark, cursor)
        val r = b.localCheckpoint(); c(); r
      }
      timed("final aggregate") {
        b1.unionByName(b2)
          .groupBy(col("_change_version"), col("_change_type"))
          .agg(count(lit(1)).as("n")).count()
      }
    }
  }
}
