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
    args.foreach {
      case "split:changelog_replicate" => replicateSplit(spark, sfDir)
      case "split:changelog_incremental" => incrementalSplit(spark, sfDir)
      case n =>
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val c = SparkEntry.queries(n)(spark, sfDir).count()
          println(f"[scratch] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
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
      timed("final aggregate") {
        replica.read(spark).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n")).count()
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
