package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration — the knobs
  * that matter when the same code moves from local[32] to a 1000-executor
  * cluster reading 100 TB. A user of the reference switching to this
  * library starts here.
  */
object GraftSession {

  /** @param shufflePartitions match total cluster cores (local: the `N` of
    *   local[N]); at 100 TB raise toward 2-4× cores — AQE coalesces down.
    */
  def builder(appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // 128 MB splits keep scan tasks balanced on large parquet
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // the engine's SQL surface: native kernels as SQL functions
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    master.fold(b)(b.master)
  }

  /** Register a [[GraftCatalog]] named `catalogName` over `warehouse` on an
    * existing session, enabling `SELECT ... FROM <name>.<table> [VERSION AS
    * OF v | TIMESTAMP AS OF t]` over every versioned sink table there.
    * Idempotent; callable any time (v2 catalogs resolve lazily). */
  def registerCatalog(spark: SparkSession, warehouse: String,
      catalogName: String = "graft"): Unit = {
    spark.conf.set(s"spark.sql.catalog.$catalogName",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catalogName.warehouse", warehouse)
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(master = Some(s"local[$cores]"), shufflePartitions = cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
