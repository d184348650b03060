package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // specs assert exact on-disk ≡ referenced manifest parity after
    // maintenance ops; the production GC grace (protecting in-flight
    // appends' moments-old manifests) would leave young orphans behind.
    // The grace path itself is covered by a dedicated AppendCommitSpec
    // case that raises it back temporarily.
    WarehouseIO.manifestGcGraceMs = 0L
    s
  }
  val sfDir = "/root/testdata/sf0.001"
  def tmpDir(prefix: String): String =
    s"/root/repo/target/tmp/${prefix}_${java.util.UUID.randomUUID()}"
}
