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
    args.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[scratch] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
      }
    }
    spark.stop()
  }
}
