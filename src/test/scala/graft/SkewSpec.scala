package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain join on a pathologically skewed key") {
    // 90% of rows share one key — the shape that melts a single reducer
    val big = spark.range(10000)
      .select(when($"id" % 10 =!= 0, lit(1L)).otherwise($"id").as("k"),
        $"id".as("payload"))
    val small = Seq((1L, "hot"), (20L, "cold"), (30L, "cold")).toDF("k", "label")
    val plain = big.join(small, "k")
    val salted = SkewTools.saltedJoin(big, small, "k")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum($"payload")).head().getLong(0) ==
      plain.agg(sum($"payload")).head().getLong(0))
    // salt actually spreads the hot key over multiple shuffle partitions
    val parts = SkewTools.saltedJoin(big, small, "k", salts = 8)
      .filter($"label" === "hot")
      .select(spark_partition_id().as("p")).distinct().count()
    assert(parts > 1, "hot key should span multiple partitions after salting")
  }
}
