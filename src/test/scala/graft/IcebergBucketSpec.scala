package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

class IcebergBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import IcebergBucketing._

  test("murmur3_x86_32 matches the Iceberg spec's published test vectors") {
    // Apache Iceberg table spec, Appendix B: hash(34:int) = hash(34L) =
    // 2017239379 (8-byte little-endian); hash("iceberg") = 1210000089.
    assert(hashLong(34L) == 2017239379)
    assert(murmur3("iceberg".getBytes(StandardCharsets.UTF_8)) == 1210000089)
  }

  test("int and long values of equal magnitude land in the same bucket (spec promotion)") {
    val ints = Seq(0, 1, 34, -7, 1000000).toDF("v")
      .select(icebergBucket(spark, $"v", 16).as("b")).as[Int].collect()
    val longs = Seq(0L, 1L, 34L, -7L, 1000000L).toDF("v")
      .select(icebergBucket(spark, $"v", 16).as("b")).as[Int].collect()
    assert(ints.sameElements(longs))
  }

  test("buckets stay in range and are well-spread on fixture data") {
    val b = Tables.events(spark, TestSpark.sfDir)
      .select(icebergBucket(spark, $"user_id", 8).as("b"))
      .as[Int].collect()
    assert(b.forall(x => x >= 0 && x < 8))
    assert(b.distinct.length > 4)
  }

  test("string bucketing hashes utf-8 bytes") {
    val b = Seq("iceberg").toDF("v")
      .select(icebergBucket(spark, $"v", 16).as("b")).as[Int].head()
    assert(b == bucketOf(1210000089, 16))
  }
}
