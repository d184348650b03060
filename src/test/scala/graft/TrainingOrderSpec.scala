package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TrainingOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, TestSpark.sfDir).cache()

  test("epoch shuffle is a stable permutation: every doc exactly once") {
    val out = TrainingOrder.epochShuffle(docs, epoch = 3L, nShards = 8)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // (shard, pos) is a dense 1..n_shard ranking — no gaps, no dupes
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1 || $"nd" =!= $"n")
    assert(bad.count() == 0, "positions must be dense per shard")
    // re-running the same epoch reproduces the identical assignment
    val again = TrainingOrder.epochShuffle(docs, epoch = 3L, nShards = 8)
    assert(out.collect().toSet == again.collect().toSet)
  }

  test("different epochs give different orders; shards stay balanced") {
    def posMap(e: Long) = TrainingOrder.epochShuffle(docs, e, 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val e1 = posMap(1L)
    val e2 = posMap(2L)
    val moved = e1.keys.count(k => e1(k) != e2(k))
    assert(moved > e1.size / 2, s"only $moved/${e1.size} docs moved between epochs")
    // splitmix64 keys spread shards to within ~4x of each other at n=500
    val sizes = TrainingOrder.epochShuffle(docs, 1L, 8)
      .groupBy("shard").count().as[(Long, Long)].collect().map(_._2)
    assert(sizes.length == 8 && sizes.min * 4 >= sizes.max,
      s"shard sizes too skewed: ${sizes.mkString(",")}")
  }

  test("mix64 column kernel matches the driver-side function") {
    val ids = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue)
    val got = ids.toDF("x")
      .select(VectorExpressions.mix64Col(spark, $"x")).as[Long].collect()
    assert(got.toSeq == ids.map(VectorExpressions.mix64))
  }
}
