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

  test("embedding LSH bucket cap drops mega-clusters, keeps small ones") {
    // 100 identical vectors collapse onto ONE sign bucket per table — the
    // dense-cosine-tail shape the sf1 scaling run hit, where the
    // within-bucket join trends quadratic. A 3-member cluster in another
    // direction must survive the cap untouched.
    val mega = Array.fill(8)(0.5f)
    val alt = Array(0.5f, -0.5f, 0.5f, -0.5f, 0.5f, -0.5f, 0.5f, -0.5f)
    val rows = (0L until 100L).map(i => (i, mega)) ++
      (1000L until 1003L).map(i => (i, alt))
    val df = rows.toDF("vec_id", "embedding")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val unc = pairs(Dedup.embeddingNearDupLsh(df, threshold = 0.9, dim = 8))
    val cap = pairs(Dedup.embeddingNearDupLsh(df, threshold = 0.9, dim = 8,
      maxBucket = Some(10)))
    assert(cap.subsetOf(unc), "cap must only remove pairs")
    assert(cap == Set((1000L, 1001L), (1000L, 1002L), (1001L, 1002L)),
      s"small cluster survives, mega-cluster dropped: $cap")
    assert(unc.count(p => p._1 < 100) == 100 * 99 / 2,
      "uncapped baseline sees the full mega-cluster")
  }
}
