package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("kernels are SQL-callable after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  graft_vec_normalize(array(3.0D, 4.0D))[0] AS nx,
        |  size(graft_shingles(split('a b c d e f', ' '), 5)) AS n_sh,
        |  size(graft_minhash(graft_shingles(split('a b c', ' '), 5), 64)) AS n_lanes,
        |  graft_simhash(split('hello world', ' ')) AS sh,
        |  graft_iceberg_bucket(34L, 16) AS bkt""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 0.6) < 1e-15)
    assert(r.getInt(2) == 2) // 6 tokens, n=5 -> positions 1..2
    assert(r.getInt(3) == 64)
    // iceberg spec vector: hashLong(34) = 2017239379 -> bucket 3 (mod 16)
    assert(r.getInt(5) == 3)
  }

  test("SQL kernel results equal the Column API results") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, TestSpark.sfDir).limit(50).cache()
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(split(text, ' ')) AS sh
        |FROM ext_docs""".stripMargin)
      .as[(Long, Long)].collect().toMap
    val viaApi = docs.select($"doc_id",
      Dedup.simhash(spark, org.apache.spark.sql.functions.split($"text", " ")))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaApi)
  }

  test("parameter positions reject non-literal arguments") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), 1 + CAST(rand() AS INT))").head()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("extensions hook is a SparkSessionExtensions installer") {
    // builder-time path: the class must be instantiable by name with a
    // zero-arg constructor (the spark.sql.extensions contract)
    val inst = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
    assert(inst.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
