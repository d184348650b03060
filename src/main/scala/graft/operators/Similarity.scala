package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor similarity search over an embedding column
  * (driver north star). Brute-force cosine top-k is the oracle-checkable
  * baseline; hyperplane-LSH candidate routing is the scale path.
  *
  * Scale design: the query set is broadcast (it is small by construction —
  * a probe batch), so the corpus is scanned exactly once with no shuffle at
  * all for the score phase; only the per-query top-k window shuffles, and
  * it shuffles `|queries| × |corpus-partition|` pre-reduced rows. At 100 TB
  * the LSH variant routes each query to a handful of buckets instead of the
  * full scan.
  */
object Similarity {

  /** Cosine rounded to 9 dp: well above accumulation-order noise (~1e-15),
    * well below any real similarity gap — makes rank ties deterministic and
    * oracle-reproducible. */
  private def roundedCosine(a: Column, b: Column): Column =
    round(Dedup.cosine(a, b), 9)

  /** Exact top-k neighbors (by cosine) for each query vector. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val e = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        roundedCosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** LSH-bucketed ANN: generate candidates from shared hyperplane-sign
    * buckets across `numTables` independent tables, exact-rerank only the
    * candidates. Returns up to k neighbors per query (fewer if the buckets
    * are sparse — the recall/cost dial is bitsPerTable × numTables).
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int = 64, bitsPerTable: Int = 8, numTables: Int = 8): DataFrame = {
    val planes = Dedup.hyperplanes(bitsPerTable * numTables, dim)
    def buckets(v: Column): Column =
      array((0 until numTables).map { t =>
        val bits = (0 until bitsPerTable).map { p =>
          val plane = planes(t * bitsPerTable + p)
          val dot = (0 until dim).map(d => element_at(v, d + 1) * lit(plane(d)))
            .reduce(_ + _)
          when(dot > 0, 1L << p).otherwise(0L)
        }
        struct(lit(t).as("t"), bits.reduce(_ + _).as("h"))
      }: _*)
    val e = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"), explode(buckets(col("v"))).as("bk"))
      .select(col("vec_id"), col("v"), col("bk.t"), col("bk.h"))
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .select(col("query_id"), col("qv"), explode(buckets(col("qv"))).as("bk"))
      .select(col("query_id"), col("qv"), col("bk.t"), col("bk.h"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    e.as("e").join(broadcast(q).as("q"),
        col("e.t") === col("q.t") && col("e.h") === col("q.h") &&
          col("e.vec_id") =!= col("q.query_id"))
      .select(col("query_id"), col("qv"), col("vec_id").as("neighbor_id"), col("v"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        roundedCosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }
}
