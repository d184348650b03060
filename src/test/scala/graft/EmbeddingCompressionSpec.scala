package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class EmbeddingCompressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, TestSpark.sfDir).cache()

  test("int8 quantization error is bounded by half a step and extremes saturate") {
    val out = EmbeddingCompression.quantizeInt8(emb)
      .select("vec_id", "scale9", "max_err9", "n_sat")
      .as[(Long, Double, Double, Long)].collect()
    assert(out.length == emb.count())
    out.foreach { case (id, scale, maxErr, nSat) =>
      assert(scale > 0, s"vec $id: degenerate scale")
      // round() introduces at most scale/2 error per component (plus 9dp
      // rounding slack on the emitted audit values themselves)
      assert(maxErr <= scale / 2 + 1e-9, s"vec $id: err $maxErr > step/2")
      // the max-abs component quantizes to exactly +-127 by construction
      assert(nSat >= 1, s"vec $id: no saturated component")
    }
  }

  test("quantizing an all-zero vector yields zeros, not NaN") {
    val z = Seq((1L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val r = EmbeddingCompression.quantizeInt8(z)
      .as[(Long, Double, Double, Long)].head()
    assert(r == ((1L, 0.0, 0.0, 0L)))
  }

  test("JL distortion matches theory at k=16 and shrinks ~1/sqrt(k)") {
    def meanGap(k: Int): Double = {
      val g = EmbeddingCompression.projectionAudit(emb, k = k)
        .select("gap9").as[Double].collect()
      g.sum / g.length
    }
    val out = EmbeddingCompression.projectionAudit(emb)
      .select("cos_orig", "cos_proj", "gap9").as[(Double, Double, Double)]
      .collect()
    assert(out.length == emb.count() - 1) // one pair per id-successor
    // near-orthogonal pairs project to cosine ~N(0, 1/sqrt(k)):
    // E|gap| ≈ 0.8/sqrt(k) ≈ 0.2 at k=16 — assert within the theory band.
    // (The raw-LCG plane bug this guards against measured 0.34 here, flat
    // in k, because its rows were nearly parallel.)
    val g16 = out.map(_._3).sum / out.length
    assert(g16 < 0.3, s"k=16 mean distortion $g16 exceeds the JL band")
    // the JL signature: quadrupling k halves the distortion; correlated
    // plane rows leave it flat
    val g64 = meanGap(64)
    assert(g64 < 0.7 * g16,
      s"k=64 gap $g64 did not shrink vs k=16 gap $g16 — planes correlated?")
    // gap must be consistent with its own rounded components
    out.foreach { case (o, p, g) =>
      assert(math.abs(math.abs(o - p) - g) < 2e-9)
    }
  }

  test("identical vectors project to identical vectors (cos_proj = 1)") {
    val v = Array.tabulate(64)(i => (i % 7).toFloat / 7f + 0.1f)
    val d = Seq((0L, v), (1L, v)).toDF("vec_id", "embedding")
    val r = EmbeddingCompression.projectionAudit(d)
      .select("cos_orig", "cos_proj").as[(Double, Double)].head()
    assert(r == ((1.0, 1.0)))
  }

  test("gramMatrix sums hand-checked moments at dim=2") {
    val d = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(3.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val rows = EmbeddingCompression.gramMatrix(d, dim = 2)
      .orderBy($"i", $"j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val M = 1000000L
    assert(rows.toSeq == Seq(
      // s_xy: (1,1)=1+9, (1,2)=2-3, (2,2)=4+1 in 1e12 units
      (1L, 1L, 10L * M * M, 4L * M, 4L * M, 2L),
      (1L, 2L, -1L * M * M, 4L * M, 1L * M, 2L),
      (2L, 2L, 5L * M * M, 1L * M, 1L * M, 2L)))
  }

  test("powerIteration recovers the planted direction of a rank-1 corpus") {
    val u = Array(1.0, 0.5, -0.25, 0.75)
    val d = Seq(2.0, 3.0, -1.0, 1.5).zipWithIndex.map { case (c, i) =>
      (i.toLong, u.map(x => (c * x).toFloat))
    }.toDF("vec_id", "embedding")
    val v = EmbeddingCompression.powerIteration(d, dim = 4, iters = 4)
      .orderBy($"d").collect()
    val got = v.map(_.getLong(1))
    val want = u.map(x => math.round(x * 1e9))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 20000,
        s"component off: $g vs $w (rank-1 moments must align with u)")
    }
    assert(got.map(math.abs).max == 1000000000L,
      "max-abs component is exactly NANO after renormalization")
    assert(v.map(_.getLong(2)).distinct.length == 1 && v.head.getLong(2) > 0,
      "growth is one positive scalar witness")
  }

  test("gramMatrix is partitioning-invariant with exact diagonal positivity") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val g1 = EmbeddingCompression.gramMatrix(e.repartition(1))
      .orderBy($"i", $"j").collect()
    val g32 = EmbeddingCompression.gramMatrix(e.repartition(32))
      .orderBy($"i", $"j").collect()
    assert(g1.sameElements(g32),
      "integer buffer merge must be partitioning-invariant")
    assert(g1.length == 64 * 65 / 2, "one row per upper-triangular pair")
    val n = e.count()
    g1.foreach { r =>
      assert(r.getLong(5) == n)
      if (r.getLong(0) == r.getLong(1))
        assert(r.getLong(2) >= 0, "diagonal second moments are sums of squares")
    }
  }
}
