package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-compression operators: the storage/bandwidth levers an ANN
  * stack pulls before anything else at 100 TB (not in the reference, which
  * only writes records — these extend the engine over the `embeddings`
  * fixture).
  *
  *  - int8 symmetric quantization: 4× smaller vectors (float32 → int8 +
  *    one scale per vector), the layout IVF/HNSW serving tiers store. The
  *    operator emits the per-vector audit (scale, worst reconstruction
  *    error, saturation count) a pipeline gates on before swapping the
  *    serving tier to the quantized copy.
  *  - Johnson–Lindenstrauss random projection: 64d → 16d with a fixed
  *    pseudo-random plane matrix; the operator emits original vs projected
  *    cosine per probe pair, the distortion audit that calibrates how much
  *    recall a projected first-pass filter gives up.
  *
  * Everything is deterministic and DuckDB-replayable: planes are the same
  * closed-form LCG dyadic rationals as [[Dedup.hyperplanes]] (every value
  * exactly representable in a double on both engines), dots run through
  * the codegen'd sequential [[VectorExpressions.VecDot]] kernel (identical
  * IEEE op order to the oracle's sequential list_reduce), and every
  * emitted double is rounded to 9 dp before it rides in a hash or a
  * comparison.
  *
  * Scale shape: both operators are stateless per-row maps over the vector
  * scan — no shuffle at all for quantization; the projection audit joins
  * each vector to its id-successor (one shuffle-free ranged join after AQE,
  * or a sort-merge on vec_id at worst). Plane/probe matrices are literals
  * riding inside the expression — nothing broadcast, nothing collected.
  */
object EmbeddingCompression {

  /** Typed map-side accumulator for the Gram matrix: buffer = the
    * d(d+1)/2 upper-triangular Σx_i·x_j sums, the d component sums Σx_i,
    * and the row count, all BIGINT over micro-quantized (10⁶) components.
    *
    * This is the one place the engine uses a typed [[Aggregator]] instead
    * of built-in aggregates, and the reason is the 100 TB shape: the
    * declarative alternative (posexplode twice + self-join on row id +
    * groupBy (i, j)) pushes N·d²/2 rows through a shuffle, while this
    * buffer holds the whole matrix in d(d+1)/2 + d + 1 longs PER
    * PARTITION and ships exactly one buffer per partition to the single
    * reduce — the same treeAggregate shape `RowMatrix
    * .computeGramianMatrix` uses, expressed through the public typed-UDAF
    * API. Integer sums are order-free, so the result is bit-identical on
    * any partitioning and DuckDB-replayable. */
  private final class GramAggregator(d: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Long], Array[Long], Seq[Long]] {
    private val tri = d * (d + 1) / 2
    def zero: Array[Long] = new Array[Long](tri + d + 1)
    def reduce(b: Array[Long], x: Seq[Long]): Array[Long] = {
      val xa = x.toArray
      var idx = 0
      var i = 0
      while (i < d) {
        val xi = xa(i)
        var j = i
        while (j < d) { b(idx) += xi * xa(j); j += 1; idx += 1 }
        i += 1
      }
      i = 0
      while (i < d) { b(tri + i) += xa(i); i += 1 }
      b(tri + d) += 1L
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Exact second-moment (Gram) matrix of the embedding corpus — the
    * input every whitening / PCA / covariance-shrinkage step consumes.
    * Components are micro-quantized (round(x·10⁶) as BIGINT) so the sums
    * are exact integers: covariance follows downstream as
    * (n·s_xy − s_i·s_j) / (n²·10¹²) in whatever precision the consumer
    * wants, with no accumulation-order noise baked into the table.
    *
    * Output: one row per (i ≤ j) dimension pair — (i, j, s_xy, s_i, s_j,
    * n) — d(d+1)/2 rows total (2 080 at d=64): driver-bounded metadata,
    * like a statistics table, never corpus-sized.
    *
    * Overflow headroom: |x| ≤ ~1 ⇒ products ≤ ~10¹², so the BIGINT sums
    * hold ~9·10⁶ rows per partition-buffer safely at this quantization;
    * a 100 TB corpus lowers the quantization to 10⁴ (still exact) or
    * splits the corpus and sums the per-split tables — the shape is
    * unchanged. */
  def gramMatrix(embeddings: DataFrame, dim: Int = 64,
      vecCol: String = "embedding"): DataFrame = {
    val q = embeddings.select(
      transform(slice(col(vecCol).cast("array<double>"), 1, dim),
        x => round(x * 1000000.0).cast("long")).as("qv"))
    val gram = udaf(new GramAggregator(dim))
    val tri = dim * (dim + 1) / 2
    val m = q.agg(gram(col("qv")).as("m"))
    m.select(explode(sequence(lit(0), lit(dim - 1))).as("i0"), col("m"))
      .select(col("i0"), explode(sequence(col("i0"), lit(dim - 1))).as("j0"),
        col("m"))
      .select(
        (col("i0") + 1).cast("long").as("i"),
        (col("j0") + 1).cast("long").as("j"),
        expr(s"element_at(m, CAST(i0 * $dim - (i0 * (i0 - 1)) div 2" +
          " + (j0 - i0) + 1 AS INT))").as("s_xy"),
        expr(s"element_at(m, CAST($tri + i0 + 1 AS INT))").as("s_i"),
        expr(s"element_at(m, CAST($tri + j0 + 1 AS INT))").as("s_j"),
        expr(s"element_at(m, ${tri + dim + 1})").as("n"))
  }

  /** Dominant eigenvector of the corpus second-moment matrix by fixed
    * integer power iteration — the PCA-direction audit (where does the
    * corpus put its variance mass?) computed without ever trusting float
    * accumulation: the [[gramMatrix]] sums are exact integers, each power
    * step multiplies the NANO-scaled vector by the n-averaged moment
    * matrix in BIGINT, and renormalization is max-abs integer division
    * with an explicit sign·(|w|·10⁹ div max|w|) form — truncation
    * semantics every engine agrees on (a bare signed floor-vs-trunc
    * division would differ between engines on negative components).
    *
    * Output: one row per dimension (d, v_nano, growth) — v_nano the
    * eigenvector in NANO units (max-abs component = ±10⁹), growth the
    * final step's max|M·v| (the un-normalized eigenvalue witness, equal
    * on every row).
    *
    * Scale shape: the corpus is touched ONCE (the [[gramMatrix]]
    * aggregation); all `iters` steps run on the d² moment table and the
    * d-row vector — bounded metadata, checkpointed once, never the
    * corpus. The same unrolled-integer-steps discipline as
    * [[graft.Similarity.pageRank]], so the oracle replays every step as
    * chained CTEs. */
  def powerIteration(embeddings: DataFrame, dim: Int = 64, iters: Int = 12,
      vecCol: String = "embedding"): DataFrame = {
    // sign·(|s| div d) everywhere a signed value meets integer division:
    // Spark's `div` truncates toward zero, DuckDB's `//` floors — they
    // agree only on non-negative operands
    val upper = gramMatrix(embeddings, dim, vecCol)
      .select(col("i"), col("j"),
        expr("IF(s_xy < 0, -1, 1) * (abs(s_xy) div (n * 1000000))")
          .as("m"))
    val mat = upper.unionByName(
        upper.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("m")))
    require(iters >= 1, "need iters >= 1")
    val spark = embeddings.sparkSession
    // OPTIMIZATION r14 (guide §1.2/§5): the DATA-scale work is the Gram
    // reduction above (one distributed pass over the corpus); the power
    // iteration itself runs on a dim×dim integer matrix — 4096 longs at
    // dim 64, corpus-size-INDEPENDENT bounded metadata, the same class
    // as the O(versions) manifest collects. The former 12-step
    // DataFrame loop cost ~36 tiny Spark jobs (join + checkpoint +
    // max-abs aggregate per step, each materialized to dodge 2^iters
    // plan expansion); one collect of the matrix and exact driver-side
    // integer math replays the identical arithmetic: w = Σ m·v in long
    // (no overflow: |m| ≤ 1e6-scale quantized moments, |v| ≤ 1e9, 64
    // terms), then BigInt for the (abs(w)·1e9) div mx renormalization —
    // the same widening the DECIMAL(38,0) cast and the oracle's HUGEINT
    // provided.
    val entries = mat.collect() // dim² bounded, never corpus-sized
    val m = Array.fill(dim + 1, dim + 1)(0L)
    entries.foreach(r => m(r.getLong(0).toInt)(r.getLong(1).toInt) =
      r.getLong(2))
    var v = Array.fill(dim + 1)(1000000000L)
    var mx = 0L
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim + 1) { i =>
        var s = 0L; var j = 1
        while (j <= dim) { s += m(i)(j) * v(j); j += 1 }
        s
      }
      mx = math.max(w.drop(1).map(math.abs).max, 1L)
      v = Array.tabulate(dim + 1) { i =>
        if (i == 0) 0L
        else (if (w(i) < 0) -1L else 1L) *
          ((BigInt(math.abs(w(i))) * 1000000000L) / mx).toLong
      }
    }
    import spark.implicits._
    (1 to dim).map(d => (d.toLong, v(d), mx)).toDF("d", "v_nano", "growth")
  }

  /** Per-vector symmetric int8 quantization audit.
    * scale = max|x|/127; q_i = round(x_i/scale) (half-away-from-zero on
    * both engines); emitted: the scale, the worst |dequantized − original|
    * (bounded by scale/2), and how many components sit at the ±127
    * saturation points (with symmetric max-abs scaling the extremes land
    * exactly on ±127 — never beyond, so there is no clipping branch). */
  def quantizeInt8(embeddings: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val amax = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val scale = amax / lit(127.0)
    // all-zero vector guard: quantizes to all zeros with scale 0 instead of
    // NaN-ing through 0/0 (never triggers on real embeddings; parity-safe
    // because the oracle never meets the branch either)
    val q = when(amax === 0.0, transform(v, _ => lit(0.0)))
      .otherwise(transform(v, x => round(x / scale)))
    val errs = zip_with(q, v, (qi, xi) => abs(qi * scale - xi))
    val maxErr = aggregate(errs, lit(0.0), (acc, x) => greatest(acc, x))
    embeddings.select(col(idCol),
      round(scale, 9).as("scale9"),
      round(maxErr, 9).as("max_err9"),
      size(filter(q, qi => abs(qi) === 127.0)).cast("long").as("n_sat"))
  }

  /** JL plane matrix: component (p, d) = top-31-bits(splitmix64(p·dim+d))
    * mapped to [-0.5, 0.5). Unlike [[Dedup.hyperplanes]]' raw LCG — whose
    * lattice structure leaves consecutive ROWS nearly parallel (fine for
    * independent sign BITS, fatal for a projection basis) — the splitmix64
    * finalizer's avalanche gives near-orthogonal rows (measured max |row
    * cosine| ≈ 0.28 at 16×64), which is what makes the projection actually
    * Johnson–Lindenstrauss. Every value is a 31-bit dyadic rational —
    * exactly representable, and rebuilt bit-for-bit by the oracle's HUGEINT
    * splitmix64 replay. */
  private[graft] def jlPlanes(num: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(num, dim) { (p, d) =>
      (VectorExpressions.mix64(p.toLong * dim + d) >>> 33) / 2147483648.0 - 0.5
    }

  /** JL-projection distortion audit: project every vector with the fixed
    * `k`×`dim` [[jlPlanes]] matrix, pair each vector with its id-successor,
    * and emit original vs projected cosine (9 dp) plus their gap. The
    * successor pairing is a deterministic probe sample — distortion is
    * pair-independent in expectation, so any fixed pairing audits the
    * matrix without an O(n²) pair space. */
  def projectionAudit(embeddings: DataFrame, k: Int = 16, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    val planes = jlPlanes(k, dim)
    def dot(a: Column, b: Column) = VectorExpressions.vecDot(spark, a, b)
    def cos(a: Column, b: Column) =
      round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 9)
    // 16 codegen'd dot kernels per row against literal plane vectors — the
    // projection stays inside whole-stage codegen, no per-element lambdas
    def proj(v: Column): Column =
      array(planes.map(p => dot(v, typedlit(p.toSeq))).toIndexedSeq: _*)
    val e = embeddings.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("p", proj(col("v")))
    val a = e.select(col("vid").as("id_a"), col("v").as("va"), col("p").as("pa"))
    val b = e.select(col("vid").as("id_b"), col("v").as("vb"), col("p").as("pb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"),
        cos(col("va"), col("vb")).as("cos_orig"),
        cos(col("pa"), col("pb")).as("cos_proj"))
      .withColumn("gap9", round(abs(col("cos_orig") - col("cos_proj")), 9))
  }
}
