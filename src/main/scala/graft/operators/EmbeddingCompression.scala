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
