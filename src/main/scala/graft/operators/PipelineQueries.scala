package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract query wrappers for the LLM-pipeline operators
  * (dedup / similarity / text analysis / multimodal) over the
  * `documents` and `embeddings` fixtures.
  */
object PipelineQueries {

  // ---------------------------------------------------------------- dedup

  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, sfDir))
      .orderBy(col("keep_id"))

  val dedupExactSql: String =
    """SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Paragraph-level exact dedup (blank-line split + 25-token segmentation;
    * the fixture has no blank lines, so segmentation IS the paragraph
    * structure there — DedupSpec pins the regex path on multi-paragraph
    * text). The oracle replays the split, the per-paragraph windowing, the
    * flattened per-doc ordering, and the canonical-owner window. */
  def dedupParagraph(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.paragraphDedup(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"), col("para_idx"))

  val dedupParagraphSql: String =
    """WITH blocks AS (
      |  SELECT doc_id, string_split_regex(text, '\n{2,}') AS ps
      |  FROM documents),
      |bi0 AS (SELECT doc_id, ps, unnest(generate_series(1, len(ps))) AS pi
      |        FROM blocks),
      |bi AS (SELECT doc_id, pi, string_split(ps[pi], ' ') AS t FROM bi0),
      |seg AS (SELECT doc_id, pi, t,
      |          unnest(generate_series(0, (greatest(len(t), 1)+24)//25 - 1))
      |            AS j
      |        FROM bi),
      |paras AS (SELECT doc_id,
      |            CAST(row_number() OVER (
      |              PARTITION BY doc_id ORDER BY pi, j) - 1 AS BIGINT)
      |              AS para_idx,
      |            md5(array_to_string(t[j*25+1 : j*25+25], ' ')) AS fp
      |          FROM seg)
      |SELECT doc_id, para_idx, fp,
      |  row_number() OVER (PARTITION BY fp ORDER BY doc_id, para_idx) = 1
      |    AS keep
      |FROM paras ORDER BY doc_id, para_idx""".stripMargin

  /** Cleaned-corpus materialization: [[Dedup.cleanParagraphs]] over the
    * documents table. The oracle replays the split/segment/ownership chain
    * of [[dedupParagraphSql]] and reassembles kept paragraphs with ordered
    * string_agg. */
  def dedupCleanText(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cleanParagraphs(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  val dedupCleanTextSql: String =
    """WITH blocks AS (
      |  SELECT doc_id, string_split_regex(text, '\n{2,}') AS ps
      |  FROM documents),
      |bi0 AS (SELECT doc_id, ps, unnest(generate_series(1, len(ps))) AS pi
      |        FROM blocks),
      |bi AS (SELECT doc_id, pi, string_split(ps[pi], ' ') AS t FROM bi0),
      |seg AS (SELECT doc_id, pi, t,
      |          unnest(generate_series(0, (greatest(len(t), 1)+24)//25 - 1))
      |            AS j
      |        FROM bi),
      |paras AS (SELECT doc_id,
      |            CAST(row_number() OVER (
      |              PARTITION BY doc_id ORDER BY pi, j) - 1 AS BIGINT)
      |              AS para_idx,
      |            array_to_string(t[j*25+1 : j*25+25], ' ') AS para
      |          FROM seg),
      |marked AS (SELECT doc_id, para_idx, para,
      |             row_number() OVER (
      |               PARTITION BY md5(para) ORDER BY doc_id, para_idx) = 1
      |               AS keep
      |           FROM paras)
      |SELECT doc_id, COUNT(*) AS n_paras,
      |  CAST(COALESCE(SUM(CASE WHEN keep THEN 1 ELSE 0 END), 0) AS BIGINT)
      |    AS n_kept,
      |  COALESCE(string_agg(para, e'\n\n' ORDER BY para_idx)
      |             FILTER (WHERE keep), '') AS clean_text
      |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def dedupSubstring(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.substringDedup(Tables.documents(spark, sfDir), w = 8)
      .orderBy(col("doc_id"))

  val dedupSubstringSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |wins AS (
      |  SELECT doc_id,
      |    unnest([md5(array_to_string(t[i:i+7], ' '))
      |            FOR i IN generate_series(1, greatest(len(t)-7, 1))]) AS fp
      |  FROM toks),
      |cross_doc AS (
      |  SELECT fp FROM wins GROUP BY fp HAVING count(DISTINCT doc_id) > 1),
      |tot AS (SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY 1),
      |dup AS (SELECT doc_id, count(*) AS n_dup
      |        FROM wins JOIN cross_doc USING (fp) GROUP BY 1)
      |SELECT t.doc_id, t.n_windows, COALESCE(d.n_dup, 0) AS n_dup,
      |  CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / t.n_windows AS dup_ratio
      |FROM tot t LEFT JOIN dup d USING (doc_id) ORDER BY doc_id""".stripMargin

  def dedupNgram(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.ngramJaccard(Tables.documents(spark, sfDir), n = 5, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  val dedupNgramSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([array_to_string(t[i:i+4], ' ')
      |            FOR i IN generate_series(1, greatest(len(t)-4, 1))]) AS s
      |  FROM toks),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, inter / (sa.n_sh + sb.n_sh - inter) AS jaccard
      |FROM p
      |JOIN sz sa ON p.id_a = sa.doc_id
      |JOIN sz sb ON p.id_b = sb.doc_id
      |WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** Asymmetric containment pairs (doc-in-doc duplication) under the same
    * SQL-replayable df-64 skew cap as [[dedupNgramCapped]] — ordered
    * (inner, outer) with exact integer scores, hash-checked against the
    * quadratic DuckDB answer. */
  def dedupContainment(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.containment(Tables.documents(spark, sfDir), n = 5, tn = 9, td = 10,
      maxShingleDf = Some(64))
      .orderBy(col("inner_id"), col("outer_id"))

  val dedupContainmentSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([array_to_string(t[i:i+4], ' ')
      |            FOR i IN generate_series(1, greatest(len(t)-4, 1))]) AS s
      |  FROM toks),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |keep AS (SELECT s FROM sh GROUP BY s
      |         HAVING count(*) > 1 AND count(*) <= 64),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  WHERE a.s IN (SELECT s FROM keep)
      |  GROUP BY 1, 2),
      |dir AS (
      |  SELECT id_a AS inner_id, id_b AS outer_id, inter FROM p
      |  UNION ALL
      |  SELECT id_b AS inner_id, id_a AS outer_id, inter FROM p)
      |SELECT d.inner_id, d.outer_id, d.inter, sz.n_sh AS n_inner
      |FROM dir d JOIN sz ON d.inner_id = sz.doc_id
      |WHERE d.inter * 10 >= sz.n_sh * 9
      |ORDER BY d.inner_id, d.outer_id""".stripMargin

  /** Skew-capped exact-Jaccard near-dup pairs — THE scale-safe exposed
    * path: shingles seen in more than 64 documents are dropped before the
    * posting-list pair explosion, so a boilerplate shingle in 10⁶ docs
    * costs nothing instead of one executor-resident posting array and
    * O(df²) pairs. Near-dup pairs share rare shingles too, so intersection
    * counts only move for pairs glued together by ultra-common shingles —
    * exactly the pairs that are not meaningful near-dups. The cap is
    * SQL-replayable (a HAVING on the posting CTE), so this path is
    * oracle-hash-checked, not just spec'd. */
  def dedupNgramCapped(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.ngramJaccard(Tables.documents(spark, sfDir), n = 5, threshold = 0.5,
      maxShingleDf = Some(64))
      .orderBy(col("id_a"), col("id_b"))

  val dedupNgramCappedSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([array_to_string(t[i:i+4], ' ')
      |            FOR i IN generate_series(1, greatest(len(t)-4, 1))]) AS s
      |  FROM toks),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |keep AS (
      |  SELECT s FROM sh GROUP BY s HAVING count(*) > 1 AND count(*) <= 64),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  JOIN keep k ON a.s = k.s
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, inter / (sa.n_sh + sb.n_sh - inter) AS jaccard
      |FROM p
      |JOIN sz sa ON p.id_a = sa.doc_id
      |JOIN sz sb ON p.id_b = sb.doc_id
      |WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** MinHash+LSH — the affine-rehash lane family is replayed exactly by
    * [[OracleSql.dedupMinhashSql]] (hash-checked); recall against exact
    * Jaccard additionally asserted in DedupSpec. */
  def dedupMinhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(spark, sfDir))
      .orderBy(col("id_a"), col("id_b"))

  /** MinHash estimate-vs-truth audit — candidates, estimates, true
    * shingle Jaccard, and the error column all replayed by
    * [[OracleSql.dedupMinhashAuditSql]] (hash-checked). */
  def dedupMinhashAudit(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashAudit(Tables.documents(spark, sfDir))
      .orderBy(col("id_a"), col("id_b"))

  /** MinHash recall/precision vs exact Jaccard — both pair sets and the
    * two ratios replayed by [[OracleSql.dedupMinhashRecallSql]]. */
  def dedupMinhashRecall(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashRecall(Tables.documents(spark, sfDir))

  /** Train/test split leakage audit: MinHash near-dup pairs whose two
    * sides fall in DIFFERENT splits of the deterministic 90/5/5
    * assignment ([[splitBucket]] — the same hash [[datasetSplit]]
    * publishes, so this audits exactly the split the pipeline ships). A
    * non-empty result is eval contamination: test documents with a
    * near-duplicate in train inflate benchmark scores. Run after every
    * corpus refresh, BEFORE the split is consumed downstream.
    *
    * Scale shape: the pair set is the LSH posting-list output (already
    * bounded, no all-pairs form); split assignment is a per-row hash on
    * ids the pairs already carry — zero extra joins, zero extra
    * shuffles beyond [[Dedup.minhashLsh]] itself. Replayed stage for
    * stage by [[OracleSql.dedupSplitLeakageSql]] (hash-checked). */
  def dedupSplitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    def splitOf(c: Column): Column =
      when(splitBucket(c) < 90, "train").when(splitBucket(c) < 95, "val")
        .otherwise("test")
    Dedup.minhashLsh(Tables.documents(spark, sfDir))
      .select(col("id_a"), col("id_b"),
        splitOf(col("id_a")).as("split_a"),
        splitOf(col("id_b")).as("split_b"), col("est_jaccard"))
      .filter(col("split_a") =!= col("split_b"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Cross-source near-duplicate matrix: MinHash near-dup pair counts per
    * (source, source) cell — the corpus-health report that localizes
    * WHERE duplication lives (mirrored feeds show up as a hot
    * off-diagonal cell; within-crawl boilerplate as a hot diagonal).
    * Cells are canonicalized by source-name order. Scale shape: the
    * LSH pair set (already bounded) + two id-keyed label joins + one
    * bounded (≤ sources²) aggregate. Replayed stage for stage by
    * [[OracleSql.dedupSourceMatrixSql]] (hash-checked). */
  def dedupSourceMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val lab = docs.select(col("doc_id"), col("source"))
    Dedup.minhashLsh(docs)
      .join(lab.select(col("doc_id").as("id_a"), col("source").as("sa")),
        Seq("id_a"))
      .join(lab.select(col("doc_id").as("id_b"), col("source").as("sb")),
        Seq("id_b"))
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** PPJoin word-set similarity — the oracle is the EXACT quadratic
    * Jaccard answer (threshold 4/5), so a hash match proves the prefix
    * filter loses no pair (the PPJoin losslessness theorem, end-to-end).
    *
    * The harness query runs over a FIXED-SIZE audit slice (doc_id < 500):
    * the synthetic corpus is template-heavy enough that ~24% of ALL pairs
    * clear J ≥ 4/5, so any fixed-FRACTION sample's result still grows
    * quadratically with cluster size (measured 2.9M true pairs / 99 s for
    * a 5k-doc slice at gen sf1) — a cost no algorithm avoids WRITING.
    * The fixed slice keeps the audit scale-invariant; the operator itself
    * is corpus-wide and its cost is the true pair count. */
  def dedupPpjoin(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.ppjoinWords(Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 500))
      .orderBy(col("id_a"), col("id_b"))

  val dedupPpjoinSql: String =
    s"""WITH toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |  WHERE doc_id < 500),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM toks a JOIN toks b
      |        ON a.tok = b.tok AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
      |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
      |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 9) AS jaccard9
      |FROM p JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |WHERE 9 * inter >= 4 * (sa.n + sb.n)
      |ORDER BY id_a, id_b""".stripMargin

  /** SimHash — splitmix64 token hashes replayed by
    * [[OracleSql.dedupSimhashSql]] (hash-checked). */
  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, sfDir))
      .orderBy(col("id_a"), col("id_b"))

  /** Skew-capped SimHash — the scale-safe exposed path (buckets over 64
    * docs dropped before pair explosion); the oracle replays the bucket
    * populations, so the cap semantics themselves are hash-checked. */
  def dedupSimhashCapped(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, sfDir), maxBucket = Some(64))
      .orderBy(col("id_a"), col("id_b"))

  /** Dedup groups: connected components of the exact-Jaccard pair graph,
    * one canonical survivor (min doc_id) per component. Oracle replays the
    * reachability closure with a recursive CTE. */
  def dedupComponents(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.nearDupComponents(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  /** Duplicate-family SIZE DISTRIBUTION over the same component graph —
    * the curation dashboard number: how much of the corpus sits in
    * 2-doc near-dup pairs vs 50-doc boilerplate families (heavy
    * families are what survivor-only training data removes). */
  def dedupFamilies(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.nearDupComponents(Tables.documents(spark, sfDir))
      .groupBy(col("component")).agg(count(lit(1)).as("family_size"))
      .groupBy(col("family_size")).agg(count(lit(1)).as("n_families"))
      .orderBy(col("family_size"))

  /** The [[dedupComponentsSql]] reachability closure reduced to the
    * family-size histogram. */
  lazy val dedupFamiliesSql: String = {
    val marker = "SELECT node AS doc_id"
    val idx = dedupComponentsSql.indexOf(marker)
    require(idx > 0, "components oracle changed shape")
    dedupComponentsSql.take(idx).stripTrailing() + ",\n" +
      """comps AS (
        |  SELECT node AS doc_id, MIN(lbl) AS component
        |  FROM reach GROUP BY node),
        |fam AS (SELECT component, COUNT(*) AS family_size
        |        FROM comps GROUP BY 1)
        |SELECT family_size, COUNT(*) AS n_families
        |FROM fam GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val dedupComponentsSql: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([array_to_string(t[i:i+4], ' ')
      |            FOR i IN generate_series(1, greatest(len(t)-4, 1))]) AS s
      |  FROM toks),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM p
      |  JOIN sz sa ON p.id_a = sa.doc_id
      |  JOIN sz sb ON p.id_b = sb.doc_id
      |  WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5),
      |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |      UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(node, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node)
      |SELECT node AS doc_id, MIN(lbl) AS component,
      |  (MIN(lbl) = node) AS is_canonical
      |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  /** Dedup groups over the SKEW-CAPPED pair graph — the components variant
    * a 100 TB corpus actually runs: the pair edges come from the
    * maxShingleDf=64 path of [[dedupNgramCapped]], so no hot shingle can
    * materialize an O(df²) edge set, and the propagation loop inherits the
    * same bounded per-round shuffle. Oracle replays the capped pair CTE
    * inside the same recursive reachability closure. */
  def dedupComponentsCapped(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.nearDupComponents(Tables.documents(spark, sfDir),
      maxShingleDf = Some(64))
      .orderBy(col("doc_id"))

  val dedupComponentsCappedSql: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([array_to_string(t[i:i+4], ' ')
      |            FOR i IN generate_series(1, greatest(len(t)-4, 1))]) AS s
      |  FROM toks),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |keep AS (
      |  SELECT s FROM sh GROUP BY s HAVING count(*) > 1 AND count(*) <= 64),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  JOIN keep k ON a.s = k.s
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM p
      |  JOIN sz sa ON p.id_a = sa.doc_id
      |  JOIN sz sb ON p.id_b = sb.doc_id
      |  WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5),
      |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |      UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(node, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node)
      |SELECT node AS doc_id, MIN(lbl) AS component,
      |  (MIN(lbl) = node) AS is_canonical
      |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  /** Incremental ingest dedup: docs < 400 play the already-ingested
    * corpus, docs ≥ 400 the incoming batch. The fixture corpus has unique
    * texts, so the interesting work is exercised by the duplicates the
    * oracle replays identically: a batch row surviving means its text
    * fingerprint is genuinely new. */
  def dedupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // make the batch overlap the corpus: half its rows repeat corpus text
    val corpus = docs.filter(col("doc_id") < 400)
    val fresh = docs.filter(col("doc_id") >= 400)
    val replayed = corpus.filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val batch = fresh.select(col("doc_id"), col("text")).unionAll(replayed)
    Dedup.incrementalDedup(corpus, batch).orderBy(col("keep_id"))
  }

  val dedupIncrementalSql: String =
    """WITH corpus AS (SELECT * FROM documents WHERE doc_id < 400),
      |batch AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id >= 400
      |  UNION ALL
      |  SELECT doc_id + 10000, text FROM corpus WHERE doc_id < 50),
      |seen AS (SELECT DISTINCT md5(text) AS fp FROM corpus)
      |SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
      |FROM batch WHERE md5(text) NOT IN (SELECT fp FROM seen)
      |GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Canonical-survivor dedup over the skew-capped pair graph: the corpus
    * a user actually keeps — longest copy per duplicate cluster, singletons
    * kept as-is. Oracle replays the capped reachability closure plus the
    * same (n_chars DESC, doc_id ASC) pick as a window rank. */
  def dedupCanonical(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.canonicalSurvivors(Tables.documents(spark, sfDir),
      maxShingleDf = Some(64))
      .orderBy(col("component"))

  val dedupCanonicalSql: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([array_to_string(t[i:i+4], ' ')
      |            FOR i IN generate_series(1, greatest(len(t)-4, 1))]) AS s
      |  FROM toks),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |keep AS (
      |  SELECT s FROM sh GROUP BY s HAVING count(*) > 1 AND count(*) <= 64),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  JOIN keep k ON a.s = k.s
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM p
      |  JOIN sz sa ON p.id_a = sa.doc_id
      |  JOIN sz sb ON p.id_b = sb.doc_id
      |  WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5),
      |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |      UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(node, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
      |comp AS (SELECT node AS doc_id, MIN(lbl) AS component
      |         FROM reach GROUP BY node),
      |ranked AS (
      |  SELECT c.doc_id, c.component, d.n_chars,
      |    row_number() OVER (PARTITION BY c.component
      |                       ORDER BY d.n_chars DESC, c.doc_id ASC) AS rk,
      |    count(*) OVER (PARTITION BY c.component) AS n_members
      |  FROM comp c JOIN documents d USING (doc_id))
      |SELECT doc_id, component, n_chars, n_members
      |FROM ranked WHERE rk = 1 ORDER BY component""".stripMargin

  def dedupEmbedding(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.embeddingNearDup(Tables.embeddings(spark, sfDir), threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  val dedupEmbeddingSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.v, b.v), 9) >= 0.5
      |ORDER BY 1, 2""".stripMargin

  /** SemDeDup at the operating point (nlist 8): cells are engine-specific
    * k-means output, so like `sim_ivf` this records rows-only; the `_full`
    * companion hash-checks the identical pair/survivor machinery. */
  def dedupSemantic(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.semanticDedup(Tables.embeddings(spark, sfDir), nlist = 8,
      threshold = 0.35, centroidCacheKey = Some(sfDir))
      .orderBy(col("vec_id"))

  /** nlist = 1 degenerates SemDeDup to the exact quadratic form — the
    * DuckDB-replayable proof of the pair filter + survivor policy. */
  def dedupSemanticFull(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.semanticDedup(Tables.embeddings(spark, sfDir), nlist = 1,
      threshold = 0.35)
      .orderBy(col("vec_id"))

  val dedupSemanticFullSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |d AS (SELECT a.vec_id AS vec_id, count(*) AS n
      |      FROM e a JOIN e b ON a.vec_id > b.vec_id
      |      WHERE round(list_cosine_similarity(a.v, b.v), 9) >= 0.35
      |      GROUP BY 1)
      |SELECT e.vec_id, CAST(0 AS BIGINT) AS cell,
      |  CAST(COALESCE(d.n, 0) AS BIGINT) AS n_dups_lower,
      |  COALESCE(d.n, 0) = 0 AS kept
      |FROM e LEFT JOIN d USING (vec_id) ORDER BY vec_id""".stripMargin

  /** Hyperplane-LSH scale path — LCG planes replayed bit-exactly by
    * [[OracleSql.dedupEmbeddingLshSql]] (hash-checked); recall vs brute
    * force additionally asserted in spec. */
  def dedupEmbeddingLsh(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.embeddingNearDupLsh(Tables.embeddings(spark, sfDir), threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  /** Bucket-capped LSH (maxBucket 64) — the density-skew guard the sf1
    * scaling run motivated (BENCH_SCALING.md): correlated embeddings
    * collapse sign buckets, and the uncapped within-bucket join trends
    * quadratic. Cap replayed by the oracle via bucket-size HAVING. */
  def dedupEmbeddingLshCapped(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.embeddingNearDupLsh(Tables.embeddings(spark, sfDir),
      threshold = 0.5, maxBucket = Some(64))
      .orderBy(col("id_a"), col("id_b"))

  val dedupEmbeddingLshCappedSql: String =
    OracleSql.dedupEmbeddingLshCappedSql(cap = 64)

  /** Embedding-space decontamination: vectors 0-4 act as the held-out
    * benchmark; every other vector reports its best bucket-sharing cosine
    * against them (threshold 0.3 — the fixture's similarity band). */
  def dedupCrossEmbedding(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    Dedup.embeddingCrossMatches(
      e.filter(col("vec_id") >= 5), e.filter(col("vec_id") < 5),
      threshold = 0.3)
      .orderBy(col("vec_id"))
  }

  // ----------------------------------------------------------- similarity

  /** Exact cosine top-10 for the first five vectors as the probe batch. */
  def simTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    Similarity.topK(e, e.filter(col("vec_id") < 5), k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  val simTopKSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(q.qv, e.v), 9) AS cos
      |  FROM e, q WHERE e.vec_id <> q.query_id)
      |SELECT query_id, neighbor_id, rank FROM (
      |  SELECT query_id, neighbor_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      |  FROM scored)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** LSH-routed ANN — candidacy + rerank replayed by
    * [[OracleSql.simAnnLshSql]] (hash-checked). */
  def simAnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    Similarity.annTopK(e, e.filter(col("vec_id") < 5), k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Corpus self-kNN graph (k=5, bucket cap 64): LSH-bucketed candidates,
    * capped, exact-reranked — candidacy, cap, and rerank all replayed by
    * [[OracleSql.simKnnGraphSql]] (hash-checked). */
  def simKnnGraph(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    Similarity.knnGraph(e, k = 5, maxBucket = Some(64))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Mutual-kNN pairs from the same graph — the reciprocity join replayed
    * by [[OracleSql.simKnnMutualSql]] (hash-checked). */
  def simKnnMutual(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    Similarity.mutualKnn(e, k = 5, maxBucket = Some(64))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Leave-one-out kNN majority-vote confusion matrix over the same
    * graph — vote, tie-breaks, and matrix replayed by
    * [[OracleSql.simKnnClassifySql]] (hash-checked). */
  def simKnnClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    Similarity.knnClassify(e, k = 5, maxBucket = Some(64))
      .orderBy(col("label"), col("pred"))
  }

  /** PageRank centrality over the kNN graph — the five integer power
    * steps replayed bit-exactly by [[OracleSql.simPagerankSql]]. */
  def simPagerank(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.pageRank(Tables.embeddings(spark, sfDir))
      .orderBy(col("rank"))

  /** Reciprocal-rank fusion of the exact and ANN rankers — both input
    * rankings, the integer scores, and the fused re-rank replayed by
    * [[OracleSql.simRrfSql]] (hash-checked). */
  def simRrf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    Similarity.rrfFusion(e, e.filter(col("vec_id") < 5), k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hybrid lexical+semantic retrieval: BM25 over the document text and
    * exact cosine over the embedding (query = doc 0's vector), fused
    * with reciprocal-rank fusion — both rankings, the integer RRF
    * scores, the agreement counter, and the fused re-rank all replayed
    * by [[simHybridSearchSql]] (hash-checked). */
  def simHybridSearch(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.hybridSearch(Tables.documents(spark, sfDir),
      Tables.embeddings(spark, sfDir), Seq("spark", "join", "window"),
      queryVecId = 0L)
      .orderBy(col("rank"))

  val simHybridSearchSql: String =
    """WITH dl AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      |  FROM documents),
      |corpus AS (SELECT count(*) AS n_docs, sum(dl) AS total_toks FROM dl),
      |toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
      |       WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2),
      |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |s AS (SELECT tf.doc_id,
      |        CAST(round(
      |          round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 9)
      |          * (tf * 2.2
      |             / (tf + 1.2 * (0.25 + 0.75 * dl
      |                / (CAST(total_toks AS DOUBLE) / n_docs))))
      |          * 1000000000.0) AS BIGINT) AS score_e9
      |      FROM tf JOIN dfq USING (tok) CROSS JOIN corpus
      |      JOIN dl ON tf.doc_id = dl.doc_id),
      |lexagg AS (SELECT doc_id, CAST(sum(score_e9) AS BIGINT) AS bm25_e9
      |           FROM s GROUP BY 1
      |           ORDER BY bm25_e9 DESC, doc_id LIMIT 20),
      |lex AS (SELECT doc_id,
      |          CAST(row_number() OVER (ORDER BY bm25_e9 DESC, doc_id)
      |            AS BIGINT) AS rank
      |        FROM lexagg),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sem AS (
      |  SELECT doc_id, rank FROM (
      |    SELECT e2.vec_id AS doc_id,
      |      CAST(ROW_NUMBER() OVER (
      |        ORDER BY round(list_cosine_similarity(q.v, e2.v), 9) DESC,
      |                 e2.vec_id) AS BIGINT) AS rank
      |    FROM e q, e e2 WHERE q.vec_id = 0 AND e2.vec_id <> 0)
      |  WHERE rank <= 20),
      |u AS (SELECT doc_id, rank FROM lex
      |      UNION ALL SELECT doc_id, rank FROM sem),
      |sc AS (SELECT doc_id,
      |         CAST(SUM(CAST(round(1000000000.0 / (60 + rank), 0)
      |           AS BIGINT)) AS BIGINT) AS rrf_e9,
      |         COUNT(*) AS n_lists
      |       FROM u GROUP BY 1)
      |SELECT doc_id, rank, rrf_e9, n_lists FROM (
      |  SELECT doc_id,
      |    CAST(ROW_NUMBER() OVER (ORDER BY rrf_e9 DESC, doc_id) AS BIGINT)
      |      AS rank,
      |    rrf_e9, n_lists
      |  FROM sc)
      |WHERE rank <= 10 ORDER BY rank""".stripMargin

  /** Per-node triangles + clustering coefficient over the mutual-kNN
    * graph — orientation, wedge closure, and the NANO coefficient all
    * replayed by [[OracleSql.simTrianglesSql]] (hash-checked). */
  def simTriangles(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.triangleStats(Tables.embeddings(spark, sfDir))
      .orderBy(col("vec_id"))

  /** Hard-negative mining (top-k nearest with a different label) —
    * candidacy, cap, label predicate, and rerank replayed by
    * [[OracleSql.simHardNegativesSql]] (hash-checked). */
  def simHardNegatives(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.hardNegatives(Tables.embeddings(spark, sfDir))
      .orderBy(col("query_id"), col("rank"))

  /** IVF ANN — rows-only (k-means centroids are engine-specific);
    * [[simIvfFull]] is the oracle-checked property companion. */
  def simIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), k = 10,
      centroidCacheKey = Some(s"embeddings_$sfDir"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Oracle-checked IVF property: probing every cell (nprobe = nlist) must
    * reproduce the exact ranking, so the full IVF machinery — k-means cell
    * assignment, probe join, rerank window — is hash-checked against the
    * same DuckDB exact-top-k oracle as [[simTopK]]. Partial-probe recall
    * stays a spec assertion (it depends on how well k-means separates the
    * corpus, which no fixed floor captures on synthetic data). */
  def simIvfFull(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), k = 10,
      nlist = 16, nprobe = 16,
      centroidCacheKey = Some(s"embeddings_$sfDir"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Recall@10 audit of the IVF index, HASH-checked end-to-end: the
    * seeded-quantizer IVF result ([[Similarity.ivfTopKSeeded]], every
    * step engine-replicable) joins the exact top-10 ranking and emits
    * integer hit counts per query — (query_id, hits, k). DuckDB replays
    * BOTH sides (assignment, probes, rerank, intersection), so a drift
    * anywhere in the IVF machinery breaks the hash. This closes the gap
    * `sim_ivf` itself leaves (its k-means cells are engine-specific, so
    * it stays rows-only with [[simIvfFull]] as its exactness companion).
    *
    * Scale shape: the audit's join is (queries × k) rows on both sides —
    * bounded metadata riding the existing broadcast-probe plans. */
  def simIvfRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopKSeeded(e, queries, k = 10,
      nlist = 8, nprobe = 2)
    val exact = Similarity.topK(e, queries, k = 10)
    exact.join(
        ivf.select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"),
        count(lit(1)).cast("long").as("k"))
      .orderBy(col("query_id"))
  }

  val simIvfRecallSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
      |assign AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT e.vec_id, c.cell,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(e.v, c.cv), 9) DESC,
      |                 c.cell) AS rn
      |    FROM e, c) WHERE rn = 1),
      |probes AS (
      |  SELECT query_id, cell FROM (
      |    SELECT e.vec_id AS query_id, c.cell,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(e.v, c.cv), 9) DESC,
      |                 c.cell) AS rn
      |    FROM e, c WHERE e.vec_id < 5) WHERE rn <= 2),
      |ivf AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT p.query_id, a.vec_id AS neighbor_id,
      |      ROW_NUMBER() OVER (PARTITION BY p.query_id
      |        ORDER BY round(list_cosine_similarity(q.v, e2.v), 9) DESC,
      |                 a.vec_id) AS rnk
      |    FROM probes p
      |    JOIN assign a ON a.cell = p.cell
      |    JOIN e q ON q.vec_id = p.query_id
      |    JOIN e e2 ON e2.vec_id = a.vec_id
      |    WHERE a.vec_id <> p.query_id) WHERE rnk <= 10),
      |exact AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
      |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |        ORDER BY round(list_cosine_similarity(q.v, e2.v), 9) DESC,
      |                 e2.vec_id) AS rnk
      |    FROM e q, e e2
      |    WHERE q.vec_id < 5 AND e2.vec_id <> q.vec_id) WHERE rnk <= 10)
      |SELECT ex.query_id,
      |  CAST(count(iv.neighbor_id) AS BIGINT) AS hits,
      |  CAST(count(*) AS BIGINT) AS k
      |FROM exact ex LEFT JOIN ivf iv
      |  ON iv.query_id = ex.query_id AND iv.neighbor_id = ex.neighbor_id
      |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin

  // -------------------------------------------- embedding compression

  def embedQuantize(spark: SparkSession, sfDir: String): DataFrame =
    EmbeddingCompression.quantizeInt8(Tables.embeddings(spark, sfDir))
      .orderBy(col("vec_id"))

  val embedQuantizeSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |a AS (
      |  SELECT vec_id, v,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), [abs(x) FOR x IN v]),
      |                (acc, x) -> greatest(acc, x)) AS amax
      |  FROM e),
      |q AS (
      |  SELECT vec_id, v, amax / 127.0 AS s,
      |    [round(x / (amax / 127.0), 0) FOR x IN v] AS qs
      |  FROM a)
      |SELECT vec_id, round(s, 9) AS scale9,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    [abs(qs[i] * s - v[i]) FOR i IN generate_series(1, len(v))]),
      |    (acc, x) -> greatest(acc, x)), 9) AS max_err9,
      |  CAST(len(list_filter(qs, x -> abs(x) = 127.0)) AS BIGINT) AS n_sat
      |FROM q ORDER BY vec_id""".stripMargin

  /** Exact integer Gram matrix of the embedding corpus — the typed
    * [[EmbeddingCompression.gramMatrix]] aggregator's sums replayed by a
    * quadratic unnest-join in DuckDB (the oracle affords N·d² rows at
    * sf0.01; the engine never materializes them at any scale). */
  def embedCovariance(spark: SparkSession, sfDir: String): DataFrame =
    EmbeddingCompression.gramMatrix(Tables.embeddings(spark, sfDir))
      .orderBy(col("i"), col("j"))

  val embedCovarianceSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings),
      |q AS (SELECT vec_id,
      |        [CAST(round(x * 1000000.0, 0) AS BIGINT) FOR x IN v] AS qv
      |      FROM e),
      |x AS (SELECT vec_id, d, qv[d] AS x FROM q
      |      CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d)),
      |p AS (SELECT a.d AS i, b.d AS j, SUM(a.x * b.x) AS s_xy
      |      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.d <= b.d
      |      GROUP BY 1, 2),
      |s AS (SELECT d AS i, SUM(x) AS s FROM x GROUP BY 1)
      |SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
      |  CAST(p.s_xy AS BIGINT) AS s_xy, CAST(si.s AS BIGINT) AS s_i,
      |  CAST(sj.s AS BIGINT) AS s_j,
      |  (SELECT COUNT(*) FROM e) AS n
      |FROM p JOIN s si ON si.i = p.i JOIN s sj ON sj.i = p.j
      |ORDER BY i, j""".stripMargin

  /** Dominant-eigenvector power iteration over the Gram matrix — all 12
    * integer steps (multiply, max-abs, sign-safe renormalize) unrolled as
    * chained CTEs, HUGEINT carrying what the engine carries in
    * DECIMAL(38,0). */
  def embedPowerIter(spark: SparkSession, sfDir: String): DataFrame =
    EmbeddingCompression.powerIteration(Tables.embeddings(spark, sfDir))
      .orderBy(col("d"))

  val embedPowerIterSql: String = {
    // MATERIALIZED: each step is referenced twice (components + max-abs)
    // and reads the previous step — inlining would re-expand the chain
    // 2^12 times down to the parquet scan
    val steps = (1 to 12).map { k =>
      s"""w$k AS MATERIALIZED (
         |  SELECT mat.i AS d, SUM(CAST(mat.m AS HUGEINT) * v.v) AS w
         |  FROM mat JOIN v${k - 1} v ON mat.j = v.d GROUP BY 1),
         |m$k AS MATERIALIZED (
         |  SELECT greatest(MAX(abs(w)), 1) AS mx FROM w$k),
         |v$k AS MATERIALIZED (SELECT d,
         |  (CASE WHEN w < 0 THEN -1 ELSE 1 END)
         |    * ((abs(w) * 1000000000) // (SELECT mx FROM m$k)) AS v,
         |  (SELECT mx FROM m$k) AS mx FROM w$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |q AS (SELECT vec_id,
       |        [CAST(round(x * 1000000.0, 0) AS BIGINT) FOR x IN v] AS qv
       |      FROM e),
       |x AS (SELECT vec_id, d, qv[d] AS x FROM q
       |      CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d)),
       |p AS (SELECT a.d AS i, b.d AS j, SUM(a.x * b.x) AS s_xy
       |      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.d <= b.d
       |      GROUP BY 1, 2),
       |nn AS (SELECT COUNT(*) AS n FROM e),
       |up AS (SELECT i, j,
       |         (CASE WHEN s_xy < 0 THEN -1 ELSE 1 END)
       |           * (abs(s_xy) // ((SELECT n FROM nn) * 1000000)) AS m
       |       FROM p),
       |mat AS MATERIALIZED (
       |        SELECT i, j, m FROM up
       |        UNION ALL SELECT j, i, m FROM up WHERE i <> j),
       |v0 AS (SELECT unnest(generate_series(1, 64)) AS d,
       |       CAST(1000000000 AS HUGEINT) AS v, CAST(0 AS HUGEINT) AS mx),
       |$steps
       |SELECT CAST(d AS BIGINT) AS d, CAST(v AS BIGINT) AS v_nano,
       |  CAST(mx AS BIGINT) AS growth
       |FROM v12 ORDER BY d""".stripMargin
  }

  /** Projection-distortion audit — plane replay lives in
    * [[OracleSql.embedProjectSql]] (it owns the HUGEINT splitmix64
    * helpers). */
  def embedProject(spark: SparkSession, sfDir: String): DataFrame =
    EmbeddingCompression.projectionAudit(Tables.embeddings(spark, sfDir))
      .orderBy(col("id_a"))

  // ----------------------------------------------------------- data splits

  /** THE split-bucket hash: id → [0, 100), shared by every split/sample
    * site (q_dataset_split, q_stratified_sample, the flagship pipeline) so
    * split membership can never desynchronize between operators.
    *
    * Multiplicative hash MOD PRIME: reduce mod p=1e9+7, multiply by an odd
    * constant, reduce mod p again, THEN take mod 100. The inner mod-prime
    * step is what makes this a real hash — without it the composite-modulus
    * product collapses to a permutation of `id mod 100`, and any periodic
    * id structure (sharded ranges, round-robin generators) would skew a
    * stratum to 0% or 2×. All intermediates stay under 2^63: overflow-free
    * under ANSI mode and in engines that trap (DuckDB). */
  private[graft] def splitBucket(id: Column): Column = hashBucket(id, 100L)

  /** [[splitBucket]] at arbitrary granularity (same recurrence, final mod
    * `buckets`) — finer grains serve per-group keep-fraction thresholds. */
  private[graft] def hashBucket(id: Column, buckets: Long): Column =
    pmod(pmod(pmod(id, lit(1000000007L)) * lit(2654435761L),
      lit(1000000007L)), lit(buckets))

  /** The identical arithmetic as ANSI SQL (the leading (+p)%p dance keeps
    * negative ids non-negative before the multiply). */
  private[graft] def splitBucketSql(idCol: String): String =
    hashBucketSql(idCol, 100L)

  private[graft] def hashBucketSql(idCol: String, buckets: Long): String =
    s"(((($idCol % 1000000007 + 1000000007) % 1000000007) * 2654435761) " +
      s"% 1000000007) % $buckets"

  /** Deterministic train/val/test assignment (90/5/5) by the shared
    * [[splitBucket]] hash of the stable document id — the split survives
    * reprocessing, re-partitioning, and engine changes, which is the
    * property that matters when the corpus is rebuilt at 100 TB (random()
    * splits do not). */
  def datasetSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = splitBucket(col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  val datasetSplitSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, ${splitBucketSql("doc_id")} AS b
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sample: ~10% of each event_type stratum by
    * the shared [[splitBucket]] hash of the stable id — reproducible
    * across engines and reprocessing runs (engine `sample()` is seed- and
    * partitioning-dependent, so it can never be oracle-checked or
    * replayed). */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(splitBucket(col("event_id")) < 10)
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id"))

  val stratifiedSampleSql: String =
    s"""SELECT event_id, event_type FROM events
       |WHERE ${splitBucketSql("event_id")} < 10
       |ORDER BY event_id""".stripMargin

  /** Temperature-based corpus rebalancing (multilingual "data mixing",
    * cf. XLM-R): resample so group sizes follow n_g^(1/T) instead of n_g,
    * downsample-only — keep_frac_g = (n_min/n_g)^(1-1/T), anchored so the
    * SMALLEST group keeps everything and no group is upsampled. The
    * fraction is realized deterministically: keep a doc iff
    * hashBucket(doc_id, 1e6) < floor(round(keep_frac, 9) * 1e6) — the same
    * reprocessing-stable hash as the train/val/test split, at 1e-6 grain.
    * `pow` is rounded to 9 dp before the integer threshold so the cutoff
    * is engine-portable.
    *
    * Scale shape: one count-by-group aggregate (map-side partial), a
    * per-GROUP threshold table broadcast back (bounded by group
    * cardinality — languages/domains, not corpus), then a stateless filter.
    * No doc-level shuffle at all. */
  def temperatureRebalance(docs: DataFrame, groupCol: String = "lang",
      idCol: String = "doc_id", temperature: Double = 2.0): DataFrame = {
    require(temperature >= 1.0, "temperature < 1 would sharpen, not flatten")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
    val nMin = counts.agg(min(col("n_g")).as("n_min"))
    val thresh = counts.crossJoin(broadcast(nMin)).select(col(groupCol),
      floor(round(pow(col("n_min").cast("double") / col("n_g"),
        1.0 - 1.0 / temperature), 9) * 1e6).cast("long").as("keep_thresh"))
    docs.join(broadcast(thresh), groupCol)
      .filter(hashBucket(col(idCol), 1000000L) < col("keep_thresh"))
      .select(col(idCol), col(groupCol))
  }

  def textRebalance(spark: SparkSession, sfDir: String): DataFrame =
    temperatureRebalance(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  val textRebalanceSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n_g FROM documents GROUP BY 1),
       |m AS (SELECT min(n_g) AS n_min FROM c),
       |t AS (SELECT lang,
       |        CAST(floor(round(pow(n_min / CAST(n_g AS DOUBLE), 0.5), 9)
       |          * 1e6) AS BIGINT) AS keep_thresh
       |      FROM c CROSS JOIN m)
       |SELECT d.doc_id, d.lang
       |FROM documents d JOIN t USING (lang)
       |WHERE ${hashBucketSql("d.doc_id", 1000000L)} < keep_thresh
       |ORDER BY d.doc_id""".stripMargin

  /** Fractional-epoch upsampling mixer — the complement of
    * [[temperatureRebalance]]'s downsample-only form. Training mixtures are
    * usually specified as epochs per source ("2.3 epochs of the small
    * corpus, 1 epoch of the big one"); here the targets flatten toward the
    * LARGEST group with temperature T: epochs_g = (n_max/n_g)^(1-1/T), so
    * the biggest group trains exactly once and every smaller group is
    * repeated, never dropped.
    *
    * The fractional epoch is realized deterministically: epochs_g is
    * quantized once to integer micro-epochs (round(e,9)·1e6 — all
    * arithmetic after the single pow is integer, so engines cannot drift),
    * every doc gets `micro / 1e6` whole copies, and the residual
    * `micro % 1e6` fraction selects docs by the reprocessing-stable
    * [[hashBucket]] — the same id-hash discipline as the train/val/test
    * split, so mixture membership survives rebuilds.
    *
    * Scale shape: one count-by-group aggregate (map-side partial), a
    * |groups|-row epoch table broadcast back, then a stateless
    * explode(sequence) — no doc-level shuffle; output amplification IS the
    * requested mixture. */
  def epochMixture(docs: DataFrame, groupCol: String = "lang",
      idCol: String = "doc_id", temperature: Double = 2.0): DataFrame = {
    require(temperature >= 1.0, "temperature < 1 would sharpen, not flatten")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
    val nMax = counts.agg(max(col("n_g")).as("n_max"))
    val micro = counts.crossJoin(broadcast(nMax)).select(col(groupCol),
      round(round(pow(col("n_max").cast("double") / col("n_g"),
        1.0 - 1.0 / temperature), 9) * 1e6).cast("long").as("micro"))
    docs.join(broadcast(micro), groupCol)
      .select(col(idCol), col(groupCol),
        (floor(col("micro") / lit(1000000L)).cast("long") +
          when(hashBucket(col(idCol), 1000000L) < col("micro") % 1000000L,
            1L).otherwise(0L)).as("n_copies"))
      .select(col(idCol), col(groupCol),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  def textMixtureEpochs(spark: SparkSession, sfDir: String): DataFrame =
    epochMixture(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"), col("copy"))

  val textMixtureEpochsSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n_g FROM documents GROUP BY 1),
       |m AS (SELECT max(n_g) AS n_max FROM c),
       |t AS (SELECT lang,
       |        CAST(round(round(pow(n_max / CAST(n_g AS DOUBLE), 0.5), 9)
       |          * 1e6) AS BIGINT) AS micro
       |      FROM c CROSS JOIN m),
       |x AS (SELECT d.doc_id, d.lang,
       |        micro // 1000000 +
       |        CASE WHEN ${hashBucketSql("d.doc_id", 1000000L)}
       |               < micro % 1000000 THEN 1 ELSE 0 END AS n_copies
       |      FROM documents d JOIN t USING (lang))
       |SELECT doc_id, lang,
       |  CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy
       |FROM x ORDER BY doc_id, copy""".stripMargin

  /** One epoch of the deterministic training shuffle (epoch 1, 32 shards)
    * — hash-order assignment, per-shard ranking, no global sort. */
  def epochShuffle(spark: SparkSession, sfDir: String): DataFrame =
    TrainingOrder.epochShuffle(Tables.documents(spark, sfDir),
      epoch = 1L, nShards = 32)
      .orderBy(col("doc_id"))

  /** Fixed-size deterministic sample per source: the K lowest full-range
    * hash values (doc_id tie-break) of each source stratum — the
    * fixed-COUNT companion to [[stratifiedSample]]'s fixed-FRACTION form
    * (dashboards and eval sets want "20 docs per source", not "2%").
    *
    * Scale shape: the rank window partitions by source — each stratum
    * sorts only its own rows, and the hash order means the sample is
    * reprocessing-stable. The full-granularity [[hashBucket]] (mod the
    * prime itself) gives a collision-free-in-practice total order. */
  def samplePerSource(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"),
        hashBucket(col("doc_id"), 1000000007L).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 20)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  val samplePerSourceSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, source,
       |    ${hashBucketSql("doc_id", 1000000007L)} AS h
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY h, doc_id) AS BIGINT) AS rk
       |  FROM h)
       |SELECT doc_id, source, rk FROM r
       |WHERE rk <= 20 ORDER BY source, rk""".stripMargin

  /** Fuzzy (edit-distance) join: match slightly-corrupted probe texts back
    * to the corpus by levenshtein ≤ 2 over a fixed-length prefix, with a
    * cheap length-difference block ahead of the quadratic distance. The
    * probe set is tiny by construction → broadcast nested-loop with the
    * blocking predicate evaluated first; at corpus×corpus scale the block
    * becomes a join key (length band) instead. */
  def fuzzyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // ASCII-fold before the distance: Spark levenshtein counts CHARACTERS
    // while DuckDB's counts BYTES, so any multi-byte character would skew
    // parity — mapping every non-ASCII codepoint to one '?' makes the two
    // definitions coincide for ALL inputs, not just ASCII fixtures
    def pfx(n: Int) = regexp_replace(
      substring(col("text"), 1, n), "[^\\x20-\\x7e]", "?")
    val corpus = docs.select(col("doc_id"), pfx(40).as("pfx"))
    // deterministic corruption: drop the probe prefix's last character
    val probes = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("probe_id"), pfx(39).as("probe_pfx"))
    // thresholded levenshtein: early-exits once the band is exceeded —
    // O(len·k) per pair instead of O(len²), the term that dominates at
    // corpus×corpus scale
    val dist = levenshtein(col("pfx"), col("probe_pfx"), 2)
    corpus.join(broadcast(probes),
        abs(length(col("pfx")) - length(col("probe_pfx"))) <= 2 &&
          dist >= 0)
      .select(col("probe_id"), col("doc_id"), dist.cast("long").as("dist"))
      .orderBy(col("probe_id"), col("doc_id"))
  }

  val fuzzyJoinSql: String =
    """WITH corpus AS (
      |  SELECT doc_id,
      |    regexp_replace(substring(text, 1, 40), '[^ -~]', '?', 'g') AS pfx
      |  FROM documents),
      |probes AS (
      |  SELECT doc_id AS probe_id,
      |    regexp_replace(substring(text, 1, 39), '[^ -~]', '?', 'g') AS probe_pfx
      |  FROM documents WHERE doc_id < 20)
      |SELECT probe_id, doc_id,
      |  CAST(levenshtein(pfx, probe_pfx) AS BIGINT) AS dist
      |FROM corpus JOIN probes
      |  ON abs(length(pfx) - length(probe_pfx)) <= 2
      | AND levenshtein(pfx, probe_pfx) <= 2
      |ORDER BY probe_id, doc_id""".stripMargin

  // ---------------------------------------------------------------- text

  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.stats(Tables.documents(spark, sfDir)).orderBy(col("doc_id"))

  val textStatsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS BIGINT) AS n_regex_tokens,
      |  len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr,
      |  (length(text) - len(string_split(text, ' ')) + 1) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  def textLangId(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.langId(Tables.documents(spark, sfDir)).orderBy(col("doc_id"))

  val textLangIdSql: String = {
    val scoreExprs = TextAnalysis.markers.map { case (l, lex) =>
      val lst = lex.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(string_split(text, ' '), t -> list_contains($lst, t))) AS s_$l"
    }.mkString(",\n    ")
    val langs = TextAnalysis.markers.map(_._1)
    val best = langs.map(l => s"s_$l").reduce((a, b) => s"greatest($a, $b)")
    val cases = langs.map(l =>
      s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString("\n    ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    $scoreExprs
       |  FROM documents),
       |b AS (SELECT *, $best AS best FROM scored)
       |SELECT doc_id, lang,
       |  CASE $cases ELSE 'und' END AS pred_lang
       |FROM b ORDER BY doc_id""".stripMargin
  }

  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.qualityScore(Tables.documents(spark, sfDir)).orderBy(col("doc_id"))

  val textQualitySql: String = {
    val stop = TextAnalysis.markers.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents)
      |SELECT doc_id,
      |  least(len(toks) / 100.0, 1.0) * 0.4
      |  + least((len(list_filter(toks, t -> list_contains(STOPLIST, t))) * 10.0) / len(toks), 1.0) * 0.4
      |  + (1.0 - (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) / CAST(length(text) AS DOUBLE)) * 0.2
      |  AS quality
      |FROM t ORDER BY doc_id""".stripMargin.replace("STOPLIST", stop)
  }

  /** Token-budget selection (budget = total tokens div 10). The oracle
    * replays the selection as ONE flat global running sum — proving the
    * engine's bucket-histogram decomposition (built to avoid the global
    * sort at scale) selects the identical document set. */
  def textTokenBudget(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.tokenBudget(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  val textTokenBudgetSql: String = {
    val stop = TextAnalysis.markers.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
      |sc AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |    least(len(toks) / 100.0, 1.0) * 0.4
      |    + least((len(list_filter(toks, t -> list_contains(STOPLIST, t))) * 10.0) / len(toks), 1.0) * 0.4
      |    + (1.0 - (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) / CAST(length(text) AS DOUBLE)) * 0.2
      |    AS q
      |  FROM t),
      |d AS (
      |  SELECT doc_id, n_tokens,
      |    (CAST(floor(round(q, 9) * 10000) AS BIGINT) * 100000) // n_tokens
      |      AS density_nano
      |  FROM sc),
      |r AS (
      |  SELECT doc_id, n_tokens, density_nano,
      |    SUM(n_tokens) OVER (ORDER BY density_nano DESC, doc_id
      |                        ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM d)
      |SELECT doc_id, n_tokens, density_nano,
      |  cum <= (SELECT SUM(n_tokens) // 10 FROM d) AS keep
      |FROM r ORDER BY doc_id""".stripMargin.replace("STOPLIST", stop)
  }

  /** Per-source OLS trend: the least-squares slope of quality (nano
    * units) against document length (tokens) within each source — the
    * drift monitor that answers "does this source's quality degrade as
    * documents grow?" before a length-capped ingest bakes the bias in.
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²): the moments are EXACT
    * integer sums (order-free, partition-invariant), and the slope is
    * emitted in integer NANO units via sign-safe DECIMAL(38,0)/HUGEINT
    * floor division — a double division here measured 1 ulp apart
    * between engines, which the all-integer form cannot do. Sources with
    * a degenerate x-variance report NULL. Scale shape: one
    * map-side-partial aggregate keyed by source; no window, no join. */
  def textSourceTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select(col("source"),
      size(split(col("text"), " ")).cast("long").as("x"),
      floor(round(TextAnalysis.qualityExpr(col("text")), 9) * 1000000000L)
        .cast("long").as("y"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("num", expr(
        "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("den", expr(
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .select(col("source"), col("n"), col("sx"), col("sy"),
        col("sxx"), col("sxy"),
        when(col("den") > 0, expr(
          "IF(num < 0, -1L, 1L) * ((abs(num) * 1000000000) div den)"))
          .as("slope_e9"))
      .orderBy(col("source"))
  }

  val textSourceTrendSql: String = {
    val stop = TextAnalysis.markers.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    """WITH t AS (
      |  SELECT source, string_split(text, ' ') AS toks, text FROM documents),
      |d AS (
      |  SELECT source, CAST(len(toks) AS BIGINT) AS x,
      |    CAST(floor(round(
      |      least(len(toks) / 100.0, 1.0) * 0.4
      |      + least((len(list_filter(toks, t -> list_contains(STOPLIST, t))) * 10.0) / len(toks), 1.0) * 0.4
      |      + (1.0 - (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) / CAST(length(text) AS DOUBLE)) * 0.2,
      |      9) * 1000000000) AS BIGINT) AS y
      |  FROM t),
      |m AS (
      |  SELECT source, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * x) AS sxx, SUM(x * y) AS sxy
      |  FROM d GROUP BY 1),
      |s2 AS (
      |  SELECT source, n, sx, sy, sxx, sxy,
      |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
      |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
      |  FROM m)
      |SELECT source, CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sx,
      |  CAST(sy AS BIGINT) AS sy, CAST(sxx AS BIGINT) AS sxx,
      |  CAST(sxy AS BIGINT) AS sxy,
      |  CAST(CASE WHEN den > 0 THEN
      |    (CASE WHEN num < 0 THEN -1 ELSE 1 END)
      |      * ((abs(num) * 1000000000) // den)
      |  END AS BIGINT) AS slope_e9
      |FROM s2 ORDER BY source""".stripMargin.replace("STOPLIST", stop)
  }

  /** Per-source Kolmogorov–Smirnov drift statistic: for each source, the
    * KS distance sup_b |CDF_source(b) − CDF_corpus(b)| between its
    * quality distribution and the whole corpus's — the standard
    * distribution-drift gate a pipeline runs per ingest batch before a
    * shifted source silently tilts the training mix. Quality is
    * quantized to the [[TextAnalysis.qualityFloor]] 1e4 buckets, so the
    * sup ranges over ≤ 10001 boundaries and every CDF comparison is the
    * exact integer cross-product test |cum_s·N − cum_all·n_s| (carried
    * in DECIMAL(38,0)/HUGEINT), emitted in NANO units by one sign-free
    * floor division.
    *
    * Scale shape: one histogram aggregate keyed (source, bucket), one
    * corpus histogram, then all windows/joins run on the
    * sources×buckets grid — bounded metadata at any corpus size, the
    * [[TextAnalysis.lengthBand]] trick applied to a two-sample test. */
  def textKsDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(spark, sfDir).select(col("source"),
      floor(round(TextAnalysis.qualityExpr(col("text")), 9) * 10000)
        .cast("long").as("qb"))
    val hist = scored.groupBy(col("source"), col("qb"))
      .agg(count(lit(1)).as("cnt"))
    val qbs = scored.select(col("qb")).distinct()
    val sources = scored.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val corp = scored.groupBy(col("qb")).agg(count(lit(1)).as("c"))
      .withColumn("cum_all", sum(col("c")).over(
        Window.orderBy(col("qb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("nn"))))
    val ws = Window.partitionBy(col("source")).orderBy(col("qb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sources.crossJoin(broadcast(qbs))
      .join(hist, Seq("source", "qb"), "left")
      .withColumn("cum_s", sum(coalesce(col("cnt"), lit(0L))).over(ws))
      .join(broadcast(corp.select(col("qb"), col("cum_all"), col("nn"))),
        Seq("qb"))
      .withColumn("diff", expr(
        "abs(CAST(cum_s AS DECIMAL(38,0)) * nn - CAST(cum_all AS DECIMAL(38,0)) * n_s)"))
      .groupBy(col("source"))
      .agg(first(col("n_s")).as("n_s"), max(col("diff")).as("maxdiff"),
        first(col("nn")).as("nn"))
      .select(col("source"), col("n_s"),
        expr("CAST((maxdiff * 1000000000) div (CAST(n_s AS DECIMAL(38,0)) * nn) AS BIGINT)")
          .as("ks_e9"))
      .orderBy(col("source"))
  }

  val textKsDriftSql: String = {
    val stop = TextAnalysis.markers.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    """WITH t AS (
      |  SELECT source, string_split(text, ' ') AS toks, text FROM documents),
      |d AS (
      |  SELECT source,
      |    CAST(floor(round(
      |      least(len(toks) / 100.0, 1.0) * 0.4
      |      + least((len(list_filter(toks, t -> list_contains(STOPLIST, t))) * 10.0) / len(toks), 1.0) * 0.4
      |      + (1.0 - (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) / CAST(length(text) AS DOUBLE)) * 0.2,
      |      9) * 10000) AS BIGINT) AS qb
      |  FROM t),
      |hist AS (SELECT source, qb, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
      |qbs AS (SELECT DISTINCT qb FROM d),
      |srcs AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY 1),
      |corp AS (
      |  SELECT qb, SUM(COUNT(*)) OVER (ORDER BY qb
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
      |  FROM d GROUP BY qb),
      |nn AS (SELECT COUNT(*) AS nn FROM d),
      |grid AS (
      |  SELECT s.source, s.n_s, q.qb,
      |    SUM(COALESCE(h.cnt, 0)) OVER (PARTITION BY s.source ORDER BY q.qb
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s
      |  FROM srcs s CROSS JOIN qbs q
      |  LEFT JOIN hist h ON h.source = s.source AND h.qb = q.qb),
      |diffs AS (
      |  SELECT g.source, g.n_s,
      |    abs(CAST(g.cum_s AS HUGEINT) * (SELECT nn FROM nn)
      |      - CAST(c.cum_all AS HUGEINT) * g.n_s) AS diff
      |  FROM grid g JOIN corp c ON g.qb = c.qb)
      |SELECT source, CAST(n_s AS BIGINT) AS n_s,
      |  CAST((MAX(diff) * 1000000000)
      |    // (CAST(n_s AS HUGEINT) * (SELECT nn FROM nn)) AS BIGINT)
      |    AS ks_e9
      |FROM diffs GROUP BY source, n_s ORDER BY source""".stripMargin
      .replace("STOPLIST", stop)
  }

  /** Cross-source quantile normalization of the quality score: each
    * document's score is replaced by the CORPUS-wide score at the same
    * quantile its source assigns it — the calibration step that makes a
    * lenient source's "0.8" comparable to a strict source's "0.8" before
    * a global quality floor is applied. Quantile matching is the exact
    * integer cross-product rule: the normalized bucket is the smallest
    * corpus bucket B with cum_corpus(B)·n_source ≥ cum_source(q)·N —
    * no ratio is ever floated.
    *
    * Scale shape: both CDFs live on the observed-quality-bucket grid
    * (≤ 10001 rows per side — bounded); the quantile-matching theta join
    * runs between the (source, bucket) grid and the corpus buckets
    * (bounded × bounded), and the per-document application is one
    * broadcast join of the finished (source, bucket → normalized) map.
    * The corpus itself is scanned once. */
  def textQuantileNorm(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(spark, sfDir).select(col("doc_id"),
      col("source"),
      floor(round(TextAnalysis.qualityExpr(col("text")), 9) * 10000)
        .cast("long").as("qb"))
    val srcHist = scored.groupBy(col("source"), col("qb"))
      .agg(count(lit(1)).as("cnt"))
    val ws = Window.partitionBy(col("source")).orderBy(col("qb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val srcCum = srcHist.withColumn("cum_s", sum(col("cnt")).over(ws))
      .join(broadcast(scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n_s"))), "source")
    val corpCum = scored.groupBy(col("qb")).agg(count(lit(1)).as("c"))
      .withColumn("cum_c", sum(col("c")).over(
        Window.orderBy(col("qb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("nn"))))
      .select(col("qb").as("cb"), col("cum_c"), col("nn"))
    val mapping = srcCum.join(broadcast(corpCum),
        expr("CAST(cum_c AS DECIMAL(38,0)) * n_s >= CAST(cum_s AS DECIMAL(38,0)) * nn"))
      .groupBy(col("source"), col("qb"))
      .agg(min(col("cb")).as("qnorm_b"))
    scored.join(broadcast(mapping), Seq("source", "qb"))
      .select(col("doc_id"), col("source"), col("qb"), col("qnorm_b"))
      .orderBy(col("doc_id"))
  }

  val textQuantileNormSql: String = {
    val stop = TextAnalysis.markers.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    """WITH t AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks, text
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, source,
      |    CAST(floor(round(
      |      least(len(toks) / 100.0, 1.0) * 0.4
      |      + least((len(list_filter(toks, t -> list_contains(STOPLIST, t))) * 10.0) / len(toks), 1.0) * 0.4
      |      + (1.0 - (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) / CAST(length(text) AS DOUBLE)) * 0.2,
      |      9) * 10000) AS BIGINT) AS qb
      |  FROM t),
      |sc AS (
      |  SELECT source, qb, COUNT(*) AS cnt,
      |    SUM(COUNT(*)) OVER (PARTITION BY source ORDER BY qb
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s
      |  FROM d GROUP BY source, qb),
      |ns AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY 1),
      |cc AS (
      |  SELECT qb AS cb,
      |    SUM(COUNT(*)) OVER (ORDER BY qb
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
      |  FROM d GROUP BY qb),
      |nn AS (SELECT COUNT(*) AS nn FROM d),
      |mp AS (
      |  SELECT sc.source, sc.qb, MIN(cc.cb) AS qnorm_b
      |  FROM sc JOIN ns USING (source), cc, nn
      |  WHERE CAST(cc.cum_c AS HUGEINT) * ns.n_s
      |        >= CAST(sc.cum_s AS HUGEINT) * nn.nn
      |  GROUP BY 1, 2)
      |SELECT d.doc_id, d.source, d.qb, mp.qnorm_b
      |FROM d JOIN mp ON d.source = mp.source AND d.qb = mp.qb
      |ORDER BY d.doc_id""".stripMargin.replace("STOPLIST", stop)
  }

  /** TextRank keywords — co-occurrence graph and all five weighted
    * integer power steps unrolled as MATERIALIZED CTEs (the
    * [[OracleSql.simPagerankSql]] discipline over tokens). */
  def textTextrank(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.textrank(Tables.documents(spark, sfDir))
      .orderBy(col("rank"))

  val textTextrankSql: String = {
    val stop = TextAnalysis.markers.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    val steps = (1 to 5).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.tok,
         |    (SELECT b FROM base) + 85 * COALESCE(s.s, 0) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS tok,
         |      CAST(SUM((CAST(p.r AS HUGEINT) * e.w) // e.outw) AS BIGINT) AS s
         |    FROM edges e JOIN r${i - 1} p ON e.src = p.tok
         |    GROUP BY 1) s ON n.tok = s.tok)""".stripMargin
    }.mkString(",\n")
    s"""WITH ft AS (SELECT list_filter(string_split(text, ' '),
       |    t -> len(t) >= 3 AND NOT list_contains($stop, t)) AS f
       |  FROM documents),
       |pr AS (SELECT least(x.u, x.v) AS a, greatest(x.u, x.v) AS b
       |       FROM (SELECT unnest([{'u': f[i], 'v': f[i+1]}
       |                            FOR i IN generate_series(1, len(f) - 1)])
       |               AS x FROM ft)),
       |und AS (SELECT a, b, COUNT(*) AS w FROM pr WHERE a <> b GROUP BY 1, 2),
       |edges AS MATERIALIZED (
       |  SELECT src, dst, w, SUM(w) OVER (PARTITION BY src) AS outw FROM (
       |    SELECT a AS src, b AS dst, w FROM und
       |    UNION ALL SELECT b, a, w FROM und)),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS tok FROM edges),
       |base AS (SELECT (CAST(1000000000 AS BIGINT) * 15 // 100)
       |           // greatest(COUNT(*), 1) AS b FROM nodes),
       |r0 AS (SELECT tok, CAST(1000000000 AS BIGINT)
       |         // greatest((SELECT COUNT(*) FROM nodes), 1) AS r
       |       FROM nodes),
       |$steps
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY r DESC, tok) AS BIGINT)
       |    AS rank,
       |  tok, CAST(r AS BIGINT) AS r_nano
       |FROM r5 ORDER BY r DESC, tok LIMIT 30""".stripMargin
  }

  def textLengthBand(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.lengthBand(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  val textLengthBandSql: String =
    """WITH lengths AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |hist AS (SELECT n_tokens, count(*) AS cnt FROM lengths GROUP BY 1),
      |cum AS (
      |  SELECT n_tokens, cnt,
      |    SUM(cnt) OVER (ORDER BY n_tokens ROWS UNBOUNDED PRECEDING) AS cum_le
      |  FROM hist),
      |tot AS (SELECT count(*) AS total FROM lengths),
      |kept AS (
      |  SELECT n_tokens FROM cum, tot
      |  WHERE cum_le * 100 > total * 5 AND (cum_le - cnt) * 100 < total * 95)
      |SELECT doc_id, n_tokens FROM lengths
      |WHERE n_tokens IN (SELECT n_tokens FROM kept)
      |ORDER BY doc_id""".stripMargin

  def textQualityFloor(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.qualityFloor(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  /** Oracle replays the quantized score (identical arithmetic to
    * [[textQualitySql]], then floor(round(q,9)·10000)), the per-lang
    * histogram cumsum, and the all-integer boundary rule. */
  val textQualityFloorSql: String = {
    val stop = TextAnalysis.markers.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks, text
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, lang,
      |    CAST(floor(round(
      |      least(len(toks) / 100.0, 1.0) * 0.4
      |      + least((len(list_filter(toks, x -> list_contains(STOPLIST, x))) * 10.0) / len(toks), 1.0) * 0.4
      |      + (1.0 - (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) / CAST(length(text) AS DOUBLE)) * 0.2
      |    , 9) * 10000) AS BIGINT) AS qb
      |  FROM t),
      |hist AS (SELECT lang, qb, count(*) AS cnt FROM scored GROUP BY 1, 2),
      |cum AS (
      |  SELECT lang, qb, cnt,
      |    SUM(cnt) OVER (PARTITION BY lang ORDER BY qb
      |                   ROWS UNBOUNDED PRECEDING) AS cum_le
      |  FROM hist),
      |tot AS (SELECT lang, count(*) AS total FROM scored GROUP BY 1),
      |kept AS (
      |  SELECT c.lang, c.qb FROM cum c JOIN tot USING (lang)
      |  WHERE cum_le * 100 > total * 25)
      |SELECT doc_id, s.lang, s.qb FROM scored s
      |JOIN kept k ON s.lang = k.lang AND s.qb = k.qb
      |ORDER BY doc_id""".stripMargin.replace("STOPLIST", stop)
  }

  def textTokenRarity(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.tokenRarity(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  val textTokenRaritySql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1)
      |SELECT doc_id,
      |  CAST(sum(n) AS BIGINT) AS freq_sum,
      |  count(*) AS n_tokens,
      |  round(CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) / count(*), 9)
      |    AS mean_freq9
      |FROM toks JOIN vocab USING (tok)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Data-mixture report: the per-source composition table a pipeline
    * publishes before a training run — counts, token mass, language
    * spread, corpus share. One aggregate over the scan plus a broadcast of
    * the single-row total; integer sums keep it engine-exact. */
  def textMixtureReport(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val perSource = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      countDistinct(col("lang")).as("n_langs"))
    val tot = docs.agg(count(lit(1)).as("total"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("n_langs"),
        round(col("n_docs").cast("double") / col("total"), 9).as("share9"))
      .orderBy(col("source"))
  }

  val textMixtureReportSql: String =
    """WITH t AS (SELECT count(*) AS total FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  round(CAST(count(*) AS DOUBLE) / any_value(t.total), 9) AS share9
      |FROM documents CROSS JOIN t
      |GROUP BY source ORDER BY source""".stripMargin

  def textVocab(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.vocabulary(Tables.documents(spark, sfDir), k = 100)
      .orderBy(col("rank"))

  val textVocabSql: String =
    """SELECT rank, tok, n FROM (
      |  SELECT tok, COUNT(*) AS n,
      |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS BIGINT) AS rank
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok)
      |WHERE rank <= 100 ORDER BY rank""".stripMargin

  /** Zipf slope — the integer least-squares path replayed by
    * [[TextAnalysis.zipfSlopeSql]]. */
  def textZipf(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.zipfSlope(Tables.documents(spark, sfDir))

  /** PII scrub over documents with deterministic synthetic PII injected
    * first (the fixture corpus is clean): both engines build the identical
    * dirty text, scrub with the same portable patterns, and the full
    * redacted string rides in the hash. */
  def textRedactPii(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = Tables.documents(spark, sfDir).select(col("doc_id"),
      concat(col("text"),
        lit(" contact_"), col("doc_id"), lit("@mail.example.org or "),
        lit("212-555-"),
        lpad(pmod(col("doc_id") * 7919, lit(10000)).cast("string"), 4, "0"))
        .as("text"))
    TextAnalysis.redactPii(dirty).orderBy(col("doc_id"))
  }

  val textRedactPiiSql: String =
    """WITH dirty AS (
      |  SELECT doc_id,
      |    text || ' contact_' || CAST(doc_id AS VARCHAR) ||
      |    '@mail.example.org or 212-555-' ||
      |    lpad(CAST((doc_id * 7919) % 10000 AS VARCHAR), 4, '0') AS text
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '[0-9]{3}-555-[0-9]{4}', '<PHONE>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(text,
      |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |     + len(regexp_extract_all(text, '[0-9]{3}-555-[0-9]{4}'))
      |    AS BIGINT) AS n_redactions
      |FROM dirty ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition filters over the documents table; the oracle
    * replays the non-distinct bigram explosion, the arg-max with
    * lexicographic tie-break, and the integer/integer IEEE divisions. */
  def textRepetition(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.repetitionStats(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  val textRepetitionSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
      |        FOR i IN generate_series(1, greatest(len(t)-1, 1))]) AS g
      |      FROM toks),
      |c AS (SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY 1, 2),
      |p AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
      |        max(cnt) AS topc,
      |        CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT) AS dup
      |      FROM c GROUP BY 1),
      |tg AS (SELECT c.doc_id, min(c.g) AS top_gram
      |       FROM c JOIN p ON c.doc_id = p.doc_id AND c.cnt = p.topc
      |       GROUP BY 1)
      |SELECT p.doc_id, p.n_grams, tg.top_gram,
      |  p.topc / p.n_grams AS top_frac,
      |  p.dup / p.n_grams AS dup_frac,
      |  p.topc / p.n_grams <= 0.08 AND p.dup / p.n_grams <= 0.12 AS keep
      |FROM p JOIN tg ON p.doc_id = tg.doc_id
      |ORDER BY p.doc_id""".stripMargin

  /** Overlapping chunking over the documents table (chunk 32 / overlap 8 so
    * the fixture's 8-110-token docs produce multi-chunk output); the oracle
    * replays the ceil-division chunk count and the inclusive-slice windows. */
  def textChunk(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.chunk(Tables.documents(spark, sfDir),
      chunkTokens = 32, overlap = 8)
      .orderBy(col("doc_id"), col("chunk_id"))

  val textChunkSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |ch AS (SELECT doc_id, t, len(t) AS n,
      |         unnest(generate_series(0, (greatest(len(t)-8, 1)+23)//24 - 1)) AS i
      |       FROM toks)
      |SELECT doc_id, i AS chunk_id, i*24 AS start_tok,
      |  least(32, n - i*24) AS n_chunk_tokens,
      |  array_to_string(t[i*24+1 : i*24+32], ' ') AS chunk_text
      |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  /** TF-IDF top-3 terms per document; the oracle replays the smoothed idf,
    * the 9-dp double rounding, and the rank tie-break exactly. */
  def textTfidf(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"), col("rank"))

  val textTfidfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tfc AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT tok, count(*) AS df FROM tfc GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |s AS (SELECT doc_id, tfc.tok AS tok,
      |        round(tf * round(ln((n_docs + 1.0) / (df + 1.0)) + 1.0, 9), 9)
      |          AS score
      |      FROM tfc JOIN df USING (tok) CROSS JOIN n),
      |r AS (SELECT doc_id, tok, score,
      |        CAST(row_number() OVER (
      |          PARTITION BY doc_id ORDER BY score DESC, tok) AS BIGINT)
      |          AS rank
      |      FROM s)
      |SELECT doc_id, tok, rank, score FROM r WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** Sequence packing over the documents table (seqLen 512 so shard
    * streams span many sequences at sf0.01); the oracle replays the shard
    * hash, the running token sum, and the integer div/mod exactly. */
  def textPackSequences(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.packSequences(Tables.documents(spark, sfDir), seqLen = 512)
      .orderBy(col("doc_id"))

  val textPackSequencesSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    (${splitBucketSql("doc_id")}) % 8 AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, shard, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      - n_tokens AS pack_start
       |  FROM t)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
       |  pack_start // 512 AS seq_id,
       |  pack_start % 512 AS seq_offset
       |FROM c ORDER BY doc_id""".stripMargin

  /** Heavy hitters through the scale path (sample candidacy + exact counts
    * on candidates + CMS bound checks); the oracle is the plain exact
    * top-k, so a candidate-generation miss or a violated sketch bound both
    * break the hash. */
  def textHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.heavyHitters(Tables.documents(spark, sfDir), k = 5)
      .orderBy(col("rank"))

  val textHeavyHittersSql: String =
    """SELECT rank, tok, n, TRUE AS est_ok_lower, TRUE AS est_ok_upper FROM (
      |  SELECT tok, COUNT(*) AS n,
      |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS BIGINT) AS rank
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok)
      |WHERE rank <= 5 ORDER BY rank""".stripMargin

  def textBigrams(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.bigrams(Tables.documents(spark, sfDir), k = 50)
      .orderBy(col("rank"))

  val textBigramsSql: String =
    """SELECT rank, bg, n FROM (
      |  SELECT bg, COUNT(*) AS n,
      |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bg) AS BIGINT) AS rank
      |  FROM (
      |    SELECT unnest([t[i] || ' ' || t[i+1]
      |                   FOR i IN generate_series(1, len(t) - 1)]) AS bg
      |    FROM (SELECT string_split(text, ' ') AS t FROM documents))
      |  GROUP BY bg)
      |WHERE rank <= 50 ORDER BY rank""".stripMargin

  def textBpeMerges(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.bpeMergePairs(Tables.documents(spark, sfDir), k = 20)
      .orderBy(col("rank"))

  val textBpeMergesSql: String =
    """WITH words AS (
      |  SELECT w AS word, COUNT(*) AS freq FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) >= 2 GROUP BY 1),
      |pairs AS (
      |  SELECT freq,
      |    unnest([substring(word, i, 2)
      |            FOR i IN generate_series(1, length(word)-1)]) AS pair
      |  FROM words)
      |SELECT rank, pair, n FROM (
      |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS n,
      |    CAST(ROW_NUMBER() OVER (ORDER BY SUM(freq) DESC, pair) AS BIGINT)
      |      AS rank
      |  FROM pairs GROUP BY pair)
      |WHERE rank <= 20 ORDER BY rank""".stripMargin

  /** Decontamination screen: docs with id < 20 act as the held-out
    * benchmark set; every other document reports its shingle-overlap share
    * against them. */
  def textContamination(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.contamination(Tables.documents(spark, sfDir),
      col("doc_id") < 20)
      .orderBy(col("doc_id"))

  val textContaminationSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([array_to_string(t[i:i+4], ' ')
      |            FOR i IN generate_series(1, greatest(len(t)-4, 1))]) AS s
      |  FROM toks),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20),
      |train AS (SELECT doc_id, s FROM sh WHERE NOT doc_id < 20),
      |tot AS (SELECT doc_id, count(*) AS n_sh FROM train GROUP BY 1),
      |hit AS (
      |  SELECT doc_id, count(*) AS n_hit FROM train
      |  WHERE s IN (SELECT s FROM bench) GROUP BY 1)
      |SELECT t.doc_id, n_sh,
      |  CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
      |  COALESCE(n_hit, 0) / CAST(n_sh AS DOUBLE) AS contamination
      |FROM tot t LEFT JOIN hit USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Bloom-prefiltered contamination (same doc<20 benchmark split as
    * [[textContamination]]); the oracle's bloom-free exact counts double
    * as the no-false-negatives proof. */
  def textContaminationBloom(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.contaminationBloom(Tables.documents(spark, sfDir),
      col("doc_id") < 20)
      .orderBy(col("doc_id"))

  val textContaminationBloomSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([array_to_string(t[i:i+4], ' ')
      |            FOR i IN generate_series(1, greatest(len(t)-4, 1))]) AS s
      |  FROM toks),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20),
      |train AS (SELECT doc_id, s FROM sh WHERE NOT doc_id < 20),
      |tot AS (SELECT doc_id, count(*) AS n_sh FROM train GROUP BY 1),
      |hit AS (
      |  SELECT doc_id, count(*) AS n_exact FROM train
      |  WHERE s IN (SELECT s FROM bench) GROUP BY 1)
      |SELECT t.doc_id, n_sh,
      |  CAST(COALESCE(n_exact, 0) AS BIGINT) AS n_exact
      |FROM tot t LEFT JOIN hit USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  def textFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.fingerprints(Tables.documents(spark, sfDir)).orderBy(col("doc_id"))

  val textFingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      [CAST(unicode(c) AS BIGINT) FOR c IN string_split(text, '')]),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** BM25 query-term set shared by the Spark plan and the oracle: all
    * three occur in the fixture vocabulary with distinct df, so the idf
    * spread is non-trivial. */
  private val bm25Terms = Seq("spark", "join", "window")

  /** BM25 top-20 retrieval; the oracle replays the 9-dp idf rounding and
    * the nano-unit integer per-document sum exactly. */
  def textBm25(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.bm25TopK(Tables.documents(spark, sfDir), bm25Terms)
      .orderBy(col("rank"))

  val textBm25Sql: String = TextAnalysis.bm25TopKSql(bm25Terms)

  /** Corpus-unigram LM score per document (perplexity-proxy quality
    * signal); all cross-row sums run over exact nano-unit integers. */
  def textUnigramLp(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.unigramLogProb(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  val textUnigramLpSql: String = TextAnalysis.unigramLogProbSql

  /** DSIR importance weights toward the English subset; the hashed-bucket
    * LMs and nano-unit log-ratio sums replay exactly in the oracle. */
  def textDsir(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.dsirWeights(Tables.documents(spark, sfDir),
      col("lang") === "en").orderBy(col("doc_id"))

  val textDsirSql: String = TextAnalysis.dsirWeightsSql()

  /** Naive-Bayes language self-classification confusion matrix; training
    * counts, smoothing grid, priors, and the integer argmax all replay
    * exactly in the oracle. */
  def textNbConfusion(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.naiveBayesConfusion(Tables.documents(spark, sfDir))
      .orderBy(col("label"), col("pred"))

  val textNbConfusionSql: String = TextAnalysis.naiveBayesConfusionSql()

  /** PMI top-20 collocations at minCount 5; the oracle replays the single
    * 9-dp-rounded ln and the rank tie-break exactly. */
  def textPmi(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.pmiTopK(Tables.documents(spark, sfDir))
      .orderBy(col("rank"))

  val textPmiSql: String = TextAnalysis.pmiTopKSql()

  /** Per-source unigram KL divergence (domain-skew report); nano-unit
    * integer per-source sums. */
  def textDomainKl(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.domainKl(Tables.documents(spark, sfDir))
      .orderBy(col("source"))

  val textDomainKlSql: String = TextAnalysis.domainKlSql

  /** A-ES weighted sample, top-20 by `n_chars` weight; the oracle replays
    * the splitmix64 uniform and the ln(u)/w key exactly. */
  def textWeightedSample(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.weightedSample(Tables.documents(spark, sfDir))
      .orderBy(col("rank"))

  val textWeightedSampleSql: String = OracleSql.weightedSampleSql

  /** Corpus-derived stopwords at the 50% document-frequency threshold. */
  def textStopwords(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.stopwords(Tables.documents(spark, sfDir))

  val textStopwordsSql: String = TextAnalysis.stopwordsSql

  def textEntropy(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.tokenEntropy(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  val textEntropySql: String = TextAnalysis.tokenEntropySql

  def textBigramLm(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.bigramLm(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  val textBigramLmSql: String = TextAnalysis.bigramLmSql

  def textGopherRules(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.gopherRules(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"))

  val textGopherRulesSql: String = TextAnalysis.gopherRulesSql

  /** Nearest-class-mean confusion matrix over the labeled embeddings. */
  def simCentroidClassify(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.centroidClassify(Tables.embeddings(spark, sfDir))
      .orderBy(col("label"), col("pred"))

  val simCentroidClassifySql: String = Similarity.centroidClassifySql(dim = 64)
}
