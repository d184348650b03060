package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship end-to-end training-data pipeline: compose the engine's layers
  * the way a 100 TB corpus build would —
  *
  *   documents → validate (schema/emptiness) → quality score → filter
  *     → exact dedup survivor join → deterministic split assignment
  *     → per-language corpus stats → sink
  *
  * Everything is one declarative plan until the sink write: Catalyst fuses
  * the validation predicate, quality expression and dedup fingerprint into
  * the document scan, the survivor semi-join shuffles only (fp, doc_id)
  * pairs, and the final stats aggregate is map-side partial. The write
  * clusters by language via the hidden-partition spec, so a downstream
  * per-language read prunes to one directory.
  */
object PipelineE2E {

  val QualityThreshold = 0.5

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)

    // 1. validation split (reference O2 semantics: bad records routed out)
    val validated = Ops.validateSchema(docs,
      $"text".isNotNull && length($"text") > 0 && $"lang".isNotNull,
      "invalid document")

    // 2. quality scoring + filter — attached in-place, no self-join:
    // Catalyst keeps the whole predicate inside the document scan stage
    val scored = validated.oks
      .withColumn("quality", TextAnalysis.qualityExpr($"text"))
      .filter($"quality" >= QualityThreshold)

    // 3. exact dedup: keep the minimum doc_id per fingerprint
    val survivors = Dedup.exact(scored)
      .select($"keep_id".as("doc_id"))
    val deduped = scored.join(survivors, "doc_id")

    // 4. deterministic train-split assignment (THE shared splitBucket hash,
    // so flagship membership can never diverge from q_dataset_split), then
    // per-language corpus stats over the kept set
    // exact-decimal quality sum → order-independent, oracle-bit-identical avg
    val bucket = PipelineQueries.splitBucket($"doc_id")
    val stats = deduped
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        (sum($"quality".cast("decimal(28,15)")).cast("double") / count(lit(1)))
          .as("avg_quality"),
        sum(when(bucket < 90, 1L).otherwise(0L)).as("n_train"))

    // 5. sink: language-partitioned corpus table (hidden partitioning)
    val sink = new TableSink(SinkConfig(
      tableName = "corpus",
      warehousePath = s"/root/repo/target/tmp/pipeline_${java.util.UUID.randomUUID()}",
      numPartitions = 4,
      partitionSpec = Seq(PartitionField("lang", Transform.Identity)),
      sortOrder = Seq("doc_id")))
    sink.append(deduped.select($"doc_id", $"lang", $"source", $"n_chars", $"text"))

    // read the table back for the final stats — proves the sink round-trip
    sink.read(spark)
      .groupBy($"lang").agg(count(lit(1)).as("n_docs_sunk"))
      .join(stats, "lang")
      .select($"lang", $"n_docs", $"n_docs_sunk", $"total_chars",
        $"avg_quality", $"n_train")
      .orderBy($"lang")
  }

  val sql: String = {
    val stop = TextAnalysis.markers.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    """WITH q AS (
      |  SELECT doc_id, lang, n_chars,
      |    least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4
      |    + least((len(list_filter(string_split(text, ' '), t -> list_contains(STOPLIST, t))) * 10.0) / len(string_split(text, ' ')), 1.0) * 0.4
      |    + (1.0 - (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) / CAST(length(text) AS DOUBLE)) * 0.2 AS quality,
      |    md5(text) AS fp
      |  FROM documents
      |  WHERE text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL),
      |kept AS (
      |  SELECT * FROM q WHERE quality >= 0.5
      |    AND doc_id IN (SELECT MIN(doc_id) FROM q q2
      |                   WHERE q2.quality >= 0.5 GROUP BY q2.fp))
      |SELECT lang, COUNT(*) AS n_docs, COUNT(*) AS n_docs_sunk,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(CAST(quality AS DECIMAL(28,15))) AS DOUBLE) / COUNT(*) AS avg_quality,
      |  CAST(SUM(CASE WHEN SPLIT_BUCKET < 90
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_train
      |FROM kept GROUP BY lang ORDER BY lang""".stripMargin
      .replace("STOPLIST", stop)
      .replace("SPLIT_BUCKET", PipelineQueries.splitBucketSql("doc_id"))
  }
}
