package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest-side file-format breadth: JSON-lines and CSV sources with
  * declared schemas (static schemas only, matching the sink contract —
  * schema inference would re-scan the input and can silently widen types
  * between runs, which a reprocessing-stable pipeline cannot tolerate).
  *
  * The reference ingests Python dicts from Bytewax streams; the
  * interchange files a migrating user actually holds are JSONL and CSV
  * dumps, so these wrappers make them first-class inputs of the same
  * operator pipeline. Both readers are Spark built-ins: scans prune
  * columns, JSONL splits by line and CSV by row for parallel reads, and
  * both work unchanged under `readStream` for the streaming path.
  */
object TextSources {

  /** JSON-lines input (one JSON object per line). Rows that fail to parse
    * surface as all-null rows under the default PERMISSIVE mode; pipe them
    * through `Ops.validateSchema` for the ok/err split the reference's
    * serde path applies. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV input with declared schema.
    *
    * @param multiLine quoted fields may span lines (embedded newlines in
    *   text columns). Costs parallelism — a multiLine file cannot be
    *   split at arbitrary byte offsets, so each FILE becomes the split
    *   unit; write many files when round-tripping large text corpora. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("multiLine", multiLine.toString)
      .csv(path)
}
