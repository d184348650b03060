package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ok/err result pair (reference: `IcebergOpOut`, operators.py:58-84 — a
  * Pydantic model holding two Streams; here a plain case class holding two
  * DataFrames produced by filtering one shared tagged plan, the Catalyst
  * equivalent of `op.branch`).
  */
final case class OpOut(oks: DataFrame, errs: DataFrame)

/** Dataflow operator layer (reference: operators.py O1-O5, SURVEY.md §2.1).
  *
  * Error-handling model: instead of per-record try/except, operators tag an
  * `error STRING` column (NULL = ok) computed declaratively; [[errorSplit]]
  * then produces the ok/err pair with two filters over the same logical
  * plan. Catalyst pushes both filters into one whole-stage-codegen'd scan —
  * at 100 TB this is one pass over the data, not two.
  */
object Ops {
  val ErrorCol = "error"

  /** O5 `_iceberg_error_split` (operators.py:263-287): partition a tagged
    * stream into oks (error IS NULL, tag dropped) and errs. */
  def errorSplit(tagged: DataFrame): OpOut = OpOut(
    oks = tagged.filter(col(ErrorCol).isNull).drop(ErrorCol),
    errs = tagged.filter(col(ErrorCol).isNotNull))

  /** O2 `validate_schema` (operators.py:354-426): run a validation predicate
    * per record; invalid records go to the error stream carrying the message
    * (reference tags `IcebergError(error=..., record=...)`,
    * operators.py:417-423 — here the full record rides along + `error`).
    */
  def validateSchema(df: DataFrame, predicate: Column,
      message: String = "Invalid record format"): OpOut =
    errorSplit(df.withColumn(ErrorCol,
      when(predicate, lit(null).cast(StringType)).otherwise(lit(message))))

  /** CHECK-constraint split — the value-level extension of
    * [[validateSchema]] (§3.3) and the routing twin of
    * [[graft.SinkConfig.checkConstraints]]'s refuse-at-the-sink
    * enforcement: every named boolean constraint is evaluated per row in
    * ONE pass; rows violating any go to the error stream with `error` =
    * the comma-joined names of every violated constraint (so a triage
    * query can group by failure signature). NULL proves nothing → counts
    * as a violation, same as the sink. */
  def checkConstraints(df: DataFrame,
      constraints: Seq[(String, String)]): OpOut = {
    require(constraints.nonEmpty, "checkConstraints needs at least one")
    val failed = array(constraints.map { case (name, e) =>
      when(!coalesce(expr(e), lit(false)), lit(name))
    }: _*)
    errorSplit(df.withColumn(ErrorCol, {
      val names = array_compact(failed)
      when(size(names) === 0, lit(null).cast(StringType))
        .otherwise(concat_ws(",", names))
    }))
  }

  /** O1 `serialize_records` (operators.py:290-351): map each record through
    * a SerDe; records the serde could not handle (NULL serialized output
    * from a non-NULL input — the declarative analogue of the reference's
    * caught exception, operators.py:342-348) go to the error stream.
    *
    * `stampEventTimestamp=true` adds `event_timestamp` = wall-clock ms, the
    * reference's now-ms stamp (operators.py:331; models.py:64). Off in
    * oracle-checked queries (non-deterministic).
    */
  def serializeRecords(df: DataFrame, serde: SerDe = ParquetSerDe,
      stampEventTimestamp: Boolean = false): OpOut = {
    val serialized = serde.serialize(df)
    val stamped =
      if (stampEventTimestamp)
        serialized.withColumn("event_timestamp",
          (unix_micros(current_timestamp()) / 1000).cast(LongType))
      else serialized
    // Only a serde's designated payload column signals failure with NULL;
    // serdes without one (ParquetSerDe coercion) cannot fail per record,
    // and legitimately-NULL data columns are never misread as failures.
    val failed = serde.payloadColumn
      .map(c => col(c).isNull).getOrElse(lit(false))
    errorSplit(stamped.withColumn(ErrorCol,
      when(failed, lit("Serialization failed")).otherwise(lit(null).cast(StringType))))
  }

  /** O3 `enrich_with_metadata` (operators.py:494-553): add metadata columns.
    * The reference's canonical enricher adds processed_at + version
    * (operators.py:516-523); enrichments are declarative columns here so
    * they cannot fail per-record — errs is structurally empty but kept for
    * API parity with the reference's OpOut.
    */
  def enrichWithMetadata(df: DataFrame, enrichments: Seq[(String, Column)]): OpOut = {
    val enriched = enrichments.foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }
    errorSplit(enriched.withColumn(ErrorCol, lit(null).cast(StringType)))
  }

  /** Default enricher (reference example: operators.py:516-523). */
  def defaultEnrichments(version: String = "1.0.0"): Seq[(String, Column)] = Seq(
    "processed_at" -> current_timestamp(),
    "pipeline_version" -> lit(version))

  /** O4/K5 input coercion `_ensure_iceberg_message` (operators.py:470-483;
    * connector.py:159-168): a bare scalar column becomes `{"value": item}`;
    * an already-structured record passes through.
    */
  def ensureMessage(df: DataFrame): DataFrame = df.schema.fields match {
    case Array(f) if !f.dataType.isInstanceOf[StructType] =>
      df.select(col(f.name).as("value"))
    case _ => df
  }

  /** `op.inspect` error-logging parity (reference: operators.py:33,
    * connector.py:65-66 — a per-record logger on the err stream). Driver-side
    * per-record logging does not scale; the Spark-native form is an
    * `observe()` metric: the error count (and a bounded sample of messages)
    * surfaces on the driver per action / micro-batch with zero extra passes
    * over the data. Metrics stay bounded (count + one sample), so a 100 TB
    * err stream cannot blow the aggregation buffer the way an unbounded
    * collect would.
    */
  def inspectErrors(errs: DataFrame, name: String = "graft_errors"): DataFrame =
    errs.observe(name,
      count(lit(1)).as("n_errors"),
      first(col(ErrorCol), ignoreNulls = true).as("sample_error"))

  /** Same, with a driver-side [[org.apache.spark.sql.Observation]] handle
    * for synchronous metric retrieval after an action. */
  def inspectErrors(errs: DataFrame,
      obs: org.apache.spark.sql.Observation): DataFrame =
    errs.observe(obs,
      count(lit(1)).as("n_errors"),
      first(col(ErrorCol), ignoreNulls = true).as("sample_error"))
}
