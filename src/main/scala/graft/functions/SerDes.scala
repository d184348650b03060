package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SerDe layer (reference: operators.py:87-260).
  *
  * The reference's SerDes are per-record Python callables; here each is a
  * declarative DataFrame→DataFrame transform built from codegen'd built-ins
  * (`to_json`/`from_json`/`cast`/`base64`), so Catalyst fuses the whole
  * serde into the surrounding stage instead of paying N per-record function
  * hops (SURVEY.md §3.2).
  */
trait SerDe {
  def serialize(df: DataFrame): DataFrame
  def deserialize(df: DataFrame): DataFrame

  /** The single payload column whose NULL signals a per-record serde
    * failure (the declarative analogue of the reference's caught
    * exception), or None when this serde cannot fail per record. */
  def payloadColumn: Option[String] = None
}

/** JSON SerDe (reference: operators.py:102-153).
  * serialize: all columns → one JSON string column `jsonField`.
  * deserialize: parse `jsonField` back into typed columns via `schema`;
  * unparseable input yields NULLs, which [[Ops.errorSplit]] routes to the
  * error stream (the analogue of the reference's ValueError path,
  * operators.py:151-153).
  */
final case class JsonSerDe(
    jsonField: String = "json_data",          // operators.py:132
    schema: Option[StructType] = None) extends SerDe {

  def serialize(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as(jsonField))

  def deserialize(df: DataFrame): DataFrame = {
    val s = schema.getOrElse(throw new IllegalArgumentException(
      "JsonSerDe.deserialize requires a schema (static schemas only, README.md:68)"))
    df.withColumn("_parsed", from_json(col(jsonField), s))
      .select(col("_parsed.*"))
  }

  override def payloadColumn: Option[String] = Some(jsonField)
}

/** Parquet-compat coercion SerDe (reference: operators.py:156-210).
  * Coercion rules per S3: atomic types pass through; struct/array/map
  * columns → JSON strings (the reference stores complex values as JSON in
  * VARCHAR columns, operators.py:197-199); anything else → string cast.
  * deserialize is the identity (operators.py:208-210).
  */
case object ParquetSerDe extends SerDe {
  def coerceColumn(c: Column, dt: DataType): Column = dt match {
    case _: StructType | _: ArrayType | _: MapType => to_json(c)
    case _: NumericType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType | BinaryType => c
    case _ => c.cast(StringType)
  }

  def serialize(df: DataFrame): DataFrame =
    df.select(df.schema.fields.toSeq.map(f =>
      coerceColumn(col(f.name), f.dataType).as(f.name)): _*)

  def deserialize(df: DataFrame): DataFrame = df
}

/** Opaque-blob SerDe — the analogue of the reference's PickleSerDe
  * (operators.py:213-249: base64(pickle(record)) + a "type" tag). Pickle is
  * Python-specific; the Spark-native equivalent carries the record as
  * base64(utf-8(json)) so it stays language-neutral and round-trips through
  * string columns. Marked low-priority by the reference itself
  * ("use with caution", operators.py:221,260).
  */
final case class BlobSerDe(
    blobField: String = "pickle_data",
    schema: Option[StructType] = None) extends SerDe {

  def serialize(df: DataFrame): DataFrame =
    df.select(
      base64(encode(to_json(struct(df.columns.map(col).toSeq: _*)), "UTF-8"))
        .as(blobField),
      lit("b64json").as("type"))                // operators.py:240 "type": "pickle"

  def deserialize(df: DataFrame): DataFrame = {
    val s = schema.getOrElse(throw new IllegalArgumentException(
      "BlobSerDe.deserialize requires a schema"))
    df.withColumn("_parsed", from_json(decode(unbase64(col(blobField)), "UTF-8"), s))
      .select(col("_parsed.*"))
  }

  override def payloadColumn: Option[String] = Some(blobField)
}
