package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hidden-partitioning transform library.
  *
  * The reference's richest query semantics is Iceberg hidden partitioning:
  * records carry only source columns and the sink derives partition values by
  * applying the table partition spec's transforms at write time
  * (reference: connector.py:285-323, README.md:141-155). Here each transform
  * is a plain `Column -> Column` function over Spark built-in expressions —
  * fully codegen'd, no UDFs, no custom Catalyst nodes needed (SURVEY.md §4.3).
  *
  * Semantics per transform (reference: README.md:150-155, pyiceberg set):
  *  - identity    → the column itself
  *  - year        → 4-digit year int
  *  - month       → "yyyy-MM" string (human-readable partition dir value)
  *  - day         → DATE
  *  - hour        → "yyyy-MM-dd-HH" string
  *  - bucket[N]   → pmod(murmur3(col), N) — same hash family as Iceberg's
  *                  bucket; not bit-compatible with pyiceberg (documented)
  *  - truncate[W] → strings: first W chars; integral: round down to multiple
  *                  of W (Iceberg semantics: v - (((v % W) + W) % W))
  *  - void        → NULL
  */
sealed trait Transform {
  def name: String

  /** Derived partition expression for a source column of type `dt`. */
  def apply(c: Column, dt: DataType): Column
}

object Transform {

  // Temporal transforms over TIMESTAMP are defined on UTC (the Iceberg
  // spec fixes partition transforms to UTC so a table's layout never
  // depends on who wrote it): the instant's epoch micros are floored to
  // the UTC day/hour by EXACT integer arithmetic — pmod keeps the floor
  // exact for pre-1970 instants — and calendar fields come from the
  // resulting DATE (timezone-free). Without this, `date_format`/`to_date`
  // derive in the SESSION timezone: a writer in UTC+9 and a reader in UTC
  // would disagree on which day a row belongs to, so directory values and
  // prune bounds drift apart and hidden-partition pruning can skip a
  // directory that contains matching rows. DATE/STRING sources carry no
  // timezone and keep the plain calendar functions.
  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** UTC calendar date of a TIMESTAMP column, session-timezone-free. */
  private[graft] def utcDate(c: Column): Column = {
    val us = unix_micros(c)
    val epochDay = (us - pmod(us, lit(MicrosPerDay))) / lit(MicrosPerDay)
    date_add(lit(java.sql.Date.valueOf("1970-01-01")), epochDay.cast("int"))
  }

  /** UTC hour-of-day (0-23) of a TIMESTAMP column. */
  private[graft] def utcHourOfDay(c: Column): Column =
    floor(pmod(unix_micros(c), lit(MicrosPerDay)) / lit(MicrosPerHour))
      .cast("int")

  case object Identity extends Transform {
    val name = "identity"
    def apply(c: Column, dt: DataType): Column = c
  }
  case object Year extends Transform {
    val name = "year"
    def apply(c: Column, dt: DataType): Column = dt match {
      case TimestampType => year(utcDate(c))
      case _ => year(c)
    }
  }
  case object Month extends Transform {
    val name = "month"
    def apply(c: Column, dt: DataType): Column = dt match {
      case TimestampType => date_format(utcDate(c), "yyyy-MM")
      case _ => date_format(c, "yyyy-MM")
    }
  }
  case object Day extends Transform {
    val name = "day"
    def apply(c: Column, dt: DataType): Column = dt match {
      case TimestampType => utcDate(c)
      case _ => to_date(c)
    }
  }
  case object Hour extends Transform {
    val name = "hour"
    def apply(c: Column, dt: DataType): Column = dt match {
      case TimestampType =>
        concat(date_format(utcDate(c), "yyyy-MM-dd"), lit("-"),
          lpad(utcHourOfDay(c).cast("string"), 2, "0"))
      case _ => date_format(c, "yyyy-MM-dd-HH")
    }
  }
  final case class Bucket(n: Int) extends Transform {
    require(n > 0, s"bucket width must be positive, got $n")
    val name = s"bucket_$n"
    def apply(c: Column, dt: DataType): Column = pmod(hash(c), lit(n))
  }
  final case class Truncate(w: Int) extends Transform {
    require(w > 0, s"truncate width must be positive, got $w")
    val name = s"trunc_$w"
    def apply(c: Column, dt: DataType): Column = dt match {
      case StringType => substring(c, 1, w)
      case ByteType | ShortType | IntegerType | LongType =>
        c - pmod(c, lit(w))
      case other => throw new IllegalArgumentException(
        s"truncate[$w] unsupported for type $other (reference supports string/int)")
    }
  }
  case object Void extends Transform {
    val name = "void"
    def apply(c: Column, dt: DataType): Column = lit(null).cast(StringType)
  }

  /** Inverse of [[parse]]: the spec-string form a config sidecar persists
    * (`name` is display-oriented — `bucket_16` — and not parseable). */
  def render(t: Transform): String = t match {
    case Bucket(n) => s"bucket[$n]"
    case Truncate(w) => s"truncate[$w]"
    case other => other.name
  }

  /** Parse a transform spec string ("identity", "day", "bucket[16]", ...),
    * mirroring the reference's named-spec construction (README.md:90-93). */
  def parse(s: String): Transform = {
    val B = """bucket\[(\d+)\]""".r
    val T = """truncate\[(\d+)\]""".r
    s.trim.toLowerCase match {
      case "identity" => Identity
      case "year" => Year
      case "month" => Month
      case "day" => Day
      case "hour" => Hour
      case B(n) => Bucket(n.toInt)
      case T(w) => Truncate(w.toInt)
      case "void" => Void
      case other => throw new IllegalArgumentException(s"unknown transform: $other")
    }
  }
}

/** One field of a partition spec: a source column + transform (+ optional
  * explicit partition-column name). Mirrors the reference's spec fields that
  * resolve source columns by field id (connector.py:292-301); Spark's
  * analyzer resolves by name instead.
  */
final case class PartitionField(
    source: String,
    transform: Transform,
    explicitName: Option[String] = None) {
  def columnName: String = explicitName.getOrElse(transform match {
    case Transform.Identity => source
    case t => s"${source}_${t.name}"
  })
}
