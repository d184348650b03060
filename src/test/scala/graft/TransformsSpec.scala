package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

class TransformsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](t: Transform, v: Any, dt: DataType): Any = {
    val df = Seq(Tuple1("x")).toDF("dummy")
      .select(lit(v).cast(dt).as("c"))
    df.select(t(col("c"), dt)).collect()(0).get(0)
  }

  val ts = Timestamp.valueOf("2024-03-07 15:42:11")

  test("identity passes through") {
    assert(one(Transform.Identity, 42L, LongType) == 42L)
  }
  test("day extracts the date") {
    assert(one(Transform.Day, ts, TimestampType).toString == "2024-03-07")
  }
  test("month renders yyyy-MM") {
    assert(one(Transform.Month, ts, TimestampType) == "2024-03")
  }
  test("year extracts year int") {
    assert(one(Transform.Year, ts, TimestampType) == 2024)
  }
  test("hour renders yyyy-MM-dd-HH") {
    assert(one(Transform.Hour, ts, TimestampType) == "2024-03-07-15")
  }
  test("truncate int rounds toward negative infinity (Iceberg semantics)") {
    assert(one(Transform.Truncate(10), 17L, LongType) == 10L)
    assert(one(Transform.Truncate(10), -7L, LongType) == -10L)
    assert(one(Transform.Truncate(10), -10L, LongType) == -10L)
  }
  test("truncate string takes a prefix") {
    assert(one(Transform.Truncate(3), "purchase", StringType) == "pur")
    assert(one(Transform.Truncate(3), "ab", StringType) == "ab")
  }
  test("bucket stays in range and is stable") {
    val vals = (0L until 1000L).toDF("c")
      .select(Transform.Bucket(16)(col("c"), LongType).as("b"))
      .collect().map(_.getInt(0))
    assert(vals.forall(b => b >= 0 && b < 16))
    assert(vals.distinct.length == 16)
    // stability: same input → same bucket across evaluations
    assert(one(Transform.Bucket(16), 42L, LongType) ==
      one(Transform.Bucket(16), 42L, LongType))
  }
  test("void yields null") {
    assert(one(Transform.Void, 42L, LongType) == null)
  }
  test("parse round-trips spec strings") {
    assert(Transform.parse("identity") == Transform.Identity)
    assert(Transform.parse("bucket[16]") == Transform.Bucket(16))
    assert(Transform.parse("truncate[4]") == Transform.Truncate(4))
    assert(Transform.parse("day") == Transform.Day)
    intercept[IllegalArgumentException](Transform.parse("nope"))
  }
  test("temporal transforms over TIMESTAMP are pinned to UTC — the " +
    "session timezone never shifts the derived partition value") {
    // 2024-03-07T20:30:00Z reads as 2024-03-08 on a Tokyo wall clock; the
    // Iceberg contract (and write/prune parity ACROSS sessions) requires
    // the UTC calendar fields regardless of spark.sql.session.timeZone —
    // otherwise a writer and a pruning reader in different zones disagree
    // on which directory a row lives in and pruning can skip real rows.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    def derived(tz: String): (String, String, Int, String, String) = {
      spark.conf.set("spark.sql.session.timeZone", tz)
      val df = Seq(Tuple1("x")).toDF("dummy")
        .select(lit("2024-03-07T20:30:00Z").cast(TimestampType).as("c"),
          lit("1969-12-31T23:30:00Z").cast(TimestampType).as("p"))
      val r = df.select(
        Transform.Day(col("c"), TimestampType).cast("string"),
        Transform.Month(col("c"), TimestampType),
        Transform.Year(col("c"), TimestampType),
        Transform.Hour(col("c"), TimestampType),
        Transform.Day(col("p"), TimestampType).cast("string")).collect()(0)
      (r.getString(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getString(4))
    }
    try {
      val utc = derived("UTC")
      assert(utc == ("2024-03-07", "2024-03", 2024, "2024-03-07-20",
        "1969-12-31"), s"UTC derivation wrong: $utc")
      assert(derived("Asia/Tokyo") == utc,
        "a UTC+9 session must derive the same UTC partition values")
      assert(derived("America/Los_Angeles") == utc,
        "a UTC-8 session must derive the same UTC partition values")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("partition field names derived columns") {
    assert(PartitionField("ts", Transform.Day).columnName == "ts_day")
    assert(PartitionField("event_type", Transform.Identity).columnName == "event_type")
    assert(PartitionField("ts", Transform.Day, Some("event_date")).columnName == "event_date")
  }
}
