package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("observeMetrics returns typed zeros on an empty input instead of NPE") {
    val empty = Tables.events(spark, TestSpark.sfDir).filter(lit(false))
    val m = ParityQueries.observeMetricsOf(empty).head()
    assert(m.getLong(0) == 0L)
    assert(m.getLong(1) == 0L)
    assert(m.getDouble(2) == 0.0)
  }

  test("validateSchema splits ok/err disjointly and completely") {
    val df = Seq((1, 50.0), (2, 150.0), (3, 99.9), (4, 100.0)).toDF("id", "v")
    val out = Ops.validateSchema(df, $"v" < 100, "too big")
    assert(out.oks.select("id").as[Int].collect().sorted.toSeq == Seq(1, 3))
    assert(out.errs.select("id").as[Int].collect().sorted.toSeq == Seq(2, 4))
    assert(out.errs.select(Ops.ErrorCol).as[String].collect().forall(_ == "too big"))
    assert(out.oks.columns.toSeq == Seq("id", "v")) // tag dropped on ok side
  }

  test("validateSchema split is a partition under random predicates (property)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.Test
    val prop = forAll { (xs: List[Int], threshold: Int) =>
      val df = xs.toDF("x")
      val out = Ops.validateSchema(df, $"x" < threshold, "err")
      val ok = out.oks.count()
      val err = out.errs.count()
      ok + err == xs.length && ok == xs.count(_ < threshold)
    }
    val res = Test.check(prop)(_.withMinSuccessfulTests(10))
    assert(res.passed, res.status.toString)
  }

  test("serializeRecords routes unparseable JSON to errs on deserialize") {
    val serde = JsonSerDe(schema = Some(StructType.fromDDL("a BIGINT")))
    val df = Seq("""{"a": 1}""", "not json", """{"a": 3}""").toDF("json_data")
    val parsed = serde.deserialize(df)
    val out = Ops.errorSplit(parsed.withColumn(Ops.ErrorCol,
      when($"a".isNull, "Serialization failed").otherwise(lit(null).cast(StringType))))
    assert(out.oks.count() == 2)
    assert(out.errs.count() == 1)
  }

  test("serializeRecords keeps all-NULL records ok under ParquetSerDe (cannot fail)") {
    val df = Seq((None: Option[Long], None: Option[String]),
      (Some(1L), Some("a"))).toDF("a", "b")
    val out = Ops.serializeRecords(df, ParquetSerDe)
    assert(out.oks.count() == 2, "all-NULL row is legitimate data, not a failure")
    assert(out.errs.count() == 0)
  }

  test("serializeRecords flags only the serde payload column as failure signal") {
    // BlobSerDe's constant 'type' column must not mask a NULL payload
    val serde = BlobSerDe()
    val ser = serde.serialize(Seq((1L, "x")).toDF("id", "name"))
      .withColumn("pickle_data", lit(null).cast("string")) // simulate failure
    val out = Ops.errorSplit(ser.withColumn(Ops.ErrorCol,
      when(col(serde.payloadColumn.get).isNull, "Serialization failed")
        .otherwise(lit(null).cast(StringType))))
    assert(out.errs.count() == 1)
  }

  test("json serde round-trips records") {
    val serde = JsonSerDe(schema = Some(StructType.fromDDL("id BIGINT, name STRING")))
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val back = serde.deserialize(serde.serialize(df))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("blob serde is the inverse of itself") {
    val serde = BlobSerDe(schema = Some(StructType.fromDDL("id BIGINT, name STRING")))
    val df = Seq((7L, "x")).toDF("id", "name")
    val ser = serde.serialize(df)
    assert(ser.columns.toSeq == Seq("pickle_data", "type"))
    assert(ser.select("type").as[String].head() == "b64json")
    val back = serde.deserialize(ser)
    assert(back.as[(Long, String)].head() == ((7L, "x")))
  }

  test("parquet serde coerces complex types to JSON strings, keeps atomics") {
    val df = Seq((1L, ("a", 2), Seq(1.5))).toDF("id", "st", "arr")
    val out = ParquetSerDe.serialize(df)
    val f = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(f("id") == LongType)
    assert(f("st") == StringType)
    assert(f("arr") == StringType)
    val row = out.orderBy("id").collect()(0)
    assert(row.getString(1).contains("\"_1\":\"a\""))
    assert(row.getString(2) == "[1.5]")
  }

  test("ensureMessage wraps bare scalar streams as value records") {
    val bare = Seq(1, 2, 3).toDF("whatever")
    assert(Ops.ensureMessage(bare).columns.toSeq == Seq("value"))
    val already = Seq((1, "a")).toDF("id", "name")
    assert(Ops.ensureMessage(already).columns.toSeq == Seq("id", "name"))
  }

  test("inspectErrors surfaces error count and samples via observe") {
    val df = Seq((1, 50.0), (2, 150.0), (3, 200.0)).toDF("id", "v")
    val out = Ops.validateSchema(df, $"v" < 100, "too big")
    val obs = org.apache.spark.sql.Observation()
    Ops.inspectErrors(out.errs, obs).collect()
    assert(obs.get("n_errors") == 2L)
    assert(obs.get("sample_error") == "too big")
  }

  test("enrichWithMetadata adds columns and keeps all rows ok") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val out = Ops.enrichWithMetadata(df, Seq("v" -> lit("1.0")))
    assert(out.oks.columns.toSeq == Seq("id", "name", "v"))
    assert(out.oks.count() == 2 && out.errs.count() == 0)
  }

  test("pivotDaily: per-type columns sum back to the day's event count") {
    val df = ParityQueries.pivotDaily(spark, TestSpark.sfDir)
    assert(df.columns.toSeq ==
      Seq("day", "click", "error", "purchase", "signup", "view"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val pivotTotal = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    val total = Tables.events(spark, TestSpark.sfDir).count()
    assert(pivotTotal == total, "pivot cells must partition the events")
  }
}
