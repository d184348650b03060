package graft

import org.scalatest.funsuite.AnyFunSuite

class TypedOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mapRecords captures per-record exceptions and keeps the stream flowing") {
    val ds = Seq("1", "2", "boom", "4").toDS()
    val out = TypedOps.mapRecords(ds)(_.toInt * 10)
    assert(out.oks.collect().sorted.toSeq == Seq(10, 20, 40))
    val errs = out.errs.collect()
    assert(errs.length == 1)
    assert(errs(0).startsWith("NumberFormatException"))
  }

  test("validateRecords routes predicate failures with the configured message") {
    val ds = Seq(1, 50, 200).toDS()
    val out = TypedOps.validateRecords(ds)(_ < 100, "too big")
    assert(out.oks.collect().sorted.toSeq == Seq(1, 50))
    assert(out.errs.collect().toSeq == Seq("IllegalArgumentException: too big"))
  }

  test("user function runs exactly once per record across both branches") {
    val acc = spark.sparkContext.longAccumulator("calls")
    val ds = Seq(1, 2, 3, 4, 5).toDS()
    val out = TypedOps.mapRecords(ds) { x => acc.add(1); x * 2 }
    assert(out.oks.count() == 5)
    assert(out.errs.count() == 0)
    assert(acc.value == 5, s"f evaluated ${acc.value} times for 5 records")
    out.release()
  }

  test("error messages are truncated to the reference's 1000-char cap") {
    val ds = Seq(1).toDS()
    val out = TypedOps.mapRecords(ds) { _ =>
      val e: Int = throw new RuntimeException("x" * 5000)
      e
    }
    assert(out.errs.head().length == 1000)
  }
}
