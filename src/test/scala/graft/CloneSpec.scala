package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TableSink.shallowCloneTo]] — zero-copy clones: O(metadata) creation,
  * independent divergence on append, full materialization on the first
  * rewriting op, and the refuse-guards. */
class CloneSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wh = TestSpark.tmpDir("clone_wh")

  private def mkSource(name: String): TableSink = {
    val sink = new TableSink(SinkConfig(tableName = name, warehousePath = wh,
      versioned = true,
      partitionSpec = Seq(PartitionField("cat", Transform.Identity))))
    sink.append(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "cat", "v"))
    sink
  }

  private def cfg(name: String): SinkConfig =
    SinkConfig(tableName = name, warehousePath = wh, versioned = true,
      partitionSpec = Seq(PartitionField("cat", Transform.Identity)))

  private def dataFiles(sink: TableSink): Seq[String] = sink.dataFilesRel()

  test("clone reads the source head with zero data files of its own") {
    val src = mkSource("c_src1")
    val clone = src.shallowCloneTo(cfg("c_dst1"))
    assert(clone.read(spark).select($"id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    assert(dataFiles(clone).isEmpty, "zero-copy: no files under the clone")
    // partition pruning still derives from the SOURCE directory spine
    val pruned = clone.read(spark).filter($"cat" === "a")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(pruned == Seq(1L, 3L))
  }

  test("clone and source diverge independently on append") {
    val src = mkSource("c_src2")
    val clone = src.shallowCloneTo(cfg("c_dst2"))
    clone.append(Seq((4L, "b", 40.0)).toDF("id", "cat", "v"))
    assert(clone.read(spark).count() == 4, "clone sees source + its append")
    assert(src.read(spark).count() == 3, "source never observes the clone")
    assert(dataFiles(clone).nonEmpty, "the clone's own append is local")
    // and the other direction: a later source append stays invisible to
    // the clone (it references the head AT CLONE TIME)
    src.append(Seq((9L, "a", 90.0)).toDF("id", "cat", "v"))
    assert(clone.read(spark).count() == 4)
    assert(src.read(spark).count() == 4)
  }

  test("first rewriting op fully materializes the clone") {
    val src = mkSource("c_src3")
    val clone = src.shallowCloneTo(cfg("c_dst3"))
    val removed = clone.delete(spark, $"id" === 2L)
    assert(removed == 1)
    assert(clone.read(spark).select($"id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L))
    assert(dataFiles(clone).nonEmpty, "rewrite materialized local files")
    // self-contained now: the manifest has no absolute source entries
    assert(src.read(spark).count() == 3, "source untouched by the rewrite")
  }

  test("clone time travel and guards") {
    val src = mkSource("c_src4")
    val clone = src.shallowCloneTo(cfg("c_dst4"))
    clone.append(Seq((4L, "b", 40.0)).toDF("id", "cat", "v"))
    assert(clone.readVersion(spark, 1).count() == 3, "v1 = cloned head")
    assert(clone.readVersion(spark, 2).count() == 4)
    // guard: no clone-of-clone
    val e = intercept[IllegalArgumentException] {
      clone.shallowCloneTo(cfg("c_dst4b"))
    }
    assert(e.getMessage.contains("clone the original"))
    // guard: unversioned source
    val flat = new TableSink(SinkConfig(tableName = "c_flat",
      warehousePath = wh))
    flat.append(Seq((1L, "a", 1.0)).toDF("id", "cat", "v"))
    val e2 = intercept[IllegalArgumentException] {
      flat.shallowCloneTo(cfg("c_dst4c"))
    }
    assert(e2.getMessage.contains("versioned"))
    // guard: pending merge-on-read deletes must be compacted first
    val src5 = mkSource("c_src5")
    src5.deleteWhere("id = 1")
    val e3 = intercept[IllegalArgumentException] {
      src5.shallowCloneTo(cfg("c_dst5"))
    }
    assert(e3.getMessage.contains("compact"))
  }
}
