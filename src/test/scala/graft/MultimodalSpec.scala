package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary payload plumbing round-trips bytes and batches per partition") {
    val media = Multimodal.mediaFromDocuments(spark, TestSpark.sfDir)
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == 500)
    // checksum equals md5 of the original utf-8 text (computed independently)
    val want = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id", md5(encode($"text", "UTF-8")).as("m"))
      .as[(Long, String)].collect().toMap
    feats.collect().foreach { f =>
      assert(f.checksum == want(f.doc_id), s"checksum mismatch doc ${f.doc_id}")
      assert(f.width >= 0 && f.width < 640 && f.height >= 0 && f.height < 480)
      assert(f.n_bytes > 0)
    }
  }

  test("resize and frame-sample stubs are deterministic and correctly shaped") {
    val media = Multimodal.mediaFromDocuments(spark, TestSpark.sfDir).limit(50)
    val resized = Multimodal.resize(media, 64, 64).collect()
    assert(resized.length == 50)
    assert(resized.forall(f => f.width == 64 && f.height == 64))
    // distinct payloads -> distinct resized checksums; same run -> stable
    assert(resized.map(_.checksum).distinct.length == 50)
    val frames = Multimodal.frameSample(media, 4).collect()
    assert(frames.length == 200)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.sameElements(Array(0, 1, 2, 3)))
    }
    // frames partition the payload byte count exactly
    val want = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f.n_bytes).toMap
    byDoc.foreach { case (id, fs) =>
      assert(fs.map(_.n_bytes).sum == want(id))
    }
  }

  test("custom decoder is pluggable per batch") {
    val media = Multimodal.mediaFromDocuments(spark, TestSpark.sfDir).limit(300)
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    object CountingDecoder extends Multimodal.Decoder {
      def decodeBatch(b: Seq[Multimodal.MediaRecord]): Seq[Multimodal.MediaFeatures] =
        b.map(r => Multimodal.MediaFeatures(r.doc_id, r.media_type,
          b.size.toLong, "batch", 0, 0)) // smuggle batch size into n_bytes
      def resizeBatch(b: Seq[Multimodal.MediaRecord], w: Int, h: Int) = decodeBatch(b)
      def frameSampleBatch(b: Seq[Multimodal.MediaRecord], n: Int) = Nil
    }
    val feats = Multimodal.extractFeatures(media, CountingDecoder).collect()
    assert(feats.length == 300)
    // batches are bounded by BatchSize
    assert(feats.forall(_.n_bytes <= Multimodal.BatchSize))
  }
}
class MultimodalNonAsciiSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  test("frame sampling chunks non-ASCII text on codepoint boundaries") {
    val media = Seq(Multimodal.MediaRecord(1L, "text/plain",
      "héllo 中文 texte été ça va bien aujourd'hui ok"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .toDS()
    val frames = Multimodal.frameSample(media, 4).collect().sortBy(_.frame_idx)
    assert(frames.length == 4)
    // chunks re-assemble to the original text (no split codepoints)
    val total = frames.map(_.n_bytes).sum
    assert(total == media.head().payload.length)
    frames.foreach { f =>
      assert(f.checksum.length == 32) // valid md5 of a well-formed utf-8 chunk
    }
  }
}
