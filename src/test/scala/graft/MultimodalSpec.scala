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

  test("custom decoder is pluggable per batch") {
    val media = Multimodal.mediaFromDocuments(spark, TestSpark.sfDir).limit(300)
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    object CountingDecoder extends Multimodal.Decoder {
      def decodeBatch(b: Seq[Multimodal.MediaRecord]): Seq[Multimodal.MediaFeatures] =
        b.map(r => Multimodal.MediaFeatures(r.doc_id, r.media_type,
          b.size.toLong, "batch", 0, 0)) // smuggle batch size into n_bytes
    }
    val feats = Multimodal.extractFeatures(media, CountingDecoder).collect()
    assert(feats.length == 300)
    // batches are bounded by BatchSize
    assert(feats.forall(_.n_bytes <= Multimodal.BatchSize))
  }
}
