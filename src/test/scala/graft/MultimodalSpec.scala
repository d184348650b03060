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
class RealMediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PNG round trip: ImageIO decode recovers the generator's exact pixels") {
    val path = RealMedia.stage(spark, TestSpark.sfDir)
    // the staged fixture records generation-time ground truth; the decoder
    // works from payload bytes alone and must land on the same values
    val recorded = spark.read.parquet(path)
      .select($"doc_id", $"expected_width", $"expected_height",
        $"expected_px_sum")
      .as[(Long, Int, Int, Long)].collect()
      .map { case (id, w, h, s) => id -> ((w, h, s)) }.toMap
    assert(recorded.size == 500)
    val decoded = RealMedia.decodeFeatures(
      RealMedia.readStaged(spark, path)).collect()
    assert(decoded.length == 500)
    decoded.foreach { f =>
      assert((f.width, f.height, f.px_sum) == recorded(f.doc_id),
        s"doc ${f.doc_id}: decode diverged from generation-time truth")
      // and the recorded truth matches the closed form the oracle replays
      assert(f.width == RealMedia.widthOf(f.doc_id))
      assert(f.height == RealMedia.heightOf(f.doc_id))
    }
  }

  test("nearest-neighbor resize matches hand-computed sampling on a known image") {
    // doc_id 0: 8x8 image; resize to 2x2 samples source pixels (0,0),(4,0),
    // (0,4),(4,4) — hand-fold the generator's channel functions
    val media = Seq((0L, {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, (RealMedia.red(0, x, y) << 16) |
          (RealMedia.green(0, x, y) << 8) | RealMedia.blue(0, x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    })).toDF("doc_id", "payload")
    val want = Seq((0, 0), (4, 0), (0, 4), (4, 4)).map { case (x, y) =>
      RealMedia.red(0, x, y).toLong * 65536 +
        RealMedia.green(0, x, y) * 256 + RealMedia.blue(0, x, y)
    }.sum
    val got = RealMedia.resizeFeatures(media, 2, 2).head()
    assert((got.width, got.height, got.px_sum) == (2, 2, want))
  }

  test("strips partition the image rows exactly and sum to the full image") {
    val path = RealMedia.stage(spark, TestSpark.sfDir)
    val media = RealMedia.readStaged(spark, path).limit(64)
    val full = RealMedia.decodeFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    val strips = RealMedia.stripFeatures(media, RealMedia.NStrips).collect()
      .groupBy(_.doc_id)
    assert(strips.size == full.size)
    strips.foreach { case (id, ss) =>
      assert(ss.map(_.frame_idx).sorted.sameElements(Array(0, 1, 2, 3)))
      assert(ss.map(_.n_px).sum == full(id).width.toLong * full(id).height)
      assert(ss.map(_.px_sum).sum == full(id).px_sum)
    }
  }

  test("a corrupt payload fails with the offending row named") {
    val media = Seq((7L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val e = intercept[Exception] {
      RealMedia.decodeFeatures(media).collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
    assert(messages.exists(_.contains("doc_id=7")),
      "error must name the offending row")
  }

  test("dHash is invariant under 2x nearest-neighbor upscale") {
    // the defining perceptual-hash property the exact px_sum does NOT
    // have: a rescaled copy of an image fingerprints identically, because
    // floor(floor(t*2w/9)/2) = floor(t*w/9) for every sample point
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      try ImageIO.write(img, "png", ios) finally ios.close()
      bos.toByteArray
    }
    val w = 11; val h = 9
    val base = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      base.setRGB(x, y, ((x * 37 + y * 101) % 256) * 65793) // gray ramp
    val up = new BufferedImage(2 * w, 2 * h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2 * h; x <- 0 until 2 * w)
      up.setRGB(x, y, base.getRGB(x / 2, y / 2))
    val media = Seq((1L, png(base)), (2L, png(up))).toDF("doc_id", "payload")
    val hs = RealMedia.dhashFeatures(media).collect()
      .map(r => r.doc_id -> ((r.hash_lo, r.hash_hi))).toMap
    assert(hs(1L) == hs(2L),
      s"upscaled copy must fingerprint identically: ${hs(1L)} vs ${hs(2L)}")
    assert(hs(1L) != ((0L, 0L)), "ramp image must set some bits")
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
