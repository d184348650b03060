package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[RealAudio]]: real WAV round trip through `javax.sound.sampled` —
  * header fields and samples must come from an actual parse, matching the
  * generator's closed-form waveform. */
class AudioSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val staged = RealAudio.stage(spark, TestSpark.sfDir)

  test("decode recovers header rate and exact generated samples") {
    val expected = spark.read.parquet(staged)
      .select("doc_id", "expected_n", "expected_peak", "expected_sum_sq")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    val got = RealAudio.decodeFeatures(RealAudio.readStaged(spark, staged))
      .collect()
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach { f =>
      val (_, n, peak, sumSq) = expected(f.doc_id)
      assert(f.sample_rate == RealAudio.SampleRate,
        s"doc ${f.doc_id}: rate must come from the parsed header")
      assert(f.n_samples == n && f.peak == peak && f.sum_sq == sumSq,
        s"doc ${f.doc_id}: decoded stats $f != generated ($n, $peak, $sumSq)")
      assert(f.duration_ms == n.toLong * 1000 / RealAudio.SampleRate)
    }
  }

  test("zero crossings match a direct waveform walk") {
    val id = 7L
    val s = Array.tabulate(RealAudio.nSamplesOf(id))(RealAudio.sampleOf(id, _))
    val want = (1 until s.length).count(i => (s(i) < 0) != (s(i - 1) < 0))
    val got = RealAudio.decodeFeatures(RealAudio.readStaged(spark, staged))
      .filter(_.doc_id == id).collect().head.zero_crossings
    assert(got == want.toLong, s"doc $id: zc $got != $want")
    assert(want > 0, "fixture waveform must actually cross zero")
  }

  test("frame energies partition the clip energy exactly") {
    val feats = RealAudio.decodeFeatures(RealAudio.readStaged(spark, staged))
      .collect().map(f => f.doc_id -> f.sum_sq).toMap
    val frames = RealAudio.frameEnergy(
      RealAudio.readStaged(spark, staged), RealAudio.NFrames).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.size == feats.size)
    byDoc.foreach { case (id, fs) =>
      assert(fs.length == RealAudio.NFrames)
      assert(fs.map(_.sum_sq).sum == feats(id),
        s"doc $id: frame energies must sum to the clip energy")
      assert(fs.map(_.n_frame).sum == RealAudio.nSamplesOf(id).toLong)
    }
  }

  test("corrupt payload names its row instead of failing opaquely") {
    val bad = Seq((99L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "payload")
    val e = intercept[Exception](RealAudio.decodeFeatures(bad).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("doc_id=99")),
      s"error must name the row: ${msgs(e)}")
  }
}
