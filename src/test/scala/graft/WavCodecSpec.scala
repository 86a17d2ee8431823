package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extensions.Media
import java.nio.{ByteBuffer, ByteOrder}

/** The real pure-JVM WAV decoder: golden header/sample values on
  * hand-built bytes, chunk-walk robustness (unknown chunks, odd-size
  * padding), loud failures on malformed input, and encode→decode parity
  * with the analytic feature formula the x_media_decode oracle uses.
  */
class WavCodecSpec extends AnyFunSuite {

  /** Hand-build a PCM-16 WAV, optionally planting extra chunks. */
  private def buildWav(
      rate: Int,
      channels: Int,
      samples: Seq[Int],
      preDataChunks: Seq[(String, Array[Byte])] = Nil
  ): Array[Byte] = {
    val dataLen = samples.length * 2
    val extraLen = preDataChunks.map { case (_, b) => 8 + b.length + (b.length & 1) }.sum
    val total = 12 + 24 + extraLen + 8 + dataLen
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(total - 8); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1.toShort); bb.putShort(channels.toShort)
    bb.putInt(rate); bb.putInt(rate * channels * 2)
    bb.putShort((channels * 2).toShort); bb.putShort(16.toShort)
    preDataChunks.foreach { case (id, body) =>
      bb.put(id.getBytes); bb.putInt(body.length); bb.put(body)
      if ((body.length & 1) == 1) bb.put(0.toByte)
    }
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  test("golden decode: header fields and signed-sample fold exact") {
    val w = Media.decodeWav(buildWav(44100, 1, Seq(100, -200, 300, -32768, 32767)))
    assert(w.sample_rate == 44100 && w.n_channels == 1 && w.bits_per_sample == 16)
    assert(w.n_samples == 5)
    assert(w.duration_ms == 5 * 1000L / 44100) // 0 — integer ms, sub-ms clip
    assert(w.abs_sum == 100L + 200 + 300 + 32768 + 32767)
    assert(w.n_windows == 1 && w.max_win_sum == w.abs_sum)
  }

  test("chunk walk skips unknown chunks including odd-size (padded) ones") {
    val clean = Media.decodeWav(buildWav(8000, 1, Seq(1, 2, 3)))
    val noisy = Media.decodeWav(
      buildWav(
        8000,
        1,
        Seq(1, 2, 3),
        preDataChunks = Seq("LIST" -> "odd-len".getBytes, "fact" -> Array[Byte](4, 0, 0, 0))
      )
    )
    assert(clean == noisy, "extra metadata chunks changed the decode")
  }

  test("stereo: frames = samples / channels, duration from frames") {
    val w = Media.decodeWav(buildWav(1000, 2, Seq(10, -10, 20, -20, 30, -30)))
    assert(w.n_channels == 2 && w.n_samples == 3 && w.duration_ms == 3)
    assert(w.abs_sum == 120) // amplitude folds over the interleaved stream
  }

  test("per-window sums: window boundary at winSamples, max retained") {
    // 6 samples, window of 4: windows are |1,2,3,4| and |5,6|
    val w = Media.decodeWav(buildWav(8000, 1, Seq(1, 2, 3, 4, 5, 6)), winSamples = 4)
    assert(w.n_windows == 2)
    assert(w.max_win_sum == 11) // max(1+2+3+4, 5+6)
    assert(w.abs_sum == 21)
  }

  test("malformed input fails loudly, never decodes to plausible features") {
    val good = buildWav(8000, 1, Seq(1, 2, 3))
    def boom(b: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](Media.decodeWav(b))
      assert(e.getMessage != null, what)
    }
    boom("JFIFnotawavfile!".getBytes, "wrong magic")
    boom(good.take(10), "truncated header")
    boom(good.dropRight(2), "truncated data chunk")
    val nonPcm = good.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    boom(nonPcm, "non-PCM format")
    val bad8 = good.clone(); bad8(34) = 8 // bitsPerSample = 8
    boom(bad8, "8-bit samples")
  }

  test("encode → decode parity with the analytic oracle formula") {
    Seq("", "a", "hello wav world", (1 to 300).map(i => ('a' + i % 26).toChar).mkString).foreach { t =>
      val w = Media.decodeWav(Media.synthWav(t))
      val n = t.length
      val amps = (0 until n).map(i => math.abs(((t.charAt(i).toInt * 131 + i) % 4001) - 2000).toLong)
      assert(w.sample_rate == 8000 + (n % 100) * 10)
      assert(w.n_samples == n && w.n_channels == 1)
      assert(w.duration_ms == (if (n == 0) 0 else n * 1000L / w.sample_rate))
      assert(w.abs_sum == amps.sum, s"abs_sum for <$t>")
      assert(w.n_windows == (n + 255) / 256)
      val winMax = amps.grouped(256).map(_.sum).foldLeft(0L)(math.max)
      assert(w.max_win_sum == winMax)
    }
  }

  test("distributed decode path: decodeWavRows equals local decode per doc") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Graft.table(spark, TestSpark.sfDir, "documents").select(col("doc_id"), col("text")).as[(Long, String)]
    val wav = docs.mapPartitions(_.map { case (id, t) => (id, Media.synthWav(t)) }).toDF("doc_id", "payload")
    val dist = Media.decodeWavRows(spark, wav).collect().map(r => r.doc_id -> r).toMap
    val local = docs.collect().toMap
    assert(dist.nonEmpty && dist.size == local.size)
    local.foreach { case (id, t) =>
      val w = Media.decodeWav(Media.synthWav(t))
      val r = dist(id)
      assert(
        (r.sample_rate, r.n_samples, r.abs_sum, r.n_windows, r.max_win_sum) ==
          ((w.sample_rate.toLong, w.n_samples, w.abs_sum, w.n_windows, w.max_win_sum)),
        s"doc $id"
      )
    }
  }
}
