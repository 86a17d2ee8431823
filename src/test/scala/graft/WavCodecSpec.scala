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
    // crafted chunk size >= 2^31 (0xFFFFFFF8 -> -8 as Int): without the
    // guard the chunk-walk offset goes stationary/backward = infinite loop
    val huge = good.clone()
    huge(16) = 0xf8.toByte; huge(17) = 0xff.toByte; huge(18) = 0xff.toByte; huge(19) = 0xff.toByte
    boom(huge, "overflowing chunk size")
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

  // ------------------------------------------------------------- BMP side
  /** Hand-build a 24-bpp BMP; rows supplied TOP-DOWN as (B,G,R) triples,
    * written bottom-up (positive height) or top-down (negative). */
  private def buildBmp(rows: Seq[Seq[(Int, Int, Int)]], topDown: Boolean = false): Array[Byte] = {
    val h = rows.length; val w = rows.head.length
    val stride = ((w * 3 + 3) / 4) * 4
    val total = 54 + stride * h
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(total)
    bb.putShort(0.toShort); bb.putShort(0.toShort); bb.putInt(54)
    bb.putInt(40); bb.putInt(w); bb.putInt(if (topDown) -h else h)
    bb.putShort(1.toShort); bb.putShort(24.toShort)
    bb.putInt(0); bb.putInt(stride * h)
    bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
    val fileRows = if (topDown) rows else rows.reverse
    fileRows.foreach { r =>
      r.foreach { case (b, g, rr) => bb.put(b.toByte); bb.put(g.toByte); bb.put(rr.toByte) }
      (w * 3 until stride).foreach(_ => bb.put(0.toByte))
    }
    bb.array()
  }

  test("BMP golden decode: dimensions, channel sums, position-weighted luminance") {
    // 2x2: logical top-down pixels p=0..3 with distinct channels
    val rows = Seq(
      Seq((10, 20, 30), (40, 50, 60)), // p=0, p=1
      Seq((1, 2, 3), (4, 5, 6)) // p=2, p=3
    )
    val i = Media.decodeBmp(buildBmp(rows))
    assert(i.width == 2 && i.height == 2 && i.n_pixels == 4)
    assert(i.sum_b == 10 + 40 + 1 + 4 && i.sum_g == 20 + 50 + 2 + 5 && i.sum_r == 30 + 60 + 3 + 6)
    assert(i.wsum_lum == 0 * 60 + 1 * 150 + 2 * 6 + 3 * 15)
  }

  test("BMP bottom-up and top-down encodings of the same image decode identically") {
    val rows = Seq(Seq((9, 8, 7)), Seq((1, 2, 3)), Seq((100, 101, 102))) // w=1: 1 padded byte/row
    assert(Media.decodeBmp(buildBmp(rows)) == Media.decodeBmp(buildBmp(rows, topDown = true)))
  }

  test("BMP malformed input fails loudly") {
    val good = buildBmp(Seq(Seq((1, 2, 3))))
    def boom(b: Array[Byte], what: String): Unit =
      assert(intercept[IllegalArgumentException](Media.decodeBmp(b)).getMessage != null, what)
    boom("PNGnotabitmap".getBytes ++ new Array[Byte](60), "wrong magic")
    boom(good.dropRight(2), "truncated pixel array")
    val b8 = good.clone(); b8(28) = 8 // 8-bpp
    boom(b8, "unsupported bpp")
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    boom(rle, "compressed")
    // pixel-array offset >= 2^31 wraps negative: must be the descriptive
    // require, not a raw ArrayIndexOutOfBoundsException from the walk
    val off = good.clone()
    off(10) = 0xf8.toByte; off(11) = 0xff.toByte; off(12) = 0xff.toByte; off(13) = 0xff.toByte
    boom(off, "overflowing pixel offset")
  }

  test("BMP encode → decode parity with the analytic oracle formula") {
    Seq("x", "hello bmp", (1 to 123).map(i => ('a' + i % 26).toChar).mkString).foreach { t =>
      val i = Media.decodeBmp(Media.synthBmp(t))
      val n = t.length
      val w = 1 + n % 16
      val h = math.max(1, (n + w - 1) / w)
      var acc = 0L
      t.getBytes("UTF-8").foreach(b => acc = (acc * 31 + (b & 0xffL)) % 1000000007L)
      val base = acc % 251
      val pix = (0L until w.toLong * h).map { p =>
        ((base * 3 + p * 7) % 256, (base * 5 + p * 11) % 256, (base * 2 + p * 13) % 256)
      }
      assert(i.width == w && i.height == h && i.n_pixels == w.toLong * h)
      assert(i.sum_b == pix.map(_._1).sum && i.sum_g == pix.map(_._2).sum && i.sum_r == pix.map(_._3).sum)
      assert(i.wsum_lum == pix.zipWithIndex.map { case ((b, g, r), p) => p * (b + g + r) }.sum)
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
