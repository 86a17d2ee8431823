package graft.extensions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.F): media payloads as opaque
  * `BINARY` columns with a typed metadata struct, and a batched
  * feature-extraction pass over `mapPartitions`.
  *
  * The decode seam is PROVEN end-to-end by one real pure-JVM codec:
  * `decodeWav` parses RIFF/WAVE PCM-16 (magic validation, chunk walk with
  * pad bytes, LE sample fold) inside the same executor-side pipeline —
  * see `decodeWavRows` and the `x_media_decode` oracle gate. For formats
  * without a pure-JVM parser in this container (JPEG, MP4, …),
  * `decodeStub` remains the clearly-marked contract: deterministic
  * pseudo-features from raw bytes, with the schema / typed Dataset /
  * partition-wise batching identical to the WAV path — replace the stub
  * body with the JNI/codec call and nothing else changes. Executor-side
  * batching (one iterator pass per partition, zero driver collection) is
  * exactly the mapInPandas/Arrow batch shape of the Python equivalent.
  */
object Media {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, byte_sum_64: Long, width: Int, frames: Int)

  /** Wrap a documents table into a media table: payload = utf-8 bytes of
    * `text` (stand-in for an image/audio blob), metadata derived. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        lit("application/octet-stream").as("mime")
      ).as("meta")
    )

  /** STUB decoder — deterministic fake features from raw bytes.
    * Replace with a real codec (JPEG decode, PCM frame split, …); the
    * signature `Array[Byte] => MediaFeatures'` is the codec contract. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var s = 0L
    var i = 0
    val n = math.min(64, bytes.length)
    while (i < n) { s += (bytes(i) & 0xffL); i += 1 }
    MediaFeatures(
      doc_id = id,
      n_bytes = bytes.length.toLong,
      byte_sum_64 = s,
      width = (bytes.length % 640).toInt,
      frames = (bytes.length / 1024 + 1).toInt
    )
  }

  /** Batched executor-side feature extraction: one sequential pass per
    * partition (the batch boundary a real decoder would amortize setup
    * over), no shuffle, no driver round-trip. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeStub(id, bytes) } }
  }

  /** Content-defined chunking dedup stats over the binary payload — the
    * rsync/FastCDC shape: a chunk boundary falls wherever the rolling
    * hash of the trailing `win` bytes ≡ 0 (mod `modBase`), so boundaries
    * survive insertions/deletions (fixed-size chunking would shift every
    * later chunk; content-defined boundaries re-align). Chunks are hashed
    * corpus-wide; per doc: chunk count, chunks whose hash repeats
    * anywhere in the corpus, and the bytes those cover — the storage-
    * dedup ratio a blob store reports.
    *
    * The entire pipeline runs in the BYTE domain on the binary payload:
    * boundary detection, slicing (`substr` on BINARY is byte-positional)
    * and chunk hashing (PolyHash over octets) — so multi-byte or
    * non-UTF-8 payloads chunk correctly; there is no character decode to
    * shear offsets against. On the ASCII fixture corpus this is
    * value-identical to the oracle's char-domain replay from `text`
    * (byte == code point).
    *
    * Scale: boundary detection + chunk hashing are map-side per doc
    * (O(len·win) byte ops, no shuffle); the only shuffles are the
    * chunk-hash frequency aggregate and the key-sized join back —
    * both proportional to Σ chunks, never pairs. */
  def cdcChunkStats(media: DataFrame, win: Int = 8, modBase: Long = 64L): DataFrame = {
    graft.functions.Registry.register(media.sparkSession)
    val staged = media
      .select(col("doc_id"), col("payload").as("__t"))
      .select(col("doc_id"), col("__t"), length(col("__t")).as("__len"))
    // boundary END positions (1-based, inclusive) in ONE codegen'd rolling
    // pass (functions.CdcBoundaries) — value-identical to filtering
    // sequence(win, len) on polyHash(substr), ~6× faster than that
    // interpreted HOF spelling
    val bnds = call_function("graft_cdc_bounds", col("__t"), lit(win), lit(modBase))
    val chunks = staged
      .withColumn("__bnds", bnds)
      .withColumn("__ss", concat(array(lit(1)), transform(col("__bnds"), b => b + lit(1))))
      .withColumn("__es", concat(col("__bnds"), array(col("__len"))))
      .withColumn(
        "__pr",
        filter(
          zip_with(col("__ss"), col("__es"), (s, e) => struct(s.as("s"), (e - s + lit(1)).as("l"))),
          p => p.getField("l") > 0
        )
      )
      .select(col("doc_id"), col("__t"), explode(col("__pr")).as("p"))
      .select(
        col("doc_id"),
        TextOps.polyHash(col("__t").substr(col("p.s"), col("p.l"))).as("chash"),
        col("p.l").cast("long").as("clen")
      )
    val dfreq = chunks.groupBy("chash").agg(count(lit(1)).as("cdf"))
    chunks
      .join(dfreq, "chash")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("cdf") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("cdf") >= 2, col("clen")).otherwise(0L)).as("dup_bytes")
      )
  }

  case class Frame(doc_id: Long, frame_id: Int, frame_len: Int, frame_sum: Long)

  /** Frame sampling over the binary payload: one `frameLen`-byte frame
    * every `stride` bytes (a video keyframe / audio window sampler).
    * Flat-map on the executor — output volume is rows × frames, driver
    * untouched; a real codec would decode each slice here. frame_sum is
    * the deterministic stand-in for the decoded feature. */
  def frameSample(
      spark: SparkSession,
      media: DataFrame,
      frameLen: Int = 256,
      stride: Int = 512
  ): Dataset[Frame] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Iterator
          .from(0)
          .map(_ * stride)
          .takeWhile(_ < bytes.length)
          .zipWithIndex
          .map { case (off, fid) =>
            val end = math.min(off + frameLen, bytes.length)
            var s = 0L
            var i = off
            while (i < end) { s += (bytes(i) & 0xffL); i += 1 }
            Frame(id, fid, end - off, s)
          }
      }
  }

  // ------------------------------------------------------------ WAV codec
  /** Decoded PCM WAV facts + per-window amplitude features. All-integer
    * so the oracle replay (and the CORRECTNESS hash) is exact. */
  case class WavInfo(
      sample_rate: Int,
      n_channels: Int,
      bits_per_sample: Int,
      n_samples: Long,
      duration_ms: Long,
      abs_sum: Long,
      n_windows: Long,
      max_win_sum: Long
  )

  case class WavRow(
      doc_id: Long,
      sample_rate: Long,
      n_channels: Long,
      n_samples: Long,
      duration_ms: Long,
      abs_sum: Long,
      n_windows: Long,
      max_win_sum: Long
  )

  private def fourCC(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** REAL pure-JVM RIFF/WAVE decoder (PCM-16): validates the RIFF/WAVE
    * magic, walks the chunk list with even-size padding (skipping LIST/
    * INFO/etc.), reads the fmt fields, and folds the 16-bit LE samples
    * into integer amplitude features — total |sample| sum plus per-window
    * (default 256-sample) sums with the max window retained. This is the
    * decode seam `decodeStub` stubs for formats without a pure-JVM
    * parser, proven end-to-end here: a mis-read header offset, a skipped
    * pad byte, or a sign error in the PCM fold all diverge from the
    * oracle's analytic replay. Malformed input fails loudly (wrong magic,
    * truncated chunk, non-PCM format, non-16-bit) — a corrupt blob must
    * never decode to plausible features. */
  def decodeWav(bytes: Array[Byte], winSamples: Int = 256): WavInfo = {
    require(
      bytes.length >= 12 && fourCC(bytes, 0) == "RIFF" && fourCC(bytes, 8) == "WAVE",
      "not a RIFF/WAVE payload"
    )
    var off = 12
    var rate = 0; var ch = 0; var bps = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length && (rate == 0 || dataOff < 0)) {
      val id = fourCC(bytes, off)
      val szL = leU32(bytes, off + 4) // unsigned; ≥ 2^31 would wrap .toInt negative
      val body = off + 8
      // A crafted size ≥ 2^31 (e.g. 0xFFFFFFF8 → -8 as Int) would make the
      // offset advance stationary or backward — an executor-side infinite
      // loop. Fail loudly per the malformed-input contract.
      require(szL <= Int.MaxValue && body + szL <= bytes.length, s"corrupt $id chunk size $szL")
      val sz = szL.toInt
      id match {
        case "fmt " =>
          require(sz >= 16 && body + 16 <= bytes.length, "truncated fmt chunk")
          val fmt = leU16(bytes, body)
          require(fmt == 1, s"unsupported WAV audio format $fmt (PCM only)")
          ch = leU16(bytes, body + 2)
          require(ch >= 1, "zero channels")
          rate = leU32(bytes, body + 4).toInt
          require(rate >= 1, "zero sample rate")
          bps = leU16(bytes, body + 14)
          require(bps == 16, s"unsupported bits/sample $bps (PCM-16 only)")
        case "data" =>
          dataOff = body; dataLen = sz
        case _ => () // LIST, fact, bext, … — skip
      }
      off = body + sz + (sz & 1) // RIFF chunks pad to even length
    }
    require(rate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    require(dataOff + dataLen <= bytes.length, "truncated data chunk")
    val nS = dataLen / 2
    var absSum = 0L; var winSum = 0L; var maxWin = 0L
    var k = 0; var nW = 0L
    var s = 0
    while (s < nS) {
      // 16-bit LE: sign carried by the high byte
      val v = (bytes(dataOff + 2 * s + 1) << 8) | (bytes(dataOff + 2 * s) & 0xff)
      val a = math.abs(v).toLong
      absSum += a; winSum += a; k += 1
      if (k == winSamples || s == nS - 1) {
        nW += 1; if (winSum > maxWin) maxWin = winSum
        winSum = 0; k = 0
      }
      s += 1
    }
    val frames = nS / ch
    WavInfo(rate, ch, bps, frames, frames * 1000L / rate, absSum, nW, maxWin)
  }

  /** Deterministic synthetic WAV from text — the gate's payload
    * generator (no audio assets in the container): mono PCM-16 at
    * rate = 8000 + (len % 100)·10 Hz, sample_i = ((char_i·131 + i) mod
    * 4001) − 2000, with an odd-sized LIST chunk planted between fmt and
    * data so the decoder's chunk-walk (and its pad-byte handling) is on
    * the verified path. The oracle recomputes the features analytically
    * from the same text — any byte the encoder or decoder mislays
    * diverges. */
  def synthWav(text: String): Array[Byte] = {
    val n = text.length
    val rate = 8000 + (n % 100) * 10
    val listBody = "graftmeta".getBytes(java.nio.charset.StandardCharsets.US_ASCII) // 9 bytes: forces a pad
    val listPadded = listBody.length + (listBody.length & 1)
    val dataLen = n * 2
    val total = 12 + (8 + 16) + (8 + listPadded) + (8 + dataLen)
    val bb = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(total - 8); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1.toShort); bb.putShort(1.toShort) // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2) // byte rate
    bb.putShort(2.toShort); bb.putShort(16.toShort) // block align, bits
    bb.put("LIST".getBytes); bb.putInt(listBody.length); bb.put(listBody)
    if (listPadded > listBody.length) bb.put(0.toByte)
    bb.put("data".getBytes); bb.putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((text.charAt(i).toInt * 131 + i) % 4001) - 2000).toShort)
      i += 1
    }
    bb.array()
  }

  /** Batched executor-side WAV decode over (doc_id, payload) — the same
    * mapPartitions shape as `extractFeatures`, with the real codec in the
    * decode slot. No shuffle, no driver round-trip; output is one
    * integer-feature row per blob. */
  def decodeWavRows(spark: SparkSession, media: DataFrame, winSamples: Int = 256): Dataset[WavRow] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val w = decodeWav(b, winSamples)
        WavRow(id, w.sample_rate, w.n_channels, w.n_samples, w.duration_ms, w.abs_sum, w.n_windows, w.max_win_sum)
      })
  }

  // ------------------------------------------------------------ BMP codec
  /** Decoded 24-bpp BMP facts + channel/positional features. All-integer
    * for exact oracle replay. `wsum_lum` is the POSITION-WEIGHTED
    * luminance sum Σ p·(B+G+R) over the logical top-down row-major pixel
    * index p — channel sums alone are order-blind, so a decoder that
    * mishandles the bottom-up row order or the 4-byte row padding would
    * still match them; the weighted sum catches exactly those bugs. */
  case class BmpInfo(
      width: Int,
      height: Int,
      n_pixels: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      wsum_lum: Long
  )

  case class BmpRow(
      doc_id: Long,
      width: Long,
      height: Long,
      n_pixels: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      wsum_lum: Long
  )

  /** REAL pure-JVM BMP decoder (BITMAPINFOHEADER, 24-bpp uncompressed):
    * validates the BM magic, reads the pixel-array offset and DIB
    * dimensions, walks rows at the padded 4-byte stride in file order
    * (bottom-up for positive height, top-down for negative — both
    * handled), and folds per-channel sums plus the position-weighted
    * luminance over the LOGICAL top-down pixel order. The second format
    * through the decode seam after WAV — same contract: malformed input
    * (wrong magic, unsupported bpp/compression, truncated pixel array)
    * fails loudly rather than decoding to plausible features. */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "not a BMP payload")
    val pixOff = leU32(bytes, 10).toInt
    // a pixel offset ≥ 2^31 wraps negative and would slip past the
    // truncated-pixel-array require below into a raw AIOOBE
    require(pixOff >= 54 && pixOff <= bytes.length, s"corrupt pixel-array offset $pixOff")
    val dibSize = leU32(bytes, 14).toInt
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val w = leU32(bytes, 18).toInt
    val hRaw = leU32(bytes, 22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    require(w > 0 && h > 0, s"degenerate dimensions ${w}x$hRaw")
    val bpp = leU16(bytes, 28)
    require(bpp == 24, s"unsupported bits/pixel $bpp (24-bpp only)")
    val compression = leU32(bytes, 30)
    require(compression == 0, s"unsupported compression $compression (BI_RGB only)")
    val stride = ((w * 3 + 3) / 4) * 4
    require(pixOff + stride.toLong * h <= bytes.length, "truncated pixel array")
    var sr = 0L; var sg = 0L; var sb = 0L; var wl = 0L
    var row = 0
    while (row < h) {
      // logical row (top-down) for this file row
      val lr = if (topDown) row else h - 1 - row
      val base = pixOff + row * stride
      var c = 0
      while (c < w) {
        val b0 = bytes(base + c * 3) & 0xff // stored B, G, R
        val g0 = bytes(base + c * 3 + 1) & 0xff
        val r0 = bytes(base + c * 3 + 2) & 0xff
        sb += b0; sg += g0; sr += r0
        wl += (lr.toLong * w + c) * (b0 + g0 + r0)
        c += 1
      }
      row += 1
    }
    BmpInfo(w, h, w.toLong * h, sr, sg, sb, wl)
  }

  /** Deterministic synthetic 24-bpp BMP from text — the image twin of
    * [[synthWav]]: width = 1 + len%16, height = ceil(len/width) (min 1),
    * pixel p (top-down row-major) has channels B = (base·3 + p·7) mod
    * 256, G = (base·5 + p·11) mod 256, R = (base·2 + p·13) mod 256 with
    * base = polyHash(text) mod 251 — content-dependent, so the oracle's
    * analytic replay catches any byte the encoder or decoder mislays.
    * Written BOTTOM-UP with real row padding, so the decoder's row
    * re-ordering and stride walk are on the verified path. */
  def synthBmp(text: String): Array[Byte] = {
    val n = text.length
    val w = 1 + n % 16
    val h = math.max(1, (n + w - 1) / w)
    // polyHash over UTF-8 bytes, same arithmetic as TextOps.polyHash
    var acc = 0L
    text.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach(b => acc = (acc * 31 + (b & 0xffL)) % 1000000007L)
    val base = acc % 251L
    val stride = ((w * 3 + 3) / 4) * 4
    val total = 54 + stride * h
    val bb = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(total)
    bb.putShort(0.toShort); bb.putShort(0.toShort); bb.putInt(54) // reserved, pixel offset
    bb.putInt(40); bb.putInt(w); bb.putInt(h) // positive height = bottom-up
    bb.putShort(1.toShort); bb.putShort(24.toShort)
    bb.putInt(0); bb.putInt(stride * h) // BI_RGB, image size
    bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0) // ppm, palette
    var fileRow = 0
    while (fileRow < h) {
      val lr = h - 1 - fileRow // bottom-up: first file row is the last logical row
      var c = 0
      while (c < w) {
        val p = lr.toLong * w + c
        bb.put(((base * 3 + p * 7) % 256).toByte)
        bb.put(((base * 5 + p * 11) % 256).toByte)
        bb.put(((base * 2 + p * 13) % 256).toByte)
        c += 1
      }
      var pad = w * 3
      while (pad < stride) { bb.put(0.toByte); pad += 1 }
      fileRow += 1
    }
    bb.array()
  }

  /** Batched executor-side BMP decode — same pipeline shape as
    * [[decodeWavRows]]. */
  def decodeBmpRows(spark: SparkSession, media: DataFrame): Dataset[BmpRow] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val i = decodeBmp(b)
        BmpRow(id, i.width, i.height, i.n_pixels, i.sum_r, i.sum_g, i.sum_b, i.wsum_lum)
      })
  }

  // ------------------------------------------------- magic-byte dispatcher
  /** One row of the mixed-format decode: which decoder the sniffer chose
    * plus that format's two headline integer features (a real pipeline
    * would emit per-format structs; two shared columns keep the oracle
    * exact): WAV → (abs_sum, n_samples), BMP → (wsum_lum, n_pixels),
    * unrecognized → the stub's (byte_sum_64, n_bytes). */
  case class MixedRow(doc_id: Long, format: String, f1: Long, f2: Long)

  /** Container sniff by magic bytes — the real-world dispatch rule for a
    * mixed binary-payload column (file extensions don't survive into a
    * BINARY column; leading bytes do): RIFF/WAVE → "wav", BM + a full
    * BITMAPFILEHEADER's worth of bytes → "bmp", anything else → "bin".
    * Sniffing is a ROUTE, not a validation — a payload that matches a
    * magic but is structurally corrupt still fails loudly inside its
    * decoder, never silently falls through to the stub. */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 12 && fourCC(bytes, 0) == "RIFF" && fourCC(bytes, 8) == "WAVE") "wav"
    else if (bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) "bmp"
    else "bin"

  /** Mixed-format decode: ONE executor-side mapPartitions pass routes each
    * payload through [[sniffFormat]] to the matching decoder —
    * [[decodeWav]], [[decodeBmp]], or the [[decodeStub]] seam — unifying
    * the per-format entry points ([[decodeWavRows]], [[decodeBmpRows]],
    * [[extractFeatures]]) behind one operator. Zero shuffle, no
    * per-format filter+union (which would scan the payload column once
    * per format); the scale shape is identical to the single-format
    * decoders. */
  def decodeMixedRows(spark: SparkSession, media: DataFrame, winSamples: Int = 256): Dataset[MixedRow] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        sniffFormat(b) match {
          case "wav" =>
            val w = decodeWav(b, winSamples)
            MixedRow(id, "wav", w.abs_sum, w.n_samples)
          case "bmp" =>
            val i = decodeBmp(b)
            MixedRow(id, "bmp", i.wsum_lum, i.n_pixels)
          case _ =>
            val f = decodeStub(id, b)
            MixedRow(id, "bin", f.byte_sum_64, f.n_bytes)
        }
      })
  }
}
