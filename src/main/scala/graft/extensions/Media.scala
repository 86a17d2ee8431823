package graft.extensions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.F): media payloads as opaque
  * `BINARY` columns with a typed metadata struct, and a batched
  * feature-extraction pass over `mapPartitions`.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * container): `decodeStub` derives deterministic pseudo-features from the
  * raw bytes. Everything around it — schema, typed Dataset, partition-wise
  * batching, feature struct — is the real pipeline a codec would slot into:
  * replace `decodeStub`'s body with the JNI/codec call and nothing else
  * changes. Executor-side batching (one iterator pass per partition, zero
  * driver collection) is exactly the mapInPandas/Arrow batch shape of the
  * Python equivalent.
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
}
