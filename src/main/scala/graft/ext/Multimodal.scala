package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.4): media payloads ride
  * as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs as a partition-batched typed transformation.
  *
  * The Spark-side plumbing — schema, typed Dataset boundary,
  * partition batching, decoder lifecycle — is real and tested. The
  * decoder itself is a clearly-marked deterministic STUB
  * (`FakeDecoder`): the image/audio codec libraries are not in this
  * environment. A real deployment swaps `FakeDecoder` for a codec
  * binding; nothing else changes.
  *
  * Scale shape: `mapPartitions` is the right boundary for decode
  * because a real decoder has per-process setup cost (native lib
  * init, GPU context) that must amortize across a partition batch,
  * exactly like a Pandas-UDF `mapInPandas` batch on the Python side.
  * The work is per-row, shuffle-free, and the binary payloads never
  * leave their input partition.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long)

  /** Decoder contract: bytes → metadata/features. */
  trait Decoder extends Serializable {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta
  }

  /** STUB decoder — deterministic fake dimensions derived from the
    * payload size, so tests (and the SQL oracle) can replay it with
    * plain arithmetic. A real build replaces this with an actual
    * codec (e.g. JNI image decode); the pipeline shape is identical. */
  object FakeDecoder extends Decoder {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      MediaMeta(
        doc_id = docId,
        n_bytes = n,
        width = 64L + n % 640L,
        height = 64L + (n * 31L) % 480L,
        n_frames = n % 16L)
    }
  }

  final case class HeaderMeta(
      doc_id: Long,
      format: String,
      width: Long,
      height: Long)

  /** REAL container-header parsing — no codec library involved, so
    * nothing here is stubbed: image dimensions live in the first few
    * bytes of every mainstream container, and reading them is pure
    * byte arithmetic. This is the production fast path for corpus
    * audit (resolution filters, aspect-ratio stats, thumbnail
    * planning) — full pixel decode stays behind [[Decoder]].
    *
    *  - PNG: 8-byte signature, then the IHDR chunk fixes width and
    *    height as big-endian u32 at offsets 16 and 20,
    *  - GIF (87a/97a): little-endian u16 at offsets 6 and 8,
    *  - JPEG: segment walk from SOI to the first frame header
    *    (SOF0–SOF15 minus DHT/DAC/RST), height/width big-endian u16
    *    at +5/+7 inside it — APP/COM segments of any length skip by
    *    their declared size,
    *  - anything else (or truncated): `("unknown", -1, -1)` — audit
    *    rows, never exceptions (quarantine-not-crash, §1.3).
    */
  object HeaderParser extends Serializable {
    private def beU32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def beU16(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 8) | (b(i + 1) & 0xffL)
    private def leU16(b: Array[Byte], i: Int): Long =
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

    private val PngSig =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    def parse(docId: Long, bytes: Array[Byte]): HeaderMeta = {
      def unknown = HeaderMeta(docId, "unknown", -1L, -1L)
      if (bytes == null) unknown
      else if (bytes.length >= 24 && bytes.startsWith(PngSig))
        HeaderMeta(docId, "png", beU32(bytes, 16), beU32(bytes, 20))
      else if (bytes.length >= 10 &&
          bytes.startsWith("GIF8".getBytes("US-ASCII")))
        HeaderMeta(docId, "gif", leU16(bytes, 6), leU16(bytes, 8))
      else if (bytes.length >= 4 &&
          (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
        var i = 2
        while (i + 9 < bytes.length && (bytes(i) & 0xff) == 0xff) {
          val marker = bytes(i + 1) & 0xff
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof)
            return HeaderMeta(docId, "jpeg", beU16(bytes, i + 7), beU16(bytes, i + 5))
          i += 2 + beU16(bytes, i + 2).toInt
        }
        unknown
      } else unknown
    }
  }

  /** Partition-batched REAL header parse: (doc_id, media) →
    * (doc_id, format, width, height). Shuffle-free; payload bytes
    * never leave their partition. */
  def parseHeaders(spark: SparkSession, media: DataFrame): Dataset[HeaderMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(r => HeaderParser.parse(r.doc_id, r.media)))
  }

  /** Binary-column ingestion: any string payload column → opaque
    * binary + byte length (the pass-through posture of §1.3 extended
    * with explicit media typing). */
  def asMedia(docs: DataFrame, idCol: String = "doc_id", payloadCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("media"))

  /** Partition-batched decode through the typed Dataset boundary. */
  def decodeMeta(spark: SparkSession, media: DataFrame, decoder: Decoder = FakeDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // Per-partition decoder setup would run here (native init);
      // FakeDecoder needs none.
      rows.map(r => decoder.decode(r.doc_id, r.media))
    }
  }

  final case class FrameRow(
      doc_id: Long,
      frame_idx: Long,
      byte_offset: Long)

  /** Frame sampling for video-shaped payloads: every `everyN`-th
    * frame of each media row becomes its own output row (one-to-many
    * through the typed boundary — the flatMap shape a real frame
    * extractor has). Frame count and offsets come from the
    * deterministic stub geometry (`n_frames = n_bytes % 16`,
    * fixed-size frames), so an arithmetic oracle can replay the
    * output exactly. */
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame,
      everyN: Int = 2): Dataset[FrameRow] = {
    import spark.implicits._
    require(everyN > 0)
    media.as[MediaRow].flatMap { r =>
      val meta = FakeDecoder.decode(r.doc_id, r.media)
      (0L until meta.n_frames by everyN.toLong).map { f =>
        FrameRow(r.doc_id, f, f * 4096L) // fake fixed-size frames
      }
    }
  }
}
