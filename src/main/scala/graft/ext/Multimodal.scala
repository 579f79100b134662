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

  final case class WavMeta(
      doc_id: Long,
      format: String,
      n_channels: Long,
      sample_rate: Long,
      bits_per_sample: Long,
      n_samples: Long)

  /** REAL RIFF/WAV container parsing — the audio sibling of
    * [[HeaderParser]], equally codec-free: a canonical WAV is a RIFF
    * container whose `fmt ` chunk is a plain little-endian struct
    * and whose `data` chunk length fixes the sample count. The chunk
    * walk skips unknown chunks by their declared size (LIST/INFO
    * metadata etc.); anything malformed or truncated degrades to
    * `("unknown", -1, …)` audit rows, never exceptions. */
  object WavParser extends Serializable {
    private def leU16(b: Array[Byte], i: Int): Long =
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
    private def leU32(b: Array[Byte], i: Int): Long =
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    /** Byte offset and length of the `data` chunk payload, or None. */
    private[graft] def dataChunk(b: Array[Byte]): Option[(Int, Int)] = {
      if (b == null || b.length < 44) return None
      if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12
      while (i + 8 <= b.length) {
        val id = tag(b, i)
        val size = leU32(b, i + 4).toInt
        // Long arithmetic: a declared size near Int.MaxValue would
        // wrap `i + 8 + size` negative and sneak past an Int check,
        // handing pcmEnergy an out-of-range length on adversarial
        // payloads (the contract is audit rows, never exceptions).
        if (size < 0 || i.toLong + 8L + size > b.length) return None
        if (id == "data") return Some((i + 8, size))
        i += 8 + size + (size & 1) // RIFF chunks pad to even offsets
      }
      None
    }

    private[graft] def fmtChunk(b: Array[Byte]): Option[Int] = {
      if (b == null || b.length < 44) return None
      if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12
      while (i + 8 <= b.length) {
        val id = tag(b, i)
        val size = leU32(b, i + 4).toInt
        if (size < 0 || i.toLong + 8L + size > b.length) return None
        if (id == "fmt " && size >= 16) return Some(i + 8)
        i += 8 + size + (size & 1)
      }
      None
    }

    def parse(docId: Long, bytes: Array[Byte]): WavMeta = {
      def unknown = WavMeta(docId, "unknown", -1L, -1L, -1L, -1L)
      (fmtChunk(bytes), dataChunk(bytes)) match {
        case (Some(f), Some((_, dLen))) =>
          val audioFormat = leU16(bytes, f)
          val channels = leU16(bytes, f + 2)
          val rate = leU32(bytes, f + 4)
          val bits = leU16(bytes, f + 14)
          val blockAlign = leU16(bytes, f + 12)
          // audio_format 1 = integer PCM; compressed/float formats
          // (or a zero-sample data chunk) are outside the engine's
          // codec-free contract and degrade to the audit row.
          if (audioFormat != 1L || channels < 1 || bits < 8 ||
            blockAlign < 1 || dLen == 0) unknown
          else WavMeta(docId, "wav", channels, rate, bits, dLen / blockAlign)
        case _ => unknown
      }
    }

    /** `data` chunk location, but only for containers whose `fmt `
      * chunk declares integer PCM at 16 bits — the one layout
      * [[Multimodal.pcmEnergy]]'s sample arithmetic is valid for.
      * Anything else (non-PCM format tag, 8/24-bit samples, missing
      * or empty chunks) is None, so callers degrade to audit rows
      * instead of summing garbage. */
    private[graft] def pcm16DataChunk(b: Array[Byte]): Option[(Int, Int)] =
      fmtChunk(b).flatMap { f =>
        if (leU16(b, f) != 1L || leU16(b, f + 14) != 16L) None
        else dataChunk(b).filter(_._2 > 0)
      }
  }

  /** REAL canonical-WAV writer (PCM16 LE mono) — the other half of
    * the byte round-trip the declared query grades: the engine
    * writes true RIFF bytes from arithmetic, [[WavParser]] and
    * [[pcmEnergy]] read them back out of the raw container. */
  def buildPcm16Wav(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  final case class EnergyRow(
      doc_id: Long,
      window_idx: Long,
      n_samples: Long,
      energy: Long)

  /** Windowed signal energy over PCM16 LE mono WAV payloads: per
    * window of `window` samples, Σ sample² as an exact integer (the
    * VAD / silence-trim / loudness-audit primitive). Real byte
    * arithmetic off the `data` chunk the parser located —
    * shuffle-free partition loop, payloads never leave their
    * partition; malformed containers emit a single (-1, -1, -1)
    * audit row. The trailing window runs short. */
  def pcmEnergy(
      spark: SparkSession,
      media: DataFrame,
      window: Int = 64): Dataset[EnergyRow] = {
    import spark.implicits._
    require(window >= 1, s"pcmEnergy needs window >= 1, got $window")
    media.as[MediaRow].flatMap { r =>
      WavParser.pcm16DataChunk(r.media) match {
        case None => Seq(EnergyRow(r.doc_id, -1L, -1L, -1L))
        case Some((off, len)) =>
          val n = len / 2
          (0 until n by window).map { s =>
            val e = math.min(s + window, n)
            var acc = 0L
            var j = s
            while (j < e) {
              val lo = r.media(off + 2 * j) & 0xff
              val hi = r.media(off + 2 * j + 1)
              val v = (hi << 8) | lo // sign-extends through hi
              acc += v.toLong * v
              j += 1
            }
            EnergyRow(r.doc_id, (s / window).toLong, (e - s).toLong, acc)
          }
      }
    }
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
