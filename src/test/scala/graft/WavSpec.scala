package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.{WavMeta, WavParser}
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input matrix for the RIFF/WAV chunk walker — the audio
  * sibling of ExtensionsSpec's HeaderParser cases. The contract under
  * test: adversarial or corrupt payloads degrade to the `unknown`
  * audit row (`WavMeta(_, "unknown", -1, -1, -1, -1)` / a single
  * `EnergyRow(_, -1, -1, -1)`), NEVER an exception — at 100 TB a
  * single poisoned container must not fail the job. */
class WavSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def wav(n: Int = 200): Array[Byte] =
    Multimodal.buildPcm16Wav(
      Array.tabulate[Short](n)(j => ((j * 17) % 4096 - 2048).toShort))

  private def leInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def leShort(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def isUnknown(m: WavMeta): Boolean =
    m.format == "unknown" && m.n_channels == -1L && m.sample_rate == -1L &&
      m.bits_per_sample == -1L && m.n_samples == -1L

  test("happy path: canonical PCM16 mono parses exactly") {
    val m = WavParser.parse(1L, wav(200))
    assert(m === WavMeta(1L, "wav", 1L, 16000L, 16L, 200L))
    assert(WavParser.pcm16DataChunk(wav(200)).contains((44, 400)))
  }

  test("null and short payloads -> unknown, no exception") {
    assert(isUnknown(WavParser.parse(2L, null)))
    assert(isUnknown(WavParser.parse(3L, Array.emptyByteArray)))
    assert(isUnknown(WavParser.parse(4L, wav().take(43)))) // below min container
  }

  test("truncated mid-chunk-header -> unknown") {
    // Cut inside the data chunk's 8-byte header: the declared size
    // now points past the buffer, so the walker must bail to None.
    val full = wav(200)
    assert(isUnknown(WavParser.parse(5L, full.take(44 + 100))))
    // Cut inside the fmt chunk itself.
    assert(isUnknown(WavParser.parse(6L, full.take(20))))
  }

  test("declared chunk size near Int.MaxValue does not overflow the bounds check") {
    // ADVICE r10: `i + 8 + size` in Int arithmetic wraps negative for
    // size ~ Int.MaxValue, sneaking an out-of-range length past the
    // check and making pcmEnergy throw ArrayIndexOutOfBounds. The
    // check is now done in Long arithmetic.
    val b = wav(200)
    leInt(b, 40, Int.MaxValue - 4) // data chunk size
    assert(WavParser.dataChunk(b).isEmpty)
    assert(isUnknown(WavParser.parse(7L, b)))
    val c = wav(200)
    leInt(c, 16, Int.MaxValue - 4) // fmt chunk size
    assert(WavParser.fmtChunk(c).isEmpty)
    assert(isUnknown(WavParser.parse(8L, c)))
  }

  test("odd-size junk chunk is skipped with RIFF pad byte") {
    // RIFF chunks pad to even offsets: a 7-byte LIST chunk occupies
    // 8 + 7 + 1 bytes. A walker that forgets the pad lands mid-chunk
    // and never finds `data`.
    val base = wav(10)
    val junk = new Array[Byte](8 + 7 + 1)
    "LIST".getBytes("US-ASCII").copyToArray(junk, 0)
    leInt(junk, 4, 7)
    val out = new Array[Byte](base.length + junk.length)
    base.copyToArray(out, 0, 12) // RIFF header
    junk.copyToArray(out, 12)
    System.arraycopy(base, 12, out, 12 + junk.length, base.length - 12)
    leInt(out, 4, out.length - 8) // fix RIFF size
    val m = WavParser.parse(9L, out)
    assert(m === WavMeta(9L, "wav", 1L, 16000L, 16L, 10L))
  }

  test("non-PCM audio_format -> unknown; pcm16DataChunk refuses it") {
    val b = wav(50)
    leShort(b, 20, 3) // IEEE float format tag
    assert(isUnknown(WavParser.parse(10L, b)))
    assert(WavParser.pcm16DataChunk(b).isEmpty)
    val c = wav(50)
    leShort(c, 34, 8) // 8-bit samples: fmt parses but energy math is invalid
    assert(WavParser.pcm16DataChunk(c).isEmpty)
  }

  test("missing data chunk -> unknown") {
    // Rename the data chunk's tag: the walker skips it as an unknown
    // chunk, reaches end-of-buffer, and reports no data chunk — the
    // container stays >= 44 bytes so the walk itself is exercised.
    val b = wav(50)
    "junk".getBytes("US-ASCII").copyToArray(b, 36)
    assert(WavParser.dataChunk(b).isEmpty)
    assert(isUnknown(WavParser.parse(11L, b)))
  }

  test("zero-length data chunk -> unknown") {
    val b = Multimodal.buildPcm16Wav(Array.empty[Short])
    assert(isUnknown(WavParser.parse(12L, b)))
    assert(WavParser.pcm16DataChunk(b).isEmpty)
  }

  test("garbage bytes -> unknown") {
    assert(isUnknown(WavParser.parse(13L, "definitely not a wav file".getBytes)))
    val riffOnly = "RIFFxxxxNOPE".getBytes("US-ASCII")
    assert(isUnknown(WavParser.parse(14L, riffOnly)))
  }

  test("pcmEnergy: every malformed payload is one audit row, never an exception") {
    import spark.implicits._
    val overflow = wav(50); leInt(overflow, 40, Int.MaxValue - 4)
    val nonPcm = wav(50); leShort(nonPcm, 20, 3)
    val rows = Seq(
      Multimodal.MediaRow(1L, wav(200)), // the one valid container
      Multimodal.MediaRow(2L, "garbage".getBytes),
      Multimodal.MediaRow(3L, wav(200).take(47)),
      Multimodal.MediaRow(4L, overflow),
      Multimodal.MediaRow(5L, nonPcm),
      Multimodal.MediaRow(6L, Multimodal.buildPcm16Wav(Array.empty[Short])))
    val out = Multimodal.pcmEnergy(spark, rows.toDF(), window = 64)
      .collect().groupBy(_.doc_id)
    assert(out(1L).forall(_.energy >= 0) && out(1L).length == 4) // 200/64 windows
    for (id <- 2L to 6L) {
      assert(out(id).length == 1)
      assert(out(id).head.window_idx == -1L && out(id).head.energy == -1L)
    }
  }
}
