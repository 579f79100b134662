package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Acoustic-fingerprint near-duplicate detection for WAV-shaped
  * binary payloads — the audio member of the multimodal dedup family
  * ([[ImageDedup]] for images, [[SimHash]] for text): a compact
  * energy-profile fingerprint per recording, candidate pairs via the
  * SAME 4-chunk pigeonhole block join ([[HammingBlocking]]).
  *
  * Fingerprint (the aHash construction over [[Multimodal.pcmEnergy]]
  * output, per the loudness-profile family of audio fingerprints):
  * the PCM16 stream splits into windows of `window` samples; window
  * w's energy is Σ sample² (exact integer); the hash samples `bits`
  * windows across the recording (`floor(i * nWindows / bits)` — any
  * duration yields a fixed-width fingerprint) and sets bit i iff the
  * sampled energy lies STRICTLY above the integer mean of the
  * sampled energies (`e * bits > total` — no float threshold crosses
  * the engine boundary, so an external oracle replays the hash
  * exactly). Loudness-profile hashes are gain-sensitive but
  * phase/codec-layout robust; a global gain change scales every
  * window energy by the same factor, which the mean test largely
  * cancels.
  *
  * Byte reality: hashing starts from the RAW RIFF container —
  * [[Multimodal.WavParser.pcm16DataChunk]] locates the PCM16 data
  * chunk (non-PCM, truncated, or garbage containers hash to 0: audit
  * rows, never exceptions) and the sample arithmetic is the same
  * sign-extending little-endian byte walk as [[Multimodal.pcmEnergy]].
  *
  * Scale shape: hashing is a shuffle-free `mapPartitions` byte loop
  * (payloads never leave their input partition); pairing is the
  * corpus-linear blocked join — never all-pairs. */
object AudioDedup {

  /** Energy-profile hash of one WAV container. 0 for anything the
    * PCM16 parser rejects (the audit posture). */
  def energyHashBytes(bytes: Array[Byte], window: Int, bits: Int): Long = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(bits >= 4 && bits <= 64, s"bits must be in [4, 64], got $bits")
    Multimodal.WavParser.pcm16DataChunk(bytes) match {
      case None => 0L
      case Some((off, len)) =>
        val n = len / 2
        if (n == 0) return 0L
        val nw = (n + window - 1) / window
        val energies = new Array[Long](nw)
        var j = 0
        while (j < n) {
          val lo = bytes(off + 2 * j) & 0xff
          val hi = bytes(off + 2 * j + 1)
          val v = (hi << 8) | lo // sign-extends through hi
          energies(j / window) += v.toLong * v
          j += 1
        }
        val sampled = new Array[Long](bits)
        var sum = 0L
        var i = 0
        while (i < bits) {
          sampled(i) = energies(((i.toLong * nw) / bits).toInt)
          sum += sampled(i)
          i += 1
        }
        var h = 0L
        i = 0
        while (i < bits) {
          if (sampled(i) * bits > sum) h |= (1L << i)
          i += 1
        }
        h
    }
  }

  /** (doc_id, phash) for every media row — shuffle-free partition
    * loop over (doc_id, media) input; feeds
    * [[HammingBlocking.nearDupPairs]]. */
  def energyHashes(
      spark: SparkSession,
      media: DataFrame,
      window: Int = 64,
      bits: Int = 60): Dataset[ImageDedup.ImageHash] = {
    import spark.implicits._
    media.as[Multimodal.MediaRow].mapPartitions(_.map(r =>
      ImageDedup.ImageHash(r.doc_id, energyHashBytes(r.media, window, bits))))
  }

  /** Near-duplicate recording pairs — the shared pigeonhole join. */
  def nearDupPairs(
      hashes: DataFrame,
      maxHamming: Int = 3,
      bits: Int = 60): DataFrame =
    HammingBlocking.nearDupPairs(hashes, maxHamming, bits)

  /** Incremental delta-vs-corpus form — see
    * [[HammingBlocking.nearDupPairsAgainst]]. */
  def nearDupPairsAgainst(
      deltaHashes: DataFrame,
      corpusHashes: DataFrame,
      maxHamming: Int = 3,
      bits: Int = 60): DataFrame =
    HammingBlocking.nearDupPairsAgainst(
      deltaHashes, corpusHashes, maxHamming, bits)
}
