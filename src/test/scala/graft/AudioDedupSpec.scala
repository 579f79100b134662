package graft

import graft.ext.{AudioDedup, HammingBlocking, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Energy-profile audio fingerprinting: hash bit semantics pinned
  * against hand-computed window energies, the audit posture for
  * non-WAV payloads, and the shared pigeonhole pairing pinned
  * against the brute-force all-pairs truth. */
class AudioDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def wav(samples: Short*): Array[Byte] =
    Multimodal.buildPcm16Wav(samples.toArray)

  test("energy hash: per-window Σ sample², integer mean test, hand-computed") {
    // windows of 2 over 8 samples: energies [2, 18, 2, 2]; nw = 4 =
    // bits (identity sampling); total 24; bit i iff e*4 > 24 ⇔ e > 6
    // → only window 1 → 0b0010
    val b = wav(1, 1, 3, 3, 1, 1, 1, 1)
    assert(AudioDedup.energyHashBytes(b, window = 2, bits = 4) === 2L)
    // uniform energies: nothing strictly above the mean → 0
    assert(AudioDedup.energyHashBytes(
      wav(2, 2, 2, 2, 2, 2, 2, 2), window = 2, bits = 4) === 0L)
    // negative samples square positive: [-3,-3] ≡ [3,3]
    assert(AudioDedup.energyHashBytes(
      wav(1, 1, -3, -3, 1, 1, 1, 1), window = 2, bits = 4) === 2L)
  }

  test("energy hash: window sampling fixes the width for any duration") {
    // 16 samples, window 2 → 8 windows; bits 4 samples windows at
    // floor(i*8/4) = 0,2,4,6. Loud window 1 is SKIPPED by sampling;
    // loud window 2 lands in sampled slot 1.
    val quiet = Seq.fill(4)(Seq[Short](1, 1)).flatten
    val samples = (Seq[Short](1, 1) ++ Seq[Short](9, 9) ++
      Seq[Short](7, 7) ++ Seq[Short](1, 1) ++ quiet).toArray
    val h = AudioDedup.energyHashBytes(wav(samples: _*), window = 2, bits = 4)
    // sampled energies: w0=2, w2=98, w4=2, w6=2 → total 104; bit i
    // iff e*4 > 104 ⇔ e > 26 → only sampled slot 1 (window 2)
    assert(h === 2L)
  }

  test("non-WAV / non-PCM / empty payloads hash to 0 — audit rows") {
    assert(AudioDedup.energyHashBytes(null, 4, 60) === 0L)
    assert(AudioDedup.energyHashBytes("not audio".getBytes, 4, 60) === 0L)
    assert(AudioDedup.energyHashBytes(
      Multimodal.buildPcm16Wav(Array.empty[Short]), 4, 60) === 0L)
    // IEEE-float format tag: parser refuses, hash audits to 0
    val nonPcm = wav(1, 2, 3, 4)
    nonPcm(20) = 3
    assert(AudioDedup.energyHashBytes(nonPcm, 2, 4) === 0L)
  }

  test("pairs over real WAV bytes equal the brute-force truth, within families") {
    // 3 families of 4 recordings: family base signal, each non-zero
    // member gain-shifts one window hard
    val rows = for (g <- 0 until 3; k <- 0 until 4) yield {
      val samples = Array.tabulate[Short](48) { j =>
        val base = ((g * 7 + 1) * (j * 5 + 3)) % 1024
        val v = if (k > 0 && j / 4 == k + 2) base + 900 else base
        v.toShort
      }
      (g * 10L + k, Multimodal.buildPcm16Wav(samples))
    }
    val media = rows.toDF("doc_id", "media")
    val hashes = AudioDedup.energyHashes(spark, media, window = 4, bits = 12)
      .toDF().localCheckpoint(true)
    val pairs = AudioDedup.nearDupPairs(hashes, maxHamming = 3, bits = 12)
      .as[(Long, Long, Long)].collect()
    val hs = hashes.as[(Long, Long)].collect()
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(pairs.toSet === want)
    // perturbed members stay near their family base: every family
    // must contribute at least one within-family pair (cross-family
    // coincidences at 12 bits are possible and fine — the
    // brute-force equality above is the operator's contract)
    val withinFamilies = pairs.filter { case (a, b, _) => a / 10 == b / 10 }
      .map(_._1 / 10).toSet
    assert(withinFamilies === Set(0L, 1L, 2L))
    // the shared blocking plans as an equi join, never a cartesian
    val q = HammingBlocking.nearDupPairs(hashes, 3, 12)
    val bad = q.queryExecution.executedPlan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty)
  }
}
