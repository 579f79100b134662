package graft

import graft.ext.ImageDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash image dedup: hash bit semantics pinned against
  * hand-computed values, the pigeonhole block join pinned against
  * the brute-force all-pairs truth, and the plan pinned blocked (an
  * equality join, never a cartesian). */
class ImageDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("aHash: integer mean test, bit per sample, hand-computed") {
    // 8 samples over an 8-byte payload (identity sampling):
    // values 10,10,10,10,200,200,200,200 → sum 840; bit i set iff
    // v*8 > 840 ⇔ v > 105 → bits 4..7
    val b = Array[Byte](10, 10, 10, 10, 200.toByte, 200.toByte, 200.toByte, 200.toByte)
    assert(ImageDedup.aHashBytes(b, 8) === 0xf0L)
    // uniform payload: nothing is strictly above the mean → 0
    assert(ImageDedup.aHashBytes(Array.fill[Byte](8)(42), 8) === 0L)
    // unsigned read: 0xff must count as 255, not -1
    val c = Array[Byte](0, 0, 0, 0, 0, 0, 0, 0xff.toByte)
    assert(ImageDedup.aHashBytes(c, 8) === 0x80L)
  }

  test("aHash: sampling fixes the width regardless of payload length") {
    // 16-byte payload, 8 samples at floor(i*16/8) = even positions
    val b = (0 until 16).map(i => (if (i % 2 == 0) 200 else 0).toByte).toArray
    // all even positions are 200, mean of samples = 200, none above
    assert(ImageDedup.aHashBytes(b, 8) === 0L)
    val shifted = (0 until 16).map(i => (if (i == 0) 250 else if (i % 2 == 0) 10 else 0).toByte).toArray
    // samples: 250,10,10,10,10,10,10,10 → sum 320; v*8>320 ⇔ v>40 → bit 0
    assert(ImageDedup.aHashBytes(shifted, 8) === 1L)
  }

  test("dHash: gradient bits, brightness-shift invariant") {
    // 9 samples → 8 bits; ascending run sets every bit
    val up = (0 until 9).map(i => (i * 10).toByte).toArray
    assert(ImageDedup.dHashBytes(up, 8) === 0xffL)
    val down = (0 until 9).map(i => (80 - i * 10).toByte).toArray
    assert(ImageDedup.dHashBytes(down, 8) === 0L)
    // +50 brightness leaves every gradient direction unchanged
    val brighter = up.map(v => (v + 50).toByte)
    assert(ImageDedup.dHashBytes(brighter, 8) === ImageDedup.dHashBytes(up, 8))
  }

  test("null/empty payloads hash to 0 — audit rows, not exceptions") {
    assert(ImageDedup.aHashBytes(null, 8) === 0L)
    assert(ImageDedup.aHashBytes(Array.empty[Byte], 8) === 0L)
    assert(ImageDedup.dHashBytes(null, 8) === 0L)
  }

  test("pigeonhole block join equals the brute-force all-pairs truth") {
    // hashes engineered around the chunk boundaries of bits=64
    // (4 chunks x 16): distances 0..6 present, including a pair at
    // EXACTLY maxHamming and a pair one past it
    val hs: Seq[(Long, Long)] = Seq(
      1L -> 0x0000000000000000L,
      2L -> 0x0000000000000001L, // d(1,2)=1
      3L -> 0x0000000000000007L, // d(1,3)=3, d(2,3)=2
      4L -> 0x000000000000000fL, // d(1,4)=4 — excluded
      5L -> 0x1111000000000000L, // far from everyone
      6L -> 0x1111000000000001L, // d(5,6)=1
      7L -> 0x8000000000000000L  // sign bit: shiftright must be logical-safe via mask
    )
    val df = hs.toDF("doc_id", "phash")
    val got = ImageDedup.nearDupPairs(df, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === want, s"got $got want $want")
  }

  test("the blocking plan is an equality join, never a cartesian") {
    val df = (1L to 50L).map(i => (i, i * 1024L)).toDF("doc_id", "phash")
    val q = ImageDedup.nearDupPairs(df)
    val bad = q.queryExecution.executedPlan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty,
      s"pigeonhole blocking must plan as an equi join:\n${q.queryExecution.executedPlan}")
  }

  test("incremental delta-vs-corpus pairs equal brute force, never corpus self-pairs") {
    // corpus holds two near-identical families; the delta carries one
    // twin of each plus one stranger
    val corpus: Seq[(Long, Long)] = Seq(
      10L -> 0x0000000000000000L, 11L -> 0x0000000000000001L,
      20L -> 0x7777000000000000L, 21L -> 0x7777000000000003L,
      30L -> 0x123456789abcdefL)
    val delta: Seq[(Long, Long)] = Seq(
      100L -> 0x0000000000000003L, // near family 1
      200L -> 0x7777000000000001L, // near family 2
      300L -> 0x5555555555555555L) // stranger
    val got = ImageDedup.nearDupPairsAgainst(
        delta.toDF("doc_id", "phash"), corpus.toDF("doc_id", "phash"))
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (d, hd) <- delta; (c, hc) <- corpus
      dist = java.lang.Long.bitCount(hd ^ hc) if dist <= 3
    } yield (d, c, dist.toLong)).toSet
    assert(got === want, s"got $got want $want")
    // corpus self-pairs (10, 11) and (20, 21) are within distance 3
    // but must NOT appear — the incremental form never re-pairs the
    // already-deduplicated corpus
    assert(!got.exists { case (a, b, _) => a < 100L || b >= 100L })
    assert(!got.exists(_._1 == 300L), "the stranger pairs with nothing")
  }

  test("dHashes composes with nearDupPairs at DEFAULTS (ADVICE r10 footgun)") {
    // r10 shipped dHashes with bits = 63, which nearDupPairs'
    // `bits % 4 == 0` requirement rejects — the documented pipeline
    // threw at its own defaults. Now: default 60-bit dHash output
    // feeds the pairing step directly at its own width.
    val rows = for (g <- 0 until 2; k <- 0 until 3) yield {
      val base = Array.tabulate[Byte](64)(i => ((g * 91 + i * 13) % 256).toByte)
      if (k > 0) base(k * 7) = ((base(k * 7) & 0xff) + 128).toByte
      (g * 10L + k, base)
    }
    val media = rows.toDF("doc_id", "media")
    val hashes = ImageDedup.dHashes(spark, media).toDF() // all defaults
    val pairs = ImageDedup.nearDupPairs(hashes, maxHamming = 3, bits = 60)
      .as[(Long, Long, Long)].collect()
    val hs = hashes.as[(Long, Long)].collect()
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(pairs.toSet === want)
    // and the delta form accepts the same default-width hashes
    val delta = ImageDedup.dHashes(spark, media.where(col("doc_id") === 1L)).toDF()
    val corpus = ImageDedup.dHashes(spark,
      media.where(col("doc_id") =!= 1L)).toDF()
    val got = ImageDedup.nearDupPairsAgainst(delta, corpus, maxHamming = 3, bits = 60)
      .as[(Long, Long, Long)].collect().toSet
    val wantDelta = (for {
      (a, ha) <- hs if a == 1L; (b, hb) <- hs if b != 1L
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === wantDelta)
  }

  test("end-to-end over binary payloads: perturbed copies pair up, strangers do not") {
    // 3 groups of 4 images: group members share a base byte grid,
    // each member flips one byte hard across the mean — within-group
    // Hamming stays tiny, across groups it is large
    val rows = for (g <- 0 until 3; k <- 0 until 4) yield {
      val base = Array.tabulate[Byte](64)(i => ((g * 53 + i * 17) % 256).toByte)
      if (k > 0) base(k * 5) = ((base(k * 5) & 0xff) + 128).toByte
      (g * 10L + k, base)
    }
    val media = rows.toDF("doc_id", "media")
    val hashes = ImageDedup.aHashes(spark, media, bits = 64).toDF()
    val pairs = ImageDedup.nearDupPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    // every reported pair is within one group
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, d) =>
      assert(a / 10 === b / 10, s"cross-group pair ($a, $b) at hamming $d")
    }
    // and the truth is exactly the brute-force over the same hashes
    val hs = hashes.as[(Long, Long)].collect()
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(pairs.toSet === want)
  }
}
