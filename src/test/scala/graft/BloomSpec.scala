package graft

import graft.functions.BloomSketch
import graft.operators.BloomJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom build/probe: zero false negatives (the correctness half),
  * false-positive rate within sizing bounds (the efficiency half),
  * partition-split build determinism, null semantics on both sides,
  * codegen/interpreted agreement, and the prefiltered join's
  * identity with the plain join. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def buildBytes(keys: Seq[Long], parts: Int): Array[Byte] =
    spark.createDataset(keys).toDF("k").repartition(parts)
      .select(BloomSketch.buildFor(col("k"), keys.size.toLong.max(1), 0.01).as("bf"))
      .head().getAs[Array[Byte]](0)

  test("no false negatives, and the build is partition-split deterministic") {
    val keys = (0L until 5000L).map(_ * 7919L)
    val one = buildBytes(keys, 1)
    val eight = buildBytes(keys, 8)
    assert(java.util.Arrays.equals(one, eight),
      "bitset OR across partial buffers must equal the single-partition build")
    val probed = spark.createDataset(keys).toDF("k")
      .where(BloomSketch.mightContain(one, col("k"))).count()
    assert(probed == keys.size, "a bloom can never reject a member")
  }

  test("false-positive rate honors the sizing math") {
    val keys = (0L until 5000L).map(_ * 7919L)
    val bf = buildBytes(keys, 4)
    val outside = (1L to 20000L).map(_ * 104729L + 13L)
    val fp = spark.createDataset(outside).toDF("k")
      .where(BloomSketch.mightContain(bf, col("k"))).count()
    val rate = fp.toDouble / outside.size
    assert(rate < 0.03, s"fpp sized for 1%, measured $rate")
  }

  test("nulls: never admitted to the build, probe false, filter drops them") {
    val bf = spark.createDataset(Seq[Option[Long]](Some(1L), None, Some(2L)))
      .toDF("k")
      .select(BloomSketch.buildFor(col("k"), 2, 0.01).as("bf"))
      .head().getAs[Array[Byte]](0)
    val probed = spark.createDataset(Seq[Option[Long]](Some(1L), None, Some(99L)))
      .toDF("k").where(BloomSketch.mightContain(bf, col("k")))
      .collect().map(_.get(0))
    assert(probed.toSeq == Seq(1L), "member passes, null and non-member drop")
  }

  test("interpreted eval agrees with the codegen path") {
    val keys = (0L until 500L).map(_ * 31L)
    val bf = buildBytes(keys, 2)
    val (k, words) = BloomSketch.fromBytes(bf)
    val df = spark.range(0L, 20000L).toDF("k")
    val viaPlan = df.where(BloomSketch.mightContain(bf, col("k")))
      .collect().map(_.getLong(0)).toSet
    val viaScala = (0L until 20000L).filter { v =>
      // mirror of mightContain's null-preserving xxhash64 on a
      // non-null input
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, org.apache.spark.sql.types.LongType, 42L)
      BloomSketch.contains(words, h, k)
    }.toSet
    assert(viaPlan == viaScala)
  }

  test("prefiltered join == plain join, with real fact-side reduction") {
    val fact = spark.range(0L, 20000L)
      .select(col("id").as("fk"), (col("id") * 3).as("payload"))
    val dim = spark.range(0L, 20000L).where(col("id") % 50 === 0)
      .select(col("id").as("dk"), (col("id") % 7).as("attr"))
    val plain = fact.join(dim, col("fk") === col("dk"), "inner")
      .collect().map(_.toSeq).toSet
    val bloomed = BloomJoin.join(fact, "fk", dim, "dk", 400, 0.01)
      .collect().map(_.toSeq).toSet
    assert(bloomed == plain)
    val surviving = BloomJoin.prefilter(fact, "fk", dim, "dk", 400, 0.01).count()
    assert(surviving < 1000,
      s"2%-selective dim must cut the fact side hard, kept $surviving of 20000")
  }

  test("sizing: optimal m/k, word-aligned, clamped") {
    val (m1, k1) = BloomSketch.sized(1000, 0.01)
    assert(m1 % 64 == 0 && m1 >= 9000 && m1 <= 10240) // ~9.59 bits/key
    assert(k1 >= 6 && k1 <= 8)                        // ~6.6 hashes
    intercept[IllegalArgumentException](BloomSketch.sized(0, 0.01))
    intercept[IllegalArgumentException](BloomSketch.sized(10, 1.5))
  }
}
