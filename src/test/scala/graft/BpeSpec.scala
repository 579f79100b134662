package graft

import graft.ext.Bpe
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** BPE training must reproduce the classic greedy merge procedure
  * exactly: every law here grades the distributed implementation
  * against a straight-line local reference (pair stats, the learned
  * merge sequence under the deterministic tie-break, and encoding),
  * plus the lossless-per-word and determinism contracts.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- local reference implementation (Sennrich-style) ----

  private def refWords(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  private def refPairStats(docs: Seq[String]): Map[String, Long] =
    refWords(docs).toSeq
      .filter(_._1.length >= 2)
      .flatMap { case (w, c) => w.sliding(2).map(_ -> c) }
      .groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }

  private def scan(s: Vector[String], a: String, b: String): Vector[String] =
    s.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  private def refLearn(
      docs: Seq[String], k: Int, minCount: Long = 2L): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] = refWords(docs).toSeq
      .map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < k) {
      val pairs = words.flatMap { case (s, c) =>
        s.zip(s.drop(1)).map(p => p -> c)
      }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
      val best = pairs.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= minCount =>
          merges += ((a, b))
          words = words.map { case (s, c) => (scan(s, a, b), c) }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  private def refEncode(doc: String, merges: Seq[(String, String)]): Seq[String] =
    doc.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toVector) {
        case (syms, (a, b)) => scan(syms, a, b)
      }
    }

  private def docsDf(docs: Seq[String]): DataFrame =
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  // the classic BPE teaching corpus
  private val classic = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest")

  test("pairStats equals the local reference, including repeated-char windows") {
    val docs = classic :+ "aaa aaa bb"
    val got = Bpe.pairStats(docsDf(docs), "text")
      .as[(String, Long)].collect().toMap
    assert(got === refPairStats(docs))
    // "aaa" contributes the aa window twice per occurrence
    assert(got("aa") === 4L)
  }

  test("learn reproduces the reference merge sequence on the classic corpus") {
    val got = Bpe.learn(docsDf(classic), "text", numMerges = 8)
    val want = refLearn(classic, 8)
    assert(got === want)
    // first merge must be the most frequent pair: 'es' (newest x6 + widest x3)
    assert(got.head === ("e", "s"))
    // merges chain onto earlier merges ('es' + 't' -> 'est')
    assert(got.contains(("es", "t")))
  }

  test("learn/encode parity with the reference on a randomized corpus") {
    val rnd = new Random(42)
    val alphabet = "abcd"
    def word() = (1 to (1 + rnd.nextInt(6)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = Seq.fill(30)(Seq.fill(1 + rnd.nextInt(8))(word()).mkString(" "))
    val merges = Bpe.learn(docsDf(docs), "text", numMerges = 10)
    assert(merges === refLearn(docs, 10))
    val enc = Bpe.encode(docsDf(docs), merges)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])]
      .collect().toMap
    for ((doc, i) <- docs.zipWithIndex)
      assert(enc(i.toLong) === refEncode(doc, merges), s"doc $i: '$doc'")
  }

  test("encode is lossless per word and handles edge shapes") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val df = docsDf(Seq("low slow glow", "", "x", "  low  "))
    val enc = Bpe.encode(df, merges)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    assert(enc(0L) === Seq("low", "s", "low", "g", "low"))
    assert(enc(1L) === Seq.empty)          // empty doc -> no tokens
    assert(enc(2L) === Seq("x"))           // single char word
    assert(enc(3L) === Seq("low"))         // surrounding whitespace dropped
    // losslessness: concatenated tokens reproduce the whitespace-split words
    val doc = "low slow glow"
    assert(enc(0L).mkString === doc.split(" ").mkString)
  }

  test("empty merge list encodes to plain characters; learn is deterministic") {
    val df = docsDf(Seq("ab cd"))
    val enc = Bpe.encode(df, Seq.empty)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(enc === Seq("a", "b", "c", "d"))
    val docs = classic
    assert(Bpe.learn(docsDf(docs), "text", numMerges = 5) ===
      Bpe.learn(docsDf(docs), "text", numMerges = 5))
  }

  // ---- encodeRank: the vocabulary-scale apply path ----

  test("encodeRank parity with encode and the reference at 8 trained merges") {
    val rnd = new Random(7)
    val alphabet = "abcde"
    def word() = (1 to (1 + rnd.nextInt(7)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = Seq.fill(40)(Seq.fill(1 + rnd.nextInt(9))(word()).mkString(" "))
    val merges = Bpe.learn(docsDf(docs), "text", numMerges = 8)
    assert(merges.nonEmpty)
    val viaRegex = Bpe.encode(docsDf(docs), merges)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    val viaRank = Bpe.encodeRank(docsDf(docs), merges)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    for ((doc, i) <- docs.zipWithIndex) {
      assert(viaRank(i.toLong) === viaRegex(i.toLong), s"doc $i: '$doc'")
      assert(viaRank(i.toLong) === refEncode(doc, merges), s"doc $i: '$doc'")
    }
  }

  test("encodeRank parity at a 500+-merge vocabulary") {
    // the regime encodeRank exists for. Training 500 merges through
    // Spark would run 500 tiny jobs, so the merge table comes from
    // the in-memory reference learner — same greedy procedure, same
    // "components exist only after earlier merges" invariant every
    // trained table has (the invariant the rank-loop/regex-chain
    // equivalence rests on). minCount=1 keeps merging into the long
    // tail until the table passes 500.
    val rnd = new Random(11)
    val alphabet = "abcdefgh"
    def word() = (2 to (3 + rnd.nextInt(8)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = Seq.fill(120)(Seq.fill(4 + rnd.nextInt(8))(word()).mkString(" "))
    val merges = refLearn(docs, 4000, minCount = 1L)
    assert(merges.length >= 500,
      s"corpus too small to exercise vocabulary scale: ${merges.length}")
    val viaRank = Bpe.encodeRank(docsDf(docs), merges)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    for ((doc, i) <- docs.zipWithIndex)
      assert(viaRank(i.toLong) === refEncode(doc, merges), s"doc $i: '$doc'")
    // losslessness holds at full vocabulary too
    for ((doc, i) <- docs.zipWithIndex)
      assert(viaRank(i.toLong).mkString === doc.split("\\s+").filter(_.nonEmpty).mkString)
  }

  test("encodeRank plan size is FLAT in the merge count; encode's grows per merge") {
    val docs = docsDf(Seq("low lower lowest"))
    val m8 = (1 to 8).map(i => (s"$i", "x"))
    val m500 = (1 to 500).map(i => (s"$i", "x"))
    // measured on the ANALYZED plan: over a local relation the
    // optimizer may evaluate the whole projection away, hiding the
    // expression tree this test exists to measure
    def planLines(df: DataFrame): Int =
      df.queryExecution.analyzed.numberedTreeString.linesIterator.size
    def exprChars(df: DataFrame): Int =
      df.queryExecution.analyzed.expressions.map(_.treeString.length).sum
    // ONE expression node regardless of vocabulary: identical plan
    assert(planLines(Bpe.encodeRank(docs, m8)) ===
      planLines(Bpe.encodeRank(docs, m500)))
    // the only width delta allowed is the "merges=N" label itself
    // (the table never inlines into the plan string)
    assert(math.abs(exprChars(Bpe.encodeRank(docs, m8)) -
      exprChars(Bpe.encodeRank(docs, m500))) < 16)
    // the regex chain is the documented anti-scale shape: one node
    // per merge — at 500 merges the nested Column tree already
    // overflows the Column->Expression converter's stack before a
    // plan even exists (this is WHY encodeRank exists), so the
    // growth pin runs at 8 vs 64
    val m64 = (1 to 64).map(i => (s"$i", "x"))
    assert(exprChars(Bpe.encode(docs, m64)) >
      exprChars(Bpe.encode(docs, m8)) * 4)
  }

  test("encodeRank edge shapes match encode") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val df = docsDf(Seq("low slow glow", "", "x", "  low  "))
    val enc = Bpe.encodeRank(df, merges)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    assert(enc(0L) === Seq("low", "s", "low", "g", "low"))
    assert(enc(1L) === Seq.empty)
    assert(enc(2L) === Seq("x"))
    assert(enc(3L) === Seq("low"))
    // empty merge table -> plain characters
    val plain = Bpe.encodeRank(docsDf(Seq("ab cd")), Seq.empty)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(plain === Seq("a", "b", "c", "d"))
    // overlap rule: "aaa" under (a,a) merges leftmost-first
    val tri = Bpe.encodeRank(docsDf(Seq("aaa", "aaaa")), Seq(("a", "a")))
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    assert(tri(0L) === Seq("aa", "a"))
    assert(tri(1L) === Seq("aa", "aa"))
  }

  test("learn stops when no pair reaches minCount") {
    // every word unique and length 2: each pair count is 1 < default minCount
    val merges = Bpe.learn(docsDf(Seq("ab cd ef")), "text", numMerges = 5)
    assert(merges === Seq.empty)
  }
}
