package graft

import graft.operators.{Dedup, SurrogateKey}
import graft.planner.Intervals
import graft.sinks.MergeUpsert
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY.md §5.4): P3 chunk tiling, K2 merge
  * idempotence + commutativity-with-dedup, T1 surrogate-key
  * stability. Driver-side planners get wide random coverage; the
  * Spark-backed properties run fewer, smaller cases. (Raw ScalaCheck
  * runner — the scalatest bridge artifact isn't in the offline
  * dependency set.)
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(cases: Int, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B], cases: Int)(
      body: (A, B) => Unit): Unit =
    check(cases, Prop.forAll(ga, gb) { (a, b) => body(a, b); true })

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], cases: Int)(
      body: (A, B, C) => Unit): Unit =
    check(cases, Prop.forAll(ga, gb, gc) { (a, b, c) => body(a, b, c); true })

  // ── P3: chunks tile [start, end] exactly — no gaps, no overlaps ──

  test("P3 int chunks tile [start, end] for arbitrary bounds and widths") {
    forAll(
      Gen.chooseNum(-1000000L, 1000000L),
      Gen.chooseNum(0L, 500000L),
      Gen.chooseNum(1L, 100000L), cases = 200) { (start, span, step) =>
      val end = start + span
      val chunks = Intervals.ints(start, end, step)
      assert(chunks.head.start == start && chunks.last.end == end)
      chunks.foreach(iv => assert(iv.start <= iv.end))
      // consecutive chunks: next starts exactly one past previous end
      chunks.sliding(2).foreach {
        case List(a, b) => assert(b.start == a.end + 1)
        case _ =>
      }
      // every chunk except the last is exactly `step` wide
      chunks.dropRight(1).foreach(iv => assert(iv.end - iv.start + 1 == step))
      // half-open form tiles the same range
      val ho = chunks.map(Intervals.halfOpenInts)
      assert(ho.map { case (a, b) => b - a }.sum == span + 1)
    }
  }

  test("P3 date chunks tile [start, end] for arbitrary bounds and widths") {
    val base = LocalDate.of(2015, 1, 1)
    forAll(
      Gen.chooseNum(0L, 4000L),
      Gen.chooseNum(0L, 1500L),
      Gen.chooseNum(1, 400), cases = 200) { (off, span, days) =>
      val start = base.plusDays(off)
      val end = start.plusDays(span)
      val chunks = Intervals.dates(start, end, days)
      assert(chunks.head.start == start && chunks.last.end == end)
      chunks.sliding(2).foreach {
        case List(a, b) => assert(b.start == a.end.plusDays(1))
        case _ =>
      }
      chunks.dropRight(1).foreach(iv =>
        assert(java.time.temporal.ChronoUnit.DAYS.between(iv.start, iv.end) == days - 1))
    }
  }

  // ── T1: surrogate key is a pure function of its inputs ──────────

  test("T1 sk is stable across independent evaluations and input order") {
    val rows = Gen.listOfN(40, Gen.zip(
      Gen.option(Gen.alphaNumStr.map(_.take(8))),
      Gen.option(Gen.alphaNumStr.map(_.take(8)))))
    forAll(rows, Gen.const(()), cases = 5) { (data, _) =>
      val df = data.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a.orNull, b.orNull) }
        .toDF("id", "k1", "k2")
      def skOf(d: org.apache.spark.sql.DataFrame, hyphen: Boolean) =
        SurrogateKey.addSk(d, Seq("k1", "k2"), hyphen)
          .select("id", "sk").collect()
          .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      for (hyphen <- Seq(true, false)) {
        val once = skOf(df, hyphen)
        val again = skOf(df.orderBy(col("id").desc), hyphen)
        assert(once == again, s"hyphen=$hyphen: sk must not depend on row order")
        // plain concat propagates NULL; concat_ws skips it
        data.zipWithIndex.foreach { case ((a, b), i) =>
          if (!hyphen && (a.isEmpty || b.isEmpty))
            assert(once(i.toLong).isEmpty, "concat branch must yield NULL sk")
          if (hyphen)
            assert(once(i.toLong).isDefined, "concat_ws branch never yields NULL sk")
        }
      }
    }
  }

  // ── K2: merge idempotence + commutativity with dedup ────────────

  private def mergeCase(trustedKeys: List[Int], updateKeys: List[Int]): Unit = {
    val trusted = trustedKeys.distinct
      .map(k => (s"sk$k", s"old$k")).toDF("sk", "payload")
    val updates = updateKeys.distinct
      .map(k => (s"sk$k", s"new$k")).toDF("sk", "payload")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val once = MergeUpsert.merged(trusted, updates)
    val twice = MergeUpsert.merged(once, updates)
    val onceRows = rows(once)
    // idempotence: re-applying the same update batch changes nothing
    assert(rows(twice) == onceRows)
    // matched keys carry the update payload; unmatched trusted survive
    val updated = updateKeys.distinct.map(k => (s"sk$k", s"new$k")).toSet
    val survivors = trustedKeys.distinct.filterNot(updateKeys.contains)
      .map(k => (s"sk$k", s"old$k")).toSet
    assert(onceRows == updated ++ survivors)
    // commutativity with dedup: merging pre-deduped duplicated updates
    // equals merging the originals (T4 guarantees unique sk upstream)
    val dupUpdates = updates.unionByName(updates)
    val deduped = Dedup.bySkDeterministic(dupUpdates)
    assert(rows(MergeUpsert.merged(trusted, deduped)) == onceRows)
  }

  test("K2 merge is idempotent and replaces matched rows exactly (random key sets)") {
    forAll(
      Gen.listOf(Gen.chooseNum(0, 30)),
      Gen.listOf(Gen.chooseNum(0, 30)), cases = 8) { (t, u) => mergeCase(t, u) }
    // the degenerate shapes property shrinking would find
    mergeCase(Nil, List(1))
    mergeCase(List(1), Nil)
    mergeCase(Nil, Nil)
  }

  // ── IVM: the maintenance laws under arbitrary churn chains ──

  private def ivmStateSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (
      Option(r.get(0)), r.getLong(1), r.getLong(2),
      Option(r.getDecimal(3)).map(_.toPlainString))).toSet

  test("IVM: two-step maintained state equals recompute for arbitrary churn chains") {
    import graft.operators.Cdc
    // snapshots with unique keys, nullable groups and values — the
    // full retraction algebra: group moves, n→0 vanishes, NULL sums
    val rowGen = for {
      k <- Gen.chooseNum(0, 25)
      g <- Gen.option(Gen.chooseNum(0, 3))
      v <- Gen.option(Gen.chooseNum(-50, 50))
    } yield (k, g, v)
    val snapGen = Gen.listOf(rowGen).map(_.distinctBy(_._1))
    def df(s: List[(Int, Option[Int], Option[Int])]) = s.toDF("k", "g", "v")
    forAll(snapGen, snapGen, snapGen, cases = 6) { (s0, s1, s2) =>
      val st1 = Cdc.maintainAgg(
        Cdc.aggState(df(s0), Seq("g"), Seq("v")),
        Cdc.signedDelta(df(s0), df(s1), Seq("k")), Seq("g"), Seq("v"))
      val st2 = Cdc.maintainAgg(st1,
        Cdc.signedDelta(df(s1), df(s2), Seq("k")), Seq("g"), Seq("v"))
      assert(ivmStateSet(st2) ==
        ivmStateSet(Cdc.aggState(df(s2), Seq("g"), Seq("v"))))
    }
  }

  test("extrema IVM: two-step maintained min/max equals recompute for arbitrary churn") {
    import graft.operators.Cdc
    // duplicated values matter here: a retracted extremum with a
    // surviving twin must NOT endanger correctness, and fold/recompute
    // classification must agree with the recompute in every mix
    val rowGen = for {
      k <- Gen.chooseNum(0, 25)
      g <- Gen.option(Gen.chooseNum(0, 3))
      v <- Gen.option(Gen.chooseNum(-5, 5))
    } yield (k, g, v)
    val snapGen = Gen.listOf(rowGen).map(_.distinctBy(_._1))
    def df(s: List[(Int, Option[Int], Option[Int])]) = s.toDF("k", "g", "v")
    def extSet(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(r => (
        Option(r.get(0)), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    forAll(snapGen, snapGen, snapGen, cases = 6) { (s0, s1, s2) =>
      val st1 = Cdc.maintainExtrema(
        Cdc.extremaState(df(s0), Seq("g"), Seq("v")),
        Cdc.signedDelta(df(s0), df(s1), Seq("k")), df(s1), Seq("g"), Seq("v"))
      val st2 = Cdc.maintainExtrema(st1,
        Cdc.signedDelta(df(s1), df(s2), Seq("k")), df(s2), Seq("g"), Seq("v"))
      assert(extSet(st2) ==
        extSet(Cdc.extremaState(df(s2), Seq("g"), Seq("v"))))
    }
  }

  test("cube IVM: two-step maintained lattice equals recompute for arbitrary churn") {
    import graft.operators.Cdc
    val sets = Seq(Seq("g", "h"), Seq("g"), Seq.empty[String])
    val rowGen = for {
      k <- Gen.chooseNum(0, 25)
      g <- Gen.option(Gen.chooseNum(0, 2))
      h <- Gen.option(Gen.chooseNum(0, 2))
      v <- Gen.option(Gen.chooseNum(-50, 50))
    } yield (k, g, h, v)
    val snapGen = Gen.listOf(rowGen).map(_.distinctBy(_._1))
    def df(s: List[(Int, Option[Int], Option[Int], Option[Int])]) =
      s.toDF("k", "g", "h", "v")
    def cSet(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(r => (
        Option(r.get(0)), Option(r.get(1)), r.getInt(2),
        r.getLong(3), r.getLong(4),
        Option(r.getDecimal(5)).map(_.toPlainString))).toSet
    forAll(snapGen, snapGen, snapGen, cases = 4) { (s0, s1, s2) =>
      val st1 = Cdc.maintainCube(
        Cdc.cubeState(df(s0), Seq("g", "h"), sets, Seq("v")),
        Cdc.signedDelta(df(s0), df(s1), Seq("k")), Seq("g", "h"), sets, Seq("v"))
      val st2 = Cdc.maintainCube(st1,
        Cdc.signedDelta(df(s1), df(s2), Seq("k")), Seq("g", "h"), sets, Seq("v"))
      assert(cSet(st2) ==
        cSet(Cdc.cubeState(df(s2), Seq("g", "h"), sets, Seq("v"))))
    }
  }

  test("join-view IVM: maintained multiset equals the recomputed join for arbitrary churn") {
    import graft.operators.Cdc
    val aRow = for {
      k <- Gen.chooseNum(0, 20)
      ck <- Gen.chooseNum(0, 5)
      p <- Gen.chooseNum(0, 3)
    } yield (k, ck, p)
    val bRow = for {
      ck <- Gen.chooseNum(0, 7) // some customers never join
      s <- Gen.chooseNum(0, 3)
    } yield (ck, s)
    val aGen = Gen.zip(
      Gen.listOf(aRow).map(_.distinctBy(_._1)),
      Gen.listOf(aRow).map(_.distinctBy(_._1)))
    val bGen = Gen.zip(
      Gen.listOf(bRow).map(_.distinctBy(_._1)),
      Gen.listOf(bRow).map(_.distinctBy(_._1)))
    def dfa(s: List[(Int, Int, Int)]) = s.toDF("k", "ck", "p")
    def dfb(s: List[(Int, Int)]) = s.toDF("ck", "s")
    val cols = Seq("ck", "k", "p", "s")
    forAll(aGen, bGen, cases = 6) { case ((a0, a1), (b0, b1)) =>
      val maintained = Cdc.maintainAgg(
        Cdc.aggState(dfa(a0).join(dfb(b0), Seq("ck"), "inner"), cols, Nil),
        Cdc.joinDelta(
          Cdc.signedDelta(dfa(a0), dfa(a1), Seq("k")), dfa(a0),
          Cdc.signedDelta(dfb(b0), dfb(b1), Seq("ck")), dfb(b0),
          on = Seq("ck")),
        cols, Nil)
      val recomputed = Cdc.aggState(
        dfa(a1).join(dfb(b1), Seq("ck"), "inner"), cols, Nil)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      assert(rows(maintained) == rows(recomputed))
    }
  }

  // ── WordShingles: structural invariants for arbitrary word lists ──

  test("WordShingles yields max(1, len-n+1) shingles of exactly min(n, len) words each") {
    val word = Gen.chooseNum('a', 'z').flatMap(c =>
      Gen.chooseNum(1, 6).map(len => c.toString * len))
    forAll(
      Gen.chooseNum(0, 40).flatMap(k => Gen.listOfN(k, word)),
      Gen.chooseNum(2, 15), cases = 30) { (ws, n) =>
      val df = Seq(Tuple1(ws)).toDF("w")
        .select(graft.functions.WordShingles(col("w"), n).as("sh"))
      val sh = df.head().getSeq[String](0)
      if (ws.isEmpty) assert(sh.isEmpty)
      else {
        assert(sh.length == math.max(1, ws.length - n + 1))
        sh.foreach(s =>
          assert(s.split(" ").length == math.min(n, ws.length), s"bad shingle '$s'"))
        // positional reconstruction: shingle i is words i..i+n-1
        if (ws.length > n)
          sh.zipWithIndex.foreach { case (s, i) =>
            assert(s == ws.slice(i, i + n).mkString(" ")) }
        else assert(sh.head == ws.mkString(" "))
      }
    }
  }

  // ── Temporal: bin-width invariance against the θ-join truth ──────

  test("rangeJoinBinned equals the θ-join for arbitrary data and bin widths") {
    val base = 1700000000000L
    val ivGen = Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n,
      for {
        s <- Gen.chooseNum(0L, 50000L)
        len <- Gen.chooseNum(1L, 20000L)
      } yield (s, s + len)))
    val ptGen = Gen.chooseNum(5, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 70000L)))
    forAll(ivGen, ptGen, Gen.oneOf(1L, 7L, 60L, 3600L, 50000L), cases = 12) {
      (ivs, pts, bin) =>
        val iv = ivs.zipWithIndex.map { case ((s, e), i) =>
          (i.toLong, new java.sql.Timestamp(base + s * 1000),
            new java.sql.Timestamp(base + e * 1000)) }.toDF("iv_id", "s", "e")
        val pt = pts.zipWithIndex.map { case (p, i) =>
          (i.toLong, new java.sql.Timestamp(base + p * 1000)) }.toDF("pt_id", "p")
        val fast = graft.ext.Temporal
          .rangeJoinBinned(iv, pt, "s", "e", "p", binSeconds = bin)
          .select("iv_id", "pt_id").as[(Long, Long)].collect().sorted.toList
        val slow = iv.crossJoin(pt)
          .where(col("p") >= col("s") && col("p") < col("e"))
          .select("iv_id", "pt_id").as[(Long, Long)].collect().sorted.toList
        assert(fast == slow, s"bin=$bin")
    }
  }

  // ── epoch-split ≡ plain, for ARBITRARY data / gaps / widths ──────
  // The fixed-seed TemporalSpec parity tests pin known edge shapes
  // (boundary merges, empty-epoch spans, compression runs); these
  // sweep the parameter space so an epoch-arithmetic off-by-one that
  // happens to miss those seeds still gets caught.

  test("sessionizeEpochs equals sessionize for arbitrary data, gaps and widths") {
    val evGen = Gen.chooseNum(2, 60).flatMap(n => Gen.listOfN(n,
      for {
        k <- Gen.chooseNum(0L, 3L)
        t <- Gen.chooseNum(0L, 50000L)
      } yield (k, t)))
    forAll(evGen, Gen.oneOf((30L, 7L), (30L, 600L), (600L, 40L), (600L, 86400L)),
      cases = 10) { (evs, gw) =>
      val (gap, width) = gw
      val df = evs.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new java.sql.Timestamp(1700000000000L + t * 1000)) }
        .toDF("event_id", "user_id", "ts")
      def canon(out: org.apache.spark.sql.DataFrame) = out
        .select("event_id", "session_id").as[(Long, Long)].collect().toMap
      val want = canon(graft.ext.Temporal
        .sessionize(df, "user_id", "ts", "event_id", gapSeconds = gap))
      val got = canon(graft.ext.Temporal.sessionizeEpochs(
        df, "user_id", "ts", "event_id", gapSeconds = gap, epochSeconds = width))
      assert(got == want, s"gap=$gap width=$width")
    }
  }

  test("historizeEpochs equals historize for arbitrary change logs and widths") {
    val logGen = Gen.chooseNum(2, 50).flatMap(n => Gen.listOfN(n,
      for {
        k <- Gen.chooseNum(0L, 2L)
        t <- Gen.chooseNum(0L, 40000L)
        st <- Gen.oneOf(Some("a"), Some("b"), None) // few states → long runs
      } yield (k, t, st)))
    forAll(logGen, Gen.oneOf(13L, 900L, 86400L), cases = 10) { (log, width) =>
      val df = log.zipWithIndex.map { case ((k, t, st), i) =>
        (i.toLong, k, new java.sql.Timestamp(1700000000000L + t * 1000), st) }
        .toDF("event_id", "user_id", "ts", "st")
      def canon(out: org.apache.spark.sql.DataFrame) = out
        .select("event_id", "valid_from", "valid_to", "is_current")
        .as[(Long, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]
        .collect().toSet
      val want = canon(graft.operators.Scd2
        .historize(df, "user_id", "ts", "event_id", Seq("st")))
      val got = canon(graft.operators.Scd2
        .historizeEpochs(df, "user_id", "ts", "event_id", Seq("st"), width))
      assert(got == want, s"width=$width")
    }
  }

  test("rollingEpochs equals the plain frame window for arbitrary data, frames and widths") {
    val evGen = Gen.chooseNum(2, 60).flatMap(n => Gen.listOfN(n,
      for {
        k <- Gen.chooseNum(0L, 2L)
        t <- Gen.chooseNum(0L, 50000L)
        v <- Gen.chooseNum(0, 1000)
      } yield (k, t, v)))
    forAll(evGen, Gen.oneOf((0, 60L), (2, 13L), (5, 900L), (3, 86400L)),
      cases = 10) { (evs, fw) =>
      val (lookback, width) = fw
      val df = evs.zipWithIndex.map { case ((k, t, v), i) =>
        (i.toLong, k, new java.sql.Timestamp(1700000000000L + t * 1000), v / 10.0) }
        .toDF("event_id", "user_id", "ts", "value")
      def frameAggs(w: org.apache.spark.sql.expressions.WindowSpec) = Seq(
        count(lit(1)).over(w).as("n_w"),
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double").as("s_w"))
      val plain = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-lookback, org.apache.spark.sql.expressions.Window.currentRow)
      val want = df.select(col("event_id") +: frameAggs(plain): _*)
        .as[(Long, Long, Double)].collect().toSet
      val got = graft.ext.Temporal.rollingEpochs(
        df, "user_id", "ts", "event_id", lookback, width)(frameAggs)
        .select("event_id", "n_w", "s_w")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == want, s"lookback=$lookback width=$width")
    }
  }

  test("sessionize invariants: monotone ids, gap rule at every cut") {
    val evGen = Gen.chooseNum(2, 60).flatMap(n => Gen.listOfN(n,
      for {
        k <- Gen.chooseNum(0L, 3L)
        t <- Gen.chooseNum(0L, 5000L)
      } yield (k, t)))
    forAll(evGen, Gen.oneOf(1L, 30L, 600L), cases = 12) { (evs, gap) =>
      val df = evs.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new java.sql.Timestamp(1700000000000L + t * 1000)) }
        .toDF("event_id", "user_id", "ts")
      val rows = graft.ext.Temporal
        .sessionize(df, "user_id", "ts", "event_id", gapSeconds = gap)
        .select("user_id", "ts", "event_id", "session_id")
        .as[(Long, java.sql.Timestamp, Long, Long)].collect()
        .sortBy(r => (r._1, r._2.getTime, r._3))
      rows.groupBy(_._1).values.foreach { keyRows =>
        assert(keyRows.head._4 == 1L) // sessions are 1-based per key
        keyRows.sliding(2).foreach {
          case Array(a, b) =>
            val gapS = (b._2.getTime - a._2.getTime) / 1000.0
            if (gapS > gap) assert(b._4 == a._4 + 1, s"cut expected at $gapS s")
            else assert(b._4 == a._4, s"no cut expected at $gapS s")
          case _ =>
        }
      }
    }
  }
}
