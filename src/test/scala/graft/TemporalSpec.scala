package graft

import java.sql.Timestamp
import graft.ext.Temporal
import graft.functions.KmvSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ── as-of join ───────────────────────────────────────────────────

  private def asofFixture: (DataFrame, DataFrame) = {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // equal-ts candidate exists
      (2L, 10L, ts("2024-01-01 11:30:00")), // between two rights
      (3L, 10L, ts("2024-01-01 08:00:00")), // before any right
      (4L, 20L, ts("2024-01-01 12:00:00")), // key with no rights at all
      (5L, 30L, ts("2024-01-01 12:00:00"))  // after its key's only right
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), "r1"),
      (10L, ts("2024-01-01 11:00:00"), "r2"),
      (10L, ts("2024-01-01 13:00:00"), "r3"),
      (30L, ts("2024-01-01 00:00:00"), "r4")
    ).toDF("user_id", "r_ts", "tag")
    (left, right)
  }

  test("asOfJoin inclusive: equal-ts match, latest-before match, null when none") {
    val (left, right) = asofFixture
    val out = Temporal.asOfJoin(left, right,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "r_ts")
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(out == Map(
      1L -> Some("r1"), // inclusive: concurrent right row visible
      2L -> Some("r2"), // most recent of r1/r2, r3 is in the future
      3L -> None,
      4L -> None,
      5L -> Some("r4")))
  }

  test("asOfJoin strict: equal-ts candidate is excluded") {
    val (left, right) = asofFixture
    val out = Temporal.asOfJoin(left, right,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "r_ts", strict = true)
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(out(1L).isEmpty) // r1 is exactly concurrent → hidden
    assert(out(2L).contains("r2"))
  }

  test("asOfJoin: null left time matches nothing; null-key/time right rows are dropped") {
    val left = Seq(
      (1L, Some(10L), Some(ts("2024-01-01 12:00:00"))),
      (2L, Some(10L), None) // null time → no candidate is "before" it
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(10L), Some(ts("2024-01-01 10:00:00")), "r1"),
      (Some(10L), None, "r_null_ts"), // dropped
      (None, Some(ts("2024-01-01 09:00:00")), "r_null_key") // dropped
    ).toDF("user_id", "r_ts", "tag")
    val out = Temporal.asOfJoin(left, right,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "r_ts")
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("r1"), 2L -> None))
  }

  test("asOfJoin preserves every left row and column") {
    val (left, right) = asofFixture
    val out = Temporal.asOfJoin(left, right,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "r_ts")
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "r_ts", "tag"))
  }

  test("asOfJoin matches the quadratic join-then-argmax oracle on random data") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(10).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
      .toDF("lid", "k", "t")
    val right = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "rt", "payload")
      // unique per (k, rt): keep max payload (the tie rule callers use)
      .groupBy("k", "rt").agg(max("payload").as("payload"))

    val fast = Temporal.asOfJoin(left, right,
      keys = Seq("k"), leftTime = "t", rightTime = "rt")
      .select("lid", "payload").as[(Long, Option[Long])].collect().toMap

    val w = Window.partitionBy("lid").orderBy(col("rt").desc)
    val slow = left.join(right, left("k") === right("k") && col("rt") <= col("t"), "left")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("lid", "payload").as[(Long, Option[Long])].collect().toMap
    val slowFull = left.select("lid").as[Long].collect()
      .map(id => id -> slow.getOrElse(id, None)).toMap

    assert(fast == slowFull)
  }

  test("asOfJoinEpochs matches asOfJoin for every epoch width") {
    val rnd = new scala.util.Random(99)
    val left = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(6).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(200000) * 1000L)))
      .toDF("lid", "k", "t")
    val right = (1 to 200).map(i =>
      (rnd.nextInt(6).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(200000) * 1000L), i.toLong))
      .toDF("k", "rt", "payload")
      .groupBy("k", "rt").agg(max("payload").as("payload"))
    val want = Temporal.asOfJoin(left, right, Seq("k"), "t", "rt")
      .select("lid", "rt", "payload")
      .as[(Long, Option[Timestamp], Option[Long])].collect()
      .map { case (k, v1, v2) => k -> (v1, v2) }.toMap
    // widths spanning many-epochs → single-epoch regimes, including
    // one that slices mid-second so carries cross epoch boundaries
    for (w <- Seq(7L, 61L, 3600L, 1000000L)) {
      val got = Temporal
        .asOfJoinEpochs(left, right, Seq("k"), "t", "rt", epochSeconds = w)
        .select("lid", "rt", "payload")
        .as[(Long, Option[Timestamp], Option[Long])].collect()
        .map { case (k, v1, v2) => k -> (v1, v2) }.toMap
      assert(got == want, s"epochSeconds=$w")
    }
  }

  test("asOfJoinEpochs: a matched row's NULL payload field stays NULL (no carry blend)") {
    // user 10: the carry row (09:00, value=77) precedes a same-epoch
    // match (11:59:50, value=NULL). Per-column coalesce would blend
    // the match's NULL value with the carry's 77; row-granularity
    // semantics (what asOfJoin returns) keep the matched row whole.
    val left = Seq((1L, 10L, ts("2024-01-01 11:59:55")))
      .toDF("event_id", "user_id", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), Some(77L), "carry"),
      (10L, ts("2024-01-01 11:59:50"), None: Option[Long], "match")
    ).toDF("user_id", "rt", "value", "tag")
    val want = Temporal.asOfJoin(left, right, Seq("user_id"), "t", "rt")
      .select("event_id", "rt", "value", "tag")
      .as[(Long, Option[Timestamp], Option[Long], Option[String])].collect().toSet
    assert(want == Set((1L, Some(ts("2024-01-01 11:59:50")), None, Some("match"))))
    // epoch width chosen so the carry row is in an EARLIER epoch than
    // the (left, match) pair — the blend bug's exact precondition
    val got = Temporal
      .asOfJoinEpochs(left, right, Seq("user_id"), "t", "rt", epochSeconds = 3600)
      .select("event_id", "rt", "value", "tag")
      .as[(Long, Option[Timestamp], Option[Long], Option[String])].collect().toSet
    assert(got == want)
  }

  test("asOfJoinEpochs matches asOfJoin on random data with nullable payloads") {
    val rnd = new scala.util.Random(123)
    val left = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(6).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(200000) * 1000L)))
      .toDF("lid", "k", "t")
    val right = (1 to 200).map { i =>
      val v = if (rnd.nextBoolean()) Some(i.toLong) else None
      (rnd.nextInt(6).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(200000) * 1000L), v)
    }.toDF("k", "rt", "payload")
      .groupBy("k", "rt").agg(max("payload").as("payload"))
    def key(df: DataFrame) = df
      .select("lid", "rt", "payload")
      .as[(Long, Option[Timestamp], Option[Long])].collect()
      .map { case (a, b, c) => a -> (b, c) }.toMap
    val want = key(Temporal.asOfJoin(left, right, Seq("k"), "t", "rt"))
    for (w <- Seq(61L, 3600L)) {
      val got = key(Temporal
        .asOfJoinEpochs(left, right, Seq("k"), "t", "rt", epochSeconds = w))
      assert(got == want, s"epochSeconds=$w")
    }
  }

  test("asOfJoinEpochs rejects reserved internal column names in either input") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "t", "__epoch")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 2L)).toDF("k", "rt", "p")
    val err = intercept[IllegalArgumentException] {
      Temporal.asOfJoinEpochs(left, right, Seq("k"), "t", "rt", 3600)
    }
    assert(err.getMessage.contains("__epoch"))
    val right2 = Seq((1L, ts("2024-01-01 00:00:00"), 2L)).toDF("k", "rt", "__carry")
    val err2 = intercept[IllegalArgumentException] {
      Temporal.asOfJoinEpochs(left.withColumnRenamed("__epoch", "tag"),
        right2, Seq("k"), "t", "rt", 3600)
    }
    assert(err2.getMessage.contains("__carry"))
  }

  test("asOfJoin rejects reserved internal column names in either input") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "t", "__lrow")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 2L)).toDF("k", "rt", "p")
    val err = intercept[IllegalArgumentException] {
      Temporal.asOfJoin(left, right, Seq("k"), "t", "rt")
    }
    assert(err.getMessage.contains("__lrow"))
    val right2 = Seq((1L, ts("2024-01-01 00:00:00"), 2L)).toDF("k", "rt", "__ord")
    val err2 = intercept[IllegalArgumentException] {
      Temporal.asOfJoin(left.withColumnRenamed("__lrow", "tag"),
        right2, Seq("k"), "t", "rt")
    }
    assert(err2.getMessage.contains("__ord"))
  }

  // ── range join ───────────────────────────────────────────────────

  test("rangeJoinBinned: half-open boundaries and bin-crossing intervals") {
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")), // 1 bin
      (2L, ts("2024-01-01 12:00:00"), ts("2024-01-03 12:00:00")), // crosses bins
      (3L, ts("2024-01-05 00:00:00"), ts("2024-01-05 00:00:00"))  // empty → dropped
    ).toDF("iv_id", "start", "end")
    val pts = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == start of iv1: included
      (2L, ts("2024-01-02 00:00:00")), // == end of iv1: excluded; inside iv2
      (3L, ts("2024-01-03 11:59:59")), // last second of iv2
      (4L, ts("2024-01-03 12:00:00")), // == end of iv2: excluded
      (5L, ts("2024-01-05 00:00:00"))  // inside nothing (iv3 empty)
    ).toDF("pt_id", "p")
    val got = Temporal
      .rangeJoinBinned(iv, pts, "start", "end", "p", binSeconds = 86400)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 2L), (2L, 3L)))
  }

  test("rangeJoinBinned matches the brute-force θ-join on random data") {
    val rnd = new scala.util.Random(7)
    val base = 1700000000000L
    val iv = (1 to 200).map { i =>
      val s = base + rnd.nextInt(500000) * 1000L
      (i.toLong, new Timestamp(s), new Timestamp(s + (rnd.nextInt(90000) + 1) * 1000L))
    }.toDF("iv_id", "start", "end")
    val pts = (1 to 500).map(i =>
      (i.toLong, new Timestamp(base + rnd.nextInt(600000) * 1000L)))
      .toDF("pt_id", "p")

    // bin deliberately smaller than max interval length → multi-bin fan-out
    val fast = Temporal.rangeJoinBinned(iv, pts, "start", "end", "p", binSeconds = 30)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    val slow = iv.crossJoin(pts)
      .where(col("p") >= col("start") && col("p") < col("end"))
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(fast == slow && fast.nonEmpty)
  }

  test("intervalOverlapJoin: each overlapping pair exactly once, touching intervals excluded") {
    val a = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")), // 9 days, many bins
      (2L, ts("2024-01-20 00:00:00"), ts("2024-01-21 00:00:00"))
    ).toDF("a_id", "s", "e")
    val b = Seq(
      (1L, ts("2024-01-05 00:00:00"), ts("2024-01-15 00:00:00")), // overlaps a1 across bins
      (2L, ts("2024-01-10 00:00:00"), ts("2024-01-11 00:00:00")), // touches a1's end: NO overlap
      (3L, ts("2023-12-30 00:00:00"), ts("2024-01-02 00:00:00")), // overlaps a1's start
      (4L, ts("2024-01-20 12:00:00"), ts("2024-01-20 13:00:00"))  // inside a2
    ).toDF("b_id", "s2", "e2")
    val got = Temporal
      .intervalOverlapJoin(a, b, "s", "e", "s2", "e2", binSeconds = 86400)
      .select("a_id", "b_id").as[(Long, Long)].collect().toList
    // toList (not toSet) so a double emission from shared bins would fail
    assert(got.sorted == List((1L, 1L), (1L, 3L), (2L, 4L)))
  }

  test("intervalOverlapJoin matches the brute-force θ-join on random data") {
    val rnd = new scala.util.Random(13)
    val base = 1700000000000L
    def mk(n: Int, id: String) = (1 to n).map { i =>
      val s = base + rnd.nextInt(400000) * 1000L
      (i.toLong, new Timestamp(s), new Timestamp(s + (rnd.nextInt(120000) + 1) * 1000L))
    }.toDF(id, s"s_$id", s"e_$id")
    val a = mk(150, "a")
    val b = mk(250, "b")
    val fast = Temporal
      .intervalOverlapJoin(a, b, "s_a", "e_a", "s_b", "e_b", binSeconds = 45)
      .select("a", "b").as[(Long, Long)].collect().toList
    val slow = a.crossJoin(b)
      .where(col("s_a") < col("e_b") && col("s_b") < col("e_a"))
      .select("a", "b").as[(Long, Long)].collect().toList
    // list compare: any pair emitted twice (shared-bin dedup bug) fails
    assert(fast.sorted == slow.sorted && fast.nonEmpty)
  }

  // ── sessionization ───────────────────────────────────────────────

  test("sessionize cuts on gap > threshold and numbers sessions per key") {
    val df = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 10:20:00")), // 20m gap → same session
      (3L, 100L, ts("2024-01-01 11:00:00")), // 40m gap → new session
      (4L, 100L, ts("2024-01-01 11:30:00")), // exactly 30m → NOT a cut (strict >)
      (5L, 200L, ts("2024-01-01 10:00:00"))  // other key restarts at 1
    ).toDF("event_id", "user_id", "ts")
    val got = Temporal
      .sessionize(df, "user_id", "ts", "event_id", gapSeconds = 1800)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionizeEpochs matches sessionize for every epoch width") {
    val rnd = new scala.util.Random(77)
    // bursty: clustered timestamps so sessions span epoch cuts, plus
    // long dead stretches so sessions also span EMPTY epochs when the
    // width is below the gap
    val rows = (1 to 600).map { i =>
      val burst = rnd.nextInt(20)
      (i.toLong, rnd.nextInt(5).toLong,
        new Timestamp(1700000000000L + burst * 50000000L + rnd.nextInt(7200) * 1000L))
    }
    val df = rows.toDF("event_id", "user_id", "ts")
    def roll(out: DataFrame) = out
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("s"), max("ts").as("e"), count(lit(1)).as("n"))
      .as[(Long, Long, Timestamp, Timestamp, Long)].collect().toSet
    val want = roll(Temporal.sessionize(df, "user_id", "ts", "event_id", 1800))
    // widths below the gap (empty-epoch spanning), near it, far above
    for (w <- Seq(600L, 1801L, 86400L)) {
      val got = roll(Temporal.sessionizeEpochs(
        df, "user_id", "ts", "event_id", gapSeconds = 1800, epochSeconds = w))
      assert(got == want, s"epochSeconds=$w")
    }
  }

  test("sessionizeEpochs: a session fully bridging several epochs telescopes to one id") {
    val df = (0 until 50).map(i =>
      (i.toLong, 1L, new Timestamp(1700000000000L + i * 60000L)))
      .toDF("event_id", "user_id", "ts") // 1-min cadence, 50 min span
    val out = Temporal.sessionizeEpochs(
      df, "user_id", "ts", "event_id", gapSeconds = 120, epochSeconds = 300)
      .select("session_id").as[Long].collect().toSet
    assert(out == Set(1L)) // 10 epochs, every boundary bridged
  }

  test("rollingEpochs matches the plain frame window for every epoch width") {
    val rnd = new scala.util.Random(66)
    val df = (1 to 800).map(i =>
      (i.toLong, rnd.nextInt(5).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextInt(1000) / 10.0))
      .toDF("event_id", "user_id", "ts", "value")
    def frameAggs(w: org.apache.spark.sql.expressions.WindowSpec) = Seq(
      count(lit(1)).over(w).as("n_window"),
      sum(col("value").cast("decimal(18,6)")).over(w).cast("double")
        .as("sum_window"))
    val plain = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-3, Window.currentRow)
    val want = df.select(col("event_id") +: frameAggs(plain): _*)
      .as[(Long, Long, Double)].collect().toSet
    // widths: many rows per epoch; sparse epochs (some with < W rows,
    // so context spans several epochs back); one epoch for everything
    for (w <- Seq(120L, 3600L, 1000000L)) {
      val got = Temporal.rollingEpochs(df, "user_id", "ts", "event_id",
        lookback = 3, epochSeconds = w)(frameAggs)
        .select("event_id", "n_window", "sum_window")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == want, s"epochSeconds=$w")
    }
  }

  test("rollingEpochs: context reaches across epochs sparser than the frame") {
    // one row per epoch — every frame must chain context through
    // THREE distinct earlier epochs
    val df = (0 until 10).map(i =>
      (i.toLong, 1L, new Timestamp(1700000000000L + i * 3600000L), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.rollingEpochs(df, "user_id", "ts", "event_id",
      lookback = 3, epochSeconds = 3600)(w =>
      Seq(count(lit(1)).over(w).as("n_window")))
      .select("event_id", "n_window").as[(Long, Long)].collect().toMap
    assert(got == (0 until 10).map(i => i.toLong -> math.min(i + 1, 4).toLong).toMap)
  }

  test("historizeEpochs matches historize for every epoch width") {
    val rnd = new scala.util.Random(55)
    // few states → long no-op runs that cross epoch cuts; some
    // same-instant ties; nullable states
    val rows = (1 to 500).map { i =>
      val st = rnd.nextInt(4) match {
        case 0 => None
        case s => Some(s"st$s")
      }
      (i.toLong, rnd.nextInt(4).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(300) * 977000L), st)
    }
    val df = rows.toDF("event_id", "user_id", "ts", "st")
    def canon(out: DataFrame) = out
      .select("event_id", "user_id", "ts", "st", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Timestamp, Option[String], Timestamp, Option[Timestamp], Boolean)]
      .collect().toSet
    val want = canon(graft.operators.Scd2
      .historize(df, "user_id", "ts", "event_id", Seq("st")))
    for (w <- Seq(3600L, 86400L, 10000000L)) {
      val got = canon(graft.operators.Scd2
        .historizeEpochs(df, "user_id", "ts", "event_id", Seq("st"), epochSeconds = w))
      assert(got == want, s"epochSeconds=$w")
    }
  }

  test("historizeEpochs: no-op run spanning a whole epoch compresses across it") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 12:00:00"), "a"), // no-op
      (3L, 1L, ts("2024-01-02 12:00:00"), "a"), // no-op, next epoch
      (4L, 1L, ts("2024-01-03 06:00:00"), "b")  // real change, 2 epochs later
    ).toDF("event_id", "user_id", "ts", "st")
    val h = graft.operators.Scd2
      .historizeEpochs(df, "user_id", "ts", "event_id", Seq("st"),
        epochSeconds = 86400)
      .select("st", "valid_from", "valid_to", "is_current")
      .as[(String, Timestamp, Option[Timestamp], Boolean)].collect().sortBy(_._2.getTime)
    assert(h.length == 2)
    // a's interval runs to b's change time ACROSS the empty middle
    // epoch (days 1-2 compressed away entirely)
    assert(h(0) == (("a", ts("2024-01-01 00:00:00"),
      Some(ts("2024-01-03 06:00:00")), false)))
    assert(h(1) == (("b", ts("2024-01-03 06:00:00"), None, true)))
  }

  test("epoch-split operators keep NULL-key rows, matching their plain forms") {
    // Window.partitionBy treats NULL as a group, so the plain forms
    // sessionize/frame/compress null-key rows as one key; the epoch
    // forms' join-backs are null-safe (<=>) so they must agree.
    val rnd = new scala.util.Random(31)
    val ev = (1 to 300).map { i =>
      val k = if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(3).toLong)
      (i.toLong, k, new Timestamp(1700000000000L + rnd.nextInt(50000) * 1000L))
    }.toDF("event_id", "user_id", "ts")

    // sessionize: null-key rows must appear AND session-number together
    val sessWant = Temporal.sessionize(ev, "user_id", "ts", "event_id", 1800)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    val sessGot = Temporal.sessionizeEpochs(
      ev, "user_id", "ts", "event_id", gapSeconds = 1800, epochSeconds = 600)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(sessGot == sessWant)
    assert(sessGot.size == 300) // nothing vanished

    // rolling frame: cross-epoch context must reach null-key rows
    val evv = ev.withColumn("value", col("event_id").cast("double"))
    def frameAggs(w: org.apache.spark.sql.expressions.WindowSpec) =
      Seq(count(lit(1)).over(w).as("n_window"))
    val plain = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-3, Window.currentRow)
    val rollWant = evv.select(col("event_id") +: frameAggs(plain): _*)
      .as[(Long, Long)].collect().toMap
    val rollGot = Temporal.rollingEpochs(evv, "user_id", "ts", "event_id",
      lookback = 3, epochSeconds = 600)(frameAggs)
      .select("event_id", "n_window").as[(Long, Long)].collect().toMap
    assert(rollGot == rollWant)

    // SCD2: null-key change log compresses and terminates identically
    val log = (1 to 200).map { i =>
      val k = if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(2).toLong)
      (i.toLong, k, new Timestamp(1700000000000L + rnd.nextInt(200) * 977000L),
        s"st${rnd.nextInt(3)}")
    }.toDF("event_id", "user_id", "ts", "st")
    def canon(out: DataFrame) = out
      .select("event_id", "user_id", "st", "valid_from", "valid_to", "is_current")
      .as[(Long, Option[Long], String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSet
    val scdWant = canon(graft.operators.Scd2
      .historize(log, "user_id", "ts", "event_id", Seq("st")))
    val scdGot = canon(graft.operators.Scd2
      .historizeEpochs(log, "user_id", "ts", "event_id", Seq("st"),
        epochSeconds = 86400))
    assert(scdGot == scdWant)
    assert(scdGot.exists(_._2.isEmpty)) // null-key intervals present
  }

  test("epoch-split operators accept empty inputs") {
    val emptyEv = Seq.empty[(Long, Long, Timestamp)]
      .toDF("event_id", "user_id", "ts")
    assert(Temporal.sessionizeEpochs(
      emptyEv, "user_id", "ts", "event_id", 1800, 3600).count() == 0)
    val emptyLog = Seq.empty[(Long, Long, Timestamp, String)]
      .toDF("event_id", "user_id", "ts", "st")
    assert(graft.operators.Scd2.historizeEpochs(
      emptyLog, "user_id", "ts", "event_id", Seq("st"), 3600).count() == 0)
    assert(Temporal.rollingEpochs(
      emptyEv.withColumn("value", lit(0.0)),
      "user_id", "ts", "event_id", 3, 3600)(w =>
      Seq(count(lit(1)).over(w).as("n"))).count() == 0)
  }

  // ── KMV sketch ───────────────────────────────────────────────────

  test("kmv below saturation is exactly countDistinct, per group") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map(_ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(300).toLong))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(KmvSketch.approxCountDistinct(col("v"), k = 512).as("kmv"))
    val want = df.groupBy("g").agg(countDistinct(col("v")).as("exact"))
    val joined = got.join(want, "g")
      .where(col("kmv") =!= col("exact"))
    assert(joined.count() == 0)
  }

  test("kmv stays exact in [k, 2k] while no discard has fired") {
    // 500 distinct ∈ (k=256, 2k=512]: the buffer never prunes (θ
    // untouched), so the result is the exact count, not an estimate
    val df = (1L to 500L).toDF("v").repartition(8)
    val n = df.agg(KmvSketch.approxCountDistinct(col("v"), k = 256))
      .as[Long].head()
    assert(n == 500L)
  }

  test("kmv ignores nulls like COUNT(DISTINCT)") {
    val df = Seq(Some(1L), Some(2L), None, Some(2L), None)
      .toDF("v")
    val n = df.agg(KmvSketch.approxCountDistinct(col("v"), k = 16))
      .as[Long].head()
    assert(n == 2L)
  }

  test("kmv above saturation estimates within 20% (std err ~ 1/sqrt(k))") {
    val df = (1L to 20000L).toDF("v") // 20k distinct, k = 256 → saturated
    val est = df.agg(KmvSketch.approxCountDistinct(col("v"), k = 256))
      .as[Long].head()
    assert(math.abs(est - 20000.0) / 20000.0 < 0.20, s"estimate $est")
  }

  test("kmv is invariant to partitioning (merge order)") {
    val df = (1L to 10000L).map(i => i % 3000).toDF("v")
    val results = Seq(1, 7, 32).map(p =>
      df.repartition(p).agg(KmvSketch.approxCountDistinct(col("v"), k = 128))
        .as[Long].head())
    assert(results.distinct.size == 1, results.toString)
  }

  // ── SCD2 historization ───────────────────────────────────────────

  test("scd2: compresses no-op changes, tiles intervals, marks current") {
    val log = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00"), "bronze"),
      (2L, 100L, ts("2024-01-02 00:00:00"), "bronze"), // no-op → dropped
      (3L, 100L, ts("2024-01-03 00:00:00"), "silver"),
      (4L, 100L, ts("2024-01-05 00:00:00"), "gold"),
      (5L, 200L, ts("2024-01-04 00:00:00"), "bronze")
    ).toDF("event_id", "user_id", "ts", "tier")
    val h = graft.operators.Scd2
      .historize(log, "user_id", "ts", "event_id", Seq("tier"))
      .select("user_id", "tier", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime))
    assert(h.map(r => (r._1, r._2)).toList ==
      List((100L, "bronze"), (100L, "silver"), (100L, "gold"), (200L, "bronze")))
    // intervals tile: each valid_to == next valid_from; open at the end
    assert(h(0)._4.contains(ts("2024-01-03 00:00:00")) && !h(0)._5)
    assert(h(1)._4.contains(ts("2024-01-05 00:00:00")) && !h(1)._5)
    assert(h(2)._4.isEmpty && h(2)._5)
    assert(h(3)._4.isEmpty && h(3)._5)
  }

  test("scd2: same-instant changes keep a zero-length audit row, last tie wins the instant") {
    val t0 = ts("2024-01-01 10:00:00")
    val log = Seq(
      (1L, 7L, t0, "a"),
      (2L, 7L, t0, "b"), // same instant, higher tie → wins the instant
      (3L, 7L, ts("2024-01-01 11:00:00"), "c")
    ).toDF("event_id", "user_id", "ts", "st")
    val h = graft.operators.Scd2
      .historize(log, "user_id", "ts", "event_id", Seq("st"))
      .select("st", "valid_from", "valid_to")
      .as[(String, Timestamp, Option[Timestamp])].collect().sortBy(_._1)
    assert(h.length == 3)
    val a = h.find(_._1 == "a").get
    assert(a._2 == t0 && a._3.contains(t0)) // zero-length audit row
    val b = h.find(_._1 == "b").get
    assert(b._2 == t0 && b._3.contains(ts("2024-01-01 11:00:00")))
  }

  test("scd2: null states compress null-safely") {
    val log = Seq(
      (1L, 9L, ts("2024-01-01 00:00:00"), None: Option[String]),
      (2L, 9L, ts("2024-01-02 00:00:00"), None: Option[String]), // null==null → no-op
      (3L, 9L, ts("2024-01-03 00:00:00"), Some("x"))
    ).toDF("event_id", "user_id", "ts", "st")
    val h = graft.operators.Scd2
      .historize(log, "user_id", "ts", "event_id", Seq("st"))
    assert(h.count() == 2)
  }

  // ── stratified sampling ──────────────────────────────────────────

  test("stratifiedSample: exactly n per stratum, short strata kept whole, partition-invariant") {
    val rnd = new scala.util.Random(31)
    val df = ((1 to 500).map(i => (i.toLong, s"s${rnd.nextInt(8)}")) ++
      Seq((9001L, "tiny"), (9002L, "tiny"))).toDF("id", "src")
    val take = graft.ext.Sampling
      .stratifiedSample(df, "src", "id", n = 12)
      .as[(Long, String)].collect()
    val bySrc = take.groupBy(_._2)
    assert(bySrc("tiny").length == 2) // fewer than n → keep all
    bySrc.filterNot(_._1 == "tiny").values.foreach(g => assert(g.length == 12))
    val again = graft.ext.Sampling
      .stratifiedSample(df.repartition(17), "src", "id", n = 12)
      .as[(Long, String)].collect()
    assert(take.toSet == again.toSet) // deterministic draw
  }

  // ── Misra-Gries sketch ───────────────────────────────────────────

  test("mg below capacity is the exact per-item histogram") {
    val rnd = new scala.util.Random(5)
    val df = (1 to 8000).map(_ => s"item${rnd.nextInt(40)}").toDF("v")
    val got = df.repartition(16)
      .agg(graft.functions.MgSketch.topK(col("v"), k = 64).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.cnt")).as[(String, Long)]
      .collect().toMap
    val want = df.groupBy("v").count().as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("mg above capacity keeps every item with frequency > n/(k+1)") {
    // zipf-ish: one dominant item + a long tail of singletons
    // (seeded shuffle: the MG bound is order-independent, but a
    // pinned order keeps the asserted counts reproducible)
    val rows = Seq.fill(3000)("whale") ++ (1 to 5000).map(i => s"tail$i")
    val df = new scala.util.Random(17).shuffle(rows).toDF("v")
    val got = df.repartition(8)
      .agg(graft.functions.MgSketch.topK(col("v"), k = 16).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.cnt")).as[(String, Long)]
      .collect().toMap
    val n = rows.size
    // whale: true 3000 > n/(k+1) = 470 → must be kept, count within n/(k+1)
    assert(got.contains("whale"), got.keys.take(5).toString)
    assert(got("whale") <= 3000 && got("whale") >= 3000 - n / 17,
      s"whale count ${got("whale")}")
    assert(got.size <= 16)
  }

  test("mg is exact-regime invariant to partitioning") {
    val df = (1 to 4000).map(i => s"g${i % 30}").toDF("v")
    val results = Seq(1, 5, 32).map(p =>
      df.repartition(p)
        .agg(graft.functions.MgSketch.topK(col("v"), k = 50).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item"), col("h.cnt")).as[(String, Long)]
        .collect().toMap)
    assert(results.distinct.size == 1)
  }

  // ── KLL quantile sketch ──────────────────────────────────────────

  private def discRank(vals: Seq[Double], q: Double): Double = {
    val s = vals.sorted
    s((math.max(1L, math.ceil(q * s.length - 1e-9).toLong) - 1).toInt)
  }

  test("kll below capacity is the exact discrete quantile, per group") {
    val rnd = new scala.util.Random(21)
    val data = (1 to 6000).map(_ => (s"g${rnd.nextInt(3)}", rnd.nextDouble() * 100))
    val df = data.toDF("g", "v").repartition(16)
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val got = df.groupBy("g")
        .agg(graft.functions.KllSketch.quantile(col("v"), q, 8192).as("qv"))
        .as[(String, Double)].collect().toMap
      val want = data.groupBy(_._1).map { case (g, rows) =>
        g -> discRank(rows.map(_._2), q) }
      assert(got == want, s"q=$q")
    }
  }

  test("kll above capacity: estimated quantile's true rank within 5%") {
    // seeded: deterministic compactors have order-dependent error, so
    // an unseeded shuffle could someday land a permutation past the
    // asserted tolerance — pin the order, assert forever
    val vals = new scala.util.Random(23)
      .shuffle((1 to 100000).map(_.toDouble)).toDF("v")
    val est = vals.repartition(8)
      .agg(graft.functions.KllSketch.quantile(col("v"), 0.5, 256))
      .as[Double].head()
    // value == its own rank here, so rank error reads off directly
    assert(math.abs(est - 50000.0) / 100000.0 < 0.05, s"p50 estimate $est")
  }

  test("kll skips nulls and returns null for an all-null group") {
    val df = Seq(Some(3.0), None, Some(1.0), None, Some(2.0)).toDF("v")
    val got = df.agg(
      graft.functions.KllSketch.quantile(col("v"), 0.5, 64)).as[Double].head()
    assert(got == 2.0)
    val empty = Seq[Option[Double]](None, None).toDF("v")
      .agg(graft.functions.KllSketch.quantile(col("v"), 0.5, 64))
      .as[Option[Double]].head()
    assert(empty.isEmpty)
  }

  test("kll exact regime is invariant to partitioning") {
    val df = (1 to 5000).map(i => (i * 7 % 5000).toDouble).toDF("v")
    val results = Seq(1, 7, 32).map(p =>
      df.repartition(p)
        .agg(graft.functions.KllSketch.quantile(col("v"), 0.75, 8192))
        .as[Double].head())
    assert(results.distinct.size == 1, results.toString)
  }

  test("kmv rejects non-long input at analysis time") {
    val df = Seq("a", "b").toDF("v")
    val err = intercept[Exception] {
      df.agg(KmvSketch.sketch(col("v"), k = 16)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
