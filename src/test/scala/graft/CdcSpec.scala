package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def log(rows: (String, Int, String, Int)*) =
    rows.toDF("k", "seq", "op", "v")

  test("applyLog: latest writer wins, deletes drop the key") {
    val changes = log(
      ("a", 1, "I", 10), ("a", 2, "U", 11),
      ("b", 1, "I", 20), ("b", 2, "D", 0),
      ("c", 1, "I", 30))
    val out = Cdc.applyLog(changes, Seq("k"), Seq("seq"))
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("a", 11), ("c", 30)))
  }

  test("applyLog: delete-then-reinsert keeps the reinsert") {
    val changes = log(
      ("a", 1, "I", 1), ("a", 2, "D", 0), ("a", 3, "I", 3))
    val out = Cdc.applyLog(changes, Seq("k"), Seq("seq")).collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSet == Set(("a", 3)))
  }

  test("applyLog: multi-column sequence orders within key") {
    val changes = Seq(
      ("a", 1, 5, "I", 1), ("a", 2, 0, "U", 2), ("a", 1, 9, "U", 9))
      .toDF("k", "ts", "tie", "op", "v")
    val out = Cdc.applyLog(changes, Seq("k"), Seq("ts", "tie")).collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSet == Set(("a", 2)))
  }

  test("applyLog: null keys form one applied group") {
    val changes = Seq(
      (Option.empty[String], 1, "I", 1),
      (Option.empty[String], 2, "U", 2),
      (Option("a"), 1, "I", 10))
      .toDF("k", "seq", "op", "v")
    val out = Cdc.applyLog(changes, Seq("k"), Seq("seq")).collect()
      .map(r => (Option(r.getString(0)), r.getInt(1))).toSet
    assert(out == Set((None, 2), (Some("a"), 10)))
  }

  test("applyLog rejects reserved internal names") {
    val bad = Seq(("a", 1, "I", 1)).toDF("k", "seq", "op", "__rn")
    val e = intercept[IllegalArgumentException](
      Cdc.applyLog(bad, Seq("k"), Seq("seq")))
    assert(e.getMessage.contains("__rn"))
  }

  private def snap(rows: (String, Int)*) = rows.toDF("k", "v")

  test("changeFeed: I/U/D tagged, unchanged silent, images correct") {
    val before = snap(("a", 1), ("b", 2), ("c", 3))
    val after = snap(("b", 2), ("c", 30), ("d", 4))
    val out = Cdc.changeFeed(before, after, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "op", "v"))
    val got = out.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // a deleted (before-image), b unchanged (absent), c updated
    // (after-image), d inserted
    assert(got == Set(("a", "D", 1), ("c", "U", 30), ("d", "I", 4)))
  }

  test("changeFeed: null keys match null-safely (no spurious D+I)") {
    val before = Seq((Option.empty[String], 1), (Option("a"), 1)).toDF("k", "v")
    val after = Seq((Option.empty[String], 2), (Option("a"), 1)).toDF("k", "v")
    val got = Cdc.changeFeed(before, after, Seq("k")).collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((None, "U", 2)))
  }

  test("changeFeed: null-safe payload compare (null -> value is U)") {
    val before = Seq(("a", Option.empty[java.lang.Integer])).toDF("k", "v")
    val after = Seq(("a", Option(Integer.valueOf(5)))).toDF("k", "v")
    val got = Cdc.changeFeed(before, after, Seq("k")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("a", "U", 5)))
  }

  test("changeFeed rejects schema mismatch and reserved names") {
    intercept[IllegalArgumentException](
      Cdc.changeFeed(snap(("a", 1)), Seq(("a", 1)).toDF("k", "w"), Seq("k")))
    intercept[IllegalArgumentException](
      Cdc.changeFeed(
        Seq(("a", "x", 1)).toDF("k", "op", "v"),
        Seq(("a", "x", 1)).toDF("k", "op", "v"), Seq("k")))
  }

  test("appliedChanges: delete removes, upsert replaces, untouched survive") {
    val trusted = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("sk", "v")
    val changes = Seq(
      ("b", 1, "U", 20), ("c", 1, "D", 0),
      ("c", 2, "I", 33), ("d", 1, "I", 4), ("e", 1, "D", 0))
      .toDF("sk", "seq", "op", "v")
    val out = graft.sinks.MergeUpsert
      .appliedChanges(trusted, changes).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    // b updated; c delete superseded by seq-2 reinsert; d inserted;
    // e's delete of an absent key is a no-op; a untouched
    assert(out == Set(("a", 1), ("b", 20), ("c", 33), ("d", 4)))
  }

  test("appliedChanges: winning delete beats earlier upserts") {
    val trusted = Seq(("a", 1)).toDF("sk", "v")
    val changes = Seq(("a", 1, "U", 10), ("a", 2, "D", 0))
      .toDF("sk", "seq", "op", "v")
    val out = graft.sinks.MergeUpsert
      .appliedChanges(trusted, changes).collect()
    assert(out.isEmpty)
  }

  test("round trip: applyLog(before + feed) reproduces after") {
    val before = snap(("a", 1), ("b", 2), ("c", 3))
    val after = snap(("b", 2), ("c", 30), ("d", 4))
    val feed = Cdc.changeFeed(before, after, Seq("k"))
      .withColumn("seq", lit(2))
    val asLog = before
      .withColumn("op", lit("I")).withColumn("seq", lit(1))
      .select("k", "op", "seq", "v")
      .unionByName(feed.select("k", "op", "seq", "v"))
    val rebuilt = Cdc.applyLog(asLog, Seq("k"), Seq("seq")).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(rebuilt ==
      after.collect().map(r => (r.getString(0), r.getInt(1))).toSet)
  }

  // ---- signed deltas + incremental aggregate maintenance ----

  private def gsnap(rows: (Option[String], String, Option[Int])*) =
    rows.toDF("g", "k", "v")

  private def stateSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (
      Option(r.getString(0)), r.getLong(1), r.getLong(2),
      Option(r.getDecimal(3)).map(_.toPlainString))).toSet

  test("signedDelta: +1 after-images, -1 before-images, U emits both") {
    val before = snap(("a", 1), ("b", 2), ("c", 3))
    val after = snap(("b", 20), ("c", 3), ("d", 4))
    val got = Cdc.signedDelta(before, after, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(
      (-1, "a", 1),           // deleted: before-image retracted
      (-1, "b", 2), (1, "b", 20), // updated: both images
      (1, "d", 4)))           // inserted: after-image added
    assert(Cdc.signedDelta(before, after, Seq("k")).columns.toSeq ==
      Seq("__sign", "k", "v"))
  }

  test("maintainAgg law: state(before) + delta == state(after)") {
    val before = gsnap(
      (Some("g1"), "a", Some(10)), (Some("g1"), "b", Some(20)),
      (Some("g2"), "c", Some(5)), (Some("g2"), "d", None),
      (None, "e", Some(7)), (Some("g3"), "f", Some(1)))
    val after = gsnap(
      (Some("g1"), "a", Some(15)),   // in-group value change
      (Some("g2"), "b", Some(20)),   // group move g1 -> g2
      // c deleted; f deleted -> g3 must vanish
      (Some("g2"), "d", Some(3)),    // null -> value
      (None, "e", Some(7)),          // unchanged (null group key)
      (Some("g4"), "h", Some(9)),    // insert into a new group
      (Some("g1"), "i", None))       // insert with a null value
    val state = Cdc.aggState(before, Seq("g"), Seq("v"))
    val delta = Cdc.signedDelta(before, after, Seq("k"))
    val maintained = Cdc.maintainAgg(state, delta, Seq("g"), Seq("v"))
    val recomputed = Cdc.aggState(after, Seq("g"), Seq("v"))
    assert(maintained.schema == recomputed.schema)
    assert(stateSet(maintained) == stateSet(recomputed))
    // the vanished group is genuinely gone, not present at n=0
    assert(!stateSet(maintained).exists(_._1.contains("g3")))
  }

  test("maintainAgg composes: two sequential deltas == final recompute") {
    val s0 = gsnap((Some("g"), "a", Some(1)), (Some("g"), "b", Some(2)))
    val s1 = gsnap((Some("g"), "a", Some(5)), (Some("h"), "c", Some(3)))
    val s2 = gsnap((Some("h"), "c", Some(4)), (Some("h"), "d", None))
    val step1 = Cdc.maintainAgg(
      Cdc.aggState(s0, Seq("g"), Seq("v")),
      Cdc.signedDelta(s0, s1, Seq("k")), Seq("g"), Seq("v"))
    val step2 = Cdc.maintainAgg(
      step1, Cdc.signedDelta(s1, s2, Seq("k")), Seq("g"), Seq("v"))
    assert(stateSet(step2) == stateSet(Cdc.aggState(s2, Seq("g"), Seq("v"))))
  }

  test("maintainAgg: retracting the last non-null value restores NULL sum") {
    val before = gsnap((Some("g"), "a", Some(5)), (Some("g"), "b", None))
    val after = gsnap((Some("g"), "a", None), (Some("g"), "b", None))
    val out = Cdc.maintainAgg(
      Cdc.aggState(before, Seq("g"), Seq("v")),
      Cdc.signedDelta(before, after, Seq("k")), Seq("g"), Seq("v"))
    val row = out.collect().head
    assert(row.getLong(1) == 2 && row.getLong(2) == 0 && row.isNullAt(3))
    assert(stateSet(out) == stateSet(Cdc.aggState(after, Seq("g"), Seq("v"))))
  }

  test("maintainAgg: scale>6 decimals round identically in bootstrap and delta") {
    // Both aggState and the delta path must cast each row to the
    // carried decimal(38,6) BEFORE summing: if the bootstrap summed
    // at native scale 8 and rounded once at the end, maintained
    // state would drift from recompute on exactly these values.
    val mk = (rows: Seq[(String, String, String)]) =>
      rows.toDF("g", "k", "raw")
        .select(col("g"), col("k"), col("raw").cast("decimal(38,8)").as("v"))
    val before = mk(Seq(
      ("g", "a", "0.00000049"), ("g", "b", "0.00000049"),
      ("g", "c", "0.00000049"), ("h", "d", "1.12345678")))
    val after = mk(Seq(
      ("g", "a", "0.00000049"), ("g", "c", "2.00000049"),
      ("h", "d", "1.12345678"), ("h", "e", "3.99999951")))
    val maintained = Cdc.maintainAgg(
      Cdc.aggState(before, Seq("g"), Seq("v")),
      Cdc.signedDelta(before, after, Seq("k")), Seq("g"), Seq("v"))
    val recomputed = Cdc.aggState(after, Seq("g"), Seq("v"))
    assert(maintained.schema == recomputed.schema)
    assert(stateSet(maintained) == stateSet(recomputed))
  }

  test("maintainAgg: long sums that would overflow Long stay exact") {
    val big = Long.MaxValue / 2
    val before = Seq(("g", "a", big), ("g", "b", big), ("g", "c", big))
      .toDF("g", "k", "v")
    val after = Seq(("g", "a", big), ("g", "b", big), ("g", "c", big),
      ("g", "d", big)).toDF("g", "k", "v")
    val maintained = Cdc.maintainAgg(
      Cdc.aggState(before, Seq("g"), Seq("v")),
      Cdc.signedDelta(before, after, Seq("k")), Seq("g"), Seq("v"))
    val recomputed = Cdc.aggState(after, Seq("g"), Seq("v"))
    assert(stateSet(maintained) == stateSet(recomputed))
    // 4 * (Long.MaxValue/2) overflows a long sum; decimal carries it
    val sum = maintained.collect().head.getDecimal(3)
    assert(sum.toBigInteger.toString ==
      (BigInt(big) * 4).toString)
  }

  test("joinDelta law: state(Aold⋈Bold) + Δ(A⋈B) == state(Anew⋈Bnew)") {
    // churn on BOTH sides so every term fires: ΔA⋈B_old (order
    // update/delete/insert), A_old⋈ΔB (customer segment flip and
    // delete — fan-out to that customer's orders), ΔA⋈ΔB (the cross
    // term: an updated order OF an updated customer — wrong sign
    // algebra here double- or under-counts exactly these rows)
    def a(rows: (Long, Long, String)*) = rows.toDF("ok", "ck", "st")
    def b(rows: (Long, String)*) = rows.toDF("ck", "seg")
    val aOld = a((1L, 10L, "O"), (2L, 10L, "F"), (3L, 20L, "O"),
      (4L, 30L, "F"), (5L, 40L, "O"))
    val aNew = a((1L, 10L, "X"), (3L, 20L, "O"), (4L, 30L, "F"),
      (5L, 40L, "O"), (6L, 20L, "O")) // 2 deleted, 1 updated, 6 inserted
    val bOld = b((10L, "A"), (20L, "B"), (30L, "C"), (50L, "D"))
    val bNew = b((10L, "A2"), (20L, "B"), (50L, "D"), (60L, "E"))
    // 30 deleted (order 4 vanishes from view), 10 re-segmented (its
    // UPDATED order 1 is the cross term), 40 never joined, 60 joins nothing

    def view(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.join(y, Seq("ck"), "inner")
    val cols = Seq("ck", "ok", "st", "seg")
    val state0 = Cdc.aggState(view(aOld, bOld), cols, Nil)
    val delta = Cdc.joinDelta(
      Cdc.signedDelta(aOld, aNew, Seq("ok")), aOld,
      Cdc.signedDelta(bOld, bNew, Seq("ck")), bOld, on = Seq("ck"))
    val maintained = Cdc.maintainAgg(state0, delta, cols, Nil)
    val recomputed = Cdc.aggState(view(aNew, bNew), cols, Nil)
    assert(maintained.schema == recomputed.schema)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(maintained) == rows(recomputed))
    // the cross term's row is present exactly once with the NEW
    // images on both sides
    assert(rows(maintained).contains(Seq(10L, 1L, "X", "A2", 1L)))
  }

  test("leftJoinDelta law: state(Aold⟕Bold) + Δ(A⟕B) == state(Anew⟕Bnew), every term exercised") {
    // churn chosen so each of the three delta terms fires, plus both
    // zero-crossing directions and the gnarliest composition (an A
    // row whose key B populates in the SAME batch):
    //  - inner terms: delete of matched (2,10), update of matched
    //    (1,10) against a re-segmented customer (cross term), insert
    //    of matched (8,20) with fan-out 2
    //  - term 1 (ΔA unmatched under B_new): insert (6,50)
    //  - term 2 (+1, key emptied): B deletes 30's only row — old row
    //    (4,30) gains a null-extension
    //  - term 2 (−1, key populated): B inserts 40's first row — old
    //    row (5,40) loses its null-extension while the inner A_old⋈ΔB
    //    term adds its matched image
    //  - both at once: (9,60) was null-extended and B inserts 60 in
    //    this batch — term 2 retracts the extension, the inner terms'
    //    sign algebra (+1 from A_old⋈ΔB, −1 from ΔA⋈ΔB) cancels the
    //    matched image of the RETRACTED old row exactly
    //  - a NULL-keyed A row never matches and never transitions
    def a(rows: Seq[(Long, Option[Long], String)]) = rows.toDF("ok", "ck", "st")
    def b(rows: Seq[(Long, String)]) = rows.toDF("ck", "seg")
    val aOld = a(Seq((1L, Some(10L), "O"), (2L, Some(10L), "F"),
      (3L, Some(20L), "O"), (4L, Some(30L), "F"), (5L, Some(40L), "O"),
      (7L, None, "N"), (9L, Some(60L), "O")))
    val aNew = a(Seq((1L, Some(10L), "X"), (3L, Some(20L), "O"),
      (4L, Some(30L), "F"), (5L, Some(40L), "O"), (6L, Some(50L), "O"),
      (7L, None, "N"), (8L, Some(20L), "P"), (9L, Some(20L), "O")))
    val bOld = b(Seq((10L, "A"), (20L, "B"), (20L, "B2"), (30L, "C")))
    val bNew = b(Seq((10L, "A2"), (20L, "B"), (20L, "B2"), (40L, "E"),
      (60L, "Z")))

    def viewL(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.join(y, Seq("ck"), "left")
    val cols = Seq("ck", "ok", "st", "seg")
    val state0 = Cdc.aggState(viewL(aOld, bOld), cols, Nil)
    val delta = Cdc.leftJoinDelta(
      Cdc.signedDelta(aOld, aNew, Seq("ok")), aOld,
      Cdc.signedDelta(bOld, bNew, Seq("ck")), bOld, on = Seq("ck"))
    val maintained = Cdc.maintainAgg(state0, delta, cols, Nil)
    val recomputed = Cdc.aggState(viewL(aNew, bNew), cols, Nil)
    assert(maintained.schema == recomputed.schema)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(maintained) == rows(recomputed))
    // the emptied key's row is null-extended, the populated key's is
    // matched, the same-batch composition landed on its NEW key, and
    // the null-keyed row still carries its extension
    assert(rows(maintained).contains(Seq(30L, 4L, "F", null, 1L)))
    assert(rows(maintained).contains(Seq(40L, 5L, "O", "E", 1L)))
    assert(rows(maintained).contains(Seq(20L, 9L, "O", "B", 1L)))
    assert(!rows(maintained).exists(r => r.head == 60L))
    assert(rows(maintained).contains(Seq(null, 7L, "N", null, 1L)))
  }

  test("leftJoinDelta maintains an aggregate OVER the outer join; randomized parity sweep") {
    val rnd = new scala.util.Random(42)
    for (i <- 1 to 5) {
      def randA(n: Int) = (1 to n).map(j =>
        (j.toLong + i * 1000,
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(6).toLong),
          Option(rnd.nextInt(20).toLong).filter(_ => rnd.nextInt(8) != 0)))
        .toDF("ok", "ck", "v")
      def randB(n: Int) = (1 to n)
        .map(j => (rnd.nextInt(6).toLong, s"s${rnd.nextInt(3)}", j.toLong))
        .toDF("ck", "seg", "bid")
      val aOld = randA(30).localCheckpoint(true)
      val bOld = randB(8).localCheckpoint(true)
      // churn: random row replacement on both sides
      val aNew = aOld.where(col("ok") % 7 =!= 0)
        .unionByName(randA(6).withColumn("ok", col("ok") + 500))
        .localCheckpoint(true)
      val bNew = bOld.where(col("bid") % 3 =!= 0)
        .unionByName(randB(3).withColumn("bid", col("bid") + 100))
        .localCheckpoint(true)
      val dA = Cdc.signedDelta(aOld, aNew, Seq("ok")).localCheckpoint(true)
      val dB = Cdc.signedDelta(bOld, bNew, Seq("bid")).localCheckpoint(true)
      // all three outer directions against their from-scratch truths;
      // group on the DIMENSION payload so NULL-extension churn is
      // visible (NULL seg = unmatched-A population in left/full) and
      // on the FACT payload for right/full (NULL v = unmatched-B)
      val cases = Seq[
        (String, String, (org.apache.spark.sql.DataFrame,
          org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
          org.apache.spark.sql.DataFrame, Seq[String], Boolean)
          => org.apache.spark.sql.DataFrame)](
        ("left", "left", Cdc.leftJoinDelta),
        ("right", "right", Cdc.rightJoinDelta),
        ("full", "outer", Cdc.fullJoinDelta))
      for ((label, joinType, deltaFn) <- cases) {
        def view(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
          x.join(y, Seq("ck"), joinType)
        val state0 = Cdc.aggState(view(aOld, bOld), Seq("seg"), Seq("v"))
        val delta = deltaFn(dA, aOld, dB, bOld, Seq("ck"), false)
        val maintained = Cdc.maintainAgg(state0, delta, Seq("seg"), Seq("v"))
        val recomputed = Cdc.aggState(view(aNew, bNew), Seq("seg"), Seq("v"))
        assert(maintained.collect().map(_.toSeq).toSet ==
          recomputed.collect().map(_.toSeq).toSet, s"sweep case $i ($label)")
      }
    }
  }

  test("fullJoinDelta law: both unmatched populations maintained, keys from the owning side") {
    // B has never-matched rows (70) and gains an unmatched one (80);
    // A's (4,30) delete empties B-row 30's match; B's (40,E) insert
    // matches A's same-batch insert (5,40) — the composition where
    // the inner terms and BOTH anti terms interact
    def a(rows: Seq[(Long, Option[Long], String)]) = rows.toDF("ok", "ck", "st")
    def b(rows: Seq[(Long, String)]) = rows.toDF("ck", "seg")
    val aOld = a(Seq((1L, Some(10L), "O"), (2L, Some(20L), "O"),
      (3L, None, "N"), (4L, Some(30L), "O")))
    val aNew = a(Seq((1L, Some(10L), "O"), (2L, Some(20L), "P"),
      (3L, None, "N"), (5L, Some(40L), "O")))
    val bOld = b(Seq((10L, "A"), (20L, "B"), (30L, "C"), (70L, "G")))
    val bNew = b(Seq((10L, "A"), (20L, "B"), (30L, "C"), (70L, "G"),
      (40L, "E"), (80L, "H")))
    def viewF(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.join(y, Seq("ck"), "outer")
    val cols = Seq("ck", "ok", "st", "seg")
    val state0 = Cdc.aggState(viewF(aOld, bOld), cols, Nil)
    val delta = Cdc.fullJoinDelta(
      Cdc.signedDelta(aOld, aNew, Seq("ok")), aOld,
      Cdc.signedDelta(bOld, bNew, Seq("ck")), bOld, on = Seq("ck"))
    val maintained = Cdc.maintainAgg(state0, delta, cols, Nil)
    val recomputed = Cdc.aggState(viewF(aNew, bNew), cols, Nil)
    assert(maintained.schema == recomputed.schema)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(maintained) == rows(recomputed))
    // emptied key 30: B row survives null-extended on the A side;
    // same-batch key 40: matched, no extension on either side;
    // new unmatched B row 80: extended; null-keyed A row: extended
    assert(rows(maintained).contains(Seq(30L, null, null, "C", 1L)))
    assert(rows(maintained).contains(Seq(40L, 5L, "O", "E", 1L)))
    assert(!rows(maintained).exists(r =>
      r.head == 40L && (r(1) == null || r(3) == null)))
    assert(rows(maintained).contains(Seq(80L, null, null, "H", 1L)))
    assert(rows(maintained).contains(Seq(null, 3L, "N", null, 1L)))
  }

  test("leftJoinDelta rejects reserved names and inherits joinDelta's contracts") {
    val aOld = Seq((1L, 10L, "O")).toDF("ok", "ck", "st")
    val bOld = Seq((10L, "A")).toDF("ck", "seg")
    val dA = Cdc.signedDelta(aOld, aOld.limit(0), Seq("ok"))
    val dB = Cdc.signedDelta(bOld, bOld.limit(0), Seq("ck"))
    intercept[IllegalArgumentException](
      Cdc.leftJoinDelta(dA, aOld.withColumn("__mo", lit(1)), dB, bOld, Seq("ck")))
    intercept[IllegalArgumentException](
      Cdc.leftJoinDelta(dA.drop("__sign"), aOld, dB, bOld, Seq("ck")))
  }

  test("delta linearity: σ (filter) commutes with signedDelta, boundary-crossers become I/D") {
    // σ is linear over signed multisets: σ(Δ) == Δ(σ). The sharp
    // edge is an UPDATE whose value crosses the predicate boundary —
    // its -image filters out and its +image survives (or vice
    // versa), turning an in-view update into a view insert/delete.
    val before = snap(("a", 5), ("b", 15), ("c", 20), ("d", 8))
    val after = snap(("a", 12), ("b", 15), ("c", 9), ("d", 6))
    // a: 5→12 crosses INTO v>10; c: 20→9 crosses OUT; b unchanged;
    // d stays below (invisible to the view entirely)
    val pred = col("v") > 10
    val maintained = Cdc.maintainAgg(
      Cdc.aggState(before.where(pred), Seq("k"), Seq("v")),
      Cdc.signedDelta(before, after, Seq("k")).where(pred),
      Seq("k"), Seq("v"))
    val recomputed = Cdc.aggState(after.where(pred), Seq("k"), Seq("v"))
    def s(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s(maintained) == s(recomputed))
    assert(s(maintained).map(_._1) == Set("a", "b"))
  }

  test("joinDelta rejects missing __sign, payload clash, reserved names") {
    val aOld = Seq((1L, 10L, "O")).toDF("ok", "ck", "st")
    val bOld = Seq((10L, "A")).toDF("ck", "seg")
    val dA = Cdc.signedDelta(aOld, aOld.limit(0), Seq("ok"))
    val dB = Cdc.signedDelta(bOld, bOld.limit(0), Seq("ck"))
    intercept[IllegalArgumentException](
      Cdc.joinDelta(dA.drop("__sign"), aOld, dB, bOld, Seq("ck")))
    val bClash = Seq((10L, "A")).toDF("ck", "st") // st on both sides
    intercept[IllegalArgumentException](
      Cdc.joinDelta(dA, aOld,
        Cdc.signedDelta(bClash, bClash.limit(0), Seq("ck")), bClash, Seq("ck")))
    intercept[IllegalArgumentException](
      Cdc.joinDelta(dA, aOld.withColumn("__sl", lit(1)), dB, bOld, Seq("ck")))
  }

  test("maintainAgg rejects float sums and state-name collisions") {
    val f = Seq(("g", 1.5)).toDF("g", "v")
    intercept[IllegalArgumentException](Cdc.aggState(f, Seq("g"), Seq("v")))
    val clash = Seq(("g", 1, 2)).toDF("g", "n", "v")
    intercept[IllegalArgumentException](
      Cdc.aggState(clash, Seq("g", "n"), Seq("v")))
    val deltaNoSign = Seq(("g", 1)).toDF("g", "v")
    val st = Cdc.aggState(Seq(("g", 1)).toDF("g", "v"), Seq("g"), Seq("v"))
    intercept[IllegalArgumentException](
      Cdc.maintainAgg(st, deltaNoSign, Seq("g"), Seq("v")))
  }

  // ── log-induced signed delta (CDC apply + piggybacked IVM) ───────

  test("logDelta law: state(pre) + logDelta(pre, batch) == state(applied)") {
    val pre = Seq(
      ("g1", "a", 10), ("g1", "b", 20), ("g2", "c", 5), ("g2", "d", 7))
      .toDF("g", "k", "v")
    val log = Seq(
      ("g1", "a", 15, 1, "U"),   // value change
      ("g2", "e", 9, 1, "I"),    // new key
      ("g2", "c", 0, 1, "D"),    // delete existing
      ("g3", "zz", 1, 1, "D"),   // delete nonexistent: no-op
      ("g1", "b", 20, 1, "U"),   // upsert-identical: ±pair cancels
      ("g1", "d", 99, 1, "U"),   // key moves g2 -> g1
      ("g9", "f", 1, 1, "U"), ("g9", "f", 3, 2, "U")) // last writer wins
      .toDF("g", "k", "v", "seq", "op")
    val delta = Cdc.logDelta(pre, log, Seq("k"), Seq("seq"))
    val maintained = Cdc.maintainAgg(
      Cdc.aggState(pre, Seq("g"), Seq("v")), delta, Seq("g"), Seq("v"))
    // the applied table, by definition: untouched pre rows + non-D winners
    val winners = Cdc.applyLog(log, Seq("k"), Seq("seq"))
    val applied = pre.join(log.select("k").distinct(), Seq("k"), "left_anti")
      .unionByName(winners)
    assert(stateSet(maintained) ==
      stateSet(Cdc.aggState(applied, Seq("g"), Seq("v"))))
    // churn-sized: delta rows bounded by |touched pre rows| + |non-D winners|
    assert(delta.count() <= 4 + 6)
  }

  test("logDelta rejects payload/schema mismatch") {
    val pre = Seq(("g", "a", 1)).toDF("g", "k", "v")
    val log = Seq(("g", "a", 1, 1, "U")).toDF("g", "k", "WRONG", "seq", "op")
    intercept[IllegalArgumentException](
      Cdc.logDelta(pre, log, Seq("k"), Seq("seq")))
  }

  // ── extrema maintenance ────────────────────────────────────────────

  private def extSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (
      Option(r.getString(0)), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getInt(3)),
      if (r.isNullAt(4)) None else Some(r.getInt(4)))).toSet

  private def extMaintain(
      before: org.apache.spark.sql.DataFrame,
      after: org.apache.spark.sql.DataFrame) =
    Cdc.maintainExtrema(
      Cdc.extremaState(before, Seq("g"), Seq("v")),
      Cdc.signedDelta(before, after, Seq("k")),
      after, Seq("g"), Seq("v"))

  test("maintainExtrema law: endangered groups recompute, fold paths fold") {
    val before = gsnap(
      (Some("g1"), "a", Some(10)), (Some("g1"), "b", Some(20)),
      (Some("g1"), "c", Some(30)),                        // g1 max
      (Some("g2"), "d", Some(5)), (Some("g2"), "e", Some(9)),
      (Some("g3"), "f", Some(1)),                        // whole group goes
      (None, "n1", Some(7)),                             // null group key
      (Some("g4"), "h", None))                           // all-null group
    val after = gsnap(
      (Some("g1"), "a", Some(10)),
      (Some("g1"), "b", Some(20)),                       // c (max) deleted
      (Some("g2"), "d", Some(5)),
      (Some("g2"), "e2", Some(7)),                       // mid-range churn
      (Some("g2"), "e3", Some(3)),                       // new min (fold)
      (None, "n1", Some(7)),                             // untouched
      (Some("g4"), "h", None),
      (Some("g5"), "i", Some(42)))                       // brand-new group
    val maintained = extMaintain(before, after)
    val recomputed = Cdc.extremaState(after, Seq("g"), Seq("v"))
    assert(maintained.schema == recomputed.schema)
    assert(extSet(maintained) == extSet(recomputed))
    assert(!extSet(maintained).exists(_._1.contains("g3")))
  }

  test("maintainExtrema: retracting the last non-null value restores NULL extrema") {
    val before = gsnap((Some("g"), "a", Some(5)), (Some("g"), "b", None))
    val after = gsnap((Some("g"), "a", None), (Some("g"), "b", None))
    val out = extMaintain(before, after)
    val row = out.collect().head
    assert(row.getLong(1) == 2 && row.getLong(2) == 0 &&
      row.isNullAt(3) && row.isNullAt(4))
  }

  test("maintainExtrema composes: two sequential deltas == final recompute") {
    val s0 = gsnap((Some("g"), "a", Some(1)), (Some("g"), "b", Some(9)))
    val s1 = gsnap((Some("g"), "a", Some(1)), (Some("h"), "c", Some(3)))
    val s2 = gsnap((Some("h"), "c", Some(4)), (Some("h"), "d", None))
    val step1 = Cdc.maintainExtrema(
      Cdc.extremaState(s0, Seq("g"), Seq("v")),
      Cdc.signedDelta(s0, s1, Seq("k")), s1, Seq("g"), Seq("v"))
    val step2 = Cdc.maintainExtrema(
      step1, Cdc.signedDelta(s1, s2, Seq("k")), s2, Seq("g"), Seq("v"))
    assert(extSet(step2) == extSet(Cdc.extremaState(s2, Seq("g"), Seq("v"))))
  }

  test("maintainExtrema: insert-only and interior-delete batches fold without the base") {
    // baseAfter is deliberately POISONED: if the recompute path read
    // it for any group, the maintained state would disagree with the
    // recompute of the true after snapshot. Pure insertions fold, and
    // so does a delete strictly inside the (min, max) open interval.
    val before = gsnap(
      (Some("g"), "a", Some(5)),
      (Some("m"), "p", Some(1)), (Some("m"), "q", Some(3)),
      (Some("m"), "r", Some(9)))
    val after = gsnap(
      (Some("g"), "a", Some(5)), (Some("g"), "b", Some(1)), // new min: fold
      (Some("m"), "p", Some(1)), (Some("m"), "r", Some(9)), // q interior-deleted
      (Some("x"), "c", Some(8)))                            // new group: fold
    val poisonedBase = gsnap(
      (Some("g"), "zz", Some(-999)), (Some("m"), "zz", Some(-999)))
    val out = Cdc.maintainExtrema(
      Cdc.extremaState(before, Seq("g"), Seq("v")),
      Cdc.signedDelta(before, after, Seq("k")),
      poisonedBase, Seq("g"), Seq("v"))
    assert(extSet(out) == extSet(Cdc.extremaState(after, Seq("g"), Seq("v"))))
  }

  test("maintainExtrema rejects bad state schema and missing __sign") {
    val df = gsnap((Some("g"), "a", Some(1)))
    val st = Cdc.extremaState(df, Seq("g"), Seq("v"))
    intercept[IllegalArgumentException](
      Cdc.maintainExtrema(st.drop("min_v"),
        Cdc.signedDelta(df, df, Seq("k")), df, Seq("g"), Seq("v")))
    intercept[IllegalArgumentException](
      Cdc.maintainExtrema(st, df, df, Seq("g"), Seq("v")))
  }

  // ── top-k view over the two-level counting state ──────────────────

  test("topKByCount: maintained multiset reads off exact top-k, deletion-aware") {
    val before = gsnap(
      (Some("g"), "a", Some(1)), (Some("g"), "b", Some(1)),
      (Some("g"), "c", Some(1)),                       // 1 × 3
      (Some("g"), "d", Some(2)), (Some("g"), "e", Some(2)), // 2 × 2
      (Some("g"), "f", Some(3)))                       // 3 × 1
    val after = gsnap(
      (Some("g"), "a", Some(1)),                       // two 1s deleted: 1 × 1
      (Some("g"), "d", Some(2)), (Some("g"), "e", Some(2)), // 2 × 2 (new top)
      (Some("g"), "f", Some(3)), (Some("g"), "h", Some(3))) // 3 × 2 (ties 2)
    val inner = Cdc.maintainAgg(
      Cdc.aggState(before, Seq("g", "v"), Nil),
      Cdc.signedDelta(before, after, Seq("k")), Seq("g", "v"), Nil)
    val got = Cdc.topKByCount(inner, Seq("g"), "v", k = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    // counts: v=2 → 2, v=3 → 2, v=1 → 1; tie between 2 and 3 breaks
    // by value ascending — exactly what a sketch cannot do under the
    // deletions that demoted v=1 from its 3-row lead
    assert(got == Set((2, 2L, 1), (3, 2L, 2)))
  }

  test("quantileByCount: maintained multiset reads off the exact median under churn") {
    val before = gsnap(
      (Some("g"), "a", Some(1)), (Some("g"), "b", Some(2)),
      (Some("g"), "c", Some(3)), (Some("g"), "d", Some(9)),
      (Some("e"), "x", Some(5)), (Some("e"), "y", Some(7)),
      (Some("z"), "n1", None))
    val after = gsnap(
      (Some("g"), "a", Some(1)),
      (Some("g"), "c", Some(3)), (Some("g"), "d", Some(9)), // b deleted
      (Some("e"), "x", Some(5)), (Some("e"), "y", Some(7)),
      (Some("z"), "n1", None))
    val inner = Cdc.maintainAgg(
      Cdc.aggState(before, Seq("g", "v"), Nil),
      Cdc.signedDelta(before, after, Seq("k")), Seq("g", "v"), Nil)
    val got = Cdc.quantileByCount(inner, Seq("g"), "v", q = 0.5).collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    // g: {1,3,9} → median 3 (the deletion moved it from 2);
    // e: {5,7}, target = ceil(0.5·2) = 1 → lower middle 5;
    // z: all-null → no row
    assert(got == Map("g" -> 3, "e" -> 5))
  }

  // ── maintained grouping-sets lattice ──────────────────────────────

  private def csnap(rows: (Option[String], Option[String], String, Option[Int])*) =
    rows.toDF("a", "b", "k", "v")

  private def cubeSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (
      Option(r.getString(0)), Option(r.getString(1)), r.getInt(2),
      r.getLong(3), r.getLong(4),
      Option(r.getDecimal(5)).map(_.toPlainString))).toSet

  private val cubeSets = Seq(Seq("a", "b"), Seq("a"), Seq.empty[String])

  test("maintainCube law: every grouping set maintained == per-set recompute") {
    val before = csnap(
      (Some("x"), Some("p"), "1", Some(10)),
      (Some("x"), Some("q"), "2", Some(20)),
      (Some("y"), Some("p"), "3", Some(5)),
      (Some("y"), Some("p"), "4", None),
      (None, Some("q"), "5", Some(7)))     // NULL group value ≠ rollup
    val after = csnap(
      (Some("x"), Some("p"), "1", Some(15)),   // value change
      (Some("x"), Some("q"), "2", Some(20)),   // untouched
      // y/p fully deleted: (y,p) vanishes at gid 0, y vanishes at gid 1
      (None, Some("q"), "5", Some(7)),
      (Some("z"), Some("r"), "6", Some(1)))    // new group at every level
    val state = Cdc.cubeState(before, Seq("a", "b"), cubeSets, Seq("v"))
    val maintained = Cdc.maintainCube(
      state, Cdc.signedDelta(before, after, Seq("k")),
      Seq("a", "b"), cubeSets, Seq("v"))
    val recomputed = Cdc.cubeState(after, Seq("a", "b"), cubeSets, Seq("v"))
    assert(maintained.schema == recomputed.schema)
    assert(cubeSet(maintained) == cubeSet(recomputed))
    // the vanished fine group is gone at gid 0 AND its rollup level,
    // while the grand total (gid 2) survives
    val gids = maintained.collect()
      .map(r => (Option(r.getString(0)), r.getInt(2))).toSet
    assert(!gids.contains((Some("y"), 0)) && !gids.contains((Some("y"), 1)))
    assert(gids.exists(_._2 == 2))
  }

  test("cubeState: NULL group value and rollup NULL stay distinct via __gid") {
    val df = csnap((None, Some("p"), "1", Some(3)), (Some("x"), Some("p"), "2", Some(4)))
    val st = Cdc.cubeState(df, Seq("a", "b"), cubeSets, Seq("v"))
    // gid 1 (group by a): one row for a=NULL (the real value), one for
    // a=x; gid 2 (grand total): a=NULL again but distinguishable
    val rows = st.collect().map(r =>
      (Option(r.getString(0)), r.getInt(2), r.getLong(3))).toSet
    assert(rows.contains((None, 1, 1L)) && rows.contains((Some("x"), 1, 1L)))
    assert(rows.contains((None, 2, 2L)))
  }

  test("cube rejects: unknown set column, duplicate sets, __gid collision") {
    val df = csnap((Some("x"), Some("p"), "1", Some(1)))
    intercept[IllegalArgumentException](
      Cdc.cubeState(df, Seq("a", "b"), Seq(Seq("zz")), Seq("v")))
    intercept[IllegalArgumentException](
      Cdc.cubeState(df, Seq("a", "b"), Seq(Seq("a"), Seq("a")), Seq("v")))
    intercept[IllegalArgumentException](
      Cdc.cubeState(df.withColumn("__gid", lit(1)), Seq("a", "b"),
        cubeSets, Seq("v")))
  }

  // ── distinct-count view over the two-level counting state ─────────

  test("distinctCount law: maintained (group, value) state reads off COUNT(DISTINCT)") {
    val before = gsnap(
      (Some("g1"), "a", Some(10)), (Some("g1"), "b", Some(10)), // dup value
      (Some("g1"), "c", Some(20)),
      (Some("g2"), "d", None), (Some("g2"), "e", Some(5)),
      (Some("g3"), "f", None))                                  // all-null: nd 0
    val after = gsnap(
      (Some("g1"), "a", Some(10)),           // b deleted: 10 still present
      (Some("g1"), "c", Some(30)),           // 20 -> 30: value set churns
      (Some("g2"), "d", None), (Some("g2"), "e", Some(5)),
      (Some("g3"), "f", None))
    val inner0 = Cdc.aggState(before, Seq("g", "v"), Nil)
    val inner1 = Cdc.maintainAgg(
      inner0, Cdc.signedDelta(before, after, Seq("k")), Seq("g", "v"), Nil)
    val got = Cdc.distinctCount(inner1, Seq("g"), "v").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (Some("g1"), 2L, 2L),   // values {10, 30}
      (Some("g2"), 2L, 1L),   // one null + one value
      (Some("g3"), 1L, 0L)))  // all-null group reports 0, not vanish
  }
}
