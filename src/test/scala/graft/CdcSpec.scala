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
}
