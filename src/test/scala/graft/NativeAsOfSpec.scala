package graft

import java.sql.Timestamp
import graft.ext.Temporal
import graft.plans.NativeAsOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The native Catalyst as-of operator (marker → rewrite rule →
  * strategy → merge exec) must be semantically indistinguishable
  * from the union-and-carry composition it sits beside — every law
  * here grades one against the other or against a hand-computed
  * truth — and its physical plan must be the two-exchange co-
  * partitioned merge it promises.
  */
class NativeAsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

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

  test("native inclusive: equal-ts match, latest-before match, null when none") {
    val (left, right) = asofFixture
    val out = NativeAsOf.join(left, right,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "r_ts")
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(out == Map(
      1L -> Some("r1"), 2L -> Some("r2"), 3L -> None, 4L -> None, 5L -> Some("r4")))
  }

  test("native strict: equal-ts candidate is excluded") {
    val (left, right) = asofFixture
    val out = NativeAsOf.join(left, right,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "r_ts", strict = true)
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(out(1L).isEmpty && out(2L).contains("r2"))
  }

  test("native: null left key/time match nothing; null-key/time right rows invisible") {
    val left = Seq(
      (1L, Some(10L), Some(ts("2024-01-01 12:00:00"))),
      (2L, None, Some(ts("2024-01-01 12:00:00"))),      // null key
      (3L, Some(10L), None)                             // null time
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(10L), Some(ts("2024-01-01 10:00:00")), "ok"),
      (None, Some(ts("2024-01-01 11:00:00")), "nullkey"),
      (Some(10L), None, "nulltime")
    ).toDF("user_id", "r_ts", "tag")
    val out = NativeAsOf.join(left, right,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "r_ts")
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("ok"), 2L -> None, 3L -> None))
  }

  test("native == composition on randomized data, inclusive and strict, multi-key") {
    val rnd = new Random(41)
    val lrows = Seq.fill(400)((rnd.nextInt(6).toLong, s"g${rnd.nextInt(3)}",
      ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
      rnd.nextInt(1000).toLong))
    // unique per (keys, time): reduce below
    val rrows = Seq.fill(300)((rnd.nextInt(6).toLong, s"g${rnd.nextInt(3)}",
      ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
      rnd.nextInt(1000)))
    val left = lrows.toDF("k1", "k2", "ts", "lv")
      .withColumn("lid", monotonically_increasing_id())
    val right = rrows.toDF("k1", "k2", "r_ts", "rv")
      .groupBy("k1", "k2", "r_ts").agg(max("rv").as("rv"))
    for (strict <- Seq(false, true)) {
      val nat = NativeAsOf.join(left, right,
        keys = Seq("k1", "k2"), leftTime = "ts", rightTime = "r_ts", strict = strict)
        .select("lid", "r_ts", "rv")
      val comp = Temporal.asOfJoin(left, right,
        keys = Seq("k1", "k2"), leftTime = "ts", rightTime = "r_ts", strict = strict)
        .select("lid", "r_ts", "rv")
      assert(nat.exceptAll(comp).isEmpty && comp.exceptAll(nat).isEmpty,
        s"native and composition as-of diverge (strict=$strict)")
    }
  }

  test("plan pin: AsOfJoin exec, co-partitioned — exactly one exchange per side, no SMJ") {
    val (left, right) = asofFixture
    val df = NativeAsOf.join(left, right,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "r_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native operator missing from plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"marked join must be rewritten, not planned as a stock join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected one hash exchange per side:\n$plan")
  }

  test("unmarked joins are untouched by the installed extensions") {
    val (left, right) = asofFixture
    val df = left.join(right, Seq("user_id"), "left")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("AsOfJoin"), s"rule must be inert without the marker:\n$plan")
  }

  test("pure-SQL surface: marked LEFT JOIN plans and runs as the native operator") {
    val (left, right) = asofFixture
    NativeAsOf.register(spark)
    left.createOrReplaceTempView("asof_l")
    right.createOrReplaceTempView("asof_r")
    val df = spark.sql(
      """SELECT l.event_id, r.tag FROM asof_l l
        |LEFT JOIN asof_r r
        |  ON l.user_id = r.user_id AND graft_asof_mark(l.ts, r.r_ts, false)""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val out = df.as[(Long, Option[String])].collect().toMap
    assert(out == Map(
      1L -> Some("r1"), 2L -> Some("r2"), 3L -> None, 4L -> None, 5L -> Some("r4")))
  }

  test("payload-name collision fails with the contract") {
    val (left, right) = asofFixture
    val ex = intercept[IllegalArgumentException] {
      NativeAsOf.join(left, right.withColumnRenamed("tag", "ts"),
        keys = Seq("user_id"), leftTime = "ts", rightTime = "r_ts")
    }
    assert(ex.getMessage.contains("collide"))
  }
}
