package graft

import graft.functions.ThetaOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ThetaSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Two tagged cohorts in one table → one row of all five
    * estimators. */
  private def opsRow(df: DataFrame, k: Int) = {
    val st = df.agg(
      ThetaOps.sketchState(when(col("tag") === "a", col("v")), k).as("sa"),
      ThetaOps.sketchState(when(col("tag") === "b", col("v")), k).as("sb"))
    st.select(
      ThetaOps.estimate(col("sa")).as("na"),
      ThetaOps.estimate(col("sb")).as("nb"),
      ThetaOps.union(col("sa"), col("sb")).as("nu"),
      ThetaOps.intersect(col("sa"), col("sb")).as("ni"),
      ThetaOps.diff(col("sa"), col("sb")).as("nd"))
      .head()
  }

  test("exact regime: set algebra equals true set operations") {
    // |A| = 300, |B| = 250, |A∩B| = 150 — all below k
    val a = (0L until 300L).map(("a", _))
    val b = (150L until 400L).map(("b", _))
    val r = opsRow((a ++ b).toDF("tag", "v"), k = 1024)
    assert(r.getLong(0) == 300 && r.getLong(1) == 250)
    assert(r.getLong(2) == 400)  // union
    assert(r.getLong(3) == 150)  // intersection
    assert(r.getLong(4) == 150)  // A \ B
  }

  test("exact regime: duplicates collapse, nulls ignored") {
    val rows = Seq(("a", Some(1L)), ("a", Some(1L)), ("a", None),
      ("b", Some(1L)), ("b", Some(2L)), ("b", None))
    val r = opsRow(rows.toDF("tag", "v"), k = 64)
    assert(r.getLong(0) == 1 && r.getLong(1) == 2)
    assert(r.getLong(2) == 2 && r.getLong(3) == 1 && r.getLong(4) == 0)
  }

  test("exact regime: disjoint and identical cohorts") {
    val disjoint = ((0L until 100L).map(("a", _)) ++
      (1000L until 1100L).map(("b", _))).toDF("tag", "v")
    val rd = opsRow(disjoint, k = 1024)
    assert(rd.getLong(2) == 200 && rd.getLong(3) == 0 && rd.getLong(4) == 100)
    val same = ((0L until 100L).flatMap(v => Seq(("a", v), ("b", v))))
      .toDF("tag", "v")
    val rs = opsRow(same, k = 1024)
    assert(rs.getLong(2) == 100 && rs.getLong(3) == 100 && rs.getLong(4) == 0)
  }

  test("exact regime is partition-invariant (the declared-query config)") {
    val df = ((0L until 500L).map(("a", _)) ++ (250L until 700L).map(("b", _)))
      .toDF("tag", "v")
    val r1 = opsRow(df.repartition(1), k = 2048)
    val r13 = opsRow(df.repartition(13, col("v")), k = 2048)
    assert(r1 == r13)
  }

  test("approximate regime: estimates within theta-sketch error bounds") {
    // 40k ∪-distinct values, k = 2048 → both sketches saturate.
    // KMV relative standard error ≈ 1/√(k−2); assert 5σ on the big
    // sets and a looser absolute band on the (overlap-fraction-
    // dependent) intersection/difference estimators.
    val n = 30000L
    val overlap = 10000L
    val a = (0L until n).map(("a", _))
    val b = ((n - overlap) until (2 * n - overlap)).map(("b", _))
    val r = opsRow((a ++ b).toDF("tag", "v"), k = 2048)
    val rse = 1.0 / math.sqrt(2048 - 2)
    def within(est: Long, truth: Long, sigmas: Double): Boolean =
      math.abs(est - truth) <= sigmas * rse * truth
    assert(within(r.getLong(0), n, 5), s"na=${r.getLong(0)}")
    assert(within(r.getLong(1), n, 5), s"nb=${r.getLong(1)}")
    assert(within(r.getLong(2), 2 * n - overlap, 5), s"nu=${r.getLong(2)}")
    // intersection/difference: θ-restricted estimators have RSE
    // inflated by ~√(|U|/|result|) — allow 10σ of the result size
    assert(within(r.getLong(3), overlap, 10 * math.sqrt(5.0)),
      s"ni=${r.getLong(3)}")
    assert(within(r.getLong(4), n - overlap, 10 * math.sqrt(2.5)),
      s"nd=${r.getLong(4)}")
  }

  test("mismatched k is rejected loudly") {
    val df = (0L until 10L).map(("a", _)).toDF("tag", "v")
    val st = df.agg(
      ThetaOps.sketchState(col("v"), 64).as("sa"),
      ThetaOps.sketchState(col("v"), 128).as("sb"))
    val e = intercept[Exception] {
      st.select(ThetaOps.union(col("sa"), col("sb"))).head()
    }
    assert(e.getMessage.contains("matching sketch k") ||
      e.getCause != null && e.getCause.getMessage.contains("matching sketch k"))
  }

  test("SQL surface: kmv_state / theta_* registered and consistent") {
    graft.functions.GraftFunctions.registerAll(spark)
    ((0L until 200L).map(("a", _)) ++ (100L until 300L).map(("b", _)))
      .toDF("tag", "v").createOrReplaceTempView("theta_in")
    val r = spark.sql(
      """SELECT theta_estimate(sa) AS na, theta_union(sa, sb) AS nu,
        |       theta_intersect(sa, sb) AS ni, theta_diff(sa, sb) AS nd
        |FROM (SELECT
        |  kmv_state(CASE WHEN tag = 'a' THEN xxhash64(v) END, 1024) AS sa,
        |  kmv_state(CASE WHEN tag = 'b' THEN xxhash64(v) END, 1024) AS sb
        |FROM theta_in)""".stripMargin).head()
    assert(r.getLong(0) == 200 && r.getLong(1) == 300)
    assert(r.getLong(2) == 100 && r.getLong(3) == 100)
  }
}
