package graft

import graft.ext.{Expectations, Profiling}
import graft.ext.Expectations._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def byCol(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r).toMap

  test("profile: counts, nulls, distinct, min/max per column") {
    val df = Seq(
      (Some(9L), Some("b")),
      (Some(10L), Some("a")),
      (None, Some("a")),
      (Some(9L), None))
      .toDF("k", "s")
    val p = byCol(Profiling.profile(df, Seq("k", "s")))
    assert(p.keySet == Set("k", "s"))
    val k = p("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 1 && k.getLong(3) == 2)
    // min/max on the NATIVE type then cast: 9 < 10 numerically even
    // though "10" < "9" lexically — guards a cast-before-min bug
    assert(k.getString(4) == "9" && k.getString(5) == "10")
    val s = p("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
  }

  test("profile: all-null column yields null min/max and zero distinct") {
    val df = Seq((1, None: Option[String]), (2, None)).toDF("i", "s")
    val s = byCol(Profiling.profile(df, Seq("s")))("s")
    assert(s.getLong(1) == 2 && s.getLong(2) == 2 && s.getLong(3) == 0)
    assert(s.isNullAt(4) && s.isNullAt(5))
  }

  test("profile: approximate mode agrees at small cardinality") {
    val df = (1 to 500).map(i => (i.toLong % 37, s"v${i % 11}"))
      .toDF("k", "s")
    val exact = byCol(Profiling.profile(df, Seq("k", "s")))
    val approx = byCol(Profiling.profile(df, Seq("k", "s"), exact = false))
    // HLL++ is exact in its sparse regime (cardinality << 1/err²)
    Seq("k", "s").foreach { c =>
      assert(approx(c).getLong(3) == exact(c).getLong(3), s"column $c")
    }
  }

  test("profile: one scan; exact pays one distinct-value shuffle, approx none") {
    val df = (1 to 100).map(i => (i.toLong, i % 7, s"s$i")).toDF("a", "b", "c")
    val exactPlan = Profiling.profile(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    // the input is read ONCE (the multi-column exact distinct is one
    // Expand over the same scan, not one scan per column), and the
    // only hash exchange is the (value, gid)-keyed distinct shuffle —
    // it carries locally-deduplicated values, not input rows
    assert("LocalTableScan".r.findAllIn(exactPlan).length == 1,
      s"profile must scan its input exactly once:\n$exactPlan")
    assert("Exchange hashpartitioning".r.findAllIn(exactPlan).length == 1,
      s"exact profile pays exactly the one distinct-value shuffle:\n$exactPlan")
    assert(exactPlan.contains("Expand"),
      s"exact multi-distinct should go through one Expand:\n$exactPlan")
    // approx mode (HLL) is one ordinary partial+final global
    // aggregate: no Expand, no hash shuffle at all
    val approxPlan = Profiling.profile(df, Seq("a", "b", "c"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Exchange hashpartitioning") &&
      !approxPlan.contains("Expand"),
      s"approx profile must be shuffle-free:\n$approxPlan")
  }

  test("profile: unknown column rejected loudly") {
    val df = Seq((1, 2)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Profiling.profile(df, Seq("a", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("expectations: every rule kind counts its violations") {
    val facts = Seq(
      (Some(1L), Some(10.0), Some("O")),
      (Some(1L), Some(-5.0), Some("X")),   // range + in_set + dup key
      (None, Some(20.0), Some("F")),       // null FK col
      (Some(99L), None, None))             // dangling FK; nulls skip range/set
      .toDF("fk", "amt", "st")
    val dim = Seq(1L, 2L).toDF("id")
    val out = Expectations.check(facts, Seq(
      ExpectNotNull("fk"),
      ExpectRange("amt", lit(0.0), lit(15.0)),
      ExpectInSet("st", Seq("O", "F")),
      ExpectRowCount(1L, 3L),
      ExpectUnique(Seq("fk")),
      ExpectRefIntegrity("fk", dim, "id")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(("not_null", "fk")) == (1L, false))
    assert(out(("range", "amt")) == (2L, false))   // -5 and 20 out of [0,15]
    assert(out(("in_set", "st")) == (1L, false))   // X
    assert(out(("row_count", "*")) == (1L, false)) // 4 rows, hi = 3
    assert(out(("unique", "fk")) == (1L, false))   // fk=1 twice → 1 excess
    assert(out(("ref_integrity", "fk->id")) == (1L, false)) // 99 dangles
  }

  test("expectations: clean table passes every rule") {
    val facts = Seq((1L, 5.0, "O"), (2L, 6.0, "F")).toDF("fk", "amt", "st")
    val dim = Seq(1L, 2L).toDF("id")
    val out = Expectations.check(facts, Seq(
      ExpectNotNull("fk"),
      ExpectRange("amt", lit(0.0), lit(10.0)),
      ExpectInSet("st", Seq("O", "F")),
      ExpectRowCount(1L, 100L),
      ExpectUnique(Seq("fk")),
      ExpectRefIntegrity("fk", dim, "id"))).collect()
    assert(out.length == 6)
    assert(out.forall(r => r.getLong(2) == 0L && r.getBoolean(3)))
  }

  test("expectations: null FK is not a referential-integrity violation") {
    val facts = Seq(Option.empty[Long], Some(7L)).toDF("fk")
    val dim = Seq(7L).toDF("id")
    val out = Expectations.check(facts,
      Seq(ExpectRefIntegrity("fk", dim, "id"))).collect()
    assert(out.head.getLong(2) == 0L && out.head.getBoolean(3))
  }

  test("expectations: scalar rules share one aggregate exchange") {
    val facts = (1 to 50).map(i => (i.toLong, i * 1.0, s"s${i % 3}"))
      .toDF("fk", "amt", "st")
    val plan = Expectations.check(facts, Seq(
      ExpectNotNull("fk"),
      ExpectRange("amt", lit(0.0), lit(100.0)),
      ExpectInSet("st", Seq("s0", "s1", "s2")),
      ExpectRowCount(1L, 100L)))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"four scalar rules must fold into one aggregate:\n$plan")
  }

  test("flagViolations: per-row labels in declaration order") {
    val facts = Seq(
      (Some(1L), Some(10.0), Some("O")),
      (Some(1L), Some(-5.0), Some("X")),
      (None, Some(20.0), Some("F")),
      (Some(99L), None, None))
      .toDF("fk", "amt", "st")
    val dim = Seq(1L, 2L).toDF("id")
    val out = Expectations.flagViolations(facts, Seq(
      ExpectNotNull("fk"),
      ExpectRange("amt", lit(0.0), lit(15.0)),
      ExpectInSet("st", Seq("O", "F")),
      ExpectUnique(Seq("fk")),
      ExpectRefIntegrity("fk", dim, "id")))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))) -> r.getString(3)).toMap
    assert(out((Some(1L), Some(10.0))) == "unique:fk")
    assert(out((Some(1L), Some(-5.0))) ==
      "range:amt,in_set:st,unique:fk")
    assert(out((None, Some(20.0))) == "not_null:fk,range:amt")
    assert(out((Some(99L), None)) == "ref_integrity:fk->id")
  }

  test("flagViolations: scalar-only rules add no exchange") {
    val facts = (1 to 40).map(i => (i.toLong, i * 1.0)).toDF("fk", "amt")
    val plan = Expectations.flagViolations(facts, Seq(
      ExpectNotNull("fk"), ExpectRange("amt", lit(0.0), lit(100.0))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scalar row flags must be a pure projection:\n$plan")
  }

  test("flagViolations: table-level row-count rule rejected") {
    val facts = Seq((1L, 1.0)).toDF("fk", "amt")
    val e = intercept[IllegalArgumentException] {
      Expectations.flagViolations(facts, Seq(ExpectRowCount(1L, 10L)))
    }
    assert(e.getMessage.contains("table-level"))
  }

  test("split: clean and quarantined partition the table") {
    val facts = Seq(
      (Some(1L), Some(5.0)), (Some(2L), Some(-1.0)), (None, Some(3.0)))
      .toDF("fk", "amt")
    val (clean, bad) = Expectations.split(facts, Seq(
      ExpectNotNull("fk"), ExpectRange("amt", lit(0.0), lit(10.0))))
    assert(clean.columns.toSeq == Seq("fk", "amt"))
    assert(clean.count() == 1 && bad.count() == 2)
    assert(clean.head().getLong(0) == 1L)
    assert(bad.collect().forall(_.getString(2).nonEmpty))
  }

  test("iqrOutliers: Tukey fences flag exactly the extreme rows") {
    // group g: bulk at 100..107 plus 1 and 1000 → q1/q3 inside the
    // bulk, fences exclude the two extremes
    val vals = Seq(1L, 100L, 101L, 102L, 103L, 104L, 105L, 106L, 107L, 1000L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")
    val out = Profiling.iqrOutliers(df, "v", Seq("grp")).collect()
    assert(out.map(_.getLong(2)).sorted.toSeq == Seq(1L, 1000L))
    // fences attached: q1/q3 are actual data elements
    val q1 = out.head.getLong(3); val q3 = out.head.getLong(4)
    assert(vals.contains(q1) && vals.contains(q3) && q1 <= q3)
  }

  test("iqrOutliers: groups are fenced independently") {
    val a = Seq(10L, 11L, 12L, 13L, 500L).zipWithIndex
      .map { case (v, i) => (i.toLong, "a", v) }
    val b = Seq(500L, 501L, 502L, 503L, 504L).zipWithIndex
      .map { case (v, i) => (100L + i, "b", v) }
    val out = Profiling.iqrOutliers((a ++ b).toDF("id", "grp", "v"),
      "v", Seq("grp")).collect()
    // 500 is an outlier in group a but perfectly normal in group b
    // (join keys lead the output: grp, id, v, q1, q3)
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSet ==
      Set(("a", 500L)))
  }

  test("iqrOutliers: non-integral metric rejected loudly") {
    val df = Seq((1L, "g", 1.5)).toDF("id", "grp", "v")
    val e = intercept[IllegalArgumentException] {
      Profiling.iqrOutliers(df, "v", Seq("grp"))
    }
    assert(e.getMessage.contains("integral"))
  }
  test("histogram: exact integer bins, max value in the last bin") {
    val df = (0L to 9L).toDF("v")
    val out = Profiling.histogram(df, "v", 5)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect().toSeq
    // range 10, 5 bins: (v - 0) * 5 div 10 -> pairs of values per bin
    assert(out === Seq((0L, 2L, 0L, 9L), (1L, 2L, 0L, 9L), (2L, 2L, 0L, 9L),
      (3L, 2L, 0L, 9L), (4L, 2L, 0L, 9L)))
  }

  test("histogram: negatives, nulls excluded, only non-empty bins emit") {
    val df = Seq(Some(-10L), Some(-10L), None, Some(10L)).toDF("v")
    val out = Profiling.histogram(df, "v", 4)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect().toSeq
    // range [-10, 10] = 21; -10 -> bin 0, 10 -> (20*4) div 21 = 3
    assert(out === Seq((0L, 2L, -10L, 10L), (3L, 1L, -10L, 10L)))
  }

  test("histogram: constant column lands wholly in bin 0; empty input -> empty typed frame") {
    val one = Profiling.histogram(Seq(7L, 7L, 7L).toDF("v"), "v", 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(one === Seq((0L, 3L, 7L, 7L)))
    val empty = Profiling.histogram(
      Seq.empty[Option[Long]].toDF("v"), "v", 8)
    assert(empty.columns.toSeq === Seq("bin", "n", "lo", "hi"))
    assert(empty.count() === 0L)
  }

  test("histogram: non-integral column rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Profiling.histogram(Seq(1.5).toDF("v"), "v", 4)
    }
    assert(e.getMessage.contains("integral"))
  }
}
