package graft

import graft.planner._
import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

class PlannerSpec extends AnyFunSuite {

  // P1 thresholds (utils.py:204-216) with a wide span (no override)
  test("P1 date width thresholds") {
    assert(ChunkWidth.dateChunkDays(99999, 100) == 15)
    assert(ChunkWidth.dateChunkDays(100000, 100) == 10)
    assert(ChunkWidth.dateChunkDays(499999, 100) == 10)
    assert(ChunkWidth.dateChunkDays(500000, 100) == 5)
    assert(ChunkWidth.dateChunkDays(999999, 100) == 5)
    assert(ChunkWidth.dateChunkDays(1000000, 100) == 3)
    assert(ChunkWidth.dateChunkDays(9999999, 100) == 3)
    assert(ChunkWidth.dateChunkDays(10000000, 100) == 2)
  }

  // P1 overrides (utils.py:218-222): span<15 override runs after and
  // therefore beats the span==1 override — a 1-day span yields 2.
  test("P1 span overrides are bug-compatible") {
    assert(ChunkWidth.dateChunkDays(50, 1) == 2)
    assert(ChunkWidth.dateChunkDays(50, 14) == 2)
    assert(ChunkWidth.dateChunkDays(50, 15) == 15)
    assert(ChunkWidth.dateChunkDays(20000000, 5) == 2)
  }

  // P2 (utils.py:239-248): dead-branch cascade — effective behavior is
  // exactly q<5000 → 1000, q>=5000 → 100000.
  test("P2 int width cascade is bug-compatible") {
    assert(ChunkWidth.intChunkWidth(0) == 1000)
    assert(ChunkWidth.intChunkWidth(4999) == 1000)
    assert(ChunkWidth.intChunkWidth(5000) == 100000)
    assert(ChunkWidth.intChunkWidth(24999) == 100000)
    assert(ChunkWidth.intChunkWidth(49999) == 100000)
    assert(ChunkWidth.intChunkWidth(99999) == 100000)
    assert(ChunkWidth.intChunkWidth(10000000) == 100000)
  }

  // P3 property: int chunks tile [start, end] exactly — no gaps, no
  // overlaps, full coverage.
  test("P3 int chunks tile the range") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val start = rnd.between(-1000L, 1000L)
      val len = rnd.between(0L, 5000L)
      val step = rnd.between(1L, 700L)
      val end = start + len
      val ivs = Intervals.ints(start, end, step)
      assert(ivs.head.start == start)
      assert(ivs.last.end == end)
      ivs.sliding(2).foreach {
        case List(a, b) => assert(b.start == a.end + 1)
        case _ =>
      }
      ivs.foreach(iv => assert(iv.start <= iv.end))
      assert(ivs.map(iv => iv.end - iv.start + 1).sum == len + 1)
    }
  }

  test("P3 date chunks tile the range") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val len = rnd.between(0L, 2000L)
      val step = rnd.between(1, 40)
      val start = LocalDate.of(1995, 1, 1)
      val end = start.plusDays(len)
      val ivs = Intervals.dates(start, end, step)
      assert(ivs.head.start == start)
      assert(ivs.last.end == end)
      ivs.sliding(2).foreach {
        case List(a, b) => assert(b.start == a.end.plusDays(1))
        case _ =>
      }
    }
  }

  // P6: half-open compensation (carga_date.py:159, carga_int.py:149)
  test("P6 half-open ends") {
    assert(Intervals.halfOpenInts(Intervals.Interval(5L, 9L)) == ((5L, 10L)))
    val (s, e) = Intervals.halfOpenDates(
      Intervals.Interval(LocalDate.of(2020, 1, 1), LocalDate.of(2020, 1, 15)))
    assert(s == LocalDate.of(2020, 1, 1) && e == LocalDate.of(2020, 1, 16))
  }

  // P4 (utils.py:484-626): CLI args win; else min / today / max+margin
  test("P4 boundary resolution") {
    val r1 = Boundaries.resolveInts(None, None, 10L, 500L)
    assert(r1 == Boundaries.Range(10L, 500L + 300000L))
    val r2 = Boundaries.resolveInts(Some(3L), Some(7L), sys.error("no"), sys.error("no"))
    assert(r2 == Boundaries.Range(3L, 7L))
    val today = LocalDate.of(2026, 8, 12)
    val r3 = Boundaries.resolveDates(None, None, LocalDate.of(2020, 1, 1), today)
    assert(r3 == Boundaries.Range(LocalDate.of(2020, 1, 1), today))
  }

  // P7 (utils.py:253-267, 629-656, 30-47)
  test("P7 connection-string surgery") {
    assert(ConnStrings.driverName("jdbc:mysql://h:3306/db") == "mysql")
    assert(ConnStrings.driverName("jdbc:postgresql://h/db") == "postgresql")
    assert(ConnStrings.driverName("mongodb://h/db") == "mongodb")
    assert(ConnStrings.withSslDisabled("jdbc:mysql://h/db") == "jdbc:mysql://h/db?useSSL=false")
    assert(ConnStrings.withSslDisabled("jdbc:mysql://h/db?x=1") == "jdbc:mysql://h/db?x=1&useSSL=false")
    assert(ConnStrings.withSslDisabled("jdbc:mysql://h/db?useSSL=false") == "jdbc:mysql://h/db?useSSL=false")
    assert(ConnStrings.withSslDisabled("jdbc:postgresql://h/db") == "jdbc:postgresql://h/db")
    assert(ConnStrings.mongoDatabaseName("mongodb://h/?database=foo_bar", "ns") == "foo_bar")
    assert(ConnStrings.mongoDatabaseName("mongodb://h/", "ns") == "ns")
  }

  test("P7 driver name routes to a JDBC driver class (CLI wiring)") {
    assert(ConnStrings.jdbcDriverClass("jdbc:mysql://h:3306/db")
      .contains("com.mysql.cj.jdbc.Driver"))
    assert(ConnStrings.jdbcDriverClass("jdbc:postgresql://h/db")
      .contains("org.postgresql.Driver"))
    assert(ConnStrings.jdbcDriverClass("jdbc:derby:memory:db")
      .contains("org.apache.derby.jdbc.EmbeddedDriver"))
    // unknown scheme → None → DriverManager auto-resolution
    assert(ConnStrings.jdbcDriverClass("jdbc:exotic://h/db").isEmpty)
  }
}
