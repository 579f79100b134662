package graft

import graft.ingest.{IngestLoop, StatusReporter}
import graft.planner.Intervals.Interval
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

class IngestLoopSpec extends AnyFunSuite {

  private class Recorder extends StatusReporter {
    val statuses = mutable.Buffer[String]()
    def report(id: String, process: String, value: String): Unit =
      statuses += value
  }

  private def plan(n: Int): List[Interval[Long]] =
    (0 until n).map(i => Interval(i * 10L, i * 10L + 9)).toList

  test("happy path extracts every interval once, reports success") {
    val rec = new Recorder
    val seen = mutable.Buffer[Interval[Long]]()
    new IngestLoop[Long](reporter = rec, sleep = _ => ())
      .run("id", plan(3), iv => { seen += iv; () })
    assert(seen.toList == plan(3))
    assert(rec.statuses.toList == List("success"))
  }

  // P5 (carga_date.py:151-228): transient failure before any write →
  // sleep + retry same interval.
  test("transient failure retries the same interval") {
    val rec = new Recorder
    var fails = 2
    val seen = mutable.Buffer[Long]()
    new IngestLoop[Long](reporter = rec, sleep = _ => ())
      .run("id", plan(2), iv => {
        seen += iv.start
        if (iv.start == 0 && fails > 0) { fails -= 1; sys.error("boom") }
      })
    assert(seen.toList == List(0L, 0L, 0L, 10L))
    assert(rec.statuses.toList == List("success"))
  }

  test("exhausted retries report failed and rethrow") {
    val rec = new Recorder
    val ex = intercept[RuntimeException] {
      new IngestLoop[Long](maxAttempts = 3, reporter = rec, sleep = _ => ())
        .run("id", plan(1), _ => sys.error("always"))
    }
    assert(ex.getMessage == "always")
    assert(rec.statuses.toList == List("failed"))
  }

  // P5 checkpoint recovery (carga_date.py:188-216): failure after a
  // successful write replans from the WORK max(pc) probe.
  test("failure after a write triggers checkpoint replan") {
    val rec = new Recorder
    val seen = mutable.Buffer[Long]()
    var failedOnce = false
    val loop = new IngestLoop[Long](reporter = rec, sleep = _ => ())
    loop.run(
      "id",
      plan(3), // [0,9] [10,19] [20,29]
      iv => {
        seen += iv.start
        if (iv.start == 10 && !failedOnce) { failedOnce = true; sys.error("mid") }
      },
      recover = Some(() => Some(9L)), // WORK max(pc) after chunk 1
      replan = cp => List(Interval(cp, 19L), Interval(20L, 29L)))
    // chunk0 ok, chunk1 fails → replan from checkpoint 9 (overlap is
    // expected, healed by T4 downstream), then completes.
    assert(seen.toList == List(0L, 10L, 9L, 20L))
    assert(rec.statuses.toList == List("success"))
  }

  // Mongo variants (mongodb_carga_date.py:160-200): no recovery —
  // retry in place even after successful writes.
  test("without recovery, retries in place after a write") {
    val rec = new Recorder
    val seen = mutable.Buffer[Long]()
    var failed = false
    new IngestLoop[Long](reporter = rec, sleep = _ => ())
      .run("id", plan(2), iv => {
        seen += iv.start
        if (iv.start == 10 && !failed) { failed = true; sys.error("x") }
      })
    assert(seen.toList == List(0L, 10L, 10L))
  }
}
