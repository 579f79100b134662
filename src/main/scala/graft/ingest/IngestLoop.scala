package graft.ingest

import graft.planner.Intervals.Interval
import scala.annotation.tailrec

/** Status callback surface (reference `shared_etls/etls/utils.py:14-27`:
  * HTTP POST `{id_request, process, value}`). Default no-op; an HTTP
  * implementation is deployment wiring, not engine semantics.
  */
trait StatusReporter {
  def report(idRequest: String, process: String, value: String): Unit
}
object StatusReporter {
  object Noop extends StatusReporter {
    def report(idRequest: String, process: String, value: String): Unit = ()
  }
}

/** P5 — per-interval retry + checkpoint recovery (reference
  * `resync_date/etls/carga_date.py:151-228`,
  * `resync_int/etls/carga_int.py:140-215`).
  *
  * Per interval: up to `maxAttempts` tries. On failure after at least
  * one successful write, probe the WORK zone for `max(pc)` and restart
  * planning from that checkpoint (re-chunks the remaining range and
  * resets the attempt counter); before any successful write, sleep and
  * retry the same interval. Final failure → report "failed" and throw.
  *
  * The recovery probe can re-extract the checkpoint unit → duplicate
  * rows in WORK are EXPECTED and healed by T4 dedup + K2 merge at
  * promote time (reference behavior, SURVEY.md §2.5 P5).
  *
  * The Mongo entry points retry but have NO checkpoint recovery
  * (`mongodb_carga_date.py:160-200`) — model that with
  * `recover = None`.
  *
  * Pluggable effects keep this pure-testable: `extract` runs one
  * chunk, `recover` probes the checkpoint, `replan` re-chunks from a
  * checkpoint, `sleep` is injectable (tests pass a no-op).
  */
final class IngestLoop[T](
    maxAttempts: Int = 4,
    sleepMillis: Long = 60000L,
    sleep: Long => Unit = Thread.sleep,
    reporter: StatusReporter = StatusReporter.Noop) {

  def run(
      idRequest: String,
      plan: List[Interval[T]],
      extract: Interval[T] => Unit,
      recover: Option[() => Option[T]] = None,
      replan: T => List[Interval[T]] = (_: T) => Nil): Unit = {

    @tailrec
    def loop(remaining: List[Interval[T]], attempt: Int, wroteAny: Boolean): Unit =
      remaining match {
        case Nil =>
          reporter.report(idRequest, "resync", "success")
        case iv :: rest =>
          val ok =
            try { extract(iv); true }
            catch { case scala.util.control.NonFatal(_) if attempt < maxAttempts => false }
          if (ok) loop(rest, 1, wroteAny = true)
          else {
            // Reference recovery (carga_date.py:188-216): only after a
            // successful write does the WORK max(pc) probe exist to
            // restart from; otherwise back off and retry in place.
            val checkpoint = if (wroteAny) recover.flatMap(_.apply()) else None
            checkpoint match {
              case Some(cp) =>
                // Back off, and reset wroteAny: if the replanned first
                // interval also fails, the NEXT failures take the
                // bounded sleep-retry path instead of replanning
                // forever (the reference resets its write counter
                // after a replan for the same reason —
                // carga_date.py:209-211). A later successful write
                // re-arms recovery.
                sleep(sleepMillis)
                loop(replan(cp), 1, wroteAny = false)
              case None =>
                sleep(sleepMillis)
                loop(remaining, attempt + 1, wroteAny)
            }
          }
      }

    try loop(plan, 1, wroteAny = false)
    catch {
      case e: Throwable =>
        reporter.report(idRequest, "resync", "failed")
        throw e
    }
  }
}
