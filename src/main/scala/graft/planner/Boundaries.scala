package graft.planner

import java.time.LocalDate

/** P4 boundary resolution (SURVEY.md §2.5): start = CLI arg if given
  * else source `min(pc)`; end = CLI arg if given else (date → today,
  * int → source `max(pc) + 300000`).
  *
  * The reference spells this as four near-identical functions
  * (`shared_etls/etls/utils.py:333-626` — JDBC/Mongo × date/int);
  * here one generic resolver per partition-column kind. The scalar
  * min/max probes are passed as thunks so the same resolver serves
  * JDBC pushdown aggregates, Mongo aggregates, and parquet scans
  * (S2/S3/S5/S6).
  */
object Boundaries {

  /** Int end-boundary safety margin — `add_security_value = 300000`
    * (reference `shared_etls/etls/load_utils.py:407, 490`). Kept
    * verbatim: it over-extends the last chunk so late-arriving ids
    * between planning and extraction are still covered. */
  val SecurityMargin: Long = 300000L

  final case class Range[T](start: T, end: T)

  def resolveDates(
      cliStart: Option[LocalDate],
      cliEnd: Option[LocalDate],
      sourceMin: => LocalDate,
      today: => LocalDate): Range[LocalDate] =
    Range(cliStart.getOrElse(sourceMin), cliEnd.getOrElse(today))

  /** The reference coerces a string max to int when the DB returns it
    * as text (`load_utils.py:509-515`); callers here pass an already
    * typed value, the coercion lives in the JDBC source. */
  def resolveInts(
      cliStart: Option[Long],
      cliEnd: Option[Long],
      sourceMin: => Long,
      sourceMax: => Long): Range[Long] =
    Range(cliStart.getOrElse(sourceMin), cliEnd.getOrElse(sourceMax + SecurityMargin))
}
