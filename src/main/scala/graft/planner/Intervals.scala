package graft.planner

import java.time.LocalDate

/** P3 interval enumeration + P6 half-open compensation
  * (SURVEY.md §2.5) — pure driver-side planning.
  */
object Intervals {

  /** An inclusive `[start, end]` chunk as the reference plans it
    * (`shared_etls/etls/utils.py:290-330`). */
  final case class Interval[T](start: T, end: T)

  /** Date chunks: `(cur, min(cur + days - 1, end))`, next = end + 1 day
    * (reference `utils.py:308-319`). Chunks tile `[start, end]` with
    * no gaps or overlaps.
    */
  def dates(start: LocalDate, end: LocalDate, days: Int): List[Interval[LocalDate]] = {
    require(days > 0, s"chunk width must be positive, got $days")
    val buf = List.newBuilder[Interval[LocalDate]]
    var cur = start
    while (!cur.isAfter(end)) {
      val chunkEnd = {
        val e = cur.plusDays(days.toLong - 1)
        if (e.isAfter(end)) end else e
      }
      buf += Interval(cur, chunkEnd)
      cur = chunkEnd.plusDays(1)
    }
    buf.result()
  }

  /** Integer chunks: `(cur, min(cur + step - 1, end))`, next = end + 1
    * (reference `utils.py:321-330`). */
  def ints(start: Long, end: Long, step: Long): List[Interval[Long]] = {
    require(step > 0, s"chunk width must be positive, got $step")
    val buf = List.newBuilder[Interval[Long]]
    var cur = start
    while (cur <= end) {
      val chunkEnd = math.min(cur + step - 1, end)
      buf += Interval(cur, chunkEnd)
      cur = chunkEnd + 1
    }
    buf.result()
  }

  /** P6 — the reference extends each inclusive interval end by one
    * unit before building the (half-open, `pc >= start AND pc < end`)
    * extraction query: date `interval[1] + 1 day`
    * (`resync_date/etls/carga_date.py:159`), int `interval[1] + 1`
    * (`resync_int/etls/carga_int.py:149`). Folding the compensation
    * into the planner emits half-open `[start, endExclusive)` pairs
    * directly; consecutive chunks then tile the range exactly.
    */
  def halfOpenDates(iv: Interval[LocalDate]): (LocalDate, LocalDate) =
    (iv.start, iv.end.plusDays(1))

  def halfOpenInts(iv: Interval[Long]): (Long, Long) =
    (iv.start, iv.end + 1)
}
