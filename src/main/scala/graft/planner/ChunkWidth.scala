package graft.planner

/** Adaptive chunk-width planners P1/P2 (SURVEY.md §2.5) — pure
  * functions, ported bug-compatibly from the reference.
  */
object ChunkWidth {

  /** P1 — date-chunk width in days from an estimated row count
    * (reference `shared_etls/etls/utils.py:186-224`).
    *
    * Thresholds (`utils.py:204-216`): <100k→15, <500k→10, <1M→5,
    * <10M→3, else→2. Overrides (`utils.py:218-222`), checked in
    * source order so the `span < 15` branch runs AFTER (and therefore
    * wins over) the `span == 1` branch — bug-compatible: a 1-day span
    * yields 2, not 1.
    */
  def dateChunkDays(estimatedRows: Long, spanDays: Long): Int = {
    var days =
      if (estimatedRows < 100000L) 15
      else if (estimatedRows < 500000L) 10
      else if (estimatedRows < 1000000L) 5
      else if (estimatedRows < 10000000L) 3
      else 2
    // Reference override order (utils.py:218-222): `if diff == 1: 1`
    // then `if diff < 15: 2` — the second unconditionally overwrites
    // the first for any span < 15 (including exactly 1).
    if (spanDays == 1L) days = 1
    if (spanDays < 15L) days = 2
    days
  }

  /** P2 — integer-chunk width from an estimated row count (reference
    * `shared_etls/etls/utils.py:227-250`).
    *
    * The reference is a cascade of sequential non-exclusive `if`s with
    * the trailing `else` bound only to the LAST `if` (`utils.py:239-248`):
    *
    * {{{
    * if q < 100000: v = 50000
    * if q <  50000: v = 25000
    * if q <  25000: v =  5000
    * if q <   5000: v =  1000
    * else:          v = 100000
    * }}}
    *
    * Net effect: q < 5000 → 1000, q >= 5000 → 100000; the first three
    * branches are dead (always overwritten). Ported verbatim —
    * bug-compatible: this cascade IS the reference's actual behavior.
    */
  def intChunkWidth(estimatedRows: Long): Long = {
    var v = 0L
    if (estimatedRows < 100000L) v = 50000L // dead: overwritten below
    if (estimatedRows < 50000L) v = 25000L // dead
    if (estimatedRows < 25000L) v = 5000L // dead
    if (estimatedRows < 5000L) v = 1000L
    else v = 100000L
    v
  }
}
