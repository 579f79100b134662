package graft.core

import java.time.{LocalDate, ZoneOffset}

/** Boundary-value coercions shared by the planner-driven flows: a
  * `Row.get` from a min/max probe can surface as any of the JDBC /
  * parquet temporal or numeric representations depending on source
  * and Spark's java8API settings.
  */
object Coerce {
  def toLocalDate(v: Any): LocalDate = v match {
    case d: LocalDate => d
    case d: java.sql.Date => d.toLocalDate
    case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
    case t: java.time.LocalDateTime => t.toLocalDate
    case t: java.time.Instant => t.atZone(ZoneOffset.UTC).toLocalDate
    case s: String => LocalDate.parse(s.take(10))
    case other => sys.error(s"cannot read a date boundary from $other")
  }

  /** Includes the reference's str→int coercion of a text-typed max
    * (`shared_etls/etls/load_utils.py:509-515`). */
  def toLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case s: String => s.trim.toLong
    case other => sys.error(s"cannot read an int boundary from $other")
  }
}
