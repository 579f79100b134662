package graft.core

/** Minimal JSON string escaping shared by every hand-rolled JSON
  * emitter in the engine (Verify's oracle dump, the HTTP status
  * callback, Bench's metric line) — one definition, not N drifting
  * copies. Escapes backslash, quote, and ALL control chars. */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
