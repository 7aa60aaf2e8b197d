package graft.functions

/** Minimal JSON string escaping shared by the oracle dump (Verify) and the
  * NLP request builder — one implementation so escaping fixes can't drift.
  */
object JsonUtil {
  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
