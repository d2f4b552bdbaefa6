package graft

/** Shared JSON string escaping for the contract mains (Bench, Verify) —
  * one escaper, not two drifting private copies. Escapes backslash,
  * quote, and ALL control chars (<0x20): a tab or CR in builder-authored
  * SQL or an exception message would otherwise break the driver's
  * line-oriented `json.load`. */
private[graft] object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
