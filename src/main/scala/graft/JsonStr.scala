package graft

/** Minimal JSON string encoder shared by the two machine-parsed
  * artifacts — Verify's oracle_sql.json and Bench's metric/summary
  * lines. ONE implementation on purpose: a future escaping fix (a new
  * driver parser quirk) lands in both encodings or neither, never
  * splits them. Escapes backslash, quote, and ALL control chars
  * (< 0x20), so builder-authored SQL with tabs/newlines and paths or
  * exception-derived names with quotes stay parseable.
  */
private[graft] object JsonStr {
  def apply(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
