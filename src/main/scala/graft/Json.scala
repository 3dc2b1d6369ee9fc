package graft

/** Shared JSON string escaping for the two harness mains — one
  * implementation so Bench's bench line and Verify's oracle_sql.json
  * cannot drift (they previously carried two hand-rolled escapers).
  * Escapes quote, backslash, and ALL control chars; a raw tab/CR in
  * builder-authored SQL or a quote in a path would otherwise make the
  * driver's json.load fail and zero the round's results.
  */
private[graft] object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
