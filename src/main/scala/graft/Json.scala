package graft

/** JSON string escaping shared by the Verify and Bench metric emitters:
  * backslash, quote, and ALL control chars (< 0x20) — an unescaped tab or
  * form-feed in builder-authored SQL or an exception message would make
  * the driver's json.load fail and silently zero a round's results. */
object Json {
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
