package graft

/** Minimal JSON string quoting for the few hand-built JSON artifacts
  * (oracle_sql.json, rejection manifests, bench output). Escapes backslash,
  * quote, and ALL control characters — an exception message or SQL text with
  * a newline must not break a consumer's parser.
  */
object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
