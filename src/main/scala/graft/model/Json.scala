package graft.model

/** Minimal JSON string helpers shared by the HTTP facade, the mapping
  * endpoint and the verification dumper — one escaper, one unescaper,
  * no library dependency.
  */
object Json {

  def quote(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""

  /** Unescape the BODY of a JSON string literal (no surrounding
    * quotes). Tolerant: malformed escapes pass through verbatim. */
  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case '/'  => sb += '/'; i += 2
          case 'n'  => sb += '\n'; i += 2
          case 'r'  => sb += '\r'; i += 2
          case 't'  => sb += '\t'; i += 2
          case 'b'  => sb += '\b'; i += 2
          case 'f'  => sb += '\f'; i += 2
          case 'u' if i + 5 < s.length + 1 && i + 6 <= s.length =>
            try { sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6 }
            catch { case _: NumberFormatException => sb += c; i += 1 }
          case _ => sb += c; i += 1
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
