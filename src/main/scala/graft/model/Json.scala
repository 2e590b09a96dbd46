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

  /** Keep or drop TOP-LEVEL fields of a JSON object document — the
    * fetch fields_filter contract (seq_proxy_api.proto FieldsFilter:
    * "works only with top-level fields, not with nested"). `allow` =
    * keep only `fields`; otherwise remove `fields`. Values are copied
    * verbatim (original formatting preserved); a document that is not
    * an object passes through unchanged. Tolerant of malformed JSON:
    * on any structural surprise the original string is returned —
    * fetch must degrade to the unfiltered doc, never to an error.
    */
  def filterTopLevel(json: String, fields: Set[String], allow: Boolean): String = {
    val s = json
    var i = 0
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    skipWs()
    if (i >= s.length || s.charAt(i) != '{') return json
    val open = i
    i += 1
    // scan one JSON string starting at s(i) == '"'; returns its body
    def scanString(): String = {
      val start = i + 1
      i += 1
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') i += 1
        i += 1
      }
      val body = s.substring(start, math.min(i, s.length))
      i += 1 // closing quote
      unescape(body)
    }
    // skip one value (any type), tracking nesting; strings skip escapes
    def skipValue(): Unit = {
      skipWs()
      if (i >= s.length) return
      s.charAt(i) match {
        case '"' => scanString(); ()
        case '{' | '[' =>
          var depth = 0
          while (i < s.length) {
            s.charAt(i) match {
              case '"' => scanString(); i -= 1 // scanString advanced past quote
              case '{' | '[' => depth += 1
              case '}' | ']' =>
                depth -= 1
                if (depth == 0) { i += 1; return }
              case _ => ()
            }
            i += 1
          }
        case _ =>
          while (i < s.length && !",}]".contains(s.charAt(i))) i += 1
      }
    }
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var ok = true
    skipWs()
    while (ok && i < s.length && s.charAt(i) != '}') {
      skipWs()
      if (i >= s.length || s.charAt(i) != '"') { ok = false }
      else {
        val pairStart = i
        val key = scanString()
        skipWs()
        if (i >= s.length || s.charAt(i) != ':') ok = false
        else {
          i += 1
          skipValue()
          val pairEnd = i
          val keep = if (allow) fields.contains(key) else !fields.contains(key)
          if (keep) kept += s.substring(pairStart, pairEnd).trim
          skipWs()
          if (i < s.length && s.charAt(i) == ',') { i += 1; skipWs() }
        }
      }
    }
    if (!ok || i >= s.length) json // structural surprise: pass through
    else s.substring(0, open) + "{" + kept.mkString(",") + "}" +
      s.substring(i + 1)
  }
}
