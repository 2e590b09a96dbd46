package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ingest-hot-path time extraction (SURVEY.md §3.2; reference
  * proxy/bulk/processor.go:72-126 probes `timestamp`/`time`/`ts` and
  * parses ES-style / RFC3339(Nano) formats, consts/consts.go:74-75).
  *
  * The declarative formulation (`from_json` over a 3-field schema +
  * `try_to_timestamp` chains) spends most of the write path's CPU in
  * Jackson and DateTimeFormatter. This kernel replaces it with one
  * scan of the raw document:
  *
  *  - a top-level JSON walk that collects the highest-priority time
  *    key (last occurrence wins on duplicates, like Jackson), skipping
  *    other values with a cheap depth walk;
  *  - a strict hand-rolled parser for the two published formats
  *    (`yyyy-MM-dd['T'| ]HH:mm:ss[.fff...][zone]`).
  *
  * Anything the fast parser rejects surfaces as the extracted string
  * (struct field `s`) so callers can chain Spark's own parser as the
  * catch-all: `coalesce($"t.ms", unix_millis(try_to_timestamp($"t.s", …)))`
  * — the slow path runs only for rows the fast path could not decide,
  * and the outcome (epoch millis or null → drift re-stamp) is identical
  * to the declarative chain.
  */
object TimeKernels {

  /** Days from civil date (Howard Hinnant's algorithm, public domain). */
  def epochDay(y: Int, m: Int, d: Int): Long = {
    val yy = if (m <= 2) y - 1 else y
    val era = (if (yy >= 0) yy else yy - 399) / 400
    val yoe = yy - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  private def daysInMonth(y: Int, m: Int): Int = m match {
    case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
    case 4 | 6 | 9 | 11              => 30
    case 2 =>
      if (y % 4 == 0 && (y % 100 != 0 || y % 400 == 0)) 29 else 28
    case _ => 0
  }

  /** Strict parse of `yyyy-MM-dd['T'| ]HH:mm:ss[.f{1,9}][Z|±HH[:]mm|±HH]`
    * to epoch millis. Returns null (boxed) when the input deviates —
    * including a missing zone offset when `noZoneIsUtc` is false — so
    * the caller can fall back to the general parser. Millis are the
    * fraction truncated to 3 digits, matching
    * `unix_millis(try_to_timestamp(...))` (micros floor-divided).
    */
  def parseMillis(s: UTF8String, noZoneIsUtc: Boolean): java.lang.Long = {
    if (s == null) return null
    val b = s.toString
    var i = 0
    var n = b.length
    while (i < n && b.charAt(i) == ' ') i += 1
    while (n > i && b.charAt(n - 1) == ' ') n -= 1
    if (n - i < 19) return null

    def dig(p: Int): Int = {
      if (p >= n) return -1
      val c = b.charAt(p)
      if (c < '0' || c > '9') -1 else c - '0'
    }
    def num2(p: Int): Int = {
      val a = dig(p); val c = dig(p + 1)
      if (a < 0 || c < 0) -1 else a * 10 + c
    }

    val y = {
      val a = dig(i); val b1 = dig(i + 1); val c = dig(i + 2); val d = dig(i + 3)
      if (a < 0 || b1 < 0 || c < 0 || d < 0) return null
      ((a * 10 + b1) * 10 + c) * 10 + d
    }
    if (b.charAt(i + 4) != '-') return null
    val mo = num2(i + 5); if (mo < 1 || mo > 12) return null
    if (b.charAt(i + 7) != '-') return null
    val dd = num2(i + 8); if (dd < 1 || dd > daysInMonth(y, mo)) return null
    // strict separators, matching the DateTimeFormatter patterns the
    // slow chain uses (lowercase 't'/'z' fall back to the general
    // parser rather than being decided here)
    val sep = b.charAt(i + 10)
    if (sep != 'T' && sep != ' ') return null
    val hh = num2(i + 11); if (hh < 0 || hh > 23) return null
    if (b.charAt(i + 13) != ':') return null
    val mi = num2(i + 14); if (mi < 0 || mi > 59) return null
    if (b.charAt(i + 16) != ':') return null
    val ss = num2(i + 17); if (ss < 0 || ss > 59) return null

    var p = i + 19
    var millis = 0L
    if (p < n && b.charAt(p) == '.') {
      p += 1
      val fStart = p
      var scale = 100L
      while (p < n && { val d0 = dig(p); d0 >= 0 }) {
        if (p - fStart < 3) { millis += dig(p) * scale; scale /= 10 }
        p += 1
      }
      val fLen = p - fStart
      if (fLen < 1 || fLen > 9) return null
    }

    var offSec = 0L
    if (p == n) {
      if (!noZoneIsUtc) return null
    } else {
      val c = b.charAt(p)
      if (c == 'Z') {
        p += 1
        if (p != n) return null
      } else if (c == '+' || c == '-') {
        val sign = if (c == '-') -1 else 1
        val oh = num2(p + 1); if (oh < 0) return null
        var om = 0
        p += 3
        if (p < n) {
          if (b.charAt(p) == ':') p += 1
          om = num2(p); if (om < 0 || om > 59) return null
          p += 2
        }
        if (p != n) return null
        if (oh > 18 || (oh == 18 && om != 0)) return null
        offSec = sign * (oh * 3600L + om * 60L)
      } else return null
    }

    val sec = epochDay(y, mo, dd) * 86400L + hh * 3600L + mi * 60L + ss - offSec
    java.lang.Long.valueOf(sec * 1000L + millis)
  }

  private def decodeEscapes(b: String, from: Int, to: Int): UTF8String = {
    val sb = new java.lang.StringBuilder(to - from)
    var i = from
    while (i < to) {
      val c = b.charAt(i)
      if (c == '\\' && i + 1 < to) {
        b.charAt(i + 1) match {
          case '"'  => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/'  => sb.append('/'); i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'u' if i + 6 <= to =>
            try {
              sb.append(Integer.parseInt(b.substring(i + 2, i + 6), 16).toChar)
              i += 6
            } catch { case _: NumberFormatException => sb.append(c); i += 1 }
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Top-level scan for the highest-priority key in `keys`. Returns the
    * raw value text (string contents escape-decoded; numbers/booleans
    * verbatim; objects/arrays as their raw span — they claim the
    * priority slot exactly like `from_json`'s to-string coercion, and
    * fail the timestamp parse the same way). Returns null when no key
    * matches, the matched value is JSON `null`, or the document is
    * malformed (mirroring PERMISSIVE `from_json`'s null row).
    */
  def extractField(raw: UTF8String, keys: Array[UTF8String]): UTF8String = {
    if (raw == null) return null
    val b = raw.toString
    val n = b.length
    var i = 0
    def skipWs(): Unit = {
      while (i < n && { val c = b.charAt(i); c == ' ' || c == '\t' || c == '\n' || c == '\r' }) i += 1
    }
    // returns end index of string starting at quote i (exclusive of
    // closing quote), or -1; advances nothing
    def stringEnd(start: Int): Int = {
      var j = start
      while (j < n) {
        val c = b.charAt(j)
        if (c == '\\') j += 2
        else if (c == '"') return j
        else j += 1
      }
      -1
    }
    def skipValue(): Boolean = {
      skipWs()
      if (i >= n) return false
      b.charAt(i) match {
        case '"' =>
          val e = stringEnd(i + 1); if (e < 0) return false
          i = e + 1; true
        case '{' | '[' =>
          var depth = 0
          while (i < n) {
            val c = b.charAt(i)
            if (c == '"') { val e = stringEnd(i + 1); if (e < 0) return false; i = e + 1 }
            else {
              if (c == '{' || c == '[') depth += 1
              else if (c == '}' || c == ']') { depth -= 1; if (depth == 0) { i += 1; return true } }
              i += 1
            }
          }
          false
        case _ =>
          val s0 = i
          while (i < n && { val c = b.charAt(i)
            c != ',' && c != '}' && c != ']' && c != ' ' && c != '\t' && c != '\n' && c != '\r' }) i += 1
          i > s0
      }
    }

    var best = -1
    var bestVal: UTF8String = null
    var bestIsNull = false

    skipWs()
    if (i >= n || b.charAt(i) != '{') return null
    i += 1
    skipWs()
    if (i < n && b.charAt(i) == '}') return null
    var ok = true
    var done = false
    while (ok && !done) {
      skipWs()
      if (i >= n || b.charAt(i) != '"') { ok = false }
      else {
        val kStart = i + 1
        val kEnd = stringEnd(kStart)
        if (kEnd < 0) ok = false
        else {
          i = kEnd + 1
          // match key against probe list (keys are plain ASCII — a doc
          // key containing escapes never matches byte-wise, correctly)
          var prio = -1
          var k = 0
          while (k < keys.length && prio < 0) {
            val key = keys(k)
            if (key.numChars() == kEnd - kStart && b.regionMatches(false, kStart, key.toString, 0, kEnd - kStart))
              prio = k
            k += 1
          }
          skipWs()
          if (i >= n || b.charAt(i) != ':') ok = false
          else {
            i += 1
            skipWs()
            // prio <= best: a repeated key overrides its earlier
            // occurrence (Jackson/from_json last-wins semantics) —
            // which also rules out stopping the scan early at the
            // first `timestamp`
            if (prio >= 0 && (best < 0 || prio <= best)) {
              // capture this value
              if (i < n && b.charAt(i) == '"') {
                val vStart = i + 1
                val vEnd = stringEnd(vStart)
                if (vEnd < 0) ok = false
                else {
                  val hasEsc = b.indexOf('\\', vStart) match {
                    case e if e >= 0 && e < vEnd => true
                    case _                       => false
                  }
                  best = prio
                  bestIsNull = false
                  bestVal = if (hasEsc) decodeEscapes(b, vStart, vEnd)
                            else UTF8String.fromString(b.substring(vStart, vEnd))
                  i = vEnd + 1
                }
              } else {
                val vStart = i
                if (!skipValue()) ok = false
                else {
                  val txt = b.substring(vStart, i).trim
                  best = prio
                  if (txt == "null") { bestIsNull = true; bestVal = null }
                  else { bestIsNull = false; bestVal = UTF8String.fromString(txt) }
                }
              }
            } else {
              if (!skipValue()) ok = false
            }
            if (ok && !done) {
              skipWs()
              if (i < n && b.charAt(i) == ',') i += 1
              else if (i < n && b.charAt(i) == '}') done = true
              else ok = false
            }
          }
        }
      }
    }
    if (!ok) return null // malformed → from_json yields a null row
    if (best < 0 || bestIsNull) null else bestVal
  }
}

/** `struct(ms: Long, s: String)` — fused time-field extraction + fast
  * parse over the raw JSON doc (see [[TimeKernels]]). `ms` set when the
  * fast parser decided; `s` set when a time field was found but needs
  * the general parser; both null when no time field exists.
  */
case class DocTimeExpr(child: Expression, keys: Seq[String], noZoneIsUtc: Boolean)
    extends UnaryExpression {

  private val keyArr: Array[UTF8String] = keys.map(UTF8String.fromString).toArray

  override def dataType: DataType = StructType(Seq(
    StructField("ms", LongType, nullable = true),
    StructField("s", StringType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"doc_time expects string, got $other")
  }

  def compute(raw: UTF8String): InternalRow = {
    val v = TimeKernels.extractField(raw, keyArr)
    if (v == null) InternalRow(null, null)
    else {
      val ms = TimeKernels.parseMillis(v, noZoneIsUtc)
      if (ms != null) InternalRow(ms.longValue(), null) else InternalRow(null, v)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("docTimeExpr", this, classOf[DocTimeExpr].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TimeExpressions {
  /** See [[DocTimeExpr]]. `noZoneIsUtc` should be true only when the
    * session timezone is UTC (zone-less strings then parse on the fast
    * path; otherwise they fall back to the session-zone-aware parser).
    */
  def docTime(raw: Column, keys: Seq[String], noZoneIsUtc: Boolean): Column =
    ColumnBridge.column(DocTimeExpr(ColumnBridge.expression(raw), keys, noZoneIsUtc))
}
