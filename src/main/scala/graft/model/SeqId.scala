package graft.model

/** Document id = (MID, RID): MID is the event timestamp in Unix
  * milliseconds, RID a random tie-breaker (seq/seq.go:12-19,99-101).
  * Ordering is (MID, RID); the wire string form is
  * `hex(littleEndian(mid))-hex(littleEndian(rid))` (seq/seq.go:37-53).
  */
final case class SeqId(mid: Long, rid: Long) extends Ordered[SeqId] {
  override def compare(that: SeqId): Int = {
    val c = java.lang.Long.compare(mid, that.mid)
    if (c != 0) c else java.lang.Long.compare(rid, that.rid)
  }
  override def toString: String =
    SeqId.hexLE(mid) + "-" + SeqId.hexLE(rid)
}

object SeqId {
  private[model] def hexLE(v: Long): String = {
    val b = new StringBuilder(16)
    var x = v
    var i = 0
    while (i < 8) {
      val byte = (x & 0xFF).toInt
      b.append(f"$byte%02x")
      x >>>= 8
      i += 1
    }
    b.toString
  }

  def parse(s: String): SeqId = {
    val parts = s.split("-", 2)
    require(parts.length == 2 && parts(0).length == 16 && parts(1).length == 16,
      s"bad seq id: $s")
    def fromLE(h: String): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) {
        v = (v << 8) | java.lang.Long.parseLong(h.substring(i * 2, i * 2 + 2), 16)
        i -= 1
      }
      v
    }
    SeqId(fromLE(parts(0)), fromLE(parts(1)))
  }
}
