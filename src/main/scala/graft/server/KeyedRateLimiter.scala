package graft.server

/** Per-key request throttle (the reference's keyed RateLimiter,
  * network/ratelimiter/ratelimiter.go + docs/en/08-rate-limiting.md):
  * identical search queries — same query string, aggregations and
  * interval — share one budget, as does each fetched message ID, so a
  * buggy dashboard looping one pathological query (or a hot-doc fetch
  * hammer) exhausts only its own key while distinct requests pass.
  *
  * Lazy-refill token buckets instead of the reference's background
  * decrement goroutine: each key holds up to `burst` tokens refilled at
  * `ratePerSec`; the map self-bounds by dropping refillable-to-full
  * (i.e. idle) entries when it grows past `maxKeys`. ratePerSec <= 0
  * disables the limiter entirely.
  */
final class KeyedRateLimiter(ratePerSec: Double, burst: Int, maxKeys: Int = 4096) {

  private final class Bucket {
    var micros: Long = burst * 1000000L // tokens scaled 1e6, like the global bucket
    var lastNs: Long = System.nanoTime()
  }

  private val buckets =
    new java.util.concurrent.ConcurrentHashMap[String, Bucket]()

  /** Take one token from `key`'s bucket; false = throttled. */
  def tryAcquire(key: String): Boolean = {
    if (ratePerSec <= 0) return true
    if (buckets.size() > maxKeys) evictIdle()
    val b = buckets.computeIfAbsent(key, _ => new Bucket)
    b.synchronized {
      val now = System.nanoTime()
      val refill = ((now - b.lastNs) / 1e9 * ratePerSec * 1000000L).toLong
      if (refill > 0) {
        b.lastNs = now
        b.micros = math.min(burst * 1000000L, b.micros + refill)
      }
      if (b.micros >= 1000000L) { b.micros -= 1000000L; true }
      else false
    }
  }

  /** Drop entries whose bucket would refill to full — they carry no
    * throttle state a fresh bucket wouldn't. Mirrors the reference's
    * delete-on-decay map hygiene. */
  private def evictIdle(): Unit = {
    val it = buckets.entrySet().iterator()
    val now = System.nanoTime()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getValue
      val full = b.synchronized {
        b.micros + ((now - b.lastNs) / 1e9 * ratePerSec * 1000000L).toLong >=
          burst * 1000000L
      }
      if (full) it.remove()
    }
  }
}
