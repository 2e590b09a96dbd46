package graft.server

/** Hystrix-style circuit breaker, mirroring the reference's ingest-path
  * breaker semantics (network/circuitbreaker/circuitbreaker.go wraps
  * cep21/circuit with hystrix closers; the reference arms one per store
  * shard around bulk sends, proxy/bulk/seqdb_client.go:133,165):
  *
  *  - CLOSED: requests execute; outcomes land in a rolling window of
  *    `numBuckets` × `bucketWidthMs`. Once the window holds at least
  *    `requestVolumeThreshold` requests AND failures reach
  *    `errorThresholdPercentage`, the circuit OPENS.
  *  - OPEN: requests fail fast with [[CircuitOpenException]] for
  *    `sleepWindowMs` — a failing sink is not hammered.
  *  - HALF-OPEN: after the sleep window one probe request executes
  *    (the reference's defaultHalfOpenAttempts = 1); success closes
  *    the circuit and resets the window, failure re-opens it.
  *
  * The clock is injectable for deterministic tests.
  */
final class CircuitBreaker(
    requestVolumeThreshold: Int = 20,
    errorThresholdPercentage: Int = 50,
    numBuckets: Int = 10,
    bucketWidthMs: Long = 1000L,
    sleepWindowMs: Long = 5000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  final class CircuitOpenException
      extends RuntimeException("circuit breaker is open")

  private final case class Bucket(var stamp: Long, var ok: Long, var fail: Long)
  private val buckets = Array.tabulate(numBuckets)(_ => Bucket(Long.MinValue, 0, 0))

  private var openSinceMs: Long = -1L // -1 = closed
  private var probing = false         // a half-open attempt is in flight

  private def bucket(now: Long): Bucket = {
    val slot = ((now / bucketWidthMs) % numBuckets).toInt
    val b = buckets(slot)
    val stamp = now / bucketWidthMs
    if (b.stamp != stamp) { b.stamp = stamp; b.ok = 0; b.fail = 0 }
    b
  }

  private def windowCounts(now: Long): (Long, Long) = {
    val minStamp = now / bucketWidthMs - numBuckets + 1
    var ok = 0L; var fail = 0L
    buckets.foreach { b =>
      if (b.stamp >= minStamp) { ok += b.ok; fail += b.fail }
    }
    (ok, fail)
  }

  private def reset(): Unit =
    buckets.foreach { b => b.stamp = Long.MinValue; b.ok = 0; b.fail = 0 }

  /** Execute `f` under the breaker. Throws [[CircuitOpenException]]
    * without running `f` while the circuit is open (and for all but
    * one probe during half-open). `f`'s own exception propagates and
    * counts as the failure. */
  def run[A](f: => A): A = {
    val now = clock()
    val isProbe = synchronized {
      if (openSinceMs >= 0) {
        if (now - openSinceMs < sleepWindowMs || probing)
          throw new CircuitOpenException
        probing = true
        true
      } else false
    }
    val result =
      try f
      catch {
        case e: Throwable =>
          // outcome bookkeeping uses the CURRENT clock, not the entry
          // time: the motivating failures are slow (multi-second sink
          // writes), and stamping them at entry would backdate
          // openSinceMs past the sleep window (no fail-fast) and land
          // counts in rolling-window buckets that have already aged out
          // (threshold never reached)
          val end = clock()
          synchronized {
            if (isProbe) { probing = false; openSinceMs = end } // re-open
            else {
              val b = bucket(end)
              b.fail += 1
              val (ok, fail) = windowCounts(end)
              val total = ok + fail
              if (total >= requestVolumeThreshold &&
                fail * 100 >= errorThresholdPercentage.toLong * total)
                openSinceMs = end
            }
          }
          throw e
      }
    synchronized {
      if (isProbe) { probing = false; openSinceMs = -1L; reset() }
      else bucket(clock()).ok += 1
    }
    result
  }

  def isOpen: Boolean = synchronized(openSinceMs >= 0)
}
