package graft.sink

/** Records/bytes-per-second throttling for external-service sinks —
  * ThrottleWriter (gobblin-core/.../writer/ThrottleWriter.java:44) and
  * RateBasedLimiter (gobblin-runtime/.../RateBasedLimiter.java:29).
  *
  * File sinks never need this (trigger-rate limits cover streaming);
  * it exists for foreachPartition clients with hard server-side rate
  * caps. Token bucket, monotonic clock, per-partition instance: the
  * cluster-wide rate is partitions x permitsPerSecond.
  */
final class Throttle(permitsPerSecond: Double, burst: Double) extends Serializable {
  require(permitsPerSecond > 0, "rate must be positive")

  private var tokens = burst
  private var lastNs = System.nanoTime()

  /** Blocks until `permits` tokens are available, then consumes them. */
  def acquire(permits: Double = 1.0): Unit = synchronized {
    refill()
    while (tokens < permits) {
      val deficit = permits - tokens
      val waitNs = (deficit / permitsPerSecond * 1e9).toLong
      val ms = waitNs / 1000000
      Thread.sleep(math.max(1, ms), (waitNs % 1000000).toInt)
      refill()
    }
    tokens -= permits
  }

  /** Non-blocking probe (for shedding instead of waiting). */
  def tryAcquire(permits: Double = 1.0): Boolean = synchronized {
    refill()
    if (tokens >= permits) { tokens -= permits; true } else false
  }

  private def refill(): Unit = {
    val now = System.nanoTime()
    tokens = math.min(burst, tokens + (now - lastNs) / 1e9 * permitsPerSecond)
    lastNs = now
  }
}

object Throttle {
  def perSecond(rate: Double, burst: Double = -1): Throttle =
    new Throttle(rate, if (burst <= 0) rate else burst)
}
