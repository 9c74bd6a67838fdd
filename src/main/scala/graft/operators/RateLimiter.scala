package graft.operators

/**
 * Token-bucket admission control for the SERVING verbs — the read-side
 * sibling of `Ingest.fetchCatalog`'s write-side pacing, and the Spark
 * spelling of Milvus's quota/rate-limit layer (`quotaAndLimits.dql.*`:
 * per-collection and per-partition search/query rate caps): `rate`
 * requests per second sustained, bursts up to `burst` tokens.
 *
 * [[tryAcquire]] never blocks and never perturbs results — an over-quota
 * caller is REJECTED deterministically (Milvus returns a rate-limit
 * error; a client retries with backoff, the `fetchCatalog` discipline).
 * Thread-safe: one bucket serves every serving thread of a driver.
 * The clock is injectable (the `Scheduler` testing discipline), so specs
 * replay refill behavior deterministically.
 */
final class RateLimiter(rate: Double, burst: Int, clock: () => Long) {
  require(rate > 0, s"rate must be positive, got $rate")
  require(burst >= 1, s"burst must be >= 1, got $burst")

  def this(rate: Double, burst: Int) = this(rate, burst, () => System.nanoTime())

  private[this] var tokens: Double = burst.toDouble
  private[this] var last: Long = clock()

  /** Take one token if available: true = admitted. Refills continuously
    * at `rate` tokens/sec up to `burst`. */
  def tryAcquire(): Boolean = synchronized {
    val now = clock()
    tokens = math.min(burst.toDouble, tokens + (now - last) * 1e-9 * rate)
    last = now
    if (tokens >= 1.0) { tokens -= 1.0; true } else false
  }
}
