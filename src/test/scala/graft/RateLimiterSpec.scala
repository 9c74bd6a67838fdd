package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RateLimiter

/** Deterministic token-bucket behavior under an injected clock (the
  * Scheduler testing discipline) — the admission layer behind
  * EngineConfig.searchRate. */
class RateLimiterSpec extends AnyFunSuite {

  test("burst admits, exhaustion rejects, refill restores at the configured rate") {
    var now = 0L
    val rl = new RateLimiter(2.0, 2, () => now) // 2/sec, burst 2
    assert(rl.tryAcquire())
    assert(rl.tryAcquire())
    assert(!rl.tryAcquire(), "over-burst call must reject")
    now += 500_000_000L // +0.5 s at 2/sec = exactly 1 token back
    assert(rl.tryAcquire())
    assert(!rl.tryAcquire(), "the refilled token was spent")
    now += 100_000_000_000L // ages of idle
    assert(rl.tryAcquire())
    assert(rl.tryAcquire())
    assert(!rl.tryAcquire(), "tokens must cap at burst, not accumulate")
  }

  test("fractional rates refill sub-1/sec quotas correctly") {
    var now = 0L
    val rl = new RateLimiter(0.1, 1, () => now) // one call per 10 s
    assert(rl.tryAcquire())
    now += 9_000_000_000L
    assert(!rl.tryAcquire(), "9 s at 0.1/sec is 0.9 tokens — still rejected")
    now += 2_000_000_000L
    assert(rl.tryAcquire())
  }

  test("misconfiguration rejects loudly") {
    intercept[IllegalArgumentException](new RateLimiter(0.0, 1))
    intercept[IllegalArgumentException](new RateLimiter(1.0, 0))
  }
}
