package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** S2 retry/backoff semantics (reference extract_forex.py:70-109:
  * max_retries=5 → 6 calls total, 10 s initial delay, doubling).
  */
class RetrySpec extends AnyFunSuite {

  test("succeeds first try: no sleeps") {
    var sleeps = List.empty[Long]
    val out = Retry.withBackoff[Int](sleep = d => sleeps ::= d)(_ => 7)
    assert(out === 7)
    assert(sleeps.isEmpty)
  }

  test("retries with doubling delays, then succeeds") {
    var sleeps = List.empty[Long]
    var calls = 0
    val out = Retry.withBackoff[String](
      initialDelayMs = 10000L, sleep = d => sleeps ::= d) { attempt =>
      calls += 1
      if (attempt < 3) sys.error(s"boom $attempt") else "ok"
    }
    assert(out === "ok")
    assert(calls === 3)
    assert(sleeps.reverse === List(10000L, 20000L))
  }

  test("exhausts after maxAttempts and wraps the last error") {
    var sleeps = 0
    val e = intercept[Retry.ExhaustedException] {
      Retry.withBackoff[Int](maxAttempts = 5, sleep = _ => sleeps += 1)(
        a => sys.error(s"fail $a"))
    }
    assert(e.attempts === 5)
    assert(sleeps === 4) // no sleep after the final failure
    assert(e.getCause.getMessage === "fail 5")
  }

  test("default attempt budget matches the reference: 6 calls total") {
    var calls = 0
    intercept[Retry.ExhaustedException] {
      Retry.withBackoff[Int](sleep = _ => ()) { _ => calls += 1; sys.error("x") }
    }
    assert(calls === 6)
  }

  test("non-retryable error on the FINAL attempt propagates raw (no wrap)") {
    // maxAttempts=1 makes the first attempt the final one — the fatal
    // error must arrive unwrapped just like on any earlier attempt
    val e = intercept[IllegalArgumentException] {
      Retry.withBackoff[Int](maxAttempts = 1, sleep = _ => (),
        isRetryable = !_.isInstanceOf[IllegalArgumentException]) { _ =>
        throw new IllegalArgumentException("fatal")
      }
    }
    assert(e.getMessage === "fatal")
  }

  test("non-retryable errors propagate immediately") {
    var calls = 0
    val e = intercept[IllegalArgumentException] {
      Retry.withBackoff[Int](
        sleep = _ => (), isRetryable = !_.isInstanceOf[IllegalArgumentException]) { _ =>
        calls += 1
        throw new IllegalArgumentException("bad request")
      }
    }
    assert(calls === 1)
    assert(e.getMessage === "bad request")
  }
}
