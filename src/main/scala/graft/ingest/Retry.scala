package graft.ingest

/** Retry with exponential backoff — S2 parity with the reference
  * extractor's fetch loop (scripts/extract_forex.py:70-109): max_retries=5
  * retries after the initial call, i.e. up to 6 attempts total, 10 s
  * initial delay, doubling after each failure.
  *
  * Driver-side utility (wraps the network/IO edge of an ingest job, not a
  * distributed operator). `sleep` is injectable so tests run instantly, and
  * `isRetryable` lets callers pass through fatal errors (auth failures,
  * malformed requests) immediately.
  */
object Retry {

  final case class ExhaustedException(attempts: Int, last: Throwable)
    extends RuntimeException(
      s"operation failed after $attempts attempts: ${last.getMessage}", last)

  def withBackoff[T](
      maxAttempts: Int = 6,
      initialDelayMs: Long = 10000L,
      backoffFactor: Double = 2.0,
      sleep: Long => Unit = Thread.sleep,
      isRetryable: Throwable => Boolean = _ => true)(op: Int => T): T = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var delayMs = initialDelayMs
    var attempt = 1
    while (attempt < maxAttempts) {
      try return op(attempt)
      catch {
        case e: Throwable if isRetryable(e) =>
          sleep(delayMs)
          delayMs = math.max(1L, (delayMs * backoffFactor).toLong)
          attempt += 1
      }
    }
    // final attempt: a RETRYABLE failure means the budget is exhausted —
    // wrap it with the attempt count; a non-retryable failure propagates
    // raw here exactly as it does on every earlier attempt, so callers
    // catching the fatal type see one behavior regardless of which attempt
    // it lands on
    try op(attempt)
    catch {
      case e: Throwable if isRetryable(e) => throw ExhaustedException(attempt, e)
    }
  }
}
