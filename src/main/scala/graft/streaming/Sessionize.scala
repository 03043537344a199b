package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operator: gap-based sessionization via
  * `flatMapGroupsWithState` (the KeyValueGroupedDataset custom-state path —
  * SURVEY §2.10 has no session windows in the reference, but a complete
  * streaming engine needs the stateful-operator machinery).
  *
  * State per user: (session start, last event ts, event count, value sum).
  * An event more than `gap` after the previous one closes the session and
  * emits it; event-time timeout flushes idle sessions once the watermark
  * passes last_ts + gap. Also runs on a batch Dataset (Spark executes
  * flatMapGroupsWithState in batch with NoTimeout), which is how the spec
  * asserts session shapes deterministically.
  *
  * MEMORY BOUND (the one non-streaming-shaped cost in this file): the
  * group iterator arrives in no guaranteed order, so [[sessionize]] buffers
  * and sorts ONE (user, trigger) group per task at a time — working memory
  * is O(max events of a single user within a single trigger) ≈ 56 bytes/
  * event (Event = 8B long + 24B Timestamp ref + 8B double + object
  * headers), NOT O(users) and NOT O(total events): kept state between
  * triggers is one fixed-size SessionState per live user. Under streaming
  * that per-trigger slice is capped by the source trigger size
  * (maxFilesPerTrigger / maxOffsetsPerTrigger), so a whale user costs at
  * most one trigger's worth of their events (~56 MB per million —
  * SessionizeSpec pins a 10⁶-event single-user batch end-to-end). In BATCH
  * execution there is no trigger cap and a whale user's entire history is
  * one group — for that path use [[sessionizeRelational]] or
  * [[sessionizeWindowed]], whose sorts run through Spark's spillable
  * external sorter (both share this operator's oracle).
  */
object Sessionize extends Serializable {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  // valueSum accumulates in BigDecimal so the session sum is exact and
  // order-independent — matching the DuckDB oracle's DECIMAL sum bitwise.
  final case class SessionState(
      start: Long, lastTs: Long, nEvents: Long, valueSum: BigDecimal)

  /** Exactly CAST(value AS DECIMAL(30,10)) on both Spark and DuckDB:
    * shortest decimal representation, HALF_UP at scale 10. The oracle (and
    * sessionizeRelational) quantize each value this way before summing, so
    * the stateful path must too — full-precision accumulation would diverge
    * on values with >10 fractional digits.
    */
  private def dec10(d: Double): BigDecimal =
    BigDecimal.decimal(d).setScale(10, scala.math.BigDecimal.RoundingMode.HALF_UP)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, value_sum: Double)

  /** Full-precision epoch micros (Timestamp.getTime is millis-truncated). */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  def sessionize(
      events: Dataset[Event], gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]

    def close(userId: Long, s: SessionState): Session =
      Session(userId, toTs(s.start), toTs(s.lastTs),
        s.nEvents, s.valueSum.toDouble)

    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.value))
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            val gapUs = gapMs * 1000L
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.lastTs <= gapUs =>
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, t),
                    nEvents = s.nEvents + 1,
                    valueSum = s.valueSum + dec10(e.value)))
                case Some(s) =>
                  closed += close(userId, s)
                  cur = Some(SessionState(t, t, 1L, dec10(e.value)))
                case None =>
                  cur = Some(SessionState(t, t, 1L, dec10(e.value)))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                if (timeout == GroupStateTimeout.EventTimeTimeout)
                  state.setTimeoutTimestamp(s.lastTs / 1000L + gapMs)
                else if (timeout == GroupStateTimeout.NoTimeout) {
                  // batch execution: no further input will arrive — flush
                  closed += close(userId, s)
                  state.remove()
                }
              case None => ()
            }
            closed.result().iterator
          }
      }
  }

  /** Batch convenience over a DataFrame with (user_id, ts, value). */
  def sessionizeBatch(df: DataFrame, gapMs: Long): DataFrame = {
    implicit val evEnc = Encoders.product[Event]
    sessionize(df.selectExpr("user_id", "ts", "value").as[Event], gapMs).toDF()
  }

  /** Whale-user-safe batch sessionization: the classic lag + cumulative-flag
    * rewrite as declarative window functions. Unlike the stateful operator
    * above (which buffers one user-batch in memory to sort it), window sort
    * runs through Spark's spillable external sorter, so a single user with
    * billions of events cannot OOM an executor — this is the 100 TB batch
    * path; `sessionize` remains the streaming path. One shuffle on user_id;
    * the session-level groupBy reuses that partitioning (user_id is a prefix
    * of the grouping key), so no second exchange.
    *
    * Semantics are identical by construction and proven by sharing the
    * stateful operator's DuckDB oracle. The exact-DECIMAL session sum keeps
    * `value_sum` association-independent (see Parity).
    */
  def sessionizeRelational(df: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("value"))
    val gapUs = gapMs * 1000L
    df.selectExpr("user_id", "ts", "value")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(30, 10))).cast("double").as("value_sum"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("value_sum"))
  }

  /** Gap-based sessionization via the BUILT-IN `session_window` grouping —
    * the engine-maintained form of the same operator: Spark's
    * MergingSessions aggregation maintains the merge state, the plan is a
    * plain groupBy (no user-code state), and under `readStream` the exact
    * same expression runs as a streaming session aggregation (watermark +
    * append/update mode, state evicted by the engine). Batch execution is
    * what makes a bounded run oracle-comparable: append mode necessarily
    * withholds each user's final still-open session past the watermark.
    *
    * Boundary semantics are identical to [[sessionize]]'s inclusive rule —
    * Spark merges two events iff their gap is <= the session gap (asserted
    * boundary-exact in SessionizeSpec) — and the output timestamps are
    * min/max(ts), not the padded window struct bounds, so all three
    * sessionization forms share one DuckDB oracle. Exact-DECIMAL value
    * sums as everywhere (order-free; see Parity).
    *
    * Scale shape: one shuffle on user_id; the engine's session merge sort
    * is the spillable external sorter, so a whale user cannot OOM a task
    * (same bound as [[sessionizeRelational]], without the two window
    * passes).
    */
  def sessionizeWindowed(df: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    df.selectExpr("user_id", "ts", "value")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMs milliseconds"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(30, 10))).cast("double").as("value_sum"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("value_sum"))
  }
}
