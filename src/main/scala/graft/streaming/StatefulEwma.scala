package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming recurrence: per-key EWMA via
  * `flatMapGroupsWithState` — the stateful-operator shape for maintaining a
  * RECURSIVE indicator over an unbounded stream, where windowed aggregation
  * cannot help (the update depends on the previous OUTPUT, not on a frame
  * of inputs). State per symbol is (last candle micros, current ewma,
  * count): O(1) per key regardless of stream length — the same bounded-
  * state argument as the HLL registers and CMS counters, here for a
  * sequential fold.
  *
  * Within a batch the group's rows are sorted by event time and folded in
  * order (`ewma' = α·x + β·ewma`, α and β passed explicitly so the
  * constants are the exact doubles the batch fold and the DuckDB oracle
  * use); across batches the fold resumes from state, so a bounded
  * AvailableNow run emits exactly the batch per-row prefix fold
  * (`ewma_multisym`), which is why the two queries share an oracle.
  * Out-of-order arrival ACROSS batches is surfaced, not absorbed: a row
  * older than the state's last timestamp folds at arrival position (the
  * streaming-vs-batch difference watermarked ingestion is there to bound).
  */
object StatefulEwma extends Serializable {

  final case class Candle(symbol: String, candle_start: Timestamp, close_price: Double)
  final case class EwmaState(lastUs: Long, ewma: Double, n: Long)
  final case class EwmaRow(
      symbol: String, candle_start: Timestamp, close_price: Double, ewma: Double)

  /** Full-precision epoch micros (Timestamp.getTime is millis-truncated). */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  def ewma(candles: Dataset[Candle], alpha: Double, beta: Double): Dataset[EwmaRow] = {
    implicit val rowEnc = Encoders.product[EwmaRow]
    implicit val stateEnc = Encoders.product[EwmaState]
    candles
      .groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sym: String, it: Iterator[Candle], state: GroupState[EwmaState]) =>
          // one candle per (symbol, start) by construction; sort by time
          val sorted = it.toSeq.sortBy(c => micros(c.candle_start))
          val out = Seq.newBuilder[EwmaRow]
          var st = state.getOption
          sorted.foreach { c =>
            val e = st match {
              case None    => c.close_price
              case Some(s) => alpha * c.close_price + beta * s.ewma
            }
            st = Some(EwmaState(micros(c.candle_start), e, st.map(_.n + 1).getOrElse(1L)))
            out += EwmaRow(sym, c.candle_start, c.close_price, e)
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
