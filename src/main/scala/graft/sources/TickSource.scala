package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 stand-in for the reference's paginated REST tick feed
  * (scripts/extract_forex.py:34-199 pulls JSON pages from a quote API;
  * the driver-side loop there is the single-node bottleneck this source
  * removes): a custom `TableProvider` whose scan plans ONE
  * `InputPartition` PER PAGE, so a 1000-executor cluster fetches 1000
  * pages concurrently — ingest parallelism is the page count, not 1.
  *
  * The "API" is a deterministic pure-integer tick generator (no network
  * in the sandbox), which is exactly what makes it gate-checkable: the
  * DuckDB oracle reproduces every row from `range()` arithmetic. The
  * Spark-side machinery is the real thing:
  *
  *  - column pruning (`SupportsPushDownRequiredColumns`): the reader
  *    materializes ONLY requested columns — `ReadSchema` in the plan is
  *    the pruned struct, and a pruned `symbol` never allocates a string;
  *  - predicate pushdown (`SupportsPushDownFilters`) on `tick_id` range
  *    bounds: pushed comparisons NARROW the generated id range per page
  *    (the REST analog: fewer pages requested), rows outside are never
  *    produced; non-range filters stay residual for Spark to evaluate.
  *
  * Usage: `spark.read.format("graft-ticks").option("rows", n)
  * .option("pages", p).load()` (short name via DataSourceRegister).
  */
class TickSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-ticks"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TickTable(
      properties.asScala.getOrElse("rows", "10000").toLong,
      properties.asScala.getOrElse("pages", "8").toInt)
}

object TickSource {
  /** Fixed emission schema; `ts` advances 1s per tick from a fixed epoch,
    * `price` is integer-derived (exact in double), `symbol` cycles a
    * 3-value vocabulary — every column reproducible in the oracle.
    */
  val Schema: StructType = StructType(Seq(
    StructField("tick_id", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  val BaseUs: Long = 1704067200000000L // 2024-01-01T00:00:00Z
  val Symbols: Array[String] = Array("EURUSD", "GBPUSD", "USDJPY")
}

private[sources] class TickTable(rows: Long, pages: Int)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft_ticks(rows=$rows, pages=$pages)"
  override def schema(): StructType = TickSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  /** Metadata columns (`SupportsMetadataColumns` — the `_metadata` file
    * source contract): hidden from the table schema and `SELECT *`, but
    * resolvable by name. `_row_in_page` is the row's ordinal WITHIN its
    * fetch page — the provenance a paginated-ingest debugger wants
    * ("which position of which response did this row come from") —
    * computed by the reader from the page's ORIGINAL start, so pushed
    * range bounds clip which rows exist but never renumber them.
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_row_in_page"
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "ordinal of the row within its original fetch page"
    })
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TickScanBuilder(rows, pages,
      Option(options.get("maxTicksPerTrigger")).map(_.toLong))
}

private[graft] class TickScanBuilder(rows: Long, pages: Int,
    maxPerTrigger: Option[Long])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var required: StructType = TickSource.Schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[TickAggregation] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT pushdown: the feed is an ordered log, so "first n rows" is an
    * id-range clip — the REST analog of stopping pagination after n rows.
    * Applied AFTER the range filters (Spark pushes filters first), so the
    * clip composes with pushed bounds.
    */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit.toLong)
    true
  }

  /** Aggregate pushdown (the "API answers the aggregate" path): a
    * group-by-less COUNT(*) / MIN / MAX over the id-monotone columns
    * (tick_id, ts) is CLOSED-FORM over an id range — each page partition
    * answers its slice in O(1) without generating a single row, and Spark
    * merges the per-partition partials (partial pushdown: sum the counts,
    * min the mins, max the maxes). Aggregates over the non-monotone
    * columns (price, symbol, page) are declined and run as normal scans.
    */
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (aggregation.groupByExpressions().nonEmpty) return false
    def monotoneCol(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.sameElements(Array("tick_id")) =>
        Some("tick_id")
      case r: NamedReference if r.fieldNames.sameElements(Array("ts")) => Some("ts")
      case _ => None
    }
    val specs: Array[Option[TickAggSpec]] = aggregation.aggregateExpressions().map {
      case _: CountStar => Some(TickAggSpec("count", "count(*)"))
      case m: Min => monotoneCol(m.column).map(c => TickAggSpec(s"min_$c", s"min($c)"))
      case m: Max => monotoneCol(m.column).map(c => TickAggSpec(s"max_$c", s"max($c)"))
      case _ => None
    }
    if (specs.exists(_.isEmpty)) return false
    pushedAgg = Some(TickAggregation(specs.flatten))
    true
  }

  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = false // per-partition partials; Spark merges

  /** Accept only tick_id range comparisons; everything else is residual.
    * Accepted bounds tighten the generated range — the source-side
    * analog of requesting fewer REST pages.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("tick_id", _: Long) => true
      case GreaterThanOrEqual("tick_id", _: Long) => true
      case LessThan("tick_id", _: Long) => true
      case LessThanOrEqual("tick_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("tick_id", v: Long) => lo = math.max(lo, v + 1L)
      case GreaterThanOrEqual("tick_id", v: Long) => lo = math.max(lo, v)
      case LessThan("tick_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("tick_id", v: Long) => hi = math.min(hi, v + 1L)
      case _ =>
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new TickScan(rows, pages, lo, hi, required, maxPerTrigger, pushedAgg)
}

/** One pushed aggregate column: its output name/type and how a page's
  * [start, end) id range answers it in O(1).
  */
private[sources] case class TickAggSpec(name: String, desc: String) {
  import org.apache.spark.sql.types.{DataType, LongType, TimestampType}
  def dataType: DataType =
    if (name.endsWith("_ts")) TimestampType else LongType
  def nullable: Boolean = name != "count" // empty range: count 0, min/max null
  /** Partial value over [start, end); None = SQL NULL (empty range). */
  def value(start: Long, end: Long): Option[Any] = name match {
    case "count" => Some(math.max(0L, end - start))
    case _ if start >= end => None
    case "min_tick_id" => Some(start)
    case "max_tick_id" => Some(end - 1L)
    case "min_ts" => Some(TickSource.BaseUs + start * 1000000L)
    case "max_ts" => Some(TickSource.BaseUs + (end - 1L) * 1000000L)
  }
}

private[sources] case class TickAggregation(specs: Array[TickAggSpec]) {
  def schema: StructType =
    StructType(specs.map(s => StructField(s.name, s.dataType, s.nullable)))
  def describe: String = specs.map(_.desc).mkString(",")
}

private[sources] class TickScan(rows: Long, pages: Int,
    private var lo: Long, private var hi: Long,
    required: StructType, maxPerTrigger: Option[Long] = None,
    pushedAgg: Option[TickAggregation] = None)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics {

  override def readSchema(): StructType =
    pushedAgg.map(_.schema).getOrElse(required)
  override def toBatch: Batch = this

  /** Size statistics AFTER pushdown (`SupportsReportStatistics`): the
    * planner sees the NARROWED row count, so a source slimmed by pushed
    * bounds auto-broadcasts in joins without any hint — exactly how a
    * file source's post-pruning size drives join strategy. Bytes estimate:
    * fixed-width columns at face value, symbol at its 6-char vocabulary.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    private val rowBytes = required.fields.map(_.dataType match {
      case LongType | DoubleType | TimestampType => 8L
      case IntegerType => 4L
      case StringType => 20L
      case _ => 16L
    }).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * math.max(1L, rowBytes))
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(n)
  }

  // RUNTIME filtering (the DSv2 dynamic-pruning hook): after the join's
  // build side executes, the engine hands this scan the observed key set —
  // BEFORE planInputPartitions — so pages no key falls into are never
  // fetched. The compile-time pushdown narrows on CONSTANTS; this narrows
  // on data known only at run time (the DPP contract).
  private var runtimeIds: Option[Array[Long]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("tick_id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In("tick_id", vs) =>
      val ids = vs.collect { case v: java.lang.Long => v.longValue() }.sorted
      if (ids.nonEmpty) {
        lo = math.max(lo, ids.head)
        hi = math.min(hi, ids.last + 1L)
        runtimeIds = Some(ids)
      } else { hi = lo } // empty build side: nothing can match
    case GreaterThan("tick_id", v: Long) => lo = math.max(lo, v + 1L)
    case GreaterThanOrEqual("tick_id", v: Long) => lo = math.max(lo, v)
    case LessThan("tick_id", v: Long) => hi = math.min(hi, v)
    case LessThanOrEqual("tick_id", v: Long) => hi = math.min(hi, v + 1L)
    case _ => // residual filters are Spark's to evaluate post-scan
  }

  /** Streaming half: the offset is simply the next unread tick_id — the
    * feed is a totally ordered log, so exactly-once is offset-range
    * arithmetic (the Kafka model). Each micro-batch admits up to
    * `maxTicksPerTrigger` ids and plans page-aligned splits of its
    * [start, end) slice; a restart resumes from the checkpointed offset
    * with no duplicate and no gap (TickSourceSpec pins multi-batch
    * equality with the batch read).
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TickMicroBatchStream(rows, pages, required,
      maxPerTrigger.getOrElse(rows))
  override def description(): String =
    s"graft-ticks rows=$rows pages=$pages range=[$lo,$hi) " +
      s"cols=${required.fieldNames.mkString(",")}" +
      pushedAgg.map(a => s" PushedAggregates=[${a.describe}]").getOrElse("")

  /** One partition per ORIGINAL page whose id-range intersects the pushed
    * bounds — pages fully outside the bounds are never planned (the
    * "skipped REST request"). With a pushed aggregate over an empty range,
    * ONE empty-range partition is still planned so the count partial 0
    * exists (a zero-partition scan would make the final sum NULL, not 0).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + pages - 1) / pages
    val live = (0 until pages).iterator
      .map { p =>
        val s = math.max(lo, p * per)
        val e = math.min(hi, math.min(rows, (p + 1) * per))
        TickPage(p, s, e, origin = p * per)
      }
      .filter(pp => pp.start < pp.end)
      // page-level runtime pruning: drop pages holding NONE of the build
      // side's ids (binary search into the sorted runtime key set)
      .filter(pp => runtimeIds.forall { ids =>
        val i = java.util.Arrays.binarySearch(ids, pp.start)
        val at = if (i >= 0) i else -i - 1
        at < ids.length && ids(at) < pp.end
      })
      .toArray[InputPartition]
    if (live.isEmpty && pushedAgg.isDefined) Array(TickPage(0, lo, lo, origin = 0L))
    else live
  }

  override def createReaderFactory(): PartitionReaderFactory =
    pushedAgg match {
      case Some(agg) => new TickAggReaderFactory(agg)
      case None => new TickReaderFactory(required)
    }
}

private[sources] class TickAggReaderFactory(agg: TickAggregation)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val page = partition.asInstanceOf[TickPage]
      private var emitted = false
      override def next(): Boolean = { val go = !emitted; emitted = true; go }
      override def get(): InternalRow = InternalRow.fromSeq(
        agg.specs.toSeq.map(_.value(page.start, page.end).orNull))
      override def close(): Unit = ()
    }
}

/** `origin` is the page's ORIGINAL first id (pre-pushdown): metadata
  * ordinals number rows within the page as fetched, not as filtered.
  */
private[sources] case class TickPage(page: Int, start: Long, end: Long,
    origin: Long)
    extends InputPartition

private[sources] class TickReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TickReader(partition.asInstanceOf[TickPage], required)
}

private[sources] case class TickOffset(next: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = next.toString
}

private[sources] class TickMicroBatchStream(rows: Long, pages: Int,
    required: StructType, maxPerTrigger: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  // Trigger.AvailableNow contract: pin the end-of-feed target at query
  // start; without this interface the engine degrades AvailableNow to a
  // SINGLE micro-batch, defeating the rate limit's multi-batch replay
  private var availableTarget: Long = rows
  override def prepareForTriggerAvailableNow(): Unit = { availableTarget = rows }

  override def initialOffset(): Offset = TickOffset(0L)

  // rate limiting lives HERE, in admission control — clipping inside
  // planInputPartitions instead would let the engine COMMIT an end
  // offset whose rows were never planned (silent loss on the next batch)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val s = startOffset.asInstanceOf[TickOffset].next
    TickOffset(math.min(availableTarget, s + maxPerTrigger))
  }

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(maxPerTrigger)

  override def reportLatestOffset(): Offset = TickOffset(rows)

  override def deserializeOffset(json: String): Offset =
    TickOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TickOffset].next
    val e = end.asInstanceOf[TickOffset].next
    val per = (rows + pages - 1) / pages
    (0 until pages).iterator
      .map { p =>
        val ps = math.max(s, p * per)
        val pe = math.min(e, math.min(rows, (p + 1) * per))
        TickPage(p, ps, pe, origin = p * per)
      }
      .filter(pp => pp.start < pp.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TickReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Generates only the requested columns for ids in [start, end). */
private[sources] class TickReader(page: TickPage, required: StructType)
    extends PartitionReader[InternalRow] {

  private var id = page.start - 1L
  // column generators resolved ONCE per partition, not per row
  private val gens: Array[Long => Any] = required.fields.map { f =>
    f.name match {
      case "tick_id" => (i: Long) => i
      case "page" => (_: Long) => page.page
      case "ts" => (i: Long) => TickSource.BaseUs + i * 1000000L
      case "symbol" => (i: Long) =>
        UTF8String.fromString(TickSource.Symbols((i % 3L).toInt))
      case "price" => (i: Long) => 1.0 + ((i * 7919L) % 10000L).toDouble / 10000.0
      case "_row_in_page" => (i: Long) => i - page.origin
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
  }

  override def next(): Boolean = { id += 1L; id < page.end }
  override def get(): InternalRow = InternalRow.fromSeq(gens.map(g => g(id)).toSeq)
  override def close(): Unit = ()
}
