package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{AlwaysTrue, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK with a real two-phase commit — the write half of the
  * connector story ([[TickSource]] is the read half; together they model
  * the reference's extract → load edge, scripts/extract_forex.py:120-199,
  * where rows leave the engine for an external system).
  *
  * The protocol is the one every exactly-once file/object-store sink runs
  * at cluster scale (the Hadoop commit algorithm reduced to its DSv2
  * essentials):
  *
  *  - every task writes to a PRIVATE staged file whose name embeds the
  *    TASK ATTEMPT id — two speculative/retried attempts of the same
  *    partition can run concurrently without touching each other;
  *  - a task that finishes returns its staged name as the
  *    `WriterCommitMessage`; a task that fails calls `abort()` and deletes
  *    only its own file;
  *  - the DRIVER commits the job by renaming exactly the staged files
  *    named in the committed messages to their deterministic final names
  *    (one per partition) — the losing duplicate attempt's file is never
  *    renamed and vanishes with the staging directory. Readers only ever
  *    see fully-written, committed files: rename is the atomicity point,
  *    and a rename that REPORTS failure fails the commit loudly (a
  *    swallowed false return would report success over lost data).
  *  - `overwrite` (SaveMode.Overwrite → truncate) deletes the PREVIOUS
  *    generation's data files inside the same job commit, so the switch
  *    from old to new data is a single metadata step, not a window where
  *    both or neither are visible.
  *
  * Streaming (`writeStream.format("graft-sink")`): the same staged-rename
  * protocol, with the epoch id baked into BOTH the staging directory
  * (`_staging-<query>-e<epoch>` — concurrent epochs never share staging,
  * so committing epoch N cannot destroy epoch N+1's in-flight files) and
  * the final name. A re-delivered `commit(epochId)` after a driver
  * failover renames onto the SAME final names; if the staged file is
  * already gone AND its final file exists, the epoch was already
  * published and the message is skipped — replayed epoch commits are
  * genuinely idempotent: exactly-once through at-least-once delivery, the
  * standard sink-side contract.
  *
  * All filesystem access resolves through the SESSION's Hadoop
  * configuration (captured on the driver at write-build time and shipped
  * serialized to executor writers) — `spark.hadoop.*` settings,
  * credentials, and defaultFS apply, not a bare `new Configuration()`
  * that only ever works against a default-configured local filesystem.
  *
  * Rows serialize as CSV: long/int/double via JVM shortest-round-trip
  * strings, timestamps as raw MICROSECOND longs (no format ambiguity;
  * readers cast via `timestamp_micros`), strings verbatim (the feed
  * vocabulary is comma-free; a general sink would quote — out of scope for
  * the commit protocol this class exists to prove). Nulls serialize empty.
  */
class GraftSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-sink"

  // on WRITE the DataFrame's schema is the table schema (no inference);
  // on READ the schema comes from the _schema.json the first commit wrote
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null && path.nonEmpty, "graft-sink requires a path")
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val (fs, root) = GraftSinkIO.fs(path, conf)
    val meta = new HPath(root, "_schema.json")
    if (!fs.exists(meta))
      throw new UnsupportedOperationException(
        s"graft-sink table at $path has no _schema.json yet — readable only " +
          "after the first commit (the written DataFrame defines the schema)")
    DataType.fromJson(GraftSinkIO.readSchemaJson(fs, meta))
      .asInstanceOf[StructType]
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-sink requires a path")
    new GraftSinkTable(path, schema, Option(properties.get("clusterBy")))
  }
}

/** Serializable Hadoop-Configuration carrier: the session's
  * `spark.hadoop.*` view must reach executor-side writers, and
  * `Configuration` itself is not `Serializable` (Spark's own wrapper is
  * `private[spark]`). Standard writeObject/readFields round-trip.
  */
private[sources] class GraftHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sources] class GraftSinkTable(path: String, tableSchema: StructType,
    clusterBy: Option[String])
    extends Table with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  override def name(): String = s"graft_sink($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.BATCH_READ)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // driver-side capture of the SESSION Hadoop conf (spark.hadoop.*,
    // credentials, defaultFS) — shipped to every writer
    val conf = new GraftHadoopConf(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new GraftSinkWriteBuilder(path, info.schema(), info.queryId(),
      truncate = false, clusterBy, conf)
  }

  /** READ half — the other side of the connector's own commit protocol:
    * the scan lists exactly the COMMITTED final names (`part-*.csv`,
    * `epoch-*.csv`) at the table root. Staged files can never leak in by
    * construction: they live under `_staging-*` subdirectories, and the
    * listing takes root-level files only. One InputPartition per
    * committed file; column pruning parses only the requested cells.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder = {
    val conf = new GraftHadoopConf(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new GraftSinkScanBuilder(path, tableSchema, conf)
  }
}

private[sources] class GraftSinkScanBuilder(path: String,
    tableSchema: StructType, conf: GraftHadoopConf)
    extends org.apache.spark.sql.connector.read.ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): org.apache.spark.sql.connector.read.Scan =
    new GraftSinkScan(path, tableSchema, required, conf)
}

private[sources] case class GraftSinkFilePartition(file: String)
    extends org.apache.spark.sql.connector.read.InputPartition

private[sources] class GraftSinkScan(path: String, tableSchema: StructType,
    required: StructType, conf: GraftHadoopConf)
    extends org.apache.spark.sql.connector.read.Scan
    with org.apache.spark.sql.connector.read.Batch {

  override def readSchema(): StructType = required
  override def toBatch: org.apache.spark.sql.connector.read.Batch = this
  override def description(): String =
    s"graft-sink read $path cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions()
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val (fs, root) = GraftSinkIO.fs(path, conf.value)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root)
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && n.endsWith(".csv") &&
          (n.startsWith("part-") || n.startsWith("epoch-"))
      }
      .sortBy(_.getPath.getName)
      .map(st => GraftSinkFilePartition(st.getPath.toString)
        : org.apache.spark.sql.connector.read.InputPartition)
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new GraftSinkReaderFactory(tableSchema, required, conf)
}

private[sources] class GraftSinkReaderFactory(tableSchema: StructType,
    required: StructType, conf: GraftHadoopConf)
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {

  override def createReader(
      partition: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    new GraftSinkFileReader(
      partition.asInstanceOf[GraftSinkFilePartition].file,
      tableSchema, required, conf)
}

/** Parses the writers' wire format back: headerless CSV, no quoting,
  * timestamps as raw microsecond longs, "" = NULL — the exact inverse of
  * GraftSinkDataWriter's cell serializers, resolved once per column.
  */
private[sources] class GraftSinkFileReader(file: String,
    tableSchema: StructType, required: StructType, conf: GraftHadoopConf)
    extends org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {

  private val (fs, p) = GraftSinkIO.fs(file, conf.value)
  private val in = new java.io.BufferedReader(
    new java.io.InputStreamReader(fs.open(p), "UTF-8"))

  // required field -> (cell index in the full row, parser)
  private val cols: Array[(Int, String => Any)] = required.fields.map { f =>
    val idx = tableSchema.fieldIndex(f.name)
    val parse: String => Any = f.dataType match {
      case LongType | TimestampType => s => s.toLong // ts wire format IS µs
      case IntegerType => s => s.toInt
      case DoubleType => s => s.toDouble
      case StringType => s => org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case other =>
        throw new IllegalArgumentException(s"unsupported sink type $other")
    }
    (idx, parse)
  }

  private var line: String = _

  override def next(): Boolean = { line = in.readLine(); line != null }

  override def get(): InternalRow = {
    // per-row hot loop: index the hoisted parser array directly (no Seq
    // conversion / closure mapping per row — the read-side mirror of the
    // writer's resolved-cell-serializer loop)
    val cells = line.split(",", -1)
    val out = new Array[Any](cols.length)
    var j = 0
    while (j < cols.length) {
      val (i, parse) = cols(j)
      out(j) = if (cells(i).isEmpty) null else parse(cells(i))
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override def close(): Unit = in.close()
}

private[sources] class GraftSinkWriteBuilder(path: String, schema: StructType,
    queryId: String, truncate: Boolean, clusterBy: Option[String],
    conf: GraftHadoopConf)
    extends WriteBuilder with SupportsOverwrite {

  /** SaveMode.Overwrite arrives as overwrite(AlwaysTrue); partial
    * predicate overwrites are a partitioned-table feature this flat sink
    * honestly refuses rather than silently full-truncating.
    */
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(filters.forall(_.isInstanceOf[AlwaysTrue]),
      s"graft-sink supports only full truncate, got ${filters.mkString(",")}")
    new GraftSinkWriteBuilder(path, schema, queryId, truncate = true,
      clusterBy, conf)
  }

  /** `option("clusterBy", col)` makes the sink REQUEST its input layout
    * through `RequiresDistributionAndOrdering` — Spark inserts the shuffle
    * + sort, so each clustering value lands wholly inside one task's file
    * (the file-per-entity layout downstream bucketed readers want). The
    * sink declaring its needs, instead of the caller remembering to
    * repartition, is the DSv2 write-distribution contract (how Iceberg and
    * Delta request their table distribution).
    */
  override def build(): Write = {
    import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
    new Write with RequiresDistributionAndOrdering {
      override def requiredDistribution(): Distribution = clusterBy
        .map(c => Distributions.clustered(
          Array[org.apache.spark.sql.connector.expressions.Expression](
            Expressions.identity(c))))
        .getOrElse(Distributions.unspecified())
      override def requiredOrdering(): Array[SortOrder] = clusterBy
        .map(c => Array(Expressions.sort(Expressions.identity(c),
          SortDirection.ASCENDING)))
        .getOrElse(Array.empty)
      override def toBatch: BatchWrite =
        new GraftSinkBatchWrite(path, schema, queryId, truncate, conf)
      override def toStreaming: StreamingWrite =
        new GraftSinkStreamingWrite(path, schema, queryId, conf)
    }
  }
}

/** Commit token: which staged file, and which final name it earns. */
private[sources] case class GraftStaged(staged: String, finalName: String,
    rows: Long) extends WriterCommitMessage

private[sources] object GraftSinkIO {
  def fs(path: String, conf: Configuration): (FileSystem, HPath) = {
    val p = new HPath(path)
    (p.getFileSystem(conf), p)
  }

  /** Full contents of a table-metadata file as UTF-8. */
  def readSchemaJson(fs: FileSystem, meta: HPath): String = {
    val in = fs.open(meta)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Batch jobs stage under `_staging-<query>`; each streaming EPOCH
    * stages under its own `_staging-<query>-e<epoch>` — concurrent epochs
    * (continuous mode, overlapping retries) never share a staging dir, so
    * one epoch's publish cannot delete another's in-flight files.
    */
  def stagingDir(path: String, queryId: String,
      epoch: Option[Long] = None): HPath =
    new HPath(path,
      epoch.fold(s"_staging-$queryId")(e => s"_staging-$queryId-e$e"))

  /** Rename committed staged files to final names, then drop this job's /
    * epoch's staging dir so losing task attempts' files — never named in
    * `messages` — disappear.
    *
    * Idempotent under commit replay, carefully: a message whose staged
    * source is GONE but whose final file EXISTS was already published by
    * the previous delivery of this commit — skip it (deleting dest first
    * and then "renaming" a missing source would destroy committed data).
    * A message with neither source nor dest is real data loss and throws;
    * so does a rename that returns false — silent false-returns are how
    * commit protocols lose partitions.
    */
  def publish(path: String, queryId: String, epoch: Option[Long],
      messages: Array[WriterCommitMessage], dropExisting: Boolean,
      conf: Configuration, schema: Option[StructType] = None): Unit = {
    val (fs, root) = GraftSinkIO.fs(path, conf)
    val staging = stagingDir(path, queryId, epoch)
    if (dropExisting && fs.exists(root)) {
      fs.listStatus(root).filter { st =>
        st.isFile && st.getPath.getName.endsWith(".csv")
      }.foreach(st => fs.delete(st.getPath, false))
    }
    fs.mkdirs(root)
    messages.collect { case m: GraftStaged => m }.foreach { m =>
      val src = new HPath(staging, m.staged)
      val dest = new HPath(root, m.finalName)
      if (!fs.exists(src)) {
        if (!fs.exists(dest)) {
          throw new java.io.IOException(
            s"graft-sink commit: staged file $src is gone and final $dest " +
              "does not exist — partition data lost")
        }
        // else: replayed commit, already published — leave dest alone
      } else {
        if (fs.exists(dest)) fs.delete(dest, false)
        if (!fs.rename(src, dest)) {
          throw new java.io.IOException(
            s"graft-sink commit: rename $src -> $dest failed")
        }
      }
    }
    fs.delete(staging, true)
    // table metadata: the written schema, persisted once at commit so the
    // READ path can infer it (underscore name: invisible to data globs)
    schema.foreach { sch =>
      val meta = new HPath(root, "_schema.json")
      // append commits keep the first-written schema; a truncate commit
      // replaces the whole generation, metadata included
      if (dropExisting || !fs.exists(meta)) {
        val out = fs.create(meta, true)
        out.write(sch.json.getBytes("UTF-8"))
        out.close()
      } else {
        // an APPEND with a different schema would write cells the stored
        // schema misparses (swapped same-type columns read back silently
        // transposed) — reject it at commit, the table-format contract
        val stored = readSchemaJson(fs, meta)
        if (stored != sch.json) {
          throw new IllegalArgumentException(
            s"graft-sink append schema mismatch at $path: table has " +
              s"$stored, batch writes ${sch.json}")
        }
      }
    }
  }
}

private[sources] class GraftSinkBatchWrite(path: String, schema: StructType,
    queryId: String, truncate: Boolean, conf: GraftHadoopConf)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory(path, schema, queryId, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftSinkIO.publish(path, queryId, None, messages,
      dropExisting = truncate, conf.value, Some(schema))

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val (fs, _) = GraftSinkIO.fs(path, conf.value)
    fs.delete(GraftSinkIO.stagingDir(path, queryId), true)
  }
}

private[sources] class GraftSinkStreamingWrite(path: String, schema: StructType,
    queryId: String, conf: GraftHadoopConf) extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftSinkWriterFactory(path, schema, queryId, conf)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    GraftSinkIO.publish(path, queryId, Some(epochId), messages,
      dropExisting = false, conf.value, Some(schema))

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    // the epoch owns its staging dir outright — dropping it cannot touch
    // any other epoch's in-flight files
    val (fs, _) = GraftSinkIO.fs(path, conf.value)
    fs.delete(GraftSinkIO.stagingDir(path, queryId, Some(epochId)), true)
  }
}

private[sources] class GraftSinkWriterFactory(path: String, schema: StructType,
    queryId: String, conf: GraftHadoopConf)
    extends DataWriterFactory with StreamingDataWriterFactory {

  // batch final names embed the per-job queryId so APPEND jobs never
  // collide on partition numbers; streaming epoch names deliberately do
  // NOT (epoch replay after failover must rename onto the SAME targets)
  private def jobTag: String =
    queryId.replaceAll("[^A-Za-z0-9]", "").take(8)

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftSinkDataWriter(path, queryId, None, schema,
      staged = f"part-$jobTag-$partitionId%05d-a$taskId.csv",
      finalName = f"part-$jobTag-$partitionId%05d.csv", conf)

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftSinkDataWriter(path, queryId, Some(epochId), schema,
      staged = f"epoch-$epochId-part-$partitionId%05d-a$taskId.csv",
      finalName = f"epoch-$epochId-part-$partitionId%05d.csv", conf)
}

private[sources] class GraftSinkDataWriter(path: String, queryId: String,
    epoch: Option[Long], schema: StructType, staged: String, finalName: String,
    conf: GraftHadoopConf)
    extends DataWriter[InternalRow] {

  private val (fs, _) = GraftSinkIO.fs(path, conf.value)
  private val stagedPath =
    new HPath(GraftSinkIO.stagingDir(path, queryId, epoch), staged)
  private lazy val out = {
    fs.mkdirs(stagedPath.getParent)
    new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fs.create(stagedPath, true), "UTF-8"))
  }
  private var n = 0L

  // one resolved serializer per column, not a per-row type dispatch
  private val cells: Array[(InternalRow, Int) => String] =
    schema.fields.map { f =>
      val g: (InternalRow, Int) => String = f.dataType match {
        case LongType => (r, i) => r.getLong(i).toString
        case IntegerType => (r, i) => r.getInt(i).toString
        case DoubleType => (r, i) => r.getDouble(i).toString
        case TimestampType => (r, i) => r.getLong(i).toString // µs since epoch
        case StringType => (r, i) =>
          val v = r.getUTF8String(i).toString
          // no quoting layer: separators are rejected, and the EMPTY string
          // is rejected too — "" on the wire is the NULL marker (Spark's
          // CSV nullValue default), so an empty string datum would silently
          // read back as null
          require(v.nonEmpty && !v.exists(c => c == ',' || c == '\n' || c == '\r'),
            s"graft-sink does not quote; empty or separator-bearing string: '$v'")
          v
        case other =>
          throw new IllegalArgumentException(s"unsupported sink type $other")
      }
      (r: InternalRow, i: Int) => if (r.isNullAt(i)) "" else g(r, i)
    }

  override def write(row: InternalRow): Unit = {
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < cells.length) {
      if (i > 0) sb.append(',')
      sb.append(cells(i)(row, i))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
    n += 1L
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftStaged(staged, finalName, n)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(stagedPath, false)
  }

  override def close(): Unit = ()
}
