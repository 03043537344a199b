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

  // the written DataFrame's schema IS the table schema — no inference pass
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-sink is write-only; the schema comes from the written DataFrame")

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
    extends Table with SupportsWrite {
  override def name(): String = s"graft_sink($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // driver-side capture of the SESSION Hadoop conf (spark.hadoop.*,
    // credentials, defaultFS) — shipped to every writer
    val conf = new GraftHadoopConf(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new GraftSinkWriteBuilder(path, info.schema(), info.queryId(),
      truncate = false, clusterBy, conf)
  }
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
      conf: Configuration): Unit = {
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
  }
}

private[sources] class GraftSinkBatchWrite(path: String, schema: StructType,
    queryId: String, truncate: Boolean, conf: GraftHadoopConf)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory(path, schema, queryId, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftSinkIO.publish(path, queryId, None, messages,
      dropExisting = truncate, conf.value)

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
      dropExisting = false, conf.value)

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
