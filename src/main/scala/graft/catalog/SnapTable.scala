package graft.catalog

import graft.sources.Snapshots
import graft.sources.Snapshots.{DeleteFile, Snapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, NoopCache, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.Collections
import scala.jdk.CollectionConverters._

/** A snapshot-store table as a DataSourceV2 [[Table]].
  *
  * READ: the head (or a time-travel-pinned) manifest's file list feeds
  * an [[InMemoryFileIndex]] + [[ParquetScanBuilder]] — Spark's own
  * vectorized parquet scan with full filter pushdown and column
  * pruning, planned over EXACTLY the manifest's files (no directory
  * listing, the store's metadata-only contract). When the snapshot
  * carries pending merge-on-read deletes, the scan switches to the
  * delete-applying wrapper ([[MorScan]]): per-era parquet scans with
  * the delete-key sets applied row-level in the readers — column
  * pruning still forwards, filter pushdown is traded away until the
  * next rewrite absorbs the deletes (the same transient degrade
  * Iceberg v2 accepts for equality deletes).
  *
  * WRITE: INSERT INTO / CTAS / INSERT OVERWRITE go through a
  * [[org.apache.spark.sql.connector.write.V1Write]] fallback — the
  * staged write is still a fully distributed `df.write.parquet` into a
  * versioned staging dir; only the atomic manifest publish
  * ([[Snapshots.commitAppend]]/[[Snapshots.commit]]) runs on the
  * driver. DELETE / UPDATE / MERGE are NATIVE row-level operations
  * ([[GraftRowLevel]]): Spark's own analyzer rewrites the statement
  * and this table supplies the scan and the commit point.
  *
  * Schema: the CREATE-time schema is pinned in `_table.properties`;
  * a root built through the direct [[Snapshots]] API (no CREATE) infers
  * from the head parquet footers instead.
  */
class GraftTable(tableName: String, val root: String,
    val pinned: Option[Snapshot])
  extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  private def spark = SparkSession.active

  /** The snapshot this table instance reads: pinned (time travel) or
    * resolved once per loadTable — Spark re-loads the table per query,
    * so a cached instance never goes stale across statements. */
  lazy val snap: Option[Snapshot] = pinned.orElse(Snapshots.resolve(root))

  private lazy val meta: Option[(StructType, Map[String, String])] =
    GraftTable.readMeta(root)

  override def name(): String = tableName

  override def schema(): StructType = {
    // a time-travel-pinned read presents the schema AS OF that version
    // (inferred from its own footers, merged across its eras) — the
    // other half of the add-column evolution contract; the declared
    // meta schema governs the head
    val declared = pinned.filter(_.files.nonEmpty) match {
      case Some(p) =>
        spark.read.option("mergeSchema", "true").parquet(p.files: _*).schema
      case None => meta.map(_._1).getOrElse {
        val files = snap.map(_.files).getOrElse(Nil)
        require(files.nonEmpty,
          s"table $tableName has no declared schema and no committed data")
        spark.read.parquet(files: _*).schema
      }
    }
    // a merge-on-read key is a primary key: Spark's delta rewrites
    // require the row-id attribute non-nullable (same contract as
    // Iceberg identifier fields), so pin it here regardless of how the
    // CREATE statement spelled it
    morKeyOf(meta) match {
      case Some(k) => StructType(declared.fields.map(f =>
        if (f.name == k) f.copy(nullable = false) else f))
      case None => declared
    }
  }

  override def properties(): java.util.Map[String, String] =
    meta.map(_._2.asJava).getOrElse(Collections.emptyMap())

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  /** The merge-on-read key column, when this table is configured for
    * delta (Hudi/Iceberg-v2-style) row-level writes:
    * `TBLPROPERTIES ('graft.mor.key' = '<primary key col>')`. Absent →
    * copy-on-write row-level ops. */
  def morKey: Option[String] = morKeyOf(meta)

  private def morKeyOf(m: Option[(StructType, Map[String, String])]): Option[String] =
    m.flatMap(_._2.get(GraftTable.morKeyProp))

  /** Prior physical names per current column (RENAME COLUMN ledger) —
    * applied to HEAD reads only: a time-travel-pinned read infers its
    * schema from that version's own footers and must present (and
    * resolve) the historical names as-is. */
  private def priors: Map[String, Seq[String]] =
    if (pinned.isDefined) Map.empty
    else meta.map(m => GraftTable.priorsOf(m._2)).getOrElse(Map.empty)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    GraftScans.builder(spark, schema(), snap, options, priors)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty,
      s"cannot write to a time-travel-pinned read of $tableName")
    new GraftV1WriteBuilder(root, info)
  }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(pinned.isEmpty,
      s"cannot run ${info.command} against a time-travel-pinned read of $tableName")
    () => morKey match {
      case Some(key) => new GraftDeltaOperation(info.command, this, key)
      case None      => new GraftGroupOperation(info.command, this)
    }
  }

  override def toString: String = s"GraftTable($tableName @ $root)"
}

object GraftTable {
  val metaFile = "_table.properties"
  val morKeyProp = "graft.mor.key"
  /** Prior-physical-name ledger for RENAME COLUMN evolution: one
    * property `graft.col.prior.<currentName>` per renamed column,
    * value = comma-joined prior names oldest→newest (see
    * [[GraftCatalog.alterTable]]). */
  val colPriorPrefix = "graft.col.prior."
  /** Tombstoned physical names of DROPped columns (comma-joined) —
    * blocks ADD/RENAME from resurrecting their file data. */
  val droppedProp = "graft.cols.dropped"
  private val schemaKey = "graft.schema.json"

  /** current column name → its prior physical names, oldest→newest. */
  def priorsOf(props: Map[String, String]): Map[String, Seq[String]] =
    props.collect { case (k, v) if k.startsWith(colPriorPrefix) =>
      k.stripPrefix(colPriorPrefix) -> v.split(',').toSeq.filter(_.nonEmpty)
    }

  def droppedOf(props: Map[String, String]): Set[String] =
    props.get(droppedProp).toSeq
      .flatMap(_.split(',')).filter(_.nonEmpty).toSet

  def writeMeta(root: String, schema: StructType, props: Map[String, String]): Unit = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    p.setProperty(schemaKey, schema.json)
    // temp + ATOMIC_MOVE: ALTER TABLE rewrites this file while readers
    // may be loading the table — they must see old or new meta, never
    // a torn write
    val tmp = Paths.get(root,
      s".tmp_meta_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    val out = Files.newBufferedWriter(tmp, UTF_8)
    try p.store(out, null) finally out.close()
    Files.move(tmp, Paths.get(root, metaFile),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def readMeta(root: String): Option[(StructType, Map[String, String])] = {
    val f = Paths.get(root, metaFile)
    if (!Files.exists(f)) None
    else {
      val p = new java.util.Properties()
      val in = Files.newBufferedReader(f, UTF_8)
      try p.load(in) finally in.close()
      val schema = DataType.fromJson(p.getProperty(schemaKey)).asInstanceOf[StructType]
      val props = p.stringPropertyNames().asScala
        .filterNot(_ == schemaKey).map(k => k -> p.getProperty(k)).toMap
      Some((schema, props))
    }
  }
}

/** INSERT INTO / INSERT OVERWRITE / CTAS write path: a V1 fallback
  * write whose `insert` receives the query's DataFrame on the driver
  * and runs ONE fully distributed parquet write into a fresh versioned
  * staging dir, then publishes atomically. Append → the manifest
  * carries the parent's files plus the staged ones (no data moves);
  * truncate/overwrite → a full-rewrite commit (pending MOR deletes
  * absorbed, exactly the store's rewrite contract).
  *
  * The SAME builder serves `writeStream.toTable(...)`: `toStreaming`
  * returns an exactly-once epoch-append sink — executors stage each
  * micro-batch's parquet ([[GraftStreamingWrite]]) and the epoch
  * commit is one idempotent `#txn`-tagged manifest publish
  * ([[Snapshots.commitAppendStagedTxn]]), so a crash-replayed batch
  * no-ops instead of double-appending. */
private[catalog] class GraftV1WriteBuilder(root: String, info: LogicalWriteInfo)
  extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      (data, overwriteArg) => {
        if (overwrite || overwriteArg)
          Snapshots.commit(root)(out => data.write.mode("append").parquet(out))
        else
          Snapshots.commitAppend(root)(out => data.write.mode("append").parquet(out))
      }
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      require(!overwrite,
        "streaming writes into snapshot-catalog tables are append-only")
      new GraftStreamingWrite(root, info.schema(), info.queryId())
    }
    override def description(): String =
      s"graft-snapshot ${if (overwrite) "overwrite" else "append"} $root"
  }
}

/** Exactly-once Structured Streaming sink for a snapshot-catalog
  * table: per-epoch, executors write their partitions' rows as parquet
  * into a writer-unique staging dir (the same
  * [[ParquetRowDataWriter]] path the row-level writes use), and the
  * driver publishes the epoch with ONE idempotent txn-tagged append
  * commit keyed on (streaming queryId, epochId). A replayed epoch
  * finds its tag and no-ops; its re-staged files are orphans vacuum
  * reclaims. Cost per micro-batch: the batch's files + one manifest —
  * O(delta), never O(table) — and incremental consumers tail the
  * store via `Snapshots.readChanges`. */
private[catalog] class GraftStreamingWrite(root: String,
    schema: org.apache.spark.sql.types.StructType, queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private val stagingDir = Snapshots.newStagingDir(root)
  Files.createDirectories(Paths.get(stagingDir))

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo): StreamingDataWriterFactory = {
    val conf = ExecParquet.writerConf(schema)
    val dir = stagingDir
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
        new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
          private val w = new ParquetRowDataWriter(
            f"$dir/epoch-$epochId-part-$partitionId%05d-$taskId.parquet",
            conf.value, partitionId, taskId)
          override def write(row: InternalRow): Unit = w.write(row)
          override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage =
            StagedFilesMessage(w.finish().toSeq, Nil)
          override def abort(): Unit = w.abort()
          override def close(): Unit = ()
        }
    }
  }

  override def commit(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val files = messages.collect { case StagedFilesMessage(d, _) => d }.flatten.toSeq
    Snapshots.commitAppendStagedTxn(root, s"dsv2-$queryId", epochId, files)
  }

  override def abort(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    messages.collect { case StagedFilesMessage(d, _) => d }.flatten
      .foreach(f => Files.deleteIfExists(Paths.get(f)))
}

/** Scan construction for [[GraftTable]] — three shapes:
  *
  *  1. no committed data → a zero-partition empty scan;
  *  2. no pending deletes (the common case) → the raw
  *     [[ParquetScanBuilder]], i.e. Spark's own vectorized parquet
  *     scan with full pushdown over the manifest's file list;
  *  3. pending merge-on-read deletes → [[MorScanBuilder]]: files group
  *     by their applicable delete set (version-scoped, same eras as
  *     [[Snapshots]]' own read path), one parquet scan per era, and
  *     the delete-key sets apply ROW-LEVEL in wrapped readers. Column
  *     pruning forwards (plus the forced key columns); filter pushdown
  *     is not forwarded in this transient mode — Spark re-applies all
  *     predicates above the scan, so correctness never depends on it.
  *
  * The delete-key sets are loaded driver-side into in-memory hash sets
  * — the same per-task-memory shape Iceberg uses for equality deletes.
  * They are O(deleted keys) and bounded by the session broadcast
  * threshold; a table carrying more pending delete bytes than that
  * should be compacted (rewritten) before catalog reads, and the error
  * says so. The store-level [[Snapshots.read]] path handles unbounded
  * deletes via shuffle anti joins for maintenance access.
  */
private[catalog] object GraftScans {

  def builder(spark: SparkSession, tableSchema: StructType,
      snap: Option[Snapshot], options: CaseInsensitiveStringMap,
      priors: Map[String, Seq[String]] = Map.empty): ScanBuilder = {
    val files = snap.map(_.files).getOrElse(Nil)
    if (files.isEmpty) new EmptyScanBuilder(tableSchema)
    else {
      val deletes = snap.map(_.deletes).getOrElse(Nil)
      if (deletes.isEmpty) {
        if (priors.isEmpty) parquetBuilder(spark, files, tableSchema, options)
        else new RenameAwareScanBuilder(spark, tableSchema, priors,
          files, options)
      } else {
        // unreachable through catalog SQL: ALTER TABLE rejects renames
        // on MOR tables / under pending delete keys, and enabling MOR
        // on a renamed table is rejected too — only a direct-API
        // commitDelete against a catalog-renamed root can get here
        require(priors.isEmpty,
          "this table has renamed columns AND pending merge-on-read " +
            "delete files (a state only reachable by mixing direct-API " +
            "deletes with catalog renames); compact the table before " +
            "catalog reads")
        new MorScanBuilder(spark, tableSchema, snap.get, options)
      }
    }
  }

  private[catalog] def parquetBuilder(spark: SparkSession, files: Seq[String],
      schema: StructType, options: CaseInsensitiveStringMap): ParquetScanBuilder = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val index = new InMemoryFileIndex(classic,
      files.map(f => new org.apache.hadoop.fs.Path(f)),
      Map.empty[String, String], Some(schema), NoopCache,
      Some(PartitionSpec.emptySpec), None)
    ParquetScanBuilder(classic, index, schema, schema, options)
  }
}

/** Zero-partition scan for a created-but-never-written table. */
private[catalog] class EmptyScanBuilder(schema: StructType)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required = schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = Array.empty
    override def createReaderFactory(): PartitionReaderFactory =
      (_: InputPartition) => throw new IllegalStateException("empty scan has no partitions")
    override def description(): String = "graft-snapshot empty table"
  }
}

/** RENAME-COLUMN-aware head scan: resolves each renamed column across
  * file eras WITHOUT rewriting history. Files written before a rename
  * carry the column under a prior physical name; the scan reads the
  * UNION of current + prior names (the parquet reader surfaces a name
  * absent from a file as NULL) and emits, per output column,
  * `coalesce(current, prior_newest, …, prior_oldest)`. Exact, because
  * the ALTER TABLE ledger guarantees a physical name is never reused:
  * every file carries AT MOST ONE spelling of each logical column, so
  * the coalesce picks that spelling's value and legitimate NULLs stay
  * NULL (all other spellings are absent → NULL in that file).
  *
  * Cost model: column pruning forwards (plus the prior spellings of
  * surviving columns — bounded by rename count); filter pushdown is
  * traded away like the MOR scan's (Spark re-applies every predicate
  * above the scan, so correctness never depends on it). A full rewrite
  * (compact) re-materializes current names, after which the prior-name
  * properties can be unset to restore the plain pushdown scan. */
private[catalog] class RenameAwareScanBuilder(spark: SparkSession,
    tableSchema: StructType, priors: Map[String, Seq[String]],
    files: Seq[String], options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var requested: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    requested = requiredSchema

  override def build(): Scan = {
    // physical read schema: each requested column followed by its prior
    // spellings (same type, nullable — pre-rename files carry them)
    val physFields = requested.fields.flatMap { f =>
      f +: priors.getOrElse(f.name, Nil).reverse.map(p =>
        org.apache.spark.sql.types.StructField(p, f.dataType, nullable = true)).toArray
    }
    val physSchema = StructType(physFields)
    val b = GraftScans.parquetBuilder(spark, files, physSchema, options)
    b.pruneColumns(physSchema)
    val delegate = b.build()
    // per output column: coalesce over (current, newest prior, …)
    val exprs = requested.fields.map { f =>
      val ords = (f.name +: priors.getOrElse(f.name, Nil).reverse)
        .map(physSchema.fieldIndex)
      val refs = ords.map(o => BoundReference(o, f.dataType, nullable = true)
        : org.apache.spark.sql.catalyst.expressions.Expression)
      if (refs.size == 1) refs.head
      else org.apache.spark.sql.catalyst.expressions.Coalesce(refs)
    }
    new RenameScan(delegate, requested, exprs)
  }
}

/** The coalescing wrapper around the physical-schema parquet scan. */
private[catalog] class RenameScan(delegate: Scan, requested: StructType,
    exprs: Array[org.apache.spark.sql.catalyst.expressions.Expression])
  extends Scan with Batch {

  override def readSchema(): StructType = requested
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-snapshot rename-aware scan over (${delegate.description()})"

  override def planInputPartitions(): Array[InputPartition] =
    delegate.toBatch.planInputPartitions()

  override def createReaderFactory(): PartitionReaderFactory = {
    val inner = delegate.toBatch.createReaderFactory()
    val localExprs = exprs
    new PartitionReaderFactory {
      override def supportColumnarReads(partition: InputPartition): Boolean = false
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val d = inner.createReader(partition)
        val proj = UnsafeProjection.create(localExprs)
        new PartitionReader[InternalRow] {
          override def next(): Boolean = d.next()
          override def get(): InternalRow = proj(d.get())
          override def close(): Unit = d.close()
        }
      }
    }
  }
}

/** One delete group ready for executor-side application: the key
  * column's ordinal/type in the era's read schema plus the key set in
  * CATALYST form (UTF8String/Long/…), so row values compare directly. */
private[catalog] final case class MorDeleteSet(keyOrdinal: Int,
    keyType: DataType, keys: scala.collection.immutable.Set[Any])

/** Merge-on-read catalog scan (shape 3 in [[GraftScans]]). */
private[catalog] class MorScanBuilder(spark: SparkSession,
    tableSchema: StructType, snap: Snapshot, options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var requested: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    requested = requiredSchema

  override def build(): Scan = {
    def effVersion(f: String): Long =
      snap.fileSeq.getOrElse(f, MorScanBuilder.fileVersion(f))
    // guard against unbounded pending-delete memory (class doc)
    val delBytes = snap.deletes.map { d =>
      try Files.size(Paths.get(d.path)) catch { case _: Exception => 0L }
    }.sum
    val thresholdStr =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    val threshold =
      if (thresholdStr.startsWith("-")) Long.MaxValue // broadcast disabled ≠ unreadable
      else try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(thresholdStr)
      catch { case _: Exception => 10L * 1024 * 1024 }
    require(delBytes <= threshold,
      s"pending merge-on-read delete files total $delBytes bytes (> $thresholdStr); " +
        "compact the table (full rewrite) before catalog reads, or read through " +
        "Snapshots.read which applies deletes as shuffle anti joins")

    // the read schema must carry every delete key column even when the
    // query pruned it away; the wrapped readers project back down
    val keyCols = snap.deletes.map(_.keyCol).distinct
    val readSchema = StructType(requested.fields ++
      keyCols.filterNot(k => requested.fieldNames.contains(k))
        .map(k => tableSchema(k)))

    // group files into eras by applicable delete set (version scoping,
    // identical to Snapshots.readWithDeletes)
    val eras: Seq[(Seq[String], Seq[DeleteFile])] = snap.files
      .groupBy(f => snap.deletes.filter(d => effVersion(f) < d.coversBelow))
      .toSeq.sortBy(_._2.min).map { case (dels, fs) => (fs, dels) }

    // load each distinct delete-key file once, in catalyst form
    val loaded: Map[String, Set[Any]] = snap.deletes.map(_.path).distinct.map { p =>
      val keyCol = snap.deletes.find(_.path == p).get.keyCol
      val dt = tableSchema(keyCol).dataType
      val conv = CatalystTypeConverters.createToCatalystConverter(dt)
      val vals = spark.read.parquet(p).select(keyCol).collect()
        .map(r => conv(r.get(0))).toSet
      p -> vals
    }.toMap

    val eraScans = eras.map { case (fs, dels) =>
      val b = GraftScans.parquetBuilder(spark, fs, tableSchema, options)
      b.pruneColumns(readSchema)
      val delSets = dels.groupBy(_.keyCol).toSeq.sortBy(_._1).map { case (kc, ds) =>
        MorDeleteSet(readSchema.fieldIndex(kc), tableSchema(kc).dataType,
          ds.flatMap(d => loaded(d.path)).toSet)
      }
      (b.build(), delSets)
    }
    new MorScan(eraScans, requested, readSchema)
  }
}

private[catalog] object MorScanBuilder {
  private val fileVersionRe = """.*/v(\d{8})_[^/]*/.*""".r
  def fileVersion(path: String): Long = path match {
    case fileVersionRe(v) => v.toLong
    case _                => 0L
  }
}

/** The delete-applying scan: per-era delegate parquet scans, rows
  * filtered against the era's delete-key sets, projected back to the
  * requested schema. Row-based (no columnar batches) — the documented
  * transient degrade while deletes are pending. */
private[catalog] class MorScan(eras: Seq[(Scan, Seq[MorDeleteSet])],
    requested: StructType, readSchema: StructType) extends Scan with Batch {

  override def readSchema(): StructType = requested
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-snapshot MOR scan (${eras.size} era(s), delete-applying)"

  override def planInputPartitions(): Array[InputPartition] =
    eras.zipWithIndex.flatMap { case ((scan, _), i) =>
      scan.toBatch.planInputPartitions().map(p => EraPartition(p, i): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val eraFactories = eras.map(_._1.toBatch.createReaderFactory()).toArray
    val eraDeletes = eras.map(_._2.toArray).toArray
    // ordinals of the requested columns inside the (wider) read schema
    val outOrdinals = requested.fields.map(f => readSchema.fieldIndex(f.name))
    val readFields = readSchema.fields
    new MorReaderFactory(eraFactories, eraDeletes, outOrdinals,
      readFields.map(_.dataType), readFields.map(_.nullable))
  }
}

/** A delegate parquet input partition tagged with its delete-era. */
private[catalog] final case class EraPartition(inner: InputPartition, era: Int)
  extends InputPartition

private[catalog] class MorReaderFactory(
    eraFactories: Array[PartitionReaderFactory],
    eraDeletes: Array[Array[MorDeleteSet]],
    outOrdinals: Array[Int], readTypes: Array[DataType],
    readNullable: Array[Boolean]) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (inner, era) = partition match {
      case EraPartition(p, e) => (p, e)
      case other => throw new IllegalStateException(s"unexpected partition $other")
    }
    val delegate = eraFactories(era).createReader(inner)
    val dels = eraDeletes(era)
    val identity = outOrdinals.length == readTypes.length &&
      outOrdinals.zipWithIndex.forall { case (o, i) => o == i }
    val project: InternalRow => InternalRow =
      if (identity) r => r
      else {
        val proj = UnsafeProjection.create(outOrdinals.map(o =>
          BoundReference(o, readTypes(o), readNullable(o))
            .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression]))
        r => proj(r)
      }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (delegate.next()) {
          val row = delegate.get()
          val deleted = dels.exists { d =>
            !row.isNullAt(d.keyOrdinal) &&
              d.keys.contains(row.get(d.keyOrdinal, d.keyType))
          }
          if (!deleted) { current = project(row); return true }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = delegate.close()
    }
  }
}
