package graft.catalog

import graft.sources.{DeleteVectors, Snapshots}
import graft.sources.Snapshots.Snapshot
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STREAMING CHANGE FEED over a snapshot-catalog table — the surface
  * that lets a CDC consumer survive a GDPR (position) delete without a
  * manual skip:
  *
  * {{{
  *   spark.readStream.table("snap.default.t.changes")
  *     // data columns + _change_type ('insert' | 'delete') + _commit_version
  * }}}
  *
  * The r18 streaming source classifies a position-delete commit as a
  * change commit and REFUSES it (an append-row stream cannot express a
  * removal). This table CAN: its rows are row-level effects, so a
  * posdel commit surfaces exactly the rows its deletion vectors newly
  * hid, tagged `delete` — the streaming twin of the batch row-CDF
  * ([[Snapshots.readChangesRows]]).
  *
  * Per version step the micro-batch plans, metadata-only:
  *  - the ADDED files → their rows as `insert` (the append path;
  *    initial-snapshot files with pending deletion vectors scan with
  *    the row-ordinal column and SKIP the already-hidden ordinals, so
  *    the feed never resurrects a deleted row);
  *  - the DV DELTA per affected file (bitmaps(v) andNot bitmaps(v-1),
  *    a driver-side bitmap subtraction on kilobyte sidecars) → those
  *    files re-scanned with the generated row-ordinal column, EMITTING
  *    ONLY the newly-hidden ordinals as `delete` — O(affected files)
  *    I/O, never O(table);
  *  - writer-marked rows-unchanged commits (compaction, DV folds) pass
  *    silently; equality-delete / unmarked-rewrite commits refuse with
  *    a pointer to the batch row-CDF (which handles them keyed).
  *
  * DV-carrying scans plan per file so every partition's ordinals bind
  * to one bitmap; ordinals come from the parquet readers' generated
  * row-index column — exact under file splits. Offsets are committed
  * versions ([[VersionOffset]]), replay-deterministic like the plain
  * streaming source. */
private[catalog] object SnapChanges {
  val kind = "changes"
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  def table(fullName: String, root: String): Table =
    new ChangesTable(fullName, root)
}

private[catalog] class ChangesTable(fullName: String, root: String)
  extends Table with SupportsRead {

  private lazy val dataSchema: StructType =
    new GraftTable(fullName, root, None).schema()

  override def name(): String = fullName

  override def schema(): StructType = StructType(dataSchema.fields ++ Seq(
    StructField(SnapChanges.ChangeTypeCol, StringType, nullable = false),
    StructField(SnapChanges.CommitVersionCol, LongType, nullable = false)))

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val full = schema()
    () => new Scan {
      override def readSchema(): StructType = full
      override def description(): String = s"graft change feed $fullName"
      override def toBatch: Batch = throw new UnsupportedOperationException(
        s"$fullName is a STREAMING change feed — batch change queries go " +
          "through Snapshots.readChanges (file-level) / readChangesRows " +
          "(row-level, rewrite-spanning)")
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChangesMicroBatchStream(root, dataSchema, options)
    }
  }
}

/** One planned slice of the change feed: delegate parquet partition +
  * the feed semantics to apply. `dvBytes` is the serialized roaring
  * bitmap bound to this partition's single file (empty = none);
  * `emitMatching` true = emit ONLY ordinals in the bitmap (the delete
  * rows), false = emit everything NOT in it (inserts, skipping
  * already-hidden ordinals). */
private[catalog] final case class ChangePartition(inner: InputPartition,
  version: Long, changeType: String, dvBytes: Array[Byte],
  emitMatching: Boolean) extends InputPartition

private[catalog] class ChangesMicroBatchStream(root: String,
    dataSchema: StructType, options: CaseInsensitiveStringMap)
  extends MicroBatchStream {

  private def spark = SparkSession.active

  private val startingVersion: Long =
    Option(options.get(GraftMicroBatchStream.StartingVersionOption))
      .map(_.trim.toLong).getOrElse(0L)

  override def initialOffset(): Offset = VersionOffset(startingVersion)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toLong)

  override def latestOffset(): Offset =
    VersionOffset(Snapshots.maxCommitted(root))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  private val rowIdxField = StructField(GraftRowId.RowIdxTmp, LongType, nullable = true)

  /** Scan over exactly `files`, requesting the data columns plus the
    * generated row-ordinal column (same planning path as a batch read
    * of the slice). Tables whose files carry path-only columns or
    * synthetic layout segments (identity PARTITIONED BY, live or
    * retired bucket/transform layouts) refuse: the feed's readers copy
    * by position over the flat data schema, and a partition-aware scan
    * re-orders partition columns last — serve those through the batch
    * row-CDF instead. (Positional MOR — the feed's delete source —
    * never composes with layouts, so the refusal costs the posdel
    * consumer nothing.) */
  private def scanOver(files: Seq[String]): Scan = {
    val props = GraftTable.readMeta(root).map(_._2).getOrElse(Map.empty)
    val phys = GraftTable.physOf(props)
    require(phys.isEmpty,
      s"the change feed of $root is unsupported while re-added columns " +
        s"(${phys.keys.mkString(", ")}) carry a physical-name remap")
    require(GraftTable.partColsOf(props).isEmpty &&
      SnapBucket.of(props).isEmpty && SnapBucket.ofRetired(props).isEmpty &&
      SnapTransform.of(props).isEmpty && SnapTransform.ofRetired(props).isEmpty,
      s"the change feed of $root does not serve partitioned/layout tables " +
        "yet — consume Snapshots.readChanges / readChangesRows in batch")
    val b = GraftScans.parquetBuilder(spark,
      files, StructType(dataSchema.fields :+ rowIdxField), options)
    b.pruneColumns(StructType(dataSchema.fields :+ rowIdxField))
    b.build()
  }

  private def bitmapsOf(snap: Snapshot, file: String): Option[org.roaringbitmap.RoaringBitmap] =
    snap.posDeletes.get(file).map(pfs =>
      DeleteVectors.loadBitmaps(pfs)
        .getOrElse(file, new org.roaringbitmap.RoaringBitmap))

  private def serialize(bm: org.roaringbitmap.RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    bm.serialize(new java.io.DataOutputStream(bos))
    bos.toByteArray
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[VersionOffset].version
    val e = end.asInstanceOf[VersionOffset].version
    if (e <= s0) return Array.empty
    val oldest = Snapshots.minCommitted(root)
    require(oldest > 0, s"no committed snapshot under $root")
    require(s0 == 0 || s0 >= oldest,
      s"change-feed offset $s0 of $root is beyond retention (oldest " +
        s"retained version is $oldest) — restart from a fresh checkpoint")
    val from = if (s0 == 0) oldest else s0
    val out = Seq.newBuilder[InputPartition]
    def insertsOf(v: Long, snap: Snapshot, files: Seq[String]): Unit = {
      val (withDv, plain) = files.partition(snap.posDeletes.contains)
      if (plain.nonEmpty)
        scanOver(plain).toBatch.planInputPartitions().foreach(p =>
          out += ChangePartition(p, v, "insert", Array.empty, emitMatching = false))
      // a DV-covered file plans ALONE so its partitions bind to one bitmap
      withDv.foreach { f =>
        val bm = bitmapsOf(snap, f).getOrElse(new org.roaringbitmap.RoaringBitmap)
        scanOver(Seq(f)).toBatch.planInputPartitions().foreach(p =>
          out += ChangePartition(p, v, "insert", serialize(bm), emitMatching = false))
      }
    }
    // initial chunk: the oldest retained state, all insert (deletion
    // vectors applied; keyed pending deletes refuse — they are the
    // batch row-CDF's job)
    if (s0 == 0) {
      val snap0 = Snapshots.resolveAt(root, oldest)
      require(snap0.deletes.isEmpty,
        s"the initial snapshot of $root carries pending KEYED merge-on-read " +
          "deletes; compact first, or consume batch readChangesRows")
      insertsOf(oldest, snap0, snap0.files)
    }
    ((from + 1) to e).foreach { v =>
      if (!Snapshots.rowsUnchangedAt(root, v)) {
        val cur = Snapshots.resolveAt(root, v)
        val prev = if (v == 1) Snapshot(0, Nil) else Snapshots.resolveAt(root, v - 1)
        val prevF = prev.files.toSet
        val curF = cur.files.toSet
        val added = cur.files.filterNot(prevF)
        val removed = prev.files.exists(!curF(_))
        val newKeyedDel = cur.deletes.exists(!prev.deletes.toSet(_))
        require(!removed && !newKeyedDel,
          s"version $v of $root is a rewrite or keyed-delete commit; the " +
            "streaming change feed covers appends and position deletes — " +
            "row-level effects across rewrites are batch readChangesRows' job")
        insertsOf(v, cur, added)
        // the position-delete delta: newly hidden ordinals per file
        val dvTouched = (cur.posDeletes.keySet ++ prev.posDeletes.keySet)
          .filter(f => curF(f) && prevF(f))
          .filter(f => cur.posDeletes.getOrElse(f, Nil) != prev.posDeletes.getOrElse(f, Nil))
          .toSeq.sorted
        dvTouched.foreach { f =>
          val curBm = bitmapsOf(cur, f).getOrElse(new org.roaringbitmap.RoaringBitmap)
          val prevBm = bitmapsOf(prev, f).getOrElse(new org.roaringbitmap.RoaringBitmap)
          val delta = org.roaringbitmap.RoaringBitmap.andNot(curBm, prevBm)
          if (!delta.isEmpty)
            scanOver(Seq(f)).toBatch.planInputPartitions().foreach(p =>
              out += ChangePartition(p, v, "delete", serialize(delta), emitMatching = true))
        }
      }
    }
    out.result().toArray
  }

  /** One parquet reader factory (schema + conf only, file-list
    * independent) serves every partition; the wrapper applies the
    * partition's bitmap rule and appends the change columns. */
  private lazy val innerFactory: PartitionReaderFactory = {
    val head = Snapshots.resolve(root).map(_.files).getOrElse(Nil)
    scanOver(head).toBatch.createReaderFactory()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangesReaderFactory(innerFactory, dataSchema.fields.map(_.dataType))

  override def toString: String = s"ChangesMicroBatchStream($root)"
}

private[catalog] class ChangesReaderFactory(inner: PartitionReaderFactory,
    dataTypes: Array[DataType]) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val cp = partition.asInstanceOf[ChangePartition]
    val delegate = inner.createReader(cp.inner)
    val n = dataTypes.length
    val bm =
      if (cp.dvBytes.isEmpty) None
      else {
        val b = new org.roaringbitmap.RoaringBitmap()
        b.deserialize(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(cp.dvBytes)))
        Some(b)
      }
    val typeUtf8 = org.apache.spark.unsafe.types.UTF8String.fromString(cp.changeType)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (delegate.next()) {
          val row = delegate.get()
          val ord = if (row.isNullAt(n)) -1L else row.getLong(n)
          val hit = bm.exists(b =>
            ord >= 0L && ord <= Int.MaxValue && b.contains(ord.toInt))
          if (hit == cp.emitMatching) {
            val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(n + 2)
            var i = 0
            while (i < n) {
              out.update(i, if (row.isNullAt(i)) null else row.get(i, dataTypes(i)))
              i += 1
            }
            out.update(n, typeUtf8)
            out.update(n + 1, cp.version)
            current = out
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = delegate.close()
    }
  }
}
