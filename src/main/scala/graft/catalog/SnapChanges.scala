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
  *     // data columns + _change_type ('insert' | 'delete')
  *     // + _commit_version + _commit_timestamp
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
  *  - the KEYED-delete delta (a DELETE on a `graft.mor.key` table, or
  *    the delete half of an upsert) → the covered files re-scanned
  *    with the new delete-key sets (lazy [[MorDeleteSet]]s, executor
  *    soft-cached), emitting the previously-VISIBLE rows they hide —
  *    already-hidden rows never re-emit, and an upsert surfaces as
  *    delete + insert in its one commit;
  *  - writer-marked rows-unchanged commits (compaction, DV folds) pass
  *    silently;
  *  - row-changing REWRITES on a `graft.changes.rewriteDiff` table
  *    (r20) scan their PRE-MATERIALIZED `#changes:` sidecars — the
  *    COW writer diffs old vs new state at commit time (multiset
  *    exceptAll, O(touched) sidecar bytes, atomic with the manifest)
  *    and the feed replays the diff verbatim, so a CDC consumer
  *    survives COW DELETE/UPDATE/MERGE — including on partitioned
  *    tables, whose only row-level mode is COW. Rewrites on tables
  *    WITHOUT the property still refuse with a pointer to the
  *    property and the batch row-CDF.
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
  /** Commit wall-clock (micros, from the manifest's `#ts:` header) —
    * the Delta-CDF/Iceberg-changelog parity column downstream CDC
    * consumers key on. Populated at planning time, one metadata read
    * per version step; null only for pre-`#ts` legacy manifests. */
  val CommitTimestampCol = "_commit_timestamp"

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
    StructField(SnapChanges.CommitVersionCol, LongType, nullable = false),
    StructField(SnapChanges.CommitTimestampCol, TimestampType, nullable = true)))

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)

  /** BATCH reads of the feed (r20, Delta's `table_changes` shape):
    * `spark.read.option("startingVersion", s).option("endingVersion",
    * e).table("snap.ns.t.changes")` plans exactly the micro-batch
    * partitions for the version range `(s, e]` — same effects, same
    * schema, no checkpoint. `startingVersion` defaults to 0 (initial
    * snapshot + every retained effect), `endingVersion` to the head. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val full = schema()
    () => new Scan with Batch {
      override def readSchema(): StructType = full
      override def description(): String = s"graft change feed $fullName"
      private lazy val stream = new ChangesMicroBatchStream(root, dataSchema, options)
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val s0 = Option(options.get(GraftMicroBatchStream.StartingVersionOption))
          .map(_.trim.toLong).getOrElse(0L)
        val e = Option(options.get("endingVersion")).map(_.trim.toLong)
          .getOrElse(Snapshots.maxCommitted(root))
        stream.planInputPartitions(VersionOffset(s0), VersionOffset(e))
      }
      override def createReaderFactory(): PartitionReaderFactory =
        stream.createReaderFactory()
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChangesMicroBatchStream(root, dataSchema, options)
    }
  }
}

/** One planned slice of the change feed: delegate parquet partition +
  * the feed semantics to apply.
  *
  *  - kind [[ChangePartition.Insert]]: emit rows NOT hidden at this
  *    version — skip ordinals in `dvBytes` (the version's own
  *    deletion vectors, per-file) and keys in `prevDels` (the keyed
  *    delete sets applicable to this file group).
  *  - kind [[ChangePartition.PosDelta]]: emit ONLY ordinals in
  *    `dvBytes` (the newly-hidden DV delta) — the posdel effects.
  *  - kind [[ChangePartition.KeyDelta]]: emit rows whose key is in
  *    `newDels` but NOT in `prevDels` — the keyed-delete effects
  *    (rows already hidden by an earlier delete never re-emit).
  *    Keyed and positional MOR are mutually exclusive per table, so
  *    this kind never carries a bitmap.
  *
  * Delete sets ride as [[MorDeleteSet]] (lazy path form — each
  * executor loads a set once through the shared soft cache). */
private[catalog] final case class ChangePartition(inner: InputPartition,
  version: Long, changeType: String, dvBytes: Array[Byte],
  kind: Int, newDels: Seq[MorDeleteSet] = Nil,
  prevDels: Seq[MorDeleteSet] = Nil,
  // commit wall-clock micros from the version's #ts header (-1 = none)
  commitTs: Long = -1L) extends InputPartition

private[catalog] object ChangePartition {
  val Insert = 0
  val PosDelta = 1
  val KeyDelta = 2
  /** Pre-materialized effects (`#changes:` sidecars of a rewrite on a
    * `graft.changes.rewriteDiff` table): the delegate partition scans
    * the sidecar parquet itself; `_change_type` comes from its rows. */
  val Materialized = 3
}

private[catalog] class ChangesMicroBatchStream(root: String,
    dataSchema: StructType, options: CaseInsensitiveStringMap)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  private val startingVersion: Long =
    Option(options.get(GraftMicroBatchStream.StartingVersionOption))
      .map(_.trim.toLong).getOrElse(0L)

  private val maxFilesPerTrigger: Option[Int] =
    Option(options.get(GraftMicroBatchStream.MaxFilesOption)).map { s =>
      val n = s.trim.toInt
      require(n > 0, s"${GraftMicroBatchStream.MaxFilesOption} must be positive: $n")
      n
    }

  /** Byte-rate cap, composing with the file cap like the plain source:
    * whole versions admitted until the summed on-disk size of the
    * step's scan set crosses the cap. */
  private val maxBytesPerTrigger: Option[Long] =
    Option(options.get(GraftMicroBatchStream.MaxBytesOption)).map { s =>
      val n = try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s.trim)
      catch { case _: Exception => throw new IllegalArgumentException(
        s"${GraftMicroBatchStream.MaxBytesOption} does not parse as a byte size: $s") }
      require(n > 0, s"${GraftMicroBatchStream.MaxBytesOption} must be positive: $s")
      n
    }

  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(Snapshots.maxCommitted(root))

  override def initialOffset(): Offset = VersionOffset(startingVersion)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toLong)

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty)
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
    else GraftMicroBatchStream.GraftReadLimit(maxFilesPerTrigger, maxBytesPerTrigger)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry point")

  override def reportLatestOffset(): Offset =
    VersionOffset(Snapshots.maxCommitted(root))

  /** Files the feed would SCAN for one version step — the pacing unit
    * (added files, DV-delta files, keyed-delta covered files; the
    * initial chunk counts its full state). Metadata-only. */
  private def stepFiles(s0: Long, v: Long, oldest: Long): Seq[String] =
    if (s0 == 0 && v == oldest) Snapshots.resolveAt(root, oldest).files
    else if (Snapshots.rowsUnchangedAt(root, v)) Nil
    else {
      val cur = Snapshots.resolveAt(root, v)
      // a rewrite with materialized effects scans ONLY its sidecars
      if (cur.changeFiles.nonEmpty) cur.changeFiles
      else {
        val prev = if (v == 1) Snapshot(0, Nil) else Snapshots.resolveAt(root, v - 1)
        val prevF = prev.files.toSet
        val added = cur.files.filterNot(prevF)
        val dvTouched = (cur.posDeletes.keySet ++ prev.posDeletes.keySet)
          .filter(f => cur.posDeletes.getOrElse(f, Nil) != prev.posDeletes.getOrElse(f, Nil))
          .toSeq
        val newDels = cur.deletes.filterNot(prev.deletes.toSet)
        val covered = if (newDels.isEmpty) Nil else prev.files
        added ++ dvTouched ++ covered
      }
    }

  /** Admit whole versions until a cap is crossed — at least one
    * version per batch, so an oversized commit slows the feed instead
    * of stalling it (same rules as the plain streaming source,
    * including the mean-of-siblings estimate for unsizeable files). */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s0 = start.asInstanceOf[VersionOffset].version
    val head = availableNowEnd.getOrElse(Snapshots.maxCommitted(root))
    if (head <= s0) return VersionOffset(s0)
    val (fileCap: Option[Int], byteCap: Option[Long]) = limit match {
      case g: GraftMicroBatchStream.GraftReadLimit => (g.maxFiles, g.maxBytes)
      case f: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        (Some(f.maxFiles()), None)
      case _ => (None, None)
    }
    if (fileCap.isEmpty && byteCap.isEmpty) VersionOffset(head)
    else {
      val oldest = Snapshots.minCommitted(root)
      var end = s0
      var count = 0
      var bytes = 0L
      var full = false
      var v = if (s0 == 0) oldest else s0 + 1
      while (!full && v <= head) {
        val fs = stepFiles(s0, v, oldest)
        val emitBytes =
          if (byteCap.isEmpty) 0L
          else {
            val sized = fs.map { f =>
              try Some(java.nio.file.Files.size(java.nio.file.Paths.get(f)))
              catch { case _: Exception => None }
            }
            val known = sized.flatten
            val est =
              if (known.nonEmpty) math.max(1L, known.sum / known.size)
              else byteCap.get
            sized.map(_.getOrElse(est)).sum
          }
        val over = fileCap.exists(c => count + fs.size > c) ||
          byteCap.exists(b => bytes + emitBytes > b)
        if (end > s0 && over) full = true
        else { end = v; count += fs.size; bytes += emitBytes; v += 1 }
      }
      VersionOffset(end)
    }
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  private val rowIdxField = StructField(GraftRowId.RowIdxTmp, LongType, nullable = true)

  /** Scan over exactly `files`, requesting the data columns plus the
    * generated row-ordinal column (same planning path as a batch read
    * of the slice). PARTITIONED/LAYOUT tables serve too (r20): the
    * per-slice index re-attaches path-only partition values and parses
    * synthetic bucket/transform segments exactly like the plain
    * streaming source, and the feed's readers remap the scan's output
    * BY NAME (a partition-aware scan reorders partition columns last —
    * see [[scanOutSchema]]), so no column can ever mis-map. */
  private def scanOver(files: Seq[String]): Scan = {
    val props = GraftTable.readMeta(root).map(_._2).getOrElse(Map.empty)
    val phys = GraftTable.physOf(props)
    require(phys.isEmpty,
      s"the change feed of $root is unsupported while re-added columns " +
        s"(${phys.keys.mkString(", ")}) carry a physical-name remap")
    val b = GraftScans.parquetBuilder(spark,
      files, StructType(dataSchema.fields :+ rowIdxField), options,
      partSchema = GraftMicroBatchStream.layoutPartSchema(root, dataSchema))
    b.pruneColumns(StructType(dataSchema.fields :+ rowIdxField))
    b.build()
  }

  /** The scan's OUTPUT order — `readSchema()` of the planned scan,
    * which differs from the requested order on partitioned tables
    * (path-served columns re-attach last). File-list independent:
    * determined by the schema split alone. */
  private lazy val scanOutSchema: StructType = scanOver(Nil).readSchema()

  /** Scan over a rewrite's `#changes:` sidecar parquet: the table's
    * data columns plus the per-row `_change_type` — FLAT files (the
    * diff materializes partition values as ordinary columns), so no
    * partition index and no row ordinal. */
  private def scanEffects(files: Seq[String]): Scan = {
    val schema = StructType(dataSchema.fields :+
      StructField(SnapChanges.ChangeTypeCol, StringType, nullable = false))
    val b = GraftScans.parquetBuilder(spark, files, schema, options)
    b.pruneColumns(schema)
    b.build()
  }

  private lazy val matOutSchema: StructType = scanEffects(Nil).readSchema()

  private def bitmapsOf(snap: Snapshot, file: String): Option[org.roaringbitmap.RoaringBitmap] =
    snap.posDeletes.get(file).map(pfs =>
      DeleteVectors.loadBitmaps(pfs)
        .getOrElse(file, new org.roaringbitmap.RoaringBitmap))

  private def serialize(bm: org.roaringbitmap.RoaringBitmap): Array[Byte] = {
    // clone before the optimizing mutation: the insert path hands in
    // loadBitmaps' JVM-shared cached instance, which concurrent
    // same-JVM readers probe (RoaringBitmap is not thread-safe under
    // mutation)
    val own = bm.clone()
    own.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    own.serialize(new java.io.DataOutputStream(bos))
    bos.toByteArray
  }

  /** The keyed delete sets in `dels` applicable to file `f` under the
    * MOR scoping rule (a delete covers files staged strictly before
    * its cover version), as plan-serializable lazy [[MorDeleteSet]]s
    * grouped by key-column tuple. Key columns must resolve in the
    * CURRENT data schema (a renamed-away key spelling refuses toward
    * the batch row-CDF, which owns the ledger indirection). */
  private def applicableSets(snap: Snapshot, f: String,
      dels: Seq[Snapshots.DeleteFile]): Seq[MorDeleteSet] = {
    def effVersion(p: String): Long =
      snap.fileSeq.getOrElse(p, MorScanBuilder.fileVersion(p))
    val applicable = dels.filter(d => effVersion(f) < d.coversBelow)
    applicable.groupBy(_.keyCols).toSeq.sortBy(_._1.mkString(","))
      .map { case (kcs, group) =>
        kcs.foreach(k => require(dataSchema.fieldNames.contains(k),
          s"the change feed of $root cannot resolve delete-key column " +
            s"'$k' in the current schema (renamed or dropped) — consume " +
            "batch readChangesRows, which resolves the rename ledgers"))
        // key ordinals index the SCAN's output row (partition-aware
        // scans re-order path-served columns last) — resolved by name
        MorDeleteSet(kcs.map(scanOutSchema.fieldIndex),
          kcs.map(k => dataSchema(k).dataType),
          inline = None, paths = group.map(_.path).sorted, keyNames = kcs)
      }
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
    // commit wall-clock per version step, one metadata read
    def tsOf(v: Long): Long = Snapshots.commitTimestamp(root, v).getOrElse(-1L)
    // inserts of one version: the version's VISIBLE rows of `files` —
    // ordinals its own DVs hide and keys its applicable delete sets
    // hide are skipped, so the feed never resurrects a hidden row
    def insertsOf(v: Long, snap: Snapshot, files: Seq[String]): Unit = {
      val ts = tsOf(v)
      val byDels = files.groupBy(f => applicableSets(snap, f, snap.deletes))
      byDels.toSeq.sortBy(_._2.head).foreach { case (dels, fs) =>
        val (withDv, plain) = fs.partition(snap.posDeletes.contains)
        if (plain.nonEmpty)
          scanOver(plain).toBatch.planInputPartitions().foreach(p =>
            out += ChangePartition(p, v, "insert", Array.empty,
              ChangePartition.Insert, prevDels = dels, commitTs = ts))
        // a DV-covered file plans ALONE so its partitions bind to one bitmap
        withDv.foreach { f =>
          val bm = bitmapsOf(snap, f).getOrElse(new org.roaringbitmap.RoaringBitmap)
          scanOver(Seq(f)).toBatch.planInputPartitions().foreach(p =>
            out += ChangePartition(p, v, "insert", serialize(bm),
              ChangePartition.Insert, prevDels = dels, commitTs = ts))
        }
      }
    }
    // initial chunk: the oldest retained state, all insert, pending
    // deletes (vectors AND keyed sets) applied
    if (s0 == 0)
      insertsOf(oldest, Snapshots.resolveAt(root, oldest),
        Snapshots.resolveAt(root, oldest).files)
    ((from + 1) to e).foreach { v =>
      if (!Snapshots.rowsUnchangedAt(root, v)) {
        val cur = Snapshots.resolveAt(root, v)
        val prev = if (v == 1) Snapshot(0, Nil) else Snapshots.resolveAt(root, v - 1)
        val ts = tsOf(v) // one metadata read per version, not per group
        val prevF = prev.files.toSet
        val curF = cur.files.toSet
        val added = cur.files.filterNot(prevF)
        val removed = prev.files.exists(!curF(_))
        if (cur.changeFiles.nonEmpty) {
          // a rewrite on a `graft.changes.rewriteDiff` table: the
          // commit's row-level effects are PRE-MATERIALIZED sidecars —
          // scan them verbatim (the diff already IS insert+delete
          // rows; planning the rewrite's own files would re-emit every
          // survivor). O(touched rows), never O(table).
          scanEffects(cur.changeFiles).toBatch.planInputPartitions().foreach(p =>
            out += ChangePartition(p, v, "", Array.empty,
              ChangePartition.Materialized, commitTs = ts))
        } else {
        require(!removed,
          s"version $v of $root is a rewrite commit (files replaced) on a " +
            s"table without '${GraftTable.rewriteDiffProp}'; set the " +
            "property to materialize rewrite diffs, or consume batch " +
            "readChangesRows")
        insertsOf(v, cur, added)
        // KEYED-delete delta (DELETE on a graft.mor.key table, or the
        // delete half of an upsert): emit the previously-VISIBLE rows
        // of covered files whose key the new sets hide — scoped per
        // file group, already-hidden rows never re-emit
        val newDels = cur.deletes.filterNot(prev.deletes.toSet)
        if (newDels.nonEmpty) {
          prevF.toSeq.sorted
            .map(f => f -> (applicableSets(cur, f, newDels),
              applicableSets(prev, f, prev.deletes)))
            .filter(_._2._1.nonEmpty)
            .groupBy(_._2).foreach { case ((newSets, prevSets), pairs) =>
              val fs = pairs.map(_._1)
              scanOver(fs).toBatch.planInputPartitions().foreach(p =>
                out += ChangePartition(p, v, "delete", Array.empty,
                  ChangePartition.KeyDelta, newDels = newSets,
                  prevDels = prevSets, commitTs = ts))
            }
        }
        // POSITION-delete delta: newly hidden ordinals per file
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
              out += ChangePartition(p, v, "delete", serialize(delta),
                ChangePartition.PosDelta, commitTs = ts))
        }
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

  /** Sibling factory for the materialized-effects sidecar scans
    * (different schema: data columns + `_change_type`, no ordinal). */
  private lazy val matFactory: PartitionReaderFactory =
    scanEffects(Nil).toBatch.createReaderFactory()

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangesReaderFactory(innerFactory, dataSchema.fields.map(_.dataType),
      // NAME-BASED source mapping (r20): position of each output column
      // — and of the generated row ordinal — in the scan's output row,
      // so a partition-reordered scan can never mis-map a column
      srcOrdinals = dataSchema.fieldNames.map(scanOutSchema.fieldIndex),
      ordIdx = scanOutSchema.fieldIndex(GraftRowId.RowIdxTmp),
      mat = matFactory,
      matSrcOrdinals = dataSchema.fieldNames.map(matOutSchema.fieldIndex),
      matTypeIdx = matOutSchema.fieldIndex(SnapChanges.ChangeTypeCol))

  override def toString: String = s"ChangesMicroBatchStream($root)"
}

private[catalog] class ChangesReaderFactory(inner: PartitionReaderFactory,
    dataTypes: Array[DataType],
    // source position of each emitted column / of the row ordinal in
    // the delegate's output row (name-resolved at planning — partition-
    // aware scans serve path columns last)
    srcOrdinals: Array[Int], ordIdx: Int,
    // the materialized-sidecar twin: its factory, its column mapping,
    // and the position of the per-row `_change_type`
    mat: PartitionReaderFactory, matSrcOrdinals: Array[Int],
    matTypeIdx: Int) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val cp = partition.asInstanceOf[ChangePartition]
    val n = dataTypes.length
    if (cp.kind == ChangePartition.Materialized) {
      // sidecar rows ARE the effects — copy by name, type from the row
      val delegate = mat.createReader(cp.inner)
      return new PartitionReader[InternalRow] {
        private var current: InternalRow = _
        override def next(): Boolean = {
          if (!delegate.next()) return false
          val row = delegate.get()
          val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(n + 3)
          var i = 0
          while (i < n) {
            val src = matSrcOrdinals(i)
            out.update(i, if (row.isNullAt(src)) null else row.get(src, dataTypes(i)))
            i += 1
          }
          out.update(n, row.getUTF8String(matTypeIdx).copy())
          out.update(n + 1, cp.version)
          out.update(n + 2, if (cp.commitTs < 0L) null else cp.commitTs)
          current = out
          true
        }
        override def get(): InternalRow = current
        override def close(): Unit = delegate.close()
      }
    }
    val delegate = inner.createReader(cp.inner)
    val bm =
      if (cp.dvBytes.isEmpty) None
      else {
        val b = new org.roaringbitmap.RoaringBitmap()
        b.deserialize(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(cp.dvBytes)))
        Some(b)
      }
    // resolve each group's key set ONCE per task (executor soft cache)
    val newKeySets = cp.newDels.map(_.keys)
    val prevKeySets = cp.prevDels.map(_.keys)
    def keyHit(row: InternalRow, dels: Seq[MorDeleteSet],
        sets: Seq[scala.collection.immutable.Set[Any]]): Boolean = {
      var i = 0
      while (i < dels.length) {
        val k = dels(i).keyOf(row)
        if (k != null && sets(i).contains(k)) return true
        i += 1
      }
      false
    }
    val typeUtf8 = org.apache.spark.unsafe.types.UTF8String.fromString(cp.changeType)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (delegate.next()) {
          val row = delegate.get()
          val ord = if (row.isNullAt(ordIdx)) -1L else row.getLong(ordIdx)
          val dvHit = bm.exists(b =>
            ord >= 0L && ord <= Int.MaxValue && b.contains(ord.toInt))
          val emit = cp.kind match {
            // the version's visible rows: not DV-hidden, not key-hidden
            case ChangePartition.Insert =>
              !dvHit && !keyHit(row, cp.prevDels, prevKeySets)
            // exactly the newly-hidden ordinals
            case ChangePartition.PosDelta => dvHit
            // newly key-hidden rows that were previously visible
            case ChangePartition.KeyDelta =>
              keyHit(row, cp.newDels, newKeySets) &&
                !keyHit(row, cp.prevDels, prevKeySets)
            case other => throw new IllegalStateException(
              s"unknown change-partition kind $other")
          }
          if (emit) {
            val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(n + 3)
            var i = 0
            while (i < n) {
              val src = srcOrdinals(i)
              out.update(i, if (row.isNullAt(src)) null else row.get(src, dataTypes(i)))
              i += 1
            }
            out.update(n, typeUtf8)
            out.update(n + 1, cp.version)
            out.update(n + 2, if (cp.commitTs < 0L) null else cp.commitTs)
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
