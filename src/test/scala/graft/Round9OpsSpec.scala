package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Round-9 items: the snapshot-commit protocol (atomicity under
  * interleaved readers, orphan invisibility, retention), the
  * table_commit_swap maintenance cycle's physical shape, and the
  * measured read-side pruning effect of the layout family.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = Qx.tmpOut(name, sf())
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      } finally walk.close()
    }
    root
  }

  private def writeTagged(out: String, tag: Int, rows: Long): Unit =
    spark.range(rows).select(lit(tag).as("tag"), $"id")
      .write.mode("append").parquet(out)

  test("snapshot commit: pinned reader sees all-old, fresh resolve all-new, never a mix") {
    val root = freshRoot("snapspec")
    assert(Snapshots.resolve(root).isEmpty)
    val v1 = Snapshots.commit(root)(writeTagged(_, tag = 1, rows = 100))
    assert(v1 == 1L)
    val snap1 = Snapshots.resolve(root).get
    val pinned = spark.read.parquet(snap1.files: _*) // reader pins v1
    // the rewrite lands UNDER the pinned reader
    val v2 = Snapshots.commit(root)(writeTagged(_, tag = 2, rows = 60))
    assert(v2 == 2L)
    // fresh resolve: all-new — count, content, and file locations
    val head = Snapshots.resolve(root).get
    assert(head.version == 2L)
    val fresh = spark.read.parquet(head.files: _*)
    assert(fresh.count() == 60 && fresh.filter($"tag" =!= 2).count() == 0)
    val v2dir = Snapshots.versionDir(root, 2L)
    assert(fresh.inputFiles.forall(_.contains(v2dir)),
      s"head read must touch only $v2dir files: ${fresh.inputFiles.toSeq}")
    // pinned reader: STILL all-old — the commit moved no old file
    assert(pinned.count() == 100 && pinned.filter($"tag" =!= 1).count() == 0)
  }

  test("uncommitted staging data is invisible and reclaimed by the next commit") {
    val root = freshRoot("snaporphan")
    Snapshots.commit(root)(writeTagged(_, tag = 1, rows = 10))
    // a crashed writer's orphan: data files at v2, no manifest
    writeTagged(Snapshots.versionDir(root, 2L), tag = 99, rows = 5)
    val head = Snapshots.resolve(root).get
    assert(head.version == 1L, "an uncommitted version must not resolve")
    assert(spark.read.parquet(head.files: _*)
      .filter($"tag" === 99).count() == 0)
    // the next commit reclaims the orphan dir and publishes cleanly
    val v = Snapshots.commit(root)(writeTagged(_, tag = 2, rows = 7))
    assert(v == 2L)
    val df = Snapshots.read(spark, root)
    assert(df.count() == 7 && df.filter($"tag" =!= 2).count() == 0,
      "orphan rows must never leak into the committed version")
  }

  test("a reader interleaved with repeated commits never observes a mixed snapshot") {
    val root = freshRoot("snaprace")
    Snapshots.commit(root)(writeTagged(_, tag = 1, rows = 10))
    // writer thread: versions 2..6, tag t with exactly t*10 rows
    val writer = new Thread(() =>
      (2 to 6).foreach(t => Snapshots.commit(root)(writeTagged(_, t, t * 10L))))
    writer.setDaemon(true)
    writer.start()
    var checks = 0
    while (writer.isAlive || checks == 0) {
      val snap = Snapshots.resolve(root).get
      val rows = spark.read.parquet(snap.files: _*).collect()
      val tags = rows.map(_.getInt(0)).distinct.toSeq
      assert(tags.length == 1,
        s"mixed snapshot observed at v${snap.version}: tags $tags")
      assert(rows.length == tags.head * 10,
        s"torn file set at v${snap.version}: ${rows.length} rows for tag ${tags.head}")
      checks += 1
    }
    writer.join()
    assert(checks > 0 && Snapshots.maxCommitted(root) == 6L)
  }

  test("time travel: historical versions stay exact under append commits; retention bounds history, never the head") {
    val root = freshRoot("snaptime")
    val v1 = Snapshots.commit(root)(writeTagged(_, tag = 1, rows = 10))
    val v2 = Snapshots.commitAppend(root)(writeTagged(_, tag = 2, rows = 5))
    val v3 = Snapshots.commitAppend(root)(writeTagged(_, tag = 3, rows = 2))
    assert((v1, v2, v3) == (1L, 2L, 3L))
    // an append manifest carries the parent's files forward verbatim
    assert(Snapshots.resolveAt(root, v2).files.toSet
      .subsetOf(Snapshots.resolveAt(root, v3).files.toSet))
    assert(Snapshots.readAt(spark, root, v1).count() == 10)
    assert(Snapshots.readAt(spark, root, v2).count() == 15)
    assert(Snapshots.read(spark, root).count() == 17)
    // never committed / beyond head: a clear error, not an empty read
    intercept[IllegalStateException](Snapshots.readAt(spark, root, 9L))
    // vacuum to the head only: history beyond retention raises, but the
    // head keeps ALL its rows — including those whose files physically
    // live in v1's dir (reference-aware vacuum must not delete them)
    Snapshots.vacuum(root, keepLast = 1)
    intercept[IllegalStateException](Snapshots.readAt(spark, root, v1))
    val head = Snapshots.read(spark, root)
    assert(head.count() == 17,
      "vacuum deleted files still referenced by the head's append manifest")
    assert(head.select($"tag").distinct().count() == 3)
  }

  test("incremental read surfaces exactly the appended delta via a metadata-only manifest diff") {
    val root = freshRoot("snapdelta")
    val v1 = Snapshots.commit(root)(writeTagged(_, tag = 1, rows = 10))
    Snapshots.commitAppend(root)(writeTagged(_, tag = 2, rows = 5))
    val v3 = Snapshots.commitAppend(root)(writeTagged(_, tag = 3, rows = 2))
    val delta = Snapshots.readChanges(spark, root, v1, v3)
    assert(delta.count() == 7 && delta.filter($"tag" === 1).count() == 0,
      "the (v1, v3] delta must hold only tags 2 and 3")
    // the delta read plans over ONLY post-v1 files — the base is
    // neither re-listed nor re-scanned
    val v1dir = Snapshots.versionDir(root, v1)
    assert(delta.inputFiles.forall(!_.contains(v1dir)),
      s"delta read touched base files: ${delta.inputFiles.toSeq}")
    // fromVersion = 0 means "since the beginning" = the whole head
    assert(Snapshots.readChanges(spark, root, 0L, v3).count() == 17)
    // empty range is a degenerate but valid feed
    assert(Snapshots.changedFiles(root, v3, v3).isEmpty)
  }

  test("vacuum retains the newest K versions and reclaims the rest") {
    val root = freshRoot("snapvac")
    (1 to 5).foreach(t => Snapshots.commit(root)(writeTagged(_, t, 10L)))
    Snapshots.vacuum(root, keepLast = 2)
    (1L to 3L).foreach { v =>
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(Snapshots.versionDir(root, v))),
        s"v$v data must be reclaimed")
    }
    (4L to 5L).foreach { v =>
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(Snapshots.versionDir(root, v))),
        s"v$v must survive keepLast=2")
    }
    val df = Snapshots.read(spark, root)
    assert(Snapshots.maxCommitted(root) == 5L && df.count() == 10)
  }

  test("table_commit_swap: head resolves to <=4 compacted files, previous version holds the 8 fragments") {
    import graft.operators.WarehouseOps
    val dir = sf("0.01")
    assert(WarehouseOps.tableCommitSwap(spark, dir).collect().nonEmpty)
    val root = Qx.tmpOut("snaptbl", dir)
    val head = Snapshots.resolve(root).get
    assert(head.files.length <= 4,
      s"compacted head must be bin-packed: ${head.files.length} files")
    val headDir = Snapshots.versionDir(root, head.version)
    assert(head.files.forall(_.startsWith(headDir)))
    // the fragmented state is the immediately preceding version
    val prev = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      root, "_commits", f"${head.version - 1}%08d.manifest"))
    assert(prev.size >= 8,
      s"fragmented version must keep its delta files: ${prev.size}")
  }

  test("scd2Stream: conflicting-value redelivery is a violation, drop mode side-drops with a count") {
    import graft.streaming.StreamRunner
    import graft.streaming.StreamRunner.Ev
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def ts(minute: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
    // strict mode: a same-(ts,event_id) arrival with a DIFFERENT value
    // is a contradictory correction, not an idempotent redelivery
    val ms1 = MemoryStream[Ev]
    val q1 = StreamRunner.scd2Stream(ms1.toDS())
      .writeStream.format("memory").queryName("scd2conflict")
      .outputMode("append").start()
    try {
      ms1.addData(Seq(Ev(2L, ts(10), 1L, "purchase", 1.0)))
      q1.processAllAvailable()
      ms1.addData(Seq(Ev(2L, ts(10), 1L, "purchase", 9.9))) // value conflict
      val ex = intercept[Exception] { q1.processAllAvailable() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("CONFLICTING value")), s"got: $ex")
    } finally q1.stop()
    // drop mode: the same violations are side-dropped with a signal
    // (accumulator) and the stream keeps running correctly
    val droppedAcc = spark.sparkContext.longAccumulator("scd2LateDropped")
    val ms2 = MemoryStream[Ev]
    val q2 = StreamRunner.scd2Stream(ms2.toDS(),
        dropLateViolations = true, dropped = Some(droppedAcc))
      .writeStream.format("memory").queryName("scd2drop")
      .outputMode("append").start()
    try {
      ms2.addData(Seq(Ev(5L, ts(10), 7L, "purchase", 1.0)))
      q2.processAllAvailable()
      // strictly-earlier arrival AND a conflicting redelivery: both drop
      ms2.addData(Seq(
        Ev(4L, ts(5), 7L, "purchase", 2.0),
        Ev(5L, ts(10), 7L, "purchase", 3.3)))
      q2.processAllAvailable()
      // a legitimate later change still seals the open version
      ms2.addData(Seq(Ev(6L, ts(20), 7L, "purchase", 4.0)))
      q2.processAllAvailable()
      assert(droppedAcc.value == 2, s"expected 2 drops, got ${droppedAcc.value}")
      val rows = spark.table("scd2drop").collect()
      assert(rows.length == 1 && rows(0).getLong(1) == 5L &&
        rows(0).getDouble(2) == 1.0,
        s"surviving interval must be the original open version: ${rows.toSeq}")
    } finally q2.stop()
  }

  test("ewma with an all-null window is NULL, never 0/0") {
    import graft.operators.Windows
    val df = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Option.empty[Double]),
      (1L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), Some(4.0)))
      .toDF("user_id", "event_id", "ts", "value")
    val rows = Windows.ewma8(df).select($"event_id", $"ewma8").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(1),
      s"first event with NULL value must yield NULL ewma, got ${rows(0)}")
    // second row: value present, one null lag — renormalized over j=0
    assert(math.abs(rows(1).getDouble(1) - 4.0) < 1e-12)
  }

  /** Rows surfaced by the parquet SCAN node itself (before Spark's
    * residual FilterExec) — row-group/page pruning from the pushed
    * predicate is exactly what this metric measures. */
  private def scanOutputRows(path: String): Long = {
    val df = spark.read.parquet(path)
      .filter($"l_partkey" >= 20 && $"l_partkey" < 120 &&
        $"l_suppkey" >= 2 && $"l_suppkey" < 8)
    df.collect() // execute THIS plan so its metrics populate
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        flatten(q.plan)
      case _ => p.children.flatMap(flatten)
    })
    val scans = flatten(df.queryExecution.executedPlan)
      .filter(p => p.children.isEmpty && p.metrics.contains("numOutputRows"))
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("TopKPerGroup heap overflow degrades to the spillable sort shape, not an error") {
    import graft.plans.TopK
    val docs = Tables.load(spark, sf("0.01"), "documents")
      .select($"doc_id", $"lang", $"n_chars") // ~2000 groups at k=1
    def topkPerDoc = TopK.perGroup(docs, 1, Seq("doc_id"), Seq(("n_chars", true)))
    val want = topkPerDoc.collect().map(_.toSeq).sortBy(_.toString)
    assert(want.length > 100)
    try {
      // force the overflow on every final task; default policy = sort
      spark.conf.set(TopK.MaxFinalHeapRowsKey, "100")
      val df = topkPerDoc
      val got = df.collect().map(_.toSeq).sortBy(_.toString)
      assert(got.sameElements(want),
        s"sort degrade changed results: ${got.length} vs ${want.length} rows")
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          flatten(q.plan)
        case _ => p.children.flatMap(flatten)
      })
      val finalExec = flatten(df.queryExecution.executedPlan)
        .collect { case t: graft.plans.TopKPerGroupExec if !t.partial => t }
      assert(finalExec.nonEmpty)
      assert(finalExec.head.metrics("numSortFallbacks").value > 0,
        "the degrade path must actually have fired")
    } finally spark.conf.unset(TopK.MaxFinalHeapRowsKey)
  }

  test("compaction measurably restores read-side pruning (scan surfaces fewer rows)") {
    import graft.operators.WarehouseOps
    val dir = sf("0.01")
    WarehouseOps.layoutCompact(spark, dir).collect() // materialize both layouts
    val frag = scanOutputRows(Qx.tmpOut("frag", dir))
    val comp = scanOutputRows(Qx.tmpOut("compacted", dir))
    // every fragmented delta spans the whole key grid, so its row groups
    // all match the band's min/max and the scan surfaces ~everything;
    // compacted files are cell-local, so most row groups/pages prune out
    assert(frag > 0 && comp > 0)
    assert(comp * 2 < frag,
      s"compacted layout must prune the selective scan: $comp vs $frag scan rows")
  }
}
