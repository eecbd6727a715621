package graft

import graft.catalog.GraftCatalog

/** Round-16 hardening pins: widest-type resolution when a pinned
  * (time-travel) read straddles BOTH a RENAME and a later ALTER COLUMN
  * widening, stats-pruned catalog scans, and the r16 feature keys. */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = {
    val dir = Qx.tmpOut("r16wh", sf())
    GraftCatalog.register(spark, "snap", Some(dir))
    dir
  }

  private def sqlDf(q: String) = { wh; spark.sql(q) }

  test("pinned read straddling RENAME + widening presents the widest type") {
    sqlDf("DROP TABLE IF EXISTS snap.default.r16rw")
    sqlDf("""CREATE TABLE snap.default.r16rw AS
            |SELECT CAST(id AS INT) AS amount FROM range(5)""".stripMargin)
    sqlDf("ALTER TABLE snap.default.r16rw RENAME COLUMN amount TO price")
    sqlDf("ALTER TABLE snap.default.r16rw ALTER COLUMN price TYPE BIGINT")
    sqlDf("INSERT INTO snap.default.r16rw VALUES (1000)")
    // the history: v1 CTAS (amount INT32 files), v2 rename, v3 widen,
    // v4 insert (price INT64 file). A pinned read AT v4 merges files
    // from both eras under DISTINCT names (no CANNOT_MERGE fallback);
    // the collapsed chain must present BIGINT — the oldest spelling's
    // INT would make the scan read int64 pages under IntegerType.
    val versions = sqlDf("SELECT max(version) FROM snap.default.r16rw.history")
      .as[Long].head()
    val pinned = sqlDf(
      s"SELECT * FROM snap.default.r16rw VERSION AS OF $versions")
    assert(pinned.columns.toSeq == Seq("price"),
      s"chain must collapse to one spelling, got ${pinned.columns.toSeq}")
    assert(pinned.schema.head.dataType ==
      org.apache.spark.sql.types.LongType,
      s"straddling pinned read must widen, got ${pinned.schema.simpleString}")
    assert(pinned.as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L, 1000L))
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    def unwrap(p: Any): Seq[String] = p match {
      case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
      case prod: Product => prod.productIterator.flatMap(unwrap).toSeq // EraPartition etc.
      case _ => Nil
    }
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      .flatMap(_.inputPartitions).flatMap(unwrap)
  }

  test("catalog scans skip files on manifest column bounds (stats pruning)") {
    sqlDf("DROP TABLE IF EXISTS snap.default.r16sp")
    sqlDf("CREATE TABLE snap.default.r16sp (k BIGINT, v DOUBLE)")
    sqlDf("INSERT INTO snap.default.r16sp SELECT id, id * 1.5 FROM range(0, 1000)")
    sqlDf("INSERT INTO snap.default.r16sp SELECT id, id * 1.5 FROM range(100000, 101000)")
    val full = plannedFiles(sqlDf("SELECT * FROM snap.default.r16sp"))
    val sel = sqlDf("SELECT * FROM snap.default.r16sp WHERE k >= 100000")
    assert(plannedFiles(sel).nonEmpty &&
      plannedFiles(sel).size < full.size,
      s"selective WHERE must plan fewer files: ${plannedFiles(sel).size} of ${full.size}")
    assert(sel.count() == 1000)
    // equality predicate prunes to the single covering file range
    val eq = sqlDf("SELECT v FROM snap.default.r16sp WHERE k = 100500")
    assert(plannedFiles(eq).size < full.size)
    assert(eq.as[Double].head() == 100500 * 1.5)
    // a predicate no file satisfies plans zero files but stays correct
    val none = sqlDf("SELECT * FROM snap.default.r16sp WHERE k = 50000")
    assert(plannedFiles(none).isEmpty, "non-intersecting range must plan no files")
    assert(none.count() == 0)
    // composes with pending merge-on-read deletes (per-era builders)
    sqlDf("DROP TABLE IF EXISTS snap.default.r16spm")
    sqlDf("""CREATE TABLE snap.default.r16spm (k BIGINT, v STRING)
            |TBLPROPERTIES ('graft.mor.key'='k')""".stripMargin)
    sqlDf("INSERT INTO snap.default.r16spm SELECT id, CAST(id AS STRING) FROM range(0, 100)")
    sqlDf("INSERT INTO snap.default.r16spm SELECT id, CAST(id AS STRING) FROM range(5000, 5100)")
    sqlDf("DELETE FROM snap.default.r16spm WHERE k = 5050")
    val morFull = plannedFiles(sqlDf("SELECT * FROM snap.default.r16spm"))
    val morSel = sqlDf("SELECT * FROM snap.default.r16spm WHERE k >= 5000")
    assert(plannedFiles(morSel).size < morFull.size,
      s"MOR scan must stats-prune too: ${plannedFiles(morSel).size} of ${morFull.size}")
    assert(morSel.count() == 99, "delete must still apply on the kept files")
  }
}
