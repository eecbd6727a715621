package graft

import graft.catalog.GraftCatalog
import graft.sources.Snapshots

/** Round-18 pins — the r17 verdict items:
  *  1. bloom sidecars are written EXECUTOR-SIDE in the distributed
  *     sketch pass (a many-files commit never moves sketch bytes
  *     through the driver);
  *  2. remove_orphan_files refuses sub-day grace windows (see
  *     Round17OpsSpec's sweep test for the 72h fixture);
  *  3. the commit funnel refuses '_gbucket=' staging on roots without
  *     a declared bucket layout.
  */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = {
    val dir = Qx.tmpOut("r18wh", sf())
    GraftCatalog.register(spark, "snap", Some(dir))
    dir
  }

  private def sqlDf(q: String) = { wh; spark.sql(q) }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    def unwrap(p: Any): Seq[String] = p match {
      case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
      case prod: Product => prod.productIterator.flatMap(unwrap).toSeq
      case _ => Nil
    }
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      .flatMap(_.inputPartitions).flatMap(unwrap)
  }

  test("a 64-file bloom commit writes every sidecar executor-side and still prunes") {
    sqlDf("DROP TABLE IF EXISTS snap.default.r18blm")
    sqlDf("""CREATE TABLE snap.default.r18blm (k BIGINT, v DOUBLE)
            |TBLPROPERTIES ('graft.bloom.cols'='k')""".stripMargin)
    // ONE commit staging 64 files — the initial-conversion shape the
    // r17 verdict flagged: per-file sketches must be written by the
    // tasks that built them, never collected to the driver as bytes
    sqlDf("""INSERT INTO snap.default.r18blm
            |SELECT /*+ REPARTITION(64, id) */ id, id * 1.0
            |FROM range(0, 64000)""".stripMargin)
    val root = s"$wh/default/r18blm"
    val snap = Snapshots.resolve(root).get
    assert(snap.files.size >= 64, s"fixture must stage >= 64 files: ${snap.files.size}")
    // every data file carries its sidecar, written beside it by the task
    val missing = snap.files.filterNot(f =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(
        Snapshots.bloomSidecar(f, "k"))))
    assert(missing.isEmpty, s"sidecars missing for ${missing.take(3)}")
    // and every file has a manifest line (blooms map keyed by file)
    assert(snap.files.forall(f => snap.blooms.get(f).exists(_.contains("k"))),
      "every staged file needs a #bloom: manifest line")
    // the sketches actually refute: an absent key plans zero files
    val none = sqlDf("SELECT * FROM snap.default.r18blm WHERE k = 99999999")
    assert(plannedFiles(none).isEmpty, "absent key must plan no files")
    assert(none.count() == 0)
    // a present key plans a strict subset (the key lives in ONE of the
    // 64 hash-partitioned files; fpp 3% admits a few more)
    val one = sqlDf("SELECT * FROM snap.default.r18blm WHERE k = 4242")
    assert(plannedFiles(one).size < snap.files.size / 2,
      s"present key should prune most files: ${plannedFiles(one).size}")
    assert(one.count() == 1)
  }

  test("the commit funnel refuses '_gbucket=' staging without a declared bucket layout") {
    val root = Qx.tmpOut("r18gb", sf())
    val ex = intercept[IllegalArgumentException] {
      Snapshots.commit(root) { out =>
        spark.range(10).selectExpr("id", "id % 4 AS _gbucket")
          .write.partitionBy("_gbucket").parquet(out)
      }
    }
    assert(ex.getMessage.contains("_gbucket"), ex.getMessage)
    // nothing was published
    assert(Snapshots.maxCommitted(root) == 0L)
  }
}
