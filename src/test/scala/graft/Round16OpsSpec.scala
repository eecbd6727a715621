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
}
