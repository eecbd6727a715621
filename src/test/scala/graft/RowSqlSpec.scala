package graft

import graft.plans.RowSql
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** The UPDATE / DELETE statement surface: stock-Spark refusal
  * documented, three-valued WHERE semantics, copy-on-write versioning,
  * unsupported-shape guard.
  */
class RowSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = Qx.tmpOut(name, "t")
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

  // The refusal below is WHY the lowering interpreter exists for
  // catalog-less sessions; the productized answer is the DataSourceV2
  // catalog, where the identical statements execute natively through
  // Spark's own analyzer (positive paths pinned in CatalogSpec).
  test("stock Spark 4 refuses UPDATE/DELETE on a default-catalog table (GraftCatalog is the native path; RowSql the fallback)") {
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").write.mode("overwrite")
      .option("path", Qx.tmpOut("rowsqlprobe", "t")).saveAsTable("rowsql_probe_t")
    val exU = intercept[Exception] {
      spark.sql("UPDATE rowsql_probe_t SET v = 0.0 WHERE k = 1")
    }
    assert(exU.getMessage.contains("does not support UPDATE"),
      s"probe contract changed — revisit RowSql's reason to exist: $exU")
    val exD = intercept[Exception] {
      spark.sql("DELETE FROM rowsql_probe_t WHERE k = 1")
    }
    assert(exD.getMessage.contains("does not support DELETE"),
      s"probe contract changed — revisit RowSql's reason to exist: $exD")
  }

  test("UPDATE: assignment applies only where the predicate is TRUE; NULL predicate keeps the old value") {
    val root = freshRoot("rowsqlupd")
    Snapshots.commit(root)(out =>
      Seq((1L, Some(1.0), "a"), (2L, Some(-1.0), "b"), (3L, None, "c"))
        .toDF("k", "v", "s").write.mode("append").parquet(out))
    val after = RowSql.execute(spark,
      "UPDATE t SET s = concat(s, '!') WHERE v > 0.0", Map("t" -> root))
    val got = after.orderBy($"k").select($"s").as[String].collect().toSeq
    // k=1: v>0 TRUE → updated; k=2: FALSE → kept; k=3: NULL → kept
    assert(got == Seq("a!", "b", "c"), s"three-valued UPDATE broke: $got")
  }

  test("DELETE: only rows where the predicate is TRUE go; NULL predicate keeps the row") {
    val root = freshRoot("rowsqldel")
    Snapshots.commit(root)(out =>
      Seq((1L, Some(1.0)), (2L, Some(-1.0)), (3L, None))
        .toDF("k", "v").write.mode("append").parquet(out))
    val after = RowSql.execute(spark,
      "DELETE FROM t WHERE v > 0.0", Map("t" -> root))
    val kept = after.orderBy($"k").select($"k").as[Long].collect().toSeq
    assert(kept == Seq(2L, 3L), s"three-valued DELETE broke: $kept")
  }

  test("statements are copy-on-write: time travel keeps every pre-statement version") {
    val root = freshRoot("rowsqlcow")
    val v1 = Snapshots.commit(root)(out =>
      spark.range(10).select($"id", lit(1.0).as("v"))
        .write.mode("append").parquet(out))
    RowSql.execute(spark,
      "UPDATE t SET v = 2.0 WHERE id < 5", Map("t" -> root))
    val after = RowSql.execute(spark,
      "DELETE FROM t WHERE id >= 8", Map("t" -> root))
    assert(after.count() == 8)
    assert(after.filter($"v" === 2.0).count() == 5)
    // v1 is untouched history; the two statements made versions 2 and 3
    val old = Snapshots.readAt(spark, root, v1)
    assert(old.count() == 10 && old.filter($"v" === 1.0).count() == 10,
      "pre-statement version must stay readable and pristine")
    assert(Snapshots.resolve(root).get.version == v1 + 2)
  }

  test("the lowered UPDATE and DELETE plans hold zero exchanges — one parallel table pass") {
    import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, UpdateTable}
    import org.apache.spark.sql.execution.ExplainMode
    val root = freshRoot("rowsqlplan")
    Snapshots.commit(root)(out =>
      spark.range(100).select($"id", ($"id" % 7).cast("double").as("v"))
        .write.mode("append").parquet(out))
    val target = Snapshots.read(spark, root).alias("t")
    val parser = spark.sessionState.sqlParser
    val del = parser.parsePlan("DELETE FROM t WHERE v > 3.0") match {
      case DeleteFromTable(_, cond) => RowSql.lowerDelete(target, cond)
      case p => fail(s"unexpected parse: $p")
    }
    val upd = parser.parsePlan("UPDATE t SET v = v + 1.0 WHERE id < 50") match {
      case UpdateTable(_, assigns, cond) =>
        RowSql.lowerUpdate(target, Seq("id", "v"), assigns, cond)
      case p => fail(s"unexpected parse: $p")
    }
    // both lowerings are live and exchange-free: scan → filter/project
    assert(del.count() == 58) // v in {4,5,6} deleted: 3 residues x 14 ids
    assert(upd.filter($"v" === 1.0).count() == 16) // 8 bumped zeros (id<50) + 8 untouched ones (id>=50)
    Seq(del, upd).foreach { df =>
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"),
        s"row-level statement plan must not shuffle:\n$plan")
    }
  }

  test("update honors a table alias and rejects non-UPDATE/DELETE statements") {
    val root = freshRoot("rowsqlalias")
    Snapshots.commit(root)(out =>
      Seq((1L, 5.0)).toDF("k", "v").write.mode("append").parquet(out))
    val after = RowSql.execute(spark,
      "DELETE FROM t AS x WHERE x.v > 1.0", Map("t" -> root))
    assert(after.count() == 0)
    val ex = intercept[IllegalArgumentException] {
      RowSql.execute(spark, "SELECT 1", Map("t" -> root))
    }
    assert(ex.getMessage.contains("not an UPDATE or DELETE"))
  }

  test("UPDATE with a misspelled SET column raises instead of committing a no-op") {
    val root = freshRoot("rowsqlbadcol")
    Snapshots.commit(root)(out =>
      Seq((1L, 5.0)).toDF("k", "v").write.mode("append").parquet(out))
    val before = Snapshots.maxCommitted(root)
    val ex = intercept[IllegalArgumentException] {
      RowSql.execute(spark, "UPDATE t SET vee = 9.0", Map("t" -> root))
    }
    assert(ex.getMessage.contains("unknown column"))
    assert(Snapshots.maxCommitted(root) == before,
      "a rejected statement must not commit a version")
  }

  test("merge-on-read UPDATE/DELETE: empty hit sets commit nothing, key assignment rejected") {
    val root = freshRoot("rowsqlmor2")
    Snapshots.commit(root)(out =>
      Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v").write.mode("append").parquet(out))
    val v0 = Snapshots.maxCommitted(root)
    // no row matches → NO commit, no empty delete files
    RowSql.deleteMergeOnRead(spark, "DELETE FROM t WHERE v > 100.0",
      Map("t" -> root), "k")
    RowSql.updateMergeOnRead(spark, "UPDATE t SET v = 0.0 WHERE v > 100.0",
      Map("t" -> root), "k")
    assert(Snapshots.maxCommitted(root) == v0,
      "statements matching nothing must not advance the head")
    // assigning the MOR key column is delete+insert territory — rejected
    val ex = intercept[IllegalArgumentException] {
      RowSql.updateMergeOnRead(spark, "UPDATE t SET k = k + 10",
        Map("t" -> root), "k")
    }
    assert(ex.getMessage.contains("key column"))
    // the happy path still lands one atomic delta commit
    val after = RowSql.updateMergeOnRead(spark, "UPDATE t SET v = v + 1 WHERE k = 1",
      Map("t" -> root), "k")
    assert(after.orderBy($"k").collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sameElements(Array((1L, 6.0), (2L, 6.0))))
    assert(Snapshots.maxCommitted(root) == v0 + 1)
  }
}
