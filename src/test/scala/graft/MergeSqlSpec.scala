package graft

import org.apache.spark.sql.functions._

/** The MERGE INTO surface: stock-Spark refusal documented, the graft
  * interpreter's semantics + atomicity + unsupported-shape guards.
  */
class MergeSqlSpec extends SparkSpec {
  import spark.implicits._

  // The refusal below is WHY the lowering interpreter exists for
  // catalog-less sessions; the productized answer is the DataSourceV2
  // catalog, where the identical statement executes natively through
  // Spark's own analyzer (positive paths pinned in CatalogSpec).
  test("stock Spark 4 refuses MERGE INTO on a default-catalog table (GraftCatalog is the native path; MergeSql the fallback)") {
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").write.mode("overwrite")
      .option("path", Qx.tmpOut("mergeprobe", "t")).saveAsTable("merge_probe_t")
    Seq((2L, 99.0), (3L, 30.0)).toDF("k", "v")
      .createOrReplaceTempView("merge_probe_s")
    val ex = intercept[Exception] {
      spark.sql(
        """MERGE INTO merge_probe_t t USING merge_probe_s s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    }
    assert(ex.getMessage.contains("does not support MERGE INTO TABLE"),
      s"probe contract changed — revisit MergeSql's reason to exist: $ex")
  }

  test("cdc_merge_sql equals cdc_merge_apply row for row (minus the op column)") {
    import graft.operators.CdcOps
    val dir = sf("0.01")
    val got = CdcOps.cdcMergeSql(spark, dir)
      .select($"custkey", $"name", $"acctbal")
      .collect().map(_.toSeq)
    val want = CdcOps.cdcMergeApply(spark, dir)
      .select($"custkey", $"name", $"acctbal")
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.sameElements(want),
      s"statement and DataFrame merges diverge: ${got.length} vs ${want.length}")
  }

  test("the merge commit is atomic: a pre-merge pinned reader keeps the base table") {
    import graft.sources.Snapshots
    val dir = sf("0.001")
    // cdc_merge_sql runs natively against its catalog table: DROP +
    // CTAS (v1) + MERGE (v2), so the pre-head version is the pristine slice
    val root = graft.operators.SnapCat.table(spark, "merge_cust", dir)._2
    graft.operators.CdcOps.cdcMergeSql(spark, dir).collect() // ensures >=2 versions
    val head = Snapshots.resolve(root).get
    val base = Snapshots.readAt(spark, root, head.version - 1)
    // the pre-merge version is exactly the pristine slice: no inserts
    // beyond the snapshot window, original balances intact
    assert(base.agg(min($"custkey"), max($"custkey")).head().getLong(0) >= 50)
    assert(base.filter($"name".startsWith("Customer#new")).count() == 0)
    assert(Snapshots.read(spark, root)
      .filter($"name".startsWith("Customer#new")).count() > 0,
      "the head must be the post-merge table")
  }

  test("a source with duplicate merge keys raises MERGE cardinality violation") {
    import graft.plans.MergeSql
    import graft.sources.Snapshots
    val root = Qx.tmpOut("mergecard", sf("0.001"))
    Snapshots.commit(root)(out => Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .write.mode("append").parquet(out))
    // two source rows match target k=1 — the SQL contract requires an
    // error, not a silent fan-out into two updated copies of the row
    Seq((1L, 11.0), (1L, 12.0), (3L, 30.0)).toDF("k", "v")
      .createOrReplaceTempView("merge_card_dup_s")
    val ex = intercept[Exception] {
      MergeSql.mergeInto(spark,
        """MERGE INTO merge_card_t t USING merge_card_dup_s s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin,
        Map("merge_card_t" -> root)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("MERGE cardinality violation")),
      s"expected the cardinality error, got: $ex")
    // the failed statement must not have committed anything: the head
    // still reads the pristine 2-row base
    assert(Snapshots.read(spark, root).count() == 2,
      "a cardinality-violating MERGE must leave the table untouched")

    // the same statement with a deduplicated source commits cleanly
    Seq((1L, 11.0), (3L, 30.0)).toDF("k", "v")
      .createOrReplaceTempView("merge_card_ok_s")
    val after = MergeSql.mergeInto(spark,
      """MERGE INTO merge_card_t t USING merge_card_ok_s s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin,
      Map("merge_card_t" -> root))
    assert(after.orderBy($"k").collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sameElements(Array((1L, 11.0), (2L, 20.0), (3L, 30.0))))
  }

  test("insert-only MERGE tolerates duplicate source matches (no matched action consumes them)") {
    import graft.plans.MergeSql
    import graft.sources.Snapshots
    val root = Qx.tmpOut("mergeinsonly", sf("0.001"))
    Snapshots.commit(root)(out => Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .write.mode("append").parquet(out))
    // k=1 matches TWICE, but the merge has no WHEN MATCHED clause — the
    // SQL (and Delta) contract is: matched rows pass through unchanged,
    // exactly once; only k=3 inserts
    Seq((1L, 11.0), (1L, 12.0), (3L, 30.0)).toDF("k", "v")
      .createOrReplaceTempView("merge_insonly_s")
    val after = MergeSql.mergeInto(spark,
      """MERGE INTO merge_io_t t USING merge_insonly_s s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin,
      Map("merge_io_t" -> root))
    assert(after.orderBy($"k").collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sameElements(Array((1L, 10.0), (2L, 20.0), (3L, 30.0))),
      "target rows must survive exactly once, insert applied once")
  }

  test("misspelled assignment/insert columns raise instead of silently no-oping") {
    import graft.plans.MergeSql
    import graft.sources.Snapshots
    val root = Qx.tmpOut("mergebadcol", sf("0.001"))
    Snapshots.commit(root)(out => Seq((1L, 10.0)).toDF("k", "v")
      .write.mode("append").parquet(out))
    Seq((1L, 11.0), (3L, 30.0)).toDF("k", "v")
      .createOrReplaceTempView("merge_badcol_s")
    val exUpd = intercept[IllegalArgumentException] {
      MergeSql.mergeInto(spark,
        """MERGE INTO merge_bc_t t USING merge_badcol_s s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET vee = s.v""".stripMargin,
        Map("merge_bc_t" -> root))
    }
    assert(exUpd.getMessage.contains("unknown target column"))
    val exIns = intercept[IllegalArgumentException] {
      MergeSql.mergeInto(spark,
        """MERGE INTO merge_bc_t t USING merge_badcol_s s ON t.k = s.k
          |WHEN NOT MATCHED THEN INSERT (kk, v) VALUES (s.k, s.v)""".stripMargin,
        Map("merge_bc_t" -> root))
    }
    assert(exIns.getMessage.contains("unknown target column"))
    assert(Snapshots.read(spark, root).count() == 1, "nothing committed")
  }

  test("star forms and non-MERGE statements raise clear unsupported errors") {
    import graft.plans.MergeSql
    import graft.sources.Snapshots
    val root = Qx.tmpOut("mergestar", sf("0.001"))
    Snapshots.commit(root)(out => Seq((60L, 5.0)).toDF("custkey", "acctbal")
      .write.mode("append").parquet(out))
    Seq((60L, 1.0)).toDF("user_id", "chg_value")
      .createOrReplaceTempView("merge_star_s")
    val exStar = intercept[IllegalArgumentException] {
      MergeSql.mergeInto(spark,
        """MERGE INTO graft_star_t t USING merge_star_s s
          |ON t.custkey = s.user_id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
        Map("graft_star_t" -> root)).collect()
    }
    assert(exStar.getMessage.contains("star"), exStar.getMessage)
    val exNotMerge = intercept[IllegalArgumentException] {
      MergeSql.mergeInto(spark, "SELECT 1", Map.empty)
    }
    assert(exNotMerge.getMessage.contains("not a MERGE INTO"), exNotMerge.getMessage)
  }
}
