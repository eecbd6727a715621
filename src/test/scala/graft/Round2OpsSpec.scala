package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggs, Joins, SimOps}
import graft.sources.Scans

/** Round-2 operators: binned range join, ORC/CSV sink round-trips,
  * IVF ANN (SURVEY §2.3/§2.1/§2.11 extensions).
  */
class Round2OpsSpec extends SparkSpec {
  import spark.implicits._

  test("join_range_binned equals the naive theta-join neighbor counts") {
    val sup = Tables.load(spark, sf(), "supplier")
      .select($"s_suppkey", $"s_acctbal")
    val naive = sup.as("a").join(sup.as("b"),
        col("b.s_suppkey") =!= col("a.s_suppkey") &&
          abs(col("b.s_acctbal") - col("a.s_acctbal")) <= 100.0, "left")
      .groupBy(col("a.s_suppkey").as("k"))
      .agg(sum(when(col("b.s_suppkey").isNotNull, 1L).otherwise(0L)).as("n"))
    val binned = Joins.joinRangeBinned(spark, sf())
    val diff = binned.join(naive, $"s_suppkey" === $"k")
      .filter($"n_near" =!= $"n")
    assert(diff.count() == 0)
    assert(binned.count() == sup.count(), "every supplier appears exactly once")
  }

  test("binned band-join counts bin-edge pairs exactly once (production logic)") {
    // drive the PRODUCTION binning (Joins.bandedNeighborCounts) with
    // values sitting ON bin edges (0, ±w, w/2 …) and compare against
    // brute force — an overlap in the 3-bin explode would double-count
    val w = 100.0
    val vals = Seq(0.0, 100.0, -100.0, 50.0, 99.999, 100.001, 199.999,
      200.0, -0.001, 149.9, 250.0)
    val sup = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("s_suppkey", "s_acctbal")
    val binned = Joins.bandedNeighborCounts(sup, w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val brute = vals.indices.map { i =>
      i.toLong -> vals.indices.count(j =>
        j != i && math.abs(vals(j) - vals(i)) <= w).toLong
    }.toMap
    assert(binned == brute,
      s"binned=$binned brute=$brute — edge values double-counted or missed")
  }

  test("sink_orc round-trip equals the direct aggregation") {
    val direct = Tables.load(spark, sf(), "orders")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), Qx.dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderpriority").collect()
    val rt = Scans.sinkOrc(spark, sf()).collect()
    assert(rt.toSeq == direct.toSeq)
  }

  test("sink_csv round-trip is identity on the typed projection") {
    val direct = Tables.load(spark, sf(), "customer")
      .select($"c_custkey", $"c_name", $"c_nationkey",
        round($"c_acctbal" * 100).cast("long").as("acctbal_cents"),
        $"c_mktsegment")
      .orderBy($"c_custkey").collect()
    val rt = Scans.sinkCsv(spark, sf()).collect()
    assert(rt.toSeq == direct.toSeq)
  }

  test("join_skew_salted equals the unsalted join (salting is a no-op on values)") {
    val li = Tables.load(spark, sf(), "lineitem")
    val o = Tables.load(spark, sf(), "orders")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), Qx.dsum($"l_quantity").as("total_qty"))
      .orderBy($"o_orderpriority").collect()
    val salted = Joins.joinSkewSalted(spark, sf()).collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("agg_approx_percentile is deterministic and brackets the exact median") {
    val a = Aggs.aggApproxPercentile(spark, sf()).collect()
    val b = Aggs.aggApproxPercentile(spark, sf()).collect()
    assert(a.toSeq == b.toSeq, "sketch must be run-to-run deterministic")
    a.foreach { r =>
      val approx = r.getDouble(1)
      val exact = r.getDouble(2)
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx median $approx too far from exact $exact")
    }
  }

  test("join_partition_pruned: DPP prunes fact partitions and values match") {
    val df = Joins.joinPartitionPruned(spark, sf())
    val rows = df.collect()
    // values equal the direct filtered aggregate
    val direct = Tables.load(spark, sf(), "orders")
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), Qx.dsum($"o_totalprice").as("total"))
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(2) == direct.head.getLong(1))
    assert(rows.head.getDouble(3) == direct.head.getDouble(2))
    // the fact scan must carry a runtime pruning predicate on the
    // partition column (DPP), not read all partitions
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in:\n${plan.take(2000)}")
  }

  test("scan_parquet_merge_schema: union schema, old files null-filled") {
    val rows = Scans.scanParquetMergeSchema(spark, sf()).collect()
    val old = rows.filter(_.getLong(0) <= 1000)
    val recent = rows.filter(_.getLong(0) > 1000)
    assert(old.nonEmpty && recent.nonEmpty)
    assert(old.forall(_.isNullAt(2)), "pre-evolution files must null the new column")
    assert(recent.forall(!_.isNullAt(2)))
  }

  test("CSV round-trip survives quotes, commas, and newlines in values") {
    // sink_csv relies on Spark's default CSV quoting; prove the
    // write+explicit-schema-read pattern is identity on hostile strings
    val tricky = Seq(
      (1L, "plain"), (2L, "with,comma"), (3L, "with \"quotes\""),
      (4L, "line\nbreak"), (5L, "trailing space "), (6L, ""))
      .toDF("id", "s")
    val out = Qx.tmpOut("test_csv_edge", "edge")
    // BOTH the CSV writer and reader trim whitespace by default
    // (ignoreLeading/TrailingWhiteSpace=true on each side) — a faithful
    // round-trip disables all four
    tricky.write.mode("overwrite").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(out)
    // ignoreTrailingWhiteSpace defaults TRUE on read and would silently
    // trim "trailing space " — faithful round-trips must disable it
    val back = spark.read.schema("id BIGINT, s STRING")
      .option("header", "true").option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(out)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = tricky.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // empty string reads back as null in Spark CSV — a documented
    // representation limit, normalized here
    val norm = back.map { case (k, v) => k -> (if (v == null) "" else v) }
    assert(norm == expect)
  }

  test("sim_ann_ivf: well-formed, deterministic, and recall vs exact > 0") {
    val ivf = SimOps.simAnnIvf(spark, sf())
    val rows = ivf.collect()
    // per-probe: ranks are 1..k without gaps, cosine non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(2))
      assert(byRank.map(_.getLong(2)).toSeq == (1L to byRank.length).toSeq)
      val cosines = byRank.map(_.getDouble(4)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
    // deterministic across independent evaluations
    assert(SimOps.simAnnIvf(spark, sf()).collect().toSeq == rows.toSeq)
    // nonzero overlap with the exact brute-force top-5 (cells shrink the
    // candidate set; on this corpus at least some exact neighbors share
    // the probe's cell)
    val exact = SimOps.simCosineTopk(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = rows.map(r => (r.getLong(0), r.getLong(3))).count(exact)
    assert(hits > 0, s"IVF found none of the exact top-5 neighbors")
  }
}
