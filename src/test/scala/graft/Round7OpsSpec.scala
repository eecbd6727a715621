package graft

import org.apache.spark.sql.functions._

import graft.operators.{Aggs, CdcOps, SimOps}

/** Round-7 additions and hardening. */
class Round7OpsSpec extends SparkSpec {

  test("cdc_upsert_latest: one row per surviving key, tombstoned keys dropped") {
    import spark.implicits._
    val snap = CdcOps.cdcUpsertLatest(spark, sf("0.01")).collect()
    assert(snap.map(_.getLong(0)).distinct.length == snap.length,
      "compaction must emit at most one row per key")
    assert(snap.forall(_.getString(3) != "error"),
      "tombstoned keys must not reach the snapshot")
    // 150 users total; some latest rows ARE tombstones, so the snapshot
    // must be a strict subset — otherwise the delete path is vacuous.
    assert(snap.length < 150 && snap.length > 100, s"got ${snap.length}")
  }

  test("cdc_merge_apply: insert, update, and keep paths all non-vacuous and disjoint") {
    import spark.implicits._
    val out = CdcOps.cdcMergeApply(spark, sf("0.01")).collect()
    val byOp = out.groupBy(_.getString(3))
    assert(byOp.keySet == Set("inserted", "updated", "kept"), s"${byOp.keySet}")
    assert(out.map(_.getLong(0)).distinct.length == out.length,
      "merged snapshot must be unique per key")
    // inserted = changelog keys outside the snapshot window [50, 300)
    assert(byOp("inserted").forall(_.getLong(0) < 50))
    // kept = snapshot keys with no changelog row (users stop at 149)
    assert(byOp("kept").forall(_.getLong(0) >= 150))
    assert(byOp("updated").forall { r =>
      val k = r.getLong(0); k >= 50 && k < 150 })
  }

  test("scd2_intervals: versions chain per key and exactly one is current") {
    import spark.implicits._
    val rows = CdcOps.scd2Intervals(spark, sf("0.01"))
      .select($"user_id", $"valid_from", $"valid_to", $"is_current", $"event_id")
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (uid, vs) =>
      assert(vs.count(_.getBoolean(3)) == 1, s"user $uid: != 1 current version")
      // full-precision Timestamp ordering + event_id tiebreak — the
      // window's order; getTime alone is only millisecond-granular
      val sorted = vs.sortWith { (a, b) =>
        val c = a.getTimestamp(1).compareTo(b.getTimestamp(1))
        if (c != 0) c < 0 else a.getLong(4) < b.getLong(4)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(2) == b.getTimestamp(1),
            s"user $uid: valid_to must chain to the next valid_from")
        case _ =>
      }
      assert(sorted.last.isNullAt(2), s"user $uid: newest version must be open")
    }
  }

  test("agg_hll_partial_merge: union of partials == single-pass sketch, within HLL error of exact") {
    import spark.implicits._
    val dir = sf("0.01")
    val merged = Aggs.aggHllPartialMerge(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // single-pass sketch per type, no daily pre-aggregation level
    val onePass = Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sketch union is lossless over partials of the same stream: the
    // two-level estimate must equal the one-level estimate EXACTLY
    assert(merged == onePass, s"union changed the sketch: $merged vs $onePass")
    val exact = Tables.load(spark, dir, "events")
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { case (t, est) =>
      val rel = math.abs(est.toDouble - exact(t)) / exact(t).max(1L)
      assert(rel <= 0.05, s"$t: estimate $est vs exact ${exact(t)} (rel $rel)")
    }
  }

  test("agg_approx_topk is exact below maxItemsTracked (5 types, k=3)") {
    import spark.implicits._
    val dir = sf("0.01")
    val got = Aggs.aggApproxTopk(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exact = Tables.load(spark, dir, "events")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"event_type").limit(3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(exact), s"${got.toSeq} vs ${exact.toSeq}")
  }

  test("embedding quantization pins a constant dimension to q=0, err=0 (no NaN)") {
    import spark.implicits._
    // dim 1 varies; dim 2 is constant across the corpus (mx == mn).
    val e = Seq(
      (1L, 1, 0.0), (1L, 2, 7.5),
      (2L, 1, 1.0), (2L, 2, 7.5),
      (3L, 1, 2.0), (3L, 2, 7.5)).toDF("vec_id", "dim", "x")
    val out = SimOps.quantizeExploded(e).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(!r.anyNull, s"NaN/null leaked through the degenerate guard: $r")
      assert(r.getLong(1) == 2) // n_dims
      // + 5e-7: err itself is rounded to 6 decimals before the max
      assert(r.getDouble(5) <= 0.5 * (2.0 - 0.0) / 255.0 + 5e-7,
        s"reconstruction error bound violated: $r")
    }
    // the constant dimension contributes q = 0 to every checksum, so
    // the checksums are exactly the varying dimension's codes.
    val byVec = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byVec == Map(1L -> -128L, 2L -> 0L, 3L -> 127L), s"$byVec")
  }
}
