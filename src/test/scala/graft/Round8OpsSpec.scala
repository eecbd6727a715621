package graft

import graft.operators.SimOps
import org.apache.spark.sql.functions._

/** Round-8 items: bounded-sample IVF quantizer fit (the r7 weak),
  * plus the low-severity ADVICE fixes that are spec-assertable.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("ivf training sample is bounded at IvfFitCap regardless of corpus size") {
    val base = Tables.load(spark, sf(), "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val n = base.count()
    // synthesize a corpus past the cap: shifted-id copies of the base
    val copies = (0 to (SimOps.IvfFitCap / n).toInt + 1).map(i =>
      base.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"), $"v"))
    val big = copies.reduce(_ unionAll _)
    assert(big.count() > SimOps.IvfFitCap, "fixture must exceed the cap")
    val sample = SimOps.ivfTrainingSample(big)
    assert(sample.count() == SimOps.IvfFitCap,
      "fit input must be capped no matter the corpus size")
    // the sort+limit must plan as bounded per-partition top-k heaps
    // (TakeOrderedAndProject), never a full-corpus global sort
    val plan = sample.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // hash membership is deterministic across independent evaluations
    val ids = sample.collect().map(_.getLong(0)).toSeq
    assert(ids == SimOps.ivfTrainingSample(big).collect().map(_.getLong(0)).toSeq)
    // ...and feeds KMeans in ascending vec_id order (fixed reduction order)
    assert(ids == ids.sorted)
  }

  test("ivf training sample below the cap is the whole corpus, vec_id-sorted") {
    val base = Tables.load(spark, sf(), "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    assert(base.count() <= SimOps.IvfFitCap)
    val ids = SimOps.ivfTrainingSample(base).collect().map(_.getLong(0)).toSeq
    val all = base.select($"vec_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == all, "below the cap, sampling must change nothing")
  }

  test("interleave_bits coerces non-BIGINT args at analysis time") {
    graft.functions.BitExprs.register(spark)
    // INT literals: implicit cast to BIGINT instead of a runtime
    // ClassCastException through constant folding
    val got = spark.sql("SELECT interleave_bits(3, 1) AS m").collect()(0).getLong(0)
    assert(got == graft.functions.BitExprs.mortonRef(3L, 1L))
    // un-castable argument types are an analysis error, not broken codegen
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT interleave_bits(array(1), 1)").collect()
    }
  }

  test("cdc_snapshot_diff injected 'added' keys sit beyond the real key domain") {
    val maxk = Tables.load(spark, sf(), "customer")
      .agg(max($"c_custkey")).collect()(0).getLong(0)
    val added = graft.operators.CdcOps.cdcSnapshotDiff(spark, sf())
      .filter($"op" === "added").select($"custkey").collect().map(_.getLong(0))
    assert(added.nonEmpty, "the added path must be non-vacuous")
    assert(added.forall(_ > maxk),
      "injected keys must never collide with real custkeys at any SF")
  }

  test("scd2Stream rejects an out-of-order cross-batch arrival (no inverted intervals)") {
    import graft.streaming.StreamRunner
    import graft.streaming.StreamRunner.Ev
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def ts(minute: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
    val ms = MemoryStream[Ev]
    val q = StreamRunner.scd2Stream(ms.toDS())
      .writeStream.format("memory").queryName("scd2guard")
      .outputMode("append").start()
    try {
      ms.addData(Seq(Ev(2L, ts(10), 1L, "purchase", 1.0)))
      q.processAllAvailable()
      // a later batch delivering an EARLIER (ts, event_id) for the same
      // key violates the documented time-ordered-feed contract: the
      // processor must fail the batch, not publish valid_from > valid_to
      ms.addData(Seq(Ev(1L, ts(5), 1L, "purchase", 2.0)))
      val ex = intercept[Exception] { q.processAllAvailable() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("ordering contract")),
        s"expected the ordering-contract guard, got: $ex")
    } finally q.stop()
  }
}
