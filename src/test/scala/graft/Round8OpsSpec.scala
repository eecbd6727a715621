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
}
