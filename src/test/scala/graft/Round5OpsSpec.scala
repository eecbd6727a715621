package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextOps, Windows}

/** Round-5 additions: stratified sampling and cohort retention. */
class Round5OpsSpec extends SparkSpec {

  test("sample_stratified keeps at most 20 docs per lang and is rerun-stable") {
    import spark.implicits._
    val a = TextOps.sampleStratified(spark, sf("0.01"))
    val perLang = a.groupBy($"lang").count().collect()
    assert(perLang.nonEmpty)
    assert(perLang.forall(_.getLong(1) <= 20))
    // sf0.01 has >20 docs in every language, so every stratum is full.
    assert(perLang.forall(_.getLong(1) == 20))
    val b = TextOps.sampleStratified(spark, sf("0.01"))
    assert(a.collect().sameElements(b.collect()))
  }

  test("sample_stratified membership is a pure function of doc identity") {
    import spark.implicits._
    // Selected ids at sf0.001 must be exactly the 20 smallest hashes per
    // lang recomputed first-principles from the raw table.
    val docs = Tables.load(spark, sf(), "documents")
      .select($"lang", $"doc_id",
        md5($"doc_id".cast("string").cast("binary")).as("hk"))
    val expected = docs.collect()
      .groupBy(_.getString(0))
      .iterator.flatMap { case (_, rows) =>
        rows.sortBy(r => (r.getString(2), r.getLong(1))).take(20).iterator
      }
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = TextOps.sampleStratified(spark, sf())
      .select($"lang", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("ts_retention_cohort week0 count equals cohort size and rows are complete") {
    import spark.implicits._
    val ret = Windows.tsRetentionCohort(spark, sf("0.01")).collect()
    assert(ret.nonEmpty)
    // week_no is non-negative everywhere (first week is by definition min).
    assert(ret.forall(_.getLong(1) >= 0))
    // Every cohort has a week-0 row whose count equals the cohort's size.
    val e = Tables.load(spark, sf("0.01"), "events")
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
    val cohortSizes = e.groupBy($"user_id").agg(min($"wk").as("cw"))
      .groupBy($"cw").count().collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val week0 = ret.filter(_.getLong(1) == 0L)
      .map(r => (r.getDate(0).toString, r.getLong(2))).toMap
    assert(week0 == cohortSizes)
  }
}
