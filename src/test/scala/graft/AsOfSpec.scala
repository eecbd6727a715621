package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.plans.{AsOf, AsOfJoinExec}

/** Native as-of merge join: window-form parity, plan shape, strict vs
  * inclusive semantics, unmatched rows, and randomized equivalence. */
class AsOfSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec => flatten(q.plan)
    case _ => p.children.flatMap(flatten)
  })

  test("join_asof_native matches the window-collapse form row for row") {
    import spark.implicits._
    val dir = sf()
    val native = graft.operators.Joins.joinAsofNative(spark, dir).collect()
    val window = graft.operators.Joins.joinAsof(spark, dir).collect()
    assert(native.length == window.length)
    assert(native.sameElements(window))
  }

  test("physical plan is exchanges + sorts + one AsOfJoinExec; no window, no BNLJ") {
    import spark.implicits._
    val cur = Tables.load(spark, sf(), "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val prev = Tables.load(spark, sf(), "orders")
      .select($"o_orderkey".as("p_okey"), $"o_custkey".as("p_cust"),
        $"o_orderdate".as("p_date"))
    val df = AsOf.joinPrev(cur, prev, Seq("o_custkey"), Seq("p_cust"),
      "o_orderdate", "p_date", rightTiebreak = Seq("p_okey"))
    df.collect()
    val nodes = flatten(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[AsOfJoinExec]) == 1)
    assert(nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "as-of must shuffle on the key")
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"native as-of must not plan a window:\n${nodes.head}")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "native as-of must not fall back to BNLJ")
  }

  test("strict excludes same-instant rows; inclusive keeps them; no-match keeps nulls") {
    import spark.implicits._
    val trades = Seq((1L, 100L, "t1"), (1L, 200L, "t2"), (2L, 50L, "t3"))
      .toDF("sym", "ts", "trade")
    val quotes = Seq((1L, 100L, 9.0), (1L, 150L, 9.5), (3L, 10L, 1.0))
      .toDF("q_sym", "q_ts", "px")
    def run(strict: Boolean) =
      AsOf.joinPrev(trades, quotes, Seq("sym"), Seq("q_sym"), "ts", "q_ts",
          rightTiebreak = Seq("px"), strict = strict)
        .select($"trade", $"q_ts", $"px").collect()
        .map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    // strict: t1 (ts=100) must NOT see the q_ts=100 quote.
    assert(run(strict = true) == Set(
      ("t1", None, None),
      ("t2", Some(150L), Some(9.5)),
      ("t3", None, None)))
    // inclusive: t1 takes the same-instant quote.
    assert(run(strict = false) == Set(
      ("t1", Some(100L), Some(9.0)),
      ("t2", Some(150L), Some(9.5)),
      ("t3", None, None)))
  }

  test("right-time ties resolve by the tiebreak (max), matching the window pick") {
    import spark.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 5L, 1L), (1L, 5L, 3L), (1L, 5L, 2L)).toDF("rk", "rt", "rid")
    val got = AsOf.joinPrev(l, r, Seq("k"), Seq("rk"), "t", "rt",
        rightTiebreak = Seq("rid")).select($"rid").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L),
      "tie on rt must keep the max tiebreak, like the desc window pick")
  }

  test("null keys never match, matching the join+window twin's equi-join semantics") {
    import spark.implicits._
    val l = Seq((Some(1L), 10L, "a"), (None, 10L, "b"), (Some(1L), 20L, "c"))
      .toDF("k", "t", "tag")
    val r = Seq((Some(1L), 5L, 1L), (Option.empty[Long], 5L, 2L))
      .toDF("rk", "rt", "rid")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"tag", $"rid").collect()
        .map(x => (x.getString(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    val native = pairs(AsOf.joinPrev(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTiebreak = Seq("rid")))
    val w = Window.partitionBy($"tag").orderBy($"rt".desc_nulls_last, $"rid".desc_nulls_last)
    val windowForm = pairs(l.join(r, $"k" === $"rk" && $"rt" < $"t", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1))
    assert(native == windowForm)
    // And concretely: the null-key left row survives unmatched; the
    // null-key right row matches nobody.
    assert(native == Set(("a", 1L), ("b", -1L), ("c", 1L)))
  }

  test("null TIMES never match either, in both directions (window-twin parity)") {
    import spark.implicits._
    val l = Seq((1L, Some(10L), "a"), (1L, Option.empty[Long], "b"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, Some(5L), 1L), (1L, Option.empty[Long], 2L),
        (1L, Some(15L), 3L))
      .toDF("rk", "rt", "rid")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"tag", $"rid").collect()
        .map(x => (x.getString(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    // Backward: "a"(t=10) matches rid=1 (rt=5); the null-rt row must
    // NOT be kept as "earliest"; "b"(t=null) matches nothing.
    val back = pairs(AsOf.joinPrev(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTiebreak = Seq("rid")))
    assert(back == Set(("a", 1L), ("b", -1L)), s"backward: $back")
    // Forward: "a"(t=10) matches rid=3 (rt=15); null rows stay out.
    val fwd = pairs(AsOf.joinNext(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTiebreak = Seq("rid")))
    assert(fwd == Set(("a", 3L), ("b", -1L)), s"forward: $fwd")
    // Inclusive forward with a null left time must still not match.
    val fwdIncl = pairs(AsOf.joinNext(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTiebreak = Seq("rid"), strict = false))
    assert(fwdIncl == Set(("a", 3L), ("b", -1L)), s"forward inclusive: $fwdIncl")
  }

  test("SQL metrics report output and match counts") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val r = Seq((1L, 15L, 1L)).toDF("rk", "rt", "rid")
    val df = AsOf.joinPrev(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTiebreak = Seq("rid"))
    // collect() executes THIS queryExecution (count() would plan and run
    // a different one, leaving these metrics untouched).
    assert(df.collect().length == 3)
    val exec = flatten(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan)
      .collectFirst { case a: AsOfJoinExec => a }.get
    assert(exec.metrics("numOutputRows").value == 3)
    assert(exec.metrics("numMatched").value == 1) // only (1, 20) sees the quote
  }

  test("forward native as-of matches the forward window form row for row") {
    import spark.implicits._
    val native = graft.operators.Joins.joinAsofForwardNative(spark, sf()).collect()
    val window = graft.operators.Joins.joinAsofForward(spark, sf()).collect()
    assert(native.length == window.length)
    assert(native.sameElements(window))
  }

  test("forward strict vs inclusive; forward ties pick the MIN tiebreak") {
    import spark.implicits._
    val l = Seq((1L, 100L, "t1"), (2L, 50L, "t2")).toDF("sym", "ts", "trade")
    val r = Seq((1L, 100L, 9.0), (1L, 150L, 9.5), (1L, 150L, 9.4))
      .toDF("q_sym", "q_ts", "px")
    def run(strict: Boolean) =
      AsOf.joinNext(l, r, Seq("sym"), Seq("q_sym"), "ts", "q_ts",
          rightTiebreak = Seq("px"), strict = strict)
        .select($"trade", $"q_ts", $"px").collect()
        .map(x => (x.getString(0),
          if (x.isNullAt(1)) None else Some((x.getLong(1), x.getDouble(2))))).toSet
    // strict: t1 skips the same-instant quote, lands on the 150-tie →
    // min px of the tie (9.4). t2 has no same-key quotes.
    assert(run(strict = true) == Set(
      ("t1", Some((150L, 9.4))), ("t2", None)))
    // inclusive: t1 takes the same-instant quote.
    assert(run(strict = false) == Set(
      ("t1", Some((100L, 9.0))), ("t2", None)))
  }

  test("property: forward native equals the forward join+window collapse") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(0, 30)
      nr <- Gen.choose(0, 30)
      ls <- Gen.listOfN(nl, for { k <- Gen.choose(0, 3); t <- Gen.choose(0, 15) } yield (k, t))
      rs <- Gen.listOfN(nr, for { k <- Gen.choose(0, 3); t <- Gen.choose(0, 15) } yield (k, t))
    } yield (ls, rs)
    val prop = Prop.forAll(gen) { case (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid").repartition(3)
      val r = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("rk", "rt", "rid").repartition(2)
      val native = AsOf.joinNext(l, r, Seq("k"), Seq("rk"), "t", "rt",
          rightTiebreak = Seq("rid"))
        .select($"lid", $"rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      val w = Window.partitionBy($"lid").orderBy($"rt".asc_nulls_last, $"rid".asc_nulls_last)
      val expected = l.join(r, $"k" === $"rk" && $"rt" > $"t", "left")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"lid", $"rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      native == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"property falsified: $res")
  }

  test("property: native as-of equals join+window collapse on random data") {
    import spark.implicits._
    // ~1 in 8 times are NULL — the window predicate is null-safe-false,
    // and the native merge must agree row for row.
    val tGen = Gen.frequency(7 -> Gen.choose(0, 20).map(Some(_): Option[Int]),
      1 -> Gen.const(Option.empty[Int]))
    val gen = for {
      nl <- Gen.choose(0, 40)
      nr <- Gen.choose(0, 40)
      ls <- Gen.listOfN(nl, for { k <- Gen.choose(0, 4); t <- tGen } yield (k, t))
      rs <- Gen.listOfN(nr, for { k <- Gen.choose(0, 4); t <- tGen } yield (k, t))
    } yield (ls, rs)
    val prop = Prop.forAll(gen) { case (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid").repartition(3)
      val r = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("rk", "rt", "rid").repartition(2)
      val native = AsOf.joinPrev(l, r, Seq("k"), Seq("rk"), "t", "rt",
          rightTiebreak = Seq("rid"))
        .select($"lid", $"rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      val w = Window.partitionBy($"lid").orderBy($"rt".desc_nulls_last, $"rid".desc_nulls_last)
      val expected = l.join(r, $"k" === $"rk" && $"rt" < $"t", "left")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"lid", $"rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      native == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, s"property falsified: $res")
  }

  test("mismatched key or time types fail fast instead of comparing garbage") {
    import spark.implicits._
    val l = Seq((1, 10L)).toDF("k", "t")
    val rLongKey = Seq((1L, 5L)).toDF("rk", "rt")
    val keyErr = intercept[IllegalArgumentException] {
      AsOf.joinPrev(l, rLongKey, Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(keyErr.getMessage.contains("key types"), keyErr.getMessage)
    val rIntTime = Seq((1, 5)).toDF("rk", "rt")
    val timeErr = intercept[IllegalArgumentException] {
      AsOf.joinPrev(l, rIntTime, Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(timeErr.getMessage.contains("time types"), timeErr.getMessage)
    // and the explicit cast that the error demands actually works
    val ok = AsOf.joinPrev(l, rIntTime.select($"rk".cast("int").as("rk"),
      $"rt".cast("long").as("rt")), Seq("k"), Seq("rk"), "t", "rt").collect()
    assert(ok.length == 1 && ok.head.getLong(3) == 5L)
  }
}
