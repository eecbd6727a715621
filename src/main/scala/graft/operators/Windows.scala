package graft.operators

import graft.{Qx, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Window functions (SURVEY §2.5).
  *
  * Reference basis: rank formulary tiers / lowest-cost alternative per
  * drug (/root/reference/README.md:8-9), per-patient clinical-history
  * sequences (README.md:3). A window shuffles once on its partition key
  * and sorts within partitions — at 100 TB the partition key (brand,
  * user, customer) must be high-cardinality, which all of these are.
  *
  * Determinism: every orderBy inside a window carries a unique tiebreak
  * column, and cumulative double sums go through DECIMAL(18,6) so the
  * frame aggregation is exact on both engines (Spark folds left-to-right,
  * DuckDB may use a segment tree — double addition is not associative).
  */
object Windows {

  type Q = (SparkSession, String) => DataFrame

  /** Top-3 cheapest parts per brand (README.md:8-9): row_number + rank +
    * dense_rank, keep k lowest.
    *
    * Shipped plan routes the k-selection through the native
    * [[graft.plans.TopKPerGroup]] operator (partial/final bounded
    * heaps around the exchange — shuffles ≤ 3·partitions rows per
    * brand instead of the whole `part` table), then computes the rank
    * columns with a window over the surviving ≤3 rows per brand. The
    * ordering (p_retailprice, p_partkey) is total, so ranks computed on
    * the reduced set equal ranks on the full set — the window form IS
    * the DuckDB oracle, and [[graft.TopKSpec]] asserts parity. */
  val winRankTopk: Q = (s, dir) => {
    import s.implicits._
    val top = graft.plans.TopK.perGroup(
      Tables.load(s, dir, "part")
        .select($"p_brand", $"p_partkey", $"p_retailprice"),
      3, Seq("p_brand"), Seq(("p_retailprice", false), ("p_partkey", false)))
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice", $"p_partkey")
    top
      // long, not int: DuckDB window functions return BIGINT and the
      // driver compare is safest with matching physical types.
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"p_brand", $"rn", $"rnk", $"drnk", $"p_partkey", $"p_retailprice")
      .orderBy($"p_brand", $"rn")
  }

  /** Gap to previous event per user — refill-gap shape (README.md:3). */
  val winLagLead: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.load(s, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("next_event", lead($"event_id", 1).over(w))
      .select($"user_id", $"event_id", $"ts",
        (unix_micros($"ts") - unix_micros($"prev_ts")).as("gap_us"),
        $"next_event")
      .orderBy($"event_id")
  }

  /** Cumulative per-user value over time (README.md:3). */
  val winRunningSum: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "events")
      .withColumn("running_value",
        sum($"value".cast(DecimalType(18, 6))).over(w).cast("double"))
      .select($"user_id", $"event_id", $"running_value")
      .orderBy($"event_id")
  }

  /** Sliding mean over the last 5 rows per user ([NS] trend). */
  val winMovingAvg: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val frame = w.rowsBetween(-4, 0)
    Tables.load(s, dir, "events")
      .withColumn("mov_avg",
        sum($"value".cast(DecimalType(18, 6))).over(frame).cast("double") /
          count(lit(1)).over(frame).cast("double"))
      .select($"user_id", $"event_id", $"mov_avg")
      .orderBy($"event_id")
  }

  /** RANGE frame by value interval ([NS]): per-customer 30-day trailing
    * order revenue, ordered by day number so the frame is numeric. */
  val winRangeFrame: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
      .withColumn("day_num", datediff($"o_orderdate", to_date(lit("1995-01-01"))))
    val w = Window.partitionBy($"o_custkey").orderBy($"day_num")
      .rangeBetween(-30, 0)
    o.withColumn("trailing_30d",
        sum($"o_totalprice".cast(DecimalType(18, 6))).over(w).cast("double"))
      .select($"o_orderkey", $"o_custkey", $"day_num", $"trailing_30d")
      .orderBy($"o_orderkey")
  }

  /** Quartile bucketing + distribution stats — tier placement
    * (README.md:9). */
  val winNtilePctrank: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    Tables.load(s, dir, "customer")
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        $"quartile", $"pct_rank", $"cume")
      .orderBy($"c_custkey")
  }

  /** First/last order per customer with an explicit full frame — latest
    * coverage row shape (README.md:7). */
  val winFirstLast: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "orders")
      .withColumn("first_order", first($"o_orderkey").over(full))
      .withColumn("last_order", last($"o_orderkey").over(full))
      .select($"o_orderkey", $"o_custkey", $"first_order", $"last_order")
      .orderBy($"o_orderkey")
  }

  /** nth_value — "the second-cheapest alternative per drug class"
    * shape (README.md:9): 2nd and 3rd order per customer over the full
    * frame; null where the customer has fewer orders. */
  val winNthValue: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "orders")
      .withColumn("second_order", nth_value($"o_orderkey", 2).over(w))
      .withColumn("third_order", nth_value($"o_orderkey", 3).over(w))
      .select($"o_orderkey", $"o_custkey", $"second_order", $"third_order")
      .orderBy($"o_orderkey")
  }

  /** Time-series gap fill / hourly resample: every user gets a complete
    * hourly spine from their first to last event, with missing hours
    * zero-filled — the resampling step every downstream time-series
    * model or dashboard assumes. The spine is generated per key with
    * `sequence` + `explode` (bounded by that key's own span — no global
    * calendar table, no cross join), then left-joined back to the
    * per-hour counts; both sides shuffle on (user, hour). */
  val tsGapFill: Q = (s, dir) => {
    import s.implicits._
    val hourly = Tables.load(s, dir, "events")
      .groupBy($"user_id", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"))
    val spine = hourly.groupBy($"user_id")
      .agg(min($"h").as("h0"), max($"h").as("h1"))
      .select($"user_id",
        explode(sequence($"h0", $"h1", expr("interval 1 hour"))).as("h"))
    spine.join(hourly, Seq("user_id", "h"), "left")
      .select($"user_id", $"h".as("hour_start"),
        coalesce($"n", lit(0L)).as("n"))
      .orderBy($"user_id", $"hour_start")
  }

  /** Ordered funnel: per user, the first view, the first click AFTER
    * that view, and the first purchase AFTER that click — stage = how
    * deep the user got. The order constraint is what makes this a
    * funnel rather than three independent mins: each stage's candidate
    * set is gated by the previous stage's timestamp. Three
    * map-side-combined min-aggs + two left joins, all keyed on
    * user_id — no window sort, no event buffering. */
  val tsFunnel: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.load(s, dir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("v_us"))
    val c = e.join(v, "user_id").filter($"event_type" === "click" && $"us" >= $"v_us")
      .groupBy($"user_id").agg(min($"us").as("c_us"))
    val p = e.join(c, "user_id").filter($"event_type" === "purchase" && $"us" >= $"c_us")
      .groupBy($"user_id").agg(min($"us").as("p_us"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select($"user_id", $"v_us", $"c_us", $"p_us",
        (lit(1) + $"c_us".isNotNull.cast("int") + $"p_us".isNotNull.cast("int")).as("stage"))
      .orderBy($"user_id")
  }

  /** Cohort retention — users bucketed by first-activity week, counted
    * distinct in each later week, the standard retention-triangle
    * input. Two map-side-combined aggregations and one join on
    * user_id; cohort assignment shuffles one row per user, never the
    * event stream, so the shape holds when events is the 100 TB side.
    * week_no goes through floor() on BOTH engines before the BIGINT
    * cast (Spark casts by truncation, DuckDB by rounding). */
  val tsRetentionCohort: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.load(s, dir, "events")
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
    val cohort = e.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    e.join(cohort, "user_id")
      .groupBy($"cohort_wk",
        floor(datediff($"wk", $"cohort_wk") / 7).cast("long").as("week_no"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_wk", $"week_no")
  }

  /** Batch sessionization: per-user session indexes cut at a
    * 30-minute inactivity gap, then one row of aggregates per
    * session — the session-scoped unit every log-derived training
    * pipeline groups by ([[graft.streaming.Streamy]]'s
    * `stream_session` is the streaming twin of the same semantics).
    * Classic two-pass window: flag rows whose gap from the previous
    * event exceeds the timeout (a first event flags too), running-sum
    * the flags into a dense per-user session index, aggregate by
    * (user, session). The lag and the running sum share ONE window
    * spec — one shuffle on user_id, one sort per partition — and the
    * final group-by is keyed on (user_id, session_idx), so nothing
    * ever sees more than a single user's ordered events at once: the
    * shape holds when events is the 100 TB side. Total order inside a
    * user is (ts, event_id) on both engines — duplicate timestamps
    * cannot flip the session cut. */
  val tsSessionize: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.load(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_s", ($"prev_us".isNull ||
        unix_micros($"ts") - $"prev_us" > 1800L * 1000000L).cast("long"))
      .withColumn("session_idx", sum($"new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_idx")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"), Qx.dsum($"value").as("total_value"))
      .orderBy($"user_id", $"session_idx")
  }

  /** Gaps-and-islands: longest consecutive-day activity streak per
    * user. The island key is `day − row_number` (constant within a
    * consecutive run — the classic trick), so streaks fall out of one
    * window + two aggregations with no self-join and no iteration.
    * Ties on length break to the latest streak start, making the
    * winner total. */
  val winStreak: Q = (s, dir) => {
    import s.implicits._
    val d = Tables.load(s, dir, "events")
      .select($"user_id", date_trunc("day", $"ts").cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    val st = d.withColumn("grp", date_sub($"day", row_number().over(w).cast("int")))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("best_len"), min($"day").as("streak_start"))
    val pick = Window.partitionBy($"user_id")
      .orderBy($"best_len".desc, $"streak_start".desc)
    st.withColumn("rn", row_number().over(pick)).filter($"rn" === 1)
      .select($"user_id", $"best_len", $"streak_start")
      .orderBy($"user_id")
  }

  /** Trailing-window z-score anomaly detection over the hourly event
    * series: each (hour, type) count scored against the mean/stddev of
    * its own previous ≤24 observed hours (ROWS frame ending at
    * 1 PRECEDING — the current point never contaminates its own
    * baseline). Rows with <12 hours of history or zero variance are
    * unscored (z null), mirroring how a production monitor warms up.
    *
    * Scale shape: one (hour, type) hash-agg with map-side combine
    * collapses the event stream, then the window partitions by
    * event_type — bounded series per partition, no unpartitioned
    * window anywhere. Threshold 2.5 verified non-vacuous at sf0.01
    * (97/3385 scored rows flag). */
  val tsAnomalyZscore: Q = (s, dir) => {
    import s.implicits._
    val hourly = Tables.load(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"window_start")
      .rowsBetween(-24, -1)
    hourly
      .withColumn("hist", count($"n").over(w))
      .withColumn("mu", avg($"n").over(w))
      .withColumn("sd", stddev_samp($"n").over(w))
      .withColumn("z",
        when($"hist" >= 12 && $"sd" > 0,
          round(($"n" - $"mu") / $"sd", 4)))
      .select($"window_start", $"event_type", $"n",
        round($"mu", 4).as("mu"), round($"sd", 4).as("sd"), $"z",
        coalesce(abs($"z") >= 2.5, lit(false)).as("anomalous"))
      .orderBy($"window_start", $"event_type")
  }

  /** Truncated exponentially-weighted moving average (α = 1/2, last 8
    * observations) of `value` per user — the standard time-series
    * smoother, in the finite form both engines can evaluate exactly:
    * ewma8 = Σⱼ wⱼ·x₍ₜ₋ⱼ₎ / Σⱼ wⱼ with wⱼ = 2⁻ʲ over the lags that
    * exist (early rows renormalize over their shorter history).
    *
    * Determinism (why there is NO rounding here): every weight is a
    * power of two, so each product wⱼ·x is IEEE-exact; the additions
    * run left-to-right in the same written order in Spark and DuckDB,
    * and the final division divides identical doubles — the unrounded
    * result is bit-identical across engines (SURVEY §0.2.2 needs
    * rounding only when accumulation ORDER differs; here it cannot).
    *
    * Scale: one window (hash-shuffle on user_id, sort within), 8 lag
    * functions evaluated in a single WindowExec pass with O(8) state
    * per partition — no self-join, no frame re-scan. The truncation is
    * what makes this a scale operator: the infinite-history EWMA
    * recurrence is inherently sequential, while the 8-term window form
    * is one parallel pass with a fixed error bound of (1-α)⁸ < 0.4%.
    */
  val winEwma: Q = (s, dir) =>
    ewma8(Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value")))

  /** The reusable ewma core of [[winEwma]] over any (user_id, event_id,
    * ts, value) frame — split out so EdgeCaseSpec can drive the
    * all-null-window fixture the real events table doesn't contain. */
  private[graft] def ewma8(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val terms = (0 until 8).map { j =>
      val wgt = 1.0 / (1L << j)
      val lj = if (j == 0) col("value") else lag(col("value"), j).over(w)
      (coalesce(lj * wgt, lit(0.0)),
        when(lj.isNotNull, lit(wgt)).otherwise(lit(0.0)))
    }
    // Denominator guarded by construction: a row whose value AND all 8
    // lags are NULL has weight-sum 0, and 0.0/0.0 is where the engines
    // part ways (Spark non-ANSI Divide → NULL, DuckDB IEEE → NaN) — so
    // both sides define the all-null window as NULL explicitly.
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn("ewma8", when(den =!= 0.0, num / den))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** OHLC downsample — the canonical time-series resample: per (user,
    * hour) bar, open = first value, close = last value (both under the
    * total (ts, event_id) order), high/low = max/min, plus the bar's
    * event count. One hash exchange on (user, hour) serves BOTH the
    * open/close window and the final aggregate — the group-by keys
    * equal the window partition keys, so Catalyst reuses the
    * partitioning and no second shuffle of event rows exists (audited
    * in PLANS.md). first_value/last_value run over the full frame in a
    * single WindowExec pass. */
  val tsResampleOhlc: Q = (s, dir) => {
    import s.implicits._
    val hour = date_trunc("hour", $"ts").as("bar_ts")
    val w = Window.partitionBy($"user_id", $"bar_ts")
      .orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"value", hour)
      .withColumn("open", first($"value").over(w))
      .withColumn("close", last($"value").over(w))
      .groupBy($"user_id", $"bar_ts")
      .agg(
        // min, not first: every row in the bar carries the same
        // open/close, and min is deterministic by definition where
        // first() documents itself as any-value
        min($"open").as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        min($"close").as("close"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id", $"bar_ts")
  }

  val queries: Map[String, Q] = Map(
    "ts_resample_ohlc" -> tsResampleOhlc,
    "win_ewma" -> winEwma,
    "ts_anomaly_zscore" -> tsAnomalyZscore,
    "win_streak" -> winStreak,
    "ts_funnel" -> tsFunnel,
    "ts_gap_fill" -> tsGapFill,
    "ts_sessionize" -> tsSessionize,
    "ts_retention_cohort" -> tsRetentionCohort,
    "win_nth_value" -> winNthValue,
    "win_rank_topk" -> winRankTopk,
    "win_lag_lead" -> winLagLead,
    "win_running_sum" -> winRunningSum,
    "win_moving_avg" -> winMovingAvg,
    "win_range_frame" -> winRangeFrame,
    "win_ntile_pctrank" -> winNtilePctrank,
    "win_first_last" -> winFirstLast)

  val oracle: Map[String, String] = Map(
    "ts_resample_ohlc" -> """
      WITH e AS (
        SELECT user_id, ts, event_id, value,
               CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                 AS bar_ts
        FROM events),
      oc AS (
        SELECT user_id, bar_ts, value,
               first_value(value) OVER w AS open,
               last_value(value) OVER w AS close
        FROM e
        WINDOW w AS (PARTITION BY user_id, bar_ts ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING))
      SELECT user_id, bar_ts,
             MIN(open) AS open, MAX(value) AS high, MIN(value) AS low,
             MIN(close) AS close, COUNT(*) AS n_events
      FROM oc GROUP BY user_id, bar_ts
      ORDER BY user_id, bar_ts""",
    // Identical 8-term truncated EWMA; weight literals are exact powers
    // of two, additions in the same written order — bit-identical
    // doubles, so no ROUND (see winEwma scaladoc).
    "win_ewma" -> {
      // j=0 handles a null value exactly like every other lag (COALESCE
      // numerator, zeroed weight) — symmetric with the Spark side, so a
      // null current value renormalizes over the lags instead of
      // diverging between engines.
      def lagExpr(j: Int) = if (j == 0) "value" else s"lag(value, $j) OVER w"
      val num = (0 until 8).map { j =>
        val wgt = java.math.BigDecimal.valueOf(1.0 / (1L << j)).toPlainString
        s"COALESCE(${lagExpr(j)} * $wgt, 0.0)"
      }.mkString(" + ")
      val den = (0 until 8).map { j =>
        val wgt = java.math.BigDecimal.valueOf(1.0 / (1L << j)).toPlainString
        s"CASE WHEN ${lagExpr(j)} IS NOT NULL THEN $wgt ELSE 0.0 END"
      }.mkString(" + ")
      // NULLIF twin of the Spark side's when(den =!= 0) guard: the
      // all-null window is NULL in both engines by construction
      // (DuckDB IEEE 0/0 would be NaN, Spark's Divide NULL).
      s"""
      SELECT user_id, event_id, ts, value,
             ($num) / NULLIF($den, 0.0) AS ewma8
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, ts, event_id"""
    },
    "ts_anomaly_zscore" -> """
      WITH h AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      w AS (
        SELECT window_start, event_type, n,
               count(n) OVER win AS hist,
               avg(n) OVER win AS mu,
               stddev_samp(n) OVER win AS sd
        FROM h
        WINDOW win AS (PARTITION BY event_type ORDER BY window_start
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      z AS (
        SELECT window_start, event_type, n, mu, sd,
               CASE WHEN hist >= 12 AND sd > 0
                    THEN ROUND((n - mu) / sd, 4) END AS z
        FROM w)
      SELECT window_start, event_type, n,
             ROUND(mu, 4) AS mu, ROUND(sd, 4) AS sd, z,
             COALESCE(abs(z) >= 2.5, FALSE) AS anomalous
      FROM z ORDER BY window_start, event_type""",
    "win_streak" -> """
      WITH d AS (SELECT DISTINCT user_id,
                        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
                 FROM events),
      s AS (SELECT user_id, day,
                   day - CAST(ROW_NUMBER() OVER (
                     PARTITION BY user_id ORDER BY day) AS INT) AS grp
            FROM d),
      st AS (SELECT user_id, grp, COUNT(*) AS best_len, MIN(day) AS streak_start
             FROM s GROUP BY 1, 2),
      b AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY best_len DESC, streak_start DESC) AS rn FROM st)
      SELECT user_id, CAST(best_len AS BIGINT) AS best_len, streak_start
      FROM b WHERE rn = 1 ORDER BY user_id""",
    "ts_funnel" -> """
      WITH e AS (SELECT user_id, event_type,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      v AS (SELECT user_id, MIN(us) AS v_us FROM e
            WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(us) AS c_us FROM e JOIN v USING (user_id)
            WHERE event_type = 'click' AND us >= v_us GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(us) AS p_us FROM e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND us >= c_us GROUP BY e.user_id)
      SELECT v.user_id, v_us, c_us, p_us,
             CAST(1 + CAST(c_us IS NOT NULL AS INT)
                    + CAST(p_us IS NOT NULL AS INT) AS INT) AS stage
      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      ORDER BY v.user_id""",
    "ts_retention_cohort" -> """
      WITH e AS (SELECT user_id,
                        CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
                 FROM events),
      c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id)
      SELECT cohort_wk,
             CAST(FLOOR(datediff('day', cohort_wk, wk) / 7) AS BIGINT) AS week_no,
             COUNT(DISTINCT e.user_id) AS n_users
      FROM e JOIN c USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_wk, week_no""",
    // Same total order (ts, event_id) and the same epoch-µs gap test
    // on both engines; a flipped session cut, a lost first-event flag,
    // or a non-dense index changes the row set and hash-mismatches.
    "ts_sessionize" -> s"""
      WITH f AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR epoch_us(CAST(ts AS TIMESTAMP))
                         - epoch_us(CAST(LAG(ts) OVER w AS TIMESTAMP))
                         > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM f)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS n_events, ${Qx.dsumSql("value")} AS total_value
      FROM sess GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx""",
    "ts_gap_fill" -> """
      WITH hourly AS (SELECT user_id,
                             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                             COUNT(*) AS n
                      FROM events GROUP BY 1, 2),
      span AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1
               FROM hourly GROUP BY user_id),
      spine AS (SELECT user_id,
                       unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                FROM span)
      SELECT s.user_id, s.h AS hour_start, COALESCE(n, 0) AS n
      FROM spine s LEFT JOIN hourly ON s.user_id = hourly.user_id AND s.h = hourly.h
      ORDER BY s.user_id, hour_start""",
    "win_nth_value" -> """
      SELECT o_orderkey, o_custkey,
             NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
             NTH_VALUE(o_orderkey, 3) OVER w AS third_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderkey""",
    "win_rank_topk" -> """
      SELECT p_brand, rn, rnk, drnk, p_partkey, p_retailprice
      FROM (SELECT p_brand, p_partkey, p_retailprice,
                   ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
                   DENSE_RANK() OVER w AS drnk
            FROM part
            WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey))
      WHERE rn <= 3 ORDER BY p_brand, rn""",
    "win_lag_lead" -> """
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             epoch_us(CAST(ts AS TIMESTAMP))
               - epoch_us(CAST(LAG(ts, 1) OVER w AS TIMESTAMP)) AS gap_us,
             LEAD(event_id, 1) OVER w AS next_event
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id""",
    "win_running_sum" -> """
      SELECT user_id, event_id,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_value
      FROM events ORDER BY event_id""",
    "win_moving_avg" -> """
      SELECT user_id, event_id,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
               / CAST(COUNT(*) OVER w AS DOUBLE) AS mov_avg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",
    "win_range_frame" -> """
      SELECT o_orderkey, o_custkey, day_num,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER
               (PARTITION BY o_custkey ORDER BY day_num
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS trailing_30d
      FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                   CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
                     AS day_num
            FROM orders)
      ORDER BY o_orderkey""",
    "win_ntile_pctrank" -> """
      SELECT c_custkey, c_mktsegment, c_acctbal,
             NTILE(4) OVER w AS quartile,
             PERCENT_RANK() OVER w AS pct_rank,
             CUME_DIST() OVER w AS cume
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      ORDER BY c_custkey""",
    "win_first_last" -> """
      SELECT o_orderkey, o_custkey,
             FIRST_VALUE(o_orderkey) OVER w AS first_order,
             LAST_VALUE(o_orderkey) OVER w AS last_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderkey""")
}
