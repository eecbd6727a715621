package graft.operators

import graft.{Qx, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregations (SURVEY §2.4).
  *
  * Reference basis: overlap detection is GROUP BY patient,class HAVING
  * count>1 (/root/reference/README.md:3,9,23); cost comparison is
  * aggregates over price joins (README.md:8-9). Here each capability is a
  * plain `groupBy().agg()` chain — Spark's HashAggregateExec runs the
  * partial/final split automatically (map-side combine before the
  * shuffle), which is exactly the 100 TB-safe shape: the shuffle carries
  * one row per (partition, group), never the raw fact rows.
  */
object Aggs {
  import Qx._

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H-Q1-shaped pricing summary — the flagship aggregate
    * (README.md:8-9 cost comparison). Scan → filter → project →
    * hash-agg → sort; whole-stage-codegen end to end, parquet filter
    * pushdown on l_shipdate. */
  val aggGroupbyHash: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("2000-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Grand totals, no grouping key (README.md:8). */
  val aggGlobal: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem").agg(
      dsum($"l_extendedprice").as("total_price"),
      dsum($"l_quantity").as("total_qty"),
      davg($"l_discount").as("avg_disc"),
      count(lit(1)).as("n_rows"),
      min($"l_shipdate").as("min_ship"),
      max($"l_shipdate").as("max_ship"))
  }

  /** Post-aggregate filter — the therapeutic-duplication shape:
    * GROUP BY key HAVING count > threshold (README.md:3,9,23). */
  val aggHaving: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .groupBy($"o_custkey", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_spent"))
      .filter($"n_orders" > 3)
      .orderBy($"o_custkey", $"o_orderstatus")
  }

  /** Exact distinct counts per group (README.md:7-8). */
  val aggCountDistinct: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_orderkey").as("n_orders"))
      .orderBy($"l_returnflag")
  }

  /** HLL++ approximate distinct — the 100 TB twin of aggCountDistinct;
    * sketch values differ from DuckDB by construction so no oracle
    * (SURVEY §0.2.3). */
  val aggApproxDistinct: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
           approx_count_distinct($"l_orderkey").as("approx_orders"))
      .orderBy($"l_returnflag")
  }

  /** Mergeable-sketch pre-aggregation — the canonical 100 TB rollup
    * pattern: per-(event_type, day) HLL partial sketches of user_id
    * (what a warehouse materializes per partition), then a second level
    * UNIONs partials per type and estimates distinct users. Any rollup
    * (week, month, global) is a cheap union over the stored sketches —
    * the raw stream is never rescanned. Sketch output is rows-only for
    * the driver (no oracle, like agg_approx_distinct); Round7OpsSpec
    * asserts the merged estimate equals the single-pass estimate
    * EXACTLY (union correctness, bit-deterministic) and sits within
    * HLL error of exact distinct. */
  val aggHllPartialMerge: Q = (s, dir) => {
    import s.implicits._
    val partials = Tables.load(s, dir, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    partials.groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"),
        count(lit(1)).as("n_partials"))
      .orderBy($"event_type")
  }

  /** Heavy hitters via approx_top_k (DataSketches frequent-items).
    * With 5 distinct event types — far below the default
    * maxItemsTracked (10000) — the sketch degenerates to EXACT counts,
    * so unlike the other sketch ops this one faces the DuckDB oracle
    * head-on: top-3 types by count. At real cardinality the same plan
    * keeps a bounded sketch per partial instead of a full hash map —
    * the point of the operator. */
  val aggApproxTopk: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .agg(expr("approx_top_k(event_type, 3)").as("top"))
      .select(explode($"top").as("e"))
      .select($"e.item".as("event_type"), $"e.count".cast("long").as("n"))
      .orderBy($"n".desc, $"event_type")
  }

  /** Multi-level subtotals via GROUPING SETS (README.md:8-9 cost
    * rollups); SQL surface because that is the reference's idiom. */
  val aggGroupingSets: Q = (s, dir) => {
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus) AS INT) AS gid_status,
             CAST(GROUPING(o_orderpriority) AS INT) AS gid_prio,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
  }

  /** Hierarchical rollup region → nation over the dimension join
    * (README.md:8). Dims are tiny (5 / 25 rows) → Catalyst broadcasts
    * them; only the orders→customer join shuffles, and AQE can demote
    * even that at small SF. */
  val aggRollup: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"),
           grouping($"r_name").cast("int").as("gid_r"),
           grouping($"n_name").cast("int").as("gid_n"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  /** All-combination subtotals (README.md:8). */
  val aggCube: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** Per-patient med-list shape (README.md:3,7): collect per-user event
    * types into a deterministically sorted list. The list is emitted
    * joined to one string: the driver's compare loads every result into
    * pandas and sorts all columns, and raw array columns crash that sort
    * (round-1 `unhashable type: numpy.ndarray`) — the collect itself is
    * still exercised, only the output surface is scalar. */
  val aggCollectList: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy($"user_id")
      .agg(array_join(array_sort(collect_set($"event_type")), "|").as("types"),
           count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  /** sum(CASE WHEN ...) pivot-style flag counting (README.md:9). */
  val aggConditional: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        sum(when($"l_discount" > 0.05, 1L).otherwise(0L)).as("n_high_disc"),
        sum(when($"l_tax" > 0.04, 1L).otherwise(0L)).as("n_high_tax"),
        dsum(when($"l_discount" > 0.05, $"l_extendedprice").otherwise(lit(0.0))).as("disc_revenue"))
      .orderBy($"l_returnflag")
  }

  /** Variance/stddev of price per group (README.md:8 pricing analysis).
    * Computed from exact decimal sums — sum(x), sum(x²), n — so both
    * engines derive the identical double from identical inputs; the
    * built-in stddev over doubles is order-dependent and would not
    * hash-match (SURVEY §0.2.2). */
  val aggStats: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_linestatus")
      .agg(dsum($"l_extendedprice").as("s1"),
           dsum($"l_extendedprice" * $"l_extendedprice").as("s2"),
           count(lit(1)).cast("double").as("n"))
      .select($"l_linestatus",
        round(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1.0), 4).as("var_price"),
        round(sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1.0)), 4).as("std_price"))
      .orderBy($"l_linestatus")
  }

  /** Exact interpolated median / p95 per group (README.md:8-9). Spark
    * `percentile` and DuckDB `quantile_cont` both linearly interpolate.
    *
    * CARDINALITY CONTRACT: exact percentile buffers every group's
    * values in executor memory (Spark's `Percentile` is a holistic
    * aggregate — no map-side reduction of the value set). Safe here (3
    * groups, bounded domain); at 100 TB with large groups use the
    * mergeable sketch twin `agg_approx_percentile`
    * ([[aggApproxPercentile]]) — single-pass KLL-style, constant
    * memory per group — and keep the exact form for bounded-group
    * audits only. */
  val aggPercentile: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(round(percentile($"l_quantity", lit(0.5)), 4).as("median_qty"),
           round(percentile($"l_extendedprice", lit(0.95)), 4).as("p95_price"))
      .orderBy($"l_returnflag")
  }

  /** Correlation/covariance of price vs quantity per group — pricing
    * analysis (README.md:8). Derived from exact decimal sums (Σx, Σy,
    * Σxy, Σx², n) like aggStats: the built-in corr/covar over doubles
    * is accumulation-order-dependent and would not hash-match; from
    * identical exact sums both engines compute the identical double. */
  val aggCorr: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(dsum($"l_quantity").as("sx"),
        dsum($"l_extendedprice").as("sy"),
        dsum($"l_quantity" * $"l_extendedprice").as("sxy"),
        dsum($"l_quantity" * $"l_quantity").as("sxx"),
        dsum($"l_extendedprice" * $"l_extendedprice").as("syy"),
        count(lit(1)).cast("double").as("n"))
      .select($"l_returnflag",
        // Degenerate-group guards (mirrored in the oracle CTE): covar is
        // undefined for n<=1 (the n−1 divisor), corr additionally for a
        // zero-variance side (sqrt(0) divisor) — null, not NaN/±inf.
        round(when($"n" > 1.0,
          ($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - 1.0)), 4).as("covar_qty_price"),
        round(when($"n" > 1.0 &&
            $"sxx" - $"sx" * $"sx" / $"n" > 0.0 &&
            $"syy" - $"sy" * $"sy" / $"n" > 0.0,
          ($"sxy" - $"sx" * $"sy" / $"n") /
            (sqrt($"sxx" - $"sx" * $"sx" / $"n") *
             sqrt($"syy" - $"sy" * $"sy" / $"n"))), 6).as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }

  /** arg-min/arg-max — "the latest coverage row per patient"
    * (README.md:7) as a single-pass aggregate instead of a window +
    * filter: no per-group sort, just a mergeable (key, value) max.
    * The ordering key packs (days, orderkey) into one bigint so it's
    * total (ties on date broken by key) — max_by with a tied key is
    * nondeterministic in both engines. */
  val aggArgminmax: Q = (s, dir) => {
    import s.implicits._
    val key = datediff($"o_orderdate", lit("1970-01-01").cast("date")) *
      10000000000L + $"o_orderkey"
    Tables.load(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(max_by($"o_orderkey", key).as("latest_order"),
        min_by($"o_orderkey", key).as("first_order"),
        max_by($"o_totalprice", key).as("latest_price"))
      .orderBy($"o_custkey")
  }

  /** Sketch percentile next to its exact twin in one row — the
    * 100 TB pattern: approx_percentile is a single-pass mergeable
    * sketch (no global sort), the exact form is the correctness
    * reference. No oracle (sketch, SURVEY §0.2.3): DuckDB's
    * approximation differs by construction; the exact column is
    * already oracle-covered by agg_percentile. */
  val aggApproxPercentile: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_percentile($"l_extendedprice", lit(0.5), lit(1000))
          .as("approx_median_price"),
        round(percentile($"l_extendedprice", lit(0.5)), 4)
          .as("exact_median_price"))
      .orderBy($"l_returnflag")
  }

  /** Two-stage salted aggregation — the skew-mitigation pattern: a hot
    * key is first split across 8 salt shards (partial agg per shard
    * shuffles on the wide (key, salt) pair), then the shards collapse
    * in a second, tiny aggregation. Partial sums stay DECIMAL between
    * stages so the two-stage total is exactly the one-stage total. */
  val aggSaltedSkew: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val partial = Tables.load(s, dir, "events")
      .withColumn("salt", pmod(xxhash64($"event_id"), lit(8)))
      .groupBy($"user_id", $"salt")
      .agg(count(lit(1)).as("pc"),
        sum($"value".cast(DecimalType(38, 6))).as("ps"))
    partial.groupBy($"user_id")
      .agg(sum($"pc").as("n"), sum($"ps").cast("double").as("total_value"))
      .orderBy($"user_id")
  }

  /** Pivot — rows to columns (flag counting per README.md:9, as the
    * dedicated relational operator): per-user event counts, one column
    * per event type. Values are pinned explicitly so the plan needs no
    * discovery pass and the output schema is stable at any scale. */
  val aggPivot: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_id")
  }

  /** Unpivot — columns to rows (the melt half of the pivot pair):
    * part's numeric attributes as (key, metric, value) triples. */
  val aggUnpivot: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "part")
      .select($"p_partkey", $"p_size".cast("double").as("size"),
        $"p_retailprice".as("retailprice"))
      .unpivot(Array($"p_partkey"), Array($"size", $"retailprice"),
        "metric", "value")
      .orderBy($"p_partkey", $"metric")
  }

  /** Statistical mode per group, DETERMINISTIC: Spark's `mode()` and
    * DuckDB's both pick an arbitrary value on tied frequencies, so
    * neither would hash-match; this derives the mode as count → rank
    * with a total ordering (highest count, then smallest value) — same
    * two-agg shape either engine would run, no arbitrary tiebreak. */
  val aggMode: Q = (s, dir) => {
    import s.implicits._
    val counts = Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_quantity")
      .agg(count(lit(1)).as("n_occ"))
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"n_occ".desc, $"l_quantity".asc)
    counts.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"l_returnflag", $"l_quantity".as("mode_qty"), $"n_occ")
      .orderBy($"l_returnflag")
  }

  /** Exact weighted median per group (l_extendedprice weighted by
    * l_quantity): smallest value whose cumulative weight reaches half
    * the group total. Integer-exact — weights are integral, so every
    * comparison is `2·cum ≥ W` on longs, never a float tolerance.
    *
    * Scale shape: the naive form windows over EVERY row of a group
    * (3 groups → 200k-row skewed partitions at sf0.1, unbounded at
    * 100 TB). Instead the rows collapse onto the (group, value) GRID
    * first — a map-side-combined hash-agg — and the cumulative window
    * runs over grid rows only, bounded by the value cardinality (a
    * 2-decimal money grid), not the row count. The total-weight side
    * is 3 rows, broadcast. */
  val aggWeightedMedian: Q = (s, dir) => {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
      .select($"l_returnflag", $"l_extendedprice",
        $"l_quantity".cast("long").as("w"))
    val grid = li.groupBy($"l_returnflag", $"l_extendedprice")
      .agg(sum($"w").as("gw"))
    val tot = grid.groupBy($"l_returnflag").agg(sum($"gw").as("tw"))
    val win = Window.partitionBy($"l_returnflag").orderBy($"l_extendedprice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum", sum($"gw").over(win))
      .join(broadcast(tot), "l_returnflag")
      .filter($"cum" * 2 >= $"tw")
      .groupBy($"l_returnflag", $"tw")
      .agg(min($"l_extendedprice").as("weighted_median"))
      .select($"l_returnflag", $"tw".as("total_weight"), $"weighted_median")
      .orderBy($"l_returnflag")
  }

  /** Shannon entropy of each user's event-type distribution — the
    * diversity/quality metric a training-mix pipeline computes per
    * source or per shard (a user whose events are all one type scores
    * 0; uniform over k types scores ln k). Counts collapse to the
    * (user, type) grid by a map-side-combined agg (≤ 5 types per user
    * here; bounded by the type vocabulary at any scale), the per-user
    * total joins back on the SAME user_id partitioning (no extra
    * shuffle — hash(user_id) satisfies both aggs), and the entropy
    * sum runs over grid rows. ROUND(4) on both engines absorbs the
    * ulp difference between their ln/summation orders (the
    * ts_anomaly_zscore precedent). */
  val aggEntropy: Q = (s, dir) => {
    import s.implicits._
    val counts = Tables.load(s, dir, "events")
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
    val tot = counts.groupBy($"user_id")
      .agg(sum($"n").as("tot"), count(lit(1)).as("n_types"))
    counts.join(tot, "user_id")
      .select($"user_id", $"tot", $"n_types",
        ($"n".cast("double") / $"tot".cast("double")).as("p"))
      .groupBy($"user_id", $"tot".as("n_events"), $"n_types")
      // + 0.0 normalizes IEEE -0.0 (a single-type user: -sum(0*ln 1))
      // BEFORE round — Spark's round maps -0.0 → 0.0 via BigDecimal but
      // DuckDB's preserves the sign, so without the nudge a one-type
      // user would hash-mismatch (mirrored in the oracle SQL)
      .agg(round(-sum($"p" * log($"p")) + 0.0, 4).as("entropy"))
      .orderBy($"user_id")
  }

  /** Equi-width histogram of l_extendedprice (20 bins over the data's
    * own [min, max]) — the distribution profile behind optimizer
    * selectivity estimates and data-quality dashboards, and the natural
    * companion of `profile_table`'s scalar stats.
    *
    * Two passes by necessity (bounds must exist before binning), but
    * pass 1 is a 1-row min/max aggregate broadcast back onto the scan —
    * the fact table shuffles only once, collapsed to ≤ 20 bin rows by a
    * map-side-combined count. Determinism: bin = floor((x−mn)/width) is
    * IEEE-identical on both engines given identical doubles (same ops,
    * same order); the top value clamps into the last bin; bounds are
    * reported rounded for display only. */
  val aggHistogram: Q = (s, dir) => {
    import s.implicits._
    val nb = 20
    val li = Tables.load(s, dir, "lineitem").select($"l_extendedprice".as("x"))
    val stats = li.agg(min($"x").as("mn"), max($"x").as("mx"))
    li.crossJoin(broadcast(stats))
      .select(least(floor(($"x" - $"mn") / (($"mx" - $"mn") / nb)), lit(nb - 1))
        .cast("long").as("bin"))
      .groupBy($"bin").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(stats))
      .select($"bin", $"n",
        round($"mn" + $"bin" * (($"mx" - $"mn") / nb), 4).as("bin_lo"),
        round($"mn" + ($"bin" + 1) * (($"mx" - $"mn") / nb), 4).as("bin_hi"))
      .orderBy($"bin")
  }

  val queries: Map[String, Q] = Map(
    "agg_entropy" -> aggEntropy,
    "agg_histogram" -> aggHistogram,
    "agg_hll_partial_merge" -> aggHllPartialMerge,
    "agg_approx_topk" -> aggApproxTopk,
    "agg_weighted_median" -> aggWeightedMedian,
    "agg_mode" -> aggMode,
    "agg_pivot" -> aggPivot,
    "agg_unpivot" -> aggUnpivot,
    "agg_salted_skew" -> aggSaltedSkew,
    "agg_approx_percentile" -> aggApproxPercentile,
    "agg_argminmax" -> aggArgminmax,
    "agg_corr" -> aggCorr,
    "agg_groupby_hash" -> aggGroupbyHash,
    "agg_global" -> aggGlobal,
    "agg_having" -> aggHaving,
    "agg_count_distinct" -> aggCountDistinct,
    "agg_approx_distinct" -> aggApproxDistinct,
    "agg_grouping_sets" -> aggGroupingSets,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "agg_collect_list" -> aggCollectList,
    "agg_conditional" -> aggConditional,
    "agg_stats" -> aggStats,
    "agg_percentile" -> aggPercentile)

  val oracle: Map[String, String] = Map(
    "agg_histogram" -> """
      WITH s AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
                 FROM lineitem),
      b AS (SELECT LEAST(CAST(floor((l_extendedprice - mn) / ((mx - mn) / 20))
                              AS BIGINT), 19) AS bin
            FROM lineitem, s),
      c AS (SELECT bin, COUNT(*) AS n FROM b GROUP BY bin)
      SELECT bin, n,
             ROUND(mn + bin * ((mx - mn) / 20), 4) AS bin_lo,
             ROUND(mn + (bin + 1) * ((mx - mn) / 20), 4) AS bin_hi
      FROM c, s ORDER BY bin""",
    "agg_approx_topk" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
      ORDER BY n DESC, event_type LIMIT 3""",
    "agg_weighted_median" -> """
      WITH grid AS (
        SELECT l_returnflag, l_extendedprice,
               SUM(CAST(l_quantity AS BIGINT)) AS gw
        FROM lineitem GROUP BY 1, 2),
      tot AS (SELECT l_returnflag, SUM(gw) AS tw FROM grid GROUP BY 1),
      cum AS (
        SELECT l_returnflag, l_extendedprice,
               SUM(gw) OVER (PARTITION BY l_returnflag
                             ORDER BY l_extendedprice
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
        FROM grid)
      SELECT c.l_returnflag, CAST(t.tw AS BIGINT) AS total_weight,
             MIN(c.l_extendedprice) AS weighted_median
      FROM cum c JOIN tot t ON c.l_returnflag = t.l_returnflag
      WHERE c.cum * 2 >= t.tw
      GROUP BY 1, 2 ORDER BY 1""",
    // Same grid → total → -Σ p ln p algebra; ROUND(4) on both engines
    // absorbs ln/summation-order ulps (ts_anomaly_zscore precedent).
    "agg_entropy" -> """
      WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                 FROM events GROUP BY 1, 2),
      t AS (SELECT user_id, SUM(n) AS tot, COUNT(*) AS n_types
            FROM c GROUP BY user_id)
      SELECT c.user_id, CAST(t.tot AS BIGINT) AS n_events,
             CAST(t.n_types AS BIGINT) AS n_types,
             ROUND(-SUM((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
                        * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))) + 0.0, 4)
               AS entropy
      FROM c JOIN t ON c.user_id = t.user_id
      GROUP BY c.user_id, t.tot, t.n_types
      ORDER BY c.user_id""",
    "agg_mode" -> """
      WITH c AS (SELECT l_returnflag, l_quantity, COUNT(*) AS n_occ
                 FROM lineitem GROUP BY 1, 2),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
              ORDER BY n_occ DESC, l_quantity ASC) AS rn FROM c)
      SELECT l_returnflag, l_quantity AS mode_qty, n_occ
      FROM r WHERE rn = 1 ORDER BY l_returnflag""",
    "agg_unpivot" -> """
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
      ORDER BY p_partkey, metric""",
    "agg_pivot" -> """
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events GROUP BY user_id ORDER BY user_id""",
    "agg_salted_skew" -> s"""
      SELECT user_id, COUNT(*) AS n, ${dsumSql("value")} AS total_value
      FROM events GROUP BY user_id ORDER BY user_id""",
    "agg_groupby_hash" -> s"""
      SELECT l_returnflag, l_linestatus,
             ${dsumSql("l_quantity")} AS sum_qty,
             ${dsumSql("l_extendedprice")} AS sum_base_price,
             ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
             ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
             ${davgSql("l_quantity")} AS avg_qty,
             ${davgSql("l_extendedprice")} AS avg_price,
             ${davgSql("l_discount")} AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "agg_global" -> s"""
      SELECT ${dsumSql("l_extendedprice")} AS total_price,
             ${dsumSql("l_quantity")} AS total_qty,
             ${davgSql("l_discount")} AS avg_disc,
             COUNT(*) AS n_rows,
             MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
      FROM lineitem""",
    "agg_having" -> s"""
      SELECT o_custkey, o_orderstatus, COUNT(*) AS n_orders,
             ${dsumSql("o_totalprice")} AS total_spent
      FROM orders GROUP BY o_custkey, o_orderstatus
      HAVING COUNT(*) > 3 ORDER BY o_custkey, o_orderstatus""",
    "agg_count_distinct" -> """
      SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_grouping_sets" -> s"""
      SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus) AS INT) AS gid_status,
             CAST(GROUPING(o_orderpriority) AS INT) AS gid_prio,
             COUNT(*) AS n,
             ${dsumSql("o_totalprice")} AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "agg_rollup" -> s"""
      SELECT r_name, n_name, COUNT(*) AS n_orders,
             ${dsumSql("o_totalprice")} AS revenue,
             CAST(GROUPING(r_name) AS INT) AS gid_r,
             CAST(GROUPING(n_name) AS INT) AS gid_n
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",
    "agg_cube" -> s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             ${dsumSql("l_quantity")} AS qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "agg_collect_list" -> """
      SELECT user_id,
             string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS types,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events
      GROUP BY user_id ORDER BY user_id""",
    "agg_corr" -> s"""
      SELECT l_returnflag,
             ROUND(CASE WHEN n > 1.0
               THEN (sxy - sx * sy / n) / (n - 1.0) END, 4) AS covar_qty_price,
             ROUND(CASE WHEN n > 1.0 AND sxx - sx * sx / n > 0.0
                         AND syy - sy * sy / n > 0.0
               THEN (sxy - sx * sy / n) /
                 (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)) END, 6)
               AS corr_qty_price
      FROM (SELECT l_returnflag,
                   ${dsumSql("l_quantity")} AS sx,
                   ${dsumSql("l_extendedprice")} AS sy,
                   ${dsumSql("l_quantity * l_extendedprice")} AS sxy,
                   ${dsumSql("l_quantity * l_quantity")} AS sxx,
                   ${dsumSql("l_extendedprice * l_extendedprice")} AS syy,
                   CAST(COUNT(*) AS DOUBLE) AS n
            FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag""",
    "agg_argminmax" -> """
      SELECT o_custkey,
             arg_max(o_orderkey, date_diff('day',
               TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
               * 10000000000 + o_orderkey) AS latest_order,
             arg_min(o_orderkey, date_diff('day',
               TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
               * 10000000000 + o_orderkey) AS first_order,
             arg_max(o_totalprice, date_diff('day',
               TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
               * 10000000000 + o_orderkey) AS latest_price
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "agg_conditional" -> s"""
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
             CAST(SUM(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_tax,
             ${dsumSql("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END")} AS disc_revenue
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_stats" -> s"""
      SELECT l_linestatus,
             ROUND((s2 - s1 * s1 / n) / (n - 1.0), 4) AS var_price,
             ROUND(SQRT((s2 - s1 * s1 / n) / (n - 1.0)), 4) AS std_price
      FROM (SELECT l_linestatus,
                   ${dsumSql("l_extendedprice")} AS s1,
                   ${dsumSql("l_extendedprice * l_extendedprice")} AS s2,
                   CAST(COUNT(*) AS DOUBLE) AS n
            FROM lineitem GROUP BY l_linestatus)
      ORDER BY l_linestatus""",
    "agg_percentile" -> """
      SELECT l_returnflag,
             ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
             ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
