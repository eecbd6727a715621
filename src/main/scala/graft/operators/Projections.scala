package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projections, filters, predicates (SURVEY §2.2) and sorts/limits
  * (SURVEY §2.6).
  *
  * Reference basis: patient/med selection and cost expressions
  * (/root/reference/README.md:8-9,11,71). All pure Column expressions —
  * Catalyst pushes the filters into the parquet scan (PushedFilters) and
  * prunes unread columns, which is the part that matters at 100 TB: the
  * scan reads only the referenced columns' pages and skips row groups
  * via min/max stats.
  */
object Projections {

  type Q = (SparkSession, String) => DataFrame

  /** Column subset + arithmetic (net price = extended × (1−discount)).
    * Per-row double arithmetic is IEEE-identical across engines — no
    * rounding needed (only *sums* are order-dependent). */
  val projectSelect: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"))
      // (l_orderkey, l_linenumber) is NOT unique in the testdata — order
      // by every output column for a total, engine-independent order.
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"net_price")
  }

  /** =, <, BETWEEN, IN, LIKE predicates on the scan (README.md:11,71). */
  val filterPredicate: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .filter($"o_orderstatus" === "F")
      .filter($"o_totalprice".between(50000.0, 200000.0))
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .filter($"o_orderpriority".like("%-%"))
      .filter($"o_orderdate" < lit("2000-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  /** AND/OR/NOT composition (README.md:9 rule flags combine). */
  val filterCompound: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter(($"l_returnflag" === "R" || $"l_linestatus" === "F") &&
        !($"l_discount" < 0.02) && $"l_quantity" >= 25.0)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_linestatus",
        $"l_quantity", $"l_discount")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_linestatus",
        $"l_quantity", $"l_discount")
  }

  /** CASE WHEN bucketing — tier/risk bands (README.md:9). */
  val projectCaseWhen: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice",
        when($"o_totalprice" > 300000.0, "tier1")
          .when($"o_totalprice" > 150000.0, "tier2")
          .when($"o_totalprice" > 50000.0, "tier3")
          .otherwise("tier4").as("price_tier"))
      .orderBy($"o_orderkey")
  }

  /** Casts + coalesce/nullif defaulting for missing data (README.md:8).
    * Note CAST(double AS INT) truncates in Spark but rounds in DuckDB —
    * floor() first so both engines agree. */
  val projectCastNull: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .select($"o_orderkey",
        coalesce(nullif($"o_orderstatus", lit("P")), lit("none")).as("status_or_none"),
        floor($"o_totalprice").cast("long").as("price_floor"),
        $"o_custkey".cast("string").as("custkey_str"),
        year($"o_orderdate").cast("long").as("order_year"))
      .orderBy($"o_orderkey")
  }

  /** Multi-column ASC/DESC with explicit null placement (README.md:11,71). */
  val sortMulticol: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_shipdate")
      .orderBy(desc_nulls_last("l_returnflag"), asc("l_shipdate"),
        asc("l_orderkey"), asc("l_linenumber"))
  }

  /** LIMIT after total sort (README.md:11 UI page). */
  val limitN: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey").limit(100)
  }

  /** Global top-k by measure (README.md:9 cheapest generics) — Spark
    * plans TakeOrderedAndProject: per-partition heap + driver merge, no
    * full sort, no shuffle of the full table. Unique-key tiebreak keeps
    * the result deterministic. */
  val topkGlobal: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(50)
  }

  /** Top-3 lineitems by price per supplier through the NATIVE
    * [[graft.plans.TopKPerGroup]] operator (partial bounded-heap →
    * group exchange → final bounded-heap) instead of the window
    * row_number plan — the per-group analogue of what topk_global gets
    * from TakeOrderedAndProject. Same result as the window form, but
    * the shuffle carries ≤ k·partitions rows per group rather than the
    * whole fact table, and nothing is ever sorted beyond a k-heap. */
  val topkPerGroupNative: Q = (s, dir) => {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
    graft.plans.TopK.perGroup(li, 3, Seq("l_suppkey"),
        Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)))
      .orderBy($"l_suppkey", desc("l_extendedprice"), $"l_orderkey", $"l_linenumber")
  }

  /** The same native operator reached from the SQL SURFACE: the classic
    * `row_number() OVER (...) <= k` idiom, replanned to
    * [[graft.plans.TopKPerGroup]] by [[graft.plans.RewriteRowNumberTopK]]
    * because the rank column is pruned by the outer projection. The
    * DuckDB oracle executes the identical ANSI text, so the rewrite is
    * hash-checked equivalent to the window semantics it replaces. */
  val topkSqlRewrite: Q = (s, dir) => {
    import s.implicits._
    graft.plans.TopK.ensure(s)
    Tables.load(s, dir, "lineitem")
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .createOrReplaceTempView("graft_topk_li")
    s.sql("""SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
        SELECT *, row_number() OVER (PARTITION BY l_suppkey
          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM graft_topk_li) WHERE rn <= 3
        ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""")
  }

  val queries: Map[String, Q] = Map(
    "project_select" -> projectSelect,
    "filter_predicate" -> filterPredicate,
    "filter_compound" -> filterCompound,
    "project_case_when" -> projectCaseWhen,
    "project_cast_null" -> projectCastNull,
    "sort_multicol" -> sortMulticol,
    "limit_n" -> limitN,
    "topk_global" -> topkGlobal,
    "topk_per_group_native" -> topkPerGroupNative,
    "topk_sql_rewrite" -> topkSqlRewrite)

  val oracle: Map[String, String] = Map(
    "project_select" -> """
      SELECT l_orderkey, l_linenumber, l_quantity,
             l_extendedprice * (1.0 - l_discount) AS net_price
      FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, net_price""",
    "filter_predicate" -> """
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_orderstatus = 'F'
        AND o_totalprice BETWEEN 50000.0 AND 200000.0
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_orderpriority LIKE '%-%'
        AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      ORDER BY o_orderkey""",
    "filter_compound" -> """
      SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
             l_quantity, l_discount
      FROM lineitem
      WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
        AND NOT (l_discount < 0.02) AND l_quantity >= 25.0
      ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity, l_discount""",
    "project_case_when" -> """
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_totalprice > 300000.0 THEN 'tier1'
                  WHEN o_totalprice > 150000.0 THEN 'tier2'
                  WHEN o_totalprice > 50000.0 THEN 'tier3'
                  ELSE 'tier4' END AS price_tier
      FROM orders ORDER BY o_orderkey""",
    "project_cast_null" -> """
      SELECT o_orderkey,
             COALESCE(NULLIF(o_orderstatus, 'P'), 'none') AS status_or_none,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
             CAST(o_custkey AS VARCHAR) AS custkey_str,
             CAST(year(o_orderdate) AS BIGINT) AS order_year
      FROM orders ORDER BY o_orderkey""",
    "sort_multicol" -> """
      SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
      FROM lineitem
      ORDER BY l_returnflag DESC NULLS LAST, l_shipdate ASC,
               l_orderkey ASC, l_linenumber ASC""",
    "limit_n" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_orderkey LIMIT 100""",
    "topk_global" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""",
    "topk_per_group_native" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
      FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                   ROW_NUMBER() OVER (PARTITION BY l_suppkey
                     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
            FROM lineitem)
      WHERE rn <= 3
      ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""",
    "topk_sql_rewrite" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
      FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                   ROW_NUMBER() OVER (PARTITION BY l_suppkey
                     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
            FROM lineitem)
      WHERE rn <= 3
      ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""")
}
