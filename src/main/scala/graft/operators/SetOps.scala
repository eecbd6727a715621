package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY §2.7).
  *
  * Reference basis: dual ingestion paths (HL7-derived + FHIR-derived
  * meds, /root/reference/README.md:3,7,76) concatenated into one table;
  * formulary ∩ prescribed and prescribed ∖ formulary alignment checks
  * (README.md:9). UNION ALL is shuffle-free in Spark (plan union);
  * INTERSECT/EXCEPT compile to aggregate + semi/anti shapes.
  */
object SetOps {

  type Q = (SparkSession, String) => DataFrame

  /** Concatenate two source-tagged subsets (README.md:76) — the tag makes
    * (src, o_orderkey) a unique sort key even where subsets overlap. */
  val setUnionAll: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val a = o.filter($"o_orderstatus" === "F")
      .select(lit("src_f").as("src"), $"o_orderkey", $"o_totalprice")
    val b = o.filter($"o_totalprice" > 250000.0)
      .select(lit("src_hi").as("src"), $"o_orderkey", $"o_totalprice")
    a.unionByName(b).orderBy($"src", $"o_orderkey")
  }

  /** Deduplicated union of two key sets (README.md:76). */
  val setUnionDistinct: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val a = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val b = o.filter($"o_orderstatus" === "O").select($"o_custkey")
    a.union(b).distinct().orderBy($"o_custkey")
  }

  /** Keys present in both sets — formulary ∩ prescribed (README.md:9). */
  val setIntersect: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val a = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val b = o.filter($"o_orderstatus" === "P").select($"o_custkey")
    a.intersect(b).orderBy($"o_custkey")
  }

  /** A ∖ B — prescribed but not on formulary (README.md:9). */
  val setExcept: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val a = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val b = o.filter($"o_orderstatus" === "P").select($"o_custkey")
    a.except(b).orderBy($"o_custkey")
  }

  /** Multiset A ∖ B (EXCEPT ALL): duplicates matter — a patient filling
    * a drug 3× with 1 formulary match keeps 2 rows, which the set form
    * would erase. Spark compiles this to a count-and-replicate
    * aggregate, not a join per duplicate. Output rows repeat, but
    * repeated rows are identical, so the ORDER BY is still stable. */
  val setExceptAll: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val a = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val b = o.filter($"o_orderstatus" === "P").select($"o_custkey")
    a.exceptAll(b).orderBy($"o_custkey")
  }

  /** Multiset A ∩ B (INTERSECT ALL): pairwise-matched duplicates. */
  val setIntersectAll: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val a = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val b = o.filter($"o_orderstatus" === "O").select($"o_custkey")
    a.intersectAll(b).orderBy($"o_custkey")
  }

  val queries: Map[String, Q] = Map(
    "set_union_all" -> setUnionAll,
    "set_union_distinct" -> setUnionDistinct,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "set_except_all" -> setExceptAll,
    "set_intersect_all" -> setIntersectAll)

  val oracle: Map[String, String] = Map(
    "set_union_all" -> """
      SELECT 'src_f' AS src, o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT 'src_hi' AS src, o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 250000.0
      ORDER BY src, o_orderkey""",
    "set_union_distinct" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_custkey""",
    "set_intersect" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      ORDER BY o_custkey""",
    "set_except_all" -> """
      SELECT * FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      ORDER BY o_custkey""",
    "set_intersect_all" -> """
      SELECT * FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      ORDER BY o_custkey""",
    "set_except" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      ORDER BY o_custkey""")
}
