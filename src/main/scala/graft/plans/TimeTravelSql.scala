package graft.plans

import graft.sources.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.GraftSqlBridge

/** `VERSION AS OF` SQL for the snapshot-commit store — the time-travel
  * statement surface completing [[MergeSql]]/[[RowSql]]'s SQL parity.
  *
  * Spark's parser understands the full time-travel grammar
  * (`FROM t VERSION AS OF 3`) and produces [[RelationTimeTravel]]
  * nodes, but executing them needs a v2 catalog — same gap as MERGE /
  * UPDATE / DELETE. Instead of interpreting the whole SELECT, this
  * executor SUBSTITUTES: every `RelationTimeTravel` over a known
  * snapshot table becomes the logical plan of
  * [[Snapshots.readAt]] (that version's pinned, immutable file list),
  * every bare reference to a known snapshot table becomes the head
  * read, and the rewritten tree goes back through Spark's own
  * analyzer/optimizer — so arbitrary SQL (joins ACROSS versions,
  * unions of eras, subqueries) works unmodified, and Catalyst plans
  * it like any other query.
  *
  * Scale: resolving a version is one small manifest read; the
  * substituted scans are ordinary pruned parquet scans over that
  * version's files. Cross-version queries (today-vs-last-week) cost
  * two scans + whatever the query does — history itself is free
  * because committed files are immutable. `TIMESTAMP AS OF <lit>`
  * resolves through the manifest's `#ts:` commit-time header
  * ([[Snapshots.versionAtTimestamp]]: newest commit <= the literal,
  * Delta's rule) and then takes the same pinned-file-list path.
  */
object TimeTravelSql {

  /** Parse and run one SELECT whose FROM clauses may reference
    * snapshot tables, optionally with `VERSION AS OF n`. `tables` maps
    * table names to snapshot roots; names not in the map are left to
    * the session catalog (temp views etc.).
    *
    * Substitution scope, precisely: only BARE single-part references
    * (`FROM sales`, not `FROM prod.sales` — a qualified name is the
    * session catalog's, never collapsed to its last part) that are not
    * shadowed by a CTE of the same name (`WITH sales AS ...` binds
    * tighter, exactly as it would against a real catalog table), and
    * the rewrite descends into expression-embedded subqueries
    * (IN/EXISTS/scalar) — `transformUpWithSubqueries`, not plain
    * transformUp, or those references would silently miss. */
  def sql(spark: SparkSession, query: String,
      tables: Map[String, String]): DataFrame = {
    val parsed = spark.sessionState.sqlParser.parsePlan(query)
    // CTE-bound names shadow snapshot tables (standard SQL scoping):
    // collect them BEFORE substitution so `WITH sales AS (...)` keeps
    // referring to the CTE even when a snapshot table is named sales.
    // (Conservative: CTE names are scoped per WITH clause, but a
    // same-named CTE anywhere in the statement makes the bare name
    // ambiguous enough that deferring to the CTE is the safe read.)
    // collection must cover the SAME tree the substitution walks:
    // substitution uses transformUpWithSubqueries (descends into
    // IN/EXISTS/scalar-subquery plans), so CTE names are gathered with
    // the subquery-aware foreach — a CTE defined INSIDE an expression-
    // embedded subquery that shares a snapshot table's name would
    // otherwise be missed here and wrongly substituted there
    val cteNames: Set[String] = {
      val b = Set.newBuilder[String]
      parsed.foreachWithSubqueries {
        case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
          w.cteRelations.foreach { case (name, _, _) => b += name.toLowerCase }
        case _ => ()
      }
      b.result()
    }
    val resolver = spark.sessionState.conf.resolver
    def mapped(p: LogicalPlan): Option[String] = p match {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 1 =>
        val name = u.multipartIdentifier.head
        if (cteNames.contains(name.toLowerCase)) None
        else tables.keys.find(resolver(_, name))
      case _ => None
    }
    def planOf(df: DataFrame): LogicalPlan = df.queryExecution.logical
    val substituted = parsed.transformUpWithSubqueries {
      case tt @ RelationTimeTravel(rel, ts, ver) =>
        mapped(rel) match {
          case None => tt // not ours — let the analyzer complain
          case Some(name) =>
            val v = (ts, ver) match {
              case (Some(t), _) =>
                Snapshots.versionAtTimestamp(tables(name), evalTsMicros(spark, t))
              case (None, Some(vv)) if vv.forall(_.isDigit) => vv.toLong
              case (None, Some(tagName)) => // VERSION AS OF 'tag' — a named ref
                Snapshots.tagVersion(tables(name), tagName).getOrElse(
                  throw new IllegalArgumentException(
                    s"no tag '$tagName' on $name"))
              case (None, None) => throw new IllegalArgumentException(
                s"time travel over $name needs VERSION AS OF or TIMESTAMP AS OF")
            }
            planOf(Snapshots.readAt(spark, tables(name), v))
        }
      case u: UnresolvedRelation if mapped(u).isDefined =>
        planOf(Snapshots.read(spark, tables(mapped(u).get)))
    }
    GraftSqlBridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], substituted)
  }

  /** Evaluate a `TIMESTAMP AS OF` operand (a foldable literal like
    * `'2026-08-13 12:00:00'` or `TIMESTAMP'...'`) to epoch µs in the
    * session time zone — the same cast semantics a WHERE-clause
    * comparison against a timestamp column would get. */
  private def evalTsMicros(spark: SparkSession,
      e: org.apache.spark.sql.catalyst.expressions.Expression): Long = {
    require(e.foldable, s"TIMESTAMP AS OF needs a literal, got: ${e.sql}")
    val cast = org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.TimestampType,
      Some(spark.sessionState.conf.sessionLocalTimeZone))
    // ANSI cast raises on a malformed literal; surface one clear error
    // shape for both that and a NULL-producing legacy cast. Catch ONLY
    // the date-time parse family (SparkDateTimeException extends
    // java.time.DateTimeException) — a genuine internal error (analysis
    // bug, unexpected expression type) must propagate, not masquerade
    // as "does not parse as a timestamp".
    val evaled = try Option(cast.eval()) catch {
      case _: java.time.DateTimeException => None
    }
    evaled.map(_.asInstanceOf[Long]).getOrElse(
      throw new IllegalArgumentException(
        s"TIMESTAMP AS OF operand does not parse as a timestamp: ${e.sql}"))
  }
}
