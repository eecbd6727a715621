package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Scans
import graft.streaming.Streamy
import graft.functions.{Scalars, Udfs}
import graft.domain.DomainQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each queries key is one operator from SURVEY §2; oracleSql pairs it
  * with ANSI SQL that DuckDB 1.0.0 runs over the same parquet tables.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.aggGroupbyHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every entry installs the graft optimizer/planner extensions
    * ([[graft.plans.TopK.ensure]] — idempotent) before building its
    * plan. Without this, whether e.g. `RewriteRowNumberTopK` fires on a
    * given query would depend on which query ran FIRST in a shared
    * session (only the native-TopK entries called ensure themselves) —
    * order-dependent plans, order-dependent timings. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Scans.queries ++ Projections.queries ++ Joins.queries ++ SetOps.queries ++
    Aggs.queries ++ Windows.queries ++ Scalars.queries ++ Udfs.queries ++
    Streamy.queries ++ TextOps.queries ++ SimOps.queries ++ CdcOps.queries ++
    WarehouseOps.queries ++ DomainQueries.queries).map { case (name, fn) =>
      name -> { (s: SparkSession, dir: String) =>
        graft.plans.TopK.ensure(s); fn(s, dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracle ++ Projections.oracle ++ Joins.oracle ++ SetOps.oracle ++
    Aggs.oracle ++ Windows.oracle ++ Scalars.oracle ++ Udfs.oracle ++
    Streamy.oracle ++ TextOps.oracle ++ SimOps.oracle ++ CdcOps.oracle ++
    WarehouseOps.oracle ++ DomainQueries.oracle
}
