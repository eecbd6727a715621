package graft.plans

import graft.sources.Snapshots
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction}
import org.apache.spark.sql.classic.GraftSqlBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO SQL surface for the snapshot-commit store.
  *
  * Stock Spark 4 PARSES `MERGE INTO` but only EXECUTES it against a v2
  * table whose catalog implements row-level operations (probe result,
  * quoted in PLANS.md: `[UNSUPPORTED_FEATURE.TABLE_OPERATION] Table …
  * does not support MERGE INTO TABLE` on any default-catalog table) —
  * the analyzers for it live behind Delta/Iceberg-style connectors that
  * are not on this classpath, and adding one is out of scope by the
  * build rules. So graft executes the statement itself: Spark's own
  * parser produces the [[MergeIntoTable]] tree (full SQL fidelity — no
  * home-grown grammar), and this interpreter lowers the tree onto the
  * DataFrame algebra:
  *
  *   FULL OUTER join of target and source on the merge condition, with
  *   existence markers on both sides; each output column is a CASE
  *   chain over the three clause families, and each family evaluates
  *   its WHEN [AND cond] actions in declaration order (first match
  *   wins, exactly the SQL contract):
  *     matched          → UPDATE assignment / DELETE drop / fallthrough keep
  *     not matched      → INSERT values / fallthrough drop
  *     not matched by source → UPDATE / DELETE / fallthrough keep
  *
  * The SQL MERGE cardinality rule is enforced: a target row matched by
  * more than one source row raises `MERGE cardinality violation`
  * (window count over a per-target-row id, fused into the keep filter)
  * instead of silently duplicating the target row — the same error
  * Delta and Iceberg raise on an ambiguous source.
  *
  * The write-back is COPY-ON-WRITE against [[Snapshots]]: the merged
  * result lands in a fresh versioned dir and publishes with one atomic
  * manifest commit, so concurrent readers see the pre-merge or
  * post-merge table, never a mix — the same guarantee a Delta MERGE
  * gives, produced by the same protocol shape.
  *
  * Scale: the lowered plan is ONE full-outer shuffle join on the merge
  * keys (AQE broadcasts a small source), identical to the DataFrame
  * `cdc_merge_apply` it mirrors; at 100 TB a real deployment would
  * scope the rewrite to affected partitions, which the snapshot layer
  * supports by committing per-partition file sets.
  *
  * Supported shape: equi-or-any merge condition, UPDATE SET / DELETE /
  * INSERT (cols) VALUES (exprs) with optional AND conditions. Star
  * forms (`UPDATE SET *`, `INSERT *`) and schema evolution raise a
  * clear unsupported error.
  */
object MergeSql {

  /** Parse and execute one MERGE INTO statement. `tables` maps the
    * statement's target table name to its snapshot root; the source
    * relation resolves against the session's temp views. Returns the
    * post-merge table read through the new snapshot head. */
  def mergeInto(spark: SparkSession, sql: String,
      tables: Map[String, String]): DataFrame = {
    val m = spark.sessionState.sqlParser.parsePlan(sql) match {
      case m: MergeIntoTable => m
      case other => throw new IllegalArgumentException(
        s"not a MERGE INTO statement: ${other.getClass.getSimpleName}")
    }
    require(!m.withSchemaEvolution, "WITH SCHEMA EVOLUTION is not supported")

    val (targetName, targetAlias) = RowSql.unwrapTarget(m.targetTable)
    val (sourceName, sourceAlias) = RowSql.unwrapTarget(m.sourceTable)
    val root = RowSql.rootIn(tables, targetName)

    val tMark = "__graft_t_exists"
    val sMark = "__graft_s_exists"
    val tId = "__graft_t_id"
    val target = Snapshots.read(spark, root)
    val targetCols = target.columns.toSeq

    // every UPDATE SET / INSERT column must name a real target column —
    // a misspelled name silently matching nothing would keep the old
    // value (no-op UPDATE) or NULL-fill the INSERT instead of erroring
    // like any engine
    def checkAssignment(a: Assignment): Unit = a.key match {
      case k: UnresolvedAttribute =>
        require(targetCols.exists(_.equalsIgnoreCase(k.nameParts.last)),
          s"MERGE assignment references unknown target column " +
            s"'${k.nameParts.mkString(".")}' (target columns: " +
            s"${targetCols.mkString(", ")})")
      case other => throw new IllegalArgumentException(
        s"unsupported assignment key shape: $other")
    }
    (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
      .foreach {
        case UpdateAction(_, assigns, _) => assigns.foreach(checkAssignment)
        case InsertAction(_, assigns) => assigns.foreach(checkAssignment)
        case _ => ()
      }
    val t = target.withColumn(tMark, lit(true))
      .withColumn(tId, monotonically_increasing_id())
      .alias(targetAlias.getOrElse(targetName))
    val s = spark.table(sourceName).withColumn(sMark, lit(true))
      .alias(sourceAlias.getOrElse(sourceName))
    val joined = t.join(s, GraftSqlBridge.column(m.mergeCondition), "full_outer")
    val matched = col(tMark).isNotNull && col(sMark).isNotNull
    val sourceOnly = col(tMark).isNull && col(sMark).isNotNull

    def condCol(c: Option[Expression]): Column =
      c.map(GraftSqlBridge.column).getOrElse(lit(true))
    def assigned(assigns: Seq[Assignment], colName: String): Option[Column] =
      assigns.collectFirst {
        case Assignment(k: UnresolvedAttribute, v)
            if k.nameParts.last.equalsIgnoreCase(colName) =>
          GraftSqlBridge.column(v)
      }

    /** First-match-wins CASE over one clause family for one output
      * column; `default` is the fallthrough (old value / NULL). */
    def chainValue(actions: Seq[MergeAction], colName: String,
        default: Column): Column =
      actions.foldRight(default) { (a, rest) =>
        a match {
          case UpdateAction(c, assigns, _) =>
            when(condCol(c), assigned(assigns, colName).getOrElse(default))
              .otherwise(rest)
          case DeleteAction(c) =>
            // value is irrelevant on a deleted row; keep the chain shape
            when(condCol(c), default).otherwise(rest)
          case InsertAction(c, assigns) =>
            when(condCol(c), assigned(assigns, colName).getOrElse(lit(null)))
              .otherwise(rest)
          case other => throw new IllegalArgumentException(
            s"unsupported MERGE action: ${other.getClass.getSimpleName} " +
              "(star forms are not supported)")
        }
      }

    /** Same chain deciding row survival. */
    def chainKeep(actions: Seq[MergeAction], default: Column): Column =
      actions.foldRight(default) { (a, rest) =>
        a match {
          case UpdateAction(c, _, _) => when(condCol(c), lit(true)).otherwise(rest)
          case DeleteAction(c) => when(condCol(c), lit(false)).otherwise(rest)
          case InsertAction(c, _) => when(condCol(c), lit(true)).otherwise(rest)
          case other => throw new IllegalArgumentException(
            s"unsupported MERGE action: ${other.getClass.getSimpleName} " +
              "(star forms are not supported)")
        }
      }

    val keep = when(matched, chainKeep(m.matchedActions, lit(true)))
      .when(sourceOnly, chainKeep(m.notMatchedActions, lit(false)))
      .otherwise(chainKeep(m.notMatchedBySourceActions, lit(true)))
    val outCols = targetCols.map { c =>
      when(matched, chainValue(m.matchedActions, c, target(c)))
        .when(sourceOnly, chainValue(m.notMatchedActions, c, lit(null)))
        .otherwise(chainValue(m.notMatchedBySourceActions, c, target(c)))
        .as(c)
    }
    // MERGE cardinality contract (SQL standard; Delta/Iceberg raise the
    // same error): if more than one source row matches a single target
    // row, the statement is ambiguous — this lowering would otherwise
    // silently fan the target row out into one output per matched
    // source row. Count matched pairs per target row identity with a
    // window (an extra exchange on the row id, the same cost Delta pays
    // for its cardinality-check job) and raise in the keep filter, which
    // every row passes through, so the guard cannot be pruned. Source-
    // only rows get a unique synthetic key (negative, disjoint from the
    // non-negative target ids) so the window never piles all inserts
    // into one partition. The ids are materialized in a Project first —
    // nondeterministic expressions are not legal in a window spec.
    val wKey = "__graft_w_key"
    val mCnt = "__graft_m_cnt"
    val mRn = "__graft_m_rn"
    val perTarget = Window.partitionBy(col(wKey))
    val counted = joined
      .withColumn(wKey, coalesce(col(tId), -(monotonically_increasing_id() + 1)))
      .withColumn(mCnt, count(when(matched, lit(1))).over(perTarget))
      .withColumn(mRn, row_number().over(perTarget.orderBy(col(wKey))))
    // Cardinality: the SQL (and Delta/Iceberg) violation applies only
    // when a MATCHED ACTION would consume the ambiguous match — with no
    // WHEN MATCHED clauses at all (insert-only merges), duplicate
    // source matches are legal and the full-outer fan-out is collapsed
    // back to ONE copy of the target row (all copies carry identical
    // target values, so which survives is immaterial).
    val keepGuarded =
      if (m.matchedActions.isEmpty)
        when(matched && col(mRn) > 1, lit(false)).otherwise(keep)
      else when(matched && col(mCnt) > 1,
        raise_error(lit("MERGE cardinality violation: a target row matched " +
          "more than one source row; deduplicate the source on the merge " +
          "keys or tighten the ON condition")).cast("boolean"))
        .otherwise(keep)
    val merged = counted
      .select(outCols :+ keepGuarded.as("__graft_keep"): _*)
      .filter(col("__graft_keep"))
      .drop("__graft_keep")

    // copy-on-write: the merged rows land in a NEW versioned dir while
    // the old files keep serving readers; the manifest publish flips
    // the head atomically
    Snapshots.commit(root)(out => merged.write.mode("append").parquet(out))
    Snapshots.read(spark, root)
  }
}
