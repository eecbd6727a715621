package graft.plans

import graft.sources.Snapshots
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.classic.GraftSqlBridge
import org.apache.spark.sql.functions._

/** UPDATE / DELETE SQL statements for the snapshot-commit store — the
  * row-level companions to [[MergeSql]].
  *
  * Stock Spark 4 PARSES both statements but only EXECUTES them against
  * a v2 catalog implementing row-level operations (same probe family
  * as MERGE: `[UNSUPPORTED_FEATURE.TABLE_OPERATION] Table … does not
  * support DELETE/UPDATE` on any default-catalog table). So graft
  * executes them itself: Spark's own parser produces the
  * [[UpdateTable]] / [[DeleteFromTable]] tree (full SQL fidelity — no
  * home-grown grammar), and this interpreter lowers each onto the
  * DataFrame algebra over the snapshot head:
  *
  *   DELETE FROM t WHERE c  →  keep rows where c is NOT true
  *     (three-valued logic: a NULL predicate KEEPS the row, the SQL
  *      contract — only rows where the predicate is TRUE are deleted)
  *   UPDATE t SET a = e [WHERE c]  →  per column,
  *     CASE WHEN c THEN e ELSE old END
  *     (a NULL/false predicate keeps the old value; missing WHERE
  *      updates every row)
  *
  * The write-back is COPY-ON-WRITE through [[Snapshots]]: the result
  * lands in a fresh versioned dir and publishes with one atomic
  * manifest commit — readers interleaved with the statement see the
  * pre- or post-statement table, never a mix, and time travel keeps
  * the pre-statement version readable.
  *
  * Scale: unlike MERGE (one full-outer shuffle join), both statements
  * lower to a SINGLE embarrassingly-parallel scan→project/filter→write
  * — zero exchanges, every task rewrites only its own input split. At
  * 100 TB a production store scopes the rewrite to the files whose
  * zone maps can satisfy the predicate and carries every untouched
  * file forward by reference in the manifest — the same
  * per-partition-commit capability the snapshot layer already has;
  * the lowered per-file work is exactly this plan.
  */
object RowSql {

  /** Target-relation unwrap shared by every interpreter entry here and
    * in [[MergeSql]]: the statement's (table name, optional alias). */
  private[plans] def unwrapTarget(p: LogicalPlan): (String, Option[String]) = p match {
    case SubqueryAlias(id, child) => (unwrapTarget(child)._1, Some(id.name))
    case u: UnresolvedRelation => (u.multipartIdentifier.last, None)
    case other => throw new IllegalArgumentException(
      s"unsupported relation shape: ${other.getClass.getSimpleName}")
  }

  private[plans] def rootIn(tables: Map[String, String], name: String): String =
    tables.getOrElse(name, throw new IllegalArgumentException(
      s"unknown snapshot table $name (known: ${tables.keys.mkString(", ")})"))

  /** Parse and execute one UPDATE or DELETE statement. `tables` maps
    * the statement's target table name to its snapshot root. Returns
    * the post-statement table read through the new snapshot head. */
  def execute(spark: SparkSession, sql: String,
      tables: Map[String, String]): DataFrame = {

    def unwrap(p: LogicalPlan) = unwrapTarget(p)
    def rootOf(name: String): String = rootIn(tables, name)
    def aliased(df: DataFrame, name: String, alias: Option[String]): DataFrame =
      df.alias(alias.getOrElse(name))
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case DeleteFromTable(rel, cond) =>
        val (name, alias) = unwrap(rel)
        val root = rootOf(name)
        val target = aliased(Snapshots.read(spark, root), name, alias)
        val kept = lowerDelete(target, cond)
        Snapshots.commit(root)(out => kept.write.mode("append").parquet(out))
        Snapshots.read(spark, root)

      case UpdateTable(rel, assignments, cond) =>
        val (name, alias) = unwrap(rel)
        val root = rootOf(name)
        val target = Snapshots.read(spark, root)
        val updated = lowerUpdate(aliased(target, name, alias),
          target.columns.toSeq, assignments, cond)
        Snapshots.commit(root)(out => updated.write.mode("append").parquet(out))
        Snapshots.read(spark, root)

      case other => throw new IllegalArgumentException(
        s"not an UPDATE or DELETE statement: ${other.getClass.getSimpleName}")
    }
  }

  /** Execute one DELETE statement MERGE-ON-READ: instead of rewriting
    * the survivors (the copy-on-write path of [[execute]]), write only
    * the DELETED KEY VALUES as a tiny delete file and publish it with
    * `#del` manifest lines ([[Snapshots.commitDelete]]); readers apply
    * it as a broadcast anti join. The statement costs O(matching rows)
    * I/O regardless of table size — the 100 TB contrast to
    * copy-on-write's full-table rewrite — at the price of a small
    * read-side anti join until the next rewrite commit absorbs the
    * deletes. `keyCol` must identify rows (a primary key). A DELETE
    * matching nothing commits nothing (no empty delete files). */
  def deleteMergeOnRead(spark: SparkSession, sql: String,
      tables: Map[String, String], keyCol: String): DataFrame = {
    val (rel, cond) = spark.sessionState.sqlParser.parsePlan(sql) match {
      case DeleteFromTable(r, c) => (r, c)
      case other => throw new IllegalArgumentException(
        s"not a DELETE statement: ${other.getClass.getSimpleName}")
    }
    val (name, alias) = unwrapTarget(rel)
    val root = rootIn(tables, name)
    val target = Snapshots.read(spark, root).alias(alias.getOrElse(name))
    val doomedKeys = target.filter(isTrue(cond)).select(keyCol).distinct()
    // ONE evaluation of the predicate: the keys are materialized into a
    // staging dir first, then published (or discarded when nothing
    // matched) — an isEmpty pre-check would re-run the filter scan, and
    // under a nondeterministic predicate could even disagree with the
    // committed key set
    val stage = Snapshots.newStagingDir(root)
    doomedKeys.write.mode("overwrite").parquet(stage)
    val staged = Snapshots.listParquet(stage)
    if (staged.nonEmpty && spark.read.parquet(staged: _*).head(1).nonEmpty)
      Snapshots.commitStagedDelta(root, keyCol, Nil, staged)
    else org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    Snapshots.read(spark, root)
  }

  /** Execute one UPDATE statement MERGE-ON-READ (the Hudi upsert
    * shape): ONE atomic commit stages the rewritten rows as new data
    * plus their keys as a delete file scoped to the pre-existing files
    * — old versions of the touched rows vanish and the new versions
    * shine through, while untouched rows' files never move. The
    * statement costs O(matching rows) I/O regardless of table size
    * (contrast [[execute]]'s copy-on-write full pass); the read-side
    * rent is the broadcast anti join until a rewrite commit absorbs
    * the deletes. `keyCol` must identify rows (a primary key). An
    * UPDATE matching nothing commits nothing. */
  def updateMergeOnRead(spark: SparkSession, sql: String,
      tables: Map[String, String], keyCol: String): DataFrame = {
    val (rel, assignments, cond) =
      spark.sessionState.sqlParser.parsePlan(sql) match {
        case UpdateTable(r, a, c) => (r, a, c)
        case other => throw new IllegalArgumentException(
          s"not an UPDATE statement: ${other.getClass.getSimpleName}")
      }
    val (name, alias) = unwrapTarget(rel)
    val root = rootIn(tables, name)
    // updating the key column itself is delete-old-key + insert-new-key
    // territory — reject it rather than scope the delete to the wrong
    // side (matches Delta's primary-key-update restriction for upserts)
    require(!assignments.exists {
      case Assignment(k: UnresolvedAttribute, _) =>
        k.nameParts.last.equalsIgnoreCase(keyCol)
      case _ => false
    }, s"UPDATE must not assign the merge-on-read key column '$keyCol'")
    val target = Snapshots.read(spark, root)
    val hitRows = target.alias(alias.getOrElse(name))
      .filter(cond.map(isTrue).getOrElse(lit(true)))
    // ONE evaluation of the hit predicate: the rewritten rows are
    // materialized first, and the delete keys derive from the WRITTEN
    // bytes (key column unassigned ⇒ identical to the hit rows' keys) —
    // a second filter pass could disagree under a nondeterministic
    // predicate, committing delete keys whose replacement rows were
    // never staged (permanent row loss)
    val newRows = lowerUpdate(hitRows, target.columns.toSeq, assignments, None)
    val stage = Snapshots.newStagingDir(root)
    newRows.write.mode("overwrite").parquet(stage)
    val stagedData = Snapshots.listParquet(stage)
    if (stagedData.nonEmpty &&
        spark.read.parquet(stagedData: _*).head(1).nonEmpty) {
      val keyDir = s"$stage/${Snapshots.upsertDelSubdir}"
      spark.read.parquet(stagedData: _*).select(keyCol).distinct()
        .write.mode("overwrite").parquet(keyDir)
      Snapshots.commitStagedDelta(root, keyCol,
        stagedData, Snapshots.listParquet(keyDir))
    } else org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    Snapshots.read(spark, root)
  }

  /** predicate is TRUE (not null, not false) — three-valued logic */
  private def isTrue(c: Expression): Column =
    coalesce(GraftSqlBridge.column(c), lit(false))

  /** DELETE keeps the rows whose predicate is NOT true. Exposed for the
    * plan-shape spec: the lowered plan must hold zero exchanges. */
  private[graft] def lowerDelete(target: DataFrame, cond: Expression): DataFrame =
    target.filter(!isTrue(cond))

  /** UPDATE is a per-column CASE over the hit predicate. Exposed for
    * the plan-shape spec: the lowered plan must hold zero exchanges. */
  private[graft] def lowerUpdate(t: DataFrame, targetCols: Seq[String],
      assignments: Seq[Assignment], cond: Option[Expression]): DataFrame = {
    val hit = cond.map(isTrue).getOrElse(lit(true))
    // every SET column must name exactly one target column — a
    // misspelled name silently matching nothing would commit a no-op
    // (or NULL-fill an INSERT) instead of erroring like any engine
    assignments.foreach {
      case Assignment(k: UnresolvedAttribute, _) =>
        require(targetCols.exists(_.equalsIgnoreCase(k.nameParts.last)),
          s"assignment references unknown column '${k.nameParts.mkString(".")}' " +
            s"(target columns: ${targetCols.mkString(", ")})")
      case a => throw new IllegalArgumentException(
        s"unsupported assignment key shape: ${a.key}")
    }
    def assigned(colName: String): Option[Column] = assignments.collectFirst {
      case Assignment(k: UnresolvedAttribute, v)
          if k.nameParts.last.equalsIgnoreCase(colName) =>
        GraftSqlBridge.column(v)
    }
    val outCols = targetCols.map { c =>
      assigned(c) match {
        case Some(v) => when(hit, v).otherwise(t(c)).as(c)
        case None => t(c).as(c)
      }
    }
    t.select(outCols: _*)
  }
}
