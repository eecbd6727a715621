package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Native as-of join: for each left row, the single "most recent" right
  * row of the same key whose time is before (strict) or at-or-before
  * the left row's time; left-outer (unmatched left rows keep nulls).
  *
  * The reference surfaces as-of pricing ("latest price as of a date",
  * /root/reference/README.md:9). The composable Spark form — equi join
  * on the key plus a range predicate, then a row_number window collapse
  * (operators/Joins.joinAsof) — materializes EVERY (left, earlier
  * right) candidate pair before discarding all but one: O(history²)
  * rows per key through the join. This operator is the scale-correct
  * shape instead:
  *
  *   shuffle left on keys, shuffle right on keys   (one exchange each)
  *   sort each partition by (keys, time[, tiebreak])  (external, spills)
  *   linear merge: one pass, one retained row of state
  *
  * At 100 TB the win is both the shuffle (no pair blow-up: n+m rows
  * move, not n·history) and the memory contract (the merge holds ONE
  * candidate row, not a group buffer; the sorts spill via Spark's
  * external sorter).
  *
  * Determinism: ties on right time are resolved by `rightTiebreak`
  * (appended ascending to the right sort) — the retained match is the
  * MAX (time, tiebreak...) among qualifying rows, which equals the
  * row_number pick of the window form ordered descending. Callers must
  * supply a tiebreak that makes (time, tiebreak) unique per key or ties
  * fall to sort nondeterminism, exactly as with the window form. Null
  * semantics match the join+window twin exactly: null keys equal
  * nothing (equi-join) and null times — left or right — satisfy no
  * range predicate, so such rows never match (null-key/time left rows
  * still pass through, left-outer).
  */
case class AsOfJoin(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression],
    strict: Boolean,
    forward: Boolean,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs matching non-empty key lists")
  // The merge orderings are generated from LEFT-side types and applied
  // to right-side rows, so a type mismatch (int vs bigint key, date vs
  // timestamp time) would silently compare garbage instead of inserting
  // the implicit casts the join+window twin gets from the analyzer.
  // Fail fast instead; callers cast explicitly.
  require(leftKeys.zip(rightKeys).forall { case (l, r) =>
      DataType.equalsStructurally(l.dataType, r.dataType, ignoreNullability = true) },
    s"as-of join key types must match pairwise: " +
      s"${leftKeys.map(_.dataType.simpleString).mkString("(", ", ", ")")} vs " +
      s"${rightKeys.map(_.dataType.simpleString).mkString("(", ", ", ")")}")
  require(DataType.equalsStructurally(
      leftTime.dataType, rightTime.dataType, ignoreNullability = true),
    s"as-of join time types must match: ${leftTime.dataType.simpleString} " +
      s"vs ${rightTime.dataType.simpleString}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(lk, rk, lt, rt, tb, strict, fwd, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, strict, fwd,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. EnsureRequirements provides the two hash
  * exchanges (co-partitioned ClusteredDistributions, like a shuffled
  * join) and the two in-partition sorts; doExecute is the single
  * forward merge pass. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression],
    strict: Boolean,
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with an as-of match"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +:
        rightTiebreak.map(SortOrder(_, Ascending))))

  // Left-outer: every left row passes through exactly once, in place.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val isStrict = strict
    val lAttrs = left.output; val rAttrs = right.output
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lAttrs)
      val rKeyProj = UnsafeProjection.create(rk, rAttrs)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lAttrs)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rAttrs)
      def ordOf(exprs: Seq[Expression]) = GenerateOrdering.create(StructType(
        exprs.zipWithIndex.map { case (e, i) =>
          StructField(s"c$i", e.dataType, e.nullable)
        }))
      val keyOrd = ordOf(lk)
      val timeOrd = ordOf(Seq(lt))
      val rBuf = rIter.buffered
      // One retained candidate: the best qualifying right row seen for
      // `matchKey`. Rows and keys are copied on retention (sorter
      // iterators reuse buffers).
      var matchKey: UnsafeRow = null
      var matchRow: InternalRow = null
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rAttrs.size)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val isForward = forward
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow).copy()
        var rightSide: InternalRow = nullRight
        if (lKey.anyNull || lTimeRow.isNullAt(0)) {
          // SQL semantics: a null key equals nothing and a null time
          // satisfies no range predicate, so the left row passes
          // through unmatched. (The key ORDERING treats null == null,
          // so without this check null-key rows would falsely pair —
          // exactly the divergence from the join+window twin this
          // guard prevents. Null-key RIGHT rows sort first and are
          // consumed by the c<0 advance under any non-null left key;
          // under a null left key we never advance, which only leaves
          // unmatchable rows buffered.)
        } else if (isForward) {
          // Forward: match = the FIRST right at/after lTime, i.e. the
          // head once everything too early is discarded. Lefts ascend
          // in (key, time), so a discarded right row (earlier key, or
          // same key at/before this left's time) is useless for every
          // later left too. Peek-only — the same head may also be the
          // match of the next left row, so it is never consumed here.
          var scanning = true
          while (scanning && rBuf.hasNext) {
            val rHead = rBuf.head
            val c = keyOrd.compare(rKeyProj(rHead), lKey)
            if (c < 0) rBuf.next()
            else if (c == 0) {
              val rTime = rTimeProj(rHead)
              if (rTime.isNullAt(0)) rBuf.next() // never satisfies > / >=
              else {
                val tc = timeOrd.compare(rTime, lTimeRow)
                if (tc < 0 || (isStrict && tc == 0)) rBuf.next()
                else scanning = false
              }
            } else scanning = false
          }
          if (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0) {
            matched += 1; rightSide = rBuf.head
          }
        } else {
          // Backward: retain the best qualifying right row seen so far;
          // ascending sort means the last retained is the max
          // (time, tiebreak) — the window form's descending pick.
          var scanning = true
          while (scanning && rBuf.hasNext) {
            val rHead = rBuf.head
            val c = keyOrd.compare(rKeyProj(rHead), lKey)
            if (c < 0) {
              rBuf.next() // right key already behind every remaining left row
            } else if (c == 0) {
              val rTime = rTimeProj(rHead)
              if (rTime.isNullAt(0)) {
                // A null time satisfies no `<` predicate (the window
                // twin's rt < lt is false for null rt) — but it SORTS
                // first, so consume without retaining or it would be
                // kept as the "earliest" match.
                rBuf.next()
              } else {
                val tc = timeOrd.compare(rTime, lTimeRow)
                if (tc < 0 || (!isStrict && tc == 0)) {
                  matchRow = rBuf.next().copy()
                  matchKey = lKey.copy()
                } else scanning = false
              }
            } else scanning = false
          }
          if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0) {
            matched += 1; rightSide = matchRow
          }
        }
        outRows += 1
        resultProj(joined(lRow, rightSide))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOf {
  /** Design note — why there is NO `RewriteRowNumberTopK`-style
    * optimizer rule replanning the SQL as-of idiom (inequality join +
    * per-left-key row_number + rn=1 filter) onto this operator: that
    * rewrite is UNSOUND in general. The window form partitions by the
    * left-side key COLUMNS and keeps one row per key VALUE; the as-of
    * operator keeps one match per left ROW. They coincide only when the
    * partition columns functionally determine left rows — a property
    * the optimizer cannot prove from the plan. (This is why engines
    * with native as-of expose it as explicit syntax rather than derive
    * it from window patterns.) The TopK rewrite has no such gap — its
    * window and native semantics agree for any key multiplicity —
    * which is why it exists and this one deliberately does not. */

  /** As-of join `left` to the most recent `right` row per key: strict
    * (`rightTime < leftTime`, the default) or inclusive. Column names
    * resolve with the session resolver and reject ambiguity, as in
    * [[TopK.perGroup]]. `rightTiebreak` must make (time, tiebreak)
    * unique per key for deterministic output. */
  def joinPrev(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      strict: Boolean = true): DataFrame =
    join(left, right, leftKeys, rightKeys, leftTime, rightTime,
      rightTiebreak, strict, forward = false)

  /** Forward twin of [[joinPrev]]: the EARLIEST right row strictly
    * after (default) or at-or-after the left row's time. Ties on right
    * time resolve to the min tiebreak (ascending window pick). */
  def joinNext(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      strict: Boolean = true): DataFrame =
    join(left, right, leftKeys, rightKeys, leftTime, rightTime,
      rightTiebreak, strict, forward = true)

  private def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String],
      strict: Boolean,
      forward: Boolean): DataFrame = {
    val l = left.asInstanceOf[classic.Dataset[Row]]
    val r = right.asInstanceOf[classic.Dataset[Row]]
    val spark = l.sparkSession
    TopK.ensure(spark)
    val resolver = spark.sessionState.conf.resolver
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $name not among ${plan.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column $name is ambiguous: ${many.size} attributes match; " +
            "disambiguate upstream")
      }
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    // Self-join guard: when left and right share lineage their outputs
    // carry the SAME expression ids, and the key/time attributes this
    // node captures cannot say which side they bind to —
    // DeduplicateRelations regenerates the right subtree's ids but has
    // no way to re-point a custom node's captured references. Built-in
    // joins solve this with dataset-id metadata; here the honest
    // contract is a clear error instead of wrong-side binding.
    val shared = lp.outputSet.intersect(rp.outputSet)
    require(shared.isEmpty,
      s"as-of join sides share lineage (common attributes: " +
        s"${shared.map(_.name).mkString(", ")}); materialize or re-derive " +
        "one side first, e.g. right.select(cols.map(col): _*) from a fresh " +
        "read, so its column identities are distinct")
    classic.GraftSqlBridge.ofRows(spark, AsOfJoin(
      leftKeys.map(attr(lp, _): Expression), rightKeys.map(attr(rp, _): Expression),
      attr(lp, leftTime), attr(rp, rightTime),
      rightTiebreak.map(attr(rp, _): Expression), strict, forward, lp, rp))
  }
}
