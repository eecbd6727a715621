package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read.LocalScan
import org.apache.spark.sql.types._

import graft.sources.Snapshots

/** MANIFEST-SERVED AGGREGATE PUSHDOWN — `SELECT count(*) / count(c) /
  * min(c) / max(c) FROM snap.t [GROUP BY <partition cols>]` answered
  * from the head manifest's per-file `#stats:` lines and partition
  * path values with ZERO data I/O, planned as a driver-side
  * [[LocalScan]] (the physical plan is a LocalTableScan — one row
  * globally, or one row per partition value under GROUP BY; no file is
  * listed, opened, or footer-read). This is the read-side payoff of
  * recording file stats at commit time — the same move Iceberg makes
  * when it answers count(*) from manifest row-counts: at 100 TB, a
  * table-wide count, a per-partition count, or a column bound is a
  * metadata lookup, not a 100 TB scan.
  *
  * Correctness gates — serve ONLY when the manifest provably carries
  * the exact answer, else decline and let the ordinary scan run:
  *  - no pending merge-on-read deletes (hidden rows falsify counts),
  *  - every filter that reached the scan is RE-APPLIED to the
  *    metadata or serving declines: Spark only attempts aggregate
  *    pushdown when no post-scan filters remain, so any recorded
  *    filter was fully consumed by the file index — a deterministic
  *    predicate over PARTITION columns only, which serve() evaluates
  *    per file on the parsed path values with Spark's own interpreted
  *    predicate (whole files match or don't); any other filter shape
  *    declines,
  *  - GROUP BY only over declared PARTITION columns (each group is a
  *    set of whole files — any other grouping needs the rows),
  *  - every head file has a decodable stats body with a row count,
  *  - min/max from STATS only for fixed-width types whose parquet
  *    footer stats are EXACT (integral, date, timestamp, float/double)
  *    — strings are excluded because parquet may truncate binary
  *    bounds, and decimals/booleans are never recorded; a file with no
  *    recorded bounds counts only if it is provably all-null
  *    (nc == rows),
  *  - min/max/count over a PARTITION column read the path value
  *    instead (exact for every renderable type, strings included),
  *  - count(c)/min(c)/max(c) resolve data columns across RENAME eras
  *    through the prior-spellings ledger (a file's stats are keyed by
  *    its own physical spelling).
  *
  * Float caveat: files containing non-finite values carry no recorded
  * bounds (the writer refuses to understate a NaN/Inf max) and are not
  * all-null, so the gate declines — NaN ordering differences between
  * engines can never surface through this path. */
private[graft] object SnapAggPush {

  /** Session kill-switch; default on. */
  val ConfKey = "spark.graft.aggPushdown.enabled"

  final case class Served(schema: StructType, data: Array[InternalRow],
      desc: String) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = data
    override def description(): String = desc
  }

  /** One file's provable facts: stats body + partition path values
    * (by column name, None when the layout carries none). */
  private final case class FileFacts(stats: Snapshots.FileStats,
      partVals: Map[String, Any])

  /** Evaluate `agg` from the snapshot's stats lines and partition path
    * values, or None when any gate fails. Pure — called once from
    * supportCompletePushDown (probe) and once from pushAggregation
    * (serve). `partValsOf` parses one file's partition values aligned
    * with `partSchema` (catalog scan's own parser). */
  def serve(agg: Aggregation, snap: Option[Snapshots.Snapshot],
      schema: StructType, priors: Map[String, Seq[String]],
      partSchema: StructType,
      partValsOf: String => Option[Seq[Any]],
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil)
      : Option[Served] = {
    // pending EQUALITY or POSITION deletes hide rows the stats lines
    // counted — serving would falsify counts/bounds
    if (snap.exists(s => s.deletes.nonEmpty || s.posDeletes.nonEmpty)) return None
    // WHERE clauses are servable when every filter is a DETERMINISTIC
    // predicate over PARTITION columns only: a partition value is
    // constant per file, so each file's rows all match or all don't —
    // the filter reduces to a whole-file keep/drop decided on the path
    // values with Spark's own interpreted predicate (identical
    // semantics to the file index's partition pruning, which is what
    // consumed the filter from the plan). Anything else declines.
    val keepFile: Option[InternalRow => Boolean] =
      if (filters.isEmpty) None
      else {
        if (partSchema.isEmpty) return None
        import org.apache.spark.sql.catalyst.expressions._
        val preds = filters.map { e =>
          if (!e.deterministic ||
            !e.references.forall(a => partSchema.fieldNames.contains(a.name) &&
              schema.fieldNames.contains(a.name))) return None
          val bound = e.transform {
            case a: AttributeReference =>
              val i = partSchema.fieldIndex(a.name)
              BoundReference(i, partSchema.fields(i).dataType,
                partSchema.fields(i).nullable)
          }
          if (bound.references.nonEmpty) return None // unbound leftovers
          try Predicate.createInterpreted(bound)
          catch { case _: Exception => return None }
        }
        Some(row => preds.forall(_.eval(row)))
      }
    // grouping is provable only over whole-file partitions
    val groupCols: Seq[String] = agg.groupByExpressions().toSeq.map {
      case r: NamedReference if r.fieldNames().length == 1 &&
        partSchema.fieldNames.contains(r.fieldNames()(0)) &&
        schema.fieldNames.contains(r.fieldNames()(0)) => r.fieldNames()(0)
      case _ => return None
    }
    // every head file must carry a decodable stats body with rows —
    // one miss and nothing (not even count(*)) is provable; partition
    // values parse once per file when the layout declares any
    val allFiles: Seq[FileFacts] = snap match {
      case None => Nil // no committed snapshot: the table is empty
      case Some(s) => s.files.map { f =>
        val fs = s.statsRaw.get(f).flatMap(Snapshots.parseStats) match {
          case Some(p) if p.rows.isDefined => p
          case _ => return None
        }
        val pv: Map[String, Any] =
          if (partSchema.isEmpty) Map.empty
          else partValsOf(f) match {
            case Some(vals) if vals.length == partSchema.length =>
              partSchema.fieldNames.zip(vals).toMap
            case _ => return None
          }
        FileFacts(fs, pv)
      }
    }
    val perFile: Seq[FileFacts] = keepFile match {
      case None => allFiles
      case Some(keep) =>
        // partition values repeat per directory — decide once per
        // DISTINCT value tuple, not once per file
        val names = partSchema.fieldNames.toSeq
        val decided = scala.collection.mutable.HashMap.empty[Seq[Any], Boolean]
        allFiles.filter { ff =>
          val key = names.map(ff.partVals(_))
          decided.getOrElseUpdate(key, keep(InternalRow.fromSeq(key)))
        }
    }
    val funcs = agg.aggregateExpressions()
    if (funcs.isEmpty && groupCols.isEmpty) return None
    // groups = whole-file sets keyed by the grouped partition values
    // (one global group when no GROUP BY); deterministic row order
    val groups: Seq[(Seq[Any], Seq[FileFacts])] =
      if (groupCols.isEmpty) Seq(Nil -> perFile)
      else perFile.groupBy(ff => groupCols.map(ff.partVals(_)))
        .toSeq.sortBy(_._1.map(v => if (v == null) "\u0000" else v.toString)
          .mkString("\u0001"))
    val fields = new scala.collection.mutable.ArrayBuffer[StructField]
    groupCols.foreach { c =>
      fields += StructField(c, schema(c).dataType, nullable = true)
    }
    // evaluate the first group to fix the agg fields, then the rest —
    // field layout must not depend on group content, so evalFuncs
    // returns (fields, values) and we assert identical field lists
    def evalFuncs(fs: Seq[FileFacts]): Option[(Seq[StructField], Seq[Any])] = {
      val fb = new scala.collection.mutable.ArrayBuffer[StructField]
      val vb = new scala.collection.mutable.ArrayBuffer[Any]
      funcs.foreach {
        case _: CountStar =>
          fb += StructField("count_star", LongType, nullable = false)
          vb += fs.map(_.stats.rows.get).sum
        case c: Count if !c.isDistinct =>
          val col = singleName(c.column()).getOrElse(return None)
          fb += StructField(s"count_$col", LongType, nullable = false)
          vb += (if (partSchema.fieldNames.contains(col)) {
            // partition column: constant per file, null ⇒ whole file null
            fs.filter(_.partVals(col) != null).map(_.stats.rows.get).sum
          } else {
            val ncs = fs.map(ff => statOf(ff.stats, col, priors).flatMap(_.nc)
              .getOrElse(return None))
            fs.map(_.stats.rows.get).sum - ncs.sum
          })
        case m: Min =>
          val (f, v) = bound(m.column(), fs, schema, priors, partSchema,
            isMax = false).getOrElse(return None)
          fb += f; vb += v
        case m: Max =>
          val (f, v) = bound(m.column(), fs, schema, priors, partSchema,
            isMax = true).getOrElse(return None)
          fb += f; vb += v
        case _ => return None // Sum/Avg/distinct/general: not derivable
      }
      Some((fb.toSeq, vb.toSeq))
    }
    val rows = groups.map { case (key, fs) =>
      val (aggFields, aggVals) = evalFuncs(fs).getOrElse(return None)
      if (fields.length == groupCols.length) fields ++= aggFields
      InternalRow.fromSeq(key ++ aggVals)
    }
    // zero-group GROUP BY (empty table): field layout still needed —
    // Spark expects the agg schema even with no rows
    if (rows.isEmpty && funcs.nonEmpty && fields.length == groupCols.length) {
      evalFuncs(Nil) match {
        case Some((aggFields, _)) => fields ++= aggFields
        case None => return None
      }
    }
    val names = fields.map(_.name).mkString(", ")
    Some(Served(StructType(fields.toSeq), rows.toArray,
      s"GraftManifestAgg [$names] (served from #stats manifest lines, zero data I/O)"))
  }

  private def singleName(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case r: NamedReference if r.fieldNames().length == 1 => Some(r.fieldNames()(0))
    case _ => None
  }

  /** A file's ColStat for `col` under whichever of its spellings the
    * file recorded (current name first, then rename priors). */
  private def statOf(fs: Snapshots.FileStats, col: String,
      priors: Map[String, Seq[String]]): Option[Snapshots.ColStat] =
    (col +: priors.getOrElse(col, Nil)).iterator
      .map(fs.cols.get).collectFirst { case Some(cs) => cs }

  /** min/max of `col` across the file set, as (field, internal value).
    * Partition columns read the path value (exact, any renderable
    * type); data columns read recorded stats (exact fixed-width types
    * only). None = a gate failed; Some(field -> null) = provably zero
    * non-null values. */
  private def bound(colExpr: org.apache.spark.sql.connector.expressions.Expression,
      perFile: Seq[FileFacts], schema: StructType,
      priors: Map[String, Seq[String]], partSchema: StructType,
      isMax: Boolean): Option[(StructField, Any)] = {
    val col = singleName(colExpr).getOrElse(return None)
    val dt = schema.fields.find(_.name == col).map(_.dataType).getOrElse(return None)
    val fromPath = partSchema.fieldNames.contains(col)
    if (!fromPath && !servableBound(dt)) return None
    val vals = new scala.collection.mutable.ArrayBuffer[Any]
    if (fromPath) perFile.foreach { ff =>
      val v = ff.partVals(col)
      if (v != null) vals += v // path values are already internal-typed
    }
    else perFile.foreach { ff =>
      statOf(ff.stats, col, priors) match {
        case None => return None
        case Some(cs) => (if (isMax) cs.max else cs.min) match {
          case Some(raw) => vals += internal(raw, dt).getOrElse(return None)
          case None =>
            val allNull = cs.nc.exists(nc => ff.stats.rows.exists(nc >= _))
            if (!allNull) return None
        }
      }
    }
    val field = StructField(s"${if (isMax) "max" else "min"}_$col", dt)
    if (vals.isEmpty) Some(field -> null)
    else {
      // all servable internal values are boxed fixed-width primitives
      // or UTF8String (path values), homogeneous per column — natural
      // Comparable order is the column's order (no NaN reaches here:
      // non-finite bounds are never recorded and fail the all-null
      // gate above)
      def cmp(a: Any, b: Any): Int = a.asInstanceOf[Comparable[Any]].compareTo(b)
      Some(field -> vals.reduce((a, b) =>
        if ((cmp(a, b) >= 0) == isMax) a else b))
    }
  }

  /** Types whose recorded footer bounds are exact AND whose stats the
    * writer records: fixed-width primitives. Strings are excluded
    * (parquet may truncate binary bounds — a truncated max is an upper
    * bound, safe for pruning, wrong as an answer). */
  private def servableBound(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** JSON stats value → Catalyst internal value of the DECLARED type.
    * Integral-era values under a widened declaration convert through
    * the same monotonic cast the scan itself would apply, so
    * cast(max) == max(cast). */
  private def internal(raw: Any, dt: DataType): Option[Any] = {
    import org.json4s._
    val num: Option[Either[Long, Double]] = raw match {
      case JLong(l) => Some(Left(l))
      case JInt(i) => Some(Left(i.longValue))
      case JDouble(d) => Some(Right(d))
      case _ => None
    }
    num.flatMap {
      case Left(l) => dt match {
        case LongType | TimestampType | TimestampNTZType => Some(l)
        case IntegerType | DateType => Some(l.toInt)
        case ShortType => Some(l.toShort)
        case ByteType => Some(l.toByte)
        case DoubleType => Some(l.toDouble)
        case FloatType => Some(l.toFloat)
        case _ => None
      }
      case Right(d) => dt match {
        case DoubleType => Some(d)
        case FloatType => Some(d.toFloat)
        case _ => None // a float body under an integral declaration: refuse
      }
    }
  }
}
