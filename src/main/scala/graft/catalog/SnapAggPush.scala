package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read.LocalScan
import org.apache.spark.sql.types._

import graft.sources.Snapshots

/** MANIFEST-SERVED AGGREGATE PUSHDOWN — `SELECT count(*) / count(c) /
  * min(c) / max(c) FROM snap.t` answered from the head manifest's
  * per-file `#stats:` lines with ZERO data I/O, planned as a
  * driver-side [[LocalScan]] (the physical plan is a one-row
  * LocalTableScan; no file is listed, opened, or footer-read). This is
  * the read-side payoff of recording file stats at commit time — the
  * same move Iceberg makes when it answers count(*) from manifest
  * row-counts: at 100 TB, a table-wide count or bound is a metadata
  * lookup, not a 100 TB scan.
  *
  * Correctness gates — serve ONLY when the manifest provably carries
  * the exact answer, else decline and let the ordinary scan run:
  *  - no pending merge-on-read deletes (hidden rows falsify counts),
  *  - no pushed/remaining filters (Spark itself refuses aggregate
  *    pushdown under post-scan filters; the builder additionally
  *    refuses when ANY filter reached the scan, e.g. a fully-consumed
  *    partition predicate),
  *  - no GROUP BY (partition-grouped serving is a possible extension),
  *  - every head file has a decodable stats body with a row count,
  *  - min/max only for fixed-width types whose parquet footer stats
  *    are EXACT (integral, date, timestamp, float/double) — strings
  *    are excluded because parquet may truncate binary bounds, and
  *    decimals/booleans are never recorded; a file with no recorded
  *    bounds counts only if it is provably all-null (nc == rows),
  *  - count(c)/min(c)/max(c) resolve the column across RENAME eras
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

  final case class Served(schema: StructType, row: InternalRow, desc: String)
    extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = Array(row)
    override def description(): String = desc
  }

  /** Evaluate `agg` from the snapshot's stats lines, or None when any
    * gate fails. Pure — called once from supportCompletePushDown (probe)
    * and once from pushAggregation (serve). */
  def serve(agg: Aggregation, snap: Option[Snapshots.Snapshot],
      schema: StructType, priors: Map[String, Seq[String]]): Option[Served] = {
    if (agg.groupByExpressions().nonEmpty) return None
    if (snap.exists(_.deletes.nonEmpty)) return None
    // every head file must carry a decodable stats body with rows —
    // one miss and nothing (not even count(*)) is provable
    val perFile: Seq[Snapshots.FileStats] = snap match {
      case None => Nil // no committed snapshot: the table is empty
      case Some(s) =>
        val parsed = s.files.map(f => s.statsRaw.get(f).flatMap(Snapshots.parseStats))
        if (parsed.exists(p => p.isEmpty || p.get.rows.isEmpty)) return None
        parsed.map(_.get)
    }
    val funcs = agg.aggregateExpressions()
    if (funcs.isEmpty) return None
    val fields = new scala.collection.mutable.ArrayBuffer[StructField]
    val values = new scala.collection.mutable.ArrayBuffer[Any]
    funcs.foreach {
      case _: CountStar =>
        fields += StructField("count_star", LongType, nullable = false)
        values += perFile.map(_.rows.get).sum
      case c: Count if !c.isDistinct =>
        val col = singleName(c.column()).getOrElse(return None)
        val ncs = perFile.map(fs => statOf(fs, col, priors).flatMap(_.nc)
          .getOrElse(return None))
        fields += StructField(s"count_$col", LongType, nullable = false)
        values += perFile.map(_.rows.get).sum - ncs.sum
      case m: Min =>
        val (f, v) = bound(m.column(), perFile, schema, priors, isMax = false)
          .getOrElse(return None)
        fields += f; values += v
      case m: Max =>
        val (f, v) = bound(m.column(), perFile, schema, priors, isMax = true)
          .getOrElse(return None)
        fields += f; values += v
      case _ => return None // Sum/Avg/distinct/general: not derivable
    }
    val names = fields.map(_.name).mkString(", ")
    Some(Served(StructType(fields.toSeq), InternalRow.fromSeq(values.toSeq),
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
    * None = a gate failed; Some(field -> null) = provably zero non-null
    * values. */
  private def bound(colExpr: org.apache.spark.sql.connector.expressions.Expression,
      perFile: Seq[Snapshots.FileStats], schema: StructType,
      priors: Map[String, Seq[String]], isMax: Boolean)
      : Option[(StructField, Any)] = {
    val col = singleName(colExpr).getOrElse(return None)
    val dt = schema.fields.find(_.name == col).map(_.dataType).getOrElse(return None)
    if (!servableBound(dt)) return None
    // per file: an exact internal-typed bound, or skip if provably
    // all-null; any other shape (missing stats, unconvertible value,
    // bounds omitted with nc < rows — the non-finite-float case) → None
    val vals = new scala.collection.mutable.ArrayBuffer[Any]
    perFile.foreach { fs =>
      statOf(fs, col, priors) match {
        case None => return None
        case Some(cs) => (if (isMax) cs.max else cs.min) match {
          case Some(raw) => vals += internal(raw, dt).getOrElse(return None)
          case None =>
            val allNull = cs.nc.exists(nc => fs.rows.exists(nc >= _))
            if (!allNull) return None
        }
      }
    }
    val field = StructField(s"${if (isMax) "max" else "min"}_$col", dt)
    if (vals.isEmpty) Some(field -> null)
    else {
      // all servable internal values are boxed fixed-width primitives,
      // homogeneous per column — natural Comparable order is the
      // column's order (no NaN reaches here: non-finite bounds are
      // never recorded and fail the all-null gate above)
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
