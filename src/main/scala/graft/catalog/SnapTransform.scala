package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TIME / TRUNCATE partition transforms for snap tables — the single
  * most common production partition spec for event tables:
  * `CREATE TABLE ... PARTITIONED BY (days(ts))` routes each row to a
  * derived `_gtpart=<ordinal>/` path segment, where the ordinal is the
  * transform of the source value (Iceberg's days/months/hours/years/
  * truncate, stored in ordinal form):
  *
  *  - `years(ts|date)`   → years since 1970
  *  - `months(ts|date)`  → months since 1970-01
  *  - `days(ts|date)`    → days since epoch
  *  - `hours(ts)`        → hours since epoch
  *  - `truncate(w, c)`   → int/long: `w * floor(c / w)` (the truncated
  *                         base); string: the first `w` code points
  *
  * Unlike identity partitioning the segment is DERIVED — the source
  * column STAYS in the data files — so the layout can be adopted by an
  * existing table without rewriting history (partition evolution): a
  * pre-evolution file simply has no `_gtpart=` segment and reads with a
  * NULL synthetic value, which pruning conservatively keeps (its
  * `#stats:` min/max still file-prune time ranges independently).
  *
  * Pruning: every transform here is MONOTONE non-decreasing in its
  * source value (calendar ordinals in UTC micros order; integer bases;
  * code-point prefixes under Spark's own UTF8String binary collation),
  * so range predicates on the SOURCE column map directly to ordinal
  * ranges on the directories — `ts >= X` keeps dirs with
  * `ordinal >= ordinal(X)`, metadata-only, before any footer is read.
  * Equality/IN prune to exact ordinal sets. Pruning is an I/O
  * optimization, never the correctness carrier: Spark re-applies every
  * predicate above the scan.
  *
  * All time math is on the stored epoch values (micros for TIMESTAMP,
  * epoch days for DATE) — session-timezone-free, so the layout a UTC
  * writer stages is the layout an Asia/Tokyo reader prunes. */
private[graft] object SnapTransform {

  /** Table property: `<kind>,<col>[,<width>]`. Mutually exclusive with
    * `bucket(n, col)` and with `graft.mor.key` (the delta writer
    * stages flat files that would break the layout); composes with
    * identity `PARTITIONED BY` columns. */
  val prop = "graft.partition.transform"

  /** A RETIRED transform layout (via `UNSET TBLPROPERTIES
    * ('graft.partition.transform')`, the DROP PARTITION FIELD shape):
    * committed `_gtpart=` directories keep parsing (and pruning while
    * the source column lives), new writes stage without the segment,
    * and the source column becomes droppable. Adopting a NEW transform
    * while one is retired stays refused — two ordinal schemes would
    * share the one segment name. */
  val retiredProp = "graft.partition.transform.retired"

  def ofRetired(props: Map[String, String]): Option[Spec] =
    of(props.get(retiredProp).map(prop -> _).toMap)

  val kinds: Set[String] = Set("years", "months", "days", "hours", "truncate")

  final case class Spec(kind: String, col: String, width: Long) {
    def render: String =
      if (kind == "truncate") s"$kind,$col,$width" else s"$kind,$col"
  }

  def of(props: Map[String, String]): Option[Spec] =
    props.get(prop).flatMap { v =>
      v.split(',') match {
        case Array(k, c) if kinds(k) && k != "truncate" => Some(Spec(k, c, 0L))
        case Array(k, c, w) if k == "truncate" =>
          scala.util.Try(w.trim.toLong).toOption.map(Spec(k, c, _))
        case _ => None
      }
    }

  /** Source types each kind accepts. */
  def supported(kind: String, dt: DataType): Boolean = (kind, dt) match {
    case ("hours", TimestampType) => true
    case ("years" | "months" | "days", TimestampType | DateType) => true
    case ("truncate", IntegerType | LongType | StringType) => true
    case _ => false
  }

  /** The synthetic partition schema a transform layout presents to the
    * file index — LONG ordinals for time/integer kinds, STRING prefix
    * for string truncation. Nullable: a pre-evolution file has no
    * segment and parses as NULL. */
  def partSchema(spec: Spec, srcType: DataType): StructType = {
    val dt = srcType match {
      case StringType => StringType
      case _ => LongType
    }
    StructType(Seq(StructField(
      graft.sources.Snapshots.transformPathCol, dt, nullable = true)))
  }

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  private def monthsSinceEpoch(epochDay: Long): Long = {
    val d = java.time.LocalDate.ofEpochDay(epochDay)
    (d.getYear - 1970).toLong * 12 + d.getMonthValue - 1
  }

  /** Ordinal of one CATALYST value (micros Long / days Int /
    * Int / Long / UTF8String) — the single row-side definition the
    * COW/streaming writers and the pruning index share. Null in →
    * null out. */
  def ordinalOf(v: Any, srcType: DataType, spec: Spec): Any = {
    if (v == null) return null
    (spec.kind, srcType) match {
      case ("hours", TimestampType) =>
        Math.floorDiv(v.asInstanceOf[Long], MicrosPerHour)
      case ("days", TimestampType) =>
        Math.floorDiv(v.asInstanceOf[Long], MicrosPerDay)
      case ("days", DateType) => v.asInstanceOf[Int].toLong
      case ("months", TimestampType) =>
        monthsSinceEpoch(Math.floorDiv(v.asInstanceOf[Long], MicrosPerDay))
      case ("months", DateType) => monthsSinceEpoch(v.asInstanceOf[Int].toLong)
      case ("years", TimestampType) =>
        java.time.LocalDate.ofEpochDay(
          Math.floorDiv(v.asInstanceOf[Long], MicrosPerDay)).getYear - 1970L
      case ("years", DateType) =>
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).getYear - 1970L
      case ("truncate", IntegerType) =>
        spec.width * Math.floorDiv(v.asInstanceOf[Int].toLong, spec.width)
      case ("truncate", LongType) =>
        spec.width * Math.floorDiv(v.asInstanceOf[Long], spec.width)
      case ("truncate", StringType) =>
        // Spark's own substring semantics (code points) — the Column
        // twin below uses substring(), so the two can never split a
        // value across directories
        v.asInstanceOf[UTF8String].substringSQL(1, spec.width.toInt)
      case other => throw new IllegalArgumentException(
        s"unsupported transform/source combination: $other")
    }
  }

  /** Column twin of [[ordinalOf]] for DataFrame staging — EXACT long
    * arithmetic only (`(a - pmod(a, b)) div b` is floorDiv without the
    * double-division rounding that could mis-route a row near a
    * boundary), calendar fields taken from DATE values (timezone-free,
    * unlike year()/month() on a timestamp). */
  def ordinalCol(colName: String, srcType: DataType, spec: Spec): Column = {
    val c = s"`$colName`"
    def floorDiv(a: String, b: Long) = s"(($a - pmod($a, ${b}L)) div ${b}L)"
    def epochDay = srcType match {
      case TimestampType => floorDiv(s"unix_micros($c)", MicrosPerDay)
      case DateType => s"CAST(unix_date($c) AS BIGINT)"
      case _ => throw new IllegalArgumentException(s"not a time column: $colName")
    }
    def asDate = s"date_from_unix_date(CAST($epochDay AS INT))"
    (spec.kind, srcType) match {
      case ("hours", TimestampType) =>
        expr(floorDiv(s"unix_micros($c)", MicrosPerHour))
      case ("days", _) => expr(epochDay)
      case ("months", _) =>
        expr(s"(CAST(year($asDate) AS BIGINT) - 1970L) * 12L + month($asDate) - 1L")
      case ("years", _) =>
        expr(s"CAST(year($asDate) AS BIGINT) - 1970L")
      case ("truncate", IntegerType | LongType) =>
        expr(s"${spec.width}L * ${floorDiv(s"CAST($c AS BIGINT)", spec.width)}")
      case ("truncate", StringType) =>
        expr(s"substring($c, 1, ${spec.width})")
      case other => throw new IllegalArgumentException(
        s"unsupported transform/source combination: $other")
    }
  }

  /** DataFrame-side staging: derive the synthetic segment and route
    * through partitionBy — identity columns (if any) first, the
    * derived segment last, matching the fragment order the row-level
    * writer renders. The one home of the write-path rule. */
  def stageTransformed(df: DataFrame, spec: Spec, srcType: DataType,
      partCols: Seq[String]): org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =
    df.withColumn(graft.sources.Snapshots.transformPathCol,
        ordinalCol(spec.col, srcType, spec))
      .write.partitionBy(
        (partCols :+ graft.sources.Snapshots.transformPathCol): _*)

  /** Path fragment of one row's ordinal (the row-level/streaming
    * writers' rendering) — `_gtpart=<ordinal>`, Hive default dir for
    * null, escaped like every identity value. */
  def fragmentOf(ord: Any): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val rendered = ord match {
      case null => ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      case s if s.toString.isEmpty => ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      case other => ExternalCatalogUtils.escapePathName(other.toString)
    }
    s"${graft.sources.Snapshots.transformPathCol}=$rendered"
  }

  /** Admissibility of one directory ordinal under one pushed conjunct
    * on the SOURCE column: None = the conjunct does not constrain the
    * transform (keep everything); Some(f) = keep dirs whose ordinal
    * satisfies f. A NULL ordinal (pre-evolution file, or a null source
    * value) is decided by the caller — kept for every shape except a
    * provably-null-refuting one is deliberately NOT attempted (keep:
    * pruning never carries correctness). Monotonicity is what makes
    * the range shapes sound: v >= X implies ord(v) >= ord(X). */
  def admissibleOrdinals(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      spec: Spec, srcType: DataType): Option[Any => Boolean] = {
    import org.apache.spark.sql.catalyst.expressions._
    def ref(x: Expression): Boolean = x match {
      case a: Attribute => a.name == spec.col
      case _ => false
    }
    def typed(l: Literal): Boolean = l.dataType == srcType
    def cmp(ord: Any, lit: Any): Int = (ord, lit) match {
      case (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compare(a, b)
      case (a: UTF8String, b: UTF8String) => a.compareTo(b)
      case _ => 0 // unexpected shape → admit (never prune on a guess)
    }
    def t(v: Any): Any = ordinalOf(v, srcType, spec)
    e match {
      case EqualTo(a, l @ Literal(v, _)) if ref(a) && typed(l) && v != null =>
        val o = t(v); Some(ord => cmp(ord, o) == 0)
      case EqualTo(l @ Literal(v, _), a) if ref(a) && typed(l) && v != null =>
        val o = t(v); Some(ord => cmp(ord, o) == 0)
      case GreaterThan(a, l @ Literal(v, _)) if ref(a) && typed(l) && v != null =>
        val o = t(v); Some(ord => cmp(ord, o) >= 0)
      case GreaterThanOrEqual(a, l @ Literal(v, _)) if ref(a) && typed(l) && v != null =>
        val o = t(v); Some(ord => cmp(ord, o) >= 0)
      case LessThan(a, l @ Literal(v, _)) if ref(a) && typed(l) && v != null =>
        val o = t(v); Some(ord => cmp(ord, o) <= 0)
      case LessThanOrEqual(a, l @ Literal(v, _)) if ref(a) && typed(l) && v != null =>
        val o = t(v); Some(ord => cmp(ord, o) <= 0)
      // literal-on-the-left comparisons flip
      case GreaterThan(l @ Literal(v, _), a) if ref(a) && typed(l) && v != null =>
        val o = t(v); Some(ord => cmp(ord, o) <= 0)
      case GreaterThanOrEqual(l @ Literal(v, _), a) if ref(a) && typed(l) && v != null =>
        val o = t(v); Some(ord => cmp(ord, o) <= 0)
      case LessThan(l @ Literal(v, _), a) if ref(a) && typed(l) && v != null =>
        val o = t(v); Some(ord => cmp(ord, o) >= 0)
      case LessThanOrEqual(l @ Literal(v, _), a) if ref(a) && typed(l) && v != null =>
        val o = t(v); Some(ord => cmp(ord, o) >= 0)
      case In(a, vs) if ref(a) &&
        vs.forall { case l: Literal => typed(l) && l.value != null; case _ => false } =>
        val os = vs.map { case Literal(v, _) => t(v) }
        Some(ord => os.exists(o => cmp(ord, o) == 0))
      case InSet(a, vs) if ref(a) && a.dataType == srcType =>
        val os = vs.filter(_ != null).map(t)
        Some(ord => os.exists(o => cmp(ord, o) == 0))
      case _ => None
    }
  }
}
