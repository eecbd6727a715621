package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, TimestampNTZType, TimestampType}

/** Table loaders + shared determinism helpers.
  *
  * The reference keeps all state in a single embedded DuckDB file with a
  * fixed, explicitly declared schema (/root/reference/README.md:7,55,75).
  * Spark-side we mirror that as parquet + temp views: one loader per
  * table, registered under the bare table name so `spark.sql` queries
  * read identically to the DuckDB oracle SQL.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir) else
      spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts has shipped under three parquet logical types across data
    * regenerations: TIMESTAMP(NANOS) (read as a nanos long under the
    * legacy conf), timestamp[us] with no timezone (Spark 4 reads
    * TIMESTAMP_NTZ), and plain UTC-adjusted timestamp[us]. A real engine
    * reads whatever the footer declares, so dispatch on the read schema
    * and normalize every variant to TimestampType — the session TZ is
    * UTC, so the NTZ→TZ cast is value-preserving and every downstream
    * query and oracle twin sees identical µs-exact values. */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    df.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long; data is µs-exact (ns%1000==0)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet-declared type $other " +
          "(expected int64-nanos, timestamp_ntz, or timestamp)")
    }
  }

  /** Register every table as a temp view for the SQL-centric surface
    * (README.md:7 — the reference is SQL-first over DuckDB). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

/** Determinism helpers shared by every oracle-checked query (SURVEY §0.2).
  *
  * Floating-point SUM is order-dependent; Spark's partial-agg order and
  * DuckDB's differ in final ulps. `dsum` routes the summand through
  * DECIMAL(38,4): the per-row double→decimal cast is deterministic and
  * the decimal sum is exact, so both engines produce the identical value;
  * the final cast back to double keeps the output schema simple.
  */
object Qx {
  /** Order-independent exact sum of a double expression.
    *
    * Scale 6, not 4: the money columns are 2-decimal exact, so products
    * of up to three of them are 6-decimal exact — at scale 6 every exact
    * value sits ON the decimal grid, never at a rounding midpoint, and
    * Spark's (shortest-repr HALF_UP) and DuckDB's (scaled-binary) casts
    * agree. At scale 4 the 6-decimal products land exactly on .xxxx50
    * midpoints where the two engines' cast paths disagree (observed:
    * ~50/60k rows flipped on sum_charge at sf0.01). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast(DoubleType)

  /** Oracle-side twin of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(38,6))) AS DOUBLE)"

  /** Exact-sum-derived average: identical double inputs on both engines
    * ⇒ the IEEE division is bit-identical — no rounding needed at all
    * (unlike avg(double), whose accumulation order differs).
    *
    * CAVEAT: divides by the ROW count (mirroring davgSql's COUNT(*)),
    * which equals SQL AVG only for non-null measures. For a nullable
    * measure use dsum(c)/count(c) on BOTH sides instead — as written,
    * both engines would agree on the same not-AVG value and the oracle
    * could not catch the divergence. */
  def davg(c: Column): Column = dsum(c) / count(lit(1)).cast(DoubleType)

  /** Oracle-side twin of [[davg]]. */
  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / CAST(COUNT(*) AS DOUBLE))"

  /** Pid-isolated scratch dir for sink/round-trip operators.
    *
    * Returns `$tmpdir/graft_<prefix>_<dirHash>_<pid>` — the dir hash
    * keeps SFs apart, the pid keeps concurrent JVMs (Bench and Verify in
    * parallel) from overwriting each other's output mid-read. Before
    * returning, sweeps same-prefix dirs owned by *dead* pids so repeated
    * runs don't accumulate table copies in /tmp (live pids are never
    * touched, so concurrency stays safe). */
  def tmpOut(prefix: String, sfDir: String): String = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val pid = ProcessHandle.current().pid()
    // pid capped at 18 digits so a foreign /tmp entry with a huge
    // digit run can't blow up toLong below.
    val stale = s"graft_${prefix}_\\d+_(\\d{1,18})(?:_dim)?".r
    if (java.nio.file.Files.isDirectory(root)) {
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(root)
      try ls.iterator().asScala.foreach { p =>
        p.getFileName.toString match {
          case stale(opid) if opid.toLong != pid &&
            !ProcessHandle.of(opid.toLong).map[Boolean](_.isAlive).orElse(false) =>
            try {
              val walk = java.nio.file.Files.walk(p)
              try walk.iterator().asScala.toSeq.reverse
                .foreach(java.nio.file.Files.delete)
              finally walk.close()
            } catch { case _: Throwable => () }
          case _ => ()
        }
      } finally ls.close()
    }
    s"$root/graft_${prefix}_${math.abs(sfDir.hashCode.toLong)}_$pid"
  }

  /** Run `f` over `items` on a bounded daemon pool and wait for ALL of
    * them — shared by Bench's warm phase and Verify's dumps. No
    * deadline (mirrors the sequential loops this replaced: run until
    * done); the pool is always torn down, and daemon threads mean a
    * wedged task can never keep the JVM alive after main exits. Each
    * task must swallow its own per-item failures. */
  def inParallel[A](items: Seq[A], width: Int = 8)(f: A => Unit): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(width,
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val fs = items.map(a => scala.concurrent.Future(f(a)))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf)
      ()
    } finally pool.shutdown()
  }
}
