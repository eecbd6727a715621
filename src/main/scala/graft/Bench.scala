package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Compact (summary, full-detail) JSON pair for a bench run. The
    * driver captures only the LAST 2000 chars of output (observed in
    * round 1: the full 88-query full-precision line was truncated
    * mid-JSON, "parsed": null), so the summary holds at most 40 map
    * entries — every failed query first, then the slowest — while the
    * detail string carries all of them for BENCH_DETAIL.json. Factored
    * out of main so the length contract is unit-testable. */
  def summaryLines(results: Map[String, Double], sfDir: String)
      : (String, String) = {
    val good = results.values.filter(_ >= 0)
    val total = if (good.nonEmpty) good.sum else 0.0
    val nFailed = results.values.count(_ < 0)
    // ms precision: raw nanos add no information at wall-clock noise
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    def jq(rs: Iterable[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val failedQ = results.filter(_._2 < 0).take(40)
    val slowest = results.filter(_._2 >= 0).toSeq.sortBy(-_._2)
      .take(40 - failedQ.size)
    val detail =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jq(results)},"queries_total":${results.size},"failed":$nFailed,"sf":"$sfDir"}"""
    val summary =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jq(failedQ ++ slowest)},"queries_total":${results.size},"queries_shown":${failedQ.size + slowest.size},"failed":$nFailed,"sf":"$sfDir"}"""
    (summary, detail)
  }

  /** Full-detail line with the per-query variance band over the timed
    * passes: `"band":{q:[min,median,max]}` (seconds, ms precision).
    * Machine noise vs code-shaped regressions was manually adjudicated
    * in rounds 2–3 (observed ±2.6 s swings on untouched queries); the
    * band makes that separation mechanical. */
  def detailWithBand(median: Map[String, Double],
      passes: Seq[Map[String, Double]], sfDir: String): String = {
    val (_, base) = summaryLines(median, sfDir)
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val band = median.keys.toSeq.sorted.map { k =>
      val vs = passes.flatMap(_.get(k)).filter(_ >= 0).sorted
      val arr = if (vs.isEmpty) "[-1,-1,-1]"
        else s"[${r3(vs.head)},${r3(vs((vs.size - 1) / 2))},${r3(vs.last)}]"
      "\"" + k + "\":" + arr
    }.mkString("{", ",", "}")
    base.dropRight(1) + s""","passes":${passes.size},"band":$band}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Pin UTC explicitly (not only via build.sbt javaOptions) so the
      // timed workload resolves timestamp literals exactly like the
      // UTC-pinned Verify run regardless of how this main is launched.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm run at the smallest SF before timing: whole-stage-codegen
    // (janino) compiles each distinct plan shape once per JVM (~0.5-1 s
    // apiece) — without this, those one-time costs land arbitrarily on
    // whichever timed query hits each shape first.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory) {
      // Warm concurrently: queries at sf0.001 are codegen-bound, not
      // CPU-bound, so 8 in flight cuts the warm phase ~4× on local[32].
      // One SparkSession is thread-safe for concurrent actions; the
      // TIMED loop below stays strictly serial.
      Qx.inParallel(SparkEntry.queries.toSeq) { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    // A failing query reports -1 in `queries` and is excluded from the
    // total — a broken build must not masquerade as a fast benchmark.
    // Multiple serial timed passes (default 3): the headline value is the
    // per-query MEDIAN, and BENCH_DETAIL.json carries [min,median,max]
    // per query so run-to-run machine noise (±2+ s observed on untouched
    // queries in rounds 2–3) is separable from code-shaped regressions.
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val passes: Seq[Map[String, Double]] = (1 to nPasses).map { _ =>
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    // median over the passes that succeeded; -1 only if EVERY pass failed
    val results = SparkEntry.queries.keys.map { name =>
      val ok = passes.flatMap(_.get(name)).filter(_ >= 0).sorted
      name -> (if (ok.isEmpty) -1.0 else ok((ok.size - 1) / 2))
    }.toMap
    val (summary, _) = summaryLines(results, sfDir)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detailWithBand(results, passes, sfDir) + "\n")
    catch { case _: Throwable => () }
    println(summary)
    spark.stop()
  }
}
