package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    // A failing query reports -1 in `queries` and is excluded from the
    // total — a broken build must not masquerade as a fast benchmark.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val good = results.values.filter(_ >= 0)
    val total = if (good.nonEmpty) good.sum else 0.0
    val nFailed = results.values.count(_ < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
