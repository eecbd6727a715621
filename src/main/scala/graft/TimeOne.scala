package graft
import org.apache.spark.sql.SparkSession
/** Scratch per-query timer for local iteration: runMain graft.TimeOne <sfDir> <q1> <q2> ... */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q => // warm
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count() }
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"TIMED $q ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
