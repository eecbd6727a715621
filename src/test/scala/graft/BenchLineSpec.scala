package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the last 2000 chars of bench output — the
  * summary line must stay under that for EVERY outcome shape, with the
  * real (longest-available) query-name set. Pure function, no Spark. */
class BenchLineSpec extends AnyFunSuite {
  private val names = SparkEntry.queries.keys.toSeq
  private val sf = "/root/testdata/sf0.1"
  // sbt prepends "[info] " and appends "[success] Total time: ..." —
  // leave generous headroom under the 2000-char capture
  private val budget = 1800

  test("summary line fits the tail budget when all queries pass") {
    val results = names.map(_ -> 1.234567).toMap
    val (summary, _) = Bench.summaryLines(results, sf)
    assert(summary.length <= budget, s"len=${summary.length}")
    assert(summary.contains("\"failed\":0"))
  }

  test("summary line fits the tail budget when ALL queries fail") {
    val results = names.map(_ -> -1.0).toMap
    val (summary, _) = Bench.summaryLines(results, sf)
    assert(summary.length <= budget, s"len=${summary.length}")
    assert(summary.contains(s""""failed":${names.size}"""))
  }

  test("summary keeps every failure when failures fit, plus slowest passes") {
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i < 5) -1.0 else i.toDouble)
    }.toMap
    val (summary, detail) = Bench.summaryLines(results, sf)
    val failedShown = names.take(5).count(n => summary.contains("\"" + n + "\""))
    assert(failedShown == 5, "all 5 failures must appear in the summary")
    assert(summary.length <= budget)
    // detail always carries the full map
    names.foreach(n => assert(detail.contains("\"" + n + "\"")))
  }

  test("detailWithBand emits [min,median,max] per query and stays valid JSON-ish") {
    val passes = Seq(
      names.map(_ -> 1.0).toMap,
      names.map(_ -> 3.0).toMap,
      names.map(_ -> 2.0).toMap)
    val median = names.map(_ -> 2.0).toMap
    val d = Bench.detailWithBand(median, passes, sf)
    assert(d.contains("\"passes\":3"))
    assert(d.contains(s""""${names.head}":[1.0,2.0,3.0]"""))
    assert(d.endsWith("}"))
    assert(d.count(_ == '{') == d.count(_ == '}'))
  }

  test("detailWithBand reports [-1,-1,-1] for a query that failed every pass") {
    val passes = Seq(names.map(_ -> -1.0).toMap, names.map(_ -> -1.0).toMap)
    val median = names.map(_ -> -1.0).toMap
    val d = Bench.detailWithBand(median, passes, sf)
    assert(d.contains(s""""${names.head}":[-1,-1,-1]"""))
  }
}
