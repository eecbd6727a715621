package graft

/** Smoke every SparkEntry query at sf0.001 (SURVEY §5.6): runs without
  * throwing, returns a well-formed schema, and the flagship entry has
  * rows (the driver's t1 check).
  */
class QueriesSmokeSpec extends SparkSpec {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf())
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
