package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Round-13 store hardening: the size-gated MOR delete broadcast, the
  * cross-root `#seq:` pinning (positive cases live in Round12OpsSpec's
  * WAP test), digit-only tag rejection, and the legacy-manifest
  * timestamp fallback. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("MOR delete anti join drops the broadcast hint above the size threshold") {
    val root = s"${Qx.tmpOut("morgate", sf())}/store"
    Snapshots.commit(root)(out =>
      spark.range(200).select($"id", ($"id" % 7).as("v"))
        .write.mode("append").parquet(out))
    Snapshots.commitDelete(root, "id")(out =>
      spark.range(150, 180).select($"id").write.mode("append").parquet(out))
    val expected = ((0L until 150L) ++ (180L until 200L)).toSet

    // default threshold: delete keys are tiny → hint present, base
    // never shuffles
    val hinted = Snapshots.read(spark, root)
    assert(hinted.select($"id").as[Long].collect().toSet == expected)
    assert(hinted.queryExecution.executedPlan.toString
      .contains("BroadcastExchange"),
      "small delete sets must broadcast:\n" +
        hinted.queryExecution.executedPlan)

    // 1-byte threshold: the delete files' on-disk bytes exceed it →
    // hint dropped, AQE free to pick shuffle; results identical
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
      val gated = Snapshots.read(spark, root)
      assert(gated.select($"id").as[Long].collect().toSet == expected,
        "gated read returns identical rows")
      assert(!gated.queryExecution.executedPlan.toString
        .contains("BroadcastExchange"),
        "over-threshold delete set must not force a broadcast:\n" +
          gated.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("all-digit tag names are rejected at creation (unreachable via VERSION AS OF)") {
    val root = s"${Qx.tmpOut("tagdigit", sf())}/store"
    Snapshots.commit(root)(out =>
      spark.range(3).select($"id").write.mode("append").parquet(out))
    val ex = intercept[IllegalArgumentException](
      Snapshots.tag(root, "2024", 1L))
    assert(ex.getMessage.contains("non-digit"))
    Snapshots.tag(root, "v2024", 1L) // a non-digit makes it addressable
    assert(Snapshots.tagVersion(root, "v2024").contains(1L))
  }

  test("TIMESTAMP AS OF falls back to manifest mtime for pre-#ts legacy commits") {
    import java.nio.charset.StandardCharsets.UTF_8
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = s"${Qx.tmpOut("tslegacy", sf())}/store"
    Snapshots.commit(root)(out =>
      spark.range(3).select($"id").write.mode("append").parquet(out))
    Thread.sleep(60) // keep v1's mtime clearly below v2's commit stamp
    Snapshots.commitAppend(root)(out =>
      spark.range(10, 12).select($"id").write.mode("append").parquet(out))
    // simulate a store whose v1 predates the #ts header (restoring the
    // manifest's original mtime — rewriting it would bump mtime to now)
    val m1 = Paths.get(root, "_commits", "00000001.manifest")
    val origMtime = Files.getLastModifiedTime(m1)
    val kept = Files.readAllLines(m1, UTF_8).asScala
      .filterNot(_.startsWith("#ts:"))
    Files.write(m1, kept.mkString("\n").getBytes(UTF_8))
    Files.setLastModifiedTime(m1, origMtime)
    val ts2 = Snapshots.commitTimestamp(root, 2L).get
    // a literal just before v2's stamp used to throw "predates retained
    // history" even though v1 was committed and readable; the mtime
    // fallback resolves it to v1 (Delta's header-less rule)
    assert(Snapshots.versionAtTimestamp(root, ts2 - 1L) == 1L)
    assert(Snapshots.versionAtTimestamp(root, ts2 + 1L) == 2L)
  }
}
