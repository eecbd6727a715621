package graft

import graft.streaming.StreamRunner
import graft.streaming.StreamRunner.{Ev, PurchaseUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** True Structured Streaming runs (SURVEY §5.5): MemoryStream drives
  * the StreamRunner plans; results compared to the batch twins on the
  * same rows, plus watermark late-drop behavior.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val evs = Seq(
    Ev(1L, ts(0), 1L, "purchase", 10.25),
    Ev(2L, ts(5), 1L, "view", 1.0),
    Ev(3L, ts(10), 1L, "purchase", 2.50),
    Ev(4L, ts(65), 1L, "purchase", 4.00), // second hour, second session
    Ev(5L, ts(7), 2L, "purchase", 7.75),
    Ev(6L, ts(8), 2L, "purchase", 0.30))

  test("streaming tumbling agg matches hand-computed hourly counts") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(evs)
    val q = StreamRunner.tumblingWithWatermark(ms.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumb")
        .as[(Timestamp, String, Long)].collect()
        .map { case (w, t, n) => (w.toString, t, n) }.toSet
      assert(got == Set(
        ("2024-01-01 00:00:00.0", "purchase", 4L),
        ("2024-01-01 00:00:00.0", "view", 1L),
        ("2024-01-01 01:00:00.0", "purchase", 1L)))
    } finally q.stop()
  }

  test("streaming windowed top-k: counts stream + native TopK per batch") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    // Hour 0: purchase=3, view=2, click=1, refund=1 → top3 drops refund
    // (click ties refund at 1 but wins the event_type tiebreak... both
    // tie: top3 keeps (purchase, view) then min type among {click,
    // refund} = click).
    ms.addData(Seq(
      Ev(1L, ts(1), 1L, "purchase", 1.0), Ev(2L, ts(2), 1L, "purchase", 1.0),
      Ev(3L, ts(3), 2L, "purchase", 1.0), Ev(4L, ts(4), 1L, "view", 1.0),
      Ev(5L, ts(5), 2L, "view", 1.0), Ev(6L, ts(6), 1L, "click", 1.0),
      Ev(7L, ts(7), 2L, "refund", 1.0),
      Ev(8L, ts(61), 1L, "view", 1.0))) // hour 1: single type
    val q = StreamRunner.windowTopkCounts(ms.toDF())
      .writeStream.format("memory").queryName("wtopk").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = StreamRunner.windowTopkOfBatch(spark.table("wtopk"))
        .as[(Timestamp, String, Long)].collect()
        .map { case (w, t, n) => (w.toString, t, n) }.toSet
      assert(got == Set(
        ("2024-01-01 00:00:00.0", "purchase", 3L),
        ("2024-01-01 00:00:00.0", "view", 2L),
        ("2024-01-01 00:00:00.0", "click", 1L),
        ("2024-01-01 01:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("event-time timers close inactivity sessions as the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Ev]
    val q = StreamRunner.timerSessions(
        ms.toDF().withWatermark("ts", "0 seconds").as[Ev])
      .writeStream.format("memory").queryName("tsess").outputMode("append").start()
    try {
      // Batch 1 — user 1 has an IN-BATCH 30-min gap (session closes
      // inline, no timer needed); user 2 opens a 1-event session.
      ms.addData(Seq(
        Ev(1L, ts(0), 1L, "view", 10.0),
        Ev(2L, ts(10), 1L, "click", 2.5),
        Ev(3L, ts(40), 1L, "view", 4.0),
        Ev(4L, ts(5), 2L, "purchase", 7.75)))
      q.processAllAvailable()
      // Batch 2 advances the watermark to 0:40 — user 2's timer (0:35)
      // fires; user 1's open session (deadline 1:10) survives.
      ms.addData(Seq(Ev(5L, ts(120), 3L, "view", 1.0)))
      q.processAllAvailable()
      // Batch 3 advances the watermark to 2:00 (user 1's second session
      // fires, deadline 1:10) and then 5:00 via the trailing no-data
      // batch Spark runs on watermark advance (user 3 fires, deadline
      // 2:30). User 99 (deadline 5:30) stays open — nothing ever moves
      // the watermark past it.
      ms.addData(Seq(Ev(6L, ts(300), 99L, "view", 1.0)))
      q.processAllAvailable()
      val got = spark.table("tsess")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
        .map { case (u, s, e, n, v) => (u, s.toString, e.toString, n, v) }.toSet
      assert(got == Set(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:10:00.0", 2L, 12.5),
        (2L, "2024-01-01 00:05:00.0", "2024-01-01 00:05:00.0", 1L, 7.75),
        (1L, "2024-01-01 00:40:00.0", "2024-01-01 00:40:00.0", 1L, 4.0),
        (3L, "2024-01-01 02:00:00.0", "2024-01-01 02:00:00.0", 1L, 1.0)),
        s"got: $got")
    } finally q.stop()
  }

  test("streaming as-of tick join: latest-quote state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState needs multiple state column families — RocksDB
    // provider (the HDFS-backed default throws).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Ev]
    val q = StreamRunner.asofQuotes(ms.toDF().as[Ev])
      .writeStream.format("memory").queryName("asofq").outputMode("append").start()
    try {
      // Batch 1, interleaved arrival within the batch (sorted by event
      // time inside the handler): trade@15 must see quote@10, trade@5
      // must see nothing even though the quote row precedes it in
      // arrival order here.
      ms.addData(Seq(
        Ev(10L, ts(10), 1L, "quote", 9.0),
        Ev(11L, ts(5), 1L, "trade", 0.0),
        Ev(12L, ts(15), 1L, "trade", 0.0)))
      q.processAllAvailable()
      // Batch 2: the batch-1 quote must still prevail for trade@20,
      // then a fresh quote@25 takes over for trade@30; symbol 2 has no
      // quote at all.
      ms.addData(Seq(
        Ev(13L, ts(20), 1L, "trade", 0.0),
        Ev(14L, ts(25), 1L, "quote", 9.5),
        Ev(15L, ts(30), 1L, "trade", 0.0),
        Ev(16L, ts(30), 2L, "trade", 0.0)))
      q.processAllAvailable()
      // Batch 3: quote and trade at the EXACT same timestamp, with the
      // trade's event_id below the quote's — the pinned tie contract
      // (quotes before trades, inclusive) must let the trade see the
      // same-instant quote regardless of event_id assignment.
      ms.addData(Seq(
        Ev(17L, ts(40), 1L, "trade", 0.0),
        Ev(18L, ts(40), 1L, "quote", 9.9)))
      q.processAllAvailable()
      val got = spark.table("asofq")
        .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
      assert(got == Set(
        (1L, 11L, None, None),
        (1L, 12L, Some(10L), Some(9.0)),
        (1L, 13L, Some(10L), Some(9.0)),
        (1L, 15L, Some(14L), Some(9.5)),
        (2L, 16L, None, None),
        (1L, 17L, Some(18L), Some(9.9))))
    } finally q.stop()
  }

  test("as-of tick join: an out-of-order older quote cannot regress the prevailing quote") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Ev]
    val q = StreamRunner.asofQuotes(ms.toDF().as[Ev])
      .writeStream.format("memory").queryName("asofq_oo").outputMode("append").start()
    try {
      ms.addData(Seq(Ev(20L, ts(25), 1L, "quote", 9.5)))
      q.processAllAvailable()
      // a replayed/out-of-order OLDER quote arrives in a later batch;
      // the stored quote@25 must keep prevailing for the trade@30
      ms.addData(Seq(
        Ev(19L, ts(10), 1L, "quote", 9.0),
        Ev(21L, ts(30), 1L, "trade", 0.0)))
      q.processAllAvailable()
      val got = spark.table("asofq_oo")
        .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
      assert(got == Set((1L, 21L, Some(20L), Some(9.5))),
        s"stale quote must not regress state: $got")
    } finally q.stop()
  }

  test("streaming CDC upsert: a conflicting redelivery of the winner fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Ev]
    val q = StreamRunner.upsertLatest(ms.toDS())
      .writeStream.format("memory").queryName("upsert_conflict")
      .outputMode("append").start()
    try {
      ms.addData(Seq(Ev(30L, ts(10), 7L, "update", 1.0)))
      q.processAllAvailable()
      // byte-identical redelivery: idempotent no-op
      ms.addData(Seq(Ev(30L, ts(10), 7L, "update", 1.0)))
      q.processAllAvailable()
      assert(spark.table("upsert_conflict").count() == 1)
      // same (ts, event_id) with a DIFFERENT value: contradictory
      // correction — must abort the batch, not silently keep the stale
      // winner
      ms.addData(Seq(Ev(30L, ts(10), 7L, "update", 2.0)))
      val ex = intercept[Exception](q.processAllAvailable())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("conflicting payload")),
        s"expected the loud conflict, got: $ex")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to prior clicks") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(Seq(
      Ev(10L, ts(0), 1L, "click", 0.0),
      Ev(11L, ts(30), 1L, "click", 0.0),
      Ev(12L, ts(45), 1L, "purchase", 5.0),   // joins clicks 10 and 11
      Ev(13L, ts(130), 1L, "purchase", 5.0),  // >1h after both: no match
      Ev(14L, ts(20), 2L, "purchase", 5.0)))  // other user: no click
    val q = StreamRunner.purchaseAttribution(ms.toDF())
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attr")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set(
        (1L, 12L, 10L, 45L * 60),
        (1L, 12L, 11L, 15L * 60)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes the replayed event") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(evs :+ Ev(1L, ts(0), 1L, "purchase", 10.25)) // duplicate id 1
    val q = StreamRunner.dedupWithinWatermark(ms.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup").count() == evs.size)
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps per-user purchase state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamRunner.statefulPurchases(ms.toDS())
      .writeStream.format("memory").queryName("stateful").outputMode("append").start()
    try {
      ms.addData(evs.take(3)) // batch 1: user 1 purchases id 1, 3
      q.processAllAvailable()
      ms.addData(evs.drop(3)) // batch 2: user 1 purchase id 4; user 2 both
      q.processAllAvailable()
      val got = spark.table("stateful").as[PurchaseUpdate].collect()
        .map(u => u.event_id -> (u.n_so_far, u.cum_cents)).toMap
      assert(got(1L) == (1L, 1025L))
      assert(got(3L) == (2L, 1275L))
      assert(got(4L) == (3L, 1675L), "state must survive into batch 2")
      assert(got(5L) == (1L, 775L) && got(6L) == (2L, 805L))
    } finally q.stop()
  }

  test("streaming stateful output equals the batch twin on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(evs)
    val q = StreamRunner.statefulPurchases(ms.toDS())
      .writeStream.format("memory").queryName("twin").outputMode("append").start()
    val streamed =
      try { q.processAllAvailable(); spark.table("twin").as[PurchaseUpdate].collect().toSet }
      finally q.stop()

    // batch twin: same state machine via flatMapGroups
    val batch = evs.toDS()
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[Ev]) =>
        var n = 0L; var cents = 0L
        it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).iterator
          .filter(_.event_type == "purchase").map { e =>
            n += 1; cents += math.round(e.value * 100.0)
            PurchaseUpdate(uid, e.event_id, n, cents)
          }
      }.collect().toSet
    assert(streamed == batch)
  }

  test("transformWithState keeps the same cross-batch state as flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState needs multiple state column families — RocksDB
    // provider only (HDFSBackedStateStore throws UNSUPPORTED_FEATURE).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Ev]
    val q = StreamRunner.statefulPurchasesTws(ms.toDS())
      .writeStream.format("memory").queryName("tws").outputMode("append").start()
    try {
      ms.addData(evs.take(3))
      q.processAllAvailable()
      ms.addData(evs.drop(3))
      q.processAllAvailable()
      val got = spark.table("tws").as[PurchaseUpdate].collect()
        .map(u => u.event_id -> (u.n_so_far, u.cum_cents)).toMap
      assert(got(1L) == (1L, 1025L))
      assert(got(4L) == (3L, 1675L), "ValueState must survive into batch 2")
      assert(got(6L) == (2L, 805L))
    } finally q.stop()
  }

  test("transformWithState MapState tracks distinct types across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Ev]
    val q = StreamRunner.distinctTypesTws(ms.toDS())
      .writeStream.format("memory").queryName("twstypes").outputMode("append").start()
    try {
      ms.addData(evs.take(3)) // user 1: purchase, view, purchase
      q.processAllAvailable()
      ms.addData(evs.drop(3)) // user 1: purchase; user 2: purchase ×2
      q.processAllAvailable()
      val got = spark.table("twstypes")
        .as[StreamRunner.TypeUpdate].collect()
        .map(u => u.event_id -> u.n_types_so_far).toMap
      assert(got(1L) == 1L) // first type for user 1
      assert(got(2L) == 2L) // "view" is new
      assert(got(3L) == 2L) // repeat "purchase"
      assert(got(4L) == 2L, "MapState must survive into batch 2")
      assert(got(5L) == 1L && got(6L) == 1L)
    } finally q.stop()
  }

  test("distinct-types streaming output equals the Streamy batch twin rows") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Ev]
    ms.addData(evs)
    val q = StreamRunner.distinctTypesTws(ms.toDS())
      .writeStream.format("memory").queryName("twstwin").outputMode("append").start()
    val streamed =
      try { q.processAllAvailable(); spark.table("twstwin")
        .as[StreamRunner.TypeUpdate].collect().toSet }
      finally q.stop()
    // batch twin on the same rows via the same window expressions
    import org.apache.spark.sql.expressions.Window
    val wNew = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    val wRun = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = evs.toDS()
      .withColumn("is_new", (org.apache.spark.sql.functions.row_number().over(wNew) === 1).cast("long"))
      .withColumn("n_types_so_far", org.apache.spark.sql.functions.sum($"is_new").over(wRun))
      .select($"user_id", $"event_id", $"event_type", $"n_types_so_far")
      .as[StreamRunner.TypeUpdate].collect().toSet
    assert(streamed == batch)
  }

  test("file-source streaming (the deployable no-Kafka shape) matches MemoryStream results") {
    // the production source offline is a directory of files — prove the
    // same plan over a file stream yields the MemoryStream/batch result
    val dir = Qx.tmpOut("test_stream_src", "stream")
    evs.toDS().write.mode("overwrite").parquet(dir)
    val fileStream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE")
      .parquet(dir)
    val q = StreamRunner.tumblingWithWatermark(fileStream)
      .writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("filesrc")
        .as[(Timestamp, String, Long)].collect()
        .map { case (w, t, n) => (w.toString, t, n) }.toSet
      assert(got == Set(
        ("2024-01-01 00:00:00.0", "purchase", 4L),
        ("2024-01-01 00:00:00.0", "view", 1L),
        ("2024-01-01 01:00:00.0", "purchase", 1L)))
    } finally q.stop()
  }

  test("watermark drops a too-late event from the windowed aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamRunner.tumblingWithWatermark(ms.toDF())
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      ms.addData(Ev(1L, ts(0), 1L, "view", 1.0), Ev(2L, ts(5), 1L, "view", 1.0))
      q.processAllAvailable()
      // advance watermark far past hour 0 (+10m delay): hour-0 window closes
      ms.addData(Ev(3L, ts(200), 1L, "view", 1.0))
      q.processAllAvailable()
      // this event is now behind the watermark -> must be dropped
      ms.addData(Ev(4L, ts(1), 1L, "view", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(5L, ts(400), 1L, "view", 1.0))
      q.processAllAvailable()
      val hour0 = spark.table("late")
        .filter($"window_start" === ts(0)).as[(Timestamp, String, Long)].collect()
      assert(hour0.length == 1 && hour0.head._3 == 2L,
        s"late event must not be counted, got ${hour0.mkString(",")}")
    } finally q.stop()
  }

  test("streaming CDC upsert: final state matches the batch compaction twin on real data") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // real sf0.001 events, fed as three micro-batches split ARBITRARILY
    // (hash of event_id, not time) — upserts are order-insensitive by
    // key, so the final state must still equal the batch compaction
    val all = Tables.load(spark, sf("0.001"),  "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
    val batches = all.groupBy(e => math.abs(e.event_id % 3)).toSeq
      .sortBy(_._1).map(_._2)
    val ms = MemoryStream[Ev]
    val q = StreamRunner.upsertLatest(ms.toDS())
      .writeStream.format("memory").queryName("upsert").outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      // last emission per key = the stream's final upsert-sink state
      val emitted = spark.table("upsert")
        .as[(Long, Long, Timestamp, String, Double, Boolean)].collect()
      val finalState = emitted.groupBy(_._1).map { case (_, vs) =>
        vs.maxBy(r => (r._3.getTime, r._3.getNanos, r._2)) }.toSet
      val twin = graft.streaming.Streamy.streamCdcUpsert(spark, sf("0.001"))
        .as[(Long, Long, Timestamp, String, Double, Boolean)].collect().toSet
      assert(finalState == twin,
        s"stream/batch divergence: ${(finalState diff twin).take(3)} vs ${(twin diff finalState).take(3)}")
      // tombstone markers must surface (the delete path is non-vacuous)
      assert(twin.exists(_._6), "fixture must contain tombstoned keys")
    } finally q.stop()
  }

  test("streaming SCD-2: emitted closed intervals equal the batch twin's sealed versions") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // chronological batches (the documented ordered-feed contract)
    val all = Tables.load(spark, sf("0.001"), "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val batches = all.grouped((all.size + 2) / 3).toSeq
    val ms = MemoryStream[Ev]
    val q = StreamRunner.scd2Stream(ms.toDS())
      .writeStream.format("memory").queryName("scd2s").outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      val emitted = spark.table("scd2s")
        .as[(Long, Long, Double, Timestamp, Timestamp)].collect().toSet
      val twin = graft.operators.CdcOps.scd2Intervals(spark, sf("0.001"))
        .filter($"valid_to".isNotNull) // sealed versions only
        .select($"user_id", $"event_id", $"value", $"valid_from", $"valid_to")
        .as[(Long, Long, Double, Timestamp, Timestamp)].collect().toSet
      assert(emitted == twin,
        s"stream/batch divergence: ${(emitted diff twin).take(3)} vs ${(twin diff emitted).take(3)}")
      assert(emitted.nonEmpty)
    } finally q.stop()
  }

  test("HL7 file-source stream parses identically to the batch scan") {
    val dir = sf("0.001")
    val landing = Qx.tmpOut("hl7land", dir)
    // land the corpus as text files: one message per LINE, segments
    // separated by \r (the HL7 v2 terminator) so the \n line framing
    // survives; 3 files ≈ 3 ingest arrivals
    graft.sources.Scans.hl7Messages(spark, dir, sep = "\r")
      .repartition(3)
      .write.mode("overwrite").format("text").save(landing)
    val q = StreamRunner.hl7FileStream(spark, landing)
      .writeStream.format("memory").queryName("hl7s").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getLong(6), r.getLong(7))
    // multiset compare: msg_id ties exist (lineitem has no unique key)
    val got = spark.table("hl7s").collect().map(key).sorted
    val want = graft.sources.Scans.scanHl7Message(spark, dir).collect().map(key).sorted
    assert(got.nonEmpty && got.sameElements(want),
      s"stream parsed ${got.length} rows vs batch ${want.length}")
  }

  test("HL7 file stream resumes from its checkpoint exactly-once: no loss, no dupes") {
    import java.nio.file.{Files, Paths}
    val dir = sf("0.001")
    def fresh(prefix: String): String = {
      val p = Qx.tmpOut(prefix, dir)
      val root = Paths.get(p)
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
        } finally walk.close()
      }
      p
    }
    val staging = fresh("hl7ckstage")
    val landing = fresh("hl7ckland")
    val ckpt = fresh("hl7ckckpt")
    val out = fresh("hl7ckout")
    // the full corpus as 4 landing files (one message per line, \r segments)
    graft.sources.Scans.hl7Messages(spark, dir, sep = "\r")
      .repartition(4)
      .write.mode("overwrite").format("text").save(staging)
    val parts = new java.io.File(staging).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 4)
    Files.createDirectories(Paths.get(landing))
    def land(fs: Seq[java.io.File]): Unit =
      fs.foreach(f => Files.copy(f.toPath, Paths.get(landing, f.getName)))
    // a REAL durable run: file source -> parquet file sink, checkpointed;
    // AvailableNow drains what has landed, then the query STOPS — the
    // "crash" between feeds. The restart reuses the same checkpoint.
    def runOnce(): Unit = {
      val q = StreamRunner.hl7FileStream(spark, landing)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    land(parts.take(2))
    runOnce()
    val afterHalf = spark.read.parquet(out).count()
    land(parts.drop(2))
    runOnce() // restart: must pick up ONLY the two new files
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getLong(6), r.getLong(7))
    val got = spark.read.parquet(out).collect().map(key).sorted
    val want = graft.sources.Scans.scanHl7Message(spark, dir).collect().map(key).sorted
    assert(afterHalf > 0 && afterHalf < want.length,
      s"first run must process only the landed half ($afterHalf of ${want.length})")
    assert(got.sameElements(want),
      s"restart broke exactly-once: ${got.length} sink rows vs batch ${want.length}")
    // a restart with NOTHING new is a no-op (checkpoint remembers all files)
    runOnce()
    assert(spark.read.parquet(out).count() == want.length,
      "an idle restart must not re-emit")
  }

  test("FHIR NDJSON file-source stream parses identically to the batch scan") {
    val dir = sf("0.001")
    val landing = Qx.tmpOut("fhirland", dir)
    // one compact Bundle JSON per line across 3 files
    graft.sources.Scans.fhirBundles(spark, dir)
      .repartition(3)
      .write.mode("overwrite").format("text").save(landing)
    val q = StreamRunner.fhirFileStream(spark, landing)
      .writeStream.format("memory").queryName("fhirs").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))
    val got = spark.table("fhirs").collect().map(key).sorted
    val want = graft.sources.Scans.scanFhirBundle(spark, dir).collect().map(key).sorted
    assert(got.nonEmpty && got.sameElements(want),
      s"stream parsed ${got.length} rows vs batch ${want.length}")
  }

  test("the .changes feed streams a position delete as row-level delete effects") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = Qx.tmpOut("scdcwh", sf())
    graft.catalog.GraftCatalog.register(spark, "snap", Some(wh))
    spark.sql("DROP TABLE IF EXISTS snap.default.scdc")
    spark.sql("""CREATE TABLE snap.default.scdc (k BIGINT, v STRING)
                |TBLPROPERTIES ('graft.mor.positional'='true')""".stripMargin)
    spark.sql("INSERT INTO snap.default.scdc SELECT id, concat('v', id) FROM range(1, 11)")
    val out = Qx.tmpOut("scdcout", sf())
    val ckpt = Qx.tmpOut("scdcckpt", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def run(): Unit = {
      val q = spark.readStream.table("snap.default.scdc.changes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    val afterInit = spark.read.parquet(out)
    assert(afterInit.count() == 10L)
    assert(afterInit.where("_change_type = 'insert'").count() == 10L)
    // a GDPR-style position delete: NO manual skip, NO failure — the
    // feed delivers exactly the newly hidden rows as 'delete' effects
    spark.sql("DELETE FROM snap.default.scdc WHERE k <= 3")
    run()
    val afterDel = spark.read.parquet(out)
    assert(afterDel.count() == 13L, "10 inserts + 3 delete effects")
    val dels = afterDel.where("_change_type = 'delete'")
      .select("k").as[Long].collect().toSet
    assert(dels == Set(1L, 2L, 3L), s"wrong delete effects: $dels")
    // a positional UPDATE arrives as delete + insert effects in one commit
    spark.sql("UPDATE snap.default.scdc SET v = 'patched' WHERE k = 7")
    run()
    val afterUpd = spark.read.parquet(out)
    assert(afterUpd.where("_change_type = 'delete' AND k = 7").count() == 1L)
    assert(afterUpd.where("_change_type = 'insert' AND k = 7 AND v = 'patched'")
      .count() == 1L)
    // consumer-side state reconstruction equals the table's batch head:
    // latest effect per key wins (inserts minus later deletes)
    val effects = afterUpd
      .groupBy($"k").agg(
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct($"_commit_version",
            org.apache.spark.sql.functions
              .when($"_change_type" === "insert", 1).otherwise(0).as("ins"),
            $"v")).as("last"))
      .where($"last.ins" === 1)
      .select($"k", $"last.v".as("v"))
    val head = spark.table("snap.default.scdc").select($"k", $"v")
    assert(effects.exceptAll(head).isEmpty && head.exceptAll(effects).isEmpty,
      "replaying the change feed must reconstruct the table head")
    // batch SELECT of the feed (r20, Delta's table_changes shape):
    // the full-history read equals everything the stream delivered
    val batchAll = spark.sql("SELECT * FROM snap.default.scdc.changes")
    assert(batchAll.count() == afterUpd.count())
    val streamed = afterUpd.select($"k", $"v", $"_change_type", $"_commit_version")
    val batched = batchAll.select($"k", $"v", $"_change_type", $"_commit_version")
    assert(batched.exceptAll(streamed).isEmpty && streamed.exceptAll(batched).isEmpty,
      "batch and streaming reads of the feed must deliver identical effects")
    // a bounded range reads one commit's effects without a checkpoint
    val ranged = spark.read
      .option("startingVersion", "2").option("endingVersion", "3")
      .table("snap.default.scdc.changes")
    assert(ranged.select("_commit_version").distinct()
      .as[Long].collect().toSet == Set(3L))
  }

  test("the .changes feed paces catch-up with maxFilesPerTrigger") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = Qx.tmpOut("scpwh", sf())
    graft.catalog.GraftCatalog.register(spark, "snap", Some(wh))
    spark.sql("DROP TABLE IF EXISTS snap.default.scp")
    spark.sql("CREATE TABLE snap.default.scp (k BIGINT)")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO snap.default.scp SELECT id FROM range(${i * 10}, ${i * 10 + 10})"))
    val out = Qx.tmpOut("scpout", sf())
    val ckpt = Qx.tmpOut("scpckpt", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val q = spark.readStream.option("maxFilesPerTrigger", "1")
      .table("snap.default.scp.changes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() == 30L)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "maxFilesPerTrigger=1 must split the catch-up into multiple batches")
  }

  test("the .changes feed streams KEYED merge-on-read deletes, upserts, scoped stacking") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = Qx.tmpOut("sckwh", sf())
    graft.catalog.GraftCatalog.register(spark, "snap", Some(wh))
    spark.sql("DROP TABLE IF EXISTS snap.default.sck")
    spark.sql("""CREATE TABLE snap.default.sck (k BIGINT, v STRING)
                |TBLPROPERTIES ('graft.mor.key'='k')""".stripMargin)
    spark.sql("INSERT INTO snap.default.sck SELECT id, concat('v', id) FROM range(0, 10)")
    val out = Qx.tmpOut("sckout", sf())
    val ckpt = Qx.tmpOut("sckckpt", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def run(cp: String = ckpt, dst: String = out): Unit = {
      val q = spark.readStream.table("snap.default.sck.changes")
        .writeStream.format("parquet")
        .option("path", dst).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).where("_change_type = 'insert'").count() == 10L)
    // a keyed MOR DELETE flows as delete effects — no skip, no failure
    spark.sql("DELETE FROM snap.default.sck WHERE k < 3")
    run()
    assert(spark.read.parquet(out).where("_change_type = 'delete'")
      .select("k").as[Long].collect().toSet == Set(0L, 1L, 2L))
    // a STACKED overlapping delete emits only the NEWLY hidden key:
    // rows already hidden by the first set must not re-emit
    spark.sql("DELETE FROM snap.default.sck WHERE k <= 3")
    run()
    val dels = spark.read.parquet(out).where("_change_type = 'delete'")
    assert(dels.count() == 4L, "3 + exactly 1 newly hidden")
    assert(dels.where("_commit_version = 3").select("k").as[Long].collect().toSeq
      == Seq(3L), "only k=3 is newly hidden by the overlapping delete")
    // a keyed UPDATE (delta upsert) arrives as delete + insert in one commit
    spark.sql("UPDATE snap.default.sck SET v = 'patched' WHERE k = 7")
    run()
    val all = spark.read.parquet(out)
    assert(all.where("_change_type = 'delete' AND k = 7").count() == 1L)
    assert(all.where("_change_type = 'insert' AND k = 7 AND v = 'patched'").count() == 1L)
    // replaying the whole feed reconstructs the table head
    val effects = all
      .groupBy($"k").agg(
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct($"_commit_version",
            org.apache.spark.sql.functions
              .when($"_change_type" === "insert", 1).otherwise(0).as("ins"),
            $"v")).as("last"))
      .where($"last.ins" === 1)
      .select($"k", $"last.v".as("v"))
    val head = spark.table("snap.default.sck").select($"k", $"v")
    assert(effects.exceptAll(head).isEmpty && head.exceptAll(effects).isEmpty,
      "replaying the keyed change feed must reconstruct the table head")
    // a FRESH consumer replays retained history (initial chunk at the
    // oldest version + tail) and reconstructs the same head
    val out2 = Qx.tmpOut("sckout2", sf())
    val ckpt2 = Qx.tmpOut("sckckpt2", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt2))
    run(ckpt2, out2)
    val fresh = spark.read.parquet(out2)
    val freshState = fresh
      .groupBy($"k").agg(
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct($"_commit_version",
            org.apache.spark.sql.functions
              .when($"_change_type" === "insert", 1).otherwise(0).as("ins"),
            $"v")).as("last"))
      .where($"last.ins" === 1)
      .select($"k", $"last.v".as("v"))
    assert(freshState.exceptAll(head).isEmpty && head.exceptAll(freshState).isEmpty)
    // after VACUUM truncates history, the initial chunk carries the
    // PENDING keyed sets and a fresh consumer gets visible rows only
    val root = s"$wh/default/sck"
    graft.sources.Snapshots.vacuum(root, keepLast = 1)
    val out3 = Qx.tmpOut("sckout3", sf())
    val ckpt3 = Qx.tmpOut("sckckpt3", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out3))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt3))
    run(ckpt3, out3)
    val afterVacuum = spark.read.parquet(out3)
    assert(afterVacuum.where("_change_type = 'insert'").count() == head.count(),
      "a post-vacuum initial chunk must deliver exactly the visible rows")
    assert(afterVacuum.where("k < 3").isEmpty, "hidden keys never surface")
    assert(afterVacuum.where("k = 7 AND v = 'patched'").count() == 1L)
  }

  test("the .changes feed serves PARTITIONED tables: path values re-attach by name") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = Qx.tmpOut("scptwh", sf())
    graft.catalog.GraftCatalog.register(spark, "snap", Some(wh))
    // a days(ts)-transform table AND an identity-partitioned table —
    // both carry path-only/synthetic segments the r19 feed refused
    spark.sql("DROP TABLE IF EXISTS snap.default.scpt")
    spark.sql("""CREATE TABLE snap.default.scpt (k BIGINT, ts TIMESTAMP, v STRING)
                |PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql("""INSERT INTO snap.default.scpt
                |SELECT id, timestamp'2026-03-01 08:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT)),
                |       concat('v', id) FROM range(0, 12)""".stripMargin)
    val out = Qx.tmpOut("scptout", sf())
    val ckpt = Qx.tmpOut("scptckpt", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def run(): Unit = {
      val q = spark.readStream.table("snap.default.scpt.changes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    val init = spark.read.parquet(out)
    assert(init.count() == 12L)
    // every column survives the partition-reordered scan, BY NAME: ts
    // (the transform source) reads from data, k/v intact
    val got = init.select($"k", $"ts".cast("string"), $"v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = spark.table("snap.default.scpt")
      .select($"k", $"ts".cast("string"), $"v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == want, s"feed rows diverge from the table: ${got.diff(want)}")
    // _commit_timestamp: the CDC parity column, non-null and monotone
    val tsByV = init.select($"_commit_version", $"_commit_timestamp").distinct()
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(tsByV.values.forall(_ != null), "commit timestamps must populate")
    // an APPEND streams incrementally with its own version + timestamp
    spark.sql("""INSERT INTO snap.default.scpt
                |SELECT id, timestamp'2026-03-05 09:00:00', concat('n', id)
                |FROM range(100, 105)""".stripMargin)
    run()
    val after = spark.read.parquet(out)
    assert(after.count() == 17L)
    assert(after.where("k >= 100 AND _commit_version = 2").count() == 5L)
    val ts2 = after.where("_commit_version = 2")
      .select($"_commit_timestamp").distinct().collect()
    assert(ts2.length == 1 && ts2.head.getTimestamp(0) != null)
    assert(ts2.head.getTimestamp(0).getTime >=
      tsByV(1L).getTime, "commit timestamps are monotone across versions")

    // IDENTITY partitioning: the partition column exists ONLY in the
    // path — the feed re-attaches it positionally-last in the scan but
    // emits it by name in declared order
    spark.sql("DROP TABLE IF EXISTS snap.default.scpi")
    spark.sql("""CREATE TABLE snap.default.scpi (region STRING, k BIGINT, v STRING)
                |PARTITIONED BY (region)""".stripMargin)
    spark.sql("""INSERT INTO snap.default.scpi
                |SELECT CASE WHEN id % 2 = 0 THEN 'east' ELSE 'west' END,
                |       id, concat('r', id) FROM range(0, 10)""".stripMargin)
    val out2 = Qx.tmpOut("scpiout", sf())
    val ckpt2 = Qx.tmpOut("scpickpt", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt2))
    val q2 = spark.readStream.table("snap.default.scpi.changes")
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val feed2 = spark.read.parquet(out2)
    assert(feed2.count() == 10L)
    val pairs = feed2.select($"region", $"k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(pairs == (0L until 10L).map(k =>
      (if (k % 2 == 0) "east" else "west", k)).toSet,
      s"path-only partition values must re-attach to the right column: $pairs")
  }

  test("the .changes feed tails a days(ts) keyed-MOR table through append + keyed delete") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = Qx.tmpOut("scpkwh", sf())
    graft.catalog.GraftCatalog.register(spark, "snap", Some(wh))
    spark.sql("DROP TABLE IF EXISTS snap.default.scpk")
    spark.sql("""CREATE TABLE snap.default.scpk (k BIGINT, ts TIMESTAMP, v STRING)
                |PARTITIONED BY (days(ts))
                |TBLPROPERTIES ('graft.mor.key'='k')""".stripMargin)
    spark.sql("""INSERT INTO snap.default.scpk
                |SELECT id, timestamp'2026-07-01 09:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT)),
                |       concat('v', id) FROM range(0, 12)""".stripMargin)
    val out = Qx.tmpOut("scpkout", sf())
    val ckpt = Qx.tmpOut("scpkckpt", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def run(): Unit = {
      val q = spark.readStream.table("snap.default.scpk.changes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).count() == 12L)
    // an APPEND and a KEYED DELETE on the transform-partitioned table
    spark.sql("""INSERT INTO snap.default.scpk
                |SELECT id, timestamp'2026-07-04 10:00:00', concat('n', id)
                |FROM range(100, 105)""".stripMargin)
    spark.sql("DELETE FROM snap.default.scpk WHERE k IN (0, 1, 100)")
    run()
    val feed = spark.read.parquet(out)
    assert(feed.where("_change_type = 'insert'").count() == 17L)
    val dels = feed.where("_change_type = 'delete'")
    assert(dels.select("k").as[Long].collect().toSet == Set(0L, 1L, 100L),
      "keyed delete effects on the days(ts) table")
    assert(dels.where($"ts".isNull).isEmpty,
      "the transform source column survives the delete-effect scan")
    // the feed reconstructs the head
    val effects = feed
      .groupBy($"k").agg(
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct($"_commit_version",
            org.apache.spark.sql.functions
              .when($"_change_type" === "insert", 1).otherwise(0).as("ins"),
            $"v")).as("last"))
      .where($"last.ins" === 1)
      .select($"k", $"last.v".as("v"))
    val head = spark.table("snap.default.scpk").select($"k", $"v")
    assert(effects.exceptAll(head).isEmpty && head.exceptAll(effects).isEmpty,
      "replaying the partitioned keyed feed must reconstruct the table head")
  }

  test("rewrite diffs on an identity-partitioned table keep declared partition types") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = Qx.tmpOut("scrdiwh", sf())
    graft.catalog.GraftCatalog.register(spark, "snap", Some(wh))
    spark.sql("DROP TABLE IF EXISTS snap.default.scrdi")
    // STRING partition values that type-INFERENCE would mangle
    // ('007' -> int 7): the diff must read them at the declared type
    spark.sql("""CREATE TABLE snap.default.scrdi (code STRING, k BIGINT, v STRING)
                |PARTITIONED BY (code)
                |TBLPROPERTIES ('graft.changes.rewriteDiff'='true')""".stripMargin)
    spark.sql("""INSERT INTO snap.default.scrdi
                |SELECT IF(id % 2 = 0, '007', '7'), id, concat('v', id)
                |FROM range(0, 8)""".stripMargin)
    val out = Qx.tmpOut("scrdiout", sf())
    val ckpt = Qx.tmpOut("scrdickpt", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def run(): Unit = {
      val q = spark.readStream.table("snap.default.scrdi.changes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).count() == 8L)
    // a COW DELETE's diff: exactly the matched rows, with the '007'
    // partition value INTACT (not re-typed to 7 and back to "7") and
    // rows untouched by the statement NOT churned into the diff
    spark.sql("DELETE FROM snap.default.scrdi WHERE k IN (0, 1)")
    run()
    val feed = spark.read.parquet(out)
    val dels = feed.where("_change_type = 'delete'")
      .select($"code", $"k").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dels == Set(("007", 0L), ("7", 1L)), s"delete effects: $dels")
    assert(feed.count() == 10L,
      "untouched rows must cancel in the diff — no spurious churn")
    val head = spark.table("snap.default.scrdi").select($"code", $"k", $"v")
    val effects = feed
      .groupBy($"code", $"k", $"v").agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions
            .when($"_change_type" === "insert", 1).otherwise(-1)).as("alive"))
      .where($"alive" > 0).select($"code", $"k", $"v")
    assert(effects.exceptAll(head).isEmpty && head.exceptAll(effects).isEmpty)
  }

  test("the .changes feed survives a WAP publish of a COW-repaired branch") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = Qx.tmpOut("scwapwh", sf())
    graft.catalog.GraftCatalog.register(spark, "snap", Some(wh))
    spark.sql("DROP TABLE IF EXISTS snap.default.scwap")
    spark.sql("""CREATE TABLE snap.default.scwap (k BIGINT, v STRING)
                |TBLPROPERTIES ('graft.changes.rewriteDiff'='true')""".stripMargin)
    spark.sql("INSERT INTO snap.default.scwap SELECT id, concat('v', id) FROM range(0, 10)")
    val out = Qx.tmpOut("scwapout", sf())
    val ckpt = Qx.tmpOut("scwapckpt", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def run(): Unit = {
      val q = spark.readStream.table("snap.default.scwap.changes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).count() == 10L)
    // WAP: the risky batch lands on a branch, the audit repairs it
    // with COW statements ON THE BRANCH, then one atomic squash
    // publish — the squash is a REWRITE commit (the branch COW
    // replaced fork-era files), and the publish materializes its
    // fork→head diff so the tailing consumer keeps flowing
    spark.sql("CALL snap.system.create_branch('default.scwap', 'audit')")
    spark.sql("""INSERT INTO snap.default.scwap.branch_audit
                |SELECT id, IF(id = 12, 'corrupt', concat('b', id))
                |FROM range(10, 15)""".stripMargin)
    spark.sql("UPDATE snap.default.scwap.branch_audit SET v = 'b12' WHERE v = 'corrupt'")
    spark.sql("DELETE FROM snap.default.scwap.branch_audit WHERE k = 14")
    spark.sql("CALL snap.system.fast_forward('default.scwap', 'audit')")
    run()
    val feed = spark.read.parquet(out)
    val pubVer = feed.agg(org.apache.spark.sql.functions
      .max($"_commit_version")).head().getLong(0)
    val pub = feed.where($"_commit_version" === pubVer)
    assert(pub.where("_change_type = 'insert'").select("k").as[Long]
      .collect().toSet == Set(10L, 11L, 12L, 13L),
      "the publish emits exactly the repaired batch as inserts")
    assert(pub.where("_change_type = 'delete'").isEmpty,
      "no pre-publish row was touched — no delete effects")
    assert(pub.where("k = 12 AND v = 'b12'").count() == 1L,
      "the repaired value, not the corrupt one")
    // feed replay reconstructs the published head
    val effects = feed
      .groupBy($"k", $"v").agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions
            .when($"_change_type" === "insert", 1).otherwise(-1)).as("alive"))
      .where($"alive" > 0).select($"k", $"v")
    val head = spark.table("snap.default.scwap").select($"k", $"v")
    assert(effects.exceptAll(head).isEmpty && head.exceptAll(effects).isEmpty)
  }

  test("the .changes feed survives COW rewrites and compaction via materialized diffs") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = Qx.tmpOut("scrdwh", sf())
    graft.catalog.GraftCatalog.register(spark, "snap", Some(wh))
    spark.sql("DROP TABLE IF EXISTS snap.default.scrd")
    spark.sql("""CREATE TABLE snap.default.scrd (k BIGINT, v STRING)
                |TBLPROPERTIES ('graft.changes.rewriteDiff'='true')""".stripMargin)
    spark.sql("INSERT INTO snap.default.scrd SELECT id, concat('v', id) FROM range(0, 10)")
    val out = Qx.tmpOut("scrdout", sf())
    val ckpt = Qx.tmpOut("scrdckpt", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def run(): Unit = {
      val q = spark.readStream.table("snap.default.scrd.changes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).count() == 10L)
    // a COW UPDATE is a full-rewrite commit — the r19 feed refused it;
    // the materialized diff delivers exactly delete(old) + insert(new)
    spark.sql("UPDATE snap.default.scrd SET v = 'patched' WHERE k = 5")
    run()
    val afterUpd = spark.read.parquet(out)
    assert(afterUpd.count() == 12L, "10 inserts + 1 delete + 1 insert effect")
    assert(afterUpd.where("_change_type = 'delete' AND k = 5 AND v = 'v5'").count() == 1L)
    assert(afterUpd.where("_change_type = 'insert' AND k = 5 AND v = 'patched'").count() == 1L)
    // a COW DELETE flows as delete effects only
    spark.sql("DELETE FROM snap.default.scrd WHERE k < 3")
    run()
    val afterDel = spark.read.parquet(out)
    assert(afterDel.where("_change_type = 'delete'")
      .where("k < 3").count() == 3L)
    assert(afterDel.count() == 15L)
    // a LIVE stream drives through a compaction commit: rows unchanged,
    // zero effects, no refusal — and later appends keep flowing
    spark.sql("CALL snap.system.compact('default.scrd')")
    run()
    assert(spark.read.parquet(out).count() == 15L,
      "a compaction contributes zero row effects")
    spark.sql("INSERT INTO snap.default.scrd SELECT id, concat('n', id) FROM range(20, 25)")
    run()
    val fin = spark.read.parquet(out)
    assert(fin.count() == 20L)
    assert(fin.where("k >= 20 AND _change_type = 'insert'").count() == 5L)
    // INSERT OVERWRITE — the other row-changing rewrite kind — flows
    // through the same materialized diff: replaced rows emit as
    // deletes, surviving rows cancel, new rows as inserts
    spark.sql("""INSERT OVERWRITE snap.default.scrd
                |SELECT k, v FROM snap.default.scrd WHERE k >= 10
                |UNION ALL SELECT id, concat('o', id) FROM range(30, 33)""".stripMargin)
    run()
    val afterOw = spark.read.parquet(out)
    // the overwrite dropped the 7 surviving sub-10 keys (0..2 were
    // deleted earlier; 3..9 survive, 5 as 'patched') and added 3 rows
    val owVer = afterOw.agg(org.apache.spark.sql.functions
      .max($"_commit_version")).head().getLong(0)
    val owDels = afterOw.where($"_commit_version" === owVer &&
      $"_change_type" === "delete").select("k").as[Long].collect().toSet
    assert(owDels == Set(3L, 4L, 5L, 6L, 7L, 8L, 9L), s"overwrite deletes: $owDels")
    assert(afterOw.where($"_commit_version" === owVer &&
      $"_change_type" === "insert").select("k").as[Long].collect().toSet ==
      Set(30L, 31L, 32L), "overwrite inserts only the genuinely new rows")
    // replaying the whole feed reconstructs the table head exactly
    val effects = afterOw
      .groupBy($"k", $"v").agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions
            .when($"_change_type" === "insert", 1).otherwise(-1)).as("alive"))
      .where($"alive" > 0).select($"k", $"v")
    val head = spark.table("snap.default.scrd").select($"k", $"v")
    assert(effects.exceptAll(head).isEmpty && head.exceptAll(effects).isEmpty,
      "replaying the rewrite-diff feed must reconstruct the table head")
    assert(afterOw.where("_commit_timestamp IS NULL").isEmpty,
      "every effect carries its commit timestamp")
    // retention: the sidecars are manifest-referenced — vacuum keeps
    // them while their version is retained
    val root = s"$wh/default/scrd"
    val sidecars = graft.sources.Snapshots.resolve(root).get.changeFiles
    assert(sidecars.nonEmpty)
    graft.sources.Snapshots.vacuum(root, keepLast = 3, stagingGraceMs = -1000L)
    sidecars.foreach(f => assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(f)), s"vacuum must keep referenced sidecar $f"))

    // the SAME loop on a days(ts)-PARTITIONED table (COW is the only
    // row-level mode partitioned tables have): append + DELETE flow
    spark.sql("DROP TABLE IF EXISTS snap.default.scrdp")
    spark.sql("""CREATE TABLE snap.default.scrdp (k BIGINT, ts TIMESTAMP, v STRING)
                |PARTITIONED BY (days(ts))
                |TBLPROPERTIES ('graft.changes.rewriteDiff'='true')""".stripMargin)
    spark.sql("""INSERT INTO snap.default.scrdp
                |SELECT id, timestamp'2026-04-01 10:00:00' + make_interval(0,0,0,CAST(id % 2 AS INT)),
                |       concat('p', id) FROM range(0, 8)""".stripMargin)
    val out2 = Qx.tmpOut("scrdpout", sf())
    val ckpt2 = Qx.tmpOut("scrdpckpt", sf())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt2))
    def run2(): Unit = {
      val q = spark.readStream.table("snap.default.scrdp.changes")
        .writeStream.format("parquet")
        .option("path", out2).option("checkpointLocation", ckpt2)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run2()
    assert(spark.read.parquet(out2).count() == 8L)
    spark.sql("DELETE FROM snap.default.scrdp WHERE k % 2 = 0")
    run2()
    val feedP = spark.read.parquet(out2)
    val delEffects = feedP.where("_change_type = 'delete'")
    assert(delEffects.select("k").as[Long].collect().toSet ==
      Set(0L, 2L, 4L, 6L), "partitioned COW DELETE effects")
    assert(delEffects.where($"ts".isNull).isEmpty,
      "the transform-source column must survive the diff materialization")
  }
}
