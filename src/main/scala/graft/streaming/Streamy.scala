package graft.streaming

import graft.{Qx, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Streaming operators (SURVEY §2.9) — batch twins.
  *
  * The reference is batch + an HTTP "real-time" UI
  * (/root/reference/README.md:11); true pipelines are driver north-star
  * scope. Each key here is the *batch twin* of a Structured Streaming
  * op: same logical aggregation, expressed so the DuckDB oracle can
  * check it. The genuinely streaming forms (withWatermark + window /
  * session_window / dropDuplicatesWithinWatermark /
  * flatMapGroupsWithState) live in [[StreamRunner]] and are exercised
  * with MemoryStream in the test suite — they share these twins'
  * semantics by construction.
  */
object Streamy {
  import Qx._

  type Q = (SparkSession, String) => DataFrame

  /** Per-hour tumbling counts/sums. The batch `window()` function is the
    * same expression streaming uses, so the twin is literally the same
    * plan minus the watermark. */
  val streamTumbling: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
      .orderBy($"window_start", $"event_type")
  }

  /** 1h windows sliding every 15m — each event lands in 4 windows.
    * Spark aligns window starts to epoch multiples of the slide, which
    * the oracle reproduces with integer µs arithmetic. */
  val streamSliding: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("window_start"), $"event_type", $"n")
      .orderBy($"window_start", $"event_type")
  }

  /** Per-user sessions with a 30-minute gap. Batch `session_window`
    * merges exactly like the streaming one: a row at prev_ts + 30m
    * starts a NEW session (end bound is exclusive). */
  val streamSession: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  /** Deterministic emulation of watermark late-drop: arrival order =
    * event_id, running max event time, drop rows older than max − 10m,
    * then the hourly aggregate. (The genuinely streaming form is
    * StreamRunner.tumblingWithWatermark.)
    *
    * The running max is a DISTRIBUTED prefix-max, not a global
    * `Window.orderBy` (which would move every row to one partition —
    * the r2 bench flagged exactly that WARN). Shape: bucket arrival
    * order into B range-buckets where B scales with cluster
    * parallelism (NOT with data), reduce each bucket to its max in a
    * map-side-combined agg, prefix-scan the B carry-ins on the driver
    * (a constant-size array — this is the "broadcast the per-partition
    * carry-ins" step, not a data-sized collect), and finish with a
    * bucket-PARTITIONED running-max window. Every stage is parallel;
    * per-task rows are n/B. */
  val streamWatermarkLate: Q = (s, dir) => {
    import s.implicits._
    // Project to the four consumed columns, then persist: the derivation
    // needs two driver actions (id-span agg, bucket-max collect) plus the
    // main query — cached, the parquet file is scanned ONCE instead of
    // three times. (At 100 TB one would skip the cache and pay two extra
    // column-pruned scans of (event_id[, ts]) instead — both modes keep
    // every stage parallel; this one keeps I/O minimal at bench scale.)
    val e0raw = Tables.load(s, dir, "events")
      .select($"event_id", $"event_type", $"ts", unix_micros($"ts").as("us"))
    // Guard the persist: repeated bench passes rebuild this same plan,
    // and re-persisting an already-cached plan WARNs into the log tail.
    val e0 = {
      val ds = e0raw.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      if (ds.sparkSession.sharedState.cacheManager.lookupCachedData(ds).isEmpty)
        e0raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else e0raw
    }
    val nBuckets = s.sessionState.conf.numShufflePartitions.toLong * 4
    // Bucket on (event_id - minId) so sparse/offset id spaces (e.g.
    // snowflake-style ids starting at a large base) still spread across
    // all buckets; width from the span also removes any width<=0 path.
    // min/max of zero rows is null — an empty table degenerates to one
    // empty bucket instead of an NPE.
    val mm = e0.agg(min($"event_id"), max($"event_id")).first()
    val (minId, maxId) =
      if (mm.isNullAt(0)) (0L, 0L) else (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (maxId - minId) / nBuckets + 1)
    val e = e0.withColumn("b", floor(($"event_id" - minId) / width))
    // B rows total (one per bucket): the bounded carry-in collect.
    val bucketMax = e.groupBy($"b").agg(max($"us").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var run = Long.MinValue
    val carry: Map[Long, Long] = bucketMax.map { case (b, m) =>
      val c = (b, run); run = math.max(run, m); c
    }.toMap
    val carryCol = coalesce(element_at(typedlit(carry), $"b"), lit(Long.MinValue))
    val w = Window.partitionBy($"b").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("runmax", greatest(max($"us").over(w), carryCol))
      .filter($"us" >= $"runmax" - 600000000L)
      .groupBy(date_trunc("hour", $"ts").as("hour_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"hour_start", $"event_type")
  }

  /** Dedup by (user, type) keeping the first-arriving event —
    * deterministic via row_number (dropDuplicates keeps an arbitrary
    * row; its streaming form is StreamRunner.dedupWithinWatermark). */
  val streamDedup: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"event_id")
    Tables.load(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"ts")
      .orderBy($"user_id", $"event_type")
  }

  /** Custom per-user running state — for every purchase, emit how many
    * purchases that user has made so far and the exact running cents
    * total. Batch twin of StreamRunner.statefulPurchases
    * (flatMapGroupsWithState).
    *
    * Implemented as a SECONDARY SORT, not flatMapGroups: repartition on
    * user_id co-locates each user, sortWithinPartitions puts the
    * partition in (user, time, id) order, and mapPartitions streams it
    * with O(1) running state that resets at each user boundary. No
    * per-group buffer ever materializes — a hot key at 100× is a longer
    * iterator, not an executor OOM (the r2/r3 `it.toSeq.sortBy` weak
    * spot). The sort itself is Spark's spillable external sort. */
  val streamStateful: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"value", unix_micros($"ts").as("us"))
      .as[(Long, Long, Double, Long)]
    ev.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"us", $"event_id")
      .mapPartitions { it =>
        var started = false
        var cur = 0L
        var n = 0L
        var cents = 0L
        it.map { case (uid, eid, v, _) =>
          if (!started || uid != cur) { started = true; cur = uid; n = 0L; cents = 0L }
          n += 1
          cents += math.round(v * 100.0)
          (uid, eid, n, cents)
        }
      }
      .toDF("user_id", "event_id", "n_so_far", "cum_cents")
      .orderBy($"event_id")
  }

  /** Running distinct-event-type count per user — batch twin of
    * StreamRunner.distinctTypesTws (transformWithState + MapState).
    * Expressed relationally so the oracle can check it: an event is
    * "new" iff it's the first of its (user, type) in arrival order;
    * the running sum of the new-flags is the distinct count so far. */
  val streamTwsTypes: Q = (s, dir) => {
    import s.implicits._
    val wNew = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"us", $"event_id")
    val wRun = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "events")
      .withColumn("us", unix_micros($"ts"))
      .withColumn("is_new", (row_number().over(wNew) === 1).cast("long"))
      .withColumn("n_types_so_far", sum($"is_new").over(wRun))
      .select($"user_id", $"event_id", $"event_type", $"n_types_so_far")
      .orderBy($"event_id")
  }

  /** Purchase attribution: each purchase joined to the same user's
    * clicks in the preceding hour — batch twin of the watermarked
    * stream-stream interval join (StreamRunner.purchaseAttribution).
    * The time band rides on the user_id equi key (hash join + range
    * post-filter), so both sides shuffle once on user_id — never a
    * cartesian; in the streaming form the same interval bounds the
    * engine's click buffer to watermark + 1h of state. */
  val streamIntervalJoin: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.load(s, dir, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), unix_micros($"ts").as("p_us"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        unix_micros($"ts").as("c_us"))
    p.join(c, $"user_id" === $"c_user" &&
        $"c_us" >= $"p_us" - 3600000000L && $"c_us" <= $"p_us")
      .select($"user_id", $"purchase_id", $"click_id",
        floor(($"p_us" - $"c_us") / 1000000.0).cast("long").as("secs_before"))
      .orderBy($"purchase_id", $"click_id")
  }

  /** Per-window top-3 event types by count: the windowed-aggregation
    * discipline composed with the native [[graft.plans.TopKPerGroup]]
    * operator. The count agg shuffles once on (window, type) with
    * map-side combine; k-selection then never re-shuffles the full
    * count stream — partial heaps cap it at 3·partitions rows per
    * window. (n desc, event_type) is a total order within a window, so
    * ranking the 3 survivors with a tiny window function equals ranking
    * the full set; the all-window form is the DuckDB oracle. The
    * streaming form (watermark + foreachBatch top-k) is
    * [[StreamRunner.windowTopkWithWatermark]]. */
  val streamWindowTopk: Q = (s, dir) => {
    import s.implicits._
    val counts = Tables.load(s, dir, "events")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
    val top = graft.plans.TopK.perGroup(counts, 3, Seq("window_start"),
      Seq(("n", true), ("event_type", false)))
    val w = Window.partitionBy($"window_start").orderBy($"n".desc, $"event_type")
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select($"window_start", $"rnk", $"event_type", $"n", $"total_value")
      .orderBy($"window_start", $"rnk")
  }

  /** Per-user inactivity sessions — the TIMER-closed variant (r7):
    * same 30-minute gap rule as [[streamSession]] but emitting the
    * LAST-EVENT time as session_end plus per-session value totals —
    * the payload a timer-driven processor emits when a key goes
    * silent. The genuinely streaming form
    * ([[StreamRunner.timerSessions]]) keeps one ValueState per key and
    * ONE registered event-time timer at last-event + gap; the timer
    * fires when the watermark passes it — state is O(1) per key and
    * the emission needs no end-of-stream flush. StreamingSpec asserts
    * parity against this twin on the same rows. */
  val streamTimerSession: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val marked = Tables.load(s, dir, "events")
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_s",
        when($"prev_us".isNull ||
          unix_micros($"ts") - $"prev_us" >= 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sess_id", sum($"new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy($"user_id", $"sess_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"), dsum($"value").as("value_sum"))
      .select($"user_id", $"session_start", $"session_end",
        $"n_events", $"value_sum")
      .orderBy($"user_id", $"session_start")
  }

  /** Batch twin of the streaming CDC compaction
    * ([[StreamRunner.upsertLatest]]): the final upsert-sink state —
    * latest change row per key under the (ts, event_id) total order,
    * tombstones KEPT and flagged (the sink's delete markers), unlike
    * [[graft.operators.CdcOps.cdcUpsertLatest]] which drops them.
    * Routed through the native TopKPerGroup at k=1 — the exchange
    * carries one row per (task, key), never the raw changelog. */
  val streamCdcUpsert: Q = (s, dir) => {
    import s.implicits._
    graft.plans.TopK.perGroup(
      Tables.load(s, dir, "events")
        .select($"user_id", $"event_id", $"ts", $"event_type", $"value"),
      1, Seq("user_id"), Seq(("ts", true), ("event_id", true)))
      .select($"user_id", $"event_id".as("last_event_id"),
        $"ts".as("last_ts"), $"event_type".as("last_type"),
        $"value".as("last_value"),
        ($"event_type" === "error").as("is_tombstone"))
      .orderBy($"user_id")
  }

  val queries: Map[String, Q] = Map(
    "stream_cdc_upsert" -> streamCdcUpsert,
    "stream_timer_session" -> streamTimerSession,
    "stream_window_topk" -> streamWindowTopk,
    "stream_interval_join" -> streamIntervalJoin,
    "stream_tws_types" -> streamTwsTypes,
    "stream_tumbling" -> streamTumbling,
    "stream_sliding" -> streamSliding,
    "stream_session" -> streamSession,
    "stream_watermark_late" -> streamWatermarkLate,
    "stream_dedup" -> streamDedup,
    "stream_stateful" -> streamStateful)

  val oracle: Map[String, String] = Map(
    "stream_cdc_upsert" -> """
      WITH ranked AS (
        SELECT user_id, event_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, event_id AS last_event_id, ts AS last_ts,
             event_type AS last_type, value AS last_value,
             event_type = 'error' AS is_tombstone
      FROM ranked WHERE rn = 1 ORDER BY user_id""",
    "stream_timer_session" -> s"""
      WITH e AS (SELECT user_id, event_id, value,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      f AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
                             OR us - LAG(us) OVER w >= 1800000000
                           THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
            FROM f)
      SELECT user_id, make_timestamp(MIN(us)) AS session_start,
             make_timestamp(MAX(us)) AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ${dsumSql("value")} AS value_sum
      FROM g GROUP BY user_id, sess_id
      ORDER BY user_id, session_start""",
    "stream_interval_join" -> """
      WITH e AS (SELECT user_id, event_id, event_type,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
      SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
             CAST(floor((p.us - c.us) / 1000000.0) AS BIGINT) AS secs_before
      FROM e p JOIN e c
        ON p.user_id = c.user_id
       AND p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.us >= p.us - 3600000000 AND c.us <= p.us
      ORDER BY purchase_id, click_id""",
    "stream_tws_types" -> """
      WITH e AS (SELECT user_id, event_id, event_type,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      f AS (SELECT *, CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type ORDER BY us, event_id) = 1
                 THEN 1 ELSE 0 END AS is_new FROM e)
      SELECT user_id, event_id, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_types_so_far
      FROM f ORDER BY event_id""",
    "stream_tumbling" -> s"""
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             event_type, COUNT(*) AS n, ${dsumSql("value")} AS total_value
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "stream_window_topk" -> s"""
      WITH c AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type, COUNT(*) AS n, ${dsumSql("value")} AS total_value
        FROM events GROUP BY 1, 2)
      SELECT window_start, rnk, event_type, n, total_value FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY window_start
                 ORDER BY n DESC, event_type) AS rnk
        FROM c) WHERE rnk <= 3
      ORDER BY window_start, rnk""",
    "stream_sliding" -> """
      SELECT make_timestamp(((us // 900000000) - i) * 900000000) AS window_start,
             event_type, COUNT(*) AS n
      FROM (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events)
      CROSS JOIN (VALUES (0), (1), (2), (3)) t(i)
      GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "stream_session" -> """
      WITH e AS (SELECT user_id, event_id,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      f AS (SELECT user_id, event_id, us,
                   CASE WHEN LAG(us) OVER w IS NULL
                          OR us - LAG(us) OVER w >= 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      g AS (SELECT user_id, us,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM f)
      SELECT user_id, make_timestamp(MIN(us)) AS session_start,
             make_timestamp(MAX(us) + 1800000000) AS session_end,
             COUNT(*) AS n_events
      FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "stream_watermark_late" -> """
      WITH e AS (SELECT *, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      f AS (SELECT *, MAX(us) OVER (ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
            FROM e)
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             event_type, COUNT(*) AS n
      FROM f WHERE us >= runmax - 600000000
      GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "stream_dedup" -> """
      SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
      FROM (SELECT user_id, event_type, event_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                     ORDER BY event_id) AS rn
            FROM events)
      WHERE rn = 1 ORDER BY user_id, event_type""",
    "stream_stateful" -> """
      SELECT user_id, event_id,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS n_so_far,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS cum_cents
      FROM (SELECT user_id, event_id, value,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events WHERE event_type = 'purchase')
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")
}
