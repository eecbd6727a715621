package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Genuinely streaming forms of the Streamy batch twins (SURVEY §2.9).
  *
  * No Kafka offline — these take any streaming DataFrame/Dataset
  * (file/rate/memory source; the test suite drives them with
  * MemoryStream) and are the plans a production deployment would run:
  * watermarked tumbling/session aggregation, within-watermark dedup,
  * and arbitrary per-key state via flatMapGroupsWithState.
  */
object StreamRunner {
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)

  /** The per-row total order every processor sorts and checks by —
    * ONE definition on the same microsecond basis the stored state
    * carries (Spark timestamps are micro-precision; a second
    * nano-based key here once let the sort and the ordering checks
    * disagree on paper). */
  private def evKey(e: Ev): (Long, Long) = (tsMicros(e), e.event_id)
  case class PurchaseUpdate(user_id: Long, event_id: Long, n_so_far: Long,
                            cum_cents: Long)
  case class PurchaseState(n: Long, cents: Long)

  /** Watermarked tumbling hourly counts — the streaming form of
    * Streamy.streamTumbling; late rows beyond 10m are dropped by the
    * engine, which streamWatermarkLate emulates in batch. */
  def tumblingWithWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming form of Streamy.streamWindowTopk, stage 1: watermarked
    * windowed counts. Stage 2 (per-window top-k) runs on each
    * micro-batch's output via [[windowTopkOfBatch]] — chained streaming
    * aggregations are unsupported by the engine, and the k-selection is
    * a bounded filter over the agg's update stream, so foreachBatch /
    * sink-then-select is the standard production shape. */
  def windowTopkCounts(events: DataFrame): DataFrame =
    tumblingWithWatermark(events)

  /** Stage 2: native TopKPerGroup over one micro-batch (or the sink
    * table) of [[windowTopkCounts]] output. */
  def windowTopkOfBatch(counts: DataFrame, k: Int = 3): DataFrame =
    graft.plans.TopK.perGroup(counts, k, Seq("window_start"),
      Seq(("n", true), ("event_type", false)))

  /** Watermarked 30-minute-gap sessions (Streamy.streamSession). */
  def sessionWithWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** State-bounded streaming dedup by event id (Streamy.streamDedup). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Same per-user purchase state machine on Spark 4's transformWithState
    * API — the successor to flatMapGroupsWithState: named state variables
    * with per-state TTL, timers, and evolvable state schema. Kept
    * alongside the classic form so both state APIs are covered. */
  class PurchaseProcessor
      extends StatefulProcessor[Long, Ev, PurchaseUpdate] {
    @transient private var st: ValueState[PurchaseState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PurchaseState](
        "purchases", Encoders.product[PurchaseState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[PurchaseUpdate] = {
      var cur = if (st.exists()) st.get() else PurchaseState(0L, 0L)
      val out = rows.toSeq.sortBy(evKey)
        .filter(_.event_type == "purchase").map { e =>
          cur = PurchaseState(cur.n + 1, cur.cents + math.round(e.value * 100.0))
          PurchaseUpdate(uid, e.event_id, cur.n, cur.cents)
        }
      // write state only when a purchase moved it: an unfiltered
      // caller's view-only keys must not materialize empty state rows
      if (out.nonEmpty) st.update(cur)
      out.iterator
    }
  }

  def statefulPurchasesTws(events: Dataset[Ev]): Dataset[PurchaseUpdate] = {
    import events.sparkSession.implicits._
    events.filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .transformWithState(new PurchaseProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  case class LastQuote(sec: Long, nanos: Int, event_id: Long, px: Double)
  case class TradeQuote(sym: Long, trade_id: Long,
                        quote_id: Option[Long], quote_px: Option[Double])

  /** Streaming as-of (tick-join) on transformWithState: per symbol
    * (keyed on user_id), ValueState holds the latest quote; each trade
    * emits joined to the prevailing quote, None before any quote. The
    * streaming counterpart of [[graft.plans.AsOfJoinExec]]'s backward
    * mode with O(1) state per key — versus buffering a quote history.
    *
    * Exactness contract: within a micro-batch rows sort by the
    * full-precision event-time key, so arbitrary interleaving inside a
    * batch is handled; ACROSS batches it assumes the per-key feed is
    * time-ordered (the standard ordered-tick-feed assumption — a quote
    * arriving after a later trade's batch cannot retroactively re-match
    * it).
    *
    * Timestamp ties are pinned, not left to event_id assignment: at the
    * exact same (sec, nanos), quotes order BEFORE trades, so a trade
    * sees the same-instant quote — at-or-before (inclusive) semantics,
    * the `strict = false` mode of [[graft.plans.AsOfJoinExec]]. (For
    * strictly-before semantics, rank trades before quotes instead.) */
  class AsOfQuoteProcessor extends StatefulProcessor[Long, Ev, TradeQuote] {
    // quotes (0) before trades (1) at equal timestamps — the inclusive
    // tie contract above; event_id last for full determinism.
    private def tickKey(e: Ev): (Long, Int, Long) =
      (tsMicros(e), if (e.event_type == "quote") 0 else 1, e.event_id)
    private def quoteKey(q: LastQuote): (Long, Int, Long) =
      (q.sec * 1000000L + q.nanos / 1000L, 0, q.event_id)
    @transient private var last: ValueState[LastQuote] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastQuote](
        "lastQuote", Encoders.product[LastQuote], TTLConfig.NONE)

    override def handleInputRows(sym: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[TradeQuote] = {
      var cur = if (last.exists()) Some(last.get()) else None
      val out = rows.toSeq.sortBy(tickKey).flatMap { e =>
        e.event_type match {
          case "quote" =>
            // max-key-wins guard: a cross-batch out-of-order (or
            // replayed) OLDER quote must not regress the prevailing
            // quote backward in time — later trades would silently
            // match a stale price. It can't retroactively re-match
            // earlier trades either way, so ignoring it is exact.
            val k = tickKey(e)
            if (cur.forall(q => implicitly[Ordering[(Long, Int, Long)]]
                .lt(quoteKey(q), k)))
              cur = Some(LastQuote(Math.floorDiv(e.ts.getTime, 1000L),
                e.ts.getNanos, e.event_id, e.value))
            None
          case "trade" =>
            Some(TradeQuote(sym, e.event_id,
              cur.map(_.event_id), cur.map(_.px)))
          case _ => None
        }
      }
      cur.foreach(last.update)
      out.iterator
    }
  }

  def asofQuotes(events: Dataset[Ev]): Dataset[TradeQuote] = {
    import events.sparkSession.implicits._
    events.filter(e => e.event_type == "quote" || e.event_type == "trade")
      .groupByKey(_.user_id)
      .transformWithState(new AsOfQuoteProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  case class TypeUpdate(user_id: Long, event_id: Long, event_type: String,
                        n_types_so_far: Long)

  /** Per-user distinct-event-type tracker on transformWithState using a
    * MapState column family (set-of-seen-types) next to a ValueState
    * counter — the state shape a 100 TB profile-building pipeline keeps
    * per entity. Emits, per event, how many distinct types the user has
    * produced so far. Batch twin: Streamy.streamTwsTypes. */
  class DistinctTypesProcessor
      extends StatefulProcessor[Long, Ev, TypeUpdate] {
    @transient private var seen: MapState[String, Boolean] = _
    @transient private var nTypes: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState[String, Boolean](
        "seen_types", Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
      nTypes = getHandle.getValueState[Long](
        "n_types", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[TypeUpdate] = {
      var n = if (nTypes.exists()) nTypes.get() else 0L
      val out = rows.toSeq.sortBy(evKey).map { e =>
        if (!seen.containsKey(e.event_type)) {
          seen.updateValue(e.event_type, true)
          n += 1
        }
        TypeUpdate(uid, e.event_id, e.event_type, n)
      }
      nTypes.update(n)
      out.iterator
    }
  }

  def distinctTypesTws(events: Dataset[Ev]): Dataset[TypeUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new DistinctTypesProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Watermarked STREAM-STREAM interval join (purchase attribution):
    * each purchase matched to the same user's clicks in the preceding
    * hour. Watermarks on both sides let the engine expire buffered
    * clicks once older than watermark + interval — join state is
    * O(click rate × 1 h) per user, never unbounded, which is what makes
    * the join deployable against an infinite stream. Batch twin:
    * Streamy.streamIntervalJoin. */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "70 minutes")
    purchases.join(clicks, expr(
        "user_id = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        floor((unix_micros(col("p_ts")) - unix_micros(col("c_ts"))) / 1000000.0)
          .cast("long").as("secs_before"))
  }

  // sum carries DECIMAL semantics (scale 6, the same quantization the
  // oracle-checked batch twin's Qx.dsum applies) so the streaming and
  // batch session sums are BIT-identical, not merely close: a
  // double-fold accumulation diverges from the twin's exact decimal
  // sum in the last ulps on long sessions.
  case class GapSession(startUs: Long, endUs: Long, n: Long,
      sum: scala.math.BigDecimal)
  case class SessionClose(user_id: Long, session_start: java.sql.Timestamp,
                          session_end: java.sql.Timestamp, n_events: Long,
                          value_sum: Double)

  /** A double quantized exactly as Spark's cast to DECIMAL(38,6)
    * quantizes it (shortest-repr BigDecimal, HALF_UP at scale 6) —
    * the per-value step of the batch twins' Qx.dsum. */
  private def dec6(v: Double): scala.math.BigDecimal =
    scala.math.BigDecimal(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)

  private def tsMicros(e: Ev): Long =
    Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
  private def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Inactivity-closed sessions on EVENT-TIME TIMERS: per key, one
    * ValueState holds the open session and one timer sits at
    * last-event-time + gap. New events extend the session and slide the
    * timer (delete + re-register — never more than one pending timer
    * per key); when the WATERMARK passes the timer, handleExpiredTimer
    * emits the closed session and clears state. O(1) state per key, no
    * end-of-stream flush needed — the shape of a production
    * sessionizer over an unbounded keyspace. A same-batch gap closes
    * the session inline (the timer only covers silence ACROSS batches).
    * Batch twin (oracle-checked): [[Streamy.streamTimerSession]]. */
  class TimerSessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Ev, SessionClose] {
    @transient private var sess: ValueState[GapSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[GapSession](
        "gapSession", Encoders.product[GapSession], TTLConfig.NONE)

    private def expiryMs(s: GapSession): Long = (s.endUs + gapUs) / 1000L
    private def close(uid: Long, s: GapSession): SessionClose =
      SessionClose(uid, microsToTs(s.startUs), microsToTs(s.endUs), s.n,
        s.sum.toDouble)

    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[SessionClose] = {
      val out = scala.collection.mutable.ListBuffer.empty[SessionClose]
      val prior = if (sess.exists()) Some(sess.get()) else None
      var cur = prior
      rows.toSeq.sortBy(evKey).foreach { e =>
        val t = tsMicros(e)
        cur match {
          case Some(s) if t - s.endUs >= gapUs =>
            out += close(uid, s)
            cur = Some(GapSession(t, t, 1L, dec6(e.value)))
          case Some(s) =>
            cur = Some(GapSession(s.startUs, math.max(s.endUs, t),
              s.n + 1L, s.sum + dec6(e.value)))
          case None =>
            cur = Some(GapSession(t, t, 1L, dec6(e.value)))
        }
      }
      cur.foreach { s =>
        sess.update(s)
        // slide the single pending timer only when the deadline moved
        if (prior.map(expiryMs).contains(expiryMs(s))) ()
        else {
          prior.foreach(p => getHandle.deleteTimer(expiryMs(p)))
          getHandle.registerTimer(expiryMs(s))
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionClose] =
      if (sess.exists()) {
        val s = sess.get()
        // a stale timer (session extended after registration) never
        // matches the live deadline — emit only on the real one
        if (expired.getExpiryTimeInMs >= expiryMs(s)) {
          sess.clear()
          Iterator.single(close(uid, s))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** 30-minute-gap timer sessions over a watermarked event stream —
    * run with `.withWatermark("ts", ...)` applied upstream. */
  def timerSessions(events: Dataset[Ev]): Dataset[SessionClose] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(1800L * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class LastChange(us: Long, event_id: Long, typ: String, value: Double)
  case class UpsertRow(user_id: Long, last_event_id: Long,
                       last_ts: java.sql.Timestamp, last_type: String,
                       last_value: Double, is_tombstone: Boolean)

  /** Streaming CDC compaction — the continuously-maintained form of
    * [[graft.operators.CdcOps.cdcUpsertLatest]]'s batch changelog
    * compaction (Kafka log-compaction / upsert-sink semantics): per
    * key, ValueState holds the single winning change row under the
    * (ts, event_id) total order; each micro-batch emits one changelog
    * row per key whose winner CHANGED, with `error` rows carried as
    * tombstone markers for the downstream sink to delete on. State is
    * O(1) per key over an unbounded keyspace — the raw log is never
    * retained. Within a batch rows sort by full-precision event time;
    * across batches a LATER-timestamped arrival always wins regardless
    * of arrival batch (upserts are order-insensitive by key — unlike
    * the tick join, no feed-ordering assumption is needed).
    * Batch twin (oracle-checked): `stream_cdc_upsert` in [[Streamy]];
    * StreamingSpec asserts final-state parity on the same rows. */
  class UpsertProcessor extends StatefulProcessor[Long, Ev, UpsertRow] {
    @transient private var cur: ValueState[LastChange] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[LastChange](
        "lastChange", Encoders.product[LastChange], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[UpsertRow] = {
      val incoming = rows.map(e =>
        LastChange(tsMicros(e), e.event_id, e.event_type, e.value))
        .maxByOption(c => (c.us, c.event_id))
      val prior = if (cur.exists()) Some(cur.get()) else None
      // a redelivery of the current winner (same (ts, event_id)) must
      // be byte-identical to be the idempotent no-op; carrying a
      // DIFFERENT value/type is a contradictory upstream correction and
      // silently keeping the stale winner would lose it with no signal
      // — the same fail-loud contract Scd2Processor enforces
      for (p <- prior; i <- incoming)
        if (i.us == p.us && i.event_id == p.event_id && i != p)
          throw new IllegalStateException(
            s"upsertLatest conflict for key $uid: arrival (ts_us=${i.us}, " +
              s"event_id=${i.event_id}) redelivers the current winner with " +
              s"conflicting payload (${i.typ}, ${i.value}) != (${p.typ}, ${p.value})")
      val winner = (prior.toSeq ++ incoming.toSeq)
        .maxByOption(c => (c.us, c.event_id))
      winner match {
        case Some(w) if !prior.contains(w) =>
          cur.update(w)
          Iterator.single(UpsertRow(uid, w.event_id, microsToTs(w.us),
            w.typ, w.value, w.typ == "error"))
        case _ => Iterator.empty
      }
    }
  }

  def upsertLatest(events: Dataset[Ev]): Dataset[UpsertRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new UpsertProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  case class OpenVersion(us: Long, event_id: Long, value: Double)
  case class ClosedVersion(user_id: Long, event_id: Long, value: Double,
                           valid_from: java.sql.Timestamp,
                           valid_to: java.sql.Timestamp)

  /** Streaming SCD-2 history build — the continuously-maintained form
    * of [[graft.operators.CdcOps.scd2Intervals]]: per key, ValueState
    * holds only the OPEN version; each newer change CLOSES it (emitting
    * the finished `[valid_from, valid_to)` interval downstream) and
    * opens the next. Exactly the closed rows of the batch build are
    * emitted — the open version is state, not output, so no
    * end-of-stream flush is needed and history lands downstream as it
    * is sealed. State is O(1) per key; the full history lives in the
    * sink, never in the store.
    *
    * Ordering contract (same as [[AsOfQuoteProcessor]]): within a
    * micro-batch rows sort by the full-precision (ts, event_id) key;
    * ACROSS batches the per-key feed is assumed time-ordered — an
    * out-of-order arrival cannot rewrite an interval already emitted.
    * The contract is ENFORCED, not assumed silently: an arrival
    * STRICTLY before the stored open version's (ts, event_id) would
    * close it at an earlier timestamp and emit an inverted
    * `valid_from > valid_to` interval — corrupting already-published
    * history with no signal — so the processor throws instead (fail
    * loudly; the violating batch aborts before anything lands in the
    * sink). An EXACT redelivery of the open version (same ts and
    * event_id — at-least-once upstream) is instead an idempotent
    * no-op: throwing there would crash-loop the retried batch forever
    * on input that changes nothing.
    * Parity: StreamingSpec replays real events in chronological
    * batches and asserts the emitted intervals equal the batch twin's
    * closed versions. */
  class Scd2Processor(
      dropLateViolations: Boolean = false,
      dropped: Option[org.apache.spark.util.LongAccumulator] = None)
      extends StatefulProcessor[Long, Ev, ClosedVersion]
      with org.apache.spark.internal.Logging {
    @transient private var open: ValueState[OpenVersion] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenVersion](
        "openVersion", Encoders.product[OpenVersion], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[ClosedVersion] = {
      var cur = if (open.exists()) Some(open.get()) else None
      val out = scala.collection.mutable.ListBuffer.empty[ClosedVersion]
      rows.toSeq.sortBy(evKey).foreach { e =>
        val t = tsMicros(e)
        // Exact redelivery of the OPEN version — same ts, event_id AND
        // value (an at-least-once upstream re-sending its last
        // delivery) — is an idempotent no-op: throwing here would
        // crash-loop the stream on retried input that changes nothing.
        // The value is part of the identity check: a same-(ts,event_id)
        // arrival carrying a DIFFERENT value is a contradictory
        // upstream correction, not a redelivery, and silently
        // discarding it would lose the correction with no signal.
        val isRedelivery =
          cur.exists(o => t == o.us && e.event_id == o.event_id && e.value == o.value)
        val violation = cur.flatMap { o =>
          if (t < o.us || (t == o.us && e.event_id < o.event_id))
            Some(s"arrival (ts_us=$t, event_id=${e.event_id}) is before the " +
              s"open version (ts_us=${o.us}, event_id=${o.event_id}); " +
              "emitting would invert an already-published interval")
          else if (!isRedelivery && t == o.us && e.event_id == o.event_id)
            Some(s"arrival (ts_us=$t, event_id=${e.event_id}) redelivers the " +
              s"open version with a CONFLICTING value ${e.value} != ${o.value}")
          else None
        }
        (isRedelivery, violation) match {
          case (true, _) => () // idempotent no-op
          case (_, Some(why)) =>
            // Fail-stop by default; with dropLateViolations the row is
            // side-dropped WITH a signal (log + accumulator) — the
            // availability-over-consistency mode for at-least-once
            // upstreams that can replay more than their last record.
            if (dropLateViolations) {
              dropped.foreach(_.add(1))
              logWarning(s"scd2Stream dropping contract-violating arrival " +
                s"for key $uid: $why")
            } else throw new IllegalStateException(
              s"scd2Stream ordering contract violated for key $uid: $why")
          case _ =>
            cur.foreach { o =>
              out += ClosedVersion(uid, o.event_id, o.value,
                microsToTs(o.us), microsToTs(t))
            }
            cur = Some(OpenVersion(t, e.event_id, e.value))
        }
      }
      cur.foreach(open.update)
      out.iterator
    }
  }

  def scd2Stream(events: Dataset[Ev],
      dropLateViolations: Boolean = false,
      dropped: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[ClosedVersion] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Scd2Processor(dropLateViolations, dropped),
        TimeMode.None(), OutputMode.Append())
  }

  /** Continuous HL7 v2 ingest — the streaming form of the reference's
    * ingest loop (/root/reference/README.md:76): a file-source stream
    * tails a landing directory of message files (one message per LINE,
    * segments separated by `\r` — the actual HL7 v2 segment terminator,
    * which is why `lineSep=\n` is pinned: the default Hadoop line
    * reader would split on the `\r`s too and shred messages), and every
    * micro-batch runs the IDENTICAL segment-routing parser as the batch
    * scan (`Scans.hl7Rows` — shared Column expressions, so batch/stream
    * parity holds by construction, and StreamingSpec asserts it row for
    * row). Stateless append: each file is parsed once, no watermark or
    * state store; at scale the source's maxFilesPerTrigger paces the
    * ingest and the parse is embarrassingly parallel per file split. */
  def hl7FileStream(s: SparkSession, landingDir: String): DataFrame = {
    import s.implicits._
    graft.sources.Scans.hl7Rows(
      s.readStream.format("text").option("lineSep", "\n")
        .load(landingDir).select($"value".as("msg")))
  }

  /** Continuous FHIR-bundle ingest — the NDJSON sibling of
    * [[hl7FileStream]]: one serialized Bundle per line (to_json emits
    * compact single-line JSON, so the framing is free), parsed by the
    * same row-local `Scans.fhirBundleRows` as the batch scan — no
    * state, no shuffle, each micro-batch is a pure parse. */
  def fhirFileStream(s: SparkSession, landingDir: String): DataFrame = {
    import s.implicits._
    graft.sources.Scans.fhirBundleRows(
      s.readStream.format("text").load(landingDir).select($"value".as("bundle")))
  }

  /** Arbitrary per-user state: running purchase count + exact cents
    * total, one update row emitted per purchase. State survives across
    * micro-batches; within a batch rows are ordered by (ts, event_id)
    * for determinism (Streamy.streamStateful is the batch twin). */
  def statefulPurchases(events: Dataset[Ev]): Dataset[PurchaseUpdate] = {
    import events.sparkSession.implicits._
    events.filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[PurchaseState]) =>
          var st = state.getOption.getOrElse(PurchaseState(0L, 0L))
          val out = it.toSeq.sortBy(evKey).map { e =>
            st = PurchaseState(st.n + 1, st.cents + math.round(e.value * 100.0))
            PurchaseUpdate(uid, e.event_id, st.n, st.cents)
          }
          state.update(st)
          out.iterator
      }
  }
}
