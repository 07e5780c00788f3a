package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the stream (mirrors the `events` table columns). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Executor-held per-user session state (keyed state, never on the driver). */
case class SessionState(sessionSeq: Long, startMs: Long, lastMs: Long,
                        nEvents: Long, sumValue: Double)

/** A closed session emitted downstream. Field names match the batch
  * [[graft.ext.Events.sessionize]] output so the two paths are
  * interchangeable sinks. */
case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                      start_ms: Long, end_ms: Long, sum_value: Double)

/** A completed funnel conversion (stream twin of the batch
  * [[graft.ext.Events.funnel]] row before cohort aggregation). */
case class ConversionOut(user_id: Long, from_ms: Long, to_ms: Long)

/** Per-event-type anomaly state: open (not-yet-finalized) hourly partial
  * counts + the trailing finalized buckets the baseline reads. */
case class AnomalyState(open: Map[Long, Long], history: Vector[(Long, Long)])

/** A finalized, scored hourly bucket (streaming twin of the batch
  * [[graft.ext.Events.anomalyHourly]] row). */
case class AnomalyOut(hour_ms: Long, event_type: String, n: Long,
                      baseline: Double, spike_score: Double)

/** Per-user retention state: earliest active day seen (epoch-day), the
  * distinct active days not yet emitted, and the offsets already emitted. */
case class RetentionState(cohortDay: Long, pending: Set[Long], emitted: Set[Int])

/** One finalized retention hit: user was active `day_offset` days after
  * their (final) first-ever active day. Counting per (cohort_day,
  * day_offset) downstream reproduces the batch retention matrix. */
case class RetentionHit(user_id: Long, cohort_day: java.sql.Date, day_offset: Int)

/** Per-user funnel state: earliest `fromType` time seen so far
  * (`Long.MaxValue` = none yet), conversion latch, and the pending
  * `toType` event times that may still become the first in-horizon
  * conversion under out-of-order delivery (kept sorted, capped). */
case class FunnelState(fromMs: Long, converted: Boolean, pendingTo: Seq[Long])

/** A buffered right-side (match-candidate) event for the streaming as-of
  * join: its position in the (ms, event_id) total order plus the type. */
case class RightEvt(ms: Long, id: Long, typ: String)

/** A left-side event awaiting watermark finalization. */
case class PendingLeft(ms: Long, id: Long, value: Double)

/** Per-user as-of state: the single best (latest in (ms, id) order)
  * right event already BELOW the watermark (older rights can never beat
  * it and late arrivals below the watermark are dropped, so one tuple
  * suffices), the in-watermark right buffer (any of these may be the
  * match of a future left event), the left events not yet finalized, and
  * the max event time seen (retention clock). */
case class AsofState(best: Option[RightEvt], rights: Seq[RightEvt],
                     pending: Seq[PendingLeft], lastMs: Long)

/** One finalized as-of match (stream twin of the batch
  * [[graft.ext.Events.asofJoin]] row). */
case class AsofOut(event_id: Long, user_id: Long, ms: Long, value: Double,
                   match_event_id: Option[Long], match_type: Option[String],
                   match_ms: Option[Long], lag_ms: Option[Long])

/** One buffered event of the status-history fold (type only — the SCD2
  * run-length encoding needs nothing else). */
case class StatusEvt(ms: Long, id: Long, typ: String)

/** Per-user SCD2 state: the OPEN run (runSeq == 0 ⇔ none yet) plus the
  * in-watermark event buffer awaiting total-order finalization. */
case class StatusState(runSeq: Long, status: String, validFromMs: Long,
                       nEvents: Long, lastMs: Long, buffer: Seq[StatusEvt])

/** One CLOSED validity interval (stream twin of a batch
  * [[graft.ext.Events.statusHistory]] row with non-NULL valid_to_ms; the
  * open row lives in state until a status change closes it). */
case class StatusOut(user_id: Long, run_id: Long, status: String,
                     valid_from_ms: Long, valid_to_ms: Long, n_events: Long)

/** Per-type forecast state: per-hour event counts not yet past their
  * forecast horizon, plus the highest hour already emitted/excluded. */
case class ForecastState(buckets: Map[Long, Long], emittedUpTo: Long,
                         lastMs: Long)

/** One finalized per-hour forecast evaluation (the batch
  * [[graft.ext.Events.forecastEval]] row is the per-type SUM of these —
  * the tumblingHourly relationship: stream emits the windows, batch the
  * corpus fold). */
case class ForecastHourOut(event_type: String, hour_ms: Long, n: Long,
                           fcst: Long, abs_err: Long, err: Long)

/** Structured Streaming versions of the event analytics (SURVEY.md §2.8
  * E4). The reference is strictly batch (one Airflow `execute()` per run —
  * SURVEY.md §2.7); streaming is part of the north-star extension surface.
  *
  * Design: `readStream` → identical column expressions as the batch
  * operators → watermark bounds the state. The windowed aggregation reuses
  * the very same `window()/agg` expressions as
  * [[graft.ext.Events.tumblingHourly]]; sessionization keeps one small
  * state object per active user key via flatMapGroupsWithState with an
  * event-time timeout — state size is O(active users), partitioned across
  * executors by the grouping key, which is the 100 TB-safe shape.
  */
object EventStreams {

  /** Watermarked tumbling 1-hour counts per event type — the streaming twin
    * of Events.tumblingHourly (same groupBy expressions; Append mode emits
    * a window once the watermark passes its end). */
  def tumblingHourly(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization with custom keyed state: a session closes
    * when >gap of event-time silence passes (enforced by the event-time
    * timeout, so sessions close even if the user never returns). Emits one
    * [[SessionOut]] row per closed session.
    *
    * In-batch ordering: events inside one micro-batch are sorted by
    * (ts, event_id) before folding, so the result matches the batch
    * window-function formulation on the same data. */
  def sessionize(events: Dataset[Event], gapMillis: Long = 1800000L,
                 numberingRetentionMs: Long = 30L * 24 * 3600 * 1000): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    // When a session closes by event-time timeout, the state is not removed
    // outright: a NUMBERING TOMBSTONE (nEvents == 0) carrying the next
    // sessionSeq stays behind so the user's per-session ordinals keep
    // counting across idle periods — exactly the batch numbering (the
    // random-split equivalence spec holds because of this). The tombstone
    // itself expires after `numberingRetentionMs` of inactivity, so state
    // stays O(users active within the retention horizon), not O(all users
    // ever seen); after retention a returning user restarts at 1
    // (documented bounded-state trade-off).
    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[SessionState]): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var st = state.getOption.orNull

      if (state.hasTimedOut) {
        if (st != null) {
          if (st.nEvents == 0L) state.remove() // numbering tombstone expired
          else {
            out += SessionOut(userId, st.sessionSeq, st.nEvents, st.startMs, st.lastMs, st.sumValue)
            state.update(SessionState(st.sessionSeq + 1, st.lastMs, st.lastMs, 0L, 0.0))
            state.setTimeoutTimestamp(
              math.max(st.lastMs + numberingRetentionMs, state.getCurrentWatermarkMs() + 1))
          }
        }
        return out.iterator
      }

      val sorted = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      // batch-local accumulator for late events that are TOO EARLY to
      // belong to the open session (> gap before its start): consecutive
      // early events within the gap of each other fold into ONE closed
      // session, matching the batch formulation; merging them into the
      // open session would create an internal silence longer than the gap.
      // Emitted late sessions take the current seq and the open session
      // shifts up — emission stays ordered even though per-user numbering
      // is approximate under extreme lateness.
      var late: SessionState = null
      def flushLate(): Unit = if (late != null) {
        out += SessionOut(userId, st.sessionSeq, late.nEvents, late.startMs, late.lastMs, late.sumValue)
        st = st.copy(sessionSeq = st.sessionSeq + 1)
        late = null
      }
      for (e <- sorted) {
        val ms = e.ts.getTime
        if (st == null) {
          st = SessionState(1L, ms, ms, 1L, e.value)
        } else if (st.nEvents == 0L) {
          // numbering tombstone: any event reaching it is post-watermark,
          // hence > old lastMs + gap — always a fresh session, continuing
          // the carried ordinal
          st = SessionState(st.sessionSeq, ms, ms, 1L, e.value)
        } else if (ms < st.startMs - gapMillis) {
          if (late != null && ms - late.lastMs > gapMillis) flushLate()
          late =
            if (late == null) SessionState(0L, ms, ms, 1L, e.value)
            else late.copy(lastMs = ms, nEvents = late.nEvents + 1,
              sumValue = late.sumValue + e.value)
        } else {
          // this event is within gap-reach of the open session; if it is
          // ALSO within the gap of the pending early session, it bridges
          // the two — absorb the early session instead of emitting it
          if (late != null && ms - late.lastMs <= gapMillis) {
            st = st.copy(startMs = late.startMs, nEvents = st.nEvents + late.nEvents,
              sumValue = st.sumValue + late.sumValue)
            late = null
          } else flushLate()
          if (ms - st.lastMs > gapMillis) {
            out += SessionOut(userId, st.sessionSeq, st.nEvents, st.startMs, st.lastMs, st.sumValue)
            st = SessionState(st.sessionSeq + 1, ms, ms, 1L, e.value)
          } else {
            // late-but-within-watermark events (ms ≤ lastMs, possible
            // across micro-batches) extend the session bounds
            // monotonically: the gap above is always decided against the
            // session's true max event time, end can never regress below
            // start, and backward extension is bounded by the gap
            st = st.copy(startMs = math.min(st.startMs, ms),
              lastMs = math.max(st.lastMs, ms),
              nEvents = st.nEvents + 1, sumValue = st.sumValue + e.value)
          }
        }
      }
      flushLate()
      state.update(st)
      state.setTimeoutTimestamp(st.lastMs + gapMillis + 1)
      out.iterator
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Streaming AS-OF enrichment — the stream twin of the batch
    * [[graft.ext.Events.asofJoin]]: every `leftType` event is matched to
    * the latest `rightTypes` event by the same user strictly before it in
    * the (ms, event_id) total order.
    *
    * Finalization discipline: a left event is emitted only once the
    * watermark has passed its event time — at that point any still-to-
    * arrive right event must carry ms ≥ watermark > left.ms, so it sorts
    * AFTER the left event and cannot change the match; the emitted row
    * therefore equals the batch result under ANY assignment of
    * in-watermark events to micro-batches, including a match-candidate
    * arriving batches after the left event it enriches. The price is one
    * watermark delay of emission latency (same contract as
    * [[funnelConversions]]).
    *
    * State per user is three parts, each bounded: (1) ONE `best` right
    * event already below the watermark — rights older than it can never
    * beat it for any future left (future lefts sit at or above the
    * watermark, hence above every compacted right), and late rights below
    * the watermark are dropped by the engine, so a single tuple replaces
    * the entire right-side history; (2) the in-watermark right buffer
    * (any entry may be the match of a future left), compacted into `best`
    * as the watermark passes it — CRUCIALLY only ever below the
    * watermark, which by the finalize-first invariant is ≤ every still-
    * pending left, so compaction can never swallow a right that a pending
    * left still needs; (3) the pending lefts themselves. `maxRights` caps
    * buffer (1024): overflow folds the (ms, id)-smallest rights into
    * `best` early — exact for every left above the fold point, documented
    * precision trade-off for a user carrying >maxRights rights inside one
    * watermark horizon. An empty state keeps `best` as a memory tombstone
    * for `retentionMs` past the last event (a left arriving after a long
    * idle gap still matches across it, as batch does), then expires —
    * state stays O(users active within retention). */
  def asofEnrich(events: Dataset[Event],
                 leftType: String = "purchase",
                 rightTypes: Seq[String] = Seq("click", "view"),
                 watermark: String = "2 hours",
                 maxRights: Int = 1024,
                 retentionMs: Long = 30L * 24 * 3600 * 1000): Dataset[AsofOut] = {
    require(rightTypes.nonEmpty && !rightTypes.contains(leftType))
    val spark = events.sparkSession
    import spark.implicits._
    val rightSet = rightTypes.toSet

    def ordLt(aMs: Long, aId: Long, bMs: Long, bId: Long): Boolean =
      aMs < bMs || (aMs == bMs && aId < bId)

    def finalizeAndCompact(userId: Long, st0: AsofState, wm: Long,
        out: scala.collection.mutable.ArrayBuffer[AsofOut]): AsofState = {
      // finalize BEFORE compacting: all lefts below the watermark emit
      // against the full buffer, so the compaction bound (watermark) is
      // ≤ every left that remains pending
      val (done, keep) = st0.pending.partition(_.ms < wm)
      for (p <- done.sortBy(x => (x.ms, x.id))) {
        var m = st0.best.filter(r => ordLt(r.ms, r.id, p.ms, p.id))
        for (r <- st0.rights if ordLt(r.ms, r.id, p.ms, p.id))
          if (m.forall(b => ordLt(b.ms, b.id, r.ms, r.id))) m = Some(r)
        out += AsofOut(p.id, userId, p.ms, p.value,
          m.map(_.id), m.map(_.typ), m.map(_.ms), m.map(r => p.ms - r.ms))
      }
      val (old, fresh) = st0.rights.partition(_.ms < wm)
      var best = st0.best
      for (r <- old) if (best.forall(b => ordLt(b.ms, b.id, r.ms, r.id))) best = Some(r)
      AsofState(best, fresh, keep, st0.lastMs)
    }

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[AsofState]): Iterator[AsofOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
      val wm = state.getCurrentWatermarkMs()
      var st = state.getOption.getOrElse(AsofState(None, Nil, Nil, 0L))
      if (!state.hasTimedOut) {
        var rights = st.rights
        var pending = st.pending
        var last = st.lastMs
        for (e <- it) {
          val ms = e.ts.getTime
          if (rightSet(e.event_type)) rights = rights :+ RightEvt(ms, e.event_id, e.event_type)
          else pending = pending :+ PendingLeft(ms, e.event_id, e.value)
          last = math.max(last, ms)
        }
        st = AsofState(st.best, rights, pending, last)
      }
      st = finalizeAndCompact(userId, st, wm, out)
      if (st.rights.size > maxRights) {
        val sorted = st.rights.sortBy(r => (r.ms, r.id))
        val (dropped, kept) = sorted.splitAt(sorted.size - maxRights)
        var best = st.best
        for (r <- dropped) if (best.forall(b => ordLt(b.ms, b.id, r.ms, r.id))) best = Some(r)
        st = st.copy(best = best, rights = kept)
      }
      if (st.pending.isEmpty && st.rights.isEmpty &&
          (st.best.isEmpty || wm >= st.lastMs + retentionMs)) {
        state.remove()
      } else {
        state.update(st)
        val target =
          if (st.pending.nonEmpty) st.pending.map(_.ms).min + 1
          else if (st.rights.nonEmpty) st.rights.map(_.ms).max + 1
          else st.lastMs + retentionMs
        // re-arming at or below the watermark throws on bursty loads
        state.setTimeoutTimestamp(math.max(target, wm + 1))
      }
      out.iterator
    }

    events.filter(e => e.event_type == leftType || rightSet(e.event_type))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Streaming INCIDENT TAGGING — the stream twin of the batch
    * [[graft.ext.Events.rangeJoin]]'s interval join: every arriving event
    * is tagged with the static incident window(s) containing it, via the
    * same bucketization (both sides mapped to coarse time buckets, an
    * EQUI-join on the bucket, the exact `lo <= ms < hi` predicate after).
    * The static side is re-broadcast per micro-batch — a stream-static
    * join carries NO state at all (the [[graft.streaming.DocStreams]]
    * decontamination shape), so this is exactly-once-per-arrival and
    * needs no watermark: an event matches purely on its own timestamp
    * against the static intervals, so output equals the batch join under
    * ANY micro-batch split, trivially. An interval spanning multiple
    * buckets explodes to each (the sequence covers arbitrary interval
    * lengths); a point event has ONE bucket, so no pair can duplicate.
    *
    * The batch operator's blast-radius AGGREGATE stays batch (or lands
    * downstream on this stream): the tagging join is the per-event verb a
    * live pipeline acts on — route, alert, annotate. */
  def tagIncidents(events: Dataset[Event], anchors: DataFrame,
                   bucketMs: Long = 600000L): DataFrame = {
    require(bucketMs >= 1)
    val ib = anchors.select(col("anchor_id"), col("lo"), col("hi"))
      .withColumn("bucket", explode(expr(
        s"sequence(CAST(floor(lo / $bucketMs) AS BIGINT), CAST(floor((hi - 1) / $bucketMs) AS BIGINT))")))
    events.toDF()
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("bucket", expr(s"CAST(floor(ms / $bucketMs) AS BIGINT)"))
      .join(ib, Seq("bucket"))
      .filter(col("ms") >= col("lo") && col("ms") < col("hi"))
      .select(col("event_id"), col("user_id"), col("ms"), col("event_type"),
        col("anchor_id"), col("lo").as("window_start_ms"), col("hi").as("window_end_ms"))
  }

  /** Streaming funnel — the exact stream twin of the batch
    * [[graft.ext.Events.funnel]] pre-aggregation: per user, `from_ms` is
    * the MINIMUM `fromType` event time and `to_ms` the minimum `toType`
    * time inside `[from_ms, from_ms + horizonMs]`.
    *
    * The fold is order-INDEPENDENT (pure min/merge over the batch's
    * events), and a conversion is emitted only once the watermark has
    * passed BOTH its endpoints — at that point no event that could change
    * either minimum can still be delivered (the event-time-timeout path
    * drops pre-watermark input rows), so the emitted row equals the batch
    * result under ANY assignment of in-watermark events to micro-batches,
    * including a `toType` arriving batches before its `fromType`. The
    * price is emission latency of one watermark delay.
    *
    * State per user: two longs + the pending `toType` times still inside
    * the watermark (sorted, capped at 128 — beyond the cap the smallest
    * times are kept, which are the only ones that can win the min). The
    * timeout re-arm is always strictly above the current watermark —
    * re-arming at a stale `fromMs + horizon` below the watermark is an
    * `IllegalArgumentException` crash on bursty loads. Expiry: once the
    * watermark passes `fromMs + horizon` (or all pending times, when no
    * `fromType` was seen) the heavy state collapses to a MEMORY TOMBSTONE
    * pinning the first-ever `fromMs` and the converted latch — without it,
    * a post-horizon re-signup would re-enter the funnel and emit a second
    * conversion, where the batch operator keys everything off the user's
    * FIRST signup (caught by the random-events differential spec). The
    * tombstone expires `memoryRetentionMs` after `fromMs`, keeping state
    * O(users active within retention) rather than O(users ever seen);
    * beyond retention a returning user re-enters as new (documented
    * bounded-state trade-off, same policy as sessionize numbering). */
  def funnelConversions(events: Dataset[Event], fromType: String = "signup",
                        toType: String = "purchase",
                        horizonMs: Long = 604800000L,
                        watermark: String = "2 hours",
                        memoryRetentionMs: Long = 30L * 24 * 3600 * 1000): Dataset[ConversionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    val noFrom = Long.MaxValue

    // emit-if-final + prune, shared by the data and timeout paths
    def resolve(userId: Long, st0: FunnelState, wm: Long,
                out: scala.collection.mutable.ArrayBuffer[ConversionOut]): FunnelState = {
      var st = st0
      if (!st.converted && st.fromMs != noFrom) {
        val eligible = st.pendingTo.filter(t => t >= st.fromMs && t <= st.fromMs + horizonMs)
        if (eligible.nonEmpty) {
          val cand = eligible.min
          // both minima are final once the watermark passes them: any
          // still-deliverable event has ts > wm, so neither can decrease
          if (wm >= st.fromMs && wm >= cand) {
            out += ConversionOut(userId, st.fromMs, cand)
            st = st.copy(converted = true)
          }
        }
      }
      val pruned =
        if (st.converted) Nil
        else {
          // fromMs only ever decreases, so the window's upper bound only
          // shrinks: t > fromMs + horizon is ineligible forever. t ≤ wm
          // can't match a FUTURE fromMs (> wm) either — keep it only if it
          // is the current candidate minimum.
          val hi = if (st.fromMs == noFrom) Long.MaxValue else st.fromMs + horizonMs
          val cand = st.pendingTo.filter(t => t >= st.fromMs && t <= hi).minOption
          (st.pendingTo.filter(t => t > wm && t <= hi) ++ cand)
            .distinct.sorted.take(128)
        }
      st.copy(pendingTo = pruned)
    }

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[FunnelState]): Iterator[ConversionOut] = {
      val wm = state.getCurrentWatermarkMs()
      val out = scala.collection.mutable.ArrayBuffer.empty[ConversionOut]
      var st = state.getOption.getOrElse(FunnelState(noFrom, converted = false, Nil))
      if (!state.hasTimedOut) {
        for (e <- it) {
          val ms = e.ts.getTime
          if (!st.converted) {
            if (e.event_type == fromType) st = st.copy(fromMs = math.min(st.fromMs, ms))
            else if (e.event_type == toType) st = st.copy(pendingTo = st.pendingTo :+ ms)
          }
        }
      }
      st = resolve(userId, st, wm, out)
      val horizonPassed =
        if (st.fromMs != noFrom) wm > st.fromMs + horizonMs
        else st.pendingTo.isEmpty
      if (horizonPassed) {
        if (st.fromMs == noFrom || wm > st.fromMs + memoryRetentionMs) state.remove()
        else {
          // memory tombstone: first fromMs + converted latch, no pending
          state.update(st.copy(pendingTo = Nil))
          state.setTimeoutTimestamp(
            math.max(st.fromMs + memoryRetentionMs + 1, wm + 1))
        }
      }
      else {
        state.update(st)
        val arm =
          if (st.converted) st.fromMs + horizonMs + 1 // suppression window end
          else if (st.fromMs != noFrom) {
            val cand = st.pendingTo
              .filter(t => t >= st.fromMs && t <= st.fromMs + horizonMs).minOption
            // wake when the candidate finalizes, else when the horizon ends
            cand.map(c => math.max(st.fromMs, c) + 1).getOrElse(st.fromMs + horizonMs + 1)
          } else st.pendingTo.max + 1 // prune point: all pending ≤ wm then
        state.setTimeoutTimestamp(math.max(arm, wm + 1))
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Streaming spike detection — the stream twin of
    * [[graft.ext.Events.anomalyHourly]]: hourly buckets per event type,
    * each scored against the mean of the trailing `trailing` FINALIZED
    * buckets the moment the watermark passes its hour end. Emitted rows are
    * value-identical to the batch operator on the same events (spec:
    * batch-equivalence over finalized hours): the same observed-buckets
    * baseline, the same rounding (BigDecimal HALF_UP — SQL `round`).
    *
    * State: one object per event TYPE (bounded by the type vocabulary, not
    * by time): open hourly partials inside the watermark plus the trailing
    * bucket deque. Per-type grouping is inherent — the baseline is a
    * global per-type statistic — and the per-event work is one map update;
    * a pre-aggregation to (type, hour) micro-counts per batch trigger
    * would only change constants, not the key. */
  def anomalyHourly(events: Dataset[Event], trailing: Int = 24,
                    watermark: String = "2 hours"): Dataset[AnomalyOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourMs = 3600000L

    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    def fold(typ: String, it: Iterator[Event],
             state: GroupState[AnomalyState]): Iterator[AnomalyOut] = {
      val wm = state.getCurrentWatermarkMs()
      var st = state.getOption.getOrElse(AnomalyState(Map.empty, Vector.empty))
      if (!state.hasTimedOut) {
        val add = scala.collection.mutable.Map.empty[Long, Long]
        for (e <- it) {
          val h = math.floorDiv(e.ts.getTime, hourMs) * hourMs
          add(h) = add.getOrElse(h, 0L) + 1L
        }
        if (add.nonEmpty)
          st = st.copy(open = add.foldLeft(st.open) { case (m, (h, c)) =>
            m.updated(h, m.getOrElse(h, 0L) + c)
          })
      }
      // finalize every open hour the watermark has fully passed, ascending
      val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyOut]
      val (closed, open) = st.open.partition { case (h, _) => h + hourMs <= wm }
      for ((h, n) <- closed.toSeq.sortBy(_._1)) {
        if (st.history.nonEmpty) {
          val tail = st.history.takeRight(trailing)
          val baseline = tail.map(_._2).sum.toDouble / tail.length.toDouble
          out += AnomalyOut(h, typ, n, round6(baseline),
            round6((n.toDouble - baseline) / (baseline + 1.0)))
        }
        st = st.copy(history = (st.history :+ (h, n)).takeRight(trailing))
      }
      st = st.copy(open = open)
      state.update(st)
      // wake when the earliest open hour can finalize; else idle until data
      val arm = open.keys.minOption.map(_ + hourMs + 1).getOrElse(wm + hourMs)
      state.setTimeoutTimestamp(math.max(arm, wm + 1))
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Streaming retention hits — the stream twin of
    * [[graft.ext.Events.retention]]'s pre-aggregation: one
    * [[RetentionHit]] per (user, day_offset ≤ maxDays), where the cohort
    * day is the user's MINIMUM active day. A hit emits only once the
    * watermark has passed both the cohort day's end (no earlier first day
    * can still arrive — emitting sooner could attribute the user to the
    * wrong cohort) and the activity day's end, so emitted rows equal the
    * batch minima under any micro-batch split of in-watermark events.
    *
    * State per user is BOUNDED despite "first day ever" semantics: once
    * the watermark passes cohortDay + maxDays the user can never produce
    * another in-horizon hit (later activity exceeds maxDays; earlier
    * activity would be below the watermark), so the heavy state collapses
    * to a MEMORY TOMBSTONE pinning the cohort day — without it, a user
    * returning after the horizon would found a spurious NEW cohort (the
    * batch operator's cohort is the first day EVER; caught by the
    * random-events differential spec). The tombstone expires
    * `memoryRetentionMs` after the cohort day — state is O(users active
    * within retention), and beyond it a returning user re-enters as new
    * (same bounded-memory policy as sessionize/funnel). */
  def retentionHits(events: Dataset[Event], maxDays: Int = 7,
                    watermark: String = "2 hours",
                    memoryRetentionMs: Long = 30L * 24 * 3600 * 1000): Dataset[RetentionHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val dayMs = 86400000L

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[RetentionState]): Iterator[RetentionHit] = {
      val wm = state.getCurrentWatermarkMs()
      var st = state.getOption.getOrElse(RetentionState(Long.MaxValue, Set.empty, Set.empty))
      if (!state.hasTimedOut) {
        for (e <- it) {
          val d = math.floorDiv(e.ts.getTime, dayMs)
          st = st.copy(cohortDay = math.min(st.cohortDay, d), pending = st.pending + d)
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[RetentionHit]
      // cohort is final once wm passes its day end; then emit every pending
      // day whose own end has also passed
      if (st.cohortDay != Long.MaxValue && (st.cohortDay + 1) * dayMs <= wm) {
        val (ready, wait) = st.pending.partition(d => (d + 1) * dayMs <= wm)
        val offs = ready.map(d => (d - st.cohortDay).toInt)
          .filter(o => o <= maxDays && !st.emitted.contains(o))
        for (o <- offs.toSeq.sorted)
          out += RetentionHit(userId,
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(st.cohortDay)), o)
        st = st.copy(pending = wait, emitted = st.emitted ++ offs)
      }
      val horizonEndMs =
        if (st.cohortDay == Long.MaxValue) Long.MaxValue
        else (st.cohortDay + maxDays + 1) * dayMs
      if (horizonEndMs <= wm) {
        // no further in-horizon hit possible — keep only the cohort memory
        if (st.cohortDay == Long.MaxValue ||
            st.cohortDay * dayMs + memoryRetentionMs <= wm) state.remove()
        else {
          state.update(RetentionState(st.cohortDay, Set.empty, Set.empty))
          state.setTimeoutTimestamp(
            math.max(st.cohortDay * dayMs + memoryRetentionMs + 1, wm + 1))
        }
      }
      else {
        state.update(st)
        // wake when the next pending day (or the cohort day) finalizes;
        // else at horizon end to reclaim the state
        val next = (st.pending.map(d => (d + 1) * dayMs + 1) +
          math.min(horizonEndMs + 1, Long.MaxValue)).min
        state.setTimeoutTimestamp(math.max(next, wm + 1))
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Streaming STATUS HISTORY — the stream twin of the batch
    * [[graft.ext.Events.statusHistory]]'s SCD2 run-length encoding: per
    * user, consecutive same-status runs over the (ms, event_id) total
    * order collapse to validity intervals. A run is emitted when a
    * DIFFERENT status closes it; the open run lives in state (the batch
    * twin reports it with NULL valid_to — a stream cannot finalize it, so
    * stream output equals exactly the batch rows with non-NULL
    * valid_to_ms).
    *
    * Finalization discipline (the [[asofEnrich]] contract): events fold
    * into the run encoding only once the watermark passes them — at that
    * point no future arrival can sort before them in the total order, so
    * run boundaries equal the batch window formulation under ANY
    * assignment of in-watermark events to micro-batches. In-watermark
    * events wait in a per-user buffer; `maxBuffer` caps it (4096), with
    * overflow folding the (ms, id)-smallest events early — exact unless a
    * still-later arrival would have sorted before the fold point (the
    * as-of cap's conservative-overflow trade-off, same doc contract).
    *
    * State is O(open run + in-watermark buffer) per active user; an idle
    * user's open run expires `retentionMs` after their last event
    * (unemitted, as batch leaves it open). */
  def statusHistory(events: Dataset[Event], watermark: String = "2 hours",
                    maxBuffer: Int = 4096,
                    retentionMs: Long = 30L * 24 * 3600 * 1000): Dataset[StatusOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    // fold `ready` (already (ms, id)-sorted) into the run encoding
    def foldReady(userId: Long, st0: StatusState, ready: Seq[StatusEvt],
        out: scala.collection.mutable.ArrayBuffer[StatusOut]): StatusState = {
      var st = st0
      for (e <- ready) {
        if (st.runSeq == 0L)
          st = st.copy(runSeq = 1L, status = e.typ, validFromMs = e.ms, nEvents = 1L)
        else if (st.status == e.typ)
          st = st.copy(nEvents = st.nEvents + 1L)
        else {
          out += StatusOut(userId, st.runSeq, st.status, st.validFromMs, e.ms, st.nEvents)
          st = st.copy(runSeq = st.runSeq + 1L, status = e.typ,
            validFromMs = e.ms, nEvents = 1L)
        }
      }
      st
    }

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[StatusState]): Iterator[StatusOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[StatusOut]
      val wm = state.getCurrentWatermarkMs()
      var st = state.getOption.getOrElse(StatusState(0L, null, 0L, 0L, 0L, Nil))
      if (!state.hasTimedOut) {
        val incoming = it.map(e => StatusEvt(e.ts.getTime, e.event_id, e.event_type)).toSeq
        st = st.copy(buffer = st.buffer ++ incoming,
          lastMs = math.max(st.lastMs, if (incoming.isEmpty) 0L else incoming.map(_.ms).max))
      }
      val sorted = st.buffer.sortBy(e => (e.ms, e.id))
      val cut = {
        val belowWm = sorted.count(_.ms < wm)
        // buffer cap: overflow folds the oldest events early (conservative)
        math.max(belowWm, sorted.length - maxBuffer)
      }
      val (ready, pending) = sorted.splitAt(cut)
      st = foldReady(userId, st.copy(buffer = pending), ready, out)
      if (st.runSeq == 0L && st.buffer.isEmpty) state.remove()
      else if (st.buffer.isEmpty && wm >= st.lastMs + retentionMs) state.remove()
      else {
        state.update(st)
        val target =
          if (st.buffer.nonEmpty) st.buffer.map(_.ms).min + 1
          else st.lastMs + retentionMs
        state.setTimeoutTimestamp(math.max(target, wm + 1))
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Streaming SEASONAL-NAIVE FORECAST EVAL — the stream twin of the
    * batch [[graft.ext.Events.forecastEval]]: per (type, hour), the
    * hour's count evaluated against the same hour one `periodMs` earlier,
    * emitted once the watermark finalizes the hour. The batch row is the
    * per-type SUM of these per-hour rows (n_hours_eval = count, totals =
    * sums — the tumblingHourly batch/stream relationship); hours whose
    * prior-day bucket is absent are excluded on both sides.
    *
    * Why per-hour counts need NO ordering buffer: bucket increments
    * commute, so events fold straight into their (type, hour) counter on
    * arrival — finalization only gates EMISSION (an hour H is emitted
    * when wm ≥ H + 1h; its forecast bucket H − period is then final a
    * fortiori, and absent ⇔ zero events, the exclusion rule). A bucket is
    * purged once the hour it would forecast has been emitted or excluded
    * (X ≤ emittedUpTo − period), so state per type is O(hours inside the
    * period + watermark horizon) — bounded regardless of stream length.
    *
    * Key cardinality is |event types| — the same bounded-key contract as
    * [[anomalyHourly]]. */
  def forecastEvalHourly(events: Dataset[Event], periodMs: Long = 86400000L,
                         watermark: String = "2 hours"): Dataset[ForecastHourOut] = {
    require(periodMs % 3600000L == 0 && periodMs > 0,
      "periodMs must be a positive whole number of hours")
    val spark = events.sparkSession
    import spark.implicits._
    val hourMs = 3600000L

    def fold(typ: String, it: Iterator[Event],
             state: GroupState[ForecastState]): Iterator[ForecastHourOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[ForecastHourOut]
      val wm = state.getCurrentWatermarkMs()
      var st = state.getOption.getOrElse(ForecastState(Map.empty, -1L, 0L))
      if (!state.hasTimedOut) {
        var b = st.buckets
        var last = st.lastMs
        for (e <- it) {
          val ms = e.ts.getTime
          val h = ms - math.floorMod(ms, hourMs)
          b = b.updated(h, b.getOrElse(h, 0L) + 1L)
          last = math.max(last, ms)
        }
        st = st.copy(buckets = b, lastMs = last)
      }
      // emit every finalized, not-yet-emitted hour that has a prior bucket
      val bound = if (wm >= hourMs) (wm - hourMs) - math.floorMod(wm - hourMs, hourMs) else -1L
      if (bound > st.emittedUpTo) {
        for (h <- st.buckets.keys.toSeq.sorted if h > st.emittedUpTo && h <= bound)
          st.buckets.get(h - periodMs).foreach { fcst =>
            val n = st.buckets(h)
            out += ForecastHourOut(typ, h, n, fcst, math.abs(n - fcst), n - fcst)
          }
        st = st.copy(emittedUpTo = bound,
          buckets = st.buckets.filter { case (h, _) => h > bound - periodMs })
      }
      if (st.buckets.isEmpty) state.remove()
      else {
        state.update(st)
        // next wake-up: the earliest moment anything changes — an
        // unemitted hour finalizing, or a kept bucket's forecast target
        // finalizing (which may only purge, but purging is how state
        // drains after the stream goes quiet)
        val unEmitted = st.buckets.keys.filter(_ > st.emittedUpTo)
        val t1 = if (unEmitted.nonEmpty) unEmitted.min + hourMs + 1 else Long.MaxValue
        val t2 = st.buckets.keys.min + periodMs + hourMs + 1
        state.setTimeoutTimestamp(math.max(math.min(t1, t2), wm + 1))
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Streaming exact dedup — the stream twin of [[graft.ext.Dedup.exact]]'s
    * first-wins semantics for at-least-once sources (replayed deliveries of
    * the same event_id). `dropDuplicatesWithinWatermark` keeps the
    * first-seen row per key and, unlike plain `dropDuplicates`, expires its
    * key state once the watermark passes — state is bounded by the
    * watermark horizon × event rate, not by stream lifetime, which is the
    * only shape that survives an unbounded 100 TB/day stream. */
  def dedupEvents(events: Dataset[Event], watermark: String = "2 hours"): Dataset[Event] =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** CONTINUOUS sketch ingest — streaming maintenance of the
    * [[graft.ext.SketchStore]] daily-HLL relation: each micro-batch's
    * events sketch into per-day rows appended to the store, so
    * distinct-over-range reports stay O(days) while the raw firehose is
    * discarded. `foreachBatch` is the right harness (the
    * [[graft.streaming.DocStreams.runStoreIngest]] rule): the append IS
    * the proven batch verb, state lives in the STORE (zero state-store
    * rows), restart-safe by construction. Crash/replay semantics are the
    * family's strongest: a re-delivered batch re-appends the same value
    * set and the HLL register MAX-fold makes the union IDENTICAL — the
    * sketch store is exactly-once-equivalent under at-least-once
    * delivery, no dedup needed (spec'd: streamed store ≡ batch build,
    * exact estimate equality). A day split across micro-batches lands as
    * multiple rows the probe unions and [[graft.ext.SketchStore.compactSketchStore]]
    * folds away. The store must be PUBLISHED before the stream starts
    * (append refuses a torn/absent root) — day 0 bootstraps with a
    * [[graft.ext.SketchStore.buildSketchStore]] over the history, or over
    * an empty frame to start cold. */
  def runSketchIngest(spark: org.apache.spark.sql.SparkSession, srcDir: String,
                      storeDir: String, ckptDir: String,
                      maxFilesPerTrigger: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Event].schema)
    val events = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(srcDir)
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ext.SketchStore.appendToSketchStore(batch, storeDir)
        ()
      }
      .option("checkpointLocation", ckptDir)
      .start()
  }

  /** Continuous HISTOGRAM-store maintenance — [[runSketchIngest]]'s shape
    * for the quantile store: each micro-batch's per-day bin counts are
    * published into the store through
    * [[graft.ext.HistStore.appendStreamBatch]]. Where the sketch loop
    * leans on the HLL MAX-fold for at-least-once replay safety, the
    * additive histogram gets it STRUCTURALLY: the batchId-keyed atomic
    * rename means a replayed batch finds its slot occupied and no-ops —
    * exactly-once counts over an at-least-once harness. Durable state is
    * the STORE (zero state-store rows); trailing p50/p90/p99 reports run
    * against it at any moment, O(days × bins) rows read. */
  def runHistIngest(spark: org.apache.spark.sql.SparkSession, srcDir: String,
                    storeDir: String, ckptDir: String,
                    maxFilesPerTrigger: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Event].schema)
    val events = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(srcDir)
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ext.HistStore.appendStreamBatch(batch, storeDir, batchId)
        ()
      }
      .option("checkpointLocation", ckptDir)
      .start()
  }

  /** File-based entry point: tail a directory of parquet events (the stream
    * analogue of Tables.load) and write closed sessions to a parquet sink
    * with checkpointing — the full readStream → transform → writeStream
    * contract. Returns the started query (caller awaits/stops). */
  def runFileSessionizer(spark: org.apache.spark.sql.SparkSession, srcDir: String,
                         outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    val stream = spark.readStream.schema(schema).parquet(srcDir).as[Event]
    sessionize(stream).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
