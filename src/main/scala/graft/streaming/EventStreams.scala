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
  def sessionize(events: Dataset[Event], gapMillis: Long = 1800000L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[SessionState]): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var st = state.getOption.orNull

      if (state.hasTimedOut) {
        if (st != null) {
          out += SessionOut(userId, st.sessionSeq, st.nEvents, st.startMs, st.lastMs, st.sumValue)
          state.remove()
        }
        return out.iterator
      }

      val sorted = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      for (e <- sorted) {
        val ms = e.ts.getTime
        if (st == null) {
          st = SessionState(1L, ms, ms, 1L, e.value)
        } else if (ms - st.lastMs > gapMillis) {
          out += SessionOut(userId, st.sessionSeq, st.nEvents, st.startMs, st.lastMs, st.sumValue)
          st = SessionState(st.sessionSeq + 1, ms, ms, 1L, e.value)
        } else if (ms < st.startMs - gapMillis) {
          // late event TOO EARLY to belong to the open session (> gap
          // before its start): emit it as its own closed single-event
          // session rather than merging — merging would create a session
          // with an internal silence longer than the gap, diverging from
          // the batch formulation. It takes the current seq and the open
          // session shifts up: emission order stays correct even though
          // per-user seq numbering is approximate under extreme lateness.
          out += SessionOut(userId, st.sessionSeq, 1L, ms, ms, e.value)
          st = st.copy(sessionSeq = st.sessionSeq + 1)
        } else {
          // late-but-within-watermark events (ms ≤ lastMs, possible across
          // micro-batches) extend the session bounds monotonically: the gap
          // above is always decided against the session's true max event
          // time, end can never regress below start, and the backward
          // extension is bounded by the gap (earlier events split off above)
          st = st.copy(startMs = math.min(st.startMs, ms),
            lastMs = math.max(st.lastMs, ms),
            nEvents = st.nEvents + 1, sumValue = st.sumValue + e.value)
        }
      }
      state.update(st)
      state.setTimeoutTimestamp(st.lastMs + gapMillis + 1)
      out.iterator
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
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
