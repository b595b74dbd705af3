package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming surface over event streams (the streaming analog of
  * `graft.operators.EventsOps`; the reference is strictly batch —
  * SURVEY.md §1.1 — so this is engine extension, exercised in unit tests
  * because the driver harness is batch-only).
  *
  * All transforms take an un-sunk streaming DataFrame/Dataset (e.g. from
  * `spark.readStream` or a MemoryStream) and return a lazy result the caller
  * wires to `writeStream`. Scale posture: every aggregation is keyed on
  * (window, low-cardinality key) or user_id — state is bounded by watermark
  * eviction, the thing that makes month-long streams viable; without it
  * state grows with event-time spread and the job eventually OOMs.
  */
object EventStreams {

  /** An event record for the typed APIs. */
  case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  /** Per-user running aggregate emitted by [[userTotals]]. */
  case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  private val dec2 = DecimalType(18, 2)

  /** Tumbling event-time windows with late-data drop: the streaming form of
    * `q_time_tumbling` (R2 decimal math kept identical). Append-mode sinks
    * emit each window once, when the watermark passes its end. */
  def tumbling(events: DataFrame, every: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), every), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(dec2)).cast(DoubleType).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding (hopping) windows (length/slide), same state contract as
    * [[tumbling]]: state per trigger is (open windows × event_type), each
    * event lands in length/slide windows (Spark's `window()` desugars the
    * hop scan-side — no self-join), and the watermark closes windows. Same
    * exact-decimal sum as [[tumbling]] so replays are order-free. */
  def sliding(events: DataFrame, length: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), length, slide), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(dec2)).cast(DoubleType).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Event-time session windows per user: a session closes after `gap` of
    * silence, and its state is evictable once the watermark passes. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(dec2)).cast(DoubleType).as("session_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup (north-star dedup, streaming form): first
    * occurrence of each event_id wins; duplicate arrivals inside the
    * watermark horizon are dropped, and the dedup state itself is evicted
    * past the watermark — the property that lets this run forever.
    * NOTE: must be `dropDuplicatesWithinWatermark` — plain
    * `dropDuplicates("event_id")` only evicts state when the event-time
    * column is part of the key set, so its state grows unboundedly. */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** [[dedup]] generalized to an arbitrary key set — the declared
    * `q_stream_dedup` keys on the coarsened (user, type, minute) activity
    * key. Same state story: one record per in-horizon key, evicted once
    * the watermark passes. */
  def dedupOnKeys(events: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** A closed user session emitted by [[userSessionsTimeout]]. */
  case class ClosedSession(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Long,
      session_value: Double)

  /** internal state record for [[userSessionsTimeout]] (public for encoder codegen) */
  case class OpenSession(start: Long, end: Long, n: Long, total: Double)

  /** Sessionization with custom state + EVENT-TIME TIMEOUT
    * (flatMapGroupsWithState): a session emits exactly once, when closed —
    * either by a same-user event arriving past the gap, or by the watermark
    * passing sessionEnd+gap with no further events (the timeout path, which
    * `sessions()`'s built-in session_window cannot customize). State is one
    * constant-size record per active user, evicted on close — the shape of
    * any long-running enrichment/CEP operator. */
  def userSessionsTimeout(
      events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        case (uid, batch, state: GroupState[OpenSession]) =>
          def close(s: OpenSession) =
            ClosedSession(uid, s.start, s.end, s.n, s.total)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(s))
          } else {
            // Gaps-and-islands fold over the state session + this batch's
            // events AS SORTED INTERVAL PIECES: out-of-order (but
            // in-watermark) arrivals merge correctly in both directions —
            // an event just before the open session's start lowers the
            // start, and older islands sessionize among themselves instead
            // of each becoming a spurious singleton.
            val pieces = (state.getOption.toSeq ++
              batch.map(e => OpenSession(e.ts.getTime, e.ts.getTime, 1, e.value)))
              .sortBy(s => (s.start, s.end))
            val merged = pieces.foldLeft(List.empty[OpenSession]) {
              case (h :: t, p) if p.start <= h.end + gapMs =>
                OpenSession(h.start, math.max(h.end, p.end),
                  h.n + p.n, h.total + p.total) :: t
              case (acc, p) => p :: acc
            }.reverse
            val closed = Seq.newBuilder[ClosedSession]
            // every island except the newest is closed by construction
            merged.dropRight(1).foreach(s => closed += close(s))
            val wm = state.getCurrentWatermarkMs()
            merged.lastOption match {
              case Some(s) if s.end + gapMs <= wm =>
                // already beyond the horizon — close now, no timeout needed
                closed += close(s)
                state.remove()
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.end + gapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-static enrichment join (round 2): each micro-batch hash-joins
    * against a broadcast dimension table — the streaming twin of the batch
    * dim join, and the standard way to attach user/catalog attributes to an
    * event stream. Stateless (no watermark needed on the static side); the
    * dimension re-broadcasts per batch, picking up slowly-changing updates.
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join (round 2): purchases attributed to the same
    * user's most recent window of clicks — click within [purchase − lookback,
    * purchase]. BOTH sides carry watermarks and the join condition bounds
    * event-time distance, so each side's join state is evictable; without
    * the time bound Spark must buffer both streams forever. Append-mode
    * output emits a match once both watermarks pass it. */
  def purchaseAttribution(
      events: DataFrame,
      lookback: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(
      purchases,
      expr(s"""user_id = p_user_id AND
              |click_ts BETWEEN purchase_ts - INTERVAL $lookback AND purchase_ts"""
        .stripMargin))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** Custom keyed state via mapGroupsWithState: per-user lifetime totals
    * (update-mode). The state object is a constant-size pair per user —
    * the general pattern for stateful enrichment Spark has no built-in for. */
  def userTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), UserTotal](GroupStateTimeout.NoTimeout) {
        case (uid, batch, state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var v = BigDecimal(v0)
          batch.foreach { e => n += 1; v += BigDecimal(e.value) }
          state.update((n, v.toDouble))
          UserTotal(uid, n, v.toDouble)
      }
  }
}
