package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import graft.streaming.EventStreams.{Event, UserTotal}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming behavior: window emission on watermark passage,
  * late-data drop, streaming dedup, and custom keyed state — driven through
  * MemoryStream batches exactly as micro-batches arrive in production.
  */
class EventStreamsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, uid: Long = 1L, typ: String = "click",
      v: Double = 1.0): Event = Event(id, ts(t), uid, typ, v)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("tumbling: append emits a window only after the watermark passes it; late data dropped") {
    val in = MemoryStream[Event]
    val q = EventStreams.tumbling(in.toDF(), every = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("tumb").outputMode("append").start()
    withQuery(q) {
      in.addData(
        ev(1, "2024-01-01 00:05:00", v = 2.0),
        ev(2, "2024-01-01 00:20:00", v = 3.0))
      q.processAllAvailable()
      // watermark still inside hour 0 -> nothing emitted yet
      assert(spark.table("tumb").count() === 0)

      // an event far past hour 0 advances the watermark beyond 01:00
      in.addData(ev(3, "2024-01-01 02:00:00", v = 5.0))
      q.processAllAvailable()
      val closed = spark.table("tumb").collect().map(_.toSeq)
      assert(closed === Array(Seq(
        ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), "click", 2L, 5.0)))

      // this event's window is already closed -> silently dropped
      in.addData(ev(4, "2024-01-01 00:30:00", v = 100.0))
      in.addData(ev(5, "2024-01-01 04:00:00"))
      q.processAllAvailable()
      val after = spark.table("tumb").collect().map(_.toSeq)
      assert(!after.exists(r => r(3) == 3L), "late event must not reopen hour 0")
    }
  }

  test("sessions: gap splits user activity into separate session windows") {
    val in = MemoryStream[Event]
    val q = EventStreams.sessions(in.toDF(), gap = "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    withQuery(q) {
      in.addData(
        ev(1, "2024-01-01 00:00:00", uid = 7, v = 1.0),
        ev(2, "2024-01-01 00:10:00", uid = 7, v = 2.0), // same session
        ev(3, "2024-01-01 03:00:00", uid = 7, v = 4.0)) // new session after gap
      q.processAllAvailable()
      in.addData(ev(4, "2024-01-01 09:00:00", uid = 8)) // advance watermark
      q.processAllAvailable()
      val sessions = spark.table("sess").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
        .sortBy(_._2)
      assert(sessions.toSeq === Seq((7L, 1L, 4.0), (7L, 2L, 3.0)))
    }
  }

  test("dedup drops duplicate event_ids across micro-batches") {
    val in = MemoryStream[Event]
    val q = EventStreams.dedup(in.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    withQuery(q) {
      in.addData(ev(1, "2024-01-01 00:00:00"), ev(2, "2024-01-01 00:01:00"))
      q.processAllAvailable()
      in.addData(ev(1, "2024-01-01 00:00:30"), ev(3, "2024-01-01 00:02:00")) // 1 is a dup
      q.processAllAvailable()
      assert(spark.table("dd").select("event_id").as[Long].collect().sorted
        === Array(1L, 2L, 3L))
    }
  }

  test("userSessionsTimeout: gap closes inline; silence closes via event-time timeout") {
    val in = MemoryStream[Event]
    val q = EventStreams.userSessionsTimeout(in.toDS(), gapMs = 30 * 60 * 1000,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("ust").outputMode("append").start()
    withQuery(q) {
      // user 7: two events in one session
      in.addData(
        ev(1, "2024-01-01 00:00:00", uid = 7, v = 1.0),
        ev(2, "2024-01-01 00:10:00", uid = 7, v = 2.0))
      q.processAllAvailable()
      assert(spark.table("ust").count() === 0) // still open

      // same user past the gap -> closes the first session inline
      in.addData(ev(3, "2024-01-01 03:00:00", uid = 7, v = 4.0))
      q.processAllAvailable()
      val first = spark.table("ust").as[EventStreams.ClosedSession].collect()
      assert(first.toSeq === Seq(EventStreams.ClosedSession(
        7L, ts("2024-01-01 00:00:00").getTime, ts("2024-01-01 00:10:00").getTime,
        2L, 3.0)))

      // a DIFFERENT user's much-later event advances the watermark; the
      // open 03:00 session for user 7 must close via the timeout path
      // (timeouts fire on the trigger after the watermark advances)
      in.addData(ev(4, "2024-01-01 09:00:00", uid = 8, v = 0.5))
      q.processAllAvailable()
      in.addData(ev(5, "2024-01-01 09:00:01", uid = 8, v = 0.5))
      q.processAllAvailable()
      val sessions = spark.table("ust").as[EventStreams.ClosedSession].collect()
        .filter(_.user_id == 7L)
      assert(sessions.length === 2)
      assert(sessions.exists(s =>
        s.start_ms == ts("2024-01-01 03:00:00").getTime && s.n_events == 1L))
    }
  }

  test("userSessionsTimeout: out-of-order in-watermark arrival lowers the session start") {
    val in = MemoryStream[Event]
    val q = EventStreams.userSessionsTimeout(in.toDS(), gapMs = 30 * 60 * 1000,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("ooo").outputMode("append").start()
    withQuery(q) {
      in.addData(ev(1, "2024-01-01 10:05:00", uid = 9, v = 1.0))
      q.processAllAvailable()
      // arrives AFTER but timestamped BEFORE the open session's start
      in.addData(ev(2, "2024-01-01 10:00:00", uid = 9, v = 2.0))
      q.processAllAvailable()
      // same-user event far past the gap closes the merged session
      in.addData(ev(3, "2024-01-01 20:00:00", uid = 9, v = 0.0))
      q.processAllAvailable()
      val s = spark.table("ooo").as[EventStreams.ClosedSession].collect()
        .filter(_.user_id == 9L)
      assert(s.toSeq === Seq(EventStreams.ClosedSession(
        9L, ts("2024-01-01 10:00:00").getTime, ts("2024-01-01 10:05:00").getTime,
        2L, 3.0)))
    }
  }

  test("enriched: stream-static broadcast join attaches dimension attributes") {
    val in = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "free")).toDF("user_id", "tier")
    val q = EventStreams.enriched(in.toDF(), dim)
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    withQuery(q) {
      in.addData(ev(1, "2024-01-01 00:00:00", uid = 1),
        ev(2, "2024-01-01 00:01:00", uid = 3)) // uid 3 absent from dim
      q.processAllAvailable()
      val rows = spark.table("enr").collect()
        .map(r => r.getLong(0) -> Option(r.getString(5))).toMap
      assert(rows === Map(1L -> Some("gold"), 3L -> None))
    }
  }

  test("purchaseAttribution: stream-stream interval join within lookback only") {
    val in = MemoryStream[Event]
    val q = EventStreams.purchaseAttribution(in.toDF(),
        lookback = "10 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    withQuery(q) {
      in.addData(
        ev(1, "2024-01-01 00:00:00", uid = 1, typ = "click"),
        ev(2, "2024-01-01 00:30:00", uid = 1, typ = "click"),
        ev(3, "2024-01-01 00:35:00", uid = 1, typ = "purchase", v = 9.99),
        ev(4, "2024-01-01 00:34:00", uid = 2, typ = "click"), // other user
        ev(5, "2024-01-01 09:00:00", uid = 1, typ = "click")) // advances wm
      q.processAllAvailable()
      in.addData(ev(6, "2024-01-01 19:00:00", uid = 9, typ = "click"))
      q.processAllAvailable()
      val matches = spark.table("attr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // purchase 3 attributes ONLY to click 2 (click 1 is 35 min back,
      // click 4 is another user's)
      assert(matches === Set((1L, 3L, 2L)))
    }
  }

  test("userTotals: mapGroupsWithState accumulates per-user state across batches") {
    val in = MemoryStream[Event]
    val q = EventStreams.userTotals(in.toDS())
      .writeStream.format("memory").queryName("ut").outputMode("update").start()
    withQuery(q) {
      in.addData(ev(1, "2024-01-01 00:00:00", uid = 1, v = 1.5),
        ev(2, "2024-01-01 00:01:00", uid = 2, v = 2.0))
      q.processAllAvailable()
      in.addData(ev(3, "2024-01-01 00:02:00", uid = 1, v = 2.5))
      q.processAllAvailable()
      // last update per user wins
      val latest = spark.table("ut").as[UserTotal].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
      assert(latest(1L) === UserTotal(1L, 2L, 4.0))
      assert(latest(2L) === UserTotal(2L, 1L, 2.0))
    }
  }
}
