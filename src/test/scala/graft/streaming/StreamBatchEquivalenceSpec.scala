package graft.streaming

import java.sql.Timestamp

import graft.{Registry, TestSpark}
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream/batch equivalence on the REAL pinned sf0.001 events: the streaming
  * windows must reproduce, row for row, the batch queries that the DuckDB
  * oracle hash-checks (`q_time_tumbling`, `q_sessionize`). This transitively
  * pins the streaming surface to the cross-engine oracle — the closest the
  * batch-gated harness can get to a declared streaming query (SURVEY §1.4).
  *
  * Mechanics: all 10k events arrive as ONE micro-batch (the watermark only
  * advances between batches, so nothing is late-dropped), then a far-future
  * sentinel batch pushes the watermark past every real window; append mode
  * then emits them all. The sentinel's own windows never close, so it never
  * appears in output.
  *
  * Time-domain note: batch buckets on exact NANOS (`ts DIV 3600e9`) while
  * streaming uses µs timestamps — equivalent BY CONSTRUCTION for flooring
  * (µs truncation moves an event < 1 µs toward the bucket floor, never
  * across it). The 30-min gap rule has ONE divergent point: an exactly-gap
  * pair merges in batch (`> gapUs` strictly) but splits in `session_window`
  * (intervals `[t, t+gap)` must overlap strictly), so the sessions test
  * FIRST asserts the pinned data contains no exact-boundary gap — the
  * equivalence claim never rides on unchecked data luck.
  */
class StreamBatchEquivalenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val sf = "/root/testdata/sf0.001"

  /** sf0.001 events as typed rows with µs-truncated timestamps (the shared
    * time basis — see the scaladoc note). */
  private def eventRows: Seq[Event] = {
    graft.Tables.events(spark, sf)
      .select(col("event_id"), expr("timestamp_micros(ts DIV 1000)").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
  }

  private def sentinel: Event =
    Event(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0)

  test("streaming tumbling == oracle-checked q_time_tumbling on sf0.001") {
    val in = MemoryStream[Event]
    val q = EventStreams.tumbling(in.toDF(), every = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("equiv_tumb").outputMode("append").start()
    try {
      in.addData(eventRows)
      q.processAllAvailable()
      in.addData(sentinel)
      q.processAllAvailable()
      val streamed = spark.table("equiv_tumb")
        .select(
          (unix_timestamp(col("window_start"))).as("epoch_s"),
          col("event_type"), col("cnt"), col("sum_value"))
        .collect().map(_.toSeq).toSet
      val batch = Registry.byName("q_time_tumbling")(spark, sf)(
        _.collect().map(_.toSeq).toSet)
      assert(streamed === batch,
        s"streaming tumbling diverged: ${streamed.size} vs ${batch.size} rows")
    } finally q.stop()
  }

  test("streaming sliding == oracle-checked q_time_sliding on sf0.001") {
    // round 6: the declared hop shape — every event in exactly two 2h/1h
    // windows; the MemoryStream append path must agree with the batch
    // explode row for row (the declared q_stream_sliding additionally
    // proves the complete-mode file-replay path against the same oracle)
    val in = MemoryStream[Event]
    val q = EventStreams.sliding(in.toDF(), length = "2 hours",
        slide = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("equiv_slide")
      .outputMode("append").start()
    try {
      in.addData(eventRows)
      q.processAllAvailable()
      in.addData(sentinel)
      q.processAllAvailable()
      val streamed = spark.table("equiv_slide")
        .select(
          (unix_timestamp(col("window_start"))).as("win_start_s"),
          col("event_type"), col("cnt"), col("sum_value"))
        .collect().map(_.toSeq).toSet
      val batch = Registry.byName("q_time_sliding")(spark, sf)(
        _.collect().map(_.toSeq).toSet)
      assert(streamed === batch,
        s"streaming sliding diverged: ${streamed.size} vs ${batch.size} rows")
    } finally q.stop()
  }

  test("streaming session windows == oracle-checked q_sessionize on sf0.001") {
    // guard the one spot where batch (> gap merges) and session_window
    // (>= gap splits) semantics diverge: no consecutive per-user pair in
    // the pinned data may sit at EXACTLY the 30-min boundary
    val gapUsL = 30L * 60 * 1000 * 1000
    val boundaryPairs = eventRows.groupBy(_.user_id).valuesIterator
      .map { evs =>
        val times = evs.map(e => e.ts.getTime * 1000 + e.ts.getNanos / 1000 % 1000)
          .sorted
        times.zip(times.drop(1)).count { case (a, b) => b - a == gapUsL }
      }.sum
    assert(boundaryPairs === 0,
      "pinned data grew an exact-30-min gap; the stream/batch session " +
        "equivalence no longer holds by construction")
    val in = MemoryStream[Event]
    val q = EventStreams.sessions(in.toDF(), gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("equiv_sess").outputMode("append").start()
    try {
      in.addData(eventRows)
      q.processAllAvailable()
      in.addData(sentinel)
      q.processAllAvailable()
      // session_window ends at last_event + gap; the batch end_us is the
      // last event itself — subtract the gap for the comparison
      val gapUs = 30L * 60 * 1000 * 1000
      val streamed = spark.table("equiv_sess")
        .select(col("user_id"),
          unix_micros(col("session_start")).as("start_us"),
          (unix_micros(col("session_end")) - gapUs).as("end_us"),
          col("n_events"))
        .collect().map(_.toSeq).toSet
      val batch = Registry.byName("q_sessionize")(spark, sf)(
        _.select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
          .collect().map(_.toSeq).toSet)
      assert(streamed === batch,
        s"streaming sessions diverged: ${streamed.size} vs ${batch.size} rows")
    } finally q.stop()
  }
}
