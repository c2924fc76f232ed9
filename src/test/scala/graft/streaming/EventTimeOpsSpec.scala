package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventTimeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked windowed counts aggregate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val counts = EventTimeOps.windowedCounts(
      input.toDF().toDF("ts", "user_id"), "ts", "user_id", "1 minute", "30 seconds")
    val q = counts.writeStream.format("memory")
      .queryName("win_counts").outputMode(OutputMode.Complete()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData((t("2024-01-01 10:00:10"), 1L), (t("2024-01-01 10:00:50"), 1L))
      q.processAllAvailable()
      input.addData((t("2024-01-01 10:00:59"), 1L), (t("2024-01-01 10:01:10"), 1L))
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .select($"win_start".cast("string"), $"user_id", $"n")
        .as[(String, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq == Seq(
        ("2024-01-01 10:00:00", 1L, 3L),
        ("2024-01-01 10:01:00", 1L, 1L)))
    } finally q.stop()
  }

  test("dedupeStream emits each doc id once across micro-batches (at-least-once upstream)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = EventTimeOps.dedupeStream(
      input.toDF().toDF("ts", "doc_id", "text"), Seq("doc_id"), "ts", "10 seconds")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_stream").outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData(
        (t("2024-01-01 10:00:00"), 1L, "a"),
        (t("2024-01-01 10:00:01"), 1L, "a-dup-same-batch"),
        (t("2024-01-01 10:00:02"), 2L, "b"))
      q.processAllAvailable()
      // re-delivery in a LATER batch, still within the watermark
      input.addData(
        (t("2024-01-01 10:00:03"), 1L, "a-dup-next-batch"),
        (t("2024-01-01 10:00:04"), 3L, "c"))
      q.processAllAvailable()
      val got = spark.table("dedup_stream").select($"doc_id", $"text")
        .as[(Long, String)].collect().sortBy(_._1)
      assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")),
        s"each key exactly once, first delivery wins: ${got.toSeq}")
    } finally q.stop()

    // keys including the event-time column defeat the purpose: rejected.
    intercept[IllegalArgumentException] {
      EventTimeOps.dedupeStream(
        Seq((Timestamp.valueOf("2024-01-01 00:00:00"), 1L)).toDF("ts", "doc_id"),
        Seq("doc_id", "ts"), "ts", "10 seconds")
    }
  }

  test("cross-batch out-of-order event cannot regress the open session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventTimeOps.sessionize(input.toDS(), gapMillis = 10000L)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_ooo").outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1L, 100000L))
      q.processAllAvailable()
      // batch 2 arrives out of order: 98000 is EARLIER than the stored end
      // (100000) but within gap; 109000 is within gap of the TRUE max end.
      // Overwrite-semantics would set end=98000 and wrongly close at
      // 109000; min/max keeps the session open and the bounds sane.
      input.addData(Event(1L, 98000L), Event(1L, 109000L))
      q.processAllAvailable()
      // close it with a far-future event and check the emitted bounds
      input.addData(Event(1L, 500000L))
      q.processAllAvailable()
      val got = spark.table("sessions_ooo").as[Session].collect()
      assert(got.toSeq == Seq(Session(1L, 98000L, 109000L, 3L, closed = true)),
        s"session bounds must span min..max of merged events: ${got.toSeq}")
    } finally q.stop()
  }

  test("event-time timeout flushes open sessions once the watermark passes end+gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventTimeOps.sessionizeWithTimeout(
      input.toDS(), gapMillis = 60000L, watermarkDelay = "10 seconds")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_wm").outputMode(OutputMode.Append()).start()
    try {
      // user 7's session stops producing; user 9 keeps the stream moving
      // (timestamps start above 0: an event AT the initial watermark would
      // be filtered as late before it ever reaches the state operator)
      input.addData(Event(7L, 100000L), Event(7L, 130000L))
      q.processAllAvailable()
      // watermark after this batch: 700000 - 10000 >> 130000 + 60000
      input.addData(Event(9L, 700000L))
      q.processAllAvailable()
      // timeout fires on the next trigger after the watermark advanced
      input.addData(Event(9L, 710000L))
      q.processAllAvailable()
      val got = spark.table("sessions_wm").as[Session].collect()
      assert(got.toSeq.contains(Session(7L, 100000L, 130000L, 2L, closed = true)),
        s"user 7's open session must flush via event-time timeout: ${got.toSeq}")
      // user 9 is still within gap of the watermark — must NOT have flushed
      assert(!got.exists(_.userId == 9L), s"user 9 must stay open: ${got.toSeq}")
      // a late event for user 7 (beyond watermark) is dropped, not resurrected
      input.addData(Event(7L, 131000L))
      q.processAllAvailable()
      val after = spark.table("sessions_wm").as[Session].collect()
      assert(after.count(_.userId == 7L) == 1, s"late event must not reopen: ${after.toSeq}")
    } finally q.stop()
  }

  test("sessionization closes a session when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventTimeOps.sessionize(input.toDS(), gapMillis = 60000L)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions").outputMode(OutputMode.Append()).start()
    try {
      // session 1: 3 events within gap; then a 5-min jump starts session 2
      input.addData(
        Event(7L, 0L),
        Event(7L, 30000L),
        Event(7L, 59000L))
      q.processAllAvailable()
      input.addData(Event(7L, 359000L), Event(9L, 0L))
      q.processAllAvailable()
      val got = spark.table("sessions").as[Session].collect()
      assert(got.toSeq == Seq(Session(7L, 0L, 59000L, 3L, closed = true)),
        s"only user 7's first session should have closed: ${got.toSeq}")
    } finally q.stop()
  }

  test("stream-stream interval join pairs keyed events within the time bound, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val views = MemoryStream[(Timestamp, Long, String)]
    val joined = EventTimeOps.streamIntervalJoin(
      clicks.toDF().toDF("c_ts", "user_id", "click_id"),
      views.toDF().toDF("v_ts", "user_id", "view_id"),
      Seq("user_id"), "c_ts", "v_ts",
      beforeMs = 10000L, afterMs = 0L, // views up to 10 s BEFORE the click
      leftWatermark = "5 seconds", rightWatermark = "5 seconds")
    assert(joined.columns.count(_ == "user_id") == 1, "right key copy dropped")
    val q = joined.writeStream.format("memory")
      .queryName("interval_join").outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      views.addData(
        (t("2024-01-01 10:00:00"), 1L, "v-in"),
        (t("2024-01-01 10:00:01"), 2L, "v-wrong-user"),
        (t("2024-01-01 09:59:45"), 1L, "v-too-old"))
      clicks.addData((t("2024-01-01 10:00:05"), 1L, "c1"))
      q.processAllAvailable()
      // a LATER batch's view still inside c1's window joins retroactively:
      // c1 sits in the left buffer until the view watermark passes it
      views.addData((t("2024-01-01 10:00:03"), 1L, "v-late-batch"))
      clicks.addData((t("2024-01-01 10:00:06"), 2L, "c2")) // matches v-wrong-user's user
      q.processAllAvailable()
      val got = spark.table("interval_join")
        .select($"click_id", $"view_id").as[(String, String)].collect().toSet
      assert(got == Set(
        ("c1", "v-in"), ("c1", "v-late-batch"), ("c2", "v-wrong-user")),
        s"got $got")
    } finally q.stop()

    intercept[IllegalArgumentException] {
      EventTimeOps.streamIntervalJoin(
        clicks.toDF().toDF("ts", "u", "a"), views.toDF().toDF("ts", "u", "b"),
        Seq("u"), "ts", "ts", 0L, 0L, "5 seconds", "5 seconds")
    }
  }
}
