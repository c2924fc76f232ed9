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
}
