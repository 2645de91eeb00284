package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Structured Streaming surface: the same EventStreams transforms run as
  * a real stream (MemoryStream source, memory sink) and must produce the
  * batch results — the equivalence the batch DuckDB oracle certifies.
  */
class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    Ev(t("2024-01-01 00:05:00"), 1L, "click", 1.0),
    Ev(t("2024-01-01 00:20:00"), 1L, "click", 2.0),
    Ev(t("2024-01-01 00:59:00"), 2L, "view", 3.0),
    Ev(t("2024-01-01 01:10:00"), 1L, "click", 4.0),   // >10min gap → new session
    Ev(t("2024-01-01 01:15:00"), 2L, "view", 5.0))

  private def runStream(makeQuery: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        name: String): org.apache.spark.sql.DataFrame = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(events)
    val q = makeQuery(input.toDF())
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Complete())
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("streaming tumbling counts equal the batch transform") {
    val streamed = runStream(EventStreams.tumblingCountsStream(_, "1 hour", "2 hours"),
      "tumbling_out")
    val batch = EventStreams.tumblingCounts(events.toDF(), "1 hour")
    assert(streamed.orderBy("w_start", "event_type").collect().toSeq ===
      batch.orderBy("w_start", "event_type").collect().toSeq)
  }

  test("streaming session windows equal the batch transform") {
    val streamed = runStream(EventStreams.sessionizeStream(_, "10 minutes", "1 hour"),
      "session_out")
    val batch = EventStreams.sessionize(events.toDF(), "10 minutes")
    assert(streamed.orderBy("user_id", "s_start").collect().toSeq ===
      batch.orderBy("user_id", "s_start").collect().toSeq)
    // user 1: events at 00:05/00:20 split (15min gap > 10min) and 01:10 separate
    assert(batch.filter($"user_id" === 1L).count() === 3)
  }
}
