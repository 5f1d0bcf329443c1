package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streaming

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def rollupSet(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long, Double)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

  test("streaming windowed rollup (file source, AvailableNow) equals the batch plan") {
    val stream = Streaming.windowedRollup(Streaming.readEventStream(spark, sf))
    val qname = "rollup_test"
    val q = stream.writeStream
      .format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("st-chk").toString)
      .start()
    q.awaitTermination(120000)
    val got = rollupSet(spark.table(qname))
    val want = rollupSet(Streaming.windowedRollup(Tables.events(spark, sf)))
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("streaming dedup (file source, AvailableNow) equals the batch DISTINCT") {
    val stream = Streaming.streamingDedup(Streaming.readEventStream(spark, sf))
    val qname = "dedup_test"
    val q = stream.writeStream
      .format("memory").queryName(qname)
      .outputMode("append") // dedup emits each key at first arrival
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("st-chk").toString)
      .start()
    q.awaitTermination(120000)
    def keys(df: org.apache.spark.sql.DataFrame): Set[(String, Long, String)] =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val got = keys(spark.table(qname))
    val want = keys(Streaming.streamingDedup(Tables.events(spark, sf)))
    assert(got == want)
    assert(want.nonEmpty)
    // the fixture actually contains collapsible duplicates at hour grain
    assert(want.size < Tables.events(spark, sf).count())
  }

  test("stateful sessionization on batch reproduces the window-based sessionize") {
    val stateful = Streaming.sessionizeStateful(Tables.events(spark, sf)).toDF()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getString(4), r.getDouble(5))).toMap
    val windowed = graft.events.Events.sessionize(spark, sf)
      .selectExpr("CAST(user_id AS LONG) AS user_id", "CAST(session_id AS LONG) AS session_id",
        "n_events", "session_start", "session_end", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getString(4), r.getDouble(5))).toMap
    assert(stateful == windowed)
    assert(stateful.nonEmpty)
  }
}
