package graft

import graft.sources.Tables
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {

  test("streaming windowAgg emits rows consistent with the batch analog") {
    val q = EventStreams.startWindowAggStream(spark, sf, "stream_spec_out")
    try q.processAllAvailable()
    finally q.stop()
    import org.apache.spark.sql.functions._
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.select(unix_micros(col("win_start").cast("timestamp")), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val streamed = canon(spark.table("stream_spec_out"))
    val batch = canon(EventStreams.windowAgg(Tables.load(spark, sf, "events")))
    // append-mode emits only watermark-closed windows: subset of batch, non-empty
    assert(streamed.nonEmpty, "streaming query emitted nothing")
    assert(streamed.subsetOf(batch), "streamed window rows diverge from batch analog")
  }

  test("flatMapGroupsWithState sessionizer: closed sessions match batch; open ones stay in state") {
    val q = EventStreams.startSessionizeStream(spark, sf, "stream_sessions_out")
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_sessions_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    import org.apache.spark.sql.functions._
    val batchAll = EventStreams.sessionize(spark, Tables.load(spark, sf, "events"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_micros(col("start_ts").cast("timestamp")),
        unix_micros(col("end_ts").cast("timestamp")),
        round(col("total_value") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val nUsers = batchAll.map(_._1).distinct.length
    // everything the stream emitted must be a batch session, and it must be
    // exactly the batch output minus each user's final (still-open) session
    val lastPerUser = batchAll.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
    assert(streamed == (batchAll.toSet -- lastPerUser),
      s"streamed=${streamed.size} batch=${batchAll.length} users=$nUsers")
  }

  test("stream-stream interval join matches the batch join") {
    val q = EventStreams.startStreamStreamJoin(spark, sf, "stream_ssj_out")
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_ssj_out").count()
    // same transform the gated stream_interval_join query runs
    val batch = EventStreams.intervalJoinBatch(Tables.load(spark, sf, "events")).count()
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("streaming dropDuplicates emits exactly the distinct key set") {
    val q = EventStreams.startDedupStream(spark, sf, "stream_dedup_out")
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_dedup_out")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // same key set the gated stream_dedup batch analog produces
    val distinctBatch = EventStreams.dedupBatch(Tables.load(spark, sf, "events")).count()
    assert(streamed.length == distinctBatch, "streamed dedup cardinality mismatch")
    assert(streamed.distinct.length == streamed.length, "stream emitted duplicate keys")
  }

  test("streaming per-window distinct estimate tracks the exact batch counts") {
    val q = EventStreams.startWindowDistinctStream(spark, sf, "stream_adc_out")
    try q.processAllAvailable()
    finally q.stop()
    import org.apache.spark.sql.functions._
    val streamed = spark.table("stream_adc_out").collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    assert(streamed.nonEmpty, "streaming distinct query emitted nothing")
    val exact = EventStreams.windowDistinctSketch(Tables.load(spark, sf, "events"))
      .select(unix_micros(col("win_start").cast("timestamp")) / 1000, col("n_exact"))
      .collect().map(r => r.getDouble(0).toLong -> r.getLong(1)).toMap
    streamed.foreach { case (w, est) =>
      val ex = exact.getOrElse(w, -1L)
      assert(ex > 0, s"stream emitted a window $w batch never saw")
      val rel = math.abs(est - ex).toDouble / ex
      assert(rel < 0.25, s"window $w: HLL estimate $est vs exact $ex (rel $rel)")
    }
  }

  test("sessionize invariants: sessions partition events, gaps exceed threshold") {
    val events = Tables.load(spark, sf, "events")
    val sessions = EventStreams.sessionize(spark, events).cache()
    val nEvents = events.count()
    val sessionEventTotal = sessions.agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect().head.getLong(0)
    assert(sessionEventTotal == nEvents, "sessions must partition all events")
    import org.apache.spark.sql.functions._
    val bad = sessions.withColumn("prev_end",
        lag(col("end_ts"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("session_id")))
      .filter(col("prev_end").isNotNull &&
        unix_micros(col("start_ts").cast("timestamp")) -
          unix_micros(col("prev_end").cast("timestamp")) <= EventStreams.SessionGapUs)
      .count()
    assert(bad == 0, "adjacent sessions closer than the gap threshold")
  }
}
