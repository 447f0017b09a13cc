package graft

import graft.functions.SimilarityOps
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("windowedCounts under readStream matches the batch result") {
    val batchEvents = Tables.events(spark, sf)
    val expected = EventStreams.windowedCounts(batchEvents)
      .orderBy("hour_start", "event_type").collect()

    // stage the (ts-converted) events as a file-source stream
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream
      .schema(batchEvents.schema)
      .parquet(s"$dir/in")
    val q = EventStreams.windowedCounts(streamIn)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("windowed_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("windowed_out")
        .orderBy("hour_start", "event_type").collect()
      assert(got.length === expected.length)
      assert(got.map(_.toString).toSeq === expected.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("windowed HLL sketches: stream == batch, and merged sketches answer global distinct") {
    val batchEvents = Tables.events(spark, sf)
    // compare per-window ESTIMATES (+ exact event counts), not raw
    // sketch bytes: a sparse-mode (LIST/SET) HLL serializes its coupons
    // in insertion order, so byte equality would hinge on merge order
    // and could go flaky on regenerated/smaller data even when the
    // sketches agree on every estimate
    def estimates(df: org.apache.spark.sql.DataFrame) = df
      .select(col("hour_start"),
        hll_sketch_estimate(col("user_sketch")).as("users"),
        col("n_events"))
      .orderBy("hour_start").collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSeq
    val expected = estimates(EventStreams.windowedUserSketches(batchEvents))

    val dir = java.nio.file.Files.createTempDirectory("graft-sketch-stream").toString
    batchEvents.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(batchEvents.schema).parquet(s"$dir/in")
    val q = EventStreams.windowedUserSketches(streamIn)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("sketch_out")
      .start()
    try {
      q.processAllAvailable()
      val got = estimates(spark.table("sketch_out"))
      assert(got.nonEmpty)
      assert(got === expected)
      // the offline consumer: union the stored per-window sketches and
      // answer the GLOBAL distinct-user question without touching events
      val est = spark.table("sketch_out")
        .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch")))
          .as("users")).collect()(0).getLong(0)
      val exact = batchEvents.select(countDistinct("user_id"))
        .collect()(0).getLong(0)
      assert(math.abs(est - exact).toDouble <= 0.05 * exact,
        s"est $est vs exact $exact")
    } finally q.stop()
  }

  test("stream-static enrichment join matches the batch twin") {
    val events = Tables.events(spark, sf).select("user_id", "ts", "value")
    val dim = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    val expected = EventStreams.enrichedSegmentCounts(events, dim)
      .orderBy("hour_start", "segment").collect()

    val dir = java.nio.file.Files.createTempDirectory("graft-enrich").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = EventStreams.enrichedSegmentCounts(streamIn, dim)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("enrich_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .orderBy("hour_start", "segment").collect()
      assert(got.length === expected.length && got.nonEmpty)
      assert(got.map(_.toString).toSeq === expected.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("transformWithState sessionizer matches q51 across two micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val all = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"))
    val expected = QueryRegistry.queries("q51_sessionize")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap

    val dir = java.nio.file.Files.createTempDirectory("graft-tws").toString
    // batch 1: events before the median second; batch 2: the rest — state
    // must carry session counts across the trigger boundary
    val mid = all.agg(expr("percentile(ts_sec, 0.5)")).head().getDouble(0)
    all.filter(col("ts_sec") <= mid).write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(all.schema).parquet(s"$dir/in")
      .as[EventStreams.EventRow]
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = streamIn.groupByKey(_.user_id)
      .transformWithState(new EventStreams.SessionProcessor(),
        TimeMode.None(), org.apache.spark.sql.streaming.OutputMode.Update())
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("tws_out").start()
    try {
      q.processAllAvailable()
      all.filter(col("ts_sec") > mid).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      // memory sink in update mode appends; keep the LAST row per user
      val got = spark.table("tws_out").collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))
        .groupBy(_._1).map { case (u, rows) =>
          u -> rows.map(_._2).maxBy(_._2) }
      assert(got === expected)
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(confKey))(spark.conf.set(confKey, _))
    }
  }

  test("timer-driven idle sessions flush exactly once when the watermark " +
      "passes their idle deadline") {
    // IdleSessionProcessor (event-time timers): users 1 and 2 are active
    // in batch 1 then go quiet; user 3's later arrivals advance the
    // watermark past their lastTs + 2s idle deadlines, firing the timers
    // — each span is emitted exactly once with the event-time bounds
    // from state. User 3's own deadline stays AHEAD of the final
    // watermark, so its span deterministically remains open. No
    // wall-clock sleeps: expiry is replayable watermark arithmetic.
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val dir = java.nio.file.Files.createTempDirectory("graft-idle").toString
    def write(mode: String, rows: (Long, Long)*): Unit =
      rows.toSeq.toDF("user_id", "ts_sec")
        .select(col("user_id"), col("ts_sec"),
          to_timestamp(col("ts_sec")).as("ts"))
        .write.mode(mode).parquet(s"$dir/in")
    write("overwrite", (1L, 1000L), (1L, 1100L), (2L, 5000L))
    val streamIn = spark.readStream
      .schema("user_id bigint, ts_sec bigint, ts timestamp")
      .parquet(s"$dir/in")
      .withWatermark("ts", "0 seconds")
      .as[EventStreams.EventRow]
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = streamIn.groupByKey(_.user_id)
      .transformWithState(new EventStreams.IdleSessionProcessor(2000L),
        TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Update())
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("idle_out").start()
    try {
      q.processAllAvailable() // wm -> 5000s; timers armed at 1102s / 5002s
      write("append", (3L, 9000L))
      q.processAllAvailable() // user 1 fires (1102s < 5000s); wm -> 9000s
      write("append", (3L, 9100L))
      q.processAllAvailable() // user 2 fires (5002s < 9000s); u3 at 9102s stays
      val got = spark.table("idle_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSet === Set((1L, 1000L, 1100L, 2L), (2L, 5000L, 5000L, 1L)),
        got.mkString(","))
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(confKey))(spark.conf.set(confKey, _))
    }
  }

  test("late events in a later micro-batch never move the session clock backwards") {
    // the monotone-clock contract (sessionize scaladoc): batch 1 ends at
    // t=10000; batch 2 delivers a LATE row (t=5000) then t=11000. With a
    // monotone lastTs the late row is absorbed and t=11000 is within the
    // 1800s gap of t=10000 -> ONE session of 3 events. A clock that
    // followed the late row backwards would see 11000-5000 > 1800 and
    // fabricate a spurious second session.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    val b1 = Seq((1L, 10000L)).toDF("user_id", "ts_sec")
    b1.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(b1.schema).parquet(s"$dir/in")
      .as[EventStreams.EventRow]
    val q = EventStreams.sessionize(streamIn)
      .writeStream.outputMode("update")
      .format("memory").queryName("late_out").start()
    try {
      q.processAllAvailable()
      Seq((1L, 5000L), (1L, 11000L)).toDF("user_id", "ts_sec")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val last = spark.table("late_out")
        .orderBy(col("n_events").desc).head()
      assert(last.getAs[Long]("n_sessions") === 1L)
      assert(last.getAs[Long]("n_events") === 3L)
    } finally q.stop()
  }

  test("q121's session_window expression is watermark-evicted on a stream " +
      "and matches the batch result") {
    // The q121 docstring's streaming claim, spec-backed: the SAME
    // `session_window(ts, 30 min)` groupBy runs under readStream with a
    // watermark in append mode. Append only emits a session once the
    // watermark passes its end, so after the two real micro-batches two
    // sentinel events (far future, sentinel user) push the watermark past
    // every real session end — the flushed output must equal the batch
    // q121 result exactly.
    val all = Tables.events(spark, sf).select("user_id", "ts")
    val expected = QueryRegistry.queries("q121_session_window_native")(spark, sf)
      .collect().map(_.toString).sorted.toSeq

    val sessionized: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      in => in.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))

    val dir = java.nio.file.Files.createTempDirectory("graft-sesswin").toString
    val mid = all.agg(expr("percentile(unix_timestamp(ts), 0.5)")).head().getDouble(0)
    val maxTs = all.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val sentinel = 9999999999L
    all.filter(unix_timestamp(col("ts")) <= mid)
      .write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(all.schema).parquet(s"$dir/in")
    val q = sessionized(streamIn.withWatermark("ts", "1 second"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("sesswin_out").start()
    try {
      q.processAllAvailable()
      all.filter(unix_timestamp(col("ts")) > mid)
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      // two flush batches: the first advances the watermark past every
      // real session end, the second triggers their append emission
      for (h <- Seq(2L, 4L)) {
        all.limit(1).select(lit(sentinel).as("user_id"),
            to_timestamp(lit(maxTs + h * 3600)).as("ts"))
          .write.mode("append").parquet(s"$dir/in")
        q.processAllAvailable()
      }
      val got = spark.table("sesswin_out")
        .filter(col("user_id") =!= sentinel)
        .collect().map(_.toString).sorted.toSeq
      assert(got === expected)
    } finally q.stop()
  }

  test("sessionizer state carries across micro-batches (mapGroupsWithState)") {
    import spark.implicits._
    val all = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"), col("event_id"))
    val expected = QueryRegistry.queries("q51_sessionize")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap

    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    // batch 1: first half of each user's timeline; batch 2: the rest —
    // correct totals REQUIRE state surviving the trigger boundary
    val half = all.count() / 2
    all.filter(col("event_id") < half).drop("event_id")
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = all.drop("event_id").schema
    val streamIn = spark.readStream.schema(schema).parquet(s"$dir/in")
      .as[EventStreams.EventRow]
    val q = EventStreams.sessionize(streamIn)
      .writeStream.outputMode("update")
      .format("memory").queryName("session_state_out").start()
    try {
      q.processAllAvailable()
      all.filter(col("event_id") >= half).drop("event_id")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      // memory sink in update mode appends a row per key per trigger;
      // n_events is monotone, so the max row per user is the final state
      val got = spark.table("session_state_out")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("n_sessions"))).as("s"))
        .collect()
        .map(r => r.getAs[Long]("user_id") -> {
          val s = r.getStruct(1); (s.getLong(1), s.getLong(0))
        }).toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("streaming dedup within watermark matches batch dropDuplicates") {
    val batchEvents = Tables.events(spark, sf).limit(2000)
    // stage each event TWICE (two files) — the streaming dedup must
    // collapse them to one row per event_id, like the batch form
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    batchEvents.write.mode("overwrite").parquet(s"$dir/in")
    batchEvents.write.mode("append").parquet(s"$dir/in")
    val expected = EventStreams.dedupedEvents(
      spark.read.parquet(s"$dir/in")).count()
    assert(expected === batchEvents.count())
    val q = EventStreams.dedupedEvents(
        spark.readStream.schema(batchEvents.schema).parquet(s"$dir/in"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_wm_out")
      assert(got.count() === expected)
      assert(got.select("event_id").distinct().count() === expected)
    } finally q.stop()
  }

  test("validation rules compose with readStream (streaming data quality)") {
    import graft.rules.{Checks, NoGate, PyS, RuleEvaluator}
    val batchEvents = Tables.events(spark, sf)
    def toSheet(df: org.apache.spark.sql.DataFrame) = df.select(
      col("event_type").as("Event_Type"),
      (col("event_id") + 2).cast("long").as("Row_Index"))
    val rules = Seq(Checks.inList("Event_Type", NoGate,
      Seq(PyS("click"), PyS("view"), PyS("signup"), PyS("purchase"))))
    val expected = RuleEvaluator.evaluate("events.csv", toSheet(batchEvents), rules)
      .count()

    val dir = java.nio.file.Files.createTempDirectory("graft-stream-rules").toString
    batchEvents.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(batchEvents.schema).parquet(s"$dir/in")
    // stateless rule evaluation is append-mode streamable as-is
    val q = RuleEvaluator.evaluate("events.csv", toSheet(streamIn), rules)
      .writeStream.outputMode("append")
      .format("memory").queryName("rule_stream_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("rule_stream_out").count() === expected)
    } finally q.stop()
  }

  test("sliding windows under readStream match the batch result") {
    val batchEvents = Tables.events(spark, sf)
    val expected = EventStreams.slidingCounts(batchEvents)
      .orderBy("ws").collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-slide").toString
    batchEvents.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(batchEvents.schema).parquet(s"$dir/in")
    val q = EventStreams.slidingCounts(streamIn)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sliding_out").orderBy("ws").collect()
      assert(got.map(_.toString).toSeq === expected.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("stream-stream interval join emits exactly the batch pair set") {
    val batchEvents = Tables.events(spark, sf)
    val expected = EventStreams.attributionJoin(batchEvents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // pair count must agree with q73's per-purchase click totals
    val q73Clicks = QueryRegistry.queries("q73_interval_join")(spark, sf)
      .agg(sum("n_clicks")).collect()(0).getLong(0)
    assert(expected.size.toLong === q73Clicks)

    val dir = java.nio.file.Files.createTempDirectory("graft-ssjoin").toString
    batchEvents.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(batchEvents.schema).parquet(s"$dir/in")
    val q = EventStreams.attributionJoin(streamIn)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssjoin_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits each closed session exactly once") {
    import spark.implicits._
    val all = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"), col("event_id"))

    // expected: spans from the window-function form, minus each user's
    // final (still-open) span — sessionSpans can only close on a proven gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_sec", "event_id")
    val withSession = all
      .withColumn("prev", lag("ts_sec", 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("ts_sec") - col("prev") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val spans = withSession.groupBy("user_id", "session_id")
      .agg(min("ts_sec").as("start_sec"), max("ts_sec").as("end_sec"),
        count(lit(1)).as("n_events"))
    val lastSession = spans.groupBy("user_id")
      .agg(max("session_id").as("session_id"))
    val expected = spans.join(lastSession,
      Seq("user_id", "session_id"), "left_anti")
      .select("user_id", "start_sec", "end_sec", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft-spans").toString
    val half = all.count() / 2
    all.filter(col("event_id") < half).drop("event_id")
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = all.drop("event_id").schema
    val streamIn = spark.readStream.schema(schema).parquet(s"$dir/in")
      .as[EventStreams.EventRow]
    val q = EventStreams.sessionSpans(streamIn)
      .writeStream.outputMode("append")
      .format("memory").queryName("spans_out").start()
    try {
      q.processAllAvailable()
      all.filter(col("event_id") >= half).drop("event_id")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val rows = spark.table("spans_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.length === rows.toSet.size, "a span was emitted twice")
      assert(rows.toSet === expected)
    } finally q.stop()
  }

  test("end-to-end streaming validation: CSV stream -> rules -> stateful dedup") {
    import graft.rules.{Checks, NoGate, PyS, RuleEvaluator}
    // two CSV files arriving as separate micro-batches, with overlapping
    // (Row_Index, Column, Value) error triples across them
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e-stream")
    val in = dir.resolve("in")
    java.nio.file.Files.createDirectories(in)
    def csv(name: String, rows: Seq[(Long, String)]): java.nio.file.Path = {
      val p = dir.resolve(name)
      java.nio.file.Files.writeString(p,
        "Row_Index,Event_Type\n" + rows.map(r => s"${r._1},${r._2}").mkString("\n"))
      p
    }
    val f1 = csv("a.csv", Seq(1L -> "bogus", 2L -> "click", 3L -> "bad"))
    val f2 = csv("b.csv", Seq(1L -> "bogus", 4L -> "worse", 2L -> "click"))
    val rules = Seq(Checks.inList("Event_Type", NoGate,
      Seq(PyS("click"), PyS("view"), PyS("signup"), PyS("purchase"))))
    val schema = "Row_Index LONG, Event_Type STRING"

    // batch reference: union both files, evaluate, global first-wins dedup
    val batchSheet = spark.read.schema(schema).option("header", "true")
      .csv(f1.toString, f2.toString)
    val expectedKeys = RuleEvaluator.dedupFirst(
      RuleEvaluator.evaluate("events.csv", batchSheet, rules))
      .select("Row_Index", "Column_Name", "Column_Value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    java.nio.file.Files.copy(f1, in.resolve("a.csv"))
    val streamIn = spark.readStream.schema(schema).option("header", "true")
      .csv(in.toString)
    val q = RuleEvaluator.evaluate("events.csv", streamIn, rules)
      .dropDuplicates("Row_Index", "Column_Name", "Column_Value")
      .writeStream.outputMode("append")
      .format("memory").queryName("e2e_errors").start()
    try {
      q.processAllAvailable()
      java.nio.file.Files.copy(f2, in.resolve("b.csv"))
      q.processAllAvailable()
      val got = spark.table("e2e_errors")
        .select("Row_Index", "Column_Name", "Column_Value").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // cross-batch keyed state: the replayed (1, Event_Type, bogus) triple
      // from file b must NOT be emitted again
      assert(got.length === got.toSet.size)
      assert(got.toSet === expectedKeys)
    } finally q.stop()
  }

  test("mapGroupsWithState sessionizer agrees with the window-function form") {
    import spark.implicits._
    val e = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"))
      .as[EventStreams.EventRow]
    val stateful = EventStreams.sessionize(e).collect()
      .map(s => s.user_id -> (s.n_sessions, s.n_events)).toMap
    val viaWindow = QueryRegistry.queries("q51_sessionize")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
    assert(stateful === viaWindow)
  }
}

class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  test("LSH ANN finds a meaningful fraction of the true top-5 (recall)") {
    val e = SimilarityOps.withNorm(Tables.embeddings(spark, sf))
    val queries = e.filter(col("vec_id") < 20)
    val exact = SimilarityOps.cosineTopK(queries, e, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val approx = SimilarityOps.lshTopK(queries, e, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    // every query at least finds itself (cos=1 in its own bucket)
    assert((0L until 20L).forall(q => approx.contains((q, q))))
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // 8-bit sign-LSH on 64-dim data: recall is approximate by design; the
    // spec pins it not degenerating (bucketing broken => only self matches)
    assert(recall > 0.2, s"recall $recall")
    // approx results must be a subset of legal pairs: scored within bucket
    assert(approx.size <= exact.size)
  }

  test("int8 quantized rescore: high recall vs brute force, bounded sq error") {
    val e = SimilarityOps.withNorm(Tables.embeddings(spark, sf))
    val exact = SimilarityOps.cosineTopK(e.filter(col("vec_id") < 20), e, 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val rows = QueryRegistry.queries("q95_quantized_rescore")(spark, sf).collect()
    val twoPhase = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    // int8 symmetric quantization on 64 dims keeps ~2 decimal digits of
    // cosine: the top-8 shortlist rarely drops a true top-5 neighbor
    val recall = exact.intersect(twoPhase).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
    // and the approximate score itself must sit near the exact one
    assert(rows.forall(r => math.abs(r.getAs[Double]("cosine")
      - r.getAs[Double]("approx_cosine")) < 0.03), "sq error exceeded 0.03")
  }

  test("SignLshBuckets expression matches the composed HOF form bit-for-bit") {
    val e = SimilarityOps.withNorm(Tables.embeddings(spark, sf))
      .select(col("vec_id"), col("vec"))
    val viaExpr = SimilarityOps.withBuckets(e, 8, 6)
      .select("vec_id", "t", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // reference: the unrolled higher-order-function formulation the
    // expression replaced (same ascending-dimension double sums)
    val tableBuckets = SimilarityOps.signPlanes(8, 6).map { table =>
      table.zipWithIndex.map { case (ws, b) =>
        when(SimilarityOps.dot(col("vec"), array(ws.map(lit): _*)) > 0,
          lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val viaHof = e.select(col("vec_id"),
        posexplode(array(tableBuckets: _*)).as(Seq("t", "bucket"))).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaExpr === viaHof)
  }

  test("two SignLshBuckets in one projection compile under codegen (fresh locals)") {
    // Regression: doGenCode once used fixed local names (t/b/i/...), so two
    // instances collapsed into one generated method made janino reject the
    // redefinition and the stage silently fell back to interpreted (first
    // observed on sf1 multi-file plans). fallback=false turns that into a
    // hard failure here.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val e = SimilarityOps.withNorm(Tables.embeddings(spark, sf))
        .select(col("vec_id"), col("vec"))
      val two = e.select(col("vec_id"),
        graft.functions.SignLsh.buckets(spark, col("vec"), 4, 4).as("b1"),
        graft.functions.SignLsh.buckets(spark, col("vec"), 2, 3).as("b2"))
      val rows = two.collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getSeq[Long](1).size == 4 && r.getSeq[Long](2).size == 2))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("neardup LSH prunes random pairs yet agrees exactly with brute force") {
    val e = SimilarityOps.withNorm(SimilarityOps.withPlantedDups(
      Tables.embeddings(spark, sf).filter(col("vec_id") < 300))).cache()
    try {
      val n = e.count()
      // candidate-rate bound: the banded join must prune the cross product
      // (the round-4 2-bit defaults passed ~99% of random pairs — vacuous)
      val candN = SimilarityOps.neardupCandidates(e, 32, 10).count()
      val rate = candN / (n * (n - 1) / 2.0)
      assert(rate < 0.05, s"candidate rate $rate (n=$n, candidates=$candN)")
      // exact all-pairs baseline (test-scale cross product)
      val exact = e.select(col("vec_id").as("id1"), col("vec").as("v1"),
          col("norm").as("n1"))
        .join(e.select(col("vec_id").as("id2"), col("vec").as("v2"),
          col("norm").as("n2")), col("id1") < col("id2"))
        .withColumn("cosine", round(SimilarityOps.dot(col("v1"), col("v2")) /
          (col("n1") * col("n2")), 6))
        .filter(col("cosine") >= 0.8)
        .select("id1", "id2", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val lsh = SimilarityOps.neardupPairs(e, 0.8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(lsh === exact)
      // every planted (id, id + 100000) pair is a reported near-dup: at
      // cosine ~ 0.995 the per-pair miss probability is ~ 1e-18
      val baseIds = (0L until n / 2).toSet
      val pairIds = lsh.map(p => (p._1, p._2))
      baseIds.foreach(id => assert(pairIds.contains((id, id + 100000L)),
        s"planted dup of $id missed"))
    } finally e.unpersist()
  }

  test("Count-Min collision path: tiny width overestimates but never under") {
    import graft.functions.CountMinOps
    import spark.implicits._
    // 40 distinct values into a 2x4 sketch: collisions guaranteed
    val values = spark.range(2000)
      .select(concat(lit("v"), (col("id") % 40)).as("value")).as[String]
    val exact = values.groupBy("value").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = values.select(CountMinOps.sketchAggOf(2, 4).toColumn).collect()(0)
    val ests = exact.keys.map(k =>
      k -> CountMinOps.estimate(m, k, depth = 2, width = 4)).toMap
    exact.foreach { case (k, n) => assert(ests(k) >= n, s"$k under-estimated") }
    assert(ests.exists { case (k, e) => e > exact(k) },
      "expected at least one collision-driven overestimate at width 4")
    // total mass per row is conserved: sum of any row = total count
    assert(m.take(4).sum === 2000L)
  }

  test("connected components agree with a union-find reference (fuzz)") {
    import graft.functions.DedupOps
    // deterministic pseudo-random graph: 120 vertices, ~80 hashed edges
    val verts = spark.range(120).select(col("id").as("doc_id"))
    val pairs = spark.range(80).select(
      abs(hash(col("id")) % 120).cast("long").as("doc1"),
      abs(hash(col("id"), lit(7)) % 120).cast("long").as("doc2"))
      .filter(col("doc1") =!= col("doc2"))
    val got = DedupOps.connectedComponents(verts, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference union-find on the driver
    val parent = Array.tabulate(120)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.collect().foreach { r =>
      val (a, b) = (find(r.getLong(0).toInt), find(r.getLong(1).toInt))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val expected = (0 until 120).map { v =>
      // canonical label = min vertex in the component
      var r = find(v)
      v.toLong -> (0 until 120).filter(u => find(u) == r).min.toLong
    }.toMap
    assert(got === expected)
  }

  test("Count-Min estimates dominate exact counts (one-sided error)") {
    val exact = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = QueryRegistry.queries("q80_countmin_estimate")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    // CMS never underestimates; equality iff the value's buckets are
    // collision-free in every row of the sketch
    exact.foreach { case (k, n) => assert(est(k) >= n, s"$k: ${est(k)} < $n") }
    // at 5 distinct values in 3x64 buckets, at least one row is clean for
    // every value — so the min-estimate should in fact be exact here
    assert(est === exact)
  }

  test("PQ ANN: approx distances order-correlate and rescore is exact") {
    import spark.implicits._
    val rows = QueryRegistry.queries("q139_pq_ann")(spark, sf).collect()
    val qids = Seq(11L, 222L, 333L)
    assert(rows.length === 15) // top-5 per query
    val q = Tables.embeddings(spark, sf)
      .select($"vec_id", expr(
        "transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
        .as("qv")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // aggregate recall@5 over the three queries vs the brute-force truth:
    // the synthetic embeddings are near-orthogonal (tiny distance spread),
    // so an untrained-seed PQ is noisy by design — like the LSH/IVF specs,
    // pin it above degenerate, not near-perfect. Measured on the current
    // testdata generation: 4/15 at both probe=1 and the shipped probe=2
    // multi-assignment (probe=3 degrades to 1/15 — min-of-k compresses
    // the noise floor); the floor stays >3/15 because recall here is
    // data-generation-dependent, not a property the engine controls.
    val hits = qids.map { qid =>
      val trueTop = q.keys.filter(_ != qid).toSeq
        .sortBy(v => (d2(q(qid), q(v)), v)).take(5).toSet
      rows.filter(_.getAs[Long]("qid") == qid)
        .count(r => trueTop(r.getAs[Long]("vec_id")))
    }.sum
    assert(hits / 15.0 > 0.2, s"recall ${hits / 15.0}")
    // the exact_d2 column really is exact, and ranks are consistent
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_d2") ===
        d2(q(r.getAs[Long]("qid")), q(r.getAs[Long]("vec_id"))))
    }
  }

  test("IVF ANN self-recall and exactness of within-cell scores") {
    val e = SimilarityOps.withNorm(Tables.embeddings(spark, sf))
    val exact = SimilarityOps.cosineTopK(e.filter(col("vec_id") < 20), e, 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cosine"))).toSet
    val ivf = QueryRegistry.queries("q72_ann_ivf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cosine"))).toSet
    // a query's own cell is always probed (it IS its crk=1 cell) => self hit
    assert((0L until 20L).forall(q => ivf.exists(t => t._1 == q && t._2 == q)))
    // candidate scores are exact: any (qid, vec_id) in both sets agrees
    val exactByPair = exact.map(t => (t._1, t._2) -> t._3).toMap
    assert(ivf.forall(t =>
      exactByPair.get((t._1, t._2)).forall(_ == t._3)))
    val recall = exact.count(t => ivf.contains(t)).toDouble / exact.size
    assert(recall > 0.2, s"recall $recall")
  }
}
