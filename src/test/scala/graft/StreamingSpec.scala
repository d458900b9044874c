package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Events
import graft.streaming.Events.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)

  private val fixture = Seq(
    (ts(0), "click", 1.0),
    (ts(1), "click", 2.0),
    (ts(4), "view", 3.0),
    (ts(6), "click", 4.0),
    (ts(12), "view", 5.0)
  )

  test("streaming windowedAgg over a memory stream equals the batch result") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(fixture: _*)

    val streamingDf = stream.toDF().toDF("ts", "event_type", "value")
    val query = Events.windowedAgg(streamingDf, "5 minutes", watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try query.processAllAvailable()
    finally query.stop()

    val streamed = spark.table("win_agg")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Events.windowedAgg(fixture.toDF("ts", "event_type", "value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(batch.contains((ts(0), "click", 2L, 3.0)))
    assert(batch.contains((ts(5), "click", 1L, 4.0)))
  }

  test("stateless curation stages run unchanged on a stream (scrub + within-doc rule + gopher)") {
    // scrubPii, dropRepeatedLinesWithinDoc, and gopherFilter are pure
    // projections/filters — the streaming-safe subset of the curation
    // pipeline. Applying them to a MemoryStream must yield exactly the
    // batch result (no state, no watermark needed).
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      (1L, "MENU\nplease call the office at 415-555-0143 now and ask for the desk\nMENU"),
      (2L, ("the quick brown fox jumps over the lazy dog and it runs away with great speed " * 4).trim),
      (3L, "short"))
    def curate(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.gopherFilter(
        graft.operators.Dedup.dropRepeatedLinesWithinDoc(
          df.select(org.apache.spark.sql.functions.col("doc_id"),
            graft.operators.TextAnalysis.scrubPii(
              org.apache.spark.sql.functions.col("text")).as("text")),
          "text"),
        "text", minWords = 5) // relaxed floor: fixture docs are short
    val stream = MemoryStream[(Long, String)]
    stream.addData(rows: _*)
    val query = curate(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curated_stream")
      .outputMode("append").start()
    try query.processAllAvailable()
    finally query.stop()
    val streamed = spark.table("curated_stream")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = curate(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch)
    assert(batch.keySet == Set(1L, 2L)) // doc 3 fails even the relaxed floor
    assert(batch(1L).contains("<PII>") && // scrub ran
      batch(1L).indexOf("MENU") == batch(1L).lastIndexOf("MENU")) // line rule ran
  }

  test("chunking + quantization + unigram scoring run unchanged on a stream") {
    // chunkByTokens is a stateless generate; quantizeInt8 a stateless
    // projection; unigramNll a stream-static broadcast join + per-key
    // agg (the model is a static frame) — the ingestion-time shapes of
    // the r8 operators. Streamed output must equal batch exactly.
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")),
      (2L, "the quick brown fox jumps over the lazy dog"))
    val chunkStream = MemoryStream[(Long, String)]
    chunkStream.addData(rows: _*)
    def chunk(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Chunking.chunkByTokens(df, "text", "doc_id",
        chunkTokens = 40, overlap = 10)
    val q1 = chunk(chunkStream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try q1.processAllAvailable()
    finally q1.stop()
    def chunkKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))
    assert(spark.table("chunk_stream").collect().map(chunkKey).toSet ==
      chunk(rows.toDF("doc_id", "text")).collect().map(chunkKey).toSet)

    val vecs = Seq((1L, Seq(1.0f, -2.0f, 0.5f)), (2L, Seq(0.25f, 0.0f, -0.125f)))
    val vecStream = MemoryStream[(Long, Seq[Float])]
    vecStream.addData(vecs: _*)
    val q2 = graft.operators.Embeddings.quantizeInt8(
        vecStream.toDF().toDF("vec_id", "embedding"), "embedding", "vec_id")
      .writeStream.format("memory").queryName("quant_stream")
      .outputMode("append").start()
    try q2.processAllAvailable()
    finally q2.stop()
    def qKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDouble(1), r.getSeq[Byte](2).toList)
    assert(spark.table("quant_stream").collect().map(qKey).toSet ==
      graft.operators.Embeddings.quantizeInt8(
        vecs.toDF("vec_id", "embedding"), "embedding", "vec_id")
        .collect().map(qKey).toSet)

    val model = graft.operators.TextAnalysis.unigramModel(
      rows.toDF("doc_id", "text"), "text", vocabSize = 50)
    val nllStream = MemoryStream[(Long, String)]
    nllStream.addData(rows: _*)
    val q3 = graft.operators.TextAnalysis.unigramNll(
        nllStream.toDF().toDF("doc_id", "text"), model, "text", "doc_id")
      .writeStream.format("memory").queryName("nll_stream")
      .outputMode("complete").start() // per-doc agg needs complete mode
    try q3.processAllAvailable()
    finally q3.stop()
    def nKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))
    assert(spark.table("nll_stream").collect().map(nKey).toSet ==
      graft.operators.TextAnalysis.unigramNll(
        rows.toDF("doc_id", "text"), model, "text", "doc_id")
        .collect().map(nKey).toSet)
  }

  test("char entropy and DSIR scoring run unchanged on a stream") {
    // withCharEntropy is a stateless projection; DSIR scoring is a
    // stream-static broadcast join (localized model) + per-doc agg +
    // key projection — the ingestion-time shapes of the late-r8 ops.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, "aabbbb banana apple"),
      (2L, "zzz zzz quantum physics quantum"),
      (3L, ""))
    val entStream = MemoryStream[(Long, String)]
    entStream.addData(rows: _*)
    val q1 = graft.operators.TextAnalysis.withCharEntropy(
        entStream.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("ent_stream")
      .outputMode("append").start()
    try q1.processAllAvailable()
    finally q1.stop()
    def eKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0),
        Option(r.getAs[java.lang.Double]("char_entropy")).map(d => math.round(d * 1e9)))
    assert(spark.table("ent_stream").collect().map(eKey).toSet ==
      graft.operators.TextAnalysis.withCharEntropy(
        rows.toDF("doc_id", "text"), "text").collect().map(eKey).toSet)

    val target = Seq((10L, "quantum physics measurement")).toDF("doc_id", "text")
    val model = graft.operators.Dsir.logRatioModel(
      target, rows.toDF("doc_id", "text"), "text", nBuckets = 64)
    val dsirStream = MemoryStream[(Long, String)]
    dsirStream.addData(rows: _*)
    val q2 = graft.operators.Dsir.gumbelKeys(
        graft.operators.Dsir.importanceWeights(
          dsirStream.toDF().toDF("doc_id", "text"), model, "text", "doc_id"),
        tau = 2.0, seed = "st")
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("complete").start() // per-doc agg needs complete mode
    try q2.processAllAvailable()
    finally q2.stop()
    def dKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), math.round(r.getDouble(1) * 1e9), math.round(r.getDouble(3) * 1e9))
    assert(spark.table("dsir_stream").collect().map(dKey).toSet ==
      graft.operators.Dsir.gumbelKeys(
        graft.operators.Dsir.importanceWeights(
          rows.toDF("doc_id", "text"), model, "text", "doc_id"),
        tau = 2.0, seed = "st").collect().map(dKey).toSet)
  }

  test("streaming plan carries the event-time watermark") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val plan = Events.windowedAgg(
      stream.toDF().toDF("ts", "event_type", "value"),
      "5 minutes", watermark = Some("10 minutes")).queryExecution.logical.toString
    assert(plan.contains("EventTimeWatermark"), plan)
  }

  test("sessionizeBatch (relational) equals sessionize (stateful) on real events") {
    val ev = Events.readEventsParquet(spark, "/root/testdata/sf0.001/events.parquet")
      .select("user_id", "ts", "event_type", "value").as[Event]
    def key(u: Long, s: Timestamp, e: Timestamp, n: Long, v: Double) =
      (u, s.getTime, e.getTime, n, math.round(v * 1e6))
    val stateful = Events.sessionize(ev).collect()
      .map(s => key(s.user_id, s.session_start, s.session_end, s.n_events, s.total_value))
      .toSet
    val relational = Events.sessionizeBatch(ev.toDF()).collect()
      .map(r => key(r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
      .toSet
    assert(stateful.nonEmpty && relational == stateful)
  }

  test("dedupStream: duplicates across micro-batches collapse within the watermark") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val q = Events.dedupStream(
        stream.toDF().toDF("event_id", "ts", "event_type", "value"),
        keyCols = Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(60), "click", 1.0), (2L, ts(61), "view", 2.0))
      q.processAllAvailable()
      // duplicate of event 1 arrives in a LATER micro-batch, inside watermark
      stream.addData((1L, ts(60), "click", 1.0), (3L, ts(62), "view", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionizeStream: session survives micro-batch boundary, closes on watermark timeout") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = Events.sessionizeStream(
        stream.toDS().withWatermark("ts", "10 minutes").as[Event],
        gapMillis = 30 * 60000L)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      // (times start at +60min: an event AT the initial epoch-0 watermark
      // would be dropped as late)
      // batch 1: open a session for user 1
      stream.addData(Event(1L, ts(60), "click", 1.0), Event(1L, ts(65), "view", 2.0))
      q.processAllAvailable()
      // batch 2: same session CONTINUES across the micro-batch boundary
      stream.addData(Event(1L, ts(70), "click", 3.0))
      q.processAllAvailable()
      assert(spark.table("sessions_stream").isEmpty) // nothing closed yet
      // batch 3: another user far in the future advances the watermark…
      stream.addData(Event(2L, ts(240), "view", 9.0))
      q.processAllAvailable()
      // batch 4: …and the next batch fires user 1's event-time timeout
      stream.addData(Event(2L, ts(245), "view", 1.0))
      q.processAllAvailable()

      val out = spark.table("sessions_stream")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4)))
      // ONE session covering all three micro-batched events, closed by timeout
      assert(out.count(_._1 == 1L) == 1, out.mkString(", "))
      assert(out.contains((1L, ts(60), ts(70), 3L, 6.0)), out.mkString(", "))
    } finally q.stop()
  }

  test("sessionizeStream multi-batch session SPLIT equals sessionizeBatch on the same events") {
    implicit val ctx = spark.sqlContext
    val user1 = Seq(
      Event(1L, ts(60), "click", 1.0), Event(1L, ts(65), "view", 2.0), // session A
      Event(1L, ts(120), "click", 4.0), Event(1L, ts(130), "view", 5.0)) // session B (gap 55min)
    val stream = MemoryStream[Event]
    val q = Events.sessionizeStream(
        stream.toDS().withWatermark("ts", "10 minutes").as[Event],
        gapMillis = 30 * 60000L)
      .writeStream.format("memory").queryName("sessions_split_stream")
      .outputMode("append").start()
    try {
      // session A arrives whole in batch 1; the SPLIT event lands in its
      // own batch, so the close-on-gap decision crosses a batch boundary
      stream.addData(user1.take(2): _*)
      q.processAllAvailable()
      stream.addData(user1(2))
      q.processAllAvailable()
      stream.addData(user1(3))
      q.processAllAvailable()
      // watermark-advancing traffic from another user closes session B
      stream.addData(Event(2L, ts(240), "view", 9.0))
      q.processAllAvailable()
      stream.addData(Event(2L, ts(245), "view", 1.0))
      q.processAllAvailable()

      val streamed = spark.table("sessions_split_stream")
        .collect()
        .filter(_.getLong(0) == 1L)
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      val batch = Events.sessionizeBatch(user1.toDF())
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(batch.size == 2) // the gap really did split
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("sessionize: gap splits sessions, aggregates carry through") {
    val events = Seq(
      Event(1L, ts(0), "click", 1.0),
      Event(1L, ts(5), "view", 2.0),
      Event(1L, ts(50), "click", 4.0),
      Event(2L, ts(10), "view", 8.0)
    ).toDS()
    val sessions = Events.sessionize(events, gapMillis = 30 * 60000L)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length == 3)
    val s1 = sessions(0)
    assert(s1.user_id == 1L && s1.n_events == 2L && s1.total_value == 3.0)
    assert(s1.session_start == ts(0) && s1.session_end == ts(5))
    val s2 = sessions(1)
    assert(s2.n_events == 1L && s2.session_start == ts(50))
    assert(sessions(2).user_id == 2L && sessions(2).total_value == 8.0)
  }

  test("streaming SLIDING windowedAgg over a memory stream equals the batch result") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(fixture: _*)
    val streamingDf = stream.toDF().toDF("ts", "event_type", "value")
    val q = Events.windowedAgg(streamingDf, "10 minutes",
        watermark = Some("30 minutes"), slide = Some("5 minutes"))
      .writeStream.format("memory").queryName("win_slide").outputMode("append").start()
    try {
      stream.addData((ts(60), "click", 0.0)) // advance the watermark past the fixture
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("win_slide")
      .select(col("window_start"), col("event_type"), col("n_events"), col("total_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batch = Events.windowedAgg(
        fixture.toDF("ts", "event_type", "value"), "10 minutes",
        slide = Some("5 minutes"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    // every finalized fixture window appears with batch-identical values
    assert(batch.subsetOf(got ++ batch.filter(_._1.getTime >= ts(55).getTime)))
    assert(got.filter(_._1.getTime < ts(50).getTime) === batch.filter(_._1.getTime < ts(50).getTime))
  }

  test("funnel: greedy earliest completion, ordering respected, partial depths") {
    val ev = Seq(
      // user 1 completes in order
      (1L, ts(0), "signup"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      // user 2: purchase BEFORE the click → stalls at depth 2
      (2L, ts(0), "signup"), (2L, ts(3), "purchase"), (2L, ts(7), "click"),
      // user 3: signup only
      (3L, ts(1), "signup"),
      // user 4: never signs up → absent from the report
      (4L, ts(0), "click"), (4L, ts(1), "purchase"),
      // user 5: same-ts signup+click (inclusive >=), later purchase;
      // an EARLIER click (ts 1) must not count — it precedes signup
      (5L, ts(1), "click"), (5L, ts(2), "signup"), (5L, ts(2), "click"),
      (5L, ts(6), "purchase")
    ).map { case (u, t, ty) => (u, t, ty) }.toDF("user_id", "ts", "event_type")
    val out = Events.funnel(ev, Seq("signup", "click", "purchase"))
      .select("user_id", "steps_completed", "converted")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(out === Seq((1L, 3, 1), (2L, 2, 0), (3L, 1, 0), (5L, 3, 1)))
    // user 2's depth-2 timestamp is the click AFTER signup
    val t2 = Events.funnel(ev, Seq("signup", "click", "purchase"))
      .filter(col("user_id") === 2L).select("t_2")
      .as[Option[Timestamp]].head()
    assert(t2 === Some(ts(7)))
    intercept[IllegalArgumentException] { Events.funnel(ev, Seq("signup")) }
    intercept[IllegalArgumentException] { Events.funnel(ev, Seq("a", "a")) }
    // conversion window (first-touch): user 1 completes at ts 9 — inside
    // a 10-minute window but outside a 5-minute one (click at 5 ok,
    // purchase at 9 > 5)
    val within5 = Events.funnel(ev, Seq("signup", "click", "purchase"),
        within = Some(expr("INTERVAL '5' MINUTE")))
      .filter(col("user_id") === 1L)
      .select("steps_completed").as[Int].head()
    assert(within5 === 2)
    val within10 = Events.funnel(ev, Seq("signup", "click", "purchase"),
        within = Some(expr("INTERVAL '10' MINUTE")))
      .filter(col("user_id") === 1L)
      .select("converted").as[Int].head()
    assert(within10 === 1)
  }

  test("retention: cohort by first period, distinct users per offset") {
    val P = 10L * 60 * 1000000 // 10-minute periods of ts(minutes) fixture
    val ev = Seq(
      (1L, ts(0)), (1L, ts(5)),   // u1: cohort 0, active offsets {0}
      (1L, ts(25)),               // ... and offset 2
      (2L, ts(3)), (2L, ts(12)),  // u2: cohort 0, offsets {0, 1}
      (3L, ts(11)),               // u3: cohort 1, offset {0}
      (4L, ts(14)), (4L, ts(21)), (4L, ts(22)) // u4: cohort 1, offsets {0,1}
    ).toDF("user_id", "ts")
    val out = Events.retention(ev, periodMicros = P)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set(
      (0L, 0L, 2L), // u1, u2 in their cohort period
      (0L, 1L, 1L), // u2 back in period 1
      (0L, 2L, 1L), // u1 back in period 2
      (1L, 0L, 2L), // u3, u4
      (1L, 1L, 1L)  // u4 back — counted once despite two events
    ))
    intercept[IllegalArgumentException] { Events.retention(ev, periodMicros = 0) }
  }

  test("joinStreams: stream-stream interval join equals batch, state bounded") {
    implicit val ctx = spark.sqlContext
    val impressions = MemoryStream[(Long, Timestamp, String)]
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val joined = Events.joinStreams(
      impressions.toDF().toDF("user_id", "imp_ts", "ad"),
      clicks.toDF().toDF("user_id", "click_ts", "value"),
      on = Seq("user_id"), leftTs = "imp_ts", rightTs = "click_ts",
      lookback = "0 seconds", lookahead = "10 minutes",
      watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    val impData = Seq(
      (1L, ts(60), "adA"), (2L, ts(62), "adB"), (1L, ts(90), "adC"))
    val clickData = Seq(
      (1L, ts(65), 1.0),  // matches adA (+5m)
      (2L, ts(75), 2.0),  // 13m after adB -> outside lookahead
      (1L, ts(95), 3.0))  // matches adC (+5m)
    try {
      impressions.addData(impData.take(2): _*)
      clicks.addData(clickData.take(1): _*)
      q.processAllAvailable()
      impressions.addData(impData.drop(2): _*)
      clicks.addData(clickData.drop(1): _*)
      q.processAllAvailable()
      // advance both watermarks far past everything so all matches emit
      impressions.addData((99L, ts(400), "late"))
      clicks.addData((99L, ts(401), 0.0))
      q.processAllAvailable()
      q.processAllAvailable()
      val streamed = spark.table("ss_join")
        .select("user_id", "ad", "value")
        .as[(Long, String, Double)].collect().toSet
      // batch run of the SAME function on the same data
      val batch = Events.joinStreams(
          (impData :+ ((99L, ts(400), "late"))).toDF("user_id", "imp_ts", "ad"),
          (clickData :+ ((99L, ts(401), 0.0))).toDF("user_id", "click_ts", "value"),
          on = Seq("user_id"), leftTs = "imp_ts", rightTs = "click_ts",
          lookback = "0 seconds", lookahead = "10 minutes")
        .select("user_id", "ad", "value")
        .as[(Long, String, Double)].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set((1L, "adA", 1.0), (1L, "adC", 3.0),
        (99L, "late", 0.0)))
      // and the batch run equals the definitional inequality join
      val definitional = impData.toDF("user_id", "imp_ts", "ad")
        .join(clickData.toDF("cu", "click_ts", "value"),
          col("user_id") === col("cu") &&
            col("click_ts") >= col("imp_ts") &&
            col("click_ts") <= col("imp_ts") + expr("INTERVAL '10' MINUTE"))
        .select("user_id", "ad", "value")
        .as[(Long, String, Double)].collect().toSet
      assert(streamed - ((99L, "late", 0.0)) === definitional)
      // watermark-bounded state: the join keeps a state store, and after
      // the watermark passed the early events their buffered rows were
      // evicted — state must hold fewer rows than were ingested
      val prog = q.lastProgress
      assert(prog.stateOperators.nonEmpty, "no state operator in progress")
      val rowsTotal = prog.stateOperators.map(_.numRowsTotal).sum
      val ingested = impData.size + 1 + clickData.size + 1
      assert(rowsTotal < ingested,
        s"state not watermark-bounded: $rowsTotal rows buffered of $ingested")
    } finally q.stop()
  }

  test("joinStreams leftOuter: unmatched left rows null-extend (batch surface)") {
    val imps = Seq((1L, ts(60), "adA"), (2L, ts(62), "adB"))
      .toDF("user_id", "imp_ts", "ad")
    val clicks = Seq((1L, ts(65), 1.0)).toDF("user_id", "click_ts", "value")
    val out = Events.joinStreams(imps, clicks, Seq("user_id"),
        leftTs = "imp_ts", rightTs = "click_ts",
        lookback = "0 seconds", lookahead = "10 minutes",
        joinType = "leftOuter")
      .select("user_id", "ad", "value")
      .as[(Long, String, Option[Double])].collect().toSet
    assert(out === Set((1L, "adA", Some(1.0)), (2L, "adB", None)))
    intercept[IllegalArgumentException] {
      Events.joinStreams(imps, clicks, Seq("user_id"), "imp_ts", "click_ts",
        joinType = "full")
    }
  }
}
