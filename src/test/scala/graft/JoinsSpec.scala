package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import graft.operators.{Joins, TrainingOrder}

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** trades: the left side. quotes: the right side (id, price). */
  private def trades: DataFrame = Seq(
    (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
    (2L, "A", ts("2024-01-01 10:00:10"), 101.0),
    (3L, "B", ts("2024-01-01 10:00:03"), 50.0),
    (4L, "C", ts("2024-01-01 10:00:07"), 77.0) // no quotes for C at all
  ).toDF("trade_id", "sym", "t_ts", "t_price")

  private def quotes: DataFrame = Seq(
    (10L, "A", ts("2024-01-01 10:00:01"), 99.5),
    (11L, "A", ts("2024-01-01 10:00:05"), 99.9), // ties trade 1 exactly (inclusive)
    (12L, "A", ts("2024-01-01 10:00:09"), 100.4),
    (13L, "B", ts("2024-01-01 10:00:04"), 49.9)  // AFTER trade 3
  ).toDF("quote_id", "sym", "q_ts", "q_price")

  test("asofJoin backward: most recent quote at-or-before each trade, left join") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        tieBreak = Some("quote_id"))
      .select("trade_id", "quote_id", "q_price")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    assert(out === Seq(
      (1L, Some(11L), Some(99.9)), // equal ts is inclusive
      (2L, Some(12L), Some(100.4)),
      (3L, None, None),            // only later quotes for B
      (4L, None, None)))           // no quotes for C
  }

  test("asofJoin forward: nearest quote at-or-after; inner drops unmatched") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        direction = "forward", joinType = "inner", tieBreak = Some("quote_id"))
      .select("trade_id", "quote_id").as[(Long, Long)].collect().sortBy(_._1)
    // trade 1 ties quote 11 (inclusive); trade 2 (10:00:10) has no later
    // quote (12 is at :09) and drops; trade 3 gets B's later quote 13
    assert(out === Seq((1L, 11L), (3L, 13L)))
  }

  test("asofJoin tolerance: matches farther than the tolerance null out") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        tolerance = Some(expr("INTERVAL '1' SECOND")), tieBreak = Some("quote_id"))
      .select("trade_id", "quote_id").as[(Long, Option[Long])].collect().sortBy(_._1)
    // trade 1 ties quote 11 at 0s; trade 2 is 1s after quote 12 (kept);
    // everything else has no within-1s quote
    assert(out === Seq((1L, Some(11L)), (2L, Some(12L)), (3L, None), (4L, None)))
  }

  test("asofJoin ties on rightTs: greatest tieBreak wins backward, least forward") {
    val l = Seq((1L, "A", ts("2024-01-01 10:00:10"))).toDF("lid", "k", "lts")
    val r = Seq(
      (20L, "A", ts("2024-01-01 10:00:05")),
      (21L, "A", ts("2024-01-01 10:00:05"))).toDF("rid", "k", "rts")
    val back = Joins.asofJoin(l, r, Seq("k"), "lts", "rts", tieBreak = Some("rid"))
      .select("rid").as[Long].head()
    assert(back === 21L)
    val l2 = Seq((1L, "A", ts("2024-01-01 10:00:01"))).toDF("lid", "k", "lts")
    val fwd = Joins.asofJoin(l2, r, Seq("k"), "lts", "rts",
        direction = "forward", tieBreak = Some("rid"))
      .select("rid").as[Long].head()
    assert(fwd === 20L)
  }

  test("asofJoin: null payload fields do not tear the matched row apart") {
    // quote 31 is nearest and has a NULL price; per-column last(ignoreNulls)
    // would reach back to quote 30's price — the struct must not
    val l = Seq((1L, "A", ts("2024-01-01 10:00:10"))).toDF("lid", "k", "lts")
    val r = Seq(
      (30L, "A", ts("2024-01-01 10:00:01"), Some(9.9)),
      (31L, "A", ts("2024-01-01 10:00:05"), Option.empty[Double]))
      .toDF("rid", "k", "rts", "rprice")
    val out = Joins.asofJoin(l, r, Seq("k"), "lts", "rts", tieBreak = Some("rid"))
      .select("rid", "rprice").as[(Long, Option[Double])].head()
    assert(out === ((31L, None)))
  }

  test("asofJoin plan: one hash shuffle on the keys, zero join nodes") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of spelling must not plan a join:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles === 1, s"expected exactly one hash exchange:\n$plan")
  }

  test("asofJoin rejects colliding payload names and bad args") {
    intercept[IllegalArgumentException] {
      Joins.asofJoin(trades, quotes.withColumnRenamed("q_price", "t_price"),
        Seq("sym"), "t_ts", "q_ts")
    }
    intercept[IllegalArgumentException] {
      Joins.asofJoin(trades, quotes, Seq.empty, "t_ts", "q_ts")
    }
    intercept[IllegalArgumentException] {
      Joins.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts", direction = "nearest")
    }
  }

  // ---- rangeJoin ----

  private def points: DataFrame = Seq(
    (1L, 5L), (2L, 10L), (3L, 17L), (4L, 100L)
  ).toDF("pid", "x")

  private def intervals: DataFrame = Seq(
    (100L, 0L, 10L),   // [0,10): catches x=5
    (101L, 5L, 18L),   // [5,18): catches 5, 10, 17
    (102L, 17L, 17L),  // empty interval: catches nothing
    (103L, 90L, 101L)  // catches 100
  ).toDF("iid", "s", "e")

  test("rangeJoin: half-open containment, exact pairs, no duplicates") {
    val out = Joins.rangeJoin(points, "x", intervals, "s", "e", binWidth = 4)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(out === Seq((1L, 100L), (1L, 101L), (2L, 101L), (3L, 101L), (4L, 103L)))
  }

  test("rangeJoin agrees with the definitional cross-filter at several widths") {
    val expected = points.join(intervals)
      .filter(col("x") >= col("s") && col("x") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val got = Joins.rangeJoin(points, "x", intervals, "s", "e", binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted
      assert(got === expected, s"binWidth=$w")
    }
  }

  test("rangeJoin on timestamps matches the cross-filter") {
    val p = trades.select(col("trade_id"), col("t_ts"))
    val iv = quotes.select(col("quote_id"), col("q_ts").as("w_start"),
      (col("q_ts") + expr("INTERVAL '4' SECOND")).as("w_end"))
    val expected = p.join(iv)
      .filter(col("t_ts") >= col("w_start") && col("t_ts") < col("w_end"))
      .select("trade_id", "quote_id").as[(Long, Long)].collect().sorted
    val got = Joins.rangeJoin(p, "t_ts", iv, "w_start", "w_end",
        binWidth = 2L * 1000 * 1000) // 2s bins, in micros
      .select("trade_id", "quote_id").as[(Long, Long)].collect().sorted
    assert(got === expected && got.nonEmpty)
  }

  test("rangeJoin plan: shuffled equi-join, no nested-loop join") {
    val out = Joins.rangeJoin(points, "x", intervals, "s", "e", binWidth = 4)
    val nested = out.queryExecution.executedPlan.collect {
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(nested.isEmpty, "bin spelling must not plan a nested-loop join")
  }

  test("rangeJoin: an interval wider than the bin cap fails loudly") {
    val huge = Seq((1L, 0L, 10000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      Joins.rangeJoin(points, "x", huge, "s", "e",
        binWidth = 1, maxBinsPerInterval = 64).collect()
    }
    assert(ex.getMessage.contains("rangeJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("rangeJoin")))
  }

  // ---- overlapJoin ----

  test("overlapJoin: exactly the overlapping pairs, once each, empty intervals never") {
    val l = Seq(
      (1L, 0L, 10L),   // overlaps 100, 101
      (2L, 9L, 12L),   // overlaps 100 (at 9), 101
      (3L, 20L, 25L),  // overlaps nothing
      (4L, 30L, 30L)   // empty: overlaps nothing, even inside 102
    ).toDF("lid", "ls", "le")
    val r = Seq(
      (100L, 5L, 10L),
      (101L, 8L, 18L),
      (102L, 28L, 40L)
    ).toDF("rid", "rs", "re")
    val expected = l.join(r)
      .filter(greatest(col("ls"), col("rs")) < least(col("le"), col("re")))
      .select("lid", "rid").as[(Long, Long)].collect().sorted
    assert(expected === Seq((1L, 100L), (1L, 101L), (2L, 100L), (2L, 101L)))
    for (w <- Seq(1L, 4L, 100L)) {
      val got = Joins.overlapJoin(l, "ls", "le", r, "rs", "re", binWidth = w)
        .select("lid", "rid").as[(Long, Long)].collect().sorted
      assert(got === expected, s"binWidth=$w")
    }
  }

  test("overlapJoin on timestamps: pair count and values match the cross-filter") {
    val p = trades.select(col("trade_id"), col("t_ts").as("p_s"),
      (col("t_ts") + expr("INTERVAL '3' SECOND")).as("p_e"))
    val q = quotes.select(col("quote_id"), col("q_ts").as("q_s"),
      (col("q_ts") + expr("INTERVAL '2' SECOND")).as("q_e"))
    val expected = p.join(q)
      .filter(greatest(col("p_s"), col("q_s")) < least(col("p_e"), col("q_e")))
      .select("trade_id", "quote_id").as[(Long, Long)].collect().sorted
    val got = Joins.overlapJoin(p, "p_s", "p_e", q, "q_s", "q_e",
        binWidth = 2L * 1000 * 1000)
      .select("trade_id", "quote_id").as[(Long, Long)].collect().sorted
    assert(got === expected && got.nonEmpty)
  }

  test("rangeJoin runs stream-static: streaming points against static intervals") {
    implicit val ctx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    stream.addData((1L, 5L), (2L, 10L), (3L, 17L), (4L, 100L))
    val q = Joins.rangeJoin(
        stream.toDF().toDF("pid", "x"), "x", intervals, "s", "e", binWidth = 4)
      .select("pid", "iid")
      .writeStream.format("memory").queryName("range_stream").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("range_stream").as[(Long, Long)].collect().sorted
    assert(got === Seq((1L, 100L), (1L, 101L), (2L, 101L), (3L, 101L), (4L, 103L)))
  }

  // ---- scd2 ----

  test("scd2: versioned validity chains per key, open-ended current version") {
    val changes = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-02 10:00:00")),
      (3L, "A", ts("2024-01-03 10:00:00")),
      (4L, "B", ts("2024-01-05 10:00:00"))
    ).toDF("change_id", "k", "t")
    val out = Joins.scd2(changes, Seq("k"), "t")
      .select("change_id", "valid_from", "valid_to")
      .as[(Long, Timestamp, Option[Timestamp])].collect().sortBy(_._1)
    assert(out.map(_._2) === Seq(
      ts("2024-01-01 10:00:00"), ts("2024-01-02 10:00:00"),
      ts("2024-01-03 10:00:00"), ts("2024-01-05 10:00:00")))
    assert(out.map(_._3) === Seq(
      Some(ts("2024-01-02 10:00:00")), Some(ts("2024-01-03 10:00:00")),
      None, None)) // each key's last version is open
    intercept[IllegalArgumentException] { Joins.scd2(changes, Seq.empty, "t") }
    intercept[IllegalArgumentException] {
      Joins.scd2(changes.withColumnRenamed("change_id", "valid_to"), Seq("k"), "t")
    }
  }

  test("composition: scd2 + rangeJoin point-in-time lookup == asofJoin, randomized") {
    // the documented composition: version the dimension with scd2, cap
    // open validity, range-join facts into versions — for a keyed
    // dimension this must agree with the as-of join against the raw
    // change events (same key, backward, inclusive)
    val rnd = new scala.util.Random(21)
    val changes = Seq.tabulate(30)(i =>
      (1000L + i, s"k${rnd.nextInt(3)}", rnd.nextInt(50).toLong))
      .distinctBy(r => (r._2, r._3)) // scd2 needs unique (key, ts)
      .toDF("ver_id", "k", "vts")
    val facts = Seq.tabulate(50)(i =>
      (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(60).toLong))
      .toDF("fid", "k", "fts")

    val viaAsof = Joins.asofJoin(facts, changes, Seq("k"), "fts", "vts",
        tieBreak = Some("ver_id"), joinType = "inner")
      .select("fid", "ver_id").as[(Long, Long)].collect().sorted

    // cap the open version at the DATA HORIZON (max fact ts + 1), not a
    // sentinel max — a near-infinite interval would explode to millions
    // of bins, which is precisely what maxBinsPerInterval fails loudly on
    val versions = Joins.scd2(changes, Seq("k"), "vts")
      .withColumn("valid_to_capped", coalesce(col("valid_to"), lit(61L)))
    // per-key point-in-time: range-join on validity then keep the key match
    val viaRange = Joins.rangeJoin(
        facts, "fts",
        versions.select(col("ver_id"), col("k").as("vk"),
          col("valid_from"), col("valid_to_capped")),
        "valid_from", "valid_to_capped", binWidth = 16)
      .filter(col("k") === col("vk"))
      .select("fid", "ver_id").as[(Long, Long)].collect().sorted

    assert(viaRange === viaAsof && viaAsof.nonEmpty)
  }

  // ---- withGlobalIndex ----

  test("withGlobalIndex equals row_number over the total order") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("k", pmod(col("id") * 2654435761L, lit(1000)))
    val got = TrainingOrder.withGlobalIndex(df, Seq("k", "id"), numPartitions = Some(7))
      .select("id", "global_idx").as[(Long, Long)].collect().toMap
    val expected = df.select(col("id"), row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("asofJoin matches brute-force argmax on randomized inputs (ties forced)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // tiny key/ts domains force equal-ts ties, empty keys, and
      // left-before-any-right cases
      val l = Seq.tabulate(60)(i =>
        (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(20).toLong))
        .toDF("lid", "k", "lts")
      val r = Seq.tabulate(40)(i =>
        (1000L + i, s"k${rnd.nextInt(6)}", rnd.nextInt(20).toLong, rnd.nextDouble()))
        .toDF("rid", "k", "rts", "payload")
      for (dir <- Seq("backward", "forward")) {
        val got = Joins.asofJoin(l, r, Seq("k"), "lts", "rts",
            direction = dir, tieBreak = Some("rid"))
          .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
        // brute force: per left row, the extreme qualifying right row.
        // backward: max (rts, rid); forward: min (rts, rid) — encoded as
        // max of (-rts, -rid) so one max_by spelling serves both.
        val sign = if (dir == "backward") 1L else -1L
        val expected = l.join(r, Seq("k"), "left")
          .filter(if (dir == "backward") col("rts") <= col("lts")
                  else col("rts") >= col("lts"))
          .groupBy("lid")
          .agg(max(struct((col("rts") * sign).as("o1"), (col("rid") * sign).as("o2")))
            .as("best"))
          .select(col("lid"), (col("best")("o2") * sign).as("rid"))
          .as[(Long, Long)].collect().toMap
        val lids = l.select("lid").as[Long].collect()
        for (lid <- lids) {
          assert(got(lid) === expected.get(lid),
            s"trial=$trial dir=$dir lid=$lid")
        }
      }
    }
  }

  test("asofJoinBroadcast equals asofJoin on randomized inputs, all arms") {
    val rnd = new scala.util.Random(13)
    val l = Seq.tabulate(60)(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(20).toLong))
      .toDF("lid", "k", "lts")
    val r = Seq.tabulate(40)(i =>
      (1000L + i, s"k${rnd.nextInt(6)}", rnd.nextInt(20).toLong, rnd.nextDouble()))
      .toDF("rid", "k", "rts", "payload")
    for {
      dir <- Seq("backward", "forward")
      jt <- Seq("left", "inner")
      tol <- Seq(None, Some(lit(3L)))
    } {
      val a = Joins.asofJoin(l, r, Seq("k"), "lts", "rts",
          direction = dir, tolerance = tol, joinType = jt, tieBreak = Some("rid"))
        .select("lid", "rid", "payload")
        .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
      val b = Joins.asofJoinBroadcast(l, r, Seq("k"), "lts", "rts",
          direction = dir, tolerance = tol, joinType = jt, tieBreak = Some("rid"))
        .select("lid", "rid", "payload")
        .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
      assert(a === b, s"dir=$dir joinType=$jt tol=${tol.isDefined}")
    }
  }

  test("asofJoinBroadcast runs on a memory stream (stream-static temporal join)") {
    implicit val ctx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    stream.addData((1L, "A", 10L), (2L, "A", 3L), (3L, "B", 7L))
    val dim = Seq(
      (100L, "A", 5L, "v1"), (101L, "A", 9L, "v2"), (102L, "B", 8L, "w1"))
      .toDF("rid", "k", "rts", "ver")
    val q = Joins.asofJoinBroadcast(
        stream.toDF().toDF("lid", "k", "lts"), dim,
        Seq("k"), "lts", "rts", tieBreak = Some("rid"))
      .select("lid", "rid", "ver")
      .writeStream.format("memory").queryName("asof_bcast").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("asof_bcast")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(got === Set(
      (1L, Some(101L), Some("v2")), // latest A version at ts 10
      (2L, None, None),             // before any A version
      (3L, None, None)))            // B's only version is later
  }

  test("rangeJoin and overlapJoin match brute force on randomized intervals") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(80)(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("pid", "x")
    val ivs = Seq.tabulate(50) { i =>
      val s = rnd.nextInt(100).toLong
      (500L + i, s, s + rnd.nextInt(12).toLong) // includes empty intervals
    }.toDF("iid", "s", "e")
    val ivs2 = Seq.tabulate(50) { i =>
      val s = rnd.nextInt(100).toLong
      (900L + i, s, s + rnd.nextInt(9).toLong)
    }.toDF("jid", "s2", "e2")

    val expectedR = pts.join(ivs)
      .filter(col("x") >= col("s") && col("x") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    val expectedO = ivs.join(ivs2)
      .filter(greatest(col("s"), col("s2")) < least(col("e"), col("e2")))
      .select("iid", "jid").as[(Long, Long)].collect().sorted
    for (w <- Seq(1L, 5L, 13L, 64L)) {
      val gotR = Joins.rangeJoin(pts, "x", ivs, "s", "e", binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted
      assert(gotR === expectedR, s"rangeJoin binWidth=$w")
      val gotO = Joins.overlapJoin(ivs, "s", "e", ivs2, "s2", "e2", binWidth = w)
        .select("iid", "jid").as[(Long, Long)].collect().sorted
      assert(gotO === expectedO, s"overlapJoin binWidth=$w")
    }
  }

  test("asofJoinSkew: value parity on a 90%-one-key fixture, all arms") {
    val rnd = new scala.util.Random(7)
    // one key ("HOT") carries 90% of probes and a deep history
    val l = (1 to 300).map { i =>
      val k = if (i % 10 != 0) "HOT" else s"k${i % 7}"
      (i.toLong, k, (rnd.nextInt(1000)).toLong)
    }.toDF("lid", "k", "lts")
    val r = (1 to 120).map { i =>
      val k = if (i % 5 != 0) "HOT" else s"k${i % 7}"
      (i.toLong, k, (rnd.nextInt(1000)).toLong, rnd.nextDouble())
    }.toDF("rid", "k", "rts", "v")
    for (dir <- Seq("backward", "forward"); jt <- Seq("left", "inner")) {
      val plain = Joins.asofJoin(l, r, Seq("k"), "lts", "rts",
          direction = dir, joinType = jt, tieBreak = Some("rid"))
        .select("lid", "rid").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
      val skew = Joins.asofJoinSkew(l, r, Seq("k"), "lts", "rts",
          direction = dir, joinType = jt, tieBreak = Some("rid"),
          hotKeyCount = 50)
        .select("lid", "rid").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
      assert(skew === plain, s"direction=$dir joinType=$jt")
    }
  }

  test("asofJoinSkew plan: hot keys are anti-joined away from the window arm") {
    val l = (1 to 200).map(i => (i.toLong, if (i % 10 != 0) "HOT" else "cold",
      i.toLong)).toDF("lid", "k", "lts")
    val r = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "HOT" else "cold",
      i.toLong, i * 1.0)).toDF("rid", "k", "rts", "v")
    val out = Joins.asofJoinSkew(l, r, Seq("k"), "lts", "rts",
      hotKeyCount = 50, tieBreak = Some("rid"))
    val plan = out.queryExecution.executedPlan.toString
    // structural proof no task receives the full hot-key partition: the
    // cold window's input passes a broadcast LeftAnti against the
    // hot-key set, and the hot arm windows over (key, __skewsalt) — the
    // hot key's probes shuffle across saltN sub-partitions
    assert(plan.contains("Window"), plan.take(3000))
    assert(plan.contains("LeftAnti"), plan.take(3000))
    assert(plan.contains("LeftSemi"), plan.take(3000))
    assert(plan.contains("__skewsalt"), plan.take(3000))
    assert("hashpartitioning\\(k#\\d+, __skewsalt".r.findFirstIn(plan).isDefined,
      plan.take(3000))
    // with the threshold above every key count, it degrades to pure window
    val noHot = Joins.asofJoinSkew(l, r, Seq("k"), "lts", "rts",
      hotKeyCount = 100000, tieBreak = Some("rid"))
    val plainRows = Joins.asofJoin(l, r, Seq("k"), "lts", "rts",
      tieBreak = Some("rid")).select("lid", "rid")
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(noHot.select("lid", "rid").as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq === plainRows)
  }

  test("asofJoin: NULL timestamps never match, both arms agree") {
    // right rows with NULL ts would otherwise sort nulls-first and be
    // returned as a backward "match"; left rows with NULL ts have no
    // timeline position and keep their place unmatched (left join)
    val l = Seq((1L, "A", Option(ts("2024-01-01 10:00:05"))),
      (2L, "A", Option.empty[Timestamp])).toDF("lid", "k", "lts")
    val r = Seq((10L, "A", Option.empty[Timestamp], 1.0),
      (11L, "A", Option(ts("2024-01-01 10:00:01")), 2.0))
      .toDF("rid", "k", "rts", "v")
    for (dir <- Seq("backward", "forward")) {
      val a = Joins.asofJoin(l, r, Seq("k"), "lts", "rts", direction = dir,
          tieBreak = Some("rid"))
        .select("lid", "rid").as[(Long, Option[Long])].collect().sortBy(_._1)
      val b = Joins.asofJoinBroadcast(l, r, Seq("k"), "lts", "rts",
          direction = dir, tieBreak = Some("rid"))
        .select("lid", "rid").as[(Long, Option[Long])].collect().sortBy(_._1)
      assert(a === b, s"arms diverge on NULL ts, direction=$dir")
      val expected =
        if (dir == "backward") Seq((1L, Some(11L)), (2L, None))
        else Seq((1L, None), (2L, None))
      assert(a === expected, s"direction=$dir")
    }
  }

  test("withGlobalIndex: empty input, single row, and name guard") {
    val empty = spark.range(0).toDF("id")
    assert(TrainingOrder.withGlobalIndex(empty, Seq("id")).count() === 0)
    val one = TrainingOrder.withGlobalIndex(spark.range(1).toDF("id"), Seq("id"))
      .select("global_idx").as[Long].collect()
    assert(one === Seq(1L))
    intercept[IllegalArgumentException] {
      TrainingOrder.withGlobalIndex(
        spark.range(3).toDF("global_idx"), Seq("global_idx"))
    }
  }

  test("bloomSemiJoin equals the plain semi join, including nulls and misses") {
    val rnd = new scala.util.Random(29)
    val left = (0 until 500).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(10)))
      .map { case (k, v) => (if (k == 0) null.asInstanceOf[java.lang.Long] else Long.box(k), v) }
      .toDF("k", "v")
    val right = (0 until 40).map(_ => Long.box(rnd.nextInt(300).toLong)).toDF("rk")
    val got = Joins.bloomSemiJoin(left, right, "k", "rk")
      .select("k", "v").as[(Option[Long], Int)].collect().sorted.toSeq
    val want = left.join(right, col("k") === col("rk"), "left_semi")
      .select("k", "v").as[(Option[Long], Int)].collect().sorted.toSeq
    assert(got === want)
    // empty right side: nothing matches (null bloom short-circuit)
    assert(Joins.bloomSemiJoin(left, right.limit(0), "k", "rk").count() === 0L)
  }
}
