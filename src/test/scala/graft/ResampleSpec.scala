package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.Events

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val Minute = 60L * 1000000L

  test("resample fills gaps, forward-fills last value, hand-computed") {
    val df = Seq(
      // user 1: bucket 0 twice, bucket 1, gap 2-3, bucket 4
      (0L, ts(0), 1L, 1.0),
      (1L, ts(30), 1L, 2.0),
      (2L, ts(100), 1L, 4.0),
      (3L, ts(250), 1L, 7.0),
      // user 2: single bucket
      (4L, ts(95), 2L, 9.0)).toDF("event_id", "ts", "user_id", "value")
    val out = Events.resample(df, Minute)
      .select(col("user_id"), unix_micros(col("bucket_start")).as("bs"),
        col("n_events"), col("value_sum"), col("last_value"), col("is_gap"))
      .as[(Long, Long, Long, Double, Double, Boolean)].collect()
      .map(r => (r._1, r._2 / Minute) -> (r._3, r._4, r._5, r._6)).toMap
    assert(out((1L, 0L)) === ((2L, 3.0, 2.0, false)))
    assert(out((1L, 1L)) === ((1L, 4.0, 4.0, false)))
    assert(out((1L, 2L)) === ((0L, 0.0, 4.0, true)))
    assert(out((1L, 3L)) === ((0L, 0.0, 4.0, true)))
    assert(out((1L, 4L)) === ((1L, 7.0, 7.0, false)))
    assert(out((2L, 1L)) === ((1L, 9.0, 9.0, false)))
    assert(out.size === 6)
  }

  test("per-bucket last value ties break by orderCol, then forward-fills") {
    val df = Seq(
      (10L, ts(5), 1L, 100.0),
      (11L, ts(5), 1L, 200.0), // same ts, higher event_id wins
      (12L, ts(130), 1L, 1.0)).toDF("event_id", "ts", "user_id", "value")
    // bucket 1 is a gap carrying 200.0 forward; buckets 0 and 2 observed
    val byBucket = Events.resample(df, Minute)
      .select(unix_micros(col("bucket_start")).as("b"), col("last_value"))
      .as[(Long, Double)].collect().map(r => r._1 / Minute -> r._2).toMap
    assert(byBucket(0L) === 200.0 && byBucket(1L) === 200.0 && byBucket(2L) === 1.0)
  }

  test("rolling trailing window matches brute force, peers included") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 120L).map { i =>
      (i, ts(rnd.nextInt(600).toLong), (i % 4) + 1L, rnd.nextInt(100).toDouble)
    }
    val df = rows.toDF("event_id", "ts", "user_id", "value")
    val w = 120L * 1000000L // 2 minutes
    val got = Events.rolling(df, w)
      .select(col("event_id"), col("n_window"), col("sum_window"), col("avg_window"))
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    rows.foreach { case (id, t, u, _) =>
      val in = rows.filter { case (_, t2, u2, _) =>
        u2 == u && t2.getTime <= t.getTime && t2.getTime * 1000L >= t.getTime * 1000L - w
      }
      val s = in.map(_._4).sum
      val (n, sm, av) = got(id)
      assert(n === in.size.toLong, s"event $id")
      assert(math.abs(sm - s) < 1e-9 && math.abs(av - s / in.size) < 1e-9)
    }
  }

  test("transition matrix: hand-computed counts and conditional probabilities") {
    val df = Seq(
      (0L, ts(0), 1L, "view"), (1L, ts(10), 1L, "click"), (2L, ts(20), 1L, "buy"),
      (3L, ts(5), 2L, "view"), (4L, ts(15), 2L, "click"), (5L, ts(25), 2L, "view"),
      (6L, ts(1), 3L, "view") // single event: no transition
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.transitions(df)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("view", "click")) === ((2L, 1.0)))
    assert(got(("click", "buy")) === ((1L, 0.5)))
    assert(got(("click", "view")) === ((1L, 0.5)))
    assert(got.size === 3)
  }

  test("transition ordering ties break by orderCol") {
    val df = Seq(
      (10L, ts(5), 1L, "a"), (11L, ts(5), 1L, "b"), (12L, ts(9), 1L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.transitions(df)
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    assert(got === Set(("a", "b"), ("b", "c")))
  }

  test("decayedScore: exact binary decay from the latest event") {
    val df = Seq(
      (0L, ts(10), 1L, 8.0),  // k=2 -> 2.0
      (1L, ts(20), 1L, 4.0),  // k=1 -> 2.0
      (2L, ts(30), 1L, 6.0),  // k=0 -> 6.0
      (3L, ts(5), 2L, 1.0)).toDF("event_id", "ts", "user_id", "value")
    val out = Events.decayedScore(df)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((10.0, 3L)))
    assert(out(2L) === ((1.0, 1L)))
    // ties break by orderCol: same ts, higher event_id is "latest"
    val tied = Seq((5L, ts(1), 3L, 2.0), (6L, ts(1), 3L, 4.0))
      .toDF("event_id", "ts", "user_id", "value")
    val t = Events.decayedScore(tied).as[(Long, Double, Long)].collect().head
    assert(t._2 === 4.0 + 1.0) // id 6 at k=0, id 5 at k=1
  }

  test("interval guard and empty input") {
    val df = Seq.empty[(Long, Timestamp, Long, Double)]
      .toDF("event_id", "ts", "user_id", "value")
    assert(Events.resample(df, Minute).count() === 0L)
    intercept[IllegalArgumentException] {
      Events.resample(df, 0L)
    }
  }
}
