package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event-stream operators, written once for batch AND Structured
 * Streaming: the same plan runs over a parquet table or a `readStream`
 * source (with a watermark attached for state cleanup).
 */
object Events {

  /**
   * Read an events parquet whose `ts` column may be TIMESTAMP(NANOS) —
   * a physical type Spark refuses by default. Nanos are read as raw longs
   * (legacy conf) and truncated to microsecond timestamps, matching what
   * engines with native nanos support (DuckDB's `::TIMESTAMP`) produce.
   *
   * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, which
   * graft.GraftSession sets as a session default (the scan captures conf
   * at planning time, so an operator-level set-and-restore would break
   * lazy execution — and operators must not mutate shared session conf).
   * Fails fast with that instruction on a session missing the flag.
   */
  def readEventsParquet(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "readEventsParquet needs spark.sql.legacy.parquet.nanosAsLong=true at " +
        "session build time (a GraftSession default) to read TIMESTAMP(NANOS) parquet")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // FLOOR division, not `div` (which truncates toward zero): a
        // pre-epoch nanosecond count that is not a multiple of 1000 must
        // round DOWN to match DuckDB's ::TIMESTAMP floor semantics.
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000 + (CASE WHEN ts % 1000 < 0 THEN -1 ELSE 0 END)")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // TIMESTAMP(MICROS) with isAdjustedToUTC=false arrives as NTZ;
        // the session runs UTC (a GraftSession default), so the cast is
        // wall-clock-preserving and lands on the same epoch micros the
        // oracle's naive-timestamp reading produces. Downstream window /
        // unix_micros operators need the zoned type.
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /**
   * Tumbling-window aggregation per event type: event count and value sum
   * per (window, event_type).
   *
   * Streaming mode: pass `watermark` so Spark can close windows and bound
   * state; output mode `append` emits each window once it is final.
   * Batch mode: same code, watermark omitted/ignored.
   */
  def windowedAgg(
    events: DataFrame,
    windowDuration: String = "5 minutes",
    watermark: Option[String] = None,
    slide: Option[String] = None
  ): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      // slide < duration = SLIDING windows: each event lands in
      // duration/slide overlapping windows (Spark's window() replicates
      // the row per covered window — the same explode a hand-rolled
      // spelling would pay, with watermark/streaming semantics intact)
      .groupBy(window(col("ts"), windowDuration,
        slide.getOrElse(windowDuration)), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value")
      )
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("total_value")
      )
  }

  /**
   * Gap-based sessionization, batch form: fully relational, no per-group
   * state. A session break is an event whose gap to the previous event of
   * the same user exceeds `gapMillis` (lag window), and a running sum of
   * breaks assigns the session sequence — then one aggregation per
   * (user, session).
   *
   * This is the 100-TB batch shape: two window passes + one aggregation
   * over the same (user_id, ts) sort order — one shuffle on user_id total,
   * whole-stage codegen'd, and spill-safe where a collect-the-group
   * approach (see [[sessionize]]) would hold a power user's entire history
   * in memory.
   */
  def sessionizeBatch(events: DataFrame, gapMillis: Long = 30 * 60 * 1000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn(
        "is_break",
        when(
          col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapMillis * 1000L,
          1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_break")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .drop("session_seq")
  }

  /** One user event (typed view of the events table). */
  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  /** A closed activity session. */
  final case class Session(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double
  )

  /** Open-session accumulator (public: the state encoder's generated code
    * must construct it). */
  final case class SessionAcc(start: Long, end: Long, n: Long, total: Double)

  /**
   * Streaming exact deduplication: one output row per key within the
   * watermark horizon. `dropDuplicatesWithinWatermark` keeps state only
   * until the watermark passes a key's event time, so state is bounded by
   * the lateness budget instead of growing with the stream — the shape a
   * training-data ingest pipeline needs for at-least-once upstreams.
   *
   * Semantics note: streaming dedup is WATERMARK-SCOPED — two same-key
   * events farther apart than the watermark horizon both survive (the
   * first copy's state was already evicted). The batch path is a plain
   * GLOBAL dedup; the two agree only when duplicates arrive within the
   * horizon.
   */
  def dedupStream(
    events: DataFrame,
    keyCols: Seq[String],
    eventTimeCol: String = "ts",
    watermark: String = "10 minutes"
  ): DataFrame = {
    val wm = events.withWatermark(eventTimeCol, watermark)
    if (events.isStreaming) wm.dropDuplicatesWithinWatermark(keyCols)
    else wm.dropDuplicates(keyCols)
  }

  /**
   * Streaming gap sessionization with explicit state and event-time
   * timeouts: a user's open session lives in `GroupState` ACROSS
   * micro-batches and closes only when the watermark passes its gap
   * deadline — so a session spanning micro-batches stays one session,
   * which the batch-oriented [[sessionize]] (close-at-end-of-input) would
   * split. Requires a watermark on the event-time column upstream.
   *
   * Scale shape: one hash shuffle on user_id; state is O(open sessions)
   * and bounded by the watermark.
   */
  def sessionizeStream(
    events: Dataset[Event],
    gapMillis: Long = 30 * 60 * 1000L
  ): Dataset[Session] = {
    import events.sparkSession.implicits._

    def close(userId: Long, acc: SessionAcc): Session =
      Session(userId, new Timestamp(acc.start), new Timestamp(acc.end), acc.n, acc.total)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (userId: Long, it: Iterator[Event], state: GroupState[SessionAcc]) =>
        if (state.hasTimedOut) {
          // watermark passed the gap deadline: the open session is final
          val closed = close(userId, state.get)
          state.remove()
          Iterator.single(closed)
        } else {
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val out = Seq.newBuilder[Session]
          var acc = state.getOption.orNull
          sorted.foreach { e =>
            val t = e.ts.getTime
            acc match {
              case null =>
                acc = SessionAcc(t, t, 1L, e.value)
              case a if t - a.end > gapMillis =>
                out += close(userId, a)
                acc = SessionAcc(t, t, 1L, e.value)
              case a =>
                acc = SessionAcc(a.start, math.max(a.end, t), a.n + 1, a.total + e.value)
            }
          }
          if (acc != null) {
            state.update(acc)
            state.setTimeoutTimestamp(acc.end + gapMillis)
          }
          out.result().iterator
        }
      }
  }

  /**
   * Gap-based sessionization with explicit state
   * (`flatMapGroupsWithState`), batch semantics: each group is processed
   * in one pass and sessions close at end of input. For a live stream use
   * [[sessionizeStream]] (event-time timeouts); for large batch jobs
   * prefer the relational [[sessionizeBatch]].
   *
   * Scale shape: one hash shuffle on user_id; state is O(active users).
   */
  def sessionize(
    events: Dataset[Event],
    gapMillis: Long = 30 * 60 * 1000L
  ): Dataset[Session] = {
    import events.sparkSession.implicits._

    def close(userId: Long, acc: SessionAcc): Session =
      Session(userId, new Timestamp(acc.start), new Timestamp(acc.end), acc.n, acc.total)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (userId: Long, it: Iterator[Event], state: GroupState[SessionAcc]) =>
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        val out = Seq.newBuilder[Session]
        var acc = state.getOption.orNull
        sorted.foreach { e =>
          val t = e.ts.getTime
          acc match {
            case null =>
              acc = SessionAcc(t, t, 1L, e.value)
            case a if t - a.end > gapMillis =>
              out += close(userId, a)
              acc = SessionAcc(t, t, 1L, e.value)
            case a =>
              acc = SessionAcc(a.start, math.max(a.end, t), a.n + 1, a.total + e.value)
          }
        }
        if (acc != null) {
          // batch mode: no more input will come for this user — close out.
          // (A streaming deployment would keep state and close on timeout.)
          out += close(userId, acc)
          state.remove()
        }
        out.result().iterator
      }
  }

  /**
   * Ordered-funnel analysis: per user, the earliest completion of the
   * ordered `steps` sequence — step i's timestamp is the MIN ts of a
   * step-i event at-or-after step i−1's chosen timestamp (the greedy
   * earliest rule, which finds a completion iff ANY assignment of
   * events to steps exists; the standard exchange argument). One row
   * per user who reached step 1: `user_id, t_1..t_k` (null from the
   * first unreached step), `steps_completed`, `converted`.
   *
   * Scale shape: NO per-user event collection and no state machine —
   * the corpus scans once per step through a min-aggregation keyed by
   * user, and the running per-user frontier (one row per qualifying
   * user, k timestamps wide) joins back user-keyed each round. Every
   * shuffle is on `userCol`; the event table is filtered to the step's
   * type before it moves. k is the funnel length (small); a power user
   * with millions of events costs the same as anyone else per pass.
   */
  /** @param within optional conversion window (an interval Column):
    *   every later step must land at or before `t_1 + within` —
    *   measured from the user's chosen (earliest) first-step event, the
    *   first-touch convention. A user whose earliest entry stalls does
    *   NOT get re-anchored to a later entry; document-simple and
    *   deterministic rather than exhaustively searching anchors. */
  def funnel(
    events: DataFrame,
    steps: Seq[String],
    userCol: String = "user_id",
    typeCol: String = "event_type",
    tsCol: String = "ts",
    within: Option[Column] = None
  ): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps: $steps")
    require(steps.distinct.size == steps.size, s"duplicate steps in $steps")
    val ev = events.select(
      col(userCol).as("user_id"), col(typeCol).as("__t"), col(tsCol).as("__ts"))
    var acc = ev.filter(col("__t") === steps.head)
      .groupBy("user_id").agg(min(col("__ts")).as("t_1"))
    for (i <- 2 to steps.size) {
      val inWindow = within.fold(lit(true))(w => col("__ts") <= col("t_1") + w)
      val prevCols =
        if (i == 2) Seq(col("user_id"), col("t_1"))
        else Seq(col("user_id"), col("t_1"), col(s"t_${i - 1}"))
      val next = ev.filter(col("__t") === steps(i - 1))
        .join(acc.select(prevCols: _*), "user_id")
        .filter(col("__ts") >= col(s"t_${i - 1}") && inWindow)
        .groupBy("user_id").agg(min(col("__ts")).as(s"t_$i"))
      acc = acc.join(next, Seq("user_id"), "left")
    }
    val completed = (2 to steps.size)
      .map(i => col(s"t_$i").isNotNull.cast("int"))
      .foldLeft(lit(1))(_ + _)
    acc
      .withColumn("steps_completed", completed)
      .withColumn("converted",
        (col("steps_completed") === steps.size).cast("int"))
  }

  /**
   * Watermarked STREAM-STREAM interval join — the live analogue of
   * [[graft.operators.Joins.rangeJoin]]: each left event pairs with the
   * right events sharing its `on` keys whose timestamp lies in
   * `[leftTs − lookback, leftTs + lookahead]` (inclusive both ends).
   * Output = `on` keys + left payload + right payload (right
   * null-extended under `leftOuter`).
   *
   * Both sides carry the SAME event-time watermark and the join
   * condition carries the explicit time range — exactly the two things
   * Structured Streaming needs to bound join state: buffered rows are
   * evicted once the watermark passes their end of the range, so state
   * is O(rate × (watermark + range)), not O(stream). `leftOuter` also
   * works (Spark emits null-extended rows when the watermark proves no
   * match can arrive); `full`/`right` outer follow the same recipe but
   * are not exposed until a gate needs them.
   *
   * The SAME code runs in batch (withWatermark is a no-op there), so
   * StreamingSpec pins the MemoryStream arm row-for-row against this
   * function's own batch run — and the batch run against the
   * definitional inequality join.
   */
  def joinStreams(
    left: DataFrame,
    right: DataFrame,
    on: Seq[String],
    leftTs: String,
    rightTs: String,
    lookback: String = "10 minutes",
    lookahead: String = "0 seconds",
    watermark: String = "10 minutes",
    joinType: String = "inner"
  ): DataFrame = {
    require(on.nonEmpty, "joinStreams needs at least one equality key")
    require(Set("inner", "leftOuter")(joinType),
      s"joinType must be inner|leftOuter: '$joinType'")
    val lPayload = left.columns.filterNot(on.contains).toSeq
    val rPayload = right.columns.filterNot(on.contains).toSeq
    val overlap = rPayload.filter(c => lPayload.exists(_.equalsIgnoreCase(c)))
    require(overlap.isEmpty,
      s"right column(s) ${overlap.mkString(", ")} collide with left " +
        "columns — rename one side before joining")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val keyCond = on.map(k => l(k) === r(k)).reduce(_ && _)
    val range =
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL '$lookback'") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL '$lookahead'")
    l.join(r, keyCond && range, joinType)
      .select((on.map(l(_)) ++ lPayload.map(l(_)) ++ rPayload.map(r(_))): _*)
  }

  /**
   * Cohort retention: users cohort by the period of their FIRST event
   * (`cohort_period` = floor(first ts / periodMicros)), and the matrix
   * counts distinct users active in each later period —
   * `(cohort_period, period_offset, n_users)`, offset 0 = the cohort's
   * own period (so offset-0 n_users is the cohort size).
   *
   * Periods are exact integer indexes of `periodMicros`-wide epoch
   * buckets (floor division in exact arithmetic), not calendar months —
   * engine-portable and timezone-free. Scale shape: one shuffle on the
   * user for first-event minimums, the events re-join user-keyed (same
   * key, no extra exchange pattern), then a distinct + count on the
   * (cohort, offset) pair — all standard aggregations, no per-user
   * history collection.
   */
  def retention(
    events: DataFrame,
    userCol: String = "user_id",
    tsCol: String = "ts",
    periodMicros: Long = 7L * 24 * 3600 * 1000000
  ): DataFrame = {
    require(periodMicros > 0, s"periodMicros must be positive: $periodMicros")
    val key = graft.operators.Joins.keyOf(
      col(tsCol), events.schema(tsCol).dataType)
    val p = graft.operators.Joins.floorDivExact(key, periodMicros)
    val ev = events.select(col(userCol).as("user_id"), p.as("__p"))
    val firsts = ev.groupBy("user_id").agg(min(col("__p")).as("cohort_period"))
    ev.join(firsts, "user_id")
      .select(col("user_id"), col("cohort_period"),
        (col("__p") - col("cohort_period")).as("period_offset"))
      .distinct()
      .groupBy("cohort_period", "period_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * Per-key time-series RESAMPLING with gap fill: one row per
   * `intervalMicros`-wide epoch bucket from each key's first to last
   * observed bucket, carrying the bucket's event count and value sum
   * plus a forward-filled "last observed value" across gaps — the
   * regular-grid view every downstream rate/trend computation wants,
   * without per-key driver loops.
   *
   * Output: (key, bucket_start timestamp, n_events, value_sum,
   * last_value, is_gap). `last_value` is the value of the latest event
   * at-or-before the bucket (ties broken by `orderCol`, then forward
   * filled); empty buckets have n_events 0 / value_sum 0 / is_gap true.
   *
   * Scale shape: ONE shuffle on (key, bucket) aggregates count, sum and
   * the deterministic per-bucket last value (max_by over the (ts,
   * orderCol) struct — partial-aggregated, no per-bucket collection);
   * per-key bucket spans re-aggregate from THAT result (tiny); the grid
   * is a generator-side `sequence` explode (no shuffle — bounded by
   * span/interval per key, callers pick the interval); the fill is one
   * `last(_, ignoreNulls)` window pass per key. No driver loop, no
   * cartesian, grid rows ∝ output.
   */
  def resample(
    events: DataFrame,
    intervalMicros: Long,
    keyCol: String = "user_id",
    tsCol: String = "ts",
    valueCol: String = "value",
    orderCol: String = "event_id"
  ): DataFrame = {
    require(intervalMicros > 0, s"intervalMicros must be positive: $intervalMicros")
    val key = graft.operators.Joins.keyOf(col(tsCol), events.schema(tsCol).dataType)
    val bucket = graft.operators.Joins.floorDivExact(key, intervalMicros)
    val ev = events.select(col(keyCol).as("__k"), bucket.as("__b"),
      key.as("__ts"), col(orderCol).as("__o"), col(valueCol).as("__v"))

    val perBucket = ev.groupBy("__k", "__b").agg(
      count(lit(1)).as("n_events"),
      sum(col("__v")).as("value_sum"),
      max_by(col("__v"), struct(col("__ts"), col("__o"))).as("__last"))

    val grid = perBucket.groupBy("__k")
      .agg(min(col("__b")).as("__mn"), max(col("__b")).as("__mx"))
      .select(col("__k"), explode(sequence(col("__mn"), col("__mx"))).as("__b"))

    val filled = grid.join(perBucket, Seq("__k", "__b"), "left")
      .withColumn("__ffill",
        last(col("__last"), ignoreNulls = true)
          .over(Window.partitionBy("__k").orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    filled.select(
      col("__k").as(keyCol),
      timestamp_micros(col("__b") * intervalMicros).as("bucket_start"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      coalesce(col("value_sum"), lit(0.0)).as("value_sum"),
      col("__ffill").as("last_value"),
      col("n_events").isNull.as("is_gap"))
  }

  /**
   * Per-event TRAILING-window aggregates: for every event, the count,
   * sum and mean of `valueCol` over the same key's events in
   * `[ts − windowMicros, ts]` (inclusive both ends; simultaneous events
   * are peers and see each other — SQL RANGE-frame semantics on the
   * exact epoch-micros key, so engine-portable and timezone-free).
   *
   * The moving-average / rate-limiter / burst-detection primitive that
   * [[resample]]'s fixed grid can't express (each event gets ITS OWN
   * trailing horizon). Scale shape: ONE shuffle on the key, one sort,
   * one RANGE-frame window pass — Spark evaluates the frame with two
   * moving pointers over the sorted run, O(n) per key, no
   * self-join and no per-event re-scan.
   */
  def rolling(
    events: DataFrame,
    windowMicros: Long,
    keyCol: String = "user_id",
    tsCol: String = "ts",
    valueCol: String = "value",
    idCol: String = "event_id"
  ): DataFrame = {
    require(windowMicros > 0, s"windowMicros must be positive: $windowMicros")
    val key = graft.operators.Joins.keyOf(col(tsCol), events.schema(tsCol).dataType)
    val w = Window.partitionBy(col(keyCol)).orderBy(key)
      .rangeBetween(-windowMicros, 0)
    events.select(
      col(keyCol), col(idCol), col(tsCol),
      count(lit(1)).over(w).as("n_window"),
      sum(col(valueCol)).over(w).as("sum_window"),
      avg(col(valueCol)).over(w).as("avg_window"))
  }

  /**
   * Recency-decayed engagement score per key: each event contributes
   * `value · 2^(−k)` where k is its DISTANCE FROM THE LATEST event in
   * the key's (ts, orderCol) order — half-life of one event. The
   * classic recency-weighted activity feature, spelled with EXACT
   * binary decay: `1 / (1L << k)` is an exact double for k ≤ 62 (and
   * the contribution is exactly 0 beyond — under double ulp anyway),
   * so there is NO libm `pow` in the plan and any engine re-derives
   * the per-event factors bit-for-bit (the §4 portability doctrine;
   * only the final sum order rounds).
   *
   * Scale shape: one key shuffle; the rank window and the sum ride the
   * same partitioning (no second exchange); output is key-sized.
   */
  def decayedScore(
    events: DataFrame,
    keyCol: String = "user_id",
    tsCol: String = "ts",
    valueCol: String = "value",
    orderCol: String = "event_id"
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(orderCol).desc)
    events
      .select(col(keyCol), col(valueCol).cast("double").as("__v"),
        (row_number().over(w) - 1).as("__k"))
      .withColumn("__c",
        when(col("__k") <= 62,
          col("__v") / expr("shiftleft(CAST(1 AS BIGINT), __k)"))
          .otherwise(lit(0.0)))
      .groupBy(col(keyCol))
      .agg(sum(col("__c")).as("decayed_sum"), count(lit(1)).as("n_events"))
  }

  /**
   * First-order event-transition matrix (the Markov-chain / user-flow
   * "Sankey" statistic): for every ordered consecutive pair of events
   * per key — ordered by (ts, orderCol), fully deterministic — the
   * count `n_trans` and the conditional probability
   * P(to | from) = n_trans / Σ_to n_trans.
   *
   * Scale shape: ONE shuffle on the key, one lead() window pass, one
   * map-side-combined (from, to) count; the per-from normalization is
   * a broadcast join of the from-marginal (state-vocabulary-sized).
   * No per-key history collection.
   */
  def transitions(
    events: DataFrame,
    keyCol: String = "user_id",
    tsCol: String = "ts",
    typeCol: String = "event_type",
    orderCol: String = "event_id"
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    val pairs = events
      .select(col(keyCol), col(tsCol), col(orderCol),
        col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n_trans"))
    val marginals = pairs.groupBy("from_type")
      .agg(sum(col("n_trans")).as("__n_from"))
    pairs.join(broadcast(marginals), "from_type")
      .select(col("from_type"), col("to_type"), col("n_trans"),
        (col("n_trans").cast("double") / col("__n_from")).as("prob"))
  }

  /** [[seriesVectors]] `norm` arms: per-key z-score over the grid
    * positions, or unit L2. */
  val ZScoreNorm = "zscore"
  val UnitNorm = "unit"

  /**
   * FIXED-GRID series vectors: per key, `valueCol` summed into
   * `nBuckets` equal `intervalMicros` windows starting at
   * `startMicros` — one dense `array<double>` per key, empty buckets
   * zero-filled, events outside the grid dropped. This is the bridge
   * from the events stream to the vector-similarity family: the output
   * feeds [[graft.operators.Similarity.dtwTopK]] (phase-tolerant),
   * [[graft.operators.Similarity.bruteForceTopK]]/IVF (cosine), or any
   * embedding operator, making "which users/services behave like this
   * one" a similarity search over behavior profiles.
   *
   * Scale shape: ONE hash aggregation over the events — the bucket
   * index is a scan-stage projection and the dense array is `nBuckets`
   * conditional sums inside a single groupBy (no collect_list + sort,
   * no pivot, no per-bucket rows shuffled: the shuffle carries one
   * partial array per (partition, key)). `nBuckets` is bounded (4096)
   * because it is the per-row aggregate width, not a data size.
   *
   * `norm` (opt-in) normalizes each profile ROW-LOCALLY after
   * bucketing — the standard prerequisite for behavior-SHAPE search,
   * where raw magnitudes rank "big users" together regardless of
   * pattern: [[ZScoreNorm]] subtracts the per-key bucket mean and
   * divides by the population std over the `nBuckets` grid positions
   * (zero-filled buckets count — an idle day IS part of the shape;
   * all-constant profiles, σ = 0, map to the zero vector), and
   * [[UnitNorm]] divides by the L2 norm (zero profiles stay zero).
   * Both are post-aggregation projections — same one-shuffle plan.
   */
  def seriesVectors(
    events: DataFrame,
    startMicros: Long,
    intervalMicros: Long,
    nBuckets: Int,
    keyCol: String = "user_id",
    tsCol: String = "ts",
    valueCol: String = "value",
    norm: Option[String] = None
  ): DataFrame = {
    require(intervalMicros > 0, s"intervalMicros must be positive: $intervalMicros")
    require(nBuckets >= 1 && nBuckets <= 4096,
      s"nBuckets must be in [1, 4096] (it is the aggregate width): $nBuckets")
    val key = graft.operators.Joins.keyOf(col(tsCol), events.schema(tsCol).dataType)
    val idx = graft.operators.Joins.floorDivExact(key - lit(startMicros), intervalMicros)
    val base = events
      .select(col(keyCol).as("series_id"), idx.as("__i"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__i") >= 0 && col("__i") < nBuckets)
      .groupBy("series_id")
      .agg(array((0 until nBuckets).map(i =>
        coalesce(sum(when(col("__i") === i, col("__v"))), lit(0.0))): _*)
        .as("series"))
    // stats are staged as their own columns so the per-element lambda
    // references a computed value instead of re-folding the array per
    // element (O(n) per row, not O(n²) at the 4096 width bound)
    norm.fold(base) {
      case ZScoreNorm =>
        base
          .withColumn("__mu",
            aggregate(col("series"), lit(0.0), (a, x) => a + x) / nBuckets)
          .withColumn("__sd",
            sqrt(aggregate(col("series"), lit(0.0),
              (a, x) => a + (x - col("__mu")) * (x - col("__mu"))) / nBuckets))
          .withColumn("series", transform(col("series"),
            x => when(col("__sd") === 0.0, lit(0.0))
              .otherwise((x - col("__mu")) / col("__sd"))))
          .drop("__mu", "__sd")
      case UnitNorm =>
        base
          .withColumn("__nrm",
            sqrt(aggregate(col("series"), lit(0.0), (a, x) => a + x * x)))
          .withColumn("series", transform(col("series"),
            x => when(col("__nrm") === 0.0, lit(0.0))
              .otherwise(x / col("__nrm"))))
          .drop("__nrm")
      case other => throw new IllegalArgumentException(
        s"seriesVectors: unknown norm '$other' (expected " +
          s"$ZScoreNorm or $UnitNorm)")
    }
  }
}
