package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Temporal joins Spark's built-in operators don't express directly:
 * as-of join (each left row picks the nearest right row at-or-before /
 * at-or-after its timestamp) and range join (points matched to the
 * intervals containing them).
 *
 * Both are composed from existing relational operators — no custom
 * physical plan needed, because the scalable SPELLING of each is itself
 * relational:
 *
 *  - naive as-of  = inequality join + per-left-row argmax → Spark plans
 *    an O(n·m) BroadcastNestedLoopJoin. The scalable spelling is
 *    union + running-`last` window: ONE hash shuffle on the equality
 *    keys, one sort, zero join nodes (the Flink temporal-join /
 *    pandas merge_asof shape, re-expressed relationally).
 *  - naive range join = inequality theta-join, same nested-loop hazard.
 *    The scalable spelling is bin-and-equi-join: intervals explode to
 *    the fixed-width bins they cover, points map to exactly one bin,
 *    and the match becomes a plain shuffled equi-join + residual
 *    filter that AQE can skew-split like any other.
 */
object Joins {

  /** Long ordering key: timestamps key by epoch micros, numerics by
    * their own (integral) value. */
  private[graft] def keyOf(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case TimestampType    => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case _                => c.cast(LongType)
    }

  /** Exact floor(x / w) at any long magnitude: Column `/` is double
    * division (loses precision past 2^53), but pmod is non-negative so
    * `x - pmod(x, w)` is exactly divisible and the decimal division is
    * exact, including for negative keys. */
  private[graft] def floorDivExact(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))).cast("decimal(38,0)") / lit(w)).cast(LongType)

  /**
   * As-of join: for every `left` row, the single nearest `right` row
   * sharing the `on` equality keys with `rightTs <= leftTs`
   * (`direction = "backward"`, the default) or `rightTs >= leftTs`
   * (`"forward"`). Output columns are `left`'s plus `right`'s non-key
   * payload (null-extended when no right row qualifies); `joinType`
   * `"left"` keeps unmatched left rows, `"inner"` drops them.
   *
   * Physical shape — the reason this exists: the definitional spelling
   * (inequality join + argmax) gives Spark a nested-loop join. Here
   * both sides UNION on (keys, ts, side-tag), one window per key runs
   * `last(rightPayload, ignoreNulls)` over rows-unbounded-preceding in
   * (ts, side) order, and left rows read off the most recent right
   * payload in O(1) per row. Total cost: one hash shuffle on `on` +
   * one sort — the same bill as a plain equi-join, at any corpus size.
   * (Hot equality keys shuffle to one task like any keyed window; use
   * [[asofJoinSkew]] when a single key dominates — it routes hot keys
   * to a salt-chunked window automatically.)
   *
   * Right payload rides in ONE struct so every output column comes from
   * the SAME right row even when payload fields are null (per-column
   * `last(ignoreNulls)` would tear rows apart).
   *
   * Determinism: when several right rows tie on (keys, rightTs), the
   * winner is the greatest `tieBreak` for backward / least for forward;
   * pass a unique right column (an id) or guarantee (keys, rightTs)
   * unique. `tolerance` (a positive interval/long Column matching the
   * ts type) discards matches farther than that from `leftTs`.
   */
  def asofJoin(
    left: DataFrame,
    right: DataFrame,
    on: Seq[String],
    leftTs: String,
    rightTs: String,
    direction: String = "backward",
    tolerance: Option[Column] = None,
    joinType: String = "left",
    tieBreak: Option[String] = None
  ): DataFrame = {
    require(on.nonEmpty, "asofJoin needs at least one equality key")
    require(Set("backward", "forward").contains(direction),
      s"direction must be backward|forward: $direction")
    require(Set("left", "inner").contains(joinType),
      s"joinType must be left|inner: $joinType")
    val rPayload = right.columns.filterNot(on.contains).toSeq
    require(rPayload.contains(rightTs),
      s"rightTs '$rightTs' must be a non-key column of the right side")
    tieBreak.foreach(tb => require(rPayload.contains(tb),
      s"tieBreak '$tb' must be a non-key column of the right side"))
    val lCols = left.columns.toSeq
    val overlap = rPayload.filter(c => lCols.exists(_.equalsIgnoreCase(c)))
    require(overlap.isEmpty,
      s"right payload column(s) ${overlap.mkString(", ")} collide with left " +
        "columns — rename one side before joining")
    Cols.requireAbsent(left, "__ts", "__side", "__r", "__m")

    val backward = direction == "backward"
    // side tag 0 = right, 1 = left: at equal ts the right row sorts first
    // in traversal order, so the comparison is INCLUSIVE (<= / >=).
    val lSide = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        structType(right, rPayload)))
    // NULL-ts right rows can never be a nearest-neighbour (pandas
    // merge_asof rejects NaT keys); dropping them here keeps the two
    // arms and the definitional semantics aligned — otherwise
    // asc_nulls_first would sort a NULL-ts right row before everything
    // and the running-last could return it as a "match".
    val rSide = right
      .filter(col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__r", struct(rPayload.map(col): _*))
      .select((on.map(col) ++ Seq(col("__ts"), col("__side"), col("__r")) ++
        lCols.filterNot(on.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val unioned = lSide.select(
      (on.map(col) ++ Seq(col("__ts"), col("__side"), col("__r")) ++
        lCols.filterNot(on.contains).map(col)): _*)
      .unionByName(rSide)

    // traversal order: backward walks ts ascending (last-seen right row =
    // most recent at-or-before); forward walks descending (= nearest
    // at-or-after). tieBreak ascending/descending so the documented
    // winner is the last traversed among ts ties.
    val tbCols = tieBreak.toSeq.map(tb =>
      if (backward) col("__r")(tb).asc_nulls_first else col("__r")(tb).desc_nulls_first)
    val ord =
      (if (backward) Seq(col("__ts").asc, col("__side").asc)
       else Seq(col("__ts").desc, col("__side").asc)) ++ tbCols
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // A NULL-ts LEFT row has no defined position on the timeline: it
    // keeps its place in the output (left join) but never matches —
    // same rule the broadcast arm's null-propagating fold applies.
    val withMatch = unioned
      .withColumn("__m", when(col("__ts").isNotNull,
        last(col("__r"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)

    val tolFiltered = tolerance match {
      case Some(tol) =>
        val near =
          if (backward) col("__m")(rightTs) >= col("__ts") - tol
          else col("__m")(rightTs) <= col("__ts") + tol
        withMatch.withColumn("__m", when(near, col("__m")))
      case None => withMatch
    }
    val matched =
      if (joinType == "inner") tolFiltered.filter(col("__m").isNotNull)
      else tolFiltered

    matched.select(
      (lCols.map(col) ++ rPayload.map(c => col("__m")(c).as(c))): _*)
  }

  /** StructType over `cols` of `df`, fields nullable (a null-extended
    * match must be able to carry them). */
  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => org.apache.spark.sql.types.StructField(
        c, df.schema(c).dataType, nullable = true)))

  /**
   * As-of join against a DIMENSION-SIZED right side — the Flink
   * temporal-table-join shape, and the arm that runs on STREAMS: the
   * right side collapses to one ordered history array per key
   * (`collect_list` + `array_sort` — each key's full history must fit
   * in a row, so this is for slowly-changing dimensions, not
   * event-sized rights), the join is a broadcast stream-static
   * equi-join on the keys, and the match is a row-local fold over the
   * history — no window, no union, nothing Structured Streaming
   * rejects. Left can be a `readStream`; JoinsSpec pins the streaming
   * arm and value-equality with [[asofJoin]] on every direction/
   * tolerance/joinType combination.
   *
   * Semantics are identical to [[asofJoin]] (inclusive comparison,
   * same tie rule: greatest `tieBreak` backward / least forward —
   * the history sorts by (ts, tieBreak) and the fold keeps the LAST
   * qualifying element backward, FIRST forward).
   */
  def asofJoinBroadcast(
    left: DataFrame,
    right: DataFrame,
    on: Seq[String],
    leftTs: String,
    rightTs: String,
    direction: String = "backward",
    tolerance: Option[Column] = None,
    joinType: String = "left",
    tieBreak: Option[String] = None
  ): DataFrame = {
    require(on.nonEmpty, "asofJoinBroadcast needs at least one equality key")
    require(Set("backward", "forward").contains(direction),
      s"direction must be backward|forward: $direction")
    require(Set("left", "inner").contains(joinType),
      s"joinType must be left|inner: $joinType")
    val rPayload = right.columns.filterNot(on.contains).toSeq
    require(rPayload.contains(rightTs),
      s"rightTs '$rightTs' must be a non-key column of the right side")
    tieBreak.foreach(tb => require(rPayload.contains(tb),
      s"tieBreak '$tb' must be a non-key column of the right side"))
    val lCols = left.columns.toSeq
    val overlap = rPayload.filter(c => lCols.exists(_.equalsIgnoreCase(c)))
    require(overlap.isEmpty,
      s"right payload column(s) ${overlap.mkString(", ")} collide with left " +
        "columns — rename one side before joining")
    Cols.requireAbsent(left, "__hist", "__m")

    // history entries sort by (ts, tieBreak) — the leading sort fields —
    // then carry the payload struct; lexicographic struct order gives
    // exactly the traversal order asofJoin's window uses
    val ordFields = Seq(col(rightTs).as("__ots")) ++
      tieBreak.map(tb => col(tb).as("__otb")).toSeq
    // NULL-ts right rows dropped for the same reason as in [[asofJoin]]:
    // they have no timeline position and must never match.
    val hist = right.filter(col(rightTs).isNotNull).groupBy(on.map(col): _*)
      .agg(array_sort(collect_list(
        struct(ordFields :+ struct(rPayload.map(col): _*).as("__p"): _*)))
        .as("__hist"))

    val backward = direction == "backward"
    val joined = left.join(broadcast(hist), on, "left")
    // fold: keep the LAST qualifying entry (backward) or the FIRST
    // (forward) of the ascending history
    val qualifies = (entry: Column) =>
      if (backward) entry("__ots") <= col(leftTs)
      else entry("__ots") >= col(leftTs)
    // a null __hist (unmatched key under the left join) null-propagates
    // through the fold — exactly the no-match result
    val pick = aggregate(
      col("__hist"),
      lit(null).cast(structType(right, rPayload)),
      (acc, entry) => {
        val take =
          if (backward) qualifies(entry) // later qualifying entries overwrite
          else qualifies(entry) && acc.isNull // first qualifying wins
        when(take, entry("__p")).otherwise(acc)
      })

    val withMatch = joined.withColumn("__m", pick)
    val tolFiltered = tolerance match {
      case Some(tol) =>
        val near =
          if (backward) col("__m")(rightTs) >= col(leftTs) - tol
          else col("__m")(rightTs) <= col(leftTs) + tol
        withMatch.withColumn("__m", when(near, col("__m")))
      case None => withMatch
    }
    val matched =
      if (joinType == "inner") tolFiltered.filter(col("__m").isNotNull)
      else tolFiltered
    matched.select(
      (lCols.map(col) ++ rPayload.map(c => col("__m")(c).as(c))): _*)
  }

  /**
   * SKEW-SAFE as-of join — closes [[asofJoin]]'s documented hot-key
   * hazard (a dominant equality key ships its entire probe set + history
   * to ONE window task). Strategy: one map-side-combined count pass over
   * `left` finds keys with more than `hotKeyCount` probe rows (by
   * construction at most n_left/hotKeyCount keys — metadata-sized);
   * cold keys take the [[asofJoin]] window arm unchanged (filtered
   * through a broadcast anti-join, so hot keys structurally cannot
   * reach its window), while each hot key's probes are CHUNKED by a
   * deterministic row salt and its history replicated to every chunk —
   * the same union + running-last window, but partitioned by
   * (keys, salt), so a hot key's probes spread over `saltN` tasks and
   * NO task ever holds the full hot-key partition. Per-chunk the full
   * history is present, so semantics are value-identical to the
   * unsalted arm (JoinsSpec pins parity on a 90%-one-key fixture and
   * randomized inputs; the gate runs it against the definitional
   * lateral oracle).
   *
   * Why not the [[asofJoinBroadcast]] fold for the hot arm: its
   * per-probe cost is O(|history|) (a linear fold), which goes
   * quadratic exactly in the hot case this arm exists for. The salted
   * window keeps every row O(1) after sort; the price is saltN× history
   * replication through one shuffle — histories are the small side of a
   * skewed as-of by construction (probes dominate), so that's the
   * cheap direction. The salt is a deterministic full-row hash (the
   * [[Skew.saltedJoin]] SPARK-23207 rationale — byte-identical
   * duplicate probe rows share a chunk; add a distinguishing column
   * upstream to spread those).
   */
  def asofJoinSkew(
    left: DataFrame,
    right: DataFrame,
    on: Seq[String],
    leftTs: String,
    rightTs: String,
    direction: String = "backward",
    tolerance: Option[Column] = None,
    joinType: String = "left",
    tieBreak: Option[String] = None,
    hotKeyCount: Long = 4000000L,
    saltN: Int = 16
  ): DataFrame = {
    require(hotKeyCount > 0, s"hotKeyCount must be positive: $hotKeyCount")
    require(saltN > 0, s"saltN must be positive: $saltN")
    Cols.requireAbsent(left, "__n", "__skewsalt")
    Cols.requireAbsent(right, "__skewsalt")
    val hotKeys = broadcast(
      left.groupBy(on.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > hotKeyCount)
        .drop("__n"))
    val cold = asofJoin(
      left.join(hotKeys, on, "left_anti"),
      right.join(hotKeys, on, "left_anti"),
      on, leftTs, rightTs, direction, tolerance, joinType, tieBreak)
    val leftHot = left.join(hotKeys, on, "left_semi")
      .withColumn("__skewsalt", Skew.rowSalt(left, saltN))
    val rightHot = right.join(hotKeys, on, "left_semi")
      .withColumn("__skewsalt", explode(sequence(lit(0), lit(saltN - 1))))
    val hot = asofJoin(
      leftHot, rightHot, on :+ "__skewsalt", leftTs, rightTs,
      direction, tolerance, joinType, tieBreak)
      .drop("__skewsalt")
    cold.unionByName(hot)
  }

  /**
   * Type-2 slowly-changing-dimension build: each key's change events
   * become versioned rows with half-open validity — `validFrom` = the
   * row's own `tsCol`, `validTo` = the key's NEXT change (`lead`), NULL
   * for the current version. One hash shuffle on the keys + one sorted
   * window pass.
   *
   * Composes with the temporal joins above: [[asofJoin]] a fact stream
   * directly against the raw change events, or cap the open `validTo`
   * with a sentinel max-timestamp and [[rangeJoin]] facts into the
   * versions for a point-in-time join. `(keyCols, tsCol)` must be
   * unique per row — two changes in the same instant have no defined
   * order (the same contract as [[TrainingOrder.withGlobalIndex]]).
   */
  def scd2(
    df: DataFrame,
    keyCols: Seq[String],
    tsCol: String,
    validFrom: String = "valid_from",
    validTo: String = "valid_to"
  ): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    Cols.requireAbsent(df, validFrom, validTo)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol).asc)
    df.withColumn(validFrom, col(tsCol))
      .withColumn(validTo, lead(col(tsCol), 1).over(w))
  }

  /**
   * Range (point-in-interval) join: every `points` row paired with every
   * `intervals` row whose half-open [startCol, endCol) contains
   * `pointCol`. Inner join; output = point columns ++ interval columns.
   *
   * Physical shape: each interval explodes to the `binWidth`-wide bins
   * it covers (a `sequence` + explode — bounded by `maxBinsPerInterval`,
   * enforced with `raise_error` so a mis-sized width fails loudly
   * instead of exploding a year-long interval into 10⁶ rows), each
   * point maps to exactly ONE bin, and the match is a plain shuffled
   * equi-join on the bin plus a residual containment filter. No
   * nested-loop join at any size; a point meets an interval through at
   * most one shared bin, so no duplicate pairs and no post-join dedup.
   *
   * `binWidth` is in epoch MICROSECONDS for timestamp columns, in the
   * column's own units for integral columns. Pick it near the typical
   * interval length: per-interval fan-out is len/width + 1 rows, and the
   * join key space (time bins) stays balanced for AQE to split if a hot
   * bin emerges.
   *
   * STREAM-STATIC: with streaming `points` and a static `intervals`
   * table the whole plan is a projection + stream-static equi-join —
   * Structured Streaming runs it unchanged (JoinsSpec pins the
   * MemoryStream arm), e.g. live events tagged against a maintained
   * incident/session window table.
   */
  def rangeJoin(
    points: DataFrame,
    pointCol: String,
    intervals: DataFrame,
    startCol: String,
    endCol: String,
    binWidth: Long,
    maxBinsPerInterval: Int = 4096
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val pCols = points.columns.toSeq
    val iCols = intervals.columns.toSeq
    val overlap = iCols.filter(c => pCols.exists(_.equalsIgnoreCase(c)))
    require(overlap.isEmpty,
      s"interval column(s) ${overlap.mkString(", ")} collide with point " +
        "columns — rename one side before joining")
    Cols.requireAbsent(points, "__bin")
    Cols.requireAbsent(intervals, "__bin", "__b0", "__b1")

    val pDt = points.schema(pointCol).dataType
    val sDt = intervals.schema(startCol).dataType
    val eDt = intervals.schema(endCol).dataType

    val p = points.withColumn("__bin",
      floorDivExact(keyOf(col(pointCol), pDt), binWidth))
    val iv = intervals
      .withColumn("__b0", floorDivExact(keyOf(col(startCol), sDt), binWidth))
      // end is EXCLUSIVE: the last covered bin holds end − 1 unit
      .withColumn("__b1", floorDivExact(keyOf(col(endCol), eDt) - 1, binWidth))
      .withColumn("__b1",
        when(col("__b1") - col("__b0") >= maxBinsPerInterval, raise_error(concat(
          lit(s"rangeJoin: an interval spans more than $maxBinsPerInterval bins " +
            s"of width $binWidth — raise binWidth or maxBinsPerInterval (interval start "),
          col(startCol).cast("string"), lit(")"))))
          .otherwise(col("__b1")))
      .filter(col("__b1") >= col("__b0")) // empty/degenerate intervals match nothing
      .withColumn("__bin", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1")

    p.join(iv, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .select((pCols ++ iCols).map(col): _*)
  }

  /**
   * Interval-overlap join: every (left, right) interval pair whose
   * half-open spans intersect in a NON-EMPTY range —
   * `greatest(start) < least(end)` (that spelling, not the textbook
   * `aS < bE && bS < aE`, so degenerate [x, x) intervals match nothing).
   *
   * Same bin machinery as [[rangeJoin]], plus the standard first-shared-
   * bin dedup: a pair can meet in several bins, so only the instance in
   * bin `floor(max(starts) / width)` survives — each pair emitted
   * exactly once with no distinct/groupBy pass.
   */
  def overlapJoin(
    left: DataFrame,
    leftStart: String,
    leftEnd: String,
    right: DataFrame,
    rightStart: String,
    rightEnd: String,
    binWidth: Long,
    maxBinsPerInterval: Int = 4096
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val overlap = rCols.filter(c => lCols.exists(_.equalsIgnoreCase(c)))
    require(overlap.isEmpty,
      s"right column(s) ${overlap.mkString(", ")} collide with left " +
        "columns — rename one side before joining")
    Cols.requireAbsent(left, "__bin", "__b0", "__b1", "__ks", "__ke")
    Cols.requireAbsent(right, "__bin", "__b0", "__b1", "__ks", "__ke")

    def binned(df: DataFrame, sc: String, ec: String): DataFrame = {
      df.withColumn("__ks", keyOf(col(sc), df.schema(sc).dataType))
        .withColumn("__ke", keyOf(col(ec), df.schema(ec).dataType))
        .withColumn("__b0", floorDivExact(col("__ks"), binWidth))
        .withColumn("__b1", floorDivExact(col("__ke") - 1, binWidth))
        .withColumn("__b1",
          when(col("__b1") - col("__b0") >= maxBinsPerInterval, raise_error(concat(
            lit(s"overlapJoin: an interval spans more than $maxBinsPerInterval " +
              s"bins of width $binWidth — raise binWidth or maxBinsPerInterval " +
              "(interval start "),
            col(sc).cast("string"), lit(")"))))
            .otherwise(col("__b1")))
        .filter(col("__b1") >= col("__b0")) // empty intervals match nothing
        .withColumn("__bin", explode(sequence(col("__b0"), col("__b1"))))
        .drop("__b0", "__b1")
    }

    val l = binned(left, leftStart, leftEnd)
      .withColumnRenamed("__ks", "__lks").withColumnRenamed("__ke", "__lke")
    val r = binned(right, rightStart, rightEnd)
      .withColumnRenamed("__ks", "__rks").withColumnRenamed("__ke", "__rke")

    l.join(r, "__bin")
      // non-empty intersection, compared in shared key space
      .filter(greatest(col("__lks"), col("__rks")) < least(col("__lke"), col("__rke")))
      // first shared bin: exactly one surviving instance per pair
      .filter(col("__bin") === floorDivExact(greatest(col("__lks"), col("__rks")), binWidth))
      .select((lCols ++ rCols).map(col): _*)
  }

  /**
   * Bloom-prefiltered SEMI join: keep `left` rows whose `leftKey`
   * appears in `right.rightKey` — exact results (the bloom's false
   * positives are removed by the exact semi join that follows; false
   * negatives don't exist), but non-matching left rows die IN THE SCAN
   * STAGE, before the exchange. The explicit form of the runtime
   * filtering Catalyst sometimes injects (InjectRuntimeFilter) — for
   * when the selectivity is known and the planner's heuristics aren't
   * taken: a 0.1%-selective semi join shuffles 1000× less left data
   * behind a ~1 MiB broadcast bitmap.
   *
   * The filter is built in ONE distributed aggregation over the right
   * keys (partials OR map-side; one numBits/8-byte row per task), and
   * localized driver-side as a literal — the [[graft.operators
   * .Contamination]] bloom-prefilter discipline generalized to any
   * equi-semi-join. Keys hash through the portable md5_long60 of their
   * string form. An EMPTY right side short-circuits to an empty result.
   */
  def bloomSemiJoin(
    left: DataFrame,
    right: DataFrame,
    leftKey: String,
    rightKey: String,
    expectedItems: Long = graft.functions.BloomExprs.DefaultExpectedItems,
    numBits: Long = graft.functions.BloomExprs.DefaultNumBits
  ): DataFrame = {
    Cols.requireAbsent(left, "__rk")
    val h = (c: Column) => graft.functions.Hashing.md5Long60(c.cast("string"))
    val rightKeys = right.filter(col(rightKey).isNotNull)
      .select(col(rightKey).as("__rk"))
    val bytes = rightKeys
      .agg(graft.functions.BloomExprs.bloomAgg(h(col("__rk")), expectedItems, numBits))
      .head().getAs[Array[Byte]](0)
    if (bytes == null) left.filter(lit(false)) // empty right: nothing matches
    else
      left
        .filter(graft.functions.BloomExprs.mightContain(bytes, h(col(leftKey))))
        .join(rightKeys, col(leftKey) === col("__rk"), "left_semi")
  }
}
