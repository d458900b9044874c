package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Mergeable cardinality sketches for incremental corpus statistics —
 * the sketch-index sibling of the dedup indexes in [[Dedup]]: a
 * per-group HllSketch (Apache DataSketches, Spark's `hll_sketch_agg`
 * family) is a few KB however many values it saw, unions losslessly,
 * and answers "distinct X per group" WITHOUT rescanning history.
 *
 * The corpus-growth shape this buys at 100 TB: sketch each DROP once
 * (drop-sized scan), persist the per-group sketch table, and fold new
 * drops in with [[merge]] — per-drop cost forever, where an exact
 * `count(DISTINCT …)` re-shuffles the full union every refresh. The
 * estimate's relative standard error is ~1.04/√2^lgConfigK (~1.6% at
 * the default lgConfigK = 12); estimates are DETERMINISTIC for a given
 * input multiset. Merging is lossless at the REGISTER level, but the
 * merged estimate need not equal the direct whole-corpus estimate
 * bit-for-bit: a small drop's sketch may still be in sparse (exact)
 * mode while the direct sketch went dense, and the two states estimate
 * slightly differently — both inside the error band (SketchesSpec pins
 * determinism, the band, and merged-vs-direct agreement within it).
 */
object Sketches {

  /** Per-group distinct-count sketches: `(groupCols…, sketch BINARY)` —
    * the persistable index artifact. One hash shuffle on the group
    * keys; sketches partial-aggregate map-side like any agg. */
  def distinctSketches(
    df: DataFrame,
    groupCols: Seq[String],
    valueCol: String,
    lgConfigK: Int = 12
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))
  }

  /** Union sketch tables (e.g. the persisted index plus a new drop's
    * sketches): same schema in, same schema out, per-group lossless
    * merge. `allowDifferentLgConfigK` accepts mixed precisions (the
    * union downgrades to the coarser). */
  def merge(
    sketchTables: Seq[DataFrame],
    groupCols: Seq[String],
    allowDifferentLgConfigK: Boolean = false
  ): DataFrame = {
    require(sketchTables.nonEmpty, "at least one sketch table required")
    sketchTables.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch"), lit(allowDifferentLgConfigK)).as("sketch"))
  }

  /** Read estimates off a sketch table: `(groupCols…, distinct_est
    * DOUBLE)`. Pure projection — no data pass. */
  def estimate(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.select(
      (groupCols.map(col) :+ hll_sketch_estimate(col("sketch")).as("distinct_est")): _*)

  // ------------------------------------------------ count-min (frequency)

  /** Per-group Count-Min frequency sketches over `valueCol`:
    * `(groupCols…, sketch BINARY)`. Estimates later read off the sketch
    * NEVER undercount and overcount by at most eps·N with probability
    * `confidence` — the one-sided guarantee [[estimateCounts]] exposes.
    * Same index shape as [[distinctSketches]]; merge new drops with
    * [[mergeCms]] (the custom [[graft.functions.CmsUnionAgg]] — Spark
    * ships the builder aggregate but no union). */
  def cmsSketches(
    df: DataFrame,
    groupCols: Seq[String],
    valueCol: String,
    eps: Double = 0.0001,
    confidence: Double = 0.99,
    seed: Int = 77
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    // CountMinSketch hashes the NATIVE type it is fed, but
    // [[estimateCounts]] point-queries with estimateCount(String) — a
    // sketch built over longs would silently answer ~0 for every term.
    // Require the string type up front so the mismatch is a build-time
    // error, not a wrong-answer.
    require(df.schema(valueCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"cmsSketches: valueCol '$valueCol' must be StringType (point queries " +
        s"read back as strings); got ${df.schema(valueCol).dataType.sql} — " +
        "cast it before sketching")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"count_min_sketch(`$valueCol`, ${eps}d, ${confidence}d, $seed)")
        .as("sketch"))
  }

  /** Union CMS tables per group (same (eps, confidence, seed) family —
    * mixed parameters throw, they are a pipeline bug). */
  def mergeCms(sketchTables: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketchTables.nonEmpty, "at least one sketch table required")
    sketchTables.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.CmsUnionAgg(col("sketch")).as("sketch"))
  }

  // ------------------------------------------------- kll (quantiles)

  /** Per-group KLL quantile sketches over `valueCol` (cast to double):
    * `(groupCols…, sketch BINARY)` — the QUANTILE member of the
    * incremental-index family (HLL = distinct, CMS = frequency, KLL =
    * distribution). KB-scale per group at any n; ~1.65% normalized
    * RANK error at the k = 200 default. Same index shape as
    * [[distinctSketches]]; fold new drops in with [[mergeKll]]. Sketch
    * BYTES are not run-deterministic once compaction kicks in
    * (randomized compaction) — the rank-error band is the contract
    * (SketchesSpec pins it; the gate checks the band verdict, the HLL
    * precedent). */
  def quantileSketches(
    df: DataFrame,
    groupCols: Seq[String],
    valueCol: String,
    k: Int = 200
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(k >= 8, s"k must be >= 8: $k")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KllBuildAgg(col(valueCol).cast("double"), k)
        .as("sketch"))
  }

  /** Union KLL tables per group (mixed k downgrades to the coarser —
    * the DataSketches union rule, like HLL's allowDifferentLgConfigK). */
  def mergeKll(sketchTables: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketchTables.nonEmpty, "at least one sketch table required")
    sketchTables.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KllUnionAgg(col("sketch")).as("sketch"))
  }

  /** Quantile-value estimates off a KLL table: one output row per
    * (group, q) — `(groupCols…, q, value_est)`. Group-localized point
    * queries (the [[estimateCounts]] argument: the sketch table is
    * KB-per-group, so it localizes and returns as a local relation).
    * `qs` are normalized ranks in [0, 1]; the estimate is an actual
    * retained input value whose true rank is within ε(k) of q. */
  def estimateQuantiles(
    sketches: DataFrame,
    groupCols: Seq[String],
    qs: Seq[Double]
  ): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    qs.foreach(q => require(q >= 0 && q <= 1, s"quantile out of [0,1]: $q"))
    val spark = sketches.sparkSession
    val rows = sketches
      .select((groupCols.map(col) :+ col("sketch")): _*).collect()
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](rows.length * qs.size)
    for (r <- rows) {
      // a group whose values were all NULL carries a NULL sketch
      // (KllBuildAgg's empty-group convention) — its quantiles are NULL,
      // not an NPE
      val bytes = r.getAs[Array[Byte]]("sketch")
      val sk = if (bytes == null) null
        else org.apache.datasketches.kll.KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(bytes))
      for (q <- qs)
        out.add(org.apache.spark.sql.Row.fromSeq(
          (0 until groupCols.size).map(r.get) ++
            Seq(q, if (sk == null || sk.isEmpty) null else sk.getQuantile(q))))
    }
    val schema = org.apache.spark.sql.types.StructType(
      groupCols.map(g => org.apache.spark.sql.types.StructField(
        g, sketches.schema(g).dataType)) ++ Seq(
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("value_est",
          org.apache.spark.sql.types.DoubleType, nullable = true)))
    spark.createDataFrame(out, schema)
  }

  // ---------------------------------------------- theta (set algebra)

  /** Per-group theta sketches over `valueCol` (must be StringType —
    * the [[cmsSketches]] type-stability rule): `(groupCols…, sketch
    * BINARY)` — the SET-ALGEBRA member of the family: two sketched
    * sets answer union/intersection/difference cardinalities
    * ([[thetaSetOps]]) off the artifacts alone. KMV construction —
    * deterministic for a given input set, exact below ~2^lgK
    * distincts, ~1.6% RSE above at the lgK = 12 default. */
  def thetaSketches(
    df: DataFrame,
    groupCols: Seq[String],
    valueCol: String,
    lgK: Int = 12
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(df.schema(valueCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"thetaSketches: valueCol '$valueCol' must be StringType — cast it " +
        "before sketching (the hash space must be type-stable across drops)")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.ThetaBuildAgg(col(valueCol), lgK).as("sketch"))
  }

  /** Union theta tables per group — fold a new drop into the index. */
  def mergeTheta(sketchTables: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketchTables.nonEmpty, "at least one sketch table required")
    sketchTables.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.ThetaUnionAgg(col("sketch")).as("sketch"))
  }

  /**
   * Set-operation estimates between two per-group theta tables, joined
   * on the group keys: `(groupCols…, union_est, intersect_est,
   * a_not_b_est, b_not_a_est)` — "how many new values does drop B add
   * per group", answered off the KB-scale artifacts (group-localized
   * point computation, the [[estimateCounts]] argument). Groups present
   * on only one side estimate against the empty set.
   */
  def thetaSetOps(
    a: DataFrame,
    b: DataFrame,
    groupCols: Seq[String]
  ): DataFrame = {
    import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches => DsSketches}
    val spark = a.sparkSession
    // a NULL sketch (all-NULL valueCol group) is the empty set — drop
    // it here so the empty-sketch fallback below applies instead of
    // Some(null) reaching Memory.wrap
    def localize(df: DataFrame): Map[Seq[Any], Array[Byte]] =
      df.select((groupCols.map(col) :+ col("sketch")): _*).collect()
        .flatMap(r => Option(r.getAs[Array[Byte]]("sketch"))
          .map((0 until groupCols.size).map(r.get) -> _)).toMap
    val la = localize(a)
    val lb = localize(b)
    def sk(m: Map[Seq[Any], Array[Byte]], k: Seq[Any]): Sketch =
      m.get(k) match {
        case Some(bytes) => Sketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(bytes))
        case None => DsSketches.heapifySketch(
          org.apache.datasketches.memory.Memory.wrap(
            org.apache.datasketches.theta.UpdateSketch.builder().build()
              .compact().toByteArray))
      }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
    for (k <- (la.keySet ++ lb.keySet).toSeq.sortBy(_.mkString("\u0000"))) {
      val sa = sk(la, k)
      val sb = sk(lb, k)
      val u = SetOperation.builder().buildUnion()
      u.union(sa); u.union(sb)
      val inter = SetOperation.builder().buildIntersection()
      inter.intersect(sa); inter.intersect(sb)
      val anb = SetOperation.builder().buildANotB()
      val bna = SetOperation.builder().buildANotB()
      out.add(org.apache.spark.sql.Row.fromSeq(k ++ Seq(
        u.getResult.getEstimate,
        inter.getResult.getEstimate,
        anb.aNotB(sa, sb).getEstimate,
        bna.aNotB(sb, sa).getEstimate)))
    }
    val schema = org.apache.spark.sql.types.StructType(
      groupCols.map(g => org.apache.spark.sql.types.StructField(
        g, a.schema(g).dataType)) ++
        Seq("union_est", "intersect_est", "a_not_b_est", "b_not_a_est").map(
          n => org.apache.spark.sql.types.StructField(
            n, org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(out, schema)
  }

  /** Frequency estimates for `terms` from a CMS table: one output row
    * per (group, term) — `(groupCols…, term, count_est)`. The sketch
    * table is GROUP-sized (KB per group), so it localizes to the driver
    * for the point queries and returns as a local relation — metadata
    * work, the centroid-localization argument. */
  def estimateCounts(
    sketches: DataFrame,
    groupCols: Seq[String],
    terms: Seq[String]
  ): DataFrame = {
    require(terms.nonEmpty, "at least one term required")
    val spark = sketches.sparkSession
    val rows = sketches
      .select((groupCols.map(col) :+ col("sketch")): _*).collect()
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](rows.length * terms.size)
    for (r <- rows) {
      val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("sketch")))
      for (t <- terms)
        out.add(org.apache.spark.sql.Row.fromSeq(
          (0 until groupCols.size).map(r.get) ++ Seq(t, sk.estimateCount(t))))
    }
    val schema = org.apache.spark.sql.types.StructType(
      groupCols.map(g => org.apache.spark.sql.types.StructField(
        g, sketches.schema(g).dataType)) ++ Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("count_est",
          org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(out, schema)
  }
}
