package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/**
 * Deterministic epoch shuffling for training delivery: every epoch is a
 * reproducible pseudo-random permutation of the corpus, expressed as a
 * (shard, shard_pos) assignment rather than a global sort — the form a
 * multi-reader trainer actually consumes (reader r of N takes shards
 * r, r+N, …, reads each in shard_pos order), and the form that scales
 * (one hash shuffle on the shard key; a global ORDER BY at 100 TB is
 * an Exchange-SinglePartition-shaped anti-pattern this module exists
 * to avoid — see [[Sampling.binByTokenBudget]]'s hazard note for the
 * same stance).
 *
 * Determinism contract (the training-reproducibility requirement): the
 * permutation is a pure function of (seed, epoch, id) via the
 * engine-portable 60-bit MD5 primitive the sampling family uses — the
 * same corpus always shuffles the same way at any parallelism, rerun
 * or resubmission, and each epoch's permutation is independent of
 * every other's. Adding documents never reorders existing (shard,
 * relative-order) relationships within an epoch: a new doc splices in
 * where its hash lands, everything else keeps its relative order (the
 * property incremental corpus refreshes need).
 */
object TrainingOrder {

  /** The epoch-seeded 60-bit order key: md5_long60(seed:epoch:id).
    * Uniform on [0, 2^60); engine-portable (DuckDB re-derives it
    * byte-for-byte, see the q_epoch_shuffle oracle). */
  def epochKey(id: Column, epoch: Int, seed: String = "graft"): Column =
    Hashing.md5Long60(
      concat(lit(seed), lit(":"), lit(epoch.toString), lit(":"), id.cast("string")))

  /**
   * Assign every row its epoch-shuffled delivery slot: `shardCol` =
   * key mod `numShards` (uniform, balanced in expectation) and
   * `posCol` = the row's 1-based rank within its shard by (key, id) —
   * id breaks hash collisions, so the permutation is total and
   * deterministic. One row in, one row out; (shard, pos) pairs are
   * unique.
   *
   * Scale shape: ONE hash shuffle on the shard key feeds a per-shard
   * rank window — shards are numerous and balanced by construction, so
   * there is no single-partition hazard and no global sort anywhere in
   * the plan. Compose with [[graft.sources.Archives.writeTarShards]]
   * (repartition by `shardCol`, sort within partitions by `posCol`) to
   * deliver webdataset-style shards in shuffled order.
   */
  def assignShards(
    df: DataFrame,
    idCol: String,
    numShards: Int,
    epoch: Int,
    seed: String = "graft",
    shardCol: String = "shard",
    posCol: String = "shard_pos"
  ): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    Cols.requireAbsent(df, shardCol, posCol, "__to_key")
    val key = epochKey(col(idCol), epoch, seed)
    df.withColumn("__to_key", key)
      .withColumn(shardCol, pmod(col("__to_key"), lit(numShards.toLong)))
      .withColumn(posCol,
        row_number().over(
          Window.partitionBy(col(shardCol))
            .orderBy(col("__to_key"), col(idCol))).cast("long"))
      .drop("__to_key")
  }

  /**
   * Dense 1-based global index in `orderCols` order — the scalable
   * replacement for `row_number() OVER (ORDER BY …)`, whose empty
   * `Window.orderBy` plans an Exchange-SinglePartition (one task sorts
   * the corpus; the anti-pattern [[assignShards]]' scaladoc names).
   *
   * Shape: ONE range shuffle (`repartitionByRange` on `orderCols` —
   * partition i's keys all precede partition i+1's) + in-partition
   * sort, then `zipWithIndex` numbers rows with per-partition offsets
   * from partition sizes. zipWithIndex's two jobs share the sorted
   * lineage, so the shuffle is paid once (stage reuse) — strictly
   * cheaper than any dataframe spelling, which needs either a second
   * full shuffle (window over partition id) or a corpus-sized persist.
   * This is the rare case the brief's "RDD only for genuine
   * per-partition imperative logic" carve-out describes: a contiguous
   * cross-partition counter has no relational expression.
   *
   * The index is a total order extending `orderCols`: ties land in
   * adjacent slots in a deterministic-but-unspecified order, so pass a
   * key set that is UNIQUE (append an id column) whenever exact slot
   * assignments must be reproducible.
   */
  def withGlobalIndex(
    df: DataFrame,
    orderCols: Seq[String],
    idxCol: String = "global_idx",
    numPartitions: Option[Int] = None
  ): DataFrame = {
    require(orderCols.nonEmpty, "withGlobalIndex needs at least one order column")
    Cols.requireAbsent(df, idxCol)
    val n = numPartitions.getOrElse(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val sorted = df
      .repartitionByRange(n, orderCols.map(c => col(c).asc): _*)
      .sortWithinPartitions(orderCols.map(c => col(c).asc): _*)
    val schema = sorted.schema.add(idxCol, org.apache.spark.sql.types.LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /**
   * Curriculum training order — easy-first with per-epoch in-stage
   * shuffling (Bengio et al. 2009 "Curriculum Learning", the
   * data-side spelling): documents quantile-bucket into `stages`
   * difficulty stages (stage 0 = LOWEST `difficultyCol`; point the
   * score so its easy end is low — length, LM perplexity from rows
   * 65/83, fitted-quality inverse) and the global order visits every
   * stage-0 doc before any stage-1 doc; WITHIN a stage, delivery
   * order is the [[epochKey]] hash permutation, so a new `epoch`
   * reshuffles inside stages but never lets a hard doc jump the
   * curriculum. Returns `stageCol` (int) + `idxCol` (dense 1-based
   * long).
   *
   * Scale shape: one quantile aggregation for the stage bounds
   * ([[Sampling.withQuantileBucket]] — `approx = true` flips it to
   * percentile_approx for corpus scale) + the [[withGlobalIndex]]
   * range shuffle; never a single-partition window. NULL difficulty
   * sorts into stage NULL ahead of stage 0 (Spark ASC nulls-first) —
   * filter or coalesce upstream if that's not the contract you want.
   */
  def curriculumOrder(
    df: DataFrame,
    difficultyCol: String,
    idCol: String,
    stages: Int = 4,
    epoch: Int = 0,
    seed: String = "graft",
    stageCol: String = "stage",
    idxCol: String = "curriculum_idx",
    approx: Boolean = false
  ): DataFrame = {
    Cols.requireAbsent(df, stageCol, idxCol, "__cur_key")
    val staged = Sampling.withQuantileBucket(df, difficultyCol, stages,
      outCol = stageCol, approx = approx)
    val keyed = staged.withColumn("__cur_key", epochKey(col(idCol), epoch, seed))
    withGlobalIndex(keyed, Seq(stageCol, "__cur_key", idCol), idxCol)
      .drop("__cur_key")
  }

  /**
   * Global INCLUSIVE running total of `weightCol` in `orderBy` order —
   * [[withGlobalIndex]] generalized from counting rows to accumulating
   * a weight, and the scalable replacement for
   * `sum(w) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)` (which plans
   * the same Exchange-SinglePartition [[withGlobalIndex]]'s scaladoc
   * names: one task sorts and scans the corpus).
   *
   * Shape: ONE range shuffle + in-partition sort; per-partition weight
   * totals come back as a numPartitions-sized array (metadata, not
   * data), scanLeft into start offsets, and a second pass over the
   * SAME sorted lineage (stage reuse — the shuffle is paid once)
   * emits each row's offset + local prefix sum. NULL weights count as
   * zero. Pass a TOTAL order (append an id column) — ties land in a
   * deterministic-but-unspecified adjacent order otherwise, and the
   * running total at a tie would not be reproducible.
   *
   * The cumsum is exact 64-bit integer arithmetic (weights are cast
   * to long — token counts, byte sizes, row weights are integral in
   * this engine); overflow at 2⁶³ is ~9.2e18 tokens, four orders of
   * magnitude past a 100 TB corpus.
   */
  def withRunningTotal(
    df: DataFrame,
    orderBy: Seq[org.apache.spark.sql.Column],
    weightCol: String,
    totalCol: String = "running_total",
    numPartitions: Option[Int] = None
  ): DataFrame = {
    require(orderBy.nonEmpty, "withRunningTotal needs at least one order column")
    Cols.requireAbsent(df, totalCol, "__rt_w")
    val n = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val sorted = df
      .withColumn("__rt_w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .repartitionByRange(n, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
    val wIdx = sorted.schema.fieldIndex("__rt_w")
    val rdd = sorted.rdd
    // numPartitions-sized driver array — metadata by construction
    val partSums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(wIdx))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.filterNot(_.name == "__rt_w"))
      .add(totalCol, org.apache.spark.sql.types.LongType, nullable = false)
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        acc += r.getLong(wIdx)
        // flat index-skipping copy (one array, no per-field Seq chain —
        // this runs once per corpus row)
        val arr = new Array[Any](r.length)
        var i = 0
        var j = 0
        while (i < r.length) {
          if (i != wIdx) { arr(j) = r.get(i); j += 1 }
          i += 1
        }
        arr(r.length - 1) = acc
        org.apache.spark.sql.Row.fromSeq(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }
    df.sparkSession.createDataFrame(rows, outSchema)
  }

  /**
   * PER-GROUP inclusive running totals at LOW group cardinality —
   * [[withRunningTotal]] with the offsets tracked per (partition,
   * group). The plain window spelling (`sum(w) OVER (PARTITION BY g
   * ORDER BY …)`) parallelizes ACROSS groups, which is exactly wrong
   * when there are six languages and a thousand executors: each
   * group's scan serializes into one task. Here the range shuffle is
   * on `(group, orderBy…)` — a group's rows stay contiguous but SPAN
   * as many partitions as their size needs — and the driver-side
   * offset table grows one entry per (partition, group-present-in-it):
   * O(partitions + groups) by contiguity, metadata either way.
   *
   * Group keys must be ATOMIC values (string/numeric/date — driver-map
   * equality; an array/binary/struct key would compare by reference),
   * ENFORCED by a require — not just the usual grouping-key
   * convention. NULL groups form their own group (nulls
   * sort first). Prefer the window spelling when groups are plentiful
   * (domains, shards): it pays no driver round-trip and AQE handles
   * the skew; this arm exists for the few-giant-groups regime.
   */
  def withRunningTotalGrouped(
    df: DataFrame,
    groupCol: String,
    orderBy: Seq[org.apache.spark.sql.Column],
    weightCol: String,
    totalCol: String = "running_total",
    numPartitions: Option[Int] = None
  ): DataFrame = {
    require(orderBy.nonEmpty, "withRunningTotalGrouped needs an order")
    Cols.requireAbsent(df, totalCol, "__rtg_w")
    // group keys flow through a driver map and a per-row != check —
    // reference equality for arrays/structs/binary, which would make
    // every executor lookup miss and silently restart each row's
    // accumulator. Fail loud instead of documenting the footgun.
    val gType = df.schema(groupCol).dataType
    val gAtomic = {
      import org.apache.spark.sql.types._
      gType match {
        case _: StringType | ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | _: DecimalType | BooleanType |
             DateType | TimestampType | TimestampNTZType => true
        case _ => false
      }
    }
    require(gAtomic,
      s"withRunningTotalGrouped: groupCol '$groupCol' has type " +
        s"${gType.catalogString}, whose values compare by REFERENCE in " +
        "the driver offset map - per-group totals would silently reset " +
        "per row. Use an atomic key (string/numeric/date/timestamp), " +
        "e.g. hex(binaryCol) or to_json(structCol)")
    val n = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val keys = col(groupCol).asc +: orderBy
    val sorted = df
      .withColumn("__rtg_w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
    val wIdx = sorted.schema.fieldIndex("__rtg_w")
    val gIdx = sorted.schema.fieldIndex(groupCol)
    val rdd = sorted.rdd
    // one row per (partition, group present in it) — O(parts + groups)
    val partGroup = rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
      it.foreach { r =>
        val g = r.get(gIdx)
        m.update(g, m.getOrElse(g, 0L) + r.getLong(wIdx))
      }
      m.iterator.map { case (g, s) => (pid, g, s) }
    }.collect()
    val offsets = scala.collection.mutable.HashMap.empty[(Int, Any), Long]
    val runToDate = scala.collection.mutable.HashMap.empty[Any, Long]
    partGroup.sortBy(_._1).foreach { case (pid, g, s) =>
      val prior = runToDate.getOrElse(g, 0L)
      offsets((pid, g)) = prior
      runToDate(g) = prior + s
    }
    val bc = df.sparkSession.sparkContext.broadcast(offsets.toMap)
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.filterNot(_.name == "__rtg_w"))
      .add(totalCol, org.apache.spark.sql.types.LongType, nullable = false)
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Any = null
      var started = false
      var acc = 0L
      it.map { r =>
        val g = r.get(gIdx)
        if (!started || g != cur) {
          cur = g; started = true
          acc = bc.value.getOrElse((pid, g), 0L)
        }
        acc += r.getLong(wIdx)
        // flat index-skipping copy (see withRunningTotal)
        val arr = new Array[Any](r.length)
        var i = 0
        var j = 0
        while (i < r.length) {
          if (i != wIdx) { arr(j) = r.get(i); j += 1 }
          i += 1
        }
        arr(r.length - 1) = acc
        org.apache.spark.sql.Row.fromSeq(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }
    df.sparkSession.createDataFrame(rows, outSchema)
  }
}
