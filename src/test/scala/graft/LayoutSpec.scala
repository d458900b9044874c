package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bit interleave over already-scaled non-negative levels. */
  private def mortonRef(levels: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = levels.length
    for (b <- 0 until bits; j <- 0 until n)
      z |= ((levels(j) >> b) & 1L) << (b * n + j)
    z
  }

  test("z-values match the reference interleave on a 4x4 grid (Morton order)") {
    val df = (for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y)).toDF("x", "y")
    val out = Layout.withZorderValue(df, Seq("x", "y"), bits = 2)
      .select("x", "y", "z_value").as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) =>
      assert(z === mortonRef(Seq(x, y), 2), s"($x,$y)")
    }
    // the grid in z order walks the classic Morton N-curve: 16 distinct
    // values 0..15
    assert(out.map(_._3).sorted.toSeq === (0L to 15L))
  }

  test("scaling + interleave matches reference on random 3-column data") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 300).map(_ =>
      (rnd.nextInt(10000).toLong, rnd.nextInt(97).toLong, rnd.nextDouble() * 50 - 25))
    val df = rows.toDF("a", "b", "c")
    val bits = 6
    val bounds = Layout.columnBounds(df, Seq("a", "b", "c"))
    val out = Layout.withZorderValue(df, Seq("a", "b", "c"), bits)
      .select("a", "b", "c", "z_value")
      .as[(Long, Long, Double, Long)].collect()
    val maxLevel = (1L << bits) - 1
    out.foreach { case (a, b, c, z) =>
      val levels = Seq(a.toDouble, b.toDouble, c).zip(bounds).map {
        case (v, (mn, mx)) =>
          if (mx == mn) 0L
          else math.floor((v - mn) / (mx - mn) * maxLevel.toDouble + 0.5).toLong
      }
      assert(z === mortonRef(levels, bits), s"row ($a,$b,$c)")
    }
  }

  test("constant and NULL columns scale to level 0") {
    val df = Seq((Some(1L), 7L), (None, 7L), (Some(3L), 7L)).toDF("a", "k")
    val out = Layout.withZorderValue(df, Seq("a", "k"), bits = 4)
      .select("a", "z_value").as[(Option[Long], Long)].collect().toMap
    assert(out(None) === 0L)    // NULL a -> level 0, constant k -> 0
    assert(out(Some(1L)) === 0L) // min value -> level 0
  }

  test("clusterByZorder yields contiguous non-overlapping z ranges per partition") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 2000).map(_ => (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .toDF("x", "y")
    val clustered = Layout.clusterByZorder(df, Seq("x", "y"), numPartitions = 8, bits = 7)
    val bounds = Layout.columnBounds(df, Seq("x", "y"))
    val withZ = clustered.withColumn("__z",
        Layout.zorderValueWith(Seq(col("x"), col("y")).zip(bounds), 7))
      .withColumn("__p", spark_partition_id())
      .select("__p", "__z").as[(Int, Long)].collect()
    val ranges = withZ.groupBy(_._1).view.mapValues(v =>
      (v.map(_._2).min, v.map(_._2).max)).values.toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlapping ranges $ranges")
      case _ =>
    }
  }

  test("caller-provided bounds: out-of-range values clamp to edge levels") {
    val df = Seq((-5L, 0L), (50L, 0L), (2L, 0L)).toDF("a", "k")
    val out = df.select(col("a"),
        graft.operators.Layout.zorderValueWith(
          Seq((col("a"), (0.0, 3.0)), (col("k"), (0.0, 0.0))), bits = 2)
          .as("z"))
      .as[(Long, Long)].collect().toMap
    // n=2 cols, a at even bit positions: level 0 -> z 0, level 3 -> z
    // bits {0,2} = 5, in-range 2 -> level 2 -> z bit {2} = 4
    assert(out(-5L) === 0L)
    assert(out(50L) === 5L)
    assert(out(2L) === 4L)
  }

  test("bits*cols width guard") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Layout.withZorderValue(df, Seq("a", "b"), bits = 32)
    }
  }

  test("SortedBucketExpr: binary search equals linear count, duplicates and edges included") {
    val bounds = Seq(1.0, 3.0, 3.0, 7.0, 10.0)
    for (v <- Seq(0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 9.0, 10.0, 11.0)) {
      val got = graft.functions.SortedBucketExpr.search(bounds.toArray, v)
      assert(got === bounds.count(_ < v).toLong, s"v=$v")
    }
    val df = Seq(Some(2.5), None).toDF("v")
    val out = df.select(
      graft.functions.SortedBucketExpr(col("v"), bounds).as("b")).collect()
    assert(out(0).getLong(0) === 1L) // only 1.0 < 2.5
    assert(out(1).isNullAt(0))
  }

  test("one outlier collapses min-max levels but not rank levels") {
    // 100 uniform values plus one 10^9 outlier on dimension y
    val df = (0L until 100L).map(i => (i, i, i % 50))
      .toDF("id", "x", "y")
      .unionByName(Seq((100L, 100L, 1000000000L)).toDF("id", "x", "y"))
    val minmax = Layout.withZorderValue(df, Seq("y"), bits = 4)
      .filter(col("id") < 100)
      .select("z_value").distinct().count()
    val ranked = Layout.withZorderValueRanked(df, Seq("y"), bits = 4)
      .filter(col("id") < 100)
      .select("z_value").distinct().count()
    assert(minmax === 1L, "min-max: all non-outlier values collapse to level 0")
    assert(ranked >= 15L, s"rank: population spreads the levels, got $ranked")
  }

  test("rank z-order equals the definitional quantile-level interleave on random data") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 257L).map(i =>
      (i, math.abs(rnd.nextLong() % 1000L), math.exp(rnd.nextDouble() * 10)))
    val df = rows.toDF("id", "a", "b")
    val bits = 3
    val got = Layout.withZorderValueRanked(df, Seq("a", "b"), bits = bits)
      .select("id", "z_value").as[(Long, Long)].collect().toMap
    // reference: exact percentile boundaries (Spark's own percentile agg
    // is the engine's source of truth; levels + interleave re-derived here)
    val bounds = Layout.rankBounds(df, Seq("a", "b"), bits)
    def level(v: Double, bs: Array[Double]): Long = bs.count(_ < v).toLong
    rows.foreach { case (id, a, b) =>
      val la = level(a.toDouble, bounds(0))
      val lb = level(b, bounds(1))
      val z = (0 until bits).map { bit =>
        (((la >> bit) & 1L) << (2 * bit)) | (((lb >> bit) & 1L) << (2 * bit + 1))
      }.reduce(_ | _)
      assert(got(id) === z, s"id $id")
    }
  }

  test("clusterByZorderRanked prunes point probes on the skewed column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zrank-spec").toString
    val df = (0L until 400L).map(i => (i, i % 20, (i * i) % 997))
      .toDF("id", "hot", "v")
      .unionByName(Seq((400L, 1000000000L, 3L)).toDF("id", "hot", "v"))
    Layout.clusterByZorderRanked(df, Seq("hot"), numPartitions = 8, bits = 4)
      .write.mode("overwrite").parquet(dir)
    val idx = graft.operators.SkipIndex.build(spark, dir, Seq("hot"))
    val local = spark.createDataFrame(
      java.util.Arrays.asList(idx.collect(): _*), idx.schema)
    // a point probe on a normal key touches ≤ 2 of 8 files even with the
    // outlier present (min-max clustering would put all normal keys in
    // one z-level and spread them across every file)
    val files = graft.operators.SkipIndex.prunedFiles(local, "hot", 7L)
    assert(files.size <= 2, s"probe touched ${files.size} of 8 files")
    val got = graft.operators.SkipIndex.readPruned(spark, dir, local, "hot", 7L)
      .select("id").as[Long].collect().toSet
    assert(got === (0L until 400L).filter(_ % 20 == 7).toSet)
  }
}
