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
}
