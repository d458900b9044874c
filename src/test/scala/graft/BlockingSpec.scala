package graft

import org.apache.spark.sql.functions._
import graft.operators.Blocking

class BlockingSpec extends SparkSpec {
  import spark.implicits._

  test("pairs match the definitional sorted sliding window") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 200L).map(i => (i, f"k${rnd.nextInt(50)}%03d"))
    val df = rows.toDF("id", "key")
    val w = 4
    val got = Blocking.sortedNeighborhoodPairs(df, "key", "id", w)
      .as[(Long, Long, Long)].collect().toSet
    // reference: sort by (key, id), all pairs within rank distance < w
    val order = rows.sortBy { case (i, k) => (k, i) }.map(_._1)
    val want = (for {
      a <- order.indices; d <- 1 until w
      if a + d < order.length
    } yield (order(a), order(a + d), d.toLong)).toSet
    assert(got === want)
  }

  test("near-keys that share no exact token still become candidates") {
    val df = Seq(
      (1L, "smith john"), (2L, "smith jon"), (3L, "smyth john"),
      (4L, "zzz unrelated")).toDF("id", "key")
    val pairs = Blocking.sortedNeighborhoodPairs(df, "key", "id", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))   // adjacent after sort
    assert(pairs.contains((2L, 3L)) || pairs.contains((1L, 3L)))
  }

  test("window guard and duplicate keys break ties by id deterministically") {
    val df = Seq((3L, "a"), (1L, "a"), (2L, "a")).toDF("id", "key")
    val got = Blocking.sortedNeighborhoodPairs(df, "key", "id", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 1L), (2L, 3L, 1L)))
    intercept[IllegalArgumentException] {
      Blocking.sortedNeighborhoodPairs(df, "key", "id", 1)
    }
  }
}
