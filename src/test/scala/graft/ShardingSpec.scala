package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Md5Long60Expr
import graft.operators.Sharding

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def score(seed: String, key: String, shard: Int): Long =
    Md5Long60Expr.hash(UTF8String.fromString(s"$seed:$key:$shard"))

  private def refAssign(key: String, n: Int, r: Int): Seq[(Int, Int)] =
    (0 until n).map(s => (score("hrw", key, s), s))
      .sortBy { case (sc, s) => (-sc, s) }.take(r)
      .zipWithIndex.map { case ((_, s), rank) => (s, rank) }

  test("assignments match the reference HRW scoreboard, including replicas") {
    val keys = (0L until 300L)
    val df = keys.toDF("id")
    val got = Sharding.rendezvousAssign(df, "id", nShards = 16, replicas = 3)
      .select(col("id"), col("shard"), col("replica_rank"))
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(r => (r._2, r._3)).toSeq).toMap
    keys.foreach { k =>
      assert(got(k) === refAssign(k.toString, 16, 3), s"key $k")
    }
  }

  test("growing the shard grid moves only ~1/(n+1) of the keys") {
    val df = (0L until 2000L).toDF("id")
    def assign(n: Int): Map[Long, Int] =
      Sharding.rendezvousAssign(df, "id", nShards = n)
        .select("id", "shard").as[(Long, Int)].collect().toMap
    val before = assign(32)
    val after = assign(33)
    val moved = before.count { case (k, s) => after(k) != s }
    val frac = moved.toDouble / 2000.0
    assert(frac < 0.08, s"moved $moved of 2000 ($frac) — expected ~1/33")
    assert(moved > 0, "a bigger grid must attract some keys")
    // every key that moved, moved TO the new shard (the HRW property)
    before.foreach { case (k, s) =>
      if (after(k) != s) assert(after(k) === 32, s"key $k moved to ${after(k)}")
    }
  }

  test("null keys drop; guards hold; replica shards are distinct") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("id")
    val out = Sharding.rendezvousAssign(df, "id", nShards = 8, replicas = 4)
      .select("id", "shard").as[(Long, Int)].collect()
    assert(out.map(_._1).toSet === Set(1L, 2L))
    assert(out.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 4))
    intercept[IllegalArgumentException] {
      Sharding.rendezvousAssign(df, "id", nShards = 4, replicas = 5)
    }
  }
}
