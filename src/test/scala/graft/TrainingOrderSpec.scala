package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainingOrder

class TrainingOrderSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 2000L).toDF("doc_id")

  test("assignShards is a total permutation: all rows kept, (shard,pos) unique") {
    val a = TrainingOrder.assignShards(corpus, "doc_id", numShards = 8, epoch = 1)
    assert(a.count() == 2000L)
    assert(a.select("shard", "shard_pos").distinct().count() == 2000L)
    // positions within a shard are exactly 1..count(shard)
    val bad = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("shard_pos").as("mx"), min("shard_pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.isEmpty)
  }

  test("deterministic per (seed, epoch); different epochs permute differently") {
    val a1 = TrainingOrder.assignShards(corpus, "doc_id", 8, epoch = 1)
    val a2 = TrainingOrder.assignShards(corpus, "doc_id", 8, epoch = 1)
    assert(a1.collect().toSet == a2.collect().toSet) // rerun-stable
    val b = TrainingOrder.assignShards(corpus, "doc_id", 8, epoch = 2)
    val moved = a1.as("a").join(b.as("b"), "doc_id")
      .filter(col("a.shard") =!= col("b.shard") ||
        col("a.shard_pos") =!= col("b.shard_pos"))
      .count()
    assert(moved > 1500, s"epoch 2 should reshuffle nearly everything, moved=$moved")
  }

  test("shards are balanced (uniform hash): max/min count within 50%") {
    val counts = TrainingOrder.assignShards(corpus, "doc_id", 8, epoch = 3)
      .groupBy("shard").count().select("count").as[Long].collect()
    assert(counts.length == 8)
    assert(counts.max.toDouble / counts.min <= 1.5,
      s"unbalanced shards: ${counts.toSeq}")
  }

  test("splice stability: adding docs never reorders surviving pairs within a shard") {
    val grown = (1L to 2500L).toDF("doc_id")
    val before = TrainingOrder.assignShards(corpus, "doc_id", 4, epoch = 5)
    val after = TrainingOrder.assignShards(grown, "doc_id", 4, epoch = 5)
    // same shard for every surviving doc, and relative order preserved:
    // pos ranks of the old docs inside the new assignment match the old ranks
    val j = before.select(col("doc_id"), col("shard").as("s0"), col("shard_pos").as("p0"))
      .join(after.select(col("doc_id"), col("shard").as("s1"), col("shard_pos").as("p1")), "doc_id")
    assert(j.filter(col("s0") =!= col("s1")).isEmpty)
    val reranked = j.withColumn("rr",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("s0")).orderBy(col("p1"))))
    assert(reranked.filter(col("rr") =!= col("p0")).isEmpty)
  }

  test("plan shape: one hash exchange on the shard key, no single partition") {
    val plan = TrainingOrder.assignShards(corpus, "doc_id", 8, epoch = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global-sort hazard in:\n$plan")
    assert("hashpartitioning".r.findAllIn(plan.toLowerCase).size >= 1)
  }
}
