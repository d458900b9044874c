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

  test("withRunningTotal: exact inclusive cumsum in any order, across partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(1000).toLong, rnd.nextInt(50)))
    val df = rows.toDF("id", "w", "score")
    val got = graft.operators.TrainingOrder.withRunningTotal(
        df, Seq(org.apache.spark.sql.functions.col("score").desc,
          org.apache.spark.sql.functions.col("id").asc),
        "w", "cum", numPartitions = Some(7))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: driver-side sort + scan
    var acc = 0L
    rows.sortBy { case (id, _, s) => (-s, id) }.foreach { case (id, w, _) =>
      acc += w
      assert(got(id) == acc, s"id $id")
    }
    // more partitions than rows still numbers correctly
    val tiny = Seq((1L, 5L), (2L, 7L)).toDF("id", "w")
    val t = graft.operators.TrainingOrder.withRunningTotal(
        tiny, Seq(org.apache.spark.sql.functions.col("id").asc), "w", "cum",
        numPartitions = Some(16))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t == Map(1L -> 5L, 2L -> 12L))
  }

  test("curriculumOrder: stages ramp, epochs reshuffle inside stages only") {
    import spark.implicits._
    val df = (1L to 120L).map(i => (i, (i * 37 % 100).toInt)).toDF("id", "d")
    def run(epoch: Int) = graft.operators.TrainingOrder.curriculumOrder(
        df, "d", "id", stages = 4, epoch = epoch)
      .select("id", "stage", "curriculum_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val e0 = run(0)
    // the index is dense 1..n and stage is non-decreasing along it
    val byIdx = e0.sortBy(_._3)
    assert(byIdx.map(_._3).toSeq == (1L to 120L).toSeq)
    assert(byIdx.map(_._2).toSeq == byIdx.map(_._2).sorted.toSeq,
      "every easier-stage doc precedes every harder-stage doc")
    // a new epoch permutes within stages but stage membership is fixed
    val e1 = run(1)
    val st0 = e0.map(r => r._1 -> r._2).toMap
    val st1 = e1.map(r => r._1 -> r._2).toMap
    assert(st0 == st1)
    assert(e0.map(r => r._1 -> r._3).toMap != e1.map(r => r._1 -> r._3).toMap,
      "epoch must reshuffle delivery order")
  }
}
