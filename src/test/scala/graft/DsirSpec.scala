package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

class DsirSpec extends SparkSpec {

  import spark.implicits._

  // raw pool: two "science" docs, two "spam" docs, one empty
  private def raw = Seq(
    (1L, "quantum physics experiment results physics"),
    (2L, "physics theory quantum measurement"),
    (3L, "buy cheap pills now buy cheap"),
    (4L, "cheap pills cheap pills buy now"),
    (5L, "")
  ).toDF("doc_id", "text")

  private def target = Seq(
    (100L, "physics experiment quantum theory"),
    (101L, "quantum measurement results")
  ).toDF("doc_id", "text")

  test("logRatioModel: dense over all buckets, target-like grams score positive") {
    val model = Dsir.logRatioModel(target, raw, "text", nBuckets = 64)
    val rows = model.collect()
    assert(rows.length == 64)
    assert(rows.map(_.getLong(0)).toSet == (0L until 64L).toSet)
    assert(rows.forall(r => !r.getDouble(1).isNaN && !r.getDouble(1).isInfinite))
  }

  test("importanceWeights: target-flavored docs outweigh spam; empty docs absent") {
    val model = Dsir.logRatioModel(target, raw, "text", nBuckets = 64)
    val w = Dsir.importanceWeights(raw, model, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!w.contains(5L), "zero-gram doc must be absent")
    // every science doc outweighs every spam doc under a science target
    for (sci <- Seq(1L, 2L); spam <- Seq(3L, 4L))
      assert(w(sci) > w(spam), s"doc $sci (${w(sci)}) vs $spam (${w(spam)})")
  }

  test("resample: deterministic per seed, top-n size, hard selection at tiny tau") {
    val model = Dsir.logRatioModel(target, raw, "text", nBuckets = 64)
    def ids(seed: String, tau: Double) =
      Dsir.resample(raw, model, "text", "doc_id", n = 2, tau = tau, seed = seed)
        .collect().map(_.getLong(0)).toSet
    // rerun-stable for a fixed seed
    assert(ids("a", 1.0) == ids("a", 1.0))
    // tiny tau: weight dominates the Gumbel noise -> the two science docs
    assert(ids("a", 1e-9) == Set(1L, 2L))
    assert(ids("b", 1e-9) == Set(1L, 2L))
  }

  test("resample plans as TakeOrderedAndProject (no global sort)") {
    val model = Dsir.logRatioModel(target, raw, "text", nBuckets = 64)
    val plan = Dsir.resample(raw, model, "text", "doc_id", n = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("gumbelKeys: u strictly inside (0,1), collision guard, arg validation") {
    val w = Seq((1L, 0.5), (2L, -0.5)).toDF("doc_id", "weight")
    val keys = Dsir.gumbelKeys(w, tau = 2.0, seed = "s").collect()
    assert(keys.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    intercept[IllegalArgumentException] {
      Dsir.gumbelKeys(w.withColumn("key", lit(1)), tau = 1.0)
    }
    intercept[IllegalArgumentException] { Dsir.gumbelKeys(w, tau = 0.0) }
    intercept[IllegalArgumentException] {
      Dsir.logRatioModel(target, raw, "text", nBuckets = 0)
    }
    // an empty model frame cannot score anything — fails loudly instead
    // of silently dropping every gram in the join (the bucket count is
    // inferred from the dense model, so a fit/score mismatch is
    // impossible by construction)
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(raw, Seq.empty[(Long, Double)].toDF("bucket", "log_ratio"),
        "text", "doc_id")
    }
  }

  test("model fit leaves no persisted state and returns localized frames") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val model = Dsir.logRatioModel(target, raw, "text", nBuckets = 32)
    model.collect()
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
    // both dense count tables are localized -> the model plan reads
    // LogicalRDDs, never the corpora
    assert(!model.queryExecution.optimizedPlan.toString.contains("explode"))
  }
}
