package graft

import org.apache.spark.sql.functions._
import graft.operators.{Contamination, Dedup, TextAnalysis}

/**
 * Pins the session-hygiene contract behind the bench's per-query sweep
 * (GraftSession.sweepPersistedState): which operators legitimately leave
 * checkpoint-backed blocks behind (their RESULT is those blocks), that
 * the sweep reclaims them completely, and that the operators fixed in
 * round 9 (bloom contamination, unigram KL) no longer leave any
 * persisted state at all.
 */
class SessionHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def persistedCount: Int = spark.sparkContext.getPersistentRDDs.size

  private def docsFixture = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "a completely different document about distributed query engines"),
    (4L, "the quick brown fox jumps over the lazy dog once more today")
  ).toDF("doc_id", "text")

  test("connectedComponents returns a checkpoint-backed frame; sweep reclaims it") {
    GraftSession.sweepPersistedState(spark)
    val edges = (0L until 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges)
    // the result must be CONSUMED before sweeping — the checkpoint blocks
    // are its only copy
    assert(labels.collect().length == 6)
    // the final label checkpoint is persisted by design (no handle inside
    // the operator outlives the return to free it) — this is the leak the
    // bench sweep exists for
    assert(persistedCount > 0,
      "expected the final label checkpoint to be persisted")
    val swept = GraftSession.sweepPersistedState(spark)
    assert(swept > 0)
    assert(persistedCount == 0,
      s"sweep left $persistedCount persisted RDDs behind")
  }

  test("bloom-prefiltered contamination leaves no persisted state (localized eval grams)") {
    GraftSession.sweepPersistedState(spark)
    val ev = docsFixture.filter(col("doc_id") === 1L)
    val out = Contamination.contaminationScores(
      docsFixture, ev, "text", "doc_id", k = 3, bloomPrefilter = true)
    assert(out.collect().length == 4)
    assert(persistedCount == 0,
      s"bloom path left $persistedCount persisted RDDs (the pre-round-9 " +
        "localCheckpoint retention)")
  }

  test("unigramDivergence leaves no persisted state (localized count tables)") {
    GraftSession.sweepPersistedState(spark)
    val out = TextAnalysis.unigramDivergence(
      docsFixture, docsFixture.filter(col("doc_id") <= 2L), "text", vocabSize = 50)
    assert(out.collect().nonEmpty)
    assert(persistedCount == 0,
      s"unigramDivergence left $persistedCount persisted RDDs")
  }

  test("curation run() leaves no persisted state after its action returns") {
    GraftSession.sweepPersistedState(spark)
    val n = graft.plans.CurationPipeline.run(
      docsFixture, "text", "doc_id")(_.count())
    assert(n >= 1)
    assert(persistedCount == 0,
      s"curation run() left $persistedCount persisted RDDs")
  }
}
