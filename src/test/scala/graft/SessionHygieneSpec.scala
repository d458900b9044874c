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

  test("connectedComponents (localized arm) leaves no persisted state at all") {
    GraftSession.sweepPersistedState(spark)
    val edges = (0L until 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges)
    assert(labels.collect().length == 6)
    // the round-10 contract: below localizeEdgeLimit the labels are a
    // driver-local relation — no checkpoint blocks, nothing to sweep
    assert(persistedCount == 0,
      s"localized connectedComponents left $persistedCount persisted RDDs")
  }

  test("looping over clustering leaves zero persisted blocks (no sweep needed)") {
    GraftSession.sweepPersistedState(spark)
    for (_ <- 1 to 3) {
      val out = Dedup.clusterNearDuplicates(docsFixture, "text", "doc_id")
      assert(out.collect().length == 4)
    }
    assert(persistedCount == 0,
      s"clustering loop accumulated $persistedCount persisted RDDs")
  }

  test("connectedComponents (distributed arm) returns a checkpoint-backed frame; " +
    "unpersistLocalCheckpoint frees it") {
    GraftSession.sweepPersistedState(spark)
    val edges = (0L until 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // localizeEdgeLimit = 0 forces the corpus-scale distributed loop
    val labels = Dedup.connectedComponents(edges, localizeEdgeLimit = 0L)
    // the result must be CONSUMED before freeing — the checkpoint blocks
    // are its only copy
    assert(labels.collect().length == 6)
    // the final label checkpoint is persisted by design on this arm (the
    // labels ARE the blocks); the caller-visible free handle is
    // GraftSqlBridge.unpersistLocalCheckpoint on the returned frame
    assert(persistedCount > 0,
      "expected the final label checkpoint to be persisted")
    // the handle works on the returned (derived) frame itself — no need
    // to have kept the raw checkpoint
    org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(labels)
    assert(persistedCount == 0,
      s"free handle left $persistedCount persisted RDDs behind")
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
