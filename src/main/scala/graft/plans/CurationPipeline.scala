package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Contamination, Dedup, Sampling, TextAnalysis}

/**
 * The end-to-end corpus curation flow — the LLM-data analogue of the
 * V2F [[ExtractionPipeline]]: one call running the standard pretraining
 * cleanup in the canonical order, each stage an individually
 * oracle-gated operator of this engine.
 *
 *   1. PII scrub (emails / IPv4s / phone runs masked)
 *   2. corpus-wide duplicate-LINE removal (C4 rule)
 *   3. exact dedup (normalized-hash, lowest-id keeper)
 *   4. MinHash-LSH near-dup removal
 *   5. decontamination against an eval set (optional)
 *   6. quality floor (composite score ≥ minQuality)
 *   7. train/val/test split assignment (deterministic hash)
 *
 * Order rationale: scrubbing FIRST makes boilerplate lines (which often
 * differ only in an embedded email/phone) collapse for the line rule;
 * line removal BEFORE document dedup lets near-identical pages become
 * exact duplicates; decontamination runs on the deduplicated survivors
 * (fewer docs to score); the quality floor sees final text; splits are
 * assigned last so every surviving row gets one.
 *
 * Scale shape is inherited stage by stage — every stage is one of this
 * engine's audited operators; nothing here adds a shuffle of its own.
 * [[curate]] returns the lazy plan; [[run]] executes an action with the
 * multiply-consumed scrubbed intermediate persisted for exactly the
 * action's lifetime.
 */
object CurationPipeline {

  final case class Config(
    evalSet: Option[DataFrame] = None,
    minLineCount: Int = 3,
    shingleK: Int = 3,
    numHashes: Int = 16,
    bands: Int = 4,
    nearDupThreshold: Double = 0.8,
    contaminationK: Int = 13,
    maxContamination: Double = 0.5,
    minQuality: Double = 0.0,
    splits: Seq[(String, Double)] = Seq(("train", 0.98), ("val", 0.01), ("test", 0.01)),
    splitSeed: String = "graft"
  )

  /**
   * The curated-corpus PLAN as (doc_id, textCol, quality, split) —
   * lazy, no persistence. The scrubbed intermediate feeds several
   * downstream stages, so evaluating this plan more than once (or once,
   * through its internal self-joins) recomputes the text-rewriting
   * stages; use [[run]] to execute with the intermediate persisted for
   * exactly the duration of your action (the ExtractionPipeline
   * lifecycle pattern, plans/V2F.scala).
   */
  def curate(
    corpus: DataFrame,
    textCol: String,
    idCol: String,
    cfg: Config = Config()
  ): DataFrame =
    stages(
      Dedup.dropDuplicateLines(
        corpus.select(col(idCol), TextAnalysis.scrubPii(col(textCol)).as(textCol)),
        textCol, idCol = idCol, minCount = cfg.minLineCount),
      textCol, cfg)

  /**
   * Runs the flow and your `action` (write, collect, count …) with the
   * scrubbed intermediate persisted across all its consumers, then
   * unpersists — persistence lives exactly as long as the action, so
   * nothing is pinned after run returns and nothing recomputes during it.
   */
  def run[T](
    corpus: DataFrame,
    textCol: String,
    idCol: String,
    cfg: Config = Config()
  )(action: DataFrame => T): T = {
    val scrubbed = Dedup.dropDuplicateLines(
      corpus.select(col(idCol), TextAnalysis.scrubPii(col(textCol)).as(textCol)),
      textCol, idCol = idCol, minCount = cfg.minLineCount)
      .persist()
    try action(stages(scrubbed, textCol, cfg))
    finally scrubbed.unpersist()
  }

  /** Stages 3-7 over the scrubbed corpus (named doc_id by stage 2). */
  private def stages(scrubbed: DataFrame, textCol: String, cfg: Config): DataFrame = {
    // 3-4: exact then near dedup
    val exact = Dedup.dropExactDuplicates(scrubbed, textCol, "doc_id")
    val near = Dedup.dropNearDuplicates(exact, textCol, "doc_id",
      k = cfg.shingleK, numHashes = cfg.numHashes, bands = cfg.bands,
      threshold = cfg.nearDupThreshold)
    // 5: decontamination (optional)
    val clean = cfg.evalSet.fold(near)(ev =>
      Contamination.decontaminate(near, ev, textCol, "doc_id",
        k = cfg.contaminationK, maxContamination = cfg.maxContamination))
    // 6-7: quality floor, then split labels
    val scored = TextAnalysis.withQuality(clean, textCol, "doc_id")
      .filter(col("quality") >= cfg.minQuality)
      .select(col("doc_id"), col("quality"))
      .join(clean, "doc_id")
    Sampling.splitAssign(scored, "doc_id", cfg.splits, cfg.splitSeed)
      .select(col("doc_id"), col(textCol), col("quality"), col("split"))
  }
}
