package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Change-data-capture changelog application — the MERGE INTO /
 * upsert-compaction primitive of every public lakehouse format (Delta,
 * Iceberg, Hudi all publish this semantics): fold a changelog of
 * keyed upserts and deletes into a base snapshot, last-writer-wins per
 * key by a sequence column.
 *
 * Semantics: for each key, the highest-`seqCol` changelog row wins
 * (base snapshot rows sit below every changelog row); op `"U"`/`"I"`
 * (both mean upsert — inserts and updates are indistinguishable at
 * apply time) replaces the row, `"D"` removes the key. Keys untouched
 * by the changelog keep their snapshot row. Equal-seq ties break
 * toward the upsert (deterministic — but give keys unique sequence
 * numbers; a real CDC source's log offsets are).
 *
 * Scale shape: ONE shuffle on the key (union + per-key window, the
 * as-of-join discipline — no join node at all, so no skew-prone
 * build side); the changelog is usually ≪ the snapshot and rides the
 * same exchange. Output is snapshot-sized; run it per micro-batch in
 * foreachBatch for a streaming materialized table.
 */
object Cdc {

  val Upsert = "U"
  val Insert = "I"
  val Delete = "D"

  /**
   * Apply `changelog` to `snapshot`. Both must carry the same payload
   * columns; `changelog` additionally carries `seqCol` (castable to
   * long) and `opCol` (one of U/I/D — anything else raises at
   * evaluation, loud by design).
   */
  def applyChangelog(
    snapshot: DataFrame,
    changelog: DataFrame,
    keyCols: Seq[String],
    seqCol: String = "seq",
    opCol: String = "op"
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val payload = snapshot.columns.toSeq
    require(!payload.contains(seqCol) && !payload.contains(opCol),
      s"snapshot must not already carry $seqCol/$opCol")

    val base = snapshot.select(
      payload.map(col) :+ lit(Long.MinValue).as("__seq") :+ lit(Upsert).as("__op"): _*)
    val chg = changelog.select(
      payload.map(col) :+
        col(seqCol).cast("long").as("__seq") :+
        when(col(opCol).isin(Upsert, Insert, Delete), col(opCol))
          .otherwise(raise_error(concat(lit("unknown changelog op: "), col(opCol))))
          .as("__op"): _*)

    // last-writer-wins: one union + one per-key window — no join node
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__seq").desc, col("__op").desc) // seq tie: U/I before D
    base.unionByName(chg)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") =!= Delete)
      .select(payload.map(col): _*)
  }
}
