package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/**
 * Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
 * 1998, the public minimal-movement assignment scheme behind consistent
 * routing layers: every key scores each shard with the portable hash
 * md5_long60("hrw:" + key + ":" + shard) and is assigned to its top
 * `replicas` shards by (score desc, shard asc).
 *
 * Why a data engine wants it: stable, engine-re-derivable routing of
 * keys (documents, domains, users) onto a FIXED small set of buckets —
 * crawl politeness slots, per-shard indexes, cache/serving replicas —
 * with the HRW guarantee that growing n shards to n+1 reassigns only
 * ~1/(n+1) of the keys (each key moves only if the NEW shard tops its
 * scoreboard), where hash-mod reshuffles almost everything.
 *
 * Scale shape: the scoreboard is a row-local array transform over the
 * shard grid (nShards is small by construction — slots, not data),
 * sorted and sliced in place: a pure projection, zero shuffle,
 * streaming-safe, deterministic across engines/retries/drops.
 */
object Sharding {

  /**
   * Assign each row's key to its top-`replicas` rendezvous shards.
   * Output: input columns + (`shard`, `replica_rank`), `replica_rank`
   * 0-based in score order. NULL keys get no assignment (dropped).
   */
  def rendezvousAssign(
    df: DataFrame,
    keyCol: String,
    nShards: Int,
    replicas: Int = 1,
    seed: String = "hrw"
  ): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    require(replicas >= 1 && replicas <= nShards,
      s"replicas must be in [1, nShards]: $replicas of $nShards")
    val key = col(keyCol).cast("string")
    val scored = transform(
      sequence(lit(0), lit(nShards - 1)),
      s => struct(
        Hashing.md5Long60(concat(lit(seed + ":"), key, lit(":"), s.cast("string")))
          .as("score"),
        s.as("shard")))
    // sort ASC on (score, shard), take the TAIL for the top-R by score
    // desc; reverse so replica 0 is the winner. shard asc breaks exact
    // score ties deterministically (reverse of (score asc, shard desc))
    val ranked = reverse(slice(
      array_sort(transform(scored,
        p => struct(p.getField("score").as("score"),
          (-p.getField("shard")).as("negShard"), p.getField("shard").as("shard")))),
      -replicas, replicas))
    df.filter(col(keyCol).isNotNull)
      .select(df.columns.map(col) :+ posexplode(ranked).as(Seq("replica_rank", "__p")): _*)
      .withColumn("shard", col("__p.shard"))
      .drop("__p")
  }
}
