package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Skew, TrainingOrder}
import graft.sources.Bucketing
import graft.streaming.Events

/**
 * Correctness-gate queries for the scale-infrastructure operators
 * (SURVEY.md §2.4 rows 40–42): salted join/agg, bucketed-table IO, and
 * the batch surface of streaming dedup.
 *
 * These operators' whole point is producing EXACTLY the plain operator's
 * result with a different physical shape, so each oracle is the plain
 * DuckDB join/aggregate/distinct — the physical claims (exchange-free
 * bucketed join, salt-spread partitions) stay asserted by BucketingSpec/
 * SkewSpec, while the result equality is gated here with the hard signal.
 */
object InfraGates {

  /** customer with the join key under the shared name `nationkey`. */
  private def custKeyed(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey").as("nationkey"))

  private def nationKeyed(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").as("nationkey"), col("n_name"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 row 41a — salted inner equi-join ≡ the plain join (customer ⋈
    // nation on nationkey: 25 distinct keys over 1500+ rows — every key
    // is hot relative to the key space, the shape salting targets)
    "q_salted_join" -> { (s, dir) =>
      Skew.saltedJoin(custKeyed(s, dir), nationKeyed(s, dir), "nationkey", saltN = 8)
    },
    // §2.4 row 41b — salted LEFT join: unmatched left keys null-extend
    // exactly once (the joinType contract added in round 4)
    "q_salted_join_left" -> { (s, dir) =>
      Skew.saltedJoin(
        custKeyed(s, dir),
        nationKeyed(s, dir).filter(col("nationkey") < 10),
        "nationkey", saltN = 8, joinType = "left")
    },
    // §2.4 row 41c — two-phase salted aggregation ≡ plain GROUP BY
    // (count + sum compose across salts; quantities are whole numbers so
    // the double sums are exact in any order)
    "q_salted_agg" -> { (s, dir) =>
      Skew.saltedAgg(
        s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_returnflag"), col("l_quantity")),
        "l_returnflag", saltN = 8)(
        partial = Seq(count(lit(1)).as("pn"), sum(col("l_quantity")).as("ps")),
        combine = Seq(sum(col("pn")).as("n_rows"),
          round(sum(col("ps")), 4).as("sum_qty")))
    },
    // §2.4 row 40 — bucketed+sorted write, catalog read-back, co-located
    // join: the RESULT equals the plain join (BucketingSpec asserts the
    // exchange-free physical plan; this gates the values)
    "q_bucketed_join" -> { (s, dir) =>
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey").as("custkey"), col("o_totalprice"))
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("custkey"), col("c_name"))
      // a prior session's warehouse dirs survive the in-memory catalog
      Bucketing.dropTable(s, "graft_gate_orders_b")
      Bucketing.dropTable(s, "graft_gate_customer_b")
      Bucketing.writeBucketed(orders, "graft_gate_orders_b", "custkey", buckets = 8)
      Bucketing.writeBucketed(cust, "graft_gate_customer_b", "custkey", buckets = 8)
      Bucketing.readBucketed(s, "graft_gate_orders_b")
        .join(Bucketing.readBucketed(s, "graft_gate_customer_b"), "custkey")
        .select("o_orderkey", "custkey", "o_totalprice", "c_name")
    },
    // §2.4 row 42 — streaming dedup's batch surface: one surviving row
    // per key (the key projection makes the nondeterministic survivor
    // deterministic; watermark-horizon semantics are StreamingSpec's)
    "q_dedup_stream" -> { (s, dir) =>
      Events.dedupStream(
          Events.readEventsParquet(s, s"$dir/events.parquet"),
          Seq("user_id", "event_type"))
        .select("user_id", "event_type")
    },
    // §2.4 row 86 — deterministic epoch shuffle: the (shard, shard_pos)
    // permutation is a pure function of (seed, epoch, id), so the oracle
    // re-derives every slot from the portable 60-bit MD5 key
    "q_epoch_shuffle" -> { (s, dir) =>
      TrainingOrder.assignShards(
          s.read.parquet(s"$dir/documents.parquet").select("doc_id"),
          "doc_id", numShards = 8, epoch = 1)
        .select("doc_id", "shard", "shard_pos")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_salted_join" ->
      """SELECT c_custkey, c_nationkey AS nationkey, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q_salted_join_left" ->
      """SELECT c_custkey, c_nationkey AS nationkey, n_name
        |FROM customer LEFT JOIN nation
        |  ON c_nationkey = n_nationkey AND n_nationkey < 10""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |       round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderkey, o_custkey AS custkey, o_totalprice, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_dedup_stream" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q_epoch_shuffle" ->
      s"""WITH k AS (
         |  SELECT doc_id,
         |         ${LlmGates.h60("'graft:1:' || doc_id")} AS key
         |  FROM documents)
         |SELECT doc_id,
         |       key % 8 AS shard,
         |       row_number() OVER (PARTITION BY key % 8
         |                          ORDER BY key, doc_id) AS shard_pos
         |FROM k""".stripMargin
  )
}
