package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Checks, Dedup, Graph, Joins, Sampling, Sketches, Skew, TrainingOrder}
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
    },
    // §2 row 159 — curriculum order: quantile difficulty stages
    // (n_chars as the difficulty proxy), epoch-hash shuffling inside
    // each stage, one dense global index; the oracle re-derives the
    // stage bounds (quantile_cont — dyadic fractions at n=500/5000,
    // bit-identical boundaries) and the full permutation
    "q_curriculum" -> { (s, dir) =>
      TrainingOrder.curriculumOrder(
          s.read.parquet(s"$dir/documents.parquet").select("doc_id", "n_chars"),
          "n_chars", "doc_id", stages = 4, epoch = 1)
        .select("doc_id", "stage", "curriculum_idx")
    },
    // §2 row 163 — the COMPOSED training-delivery recipe ("best N
    // tokens, easy-first, shuffled, sharded, shipped"): selectByBudget
    // (30k ws-tokens, quality = n_chars DESC) → curriculumOrder (4
    // quantile stages over the SELECTED set, epoch-1 in-stage shuffle)
    // → assignShards (4 epoch-2 shards) → writeTarShards (repartition
    // by shard, sorted by shard_pos) → readTar. Every label rides the
    // member NAME and the payload rides the member bytes, so the gate
    // pins the artifact a trainer actually opens — stage, curriculum
    // slot, shard, slot-in-shard, and text md5 — against one composed
    // DuckDB CTE (budget window → quantile stages → hash permutations)
    "q_delivery_e2e" -> { (s, dir) =>
      val t = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("n_chars"), col("text"),
          graft.operators.TextAnalysis.wsTokenCount(col("text")).as("toks"))
      val picked = Sampling.selectByBudget(t, "toks", budget = 30000L,
        orderBy = Seq(col("n_chars").desc, col("doc_id").asc))
      val ordered = TrainingOrder.curriculumOrder(picked, "n_chars", "doc_id",
        stages = 4, epoch = 1)
      val sharded = TrainingOrder.assignShards(ordered, "doc_id",
        numShards = 4, epoch = 2)
      val out = java.nio.file.Files
        .createTempDirectory("graft-delivery").toString
      graft.sources.Archives.writeTarShards(
        sharded
          .repartition(4, col("shard"))
          .sortWithinPartitions(col("shard"), col("shard_pos"))
          .select(
            concat_ws("/",
              col("shard").cast("string"),
              lpad(col("shard_pos").cast("string"), 8, "0"),
              concat_ws("_", col("stage").cast("string"),
                col("curriculum_idx").cast("string"),
                concat(col("doc_id").cast("string"), lit(".txt"))))
              .as("member_name"),
            col("text").cast("binary").as("member_bytes")),
        out)
      graft.sources.Archives.readTar(s, s"$out/part-*")
        .select(split(col("member_name"), "/").as("p"), col("member_bytes"))
        .select(
          col("p").getItem(0).cast("long").as("shard"),
          col("p").getItem(1).cast("long").as("shard_pos"),
          split(col("p").getItem(2), "_").as("q"),
          col("member_bytes"))
        .select(
          col("shard"), col("shard_pos"),
          col("q").getItem(0).cast("int").as("stage"),
          col("q").getItem(1).cast("long").as("curriculum_idx"),
          regexp_replace(col("q").getItem(2), "\\.txt$", "")
            .cast("long").as("doc_id"),
          md5(col("member_bytes")).as("text_md5"))
    },
    // §2.4 row 87 — as-of join: each purchase picks the user's most
    // recent at-or-before click via the union+running-last spelling
    // (one shuffle, zero join nodes); the oracle is the DEFINITIONAL
    // lateral-argmax spelling, a completely different algorithm
    "q_asof_join" -> { (s, dir) =>
      val ev = Events.readEventsParquet(s, s"$dir/events.parquet")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      Joins.asofJoin(purchases, clicks, Seq("user_id"), "ts", "click_ts",
        tieBreak = Some("click_id"))
    },
    // §2.4 row 87b — the BROADCAST/STREAMING as-of arm (per-key history
    // array + row-local fold): must produce byte-identical output to
    // the window arm, so it shares the definitional lateral oracle
    "q_asof_join_bcast" -> { (s, dir) =>
      val ev = Events.readEventsParquet(s, s"$dir/events.parquet")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      Joins.asofJoinBroadcast(purchases, clicks, Seq("user_id"), "ts", "click_ts",
        tieBreak = Some("click_id"))
    },
    // §2.4 row 87c — the SKEW-SAFE as-of arm: 90% of users remapped to
    // one hot key, hotKeyCount forced low so that key salt-chunks
    // across window sub-partitions (history replicated per chunk)
    // while the rest stay on the plain window arm; the union must
    // still equal the definitional lateral-argmax oracle
    "q_asof_join_skew" -> { (s, dir) =>
      val ev = Events.readEventsParquet(s, s"$dir/events.parquet")
        .withColumn("user_id",
          when(col("user_id") % 10 < 9, lit(0L)).otherwise(col("user_id")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      Joins.asofJoinSkew(purchases, clicks, Seq("user_id"), "ts", "click_ts",
        tieBreak = Some("click_id"), hotKeyCount = 50)
    },
    // stream-stream interval join, batch surface — the SAME
    // Events.joinStreams plan StreamingSpec runs over MemoryStreams:
    // each purchase pairs with the user's clicks in the 10 minutes
    // before it; the oracle is the definitional inequality join
    "q_join_streams" -> { (s, dir) =>
      val ev = Events.readEventsParquet(s, s"$dir/events.parquet")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      Events.joinStreams(purchases, clicks, Seq("user_id"),
          leftTs = "p_ts", rightTs = "c_ts",
          lookback = "10 minutes", lookahead = "0 seconds")
        .select("user_id", "p_id", "c_id")
    },
    // §2.4 row 88 — range join: every event inside any 10-minute
    // error-incident window, via interval binning + equi-join; the
    // oracle is the definitional inequality join
    "q_range_join" -> { (s, dir) =>
      val ev = Events.readEventsParquet(s, s"$dir/events.parquet")
      val windows = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("interval_id"), col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL '10' MINUTE")).as("end_ts"))
      Joins.rangeJoin(
          ev.select("event_id", "user_id", "ts"), "ts",
          windows, "start_ts", "end_ts",
          binWidth = 10L * 60 * 1000 * 1000) // 10 min of micros = interval length
        .select("event_id", "user_id", "interval_id", "start_ts")
    },
    // §2.4 row 90 — interval-overlap join: purchase attention windows ×
    // error-incident windows, binned with first-shared-bin dedup; the
    // oracle is the definitional inequality join
    "q_overlap_join" -> { (s, dir) =>
      val ev = Events.readEventsParquet(s, s"$dir/events.parquet")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p_start"),
          (col("ts") + expr("INTERVAL '5' MINUTE")).as("p_end"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("ts").as("e_start"),
          (col("ts") + expr("INTERVAL '10' MINUTE")).as("e_end"))
      Joins.overlapJoin(purchases, "p_start", "p_end",
          errors, "e_start", "e_end", binWidth = 5L * 60 * 1000 * 1000)
        .select("p_id", "p_start", "e_id", "e_start")
    },
    // §2.4 row 91 — PageRank domain-quality prior: a synthetic source→
    // source link graph derived from the documents table (src19's
    // out-edges removed so the dangling-mass path is exercised); the
    // oracle UNROLLS the same 8 power iterations as a CTE chain
    "q_pagerank" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val dst = concat(lit("src"), ((col("doc_id") * 7) % 20).cast("string"))
      val edges = docs.select(col("source").as("src"), dst.as("dst"))
        .filter(col("src") =!= col("dst") && col("src") =!= "src19")
      Graph.pageRank(edges, "src", "dst", iterations = PageRankIters)
        .select(col("node"), round(col("rank"), 6).as("rank"))
    },
    // §2 row 134 — bloom-prefiltered semi join: ~1%-selective key set,
    // results must be EXACTLY the plain semi join's (fp removed by the
    // exact join, fn impossible); the prefilter plan shape is audited
    // in PlanAuditSpec
    "q_bloom_semi_join" -> { (s, dir) =>
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber")
      val keys = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") % 97 === 0).select("o_orderkey")
      graft.operators.Joins.bloomSemiJoin(li, keys, "l_orderkey", "o_orderkey")
    },
    // §2 row 129 — rendezvous (HRW) sharding: every key's top-2 shard
    // scoreboard over a 32-slot grid re-derived by the oracle from the
    // same portable hash
    "q_rendezvous" -> { (s, dir) =>
      graft.operators.Sharding.rendezvousAssign(
          s.read.parquet(s"$dir/documents.parquet").select("doc_id"),
          "doc_id", nShards = 32, replicas = 2)
        .select(col("doc_id"), col("shard").cast("long").as("shard"),
          col("replica_rank"))
    },
    // §2 row 123 — label-propagation communities over the same derived
    // link graph (no src19 cut — LPA has no dangling-mass concept); the
    // oracle UNROLLS the same 4 synchronous min-label-tie rounds
    "q_label_prop" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val dst = concat(lit("src"), ((col("doc_id") * 7) % 20).cast("string"))
      val edges = docs.select(col("source").as("src"), dst.as("dst"))
      Graph.labelPropagation(edges, "src", "dst", iterations = LabelPropIters)
    },
    // §2.4 row 93 — corpus snapshot diff: a derived "refresh" snapshot
    // (deterministic removals, revisions, additions) diffed against the
    // original; the oracle rebuilds the same snapshot and full-joins
    "q_corpus_diff" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val revised = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [rev]")))
            .otherwise(col("text")))
      val added = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.corpusDiff(docs, revised.unionByName(added), "text", "doc_id")
    },
    // §2.4 row 94 — SCD2 dimension build: each user's signup events
    // become versioned rows with half-open validity (lead per key)
    "q_scd2" -> { (s, dir) =>
      Joins.scd2(
          Events.readEventsParquet(s, s"$dir/events.parquet")
            .filter(col("event_type") === "signup")
            .select("event_id", "user_id", "ts"),
          Seq("user_id"), "ts")
        .select("event_id", "user_id", "valid_from", "valid_to")
    },
    // §2.4 row 95 — temperature mixing at T=2: weights = floor(sqrt(count))
    // per language (sqrt is exactly rounded, so the oracle re-derives the
    // integer weights bit-for-bit), then rebalance's exact-arithmetic cut
    "q_temp_rebalance" -> { (s, dir) =>
      Sampling.temperatureRebalance(
          s.read.parquet(s"$dir/documents.parquet"),
          "doc_id", "lang", Seq("en", "de", "fr"), temperature = 2.0)
        .select("doc_id", "lang")
    },
    // §2.4 row 96 — declarative data-quality checks: five rule types in
    // ONE aggregation pass; the oracle recomputes every metric and
    // verdict from the same count ratios
    "q_quality_checks" -> { (s, dir) =>
      Checks.report(s.read.parquet(s"$dir/documents.parquet"), Seq(
          Checks.NonNullRate("text", 1.0),
          Checks.UniqueRate("doc_id", 1.0),
          Checks.AcceptedValues("lang", Seq("en", "de", "fr", "es", "zh"), 1.0),
          Checks.MatchRate("source", "^src[0-9]+$", 1.0),
          Checks.ValueRange("n_chars", Some(1.0), Some(1.0e9))))
        .withColumn("metric", round(col("metric"), 6))
    },
    // §2.4 row 98 — mergeable distinct-count sketches: per-lang estimate
    // vs the exact distinct computed in the SAME query; the
    // deterministic within-band verdict is what the oracle checks
    // (DuckDB's approx_distinct is a different sketch — the estimate
    // itself is not portable, the band contract is)
    "q_hll_distinct" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val est = Sketches.estimate(
        Sketches.distinctSketches(docs, Seq("lang"), "text"), Seq("lang"))
      val exact = docs.groupBy("lang")
        .agg(countDistinct(col("text")).as("__exact"))
      est.join(exact, "lang")
        .select(col("lang"),
          (abs(col("distinct_est") - col("__exact")) / col("__exact") <= 0.05)
            .cast("int").as("ok"))
    },
    // §2.4 row 106 — KLL quantile sketches: per-lang n_chars quantiles
    // read off the mergeable artifact; the verdict is the normalized-
    // rank band (the estimate is an actual corpus value whose empirical
    // rank must sit within 3ε+ties of the requested q — sketch bytes
    // and exact estimates are not engine-portable, the band contract is)
    "q_kll_quantiles" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("lang"), col("n_chars").cast("double").as("v"))
      val qs = Seq(0.25, 0.5, 0.9)
      val est = Sketches.estimateQuantiles(
        Sketches.quantileSketches(docs, Seq("lang"), "v"), Seq("lang"), qs)
      val ranked = est.join(docs, Seq("lang"))
        .groupBy("lang", "q", "value_est")
        .agg((sum((col("v") <= col("value_est")).cast("long")) /
          count(lit(1))).as("__rank"))
      ranked.select(col("lang"), col("q"),
        (abs(col("__rank") - col("q")) <= 0.1).cast("int").as("ok"))
    },
    // §2.4 row 108 — theta set-operation sketches: the corpus split
    // into two "drops" by id parity, per-lang union/intersection/
    // difference cardinalities read off the two sketch artifacts. At
    // gate widths (~100 distinct texts per side vs 2^12 nominal
    // entries) theta runs in EXACT mode and is deterministic, so the
    // oracle re-derives the precise set cardinalities
    "q_theta_setops" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val a = Sketches.thetaSketches(
        docs.filter(col("doc_id") % 2 === 0), Seq("lang"), "text")
      val b = Sketches.thetaSketches(
        docs.filter(col("doc_id") % 2 === 1), Seq("lang"), "text")
      Sketches.thetaSetOps(a, b, Seq("lang"))
        .select(col("lang"),
          col("union_est").cast("long").as("union_d"),
          col("intersect_est").cast("long").as("intersect_d"),
          col("a_not_b_est").cast("long").as("a_not_b_d"),
          col("b_not_a_est").cast("long").as("b_not_a_d"))
    },
    // §2.4 row 98b — CMS frequency sketches: per-lang counts of two
    // source values; at these widths (20k counters vs ~20 values per
    // group) the deterministic estimate equals the exact count, and the
    // verdict is what the oracle checks (the sketch bytes are not
    // engine-portable, the never-undercount contract is)
    "q_cms_counts" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val est = Sketches.estimateCounts(
        Sketches.cmsSketches(docs, Seq("lang"), "source"),
        Seq("lang"), Seq("src1", "src5"))
      val exact = docs.groupBy(col("lang"), col("source").as("term"))
        .agg(count(lit(1)).as("__exact"))
      est.join(exact, Seq("lang", "term"), "left")
        .select(col("lang"), col("term"),
          (col("count_est") === coalesce(col("__exact"), lit(0L)))
            .cast("int").as("ok"))
    },
    // §2.4 row 89 — dense global index without a single-partition sort:
    // range shuffle + zipWithIndex ≡ row_number() OVER (ORDER BY …)
    "q_global_index" -> { (s, dir) =>
      TrainingOrder.withGlobalIndex(
          Events.readEventsParquet(s, s"$dir/events.parquet")
            .select("event_id", "ts"),
          Seq("ts", "event_id"))
        .select("event_id", "global_idx")
    }
  )

  private val PageRankIters = 8

  /** The q_pagerank oracle: the SAME fixed power iteration, unrolled as
    * a CTE chain (r0 → r1 → … — DuckDB's recursive CTEs can't aggregate
    * over the recursive table, so the iterations are generated). Every
    * arithmetic step mirrors Graph.pageRank's expression order so the
    * doubles agree to well inside the round-6 gate. Every CTE is
    * MATERIALIZED: each r_i is referenced twice (dm_{i+1} and the
    * contribution join), so inlining would copy the whole chain 2^iters
    * times — the unhinted query takes minutes where the materialized
    * one takes 60 ms. */
  private def pageRankSql(iters: Int): String = {
    val header =
      """WITH edges AS MATERIALIZED (
        |  SELECT DISTINCT source AS src,
        |         'src' || ((doc_id * 7) % 20) AS dst
        |  FROM documents
        |  WHERE source <> 'src' || ((doc_id * 7) % 20)
        |    AND source <> 'src19'),
        |nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS c FROM nodes),
        |outdeg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY 1),
        |r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT c FROM nn) AS rank FROM nodes)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s""",
         |dm$i AS MATERIALIZED (
         |  SELECT coalesce(sum(r.rank), 0) AS dm
         |  FROM r${i - 1} r LEFT JOIN outdeg o ON r.node = o.src
         |  WHERE o.src IS NULL),
         |r$i AS MATERIALIZED (
         |  SELECT nd.node,
         |         (1 - 0.85) / (SELECT c FROM nn)
         |         + 0.85 * (coalesce(c.contrib, 0)
         |                   + (SELECT dm FROM dm$i) / (SELECT c FROM nn)) AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum((1.0 / o.deg) * r.rank) AS contrib
         |    FROM edges e
         |    JOIN r${i - 1} r ON e.src = r.node
         |    JOIN outdeg o ON e.src = o.src
         |    GROUP BY 1) c ON nd.node = c.node)""".stripMargin
    }.mkString
    header + iterCtes + s"\nSELECT node, round(rank, 6) AS rank FROM r$iters"
  }

  private val LabelPropIters = 4

  /** Unrolled synchronous LPA rounds (the pageRankSql discipline —
    * every chained CTE MATERIALIZED). Round rule: most frequent
    * neighbor label, ties to the smallest label, over the symmetrized
    * deduplicated self-loop-free edge list. */
  private def labelPropSql(iters: Int): String = {
    val header =
      """WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT source AS src,
        |         'src' || ((doc_id * 7) % 20) AS dst
        |  FROM documents
        |  WHERE source <> 'src' || ((doc_id * 7) % 20)),
        |sym AS MATERIALIZED (
        |  SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
        |r0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM sym)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s""",
         |r$i AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT s.dst AS node, l.label,
         |           row_number() OVER (PARTITION BY s.dst
         |                              ORDER BY count(*) DESC, l.label ASC) AS rn
         |    FROM sym s JOIN r${i - 1} l ON l.node = s.src
         |    GROUP BY s.dst, l.label) t WHERE rn = 1)""".stripMargin
    }.mkString
    header + iterCtes + s"\nSELECT node, label FROM r$iters"
  }

  val oracleSql: Map[String, String] = Map(
    "q_pagerank" -> pageRankSql(PageRankIters),
    "q_label_prop" -> labelPropSql(LabelPropIters),
    "q_bloom_semi_join" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0)""".stripMargin,
    "q_rendezvous" ->
      """WITH s AS (SELECT i FROM range(0, 32) t(i)),
        |sc AS (
        |  SELECT d.doc_id, i AS shard,
        |         ('0x' || substr(md5('hrw:' || doc_id || ':' || i), 1, 15))::BIGINT
        |           AS score
        |  FROM documents d CROSS JOIN s),
        |r AS (
        |  SELECT doc_id, shard,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, shard ASC) AS rn
        |  FROM sc)
        |SELECT doc_id, shard, CAST(rn - 1 AS INT) AS replica_rank
        |FROM r WHERE rn <= 2""".stripMargin,
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
    // the full composed chain: budget running-sum window -> quantile
    // stages over the SELECTED set -> the two portable hash
    // permutations -> payload md5 (text re-read from the source table)
    "q_delivery_e2e" ->
      s"""WITH t AS (
         |  SELECT doc_id, n_chars, text,
         |         CASE WHEN trim(text) = '' THEN 0
         |              ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_chars, text,
         |         sum(toks) OVER (ORDER BY n_chars DESC, doc_id ASC
         |                         ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t),
         |picked AS (SELECT doc_id, n_chars, text FROM c WHERE cum <= 30000),
         |b AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS bs FROM picked),
         |st AS (
         |  SELECT doc_id, text,
         |         len(list_filter(bs, x -> n_chars > x))::INT AS stage,
         |         ${LlmGates.h60("'graft:1:' || doc_id")} AS ckey,
         |         ${LlmGates.h60("'graft:2:' || doc_id")} AS skey
         |  FROM picked, b),
         |idx AS (
         |  SELECT doc_id, text, stage,
         |         row_number() OVER (ORDER BY stage, ckey, doc_id) AS curriculum_idx,
         |         skey % 4 AS shard,
         |         row_number() OVER (PARTITION BY skey % 4
         |                            ORDER BY skey, doc_id) AS shard_pos
         |  FROM st)
         |SELECT shard, shard_pos, stage, curriculum_idx, doc_id,
         |       md5(text) AS text_md5
         |FROM idx""".stripMargin,
    "q_curriculum" ->
      s"""WITH t AS (SELECT doc_id, n_chars FROM documents),
         |b AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS bs FROM t),
         |st AS (SELECT doc_id,
         |              len(list_filter(bs, x -> n_chars > x))::INT AS stage,
         |              ${LlmGates.h60("'graft:1:' || doc_id")} AS key
         |       FROM t, b)
         |SELECT doc_id, stage,
         |       row_number() OVER (ORDER BY stage, key, doc_id) AS curriculum_idx
         |FROM st""".stripMargin,
    "q_epoch_shuffle" ->
      s"""WITH k AS (
         |  SELECT doc_id,
         |         ${LlmGates.h60("'graft:1:' || doc_id")} AS key
         |  FROM documents)
         |SELECT doc_id,
         |       key % 8 AS shard,
         |       row_number() OVER (PARTITION BY key % 8
         |                          ORDER BY key, doc_id) AS shard_pos
         |FROM k""".stripMargin,
    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, l.ts, r.click_id, r.click_ts
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') l
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS click_id, ts AS click_ts FROM events r
        |  WHERE r.event_type = 'click' AND r.user_id = l.user_id
        |    AND r.ts <= l.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) r ON true""".stripMargin,
    // identical semantics to the window arm: same definitional oracle
    "q_asof_join_bcast" ->
      """SELECT l.event_id, l.user_id, l.ts, r.click_id, r.click_ts
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') l
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS click_id, ts AS click_ts FROM events r
        |  WHERE r.event_type = 'click' AND r.user_id = l.user_id
        |    AND r.ts <= l.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) r ON true""".stripMargin,
    // identical semantics again (hot + cold arms union): same
    // definitional oracle over the skew-remapped key
    "q_asof_join_skew" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, ts,
        |         CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS user_id
        |  FROM events)
        |SELECT l.event_id, l.user_id, l.ts, r.click_id, r.click_ts
        |FROM (SELECT event_id, user_id, ts FROM ev
        |      WHERE event_type = 'purchase') l
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS click_id, ts AS click_ts FROM ev r
        |  WHERE r.event_type = 'click' AND r.user_id = l.user_id
        |    AND r.ts <= l.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) r ON true""".stripMargin,
    "q_join_streams" ->
      """SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 10 MINUTE
        | AND c.ts <= p.ts""".stripMargin,
    "q_range_join" ->
      """WITH w AS (
        |  SELECT event_id AS interval_id, ts AS start_ts,
        |         ts + INTERVAL 10 MINUTE AS end_ts
        |  FROM events WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id, w.interval_id, w.start_ts
        |FROM events e JOIN w
        |  ON e.ts >= w.start_ts AND e.ts < w.end_ts""".stripMargin,
    "q_overlap_join" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, ts AS p_start,
        |         ts + INTERVAL 5 MINUTE AS p_end
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT event_id AS e_id, ts AS e_start,
        |         ts + INTERVAL 10 MINUTE AS e_end
        |  FROM events WHERE event_type = 'error')
        |SELECT p.p_id, p.p_start, e.e_id, e.e_start
        |FROM p JOIN e
        |  ON greatest(p.p_start, e.e_start) < least(p.p_end, e.e_end)""".stripMargin,
    "q_corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |n AS (
        |  SELECT doc_id, md5(text) AS fp FROM (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 5 = 0 THEN text || ' [rev]'
        |                ELSE text END AS text
        |    FROM documents WHERE doc_id % 7 <> 0
        |    UNION ALL
        |    SELECT doc_id + 1000000 AS doc_id, text
        |    FROM documents WHERE doc_id % 11 = 0)),
        |j AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS id,
        |         CASE WHEN o.doc_id IS NULL THEN 'added'
        |              WHEN n.doc_id IS NULL THEN 'removed'
        |              WHEN o.fp <> n.fp THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT id, status FROM j WHERE status <> 'unchanged'""".stripMargin,
    "q_hll_distinct" ->
      "SELECT DISTINCT lang, 1 AS ok FROM documents",
    "q_kll_quantiles" ->
      """SELECT DISTINCT lang, t.q, 1 AS ok
        |FROM documents
        |CROSS JOIN (VALUES (0.25), (0.5), (0.9)) t(q)""".stripMargin,
    "q_theta_setops" ->
      """WITH a AS (SELECT DISTINCT lang, text FROM documents WHERE doc_id % 2 = 0),
        |b AS (SELECT DISTINCT lang, text FROM documents WHERE doc_id % 2 = 1),
        |langs AS (SELECT DISTINCT lang FROM documents),
        |u AS (SELECT lang, count(*) AS union_d FROM
        |       (SELECT lang, text FROM a UNION SELECT lang, text FROM b)
        |      GROUP BY lang),
        |i AS (SELECT a.lang, count(*) AS intersect_d FROM a
        |      JOIN b ON a.lang = b.lang AND a.text = b.text GROUP BY a.lang),
        |anb AS (SELECT a.lang, count(*) AS a_not_b_d FROM a
        |        ANTI JOIN b ON a.lang = b.lang AND a.text = b.text
        |        GROUP BY a.lang),
        |bna AS (SELECT b.lang, count(*) AS b_not_a_d FROM b
        |        ANTI JOIN a ON b.lang = a.lang AND b.text = a.text
        |        GROUP BY b.lang)
        |SELECT l.lang,
        |       CAST(coalesce(u.union_d, 0) AS BIGINT) AS union_d,
        |       CAST(coalesce(i.intersect_d, 0) AS BIGINT) AS intersect_d,
        |       CAST(coalesce(anb.a_not_b_d, 0) AS BIGINT) AS a_not_b_d,
        |       CAST(coalesce(bna.b_not_a_d, 0) AS BIGINT) AS b_not_a_d
        |FROM langs l
        |LEFT JOIN u ON l.lang = u.lang
        |LEFT JOIN i ON l.lang = i.lang
        |LEFT JOIN anb ON l.lang = anb.lang
        |LEFT JOIN bna ON l.lang = bna.lang""".stripMargin,
    "q_cms_counts" ->
      """SELECT DISTINCT lang, t.term, 1 AS ok
        |FROM documents
        |CROSS JOIN (VALUES ('src1'), ('src5')) t(term)""".stripMargin,
    "q_quality_checks" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |         count(text) AS nn_text,
        |         count(DISTINCT doc_id) AS d_id, count(doc_id) AS nn_id,
        |         count(CASE WHEN lang IN ('en','de','fr','es','zh')
        |                    THEN 1 END) AS acc, count(lang) AS nn_lang,
        |         count(CASE WHEN regexp_matches(source, '^src[0-9]+$')
        |                    THEN 1 END) AS mt, count(source) AS nn_src,
        |         min(n_chars::DOUBLE) AS lo, max(n_chars::DOUBLE) AS hi
        |  FROM documents)
        |SELECT 'non_null_rate(text)' AS rule, 'text' AS "column",
        |       round(nn_text::DOUBLE / n, 6) AS metric, 1.0 AS threshold,
        |       CASE WHEN nn_text::DOUBLE / n >= 1.0 THEN 1 ELSE 0 END AS ok
        |FROM m
        |UNION ALL
        |SELECT 'unique_rate(doc_id)', 'doc_id',
        |       round(d_id::DOUBLE / nn_id, 6), 1.0,
        |       CASE WHEN d_id::DOUBLE / nn_id >= 1.0 THEN 1 ELSE 0 END FROM m
        |UNION ALL
        |SELECT 'accepted_values(lang)', 'lang',
        |       round(acc::DOUBLE / nn_lang, 6), 1.0,
        |       CASE WHEN acc::DOUBLE / nn_lang >= 1.0 THEN 1 ELSE 0 END FROM m
        |UNION ALL
        |SELECT 'match_rate(source)', 'source',
        |       round(mt::DOUBLE / nn_src, 6), 1.0,
        |       CASE WHEN mt::DOUBLE / nn_src >= 1.0 THEN 1 ELSE 0 END FROM m
        |UNION ALL
        |SELECT 'value_range(n_chars)', 'n_chars',
        |       CASE WHEN lo >= 1.0 AND hi <= 1.0e9 THEN 1.0 ELSE 0.0 END, 1.0,
        |       CASE WHEN lo >= 1.0 AND hi <= 1.0e9 THEN 1 ELSE 0 END FROM m""".stripMargin,
    "q_scd2" ->
      """SELECT event_id, user_id, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |FROM events WHERE event_type = 'signup'""".stripMargin,
    "q_temp_rebalance" ->
      s"""WITH c AS (
         |  SELECT lang, count(*)::BIGINT AS c FROM documents
         |  WHERE lang IN ('en', 'de', 'fr') GROUP BY lang),
         |w AS (SELECT lang, c,
         |        greatest(1, floor(sqrt(c::DOUBLE))::BIGINT) AS w FROM c),
         |sw AS (SELECT sum(w)::BIGINT AS sumw FROM w),
         |nn AS (SELECT min(c * sumw // w) AS n FROM w, sw),
         |th AS (SELECT lang, ((n * w // sumw) * ${graft.operators.Sampling.Buckets} // c) AS t
         |       FROM w, sw, nn)
         |SELECT d.doc_id, d.lang FROM documents d
         |JOIN th ON d.lang = th.lang
         |WHERE ${LlmGates.h60("'graft:' || doc_id")} % ${graft.operators.Sampling.Buckets} < th.t""".stripMargin,
    "q_global_index" ->
      """SELECT event_id,
        |       row_number() OVER (ORDER BY ts, event_id) AS global_idx
        |FROM events""".stripMargin
  )
}
