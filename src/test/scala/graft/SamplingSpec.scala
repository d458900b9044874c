package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("hashSample: deterministic, repartition-stable, ~fraction of rows") {
    val n = docs.count()
    val a = Sampling.hashSample(docs, "doc_id", 0.25).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.25).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // membership is a function of (seed, id), not partitioning
    assert(math.abs(a.size.toDouble / n - 0.25) < 0.1)
    // different seeds select different (overlapping but not equal) rows
    val c = Sampling.hashSample(docs, "doc_id", 0.25, seed = "other").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(c != a)
    // boundary fractions
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == n)
    // below-resolution fractions fail loudly instead of sampling nothing
    intercept[IllegalArgumentException] {
      Sampling.hashSample(docs, "doc_id", 0.1 / Sampling.Buckets)
    }
    // (tiny LAST splits absorb the rounding remainder by design, so the
    // zero-width check is exercised with the tiny split in the middle)
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id",
        Seq(("val", 0.01 / Sampling.Buckets), ("train", 1.0)))
    }
  }

  test("hashSample of a smaller fraction is a subset of a larger one (same seed)") {
    val small = Sampling.hashSample(docs, "doc_id", 0.1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(docs, "doc_id", 0.3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large)) // nested samples: growing the sample keeps prior members
  }

  test("splitAssign: total coverage, disjoint splits, weights ~respected, integer weights ok") {
    val out = Sampling.splitAssign(docs, "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(out.keySet == Set("train", "val", "test"))
    assert(out.values.sum == n.toLong) // every row in exactly one split
    assert(math.abs(out("train") / n - 0.8) < 0.1)
    // unnormalized integer weights give the same assignment
    val byInts = Sampling.splitAssign(docs, "doc_id",
        Seq(("train", 8.0), ("val", 1.0), ("test", 1.0)))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byInts == out)
  }

  test("splitAssign with one split labels everything") {
    val out = Sampling.splitAssign(docs, "doc_id", Seq(("all", 1.0)))
    assert(out.filter(col("split") === "all").count() == docs.count())
  }

  test("sampleByStrata: per-stratum fractions, nesting, default fallback, membership stability") {
    val out = Sampling.sampleByStrata(docs, "doc_id", "lang",
        Seq(("en", 0.5), ("de", 0.2), ("fr", 0.0)), defaultFraction = 0.05)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("en").toDouble / totals("en") - 0.5) < 0.15)
    assert(math.abs(out("de").toDouble / totals("de") - 0.2) < 0.15)
    assert(!out.contains("fr")) // fraction 0.0 drops the stratum entirely
    // strata not listed fall back to defaultFraction
    val others = totals.keySet -- Set("en", "de", "fr")
    assert(others.forall(l => out.getOrElse(l, 0L) <= totals(l)))
    // a stratum's members are the SAME rows hashSample(fraction) picks:
    // changing another stratum's fraction cannot reshuffle this one
    val en = Sampling.sampleByStrata(docs, "doc_id", "lang", Seq(("en", 0.5)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val enGlobal = Sampling.hashSample(docs.filter(col("lang") === "en"), "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(en == enGlobal)
    // nested per stratum: en@0.2 ⊂ en@0.5
    val enSmall = Sampling.sampleByStrata(docs, "doc_id", "lang", Seq(("en", 0.2)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(enSmall.subsetOf(en))
    intercept[IllegalArgumentException] { // duplicate strata rejected
      Sampling.sampleByStrata(docs, "doc_id", "lang", Seq(("en", 0.1), ("en", 0.2)))
    }
    intercept[IllegalArgumentException] { // below-resolution fraction fails loudly
      Sampling.sampleByStrata(docs, "doc_id", "lang", Seq(("en", 0.1 / Sampling.Buckets)))
    }
  }

  test("topKBy: exact top-k per group, deterministic tiebreak, WindowGroupLimit in plan") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
      ("b", 5L, 5.0)
    ).toDF("grp", "doc_id", "score")
    val out = Sampling.topKBy(df, "grp", "score", k = 2, idCol = "doc_id")
      .select("grp", "doc_id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // ties on score=30.0 break by ascending doc_id: 2 before 4; doc 3 is cut
    assert(out == Set(("a", 2L, 1), ("a", 4L, 2), ("b", 5L, 1)))
    // ascending keeps the smallest
    val asc = Sampling.topKBy(df, "grp", "score", k = 1, idCol = "doc_id", desc = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(asc == Set(1L, 5L))
    // NULL scores rank LAST in both directions (never outrank real rows)
    val withNull = Seq(("a", 1L, Some(1.0)), ("a", 2L, None: Option[Double]))
      .toDF("grp", "doc_id", "score")
    Seq(true, false).foreach { d =>
      val top = Sampling.topKBy(withNull, "grp", "score", 1, "doc_id", desc = d)
        .select("doc_id").head.getLong(0)
      assert(top == 1L, s"desc=$d kept the NULL-score row")
    }
    // the rank-limit filter must plan as WindowGroupLimit so each map
    // partition prunes to its local top-k BEFORE the shuffle
    val plan = Sampling.topKBy(docs, "lang", "n_chars", k = 5, idCol = "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    intercept[IllegalArgumentException] { Sampling.topKBy(df, "grp", "score", 0, "doc_id") }
  }

  test("rebalance: realized mix tracks integer target weights; scarcest stratum binds") {
    import spark.implicits._
    // en is abundant, de scarce: de binds the total at weight parity
    val df = ((1L to 800L).map(i => (i, "en")) ++ (801L to 900L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val out = Sampling.rebalance(df, "doc_id", "lang", Seq(("en", 1L), ("de", 1L)))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // N = min(800*2/1, 100*2/1) = 200 → 100 per stratum; de keeps ~all
    // 100, en samples ~100 of 800 (hash-approximate)
    assert(out("de") > 85 && out("de") <= 100, out.toString)
    assert(math.abs(out("en") - 100.0) / 100.0 < 0.35, out.toString)
    // strata outside the target mix are dropped
    val plusZh = df.union(Seq((901L, "zh")).toDF("doc_id", "lang"))
    val kept = Sampling.rebalance(plusZh, "doc_id", "lang", Seq(("en", 1L), ("de", 1L)))
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(!kept.contains("zh"))
    // a target stratum with no corpus rows fails loudly
    intercept[IllegalArgumentException] {
      Sampling.rebalance(df, "doc_id", "lang", Seq(("en", 1L), ("ja", 1L)))
    }
    intercept[IllegalArgumentException] {
      Sampling.rebalance(df, "doc_id", "lang", Seq(("en", 0L)))
    }
    // a stratum whose cut rounds to zero buckets fails loudly instead of
    // silently vanishing from the mix: with weights tiny:big = 1000:1,
    // N = min(3·1001/1000, 1000·1001/1) = 3 and big's take is
    // floor(3·1/1001) = 0 — the engine must refuse, not emit a 3:0 mix
    val extreme = ((1L to 3L).map(i => (i, "tiny")) ++ (100L to 1099L).map(i => (i, "big")))
      .toDF("doc_id", "lang")
    intercept[IllegalArgumentException] {
      Sampling.rebalance(extreme, "doc_id", "lang",
        Seq(("tiny", 1000L), ("big", 1L)))
    }
  }

  test("keepTopFraction: rank-wise cut, tiny groups keep one row, single window node") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 40.0), ("a", 3L, 30.0), ("a", 4L, 20.0),
      ("b", 5L, 1.0))
      .toDF("grp", "doc_id", "score")
    val out = Sampling.keepTopFraction(df, "grp", "score", 0.5, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // group a: floor(0.5*4)=2 → docs 2,3; group b: floor(0.5*1)=0 → min 1 row
    assert(out == Set(2L, 3L, 5L))
    // exact under ties: deterministic doc_id tiebreak picks the lower id
    val tied = Seq(("a", 1L, 5.0), ("a", 2L, 5.0)).toDF("grp", "doc_id", "score")
    val cut = Sampling.keepTopFraction(tied, "grp", "score", 0.5, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cut == Set(1L))
    // rank and count share one Window node over one exchange
    val plan = Sampling.keepTopFraction(docs, "lang", "n_chars", 0.5, "doc_id")
      .queryExecution.executedPlan.toString
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1, s"expected one Window node:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("sampling decisions equal the JVM md5 reference, random weights (seeded)") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(20260812L)
    val ids = (1L to 300L)
    val df = ids.toDF("doc_id")
    def bucket(id: Long, seed: String = "graft"): Long =
      graft.functions.Md5Long60Expr.hash(UTF8String.fromString(s"$seed:$id")) %
        Sampling.Buckets
    // hashSample membership = bucket < fraction·Buckets, for random fractions
    for (_ <- 1 to 3) {
      val f = 0.05 + rng.nextDouble() * 0.9
      val got = Sampling.hashSample(df, "doc_id", f)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = ids.filter(bucket(_) < (f * Sampling.Buckets).toLong).toSet
      assert(got == want, s"fraction $f")
    }
    // splitAssign label = cumulative-range decision, for random weight vectors
    for (_ <- 1 to 3) {
      val k = 2 + rng.nextInt(3)
      val weights = (1 to k).map(i => s"s$i" -> (0.05 + rng.nextDouble()))
      val got = Sampling.splitAssign(df, "doc_id", weights)
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val total = weights.map(_._2).sum
      val bounds = weights.inits.toSeq.reverse.tail
        .map(ws => (ws.last._1, (ws.map(_._2).sum / total * Sampling.Buckets).toLong))
      val withLast = bounds.init :+ (bounds.last._1, Sampling.Buckets)
      val want = ids.map { id =>
        val b = bucket(id)
        id -> withLast.find(b < _._2).get._1
      }.toMap
      assert(got == want, s"weights $weights")
    }
  }

  test("binByTokenBudget: bins respect the budget up to one straddling row") {
    import spark.implicits._
    val df = Seq(
      (1L, 900L), (2L, 900L), (3L, 900L), // bins: prefix 0, 900, 1800
      (4L, 5000L),                        // oversized row
      (5L, 100L)
    ).toDF("doc_id", "tok")
    val out = Sampling.binByTokenBudget(df, "tok", "doc_id", budget = 2000L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin_id")).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 3L))
    // per-bin totals: at most budget + one row's tokens
    val sums = Sampling.binByTokenBudget(df, "tok", "doc_id", budget = 2000L)
      .groupBy("bin_id").agg(sum("tok").as("s"), max("tok").as("m")).collect()
    sums.foreach(r => assert(r.getLong(1) <= 2000L + r.getLong(2)))
  }

  test("binByTokenBudget global arm: distributed prefix equals a single-task window") {
    import spark.implicits._
    // many input partitions + an out-of-order id column: the range
    // shuffle must reassemble the exact global order before prefixing
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((1L to 5000L).toList).map(i => (i, (i % 97) + 1))
    val df = rows.toDF("doc_id", "tok").repartition(17)
    val got = Sampling.binByTokenBudget(df, "tok", "doc_id", budget = 500L)
      .select("doc_id", "bin_id")
      .as[(Long, Long)].collect().toMap
    // reference: exact driver-side prefix sum in id order
    var prefix = 0L
    val want = (1L to 5000L).map { i =>
      val b = prefix / 500L
      prefix += (i % 97) + 1
      i -> b
    }.toMap
    assert(got === want)
    // NULL tokens count 0 (window-arm sum-skips-null parity)
    val withNull = Seq((1L, Some(100L)), (2L, None), (3L, Some(450L)))
      .toDF("doc_id", "tok")
    val nb = Sampling.binByTokenBudget(withNull, "tok", "doc_id", budget = 500L)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    assert(nb === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("duplicate split names are rejected loudly") {
    // Seq(("train",0.8),("train",0.1)) would otherwise silently pool 0.9
    // of the bucket space into 'train'
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id",
        Seq(("train", 0.8), ("train", 0.1), ("test", 0.1)))
    }
  }

  test("rebalance works on a non-string strata column (int domain id)") {
    import spark.implicits._
    val df = ((1L to 400L).map(i => (i, 7)) ++ (401L to 500L).map(i => (i, 9)))
      .toDF("doc_id", "domain_id")
    val out = Sampling.rebalance(df, "doc_id", "domain_id",
        Seq(("7", 1L), ("9", 1L)))
      .groupBy("domain_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // scarce stratum 9 binds: N = 200 → ~100 per stratum
    assert(out.keySet == Set(7, 9), out.toString)
    assert(out(9) > 80 && out(9) <= 100, out.toString)
  }

  test("temp/output column collisions fail loudly instead of overwriting caller data") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2.0)).toDF("grp", "doc_id", "score")
    intercept[IllegalArgumentException] { // topKBy default output column
      Sampling.topKBy(df.withColumn("rank", lit(0)), "grp", "score", 1, "doc_id")
    }
    intercept[IllegalArgumentException] { // keepTopFraction staging columns
      Sampling.keepTopFraction(df.withColumn("__rn", lit(0)), "grp", "score", 0.5, "doc_id")
    }
    intercept[IllegalArgumentException] { // binByTokenBudget output column
      Sampling.binByTokenBudget(df.withColumn("bin_id", lit(0)), "score", "doc_id", 10L)
    }
    intercept[IllegalArgumentException] { // splitAssign output column
      Sampling.splitAssign(df.withColumn("split", lit("x")), "doc_id", Seq(("all", 1.0)))
    }
  }

  test("binByTokenBudget partitioned by key bins each group independently") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, 1500L), ("en", 2L, 1500L),
      ("de", 3L, 1500L), ("de", 4L, 1500L)
    ).toDF("lang", "doc_id", "tok")
    val out = Sampling.binByTokenBudget(df, "tok", "doc_id", budget = 2000L,
        byCol = Some("lang"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin_id")).toMap
    // both groups restart at bin 0 — doc 3 is de's FIRST row, not a continuation
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("packSequences: id-ordered concat per bin, totals preserved, keyed form keyed") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 900L), (2L, "bravo", 900L), (3L, "charlie", 900L),
      (4L, "delta", 900L), (5L, "echo", 2500L))
      .toDF("doc_id", "text", "tok")
    val out = Sampling.packSequences(df, "text", "doc_id", "tok", budget = 2000L)
      .collect().map(r => r.getAs[Long]("bin_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"), r.getAs[String]("packed")))
      .toMap
    // prefix sums 0/900/1800/2700/3600 -> bins 0,0,0,1,1
    assert(out(0L) == ((3L, 2700L, "alpha\n\nbravo\n\ncharlie")))
    assert(out(1L) == ((2L, 3400L, "delta\n\necho")))
    // every token lands in exactly one bin
    assert(out.values.map(_._2).sum == 900L * 4 + 2500L)
    // keyed form packs each group independently on its own bin space
    val keyed = Sampling.packSequences(
        df.withColumn("lang", when(col("doc_id") <= 2, "en").otherwise("de")),
        "text", "doc_id", "tok", budget = 2000L, byCol = Some("lang"))
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin_id")) ->
        r.getAs[String]("packed")).toMap
    assert(keyed(("en", 0L)) == "alpha\n\nbravo")
    // de restarts its prefix sum: 0/900/1800 all open bin 0
    assert(keyed(("de", 0L)) == "charlie\n\ndelta\n\necho")
    assert(!keyed.contains(("de", 1L)))
  }

  test("keyed packSequences plans ONE exchange: the groupBy reuses the window's partitioning") {
    import spark.implicits._
    val df = (1L to 100L).map(i =>
      (i, s"t$i", 100L + i % 7, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "tok", "lang")
    val plan = Sampling.packSequences(df, "text", "doc_id", "tok", 500L,
        byCol = Some("lang"))
      .queryExecution.executedPlan.toString
    // HashPartitioning(lang) satisfies the (lang, bin_id) aggregation's
    // clustered distribution, so binning + packing share one shuffle
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  test("withQuantileBucket: boundary ties fall low, NULL bucket for NULL, no window exchange") {
    import spark.implicits._
    // values 1..8: quartile boundaries 2.75 / 4.5 / 6.25
    val df = (1 to 8).map(i => (i.toLong, Option(i))).toDF("id", "v")
      .unionByName(Seq((9L, Option.empty[Int])).toDF("id", "v"))
    val got = Sampling.withQuantileBucket(df, "v", nBuckets = 4)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Integer]("q_bucket")).map(_.toInt)).toMap
    assert(got(1L).contains(0) && got(2L).contains(0))
    assert(got(3L).contains(1) && got(4L).contains(1))
    assert(got(5L).contains(2) && got(6L).contains(2))
    assert(got(7L).contains(3) && got(8L).contains(3))
    assert(got(9L).isEmpty)
    // a value exactly AT a boundary falls to the lower bucket (strict >)
    val tie = Sampling.withQuantileBucket(
        Seq(1, 1, 3, 3).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v"),
        "v", nBuckets = 2) // median boundary = 2.0... values 1,1,3,3 -> boundary 2
      .collect().map(r => r.getInt(1) -> r.getInt(2)).distinct.toMap
    assert(tie(1) == 0 && tie(3) == 1)
    // approx variant agrees on well-separated data
    val approx = Sampling.withQuantileBucket(df, "v", nBuckets = 4, approx = true)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Integer]("q_bucket")).map(_.toInt)).toMap
    assert(approx(1L).contains(0) && approx(8L).contains(3))
    // no Window/SinglePartition in the plan — boundaries broadcast, bucketing
    // is a projection (the anti-ntile design)
    val plan = Sampling.withQuantileBucket(df, "v", nBuckets = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    intercept[IllegalArgumentException] {
      Sampling.withQuantileBucket(df, "v", nBuckets = 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.withQuantileBucket(df.withColumn("q_bucket", lit(1)), "v")
    }
  }

  test("temperatureRebalance: T=2 upsamples scarce strata relative to natural mix") {
    import spark.implicits._
    // natural mix 1600:100 (16:1); sqrt weights 40:10 → target mix 4:1 —
    // the scarce stratum's SHARE quadruples without exhausting it
    val df = ((1L to 1600L).map(i => (i, "en")) ++ (2001L to 2100L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val out = Sampling.temperatureRebalance(df, "doc_id", "lang",
        Seq("en", "de"), temperature = 2.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // de binds: N = min(1600*50/40, 100*50/10) = 500 → takes 400/100
    // de keeps ~all 100; en samples ~400 of 1600
    assert(out("de") > 85 && out("de") <= 100, out.toString)
    assert(math.abs(out("en") - 400.0) / 400.0 < 0.2, out.toString)
    val share = out("en").toDouble / out("de")
    assert(share > 2.5 && share < 5.5, s"expected ~4:1 mix, got $share")
    // T=1 preserves the natural mix (weights = raw counts)
    val nat = Sampling.temperatureRebalance(df, "doc_id", "lang",
        Seq("en", "de"), temperature = 1.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val natShare = nat("en").toDouble / nat("de")
    assert(natShare > 10 && natShare < 22, s"expected ~16:1 natural mix, got $natShare")
    intercept[IllegalArgumentException] {
      Sampling.temperatureRebalance(df, "doc_id", "lang", Seq("en"), temperature = 0.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureRebalance(df, "doc_id", "lang", Seq("en", "ja"))
    }
  }

  test("leakageSafeSplits: transitive chains share one split; singletons match splitAssign") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 1~2, 2~3 (1 and 3 never paired directly) + pair 10~11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val w = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val got = Sampling.leakageSafeSplits(df, pairs, "doc_id", w)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 200)
    assert(got(1L) == got(2L) && got(2L) == got(3L), "chain must share a split")
    assert(got(10L) == got(11L))
    // cluster members hash on the cluster id = MIN member id
    val plain = Sampling.splitAssign(df, "doc_id", w)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(3L) == plain(1L), "cluster hashes on its min id")
    // every unpaired doc is value-identical to plain splitAssign
    ((1L to 200L).toSet -- Set(1L, 2L, 3L, 10L, 11L)).foreach { i =>
      assert(got(i) == plain(i), s"doc $i")
    }
  }

  test("selectByBudget: maximal prefix, boundary doc dropped whole, NULL weight = 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(100L), 9),  // score 9 -> first
      (2L, Some(200L), 8),
      (3L, Some(150L), 8),  // ties with 2 on score; id breaks
      (4L, Option.empty[Long], 7), // NULL weight: free
      (5L, Some(300L), 6),  // cum = 100+200+150+0+300 = 750 > 600 -> dropped
      (6L, Some(50L), 5)    // after the boundary: prefix semantics drop it too
    ).toDF("id", "w", "score")
    val kept = Sampling.selectByBudget(df, "w", budget = 600L,
        orderBy = Seq(col("score").desc, col("id").asc))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
    // exact-fit boundary is KEPT (<=, not <)
    val exact = Sampling.selectByBudget(df, "w", budget = 450L,
        orderBy = Seq(col("score").desc, col("id").asc))
      .select("id").as[Long].collect().toSet
    assert(exact == Set(1L, 2L, 3L, 4L))
    assert(Sampling.selectByBudget(df, "w", 0L,
      Seq(col("score").desc, col("id").asc)).count() == 0L)
    // a negative weight would re-admit rows after the boundary — the
    // inline guard fails loud instead of returning a non-prefix set
    val neg = Seq((1L, 10L, 2), (2L, -5L, 1)).toDF("id", "w", "score")
    val e = intercept[Exception] {
      Sampling.selectByBudget(neg, "w", 100L,
        Seq(col("score").desc, col("id").asc)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("negative weight"),
      e.toString)
    val e2 = intercept[Exception] {
      Sampling.selectByBudgetPerGroup(neg.withColumn("g", lit("x")), "w", 100L,
        "g", Seq(col("id").asc)).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("negative weight"),
      e2.toString)
  }

  test("selectByBudgetPerGroup: independent budgets, one group can't eat another's") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", 300L), (2L, "en", 300L), (3L, "en", 300L), // en: 1,2 fit 600
      (4L, "de", 500L), (5L, "de", 200L),                   // de: 4 fits, 5 overflows at 700
      (6L, "fr", 50L)                                       // fr: trivially fits
    ).toDF("id", "g", "w")
    val kept = Sampling.selectByBudgetPerGroup(df, "w", budget = 600L,
        groupCol = "g", orderBy = Seq(col("id").asc))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L, 6L))
    // the ranged (few-giant-groups) arm is value-identical
    val ranged = Sampling.selectByBudgetPerGroup(df, "w", budget = 600L,
        groupCol = "g", orderBy = Seq(col("id").asc), ranged = true)
      .select("id").as[Long].collect().toSet
    assert(ranged == kept)
  }

  test("withRunningTotalGrouped equals the window spelling on random grouped data") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val groups = Array("en", "de", "fr", null)
    val rows = (1L to 400L).map(i =>
      (i, groups(rnd.nextInt(groups.length)), rnd.nextInt(100).toLong))
    val df = rows.toDF("id", "g", "w")
    val got = graft.operators.TrainingOrder.withRunningTotalGrouped(
        df, "g", Seq(col("id").asc), "w", "cum", numPartitions = Some(9))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    // reference: per-group driver-side scan
    rows.groupBy(_._2).foreach { case (_, rs) =>
      var acc = 0L
      rs.sortBy(_._1).foreach { case (id, _, w) =>
        acc += w
        assert(got(id) == acc, s"id $id")
      }
    }
  }

  test("withRunningTotalGrouped rejects non-atomic group keys (reference equality)") {
    import spark.implicits._
    // a binary key compares by reference in the driver offset map and
    // the per-row group-change check — totals would silently reset per
    // row; the require names the fault and the escape
    val bin = Seq((1L, Array[Byte](1), 5L), (2L, Array[Byte](1), 7L))
      .toDF("id", "g", "w")
    val e = intercept[IllegalArgumentException] {
      graft.operators.TrainingOrder.withRunningTotalGrouped(
        bin, "g", Seq(col("id").asc), "w", "cum")
    }
    assert(e.getMessage.contains("REFERENCE"), e.getMessage)
    val arr = Seq((1L, Seq("a"), 5L)).toDF("id", "g", "w")
    intercept[IllegalArgumentException] {
      graft.operators.TrainingOrder.withRunningTotalGrouped(
        arr, "g", Seq(col("id").asc), "w", "cum")
    }
    // the hex() escape hatch works and totals accumulate correctly
    val got = graft.operators.TrainingOrder.withRunningTotalGrouped(
        bin.withColumn("g", hex(col("g"))), "g", Seq(col("id").asc), "w", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 5L, 2L -> 12L))
  }
}
