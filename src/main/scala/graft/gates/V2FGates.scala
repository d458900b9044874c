package graft.gates

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.{DatasetSpecificPipeline, V2F, V2FTables}
import graft.sources.{JsonLines, TsvSource}

/**
 * Correctness-gate queries for the V2F pipelines (SURVEY.md §2.3).
 *
 * The typed-conversion chains are gated against lineitem/orders-derived
 * string columns (same re-derivation the oracle performs in SQL), so the
 * full 60k-row tables flow through the real `V2F.transform` /
 * `extractVariants` / `mergeVariants` code paths. The end-to-end drivers
 * are gated through real file fixtures.
 */
object V2FGates {

  private def li(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    ()
  }

  /** lineitem rows re-shaped as a raw (all-string) V2F table. */
  private def rawV2f(s: SparkSession, dir: String): DataFrame =
    li(s, dir).select(
      concat(lit("v"), col("l_orderkey"), lit("_"), col("l_linenumber")).as("var_id"),
      col("l_returnflag").as("chromosome"),
      concat(col("l_partkey").cast("string"), lit(".0")).as("position"),
      lit("A").as("reference"),
      lit("T").as("alt"),
      col("l_discount").cast("string").as("eaf"),
      col("l_tax").cast("string").as("maf"),
      col("l_extendedprice").cast("string").as("p_value"),
      col("l_quantity").cast("string").as("z_score"),
      col("l_discount").cast("string").as("std_err"),
      col("l_tax").cast("string").as("beta"),
      concat(col("l_suppkey").cast("string"), lit(".0")).as("n"),
      when(col("l_linenumber") % 3 === 0, lit("true"))
        .when(col("l_linenumber") % 3 === 1, lit("false"))
        .otherwise(lit(null).cast("string")).as("top"),
      lit("/data/in/x.csv").as(TsvSource.PathCol)
    )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.3 row 20 — extractAndConvert: TSV glob → snake_case records
    "q_v2f_extract_convert" -> { (s, _) =>
      val dir = Files.createTempDirectory("graft-v2f")
      write(dir, "frequency-analysis/a.csv",
        "varId\tchromosome\tposition\treference\talt\teaf\tmaf\n" +
          "v1\t1\t100.0\tA\tT\t0.5\t0.25\n" +
          "v2\t2\t200\tG\tC\t\t0.125\n")
      V2F.extractAndConvert(s, V2FTables.FrequencyAnalysis, dir.toString)
        .drop(TsvSource.PathCol)
    },
    // §2.3 row 21 — extractVariants: rename var_id→id, project identity
    // fields, long-parse position
    "q_v2f_variants" -> { (s, dir) =>
      V2F.extractVariants(V2FTables.FrequencyAnalysis)(rawV2f(s, dir))
    },
    // §2.3 row 22a — transform, FrequencyAnalysis chain (rename, remove,
    // double-parse)
    "q_v2f_transform_freq" -> { (s, dir) =>
      V2F.transform(V2FTables.FrequencyAnalysis)(
        rawV2f(s, dir).select(
          "var_id", "chromosome", "position", "reference", "alt", "eaf", "maf",
          TsvSource.PathCol)
      )
    },
    // §2.3 row 22b — transform, MetaAnalysisTransEthnic chain (doubles,
    // longs with ".0" trim, booleans)
    "q_v2f_transform_te" -> { (s, dir) =>
      // `top` emitted as int 1/0/NULL — see q_parse_booleans comparator note
      V2F.transform(V2FTables.MetaAnalysisTransEthnic)(
        rawV2f(s, dir).select(
          "var_id", "chromosome", "position", "reference", "alt", "p_value",
          "z_score", "std_err", "beta", "n", "top", TsvSource.PathCol)
      ).withColumn("top", col("top").cast("int"))
    },
    // §2.3 row 23 — mergeVariants: unionByName + one row per id. The three
    // inputs overlap (mod-3 slices of orders) with identical rows per id,
    // so the kept row is deterministic.
    "q_v2f_merge_variants" -> { (s, dir) =>
      val o = s.read.parquet(s"$dir/orders.parquet").select(
        concat(lit("v"), col("o_orderkey")).as("id"),
        col("o_orderstatus").as("chromosome"),
        col("o_orderkey").as("position"),
        lit("A").as("reference"),
        lit("T").as("alt")
      )
      V2F.mergeVariants(Seq(
        o.filter(col("position") % 3 <= 1),
        o.filter(col("position") % 3 >= 1),
        o.filter(col("position") % 3 === 2)
      ))
    },
    // §2.3 row 25 — DatasetSpecificPipeline end-to-end: nested JSON input
    // (recursive read), snake/rename/remove, drop-null JSON output
    "q_v2f_dataset_specific" -> { (s, _) =>
      val in = Files.createTempDirectory("graft-dsa-in")
      val out = Files.createTempDirectory("graft-dsa-out")
      write(in, "dataset-specific/a.json",
        """{"varId":"v1","chromosome":"1","position":100,"reference":"A","alt":"T","oddsRatio":1.5}""" + "\n")
      write(in, "dataset-specific/nested/b.json",
        """{"varId":"v2","chromosome":"2","position":200,"reference":"G","alt":"C","oddsRatio":2.5}""" + "\n")
      DatasetSpecificPipeline.run(s, in.toString, out.toString)
      JsonLines.read(s, s"$out/dataset-specific/*.json")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_v2f_extract_convert" ->
      """SELECT * FROM (VALUES
        |  ('v1', '1', '100.0', 'A', 'T', '0.5', '0.25'),
        |  ('v2', '2', '200',   'G', 'C', NULL,  '0.125')
        |) AS t(var_id, chromosome, position, reference, alt, eaf, maf)""".stripMargin,
    "q_v2f_variants" ->
      """SELECT concat('v', l_orderkey, '_', l_linenumber) AS id,
        |       l_returnflag AS chromosome,
        |       l_partkey AS position,
        |       'A' AS reference, 'T' AS alt
        |FROM lineitem""".stripMargin,
    "q_v2f_transform_freq" ->
      """SELECT concat('v', l_orderkey, '_', l_linenumber) AS variant_id,
        |       l_discount AS eaf, l_tax AS maf
        |FROM lineitem""".stripMargin,
    "q_v2f_transform_te" ->
      """SELECT concat('v', l_orderkey, '_', l_linenumber) AS variant_id,
        |       l_extendedprice AS p_value, l_quantity AS z_score,
        |       l_discount AS std_err, l_tax AS beta,
        |       l_suppkey AS n,
        |       CASE WHEN l_linenumber % 3 = 0 THEN 1
        |            WHEN l_linenumber % 3 = 1 THEN 0
        |            ELSE NULL END AS top
        |FROM lineitem""".stripMargin,
    "q_v2f_merge_variants" ->
      """SELECT DISTINCT concat('v', o_orderkey) AS id,
        |       o_orderstatus AS chromosome,
        |       o_orderkey AS position,
        |       'A' AS reference, 'T' AS alt
        |FROM orders""".stripMargin,
    "q_v2f_dataset_specific" ->
      """SELECT * FROM (VALUES
        |  ('v1', 1.5),
        |  ('v2', 2.5)
        |) AS t(variant_id, odds_ratio)""".stripMargin
  )
}
