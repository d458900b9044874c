package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Transformations

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory. */
object SparkEntry {

  private def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /**
   * Flagship query on /root/testdata/sf0.001: the full V2F-style transform
   * chain (snake-case → rename → typed parse → concat) over lineitem.
   */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = load(spark, dir, "lineitem")
      .select(
        col("l_orderkey").cast("string").as("orderKey"),
        col("l_linenumber").cast("string").as("line-Number"),
        col("l_quantity").cast("string").as("qty"),
        col("l_returnflag").as("returnFlag")
      )
    val chain =
      Transformations.keysToSnakeCase _ andThen
        Transformations.renameFields(Map("return_flag" -> "rf")) andThen
        Transformations.parseLongs(Set("order_key")) andThen
        Transformations.parseDoubles(Set("qty"))
    chain(li)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 row 1 — renameFields (skips missing old names)
    "q_rename" -> { (s, dir) =>
      Transformations.renameFields(
        Map("l_orderkey" -> "order_key", "l_quantity" -> "qty", "bogus" -> "x")
      )(load(s, dir, "lineitem"))
        .select("order_key", "l_linenumber", "qty")
        .orderBy("order_key", "l_linenumber")
    },
    // §2.1 row 2 — removeFields (skips missing names)
    "q_remove" -> { (s, dir) =>
      Transformations.removeFields(
        Set("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax", "l_shipdate", "not_a_column")
      )(load(s, dir, "lineitem"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    // §2.1 row 3 — extractFields (errors only if none present)
    "q_extract" -> { (s, dir) =>
      Transformations.extractFields(
        Set("l_orderkey", "l_linenumber", "l_returnflag", "not_a_column")
      )(load(s, dir, "lineitem"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    // §2.1 row 4 — collectFields (ordered array, originals dropped)
    "q_collect" -> { (s, dir) =>
      Transformations.collectFields(List("l_returnflag", "l_linestatus"), "flags")(
        load(s, dir, "lineitem").select(
          "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      ).orderBy("l_orderkey", "l_linenumber")
    },
    // §2.1 row 5 — concatFields (delimited string, originals dropped)
    "q_concat" -> { (s, dir) =>
      Transformations.concatFields(List("l_returnflag", "l_linestatus"), "rf_ls", "|")(
        load(s, dir, "lineitem").select(
          "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      ).orderBy("l_orderkey", "l_linenumber")
    },
    // §2.1 row 6 — keysToSnakeCase (kebab/camel/digit boundaries)
    "q_snake_case" -> { (s, dir) =>
      Transformations.keysToSnakeCase(
        load(s, dir, "lineitem").select(
          col("l_orderkey").as("orderKey"),
          col("l_linenumber").as("line-Number"),
          col("l_quantity").as("qty2x"),
          col("l_returnflag").as("HTTPFlag")
        )
      ).orderBy("order_key", "line_number")
    },
    // §2.1 row 7 — parseLongs (".0" trim + nan whitelist → NULL)
    "q_parse_longs" -> { (s, dir) =>
      Transformations.parseLongs(Set("ok_str", "sk_str"), Set("NA"))(
        load(s, dir, "lineitem").select(
          col("l_orderkey"),
          col("l_linenumber"),
          concat(col("l_orderkey").cast("string"), lit(".0")).as("ok_str"),
          when(col("l_linenumber") === 1, lit("NA"))
            .otherwise(col("l_suppkey").cast("string")).as("sk_str")
        )
      ).orderBy("l_orderkey", "l_linenumber")
    },
    // §2.1 row 8 — parseDoubles (nan whitelist → NULL)
    "q_parse_doubles" -> { (s, dir) =>
      Transformations.parseDoubles(Set("qty_str"), Set("."))(
        load(s, dir, "lineitem").select(
          col("l_orderkey"),
          col("l_linenumber"),
          when(col("l_linenumber") === 2, lit("."))
            .otherwise(col("l_quantity").cast("string")).as("qty_str")
        )
      ).orderBy("l_orderkey", "l_linenumber")
    }
  )

  /**
   * DuckDB-runnable oracle SQL per queries key. Column names and order-by
   * must match the Spark result (the driver sorts columns by name before
   * hashing values).
   */
  def oracleSql: Map[String, String] = Map(
    "q_rename" ->
      """SELECT l_orderkey AS order_key, l_linenumber, l_quantity AS qty
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q_remove" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q_extract" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q_collect" ->
      """SELECT l_orderkey, l_linenumber,
        |       list_value(l_returnflag, l_linestatus) AS flags
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q_concat" ->
      """SELECT l_orderkey, l_linenumber,
        |       concat_ws('|', l_returnflag, l_linestatus) AS rf_ls
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q_snake_case" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_number,
        |       l_quantity AS qty_2_x, l_returnflag AS http_flag
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q_parse_longs" ->
      """SELECT l_orderkey, l_linenumber, l_orderkey AS ok_str,
        |       CASE WHEN l_linenumber = 1 THEN NULL ELSE l_suppkey END AS sk_str
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q_parse_doubles" ->
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_linenumber = 2 THEN NULL ELSE l_quantity END AS qty_str
        |FROM lineitem ORDER BY 1, 2""".stripMargin
  )
}
