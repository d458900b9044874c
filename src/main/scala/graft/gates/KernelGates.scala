package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Transformations

/**
 * Correctness-gate queries for the transformation kernel (SURVEY.md §2.1).
 *
 * Every entry pairs a Spark query built on the graft operators with a
 * DuckDB oracle re-deriving the same result in ANSI SQL. Array-valued
 * outputs are serialized with `to_json` on BOTH sides — the driver's
 * pandas comparator sorts rows by every column, and raw arrays are
 * unsortable there.
 */
object KernelGates {

  private def li(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 row 1 — renameFields (skips missing old names)
    "q_rename" -> { (s, dir) =>
      Transformations.renameFields(
        Map("l_orderkey" -> "order_key", "l_quantity" -> "qty", "bogus" -> "x")
      )(li(s, dir))
        .select("order_key", "l_linenumber", "qty")
    },
    // §2.1 row 2 — removeFields (skips missing names)
    "q_remove" -> { (s, dir) =>
      Transformations.removeFields(
        Set("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax", "l_shipdate", "not_a_column")
      )(li(s, dir))
    },
    // §2.1 row 3 — extractFields (errors only if none present)
    "q_extract" -> { (s, dir) =>
      Transformations.extractFields(
        Set("l_orderkey", "l_linenumber", "l_returnflag", "not_a_column")
      )(li(s, dir))
    },
    // §2.1 row 4 — collectFields (ordered array, originals dropped);
    // array emitted as JSON text for the comparator
    "q_collect" -> { (s, dir) =>
      Transformations.collectFields(List("l_returnflag", "l_linestatus"), "flags")(
        li(s, dir).select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      ).withColumn("flags", to_json(col("flags")))
    },
    // §2.1 row 5 — concatFields (delimited string, originals dropped)
    "q_concat" -> { (s, dir) =>
      Transformations.concatFields(List("l_returnflag", "l_linestatus"), "rf_ls", "|")(
        li(s, dir).select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      )
    },
    // §2.1 row 6 — keysToSnakeCase (kebab/camel/digit boundaries)
    "q_snake_case" -> { (s, dir) =>
      Transformations.keysToSnakeCase(
        li(s, dir).select(
          col("l_orderkey").as("orderKey"),
          col("l_linenumber").as("line-Number"),
          col("l_quantity").as("qty2x"),
          col("l_returnflag").as("HTTPFlag")
        )
      )
    },
    // §2.1 row 7 — parseLongs (".0" trim + nan whitelist → NULL)
    "q_parse_longs" -> { (s, dir) =>
      Transformations.parseLongs(Set("ok_str", "sk_str"), Set("NA"))(
        li(s, dir).select(
          col("l_orderkey"),
          col("l_linenumber"),
          concat(col("l_orderkey").cast("string"), lit(".0")).as("ok_str"),
          when(col("l_linenumber") === 1, lit("NA"))
            .otherwise(col("l_suppkey").cast("string")).as("sk_str")
        )
      )
    },
    // §2.1 row 8 — parseDoubles (nan whitelist → NULL)
    "q_parse_doubles" -> { (s, dir) =>
      Transformations.parseDoubles(Set("qty_str"), Set("."))(
        li(s, dir).select(
          col("l_orderkey"),
          col("l_linenumber"),
          when(col("l_linenumber") === 2, lit("."))
            .otherwise(col("l_quantity").cast("string")).as("qty_str")
        )
      )
    },
    // §2.1 row 9 — parseBooleans (true-set membership; non-null else false;
    // NULL stays NULL). b1 uses the default {"true"} set, b2 a custom set.
    // Booleans are emitted as int (1/0/NULL): a NULL boolean surfaces as
    // NaN in DuckDB-pandas but None in parquet-pandas, and only the
    // comparator's numeric path unifies the two.
    "q_parse_booleans" -> { (s, dir) =>
      val in = li(s, dir).select(
        col("l_orderkey"),
        col("l_linenumber"),
        when(col("l_linenumber") % 3 === 0, lit("true"))
          .when(col("l_linenumber") % 3 === 1, lit("false"))
          .otherwise(lit(null).cast("string")).as("b1"),
        when(col("l_linenumber") % 2 === 0, lit("yes"))
          .otherwise(lit("no")).as("b2")
      )
      Transformations.parseBooleans(Set("b1"))(
        Transformations.parseBooleans(Set("b2"), Set("yes", "y"))(in))
        .withColumn("b1", col("b1").cast("int"))
        .withColumn("b2", col("b2").cast("int"))
    },
    // §2.1 row 10 — parseStringArrays (Java String.split semantics:
    // trailing empties dropped, all-delimiters → [], "" → [""])
    "q_parse_string_arrays" -> { (s, dir) =>
      val in = li(s, dir).select(
        col("l_orderkey"),
        col("l_linenumber"),
        when(col("l_linenumber") === 1,
          concat(col("l_returnflag"), lit(","), col("l_linestatus"), lit(",,")))
          .when(col("l_linenumber") === 2, lit(",,"))
          .when(col("l_linenumber") === 3, lit(""))
          .otherwise(concat(col("l_returnflag"), lit(","), col("l_linestatus")))
          .as("sa")
      )
      Transformations.parseStringArrays(Set("sa"), ",")(in)
        .withColumn("sa", to_json(col("sa")))
    },
    // §2.1 row 11 — parseLongArrays (split + elementwise ".0"-trim + nan)
    "q_parse_long_arrays" -> { (s, dir) =>
      val in = li(s, dir).select(
        col("l_orderkey"),
        col("l_linenumber"),
        concat(col("l_orderkey").cast("string"), lit(".0,"),
          col("l_suppkey").cast("string"), lit(",NA")).as("la")
      )
      Transformations.parseLongArrays(Set("la"), ",", Set("NA"))(in)
        .withColumn("la", to_json(col("la")))
    },
    // §2.1 row 12 — parseDoubleArrays ("." whitelisted → NaN, the
    // reference's Str("nan") sentinel). Spark's to_json quotes NaN as
    // "NaN" while DuckDB emits a bare NaN token — normalize the spelling
    // so the value-identical arrays hash equal.
    "q_parse_double_arrays" -> { (s, dir) =>
      val in = li(s, dir).select(
        col("l_orderkey"),
        col("l_linenumber"),
        concat(col("l_discount").cast("string"), lit(",.,"),
          col("l_tax").cast("string")).as("da")
      )
      Transformations.parseDoubleArrays(Set("da"), ",", Set("."))(in)
        .withColumn("da", regexp_replace(to_json(col("da")), "\"NaN\"", "NaN"))
    },
    // §2.1 row 13 — ensureArrays (array passthrough, scalar → singleton,
    // NULL → [], absent column → empty array<string>)
    "q_ensure_arrays" -> { (s, dir) =>
      val in = li(s, dir).select(
        col("l_orderkey"),
        col("l_linenumber"),
        split(concat(col("l_returnflag"), lit(" "), col("l_linestatus")), " ").as("arr"),
        col("l_returnflag").as("scalar"),
        when(col("l_linenumber") === 1, lit(null).cast("string"))
          .otherwise(col("l_linestatus")).as("maybe")
      )
      Transformations.ensureArrays(Set("arr", "scalar", "maybe", "absent"))(in)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          to_json(col("arr")).as("arr"),
          to_json(col("scalar")).as("scalar"),
          to_json(col("maybe")).as("maybe"),
          to_json(col("absent")).as("absent")
        )
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_rename" ->
      """SELECT l_orderkey AS order_key, l_linenumber, l_quantity AS qty
        |FROM lineitem""".stripMargin,
    "q_remove" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem""".stripMargin,
    "q_extract" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag
        |FROM lineitem""".stripMargin,
    "q_collect" ->
      """SELECT l_orderkey, l_linenumber,
        |       to_json(list_value(l_returnflag, l_linestatus)) AS flags
        |FROM lineitem""".stripMargin,
    "q_concat" ->
      """SELECT l_orderkey, l_linenumber,
        |       concat_ws('|', l_returnflag, l_linestatus) AS rf_ls
        |FROM lineitem""".stripMargin,
    "q_snake_case" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_number,
        |       l_quantity AS qty_2_x, l_returnflag AS http_flag
        |FROM lineitem""".stripMargin,
    "q_parse_longs" ->
      """SELECT l_orderkey, l_linenumber, l_orderkey AS ok_str,
        |       CASE WHEN l_linenumber = 1 THEN NULL ELSE l_suppkey END AS sk_str
        |FROM lineitem""".stripMargin,
    "q_parse_doubles" ->
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_linenumber = 2 THEN 'NaN'::DOUBLE
        |            ELSE l_quantity END AS qty_str
        |FROM lineitem""".stripMargin,
    "q_parse_booleans" ->
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_linenumber % 3 = 0 THEN 1
        |            WHEN l_linenumber % 3 = 1 THEN 0
        |            ELSE NULL END AS b1,
        |       CASE WHEN l_linenumber % 2 = 0 THEN 1 ELSE 0 END AS b2
        |FROM lineitem""".stripMargin,
    "q_parse_string_arrays" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CASE WHEN l_linenumber = 1
        |                THEN l_returnflag || ',' || l_linestatus || ',,'
        |              WHEN l_linenumber = 2 THEN ',,'
        |              WHEN l_linenumber = 3 THEN ''
        |              ELSE l_returnflag || ',' || l_linestatus END AS s
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |       CASE WHEN s <> '' AND regexp_replace(s, ',+$', '') = ''
        |              THEN to_json(CAST([] AS VARCHAR[]))
        |            ELSE to_json(string_split(regexp_replace(s, ',+$', ''), ','))
        |       END AS sa
        |FROM src""".stripMargin,
    "q_parse_long_arrays" ->
      """SELECT l_orderkey, l_linenumber,
        |       to_json(list_value(l_orderkey, l_suppkey, NULL)) AS la
        |FROM lineitem""".stripMargin,
    "q_parse_double_arrays" ->
      """SELECT l_orderkey, l_linenumber,
        |       to_json(list_value(l_discount, 'NaN'::DOUBLE, l_tax)) AS da
        |FROM lineitem""".stripMargin,
    "q_ensure_arrays" ->
      """SELECT l_orderkey, l_linenumber,
        |       to_json(list_value(l_returnflag, l_linestatus)) AS arr,
        |       to_json(list_value(l_returnflag)) AS scalar,
        |       CASE WHEN l_linenumber = 1 THEN to_json(CAST([] AS VARCHAR[]))
        |            ELSE to_json(list_value(l_linestatus)) END AS maybe,
        |       to_json(CAST([] AS VARCHAR[])) AS absent
        |FROM lineitem""".stripMargin
  )
}
