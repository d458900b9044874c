package graft

import graft.operators.Transformations
import org.apache.spark.sql.Row

/**
 * Mirrors the behavioral contract of the reference's kernel spec
 * (reference: common/src/test/scala/.../MsgTransformationsSpec.scala),
 * re-expressed over DataFrames.
 */
class TransformationsSpec extends SparkSpec {
  import spark.implicits._

  private def df1 = Seq(("bar", 123, "qux")).toDF("foo", "foobar", "baz")

  // renameFields
  test("rename fields") {
    val out = Transformations.renameFields(Map("baz" -> "wot", "foo" -> "wat"))(df1)
    assert(out.columns.toSeq == Seq("wat", "foobar", "wot"))
    assert(out.collect().head == Row("bar", 123, "qux"))
  }

  test("rename continues when a field-to-rename doesn't exist") {
    val out = Transformations.renameFields(Map("abc" -> "xyz", "lol" -> "haha"))(df1)
    assert(out.columns.toSeq == Seq("foo", "foobar", "baz"))
  }

  // removeFields
  test("remove fields, skipping missing ones") {
    val out = Transformations.removeFields(Set("foo", "derp"))(df1)
    assert(out.columns.toSeq == Seq("foobar", "baz"))
  }

  // extractFields
  test("extract present fields") {
    val out = Transformations.extractFields(Set("foo", "baz", "nope"))(df1)
    assert(out.columns.toSeq == Seq("foo", "baz"))
  }

  test("extract fails when none of the fields are present") {
    assertThrows[IllegalArgumentException] {
      Transformations.extractFields(Set("nope", "nada"))(df1)
    }
  }

  // collectFields
  test("collect fields into an ordered array, dropping originals") {
    val in = Seq(("a", "b", "c")).toDF("x", "y", "z")
    val out = Transformations.collectFields(List("z", "x"), "coll")(in)
    assert(out.columns.toSeq == Seq("y", "coll"))
    assert(out.select("coll").head.getSeq[String](0) == Seq("c", "a"))
  }

  test("collect skips missing fields") {
    val in = Seq(("a", "b")).toDF("x", "y")
    val out = Transformations.collectFields(List("y", "nope"), "coll")(in)
    assert(out.select("coll").head.getSeq[String](0) == Seq("b"))
  }

  // concatFields
  test("concat fields with separator, dropping originals") {
    val in = Seq(("a", "b", "keep")).toDF("x", "y", "k")
    val out = Transformations.concatFields(List("y", "x"), "combined", ":")(in)
    assert(out.columns.toSeq == Seq("k", "combined"))
    assert(out.select("combined").head.getString(0) == "b:a")
  }

  test("concat fails when an expected field is missing") {
    assertThrows[IllegalArgumentException] {
      Transformations.concatFields(List("foo", "oops"), "combined", ":")(df1)
    }
  }

  // keysToSnakeCase — same cases as the reference spec
  test("snake-case column names (kebab, camel, digit boundaries)") {
    val cases = Map(
      "hi-There" -> "hi_there",
      "HIThere" -> "hi_there",
      "hiThere" -> "hi_there",
      "hi11There" -> "hi_11_there",
      "hi11there" -> "hi_11_there",
      "hiThere11" -> "hi_there_11",
      "11hiThere" -> "11_hi_there"
    )
    cases.foreach { case (in, want) =>
      assert(Transformations.keyToSnakeCase(in) == want, s"for $in")
    }
    val in = Seq((1, 2)).toDF("hiThere", "hi11there")
    assert(
      Transformations.keysToSnakeCase(in).columns.toSeq ==
        Seq("hi_there", "hi_11_there")
    )
  }

  // parseLongs
  test("parse longs, including trailing-.0 trim") {
    val in = Seq(("100", "1000.0", "-10000", "keep")).toDF("a", "b", "c", "d")
    val out = Transformations.parseLongs(Set("a", "b", "c", "z"))(in)
    assert(out.collect().head == Row(100L, 1000L, -10000L, "keep"))
    assert(out.schema("d").dataType.typeName == "string")
  }

  test("parse longs fails on true floats") {
    val in = Seq(Tuple1("1000.23")).toDF("a")
    assertThrows[NumberFormatException] {
      Transformations.parseLongs(Set("a"))(in).collect()
    }
  }

  test("parse longs maps whitelisted nan strings to NULL") {
    val in = Seq((";", ".", "42")).toDF("a", "b", "c")
    val out = Transformations.parseLongs(Set("a", "b", "c"), Set(";", "."))(in)
    assert(out.collect().head == Row(null, null, 42L))
  }

  // parseDoubles
  test("parse doubles with nan whitelist -> NaN (reference Str(\"nan\") sentinel)") {
    val in = Seq((".", "98.7654", "", "100")).toDF("foo", "bar", "baz", "qux")
    val out =
      Transformations.parseDoubles(Set("foo", "bar", "baz", "qux"), Set(".", ""))(in)
    assert(out.collect().head == Row(Double.NaN, 98.7654, Double.NaN, 100.0))
  }

  // parseBooleans
  test("parse booleans with default and custom true-sets") {
    val in = Seq(("10.01", "false", "true", "1")).toDF("a", "b", "c", "e")
    val out = Transformations.parseBooleans(Set("a", "b", "c", "e"))(in)
    assert(out.collect().head == Row(false, false, true, false))
    val out2 =
      Transformations.parseBooleans(Set("a", "c", "e"), Set("truuu", "1"))(in)
    assert(out2.collect().head == Row(false, "false", false, true))
  }

  test("parse booleans keeps NULL as NULL") {
    val in = Seq(Tuple1[String](null)).toDF("a")
    val out = Transformations.parseBooleans(Set("a"))(in)
    assert(out.collect().head.isNullAt(0))
  }

  // parseStringArrays
  test("parse string arrays by delimiter") {
    val in = Seq(("a;b", "b;c", "d")).toDF("first", "second", "fourth")
    val out = Transformations.parseStringArrays(Set("first", "fourth"), ";")(in)
    val row = out.collect().head
    assert(row.getSeq[String](0) == Seq("a", "b"))
    assert(row.getString(1) == "b;c")
    assert(row.getSeq[String](2) == Seq("d"))
  }

  test("split drops trailing empty strings (Java split semantics)") {
    val in = Seq(("a;b;;", ";;", "", "a;;b")).toDF("a", "b", "c", "d")
    val out = Transformations.parseStringArrays(Set("a", "b", "c", "d"), ";")(in)
    val row = out.collect().head
    assert(row.getSeq[String](0) == Seq("a", "b"))
    assert(row.getSeq[String](1) == Seq())
    assert(row.getSeq[String](2) == Seq(""))
    assert(row.getSeq[String](3) == Seq("a", "", "b"))
  }

  // parseLongArrays
  test("parse long arrays with nan whitelist") {
    val in = Seq(("-100;200", "tabouleh;falafel")).toDF("a", "d")
    val out =
      Transformations.parseLongArrays(Set("a", "d"), ";", Set("tabouleh", "falafel"))(in)
    val row = out.collect().head
    assert(row.getSeq[Any](0) == Seq(-100L, 200L))
    assert(row.getSeq[Any](1) == Seq(null, null))
  }

  // parseDoubleArrays
  test("parse double arrays, '.' whitelisted to NaN") {
    val in = Seq(Tuple1("-1.01;.;1.23")).toDF("a")
    val out = Transformations.parseDoubleArrays(Set("a"), ";", Set("."))(in)
    // bit-level compare: primitive NaN != NaN under ==
    assert(out.collect().head.getSeq[Double](0).map(java.lang.Double.doubleToLongBits) ==
      Seq(-1.01, Double.NaN, 1.23).map(java.lang.Double.doubleToLongBits))
  }

  // ensureArrays
  test("ensure arrays: scalar→singleton, array passthrough, null→empty, absent→added") {
    val in = Seq(("foo", Seq("bar"), 1234L, null.asInstanceOf[String]))
      .toDF("a", "b", "c", "n")
    val out = Transformations.ensureArrays(Set("a", "b", "n", "e"))(in)
    val row = out.select("a", "b", "c", "n", "e").collect().head
    assert(row.getSeq[String](0) == Seq("foo"))
    assert(row.getSeq[String](1) == Seq("bar"))
    assert(row.getLong(2) == 1234L)
    assert(row.getSeq[String](3) == Seq())
    assert(row.getSeq[String](4) == Seq())
  }
}
