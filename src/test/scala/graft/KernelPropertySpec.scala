package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.Transformations
import graft.functions.Md5Long60Expr

/**
 * Randomized (seeded, deterministic) properties pinning kernel semantics
 * to their JVM reference behaviors — the contracts SURVEY §3 promises:
 * array split must behave exactly like Java String.split, the long parse
 * must trim exactly one trailing ".0", and the native hash must equal
 * the first-15-hex-chars-of-MD5 reference computation.
 */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)

  test("parseStringArrays equals Java String.split on random delimiter soups") {
    val alphabet = "ab,;  "
    val cases = Seq.fill(400)(
      (1 to rng.nextInt(12)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString) :+
      "" :+ "," :+ ",,," :+ "a,,b,," :+ ",a"
    val df = cases.toDF("s")
    val out = Transformations.parseStringArrays(Set("s"), ",")(df)
      .collect().map(r => Option(r.getSeq[String](0)).map(_.toList).orNull)
    out.zip(cases).foreach { case (got, in) =>
      assert(got == in.split(",").toList, s"input=<$in>")
    }
  }

  test("parseLongs equals trim-one-'.0'-then-parse on random longs") {
    val cases = Seq.fill(200)(rng.nextLong() % 1000000)
    val df = cases.map(x => (x, s"$x.0")).toDF("expect", "s")
    val out = Transformations.parseLongs(Set("s"))(df).collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(0)))
    // a single ".0" is trimmed, not repeated suffixes: "7.0.0" must throw
    assertThrows[Exception] {
      Transformations.parseLongs(Set("s"))(Seq("7.0.0").toDF("s")).collect()
    }
  }

  test("parseDoubleArrays equals split-then-parse Scala reference (nan whitelist)") {
    val nums = Seq("1.5", "-2", "0", ".", "3e2", "Infinity", "7")
    val cases = Seq.fill(300)(
      (0 to rng.nextInt(5)).map(_ => nums(rng.nextInt(nums.length))).mkString(",")) :+
      "." :+ ".,."
    val out = Transformations.parseDoubleArrays(Set("s"), ",", Set("."))(cases.toDF("s"))
      .collect().map(_.getSeq[Double](0).toList)
    out.zip(cases).foreach { case (got, in) =>
      val expect = in.split(",").toList.map {
        case "." => Double.NaN
        case v => v.toDouble
      }
      // NaN-aware comparison
      assert(got.length == expect.length &&
        got.zip(expect).forall { case (a, b) =>
          java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
        }, s"input=<$in> got=$got expect=$expect")
    }
    // malformed elements throw the ANSI cast error, as the lambda form
    // did — including "" which splits to [""]
    assertThrows[NumberFormatException] {
      Transformations.parseDoubleArrays(Set("s"), ",")(Seq("1,x").toDF("s")).collect()
    }
    assertThrows[NumberFormatException] {
      Transformations.parseDoubleArrays(Set("s"), ",")(Seq("").toDF("s")).collect()
    }
  }

  test("parseLongArrays equals split-trim-parse Scala reference (nan -> NULL)") {
    val nums = Seq("15", "-2.0", "0", "NA", "700.0", "8")
    val cases = Seq.fill(300)(
      (0 to rng.nextInt(5)).map(_ => nums(rng.nextInt(nums.length))).mkString(";")) :+
      "NA" :+ "NA;NA"
    val out = Transformations.parseLongArrays(Set("s"), ";", Set("NA"))(cases.toDF("s"))
      .collect().map(r => r.getSeq[Any](0).toList)
    out.zip(cases).foreach { case (got, in) =>
      val expect = in.split(";").toList.map { raw =>
        val t = if (raw.endsWith(".0")) raw.dropRight(2) else raw
        if (t == "NA") null else t.toLong
      }
      assert(got == expect, s"input=<$in> got=$got expect=$expect")
    }
    assertThrows[NumberFormatException] {
      Transformations.parseLongArrays(Set("s"), ";")(Seq("1;7.0.0").toDF("s")).collect()
    }
  }

  test("Md5Long60Expr.hash equals the BigInteger-over-hex reference on random strings") {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to 300).foreach { _ =>
      val s = rng.alphanumeric.take(rng.nextInt(40)).mkString + (
        if (rng.nextBoolean()) "é∆" else "")
      md.reset()
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val expect = new java.math.BigInteger(hex.substring(0, 15), 16).longValueExact()
      assert(Md5Long60Expr.hash(UTF8String.fromString(s)) == expect, s"input=<$s>")
    }
  }

  test("NormalizeTextExpr/NormalizedWordsExpr equal the lower+regex composite") {
    // alphabet deliberately stresses the parity argument: Unicode
    // lowercase mappings whose result CONTAINS ASCII alnum ('İ' → i +
    // combining dot above, Kelvin 'K' → k), multi-byte gap chars (CJK,
    // é, ∆), digit/letter runs, punctuation soups, spaces
    val alphabet = "aB9 ,;é∆中文İKK--__\t\n"
    val cases = Seq.fill(500)(
      (1 to rng.nextInt(24)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString) ++
      Seq("", "   ", "---", "abc", "a b  c", "É9z", "İstanbul")
    val df = cases.toDF("s").select(
      col("s"),
      graft.functions.NormalizeTextExpr(col("s")).as("fused"),
      trim(regexp_replace(lower(col("s")), "[^a-z0-9]+", " ")).as("composite"),
      graft.functions.NormalizedWordsExpr(col("s")).as("fused_w"))
    df.collect().foreach { r =>
      val in = r.getString(0)
      assert(r.getString(1) == r.getString(2),
        s"normalize diverged on <$in>: fused=<${r.getString(1)}> " +
          s"composite=<${r.getString(2)}>")
      val expectW =
        if (r.getString(2).isEmpty) List.empty[String]
        else r.getString(2).split(" ").toList
      assert(r.getSeq[String](3).toList == expectW,
        s"words diverged on <$in>: ${r.getSeq[String](3).toList} vs $expectW")
    }
    // NULL propagates
    val nulls = Seq(Option.empty[String]).toDF("s").select(
      graft.functions.NormalizeTextExpr(col("s")),
      graft.functions.NormalizedWordsExpr(col("s"))).collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("SpaceSplitExpr equals regex split + empty guard on canonical text") {
    // the wordTable contract (r22): over NormalizeTextExpr output —
    // single internal spaces, no edges — the byte-scan split must equal
    // the regex spelling it replaced, `when(norm === '', array())
    // .otherwise(split(norm, ' '))`. Random soups are normalized FIRST,
    // so the inputs cover empty, single-word and multi-word canonicals.
    val alphabet = "aB9 ,;é∆中文İKK--__\t\n"
    val cases = Seq.fill(500)(
      (1 to rng.nextInt(24)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString) ++
      Seq("", "   ", "---", "abc", "a b  c", "É9z", "İstanbul")
    val df = cases.toDF("raw")
      .select(graft.functions.NormalizeTextExpr(col("raw")).as("norm"))
      .select(
        col("norm"),
        graft.functions.SpaceSplitExpr(col("norm")).as("fast"),
        when(col("norm") === "", array().cast("array<string>"))
          .otherwise(split(col("norm"), " ")).as("ref"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
        s"split diverged on <${r.getString(0)}>: " +
          s"${r.getSeq[String](1).toList} vs ${r.getSeq[String](2).toList}")
    }
    // NULL propagates; non-canonical input follows runs semantics (the
    // documented deviation from regex split: no empty tokens)
    val edge = Seq(Option.empty[String], Some("a  b"), Some(" x ")).toDF("s")
      .select(graft.functions.SpaceSplitExpr(col("s"))).collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getSeq[String](0).toList == List("a", "b"))
    assert(edge(2).getSeq[String](0).toList == List("x"))
  }
}
