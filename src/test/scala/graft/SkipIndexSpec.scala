package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.SkipIndex

class SkipIndexSpec extends SparkSpec {
  import spark.implicits._

  private def writeRangePartitioned(): (String, Int) = {
    val dir = Files.createTempDirectory("graft-skipidx").toString
    val df = (0L until 1000L).map(i => (i, if (i % 3 == 0) "en" else "de", i * 7))
      .toDF("id", "lang", "v")
    df.repartitionByRange(8, col("id")).write.mode("overwrite").parquet(dir)
    (dir, spark.read.parquet(dir).inputFiles.length)
  }

  test("pruned read is exact and actually prunes on a range-clustered key") {
    val (dir, nFiles) = writeRangePartitioned()
    assert(nFiles === 8)
    val index = SkipIndex.build(spark, dir, Seq("id", "lang"))
    assert(index.count() === 8L)

    // point probe on the clustered key: exactly one file survives
    val files = SkipIndex.prunedFiles(index, "id", 137L)
    assert(files.size === 1, files.toString)
    val got = SkipIndex.readPruned(spark, dir, index, "id", 137L)
      .select("id", "lang", "v").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((137L, "de", 959L)))

    // an unclustered key prunes nothing but stays exact
    val gotLang = SkipIndex.readPruned(spark, dir, index, "lang", "en")
      .select("id").as[Long].collect().sorted
    assert(gotLang.toSeq === (0L until 1000L).filter(_ % 3 == 0))
  }

  test("absent values return empty with the table schema, zero files read") {
    val (dir, _) = writeRangePartitioned()
    val index = SkipIndex.build(spark, dir, Seq("id"))
    assert(SkipIndex.prunedFiles(index, "id", 5000L).isEmpty)
    val out = SkipIndex.readPruned(spark, dir, index, "id", 5000L)
    assert(out.columns.toSeq === Seq("id", "lang", "v"))
    assert(out.count() === 0L)
    assert(SkipIndex.prunedFiles(index, "id", null).isEmpty)
  }

  test("bloom probe skips files whose min/max overlap but lack the value") {
    val dir = Files.createTempDirectory("graft-skipidx2").toString
    // two files with fully overlapping id ranges: evens and odds
    val df = (0L until 1000L).map(i => (i, i % 2)).toDF("id", "parity")
    df.repartitionByRange(2, col("parity")).write.mode("overwrite").parquet(dir)
    val index = SkipIndex.build(spark, dir, Seq("id"))
    // min/max alone keeps both files for any in-range id; the bloom
    // probe (deterministic seed in Spark's sketch filter) drops the
    // wrong-parity file
    val files = SkipIndex.prunedFiles(index, "id", 501L)
    assert(files.size === 1, files.toString)
    val got = SkipIndex.readPruned(spark, dir, index, "id", 501L)
      .select("id", "parity").as[(Long, Long)].collect().toSeq
    assert(got === Seq((501L, 1L)))
  }

  test("all-NULL key files never match an equality probe") {
    val dir = Files.createTempDirectory("graft-skipidx3").toString
    val df = Seq((Some(1L), "a"), (Some(2L), "b")).toDF("k", "s")
      .union(Seq((Option.empty[Long], "c"), (Option.empty[Long], "d")).toDF("k", "s"))
    df.repartition(2, col("k")).write.mode("overwrite").parquet(dir)
    val index = SkipIndex.build(spark, dir, Seq("k"))
    val got = SkipIndex.readPruned(spark, dir, index, "k", 2L)
      .select("s").as[String].collect().toSeq
    assert(got === Seq("b"))
  }
}
