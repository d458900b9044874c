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

  test("append indexes only new files and equals the full rebuild") {
    val dir = Files.createTempDirectory("graft-skipidx4").toString
    (0L until 300L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartitionByRange(3, col("id")).write.mode("overwrite").parquet(dir)
    val base = SkipIndex.build(spark, dir, Seq("id"))
    val baseLocal = spark.createDataFrame(
      java.util.Arrays.asList(base.collect(): _*), base.schema)
    val baseFiles = baseLocal.select("file").as[String].collect().toSet
    (300L until 500L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartitionByRange(2, col("id")).write.mode("append").parquet(dir)
    val appended = SkipIndex.append(spark, dir, baseLocal, Seq("id"))
    def fields(ix: org.apache.spark.sql.DataFrame) = ix.select(
        col("file"), col("n_rows"), col("id_min"), col("id_max"),
        col("id_nulls"), base64(col("id_bloom")))
      .collect().map(_.toSeq).toSet
    assert(fields(appended) === fields(SkipIndex.build(spark, dir, Seq("id"))))
    // old files kept their EXACT original rows (never rescanned/rebuilt)
    val keptOld = appended.filter(col("file").isin(baseFiles.toSeq: _*))
    assert(fields(keptOld) === fields(baseLocal))
    assert(appended.count() === 5L)
    // idempotence: nothing new -> same reference back
    val appendedLocal = spark.createDataFrame(
      java.util.Arrays.asList(appended.collect(): _*), appended.schema)
    assert(SkipIndex.append(spark, dir, appendedLocal, Seq("id")) eq appendedLocal)
    // probes through the appended index stay exact on both halves
    assert(SkipIndex.readPruned(spark, dir, appendedLocal, "id", 7L)
      .select("s").as[String].collect().toSeq === Seq("v7"))
    assert(SkipIndex.readPruned(spark, dir, appendedLocal, "id", 432L)
      .select("s").as[String].collect().toSeq === Seq("v432"))
  }

  test("append recurses into Hive-partitioned layouts and equals the rebuild") {
    val dir = Files.createTempDirectory("graft-skipidx6").toString
    // dt=*/part-* nesting: a non-recursive listing sees only the dt=
    // directories and would silently append nothing
    (0L until 300L).map(i => (i, s"d${i % 2}", s"v$i")).toDF("id", "dt", "s")
      .repartitionByRange(2, col("id"))
      .write.partitionBy("dt").mode("overwrite").parquet(dir)
    val base = SkipIndex.build(spark, dir, Seq("id"))
    val baseLocal = spark.createDataFrame(
      java.util.Arrays.asList(base.collect(): _*), base.schema)
    (300L until 500L).map(i => (i, s"d${i % 2}", s"v$i")).toDF("id", "dt", "s")
      .repartitionByRange(2, col("id"))
      .write.partitionBy("dt").mode("append").parquet(dir)
    val appended = SkipIndex.append(spark, dir, baseLocal, Seq("id"))
    def fields(ix: org.apache.spark.sql.DataFrame) = ix.select(
        col("file"), col("n_rows"), col("id_min"), col("id_max"),
        col("id_nulls"), base64(col("id_bloom")))
      .collect().map(_.toSeq).toSet
    assert(fields(appended) === fields(SkipIndex.build(spark, dir, Seq("id"))))
    assert(appended.count() > baseLocal.count())
    // idempotence holds through the recursive listing too
    val appendedLocal = spark.createDataFrame(
      java.util.Arrays.asList(appended.collect(): _*), appended.schema)
    assert(SkipIndex.append(spark, dir, appendedLocal, Seq("id")) eq appendedLocal)
    // pruned reads over the appended index see BOTH drops, with the
    // partition column populated (basePath) — the old listing bug made
    // exactly this read silently drop the second drop's rows
    assert(SkipIndex.readPruned(spark, dir, appendedLocal, "id", 432L)
      .select("s", "dt").as[(String, String)].collect().toSeq ===
      Seq(("v432", "d0")))
    assert(SkipIndex.readPruned(spark, dir, appendedLocal, "id", 7L)
      .select("s", "dt").as[(String, String)].collect().toSeq ===
      Seq(("v7", "d1")))
  }

  test("prune drops exactly the vanished files' rows and equals the rebuild") {
    val dir = Files.createTempDirectory("graft-skipidx7").toString
    (0L until 300L).map(i => (i, s"d${i % 3}", s"v$i")).toDF("id", "dt", "s")
      .repartitionByRange(2, col("id"))
      .write.partitionBy("dt").mode("overwrite").parquet(dir)
    val built = SkipIndex.build(spark, dir, Seq("id"))
    val full = spark.createDataFrame(
      java.util.Arrays.asList(built.collect(): _*), built.schema)
    // retention expiry: the dt=d1 partition vanishes
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/dt=d1"), true))
    val pruned = SkipIndex.prune(spark, dir, full)
    def fields(ix: org.apache.spark.sql.DataFrame) = ix.select(
        col("file"), col("n_rows"), col("id_min"), col("id_max"),
        col("id_nulls"), base64(col("id_bloom")))
      .collect().map(_.toSeq).toSet
    assert(fields(pruned) === fields(SkipIndex.build(spark, dir, Seq("id"))))
    assert(pruned.count() < full.count())
    // idempotence: nothing vanished -> same reference back
    val local = spark.createDataFrame(
      java.util.Arrays.asList(pruned.collect(): _*), pruned.schema)
    assert(SkipIndex.prune(spark, dir, local) eq local)
    // surviving keys still read exactly; vanished-partition keys are gone
    assert(SkipIndex.readPruned(spark, dir, local, "id", 6L)
      .select("s").as[String].collect().toSeq === Seq("v6"))  // 6 % 3 == 0
    assert(SkipIndex.readPruned(spark, dir, local, "id", 7L).count() === 0L) // d1
  }

  test("plan-side bloom probe collects only surviving file names") {
    val dir = Files.createTempDirectory("graft-skipidx5").toString
    val df = (0L until 1000L).map(i => (i, i % 2)).toDF("id", "parity")
    df.repartitionByRange(2, col("parity")).write.mode("overwrite").parquet(dir)
    val index = SkipIndex.build(spark, dir, Seq("id"))
    // the per-row probe expression agrees with driver-side deserialization
    val rows = index.select(col("file"), col("id_bloom")).collect()
    val h = graft.functions.Md5Long60Expr.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("501"))
    val expect = rows.filter { r =>
      graft.functions.BloomProbeExpr.probe(r.getAs[Array[Byte]](1), h)
    }.map(_.getString(0)).toSet
    assert(SkipIndex.prunedFiles(index, "id", 501L).toSet === expect)
    assert(expect.size === 1)
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
