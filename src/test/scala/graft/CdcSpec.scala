package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0),
    (4L, "dan", 40.0)).toDF("id", "name", "bal")

  test("upserts, updates, deletes, and untouched keys — last writer wins") {
    val changelog = Seq(
      (2L, "bob2", 21.0, 1L, "U"),   // update
      (2L, "bob3", 22.0, 2L, "U"),   // later update wins
      (3L, null.asInstanceOf[String], 0.0, 1L, "D"), // delete
      (5L, "eve", 50.0, 1L, "I"),    // insert
      (4L, "dan2", 41.0, 1L, "U"),
      (4L, null.asInstanceOf[String], 0.0, 2L, "D")  // update then delete
    ).toDF("id", "name", "bal", "seq", "op")
    val out = Cdc.applyChangelog(snapshot, changelog, Seq("id"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "alice", 10.0),
      (2L, "bob3", 22.0),
      (5L, "eve", 50.0)))
  }

  test("delete of an absent key is a no-op; reinsert after delete works") {
    val changelog = Seq(
      (9L, null.asInstanceOf[String], 0.0, 1L, "D"),
      (3L, null.asInstanceOf[String], 0.0, 1L, "D"),
      (3L, "carol2", 31.0, 2L, "I")).toDF("id", "name", "bal", "seq", "op")
    val out = Cdc.applyChangelog(snapshot, changelog, Seq("id"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "alice", 10.0), (2L, "bob", 20.0),
      (3L, "carol2", 31.0), (4L, "dan", 40.0)))
  }

  test("equal-seq tie breaks toward the upsert; unknown op raises") {
    val tie = Seq(
      (1L, "alice2", 11.0, 5L, "U"),
      (1L, null.asInstanceOf[String], 0.0, 5L, "D")).toDF("id", "name", "bal", "seq", "op")
    val out = Cdc.applyChangelog(snapshot, tie, Seq("id"))
      .filter(col("id") === 1L).as[(Long, String, Double)].collect()
    assert(out.toSeq === Seq((1L, "alice2", 11.0)))

    val bad = Seq((1L, "x", 1.0, 1L, "X")).toDF("id", "name", "bal", "seq", "op")
    val e = intercept[Exception] {
      Cdc.applyChangelog(snapshot, bad, Seq("id")).collect()
    }
    assert(e.getMessage.contains("unknown changelog op") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown changelog op")))
  }

  test("materializedSink: stream of batches equals one-shot apply; tombstones reject stale") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdcmat").toString
    val sink = Cdc.materializedSink(dir, Seq("id"))
    def chg(rows: Seq[(Long, String, Double, Long, String)]) =
      rows.toDF("id", "name", "bal", "seq", "op")
    val b1 = chg(Seq((1L, "a", 1.0, 10L, "I"), (2L, "b", 2.0, 10L, "I")))
    val b2 = chg(Seq((1L, null, 0.0, 20L, "D"), (3L, "c", 3.0, 5L, "I")))
    // key 1's upsert at seq 15 arrives AFTER its seq-20 delete: the
    // tombstone must reject it — the key stays deleted
    val b3 = chg(Seq((1L, "zombie", 9.0, 15L, "U"), (2L, "b2", 2.5, 30L, "U")))
    sink(b1, 0); sink(b2, 1); sink(b3, 2)
    val got = Cdc.readCurrent(spark, dir)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((2L, "b2", 2.5), (3L, "c", 3.0)))
    // one-shot batch equivalence over the concatenated changelog
    val empty = b1.limit(0).drop("seq", "op")
    val oneShot = Cdc.applyChangelog(
        empty, b1.unionByName(b2).unionByName(b3), Seq("id"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(oneShot === got)
    // version retirement: with keepVersions=2 after 3 batches, v1 is
    // gone, v2 and v3 remain, the pointer reads v3
    assert(!new java.io.File(s"$dir/v1").exists())
    assert(new java.io.File(s"$dir/v2").exists() &&
      new java.io.File(s"$dir/v3").exists())
    // a RETRIED batch is value-idempotent (version advances, values don't)
    sink(b3, 2)
    val retried = Cdc.readCurrent(spark, dir)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(retried === got)
  }

  test("materializedSink wires as a real foreachBatch stream sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cdcstream").toString
    val mem = MemoryStream[(Long, String, Double, Long, String)]
    val sink = Cdc.materializedSink(dir, Seq("id"))
    val q = mem.toDF().toDF("id", "name", "bal", "seq", "op")
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        id: Long) => sink(b, id))
      .outputMode("append")
      .start()
    try {
      mem.addData((1L, "x", 1.0, 1L, "I"), (2L, "y", 2.0, 1L, "I"))
      q.processAllAvailable()
      mem.addData((1L, null.asInstanceOf[String], 0.0, 2L, "D"))
      q.processAllAvailable()
    } finally q.stop()
    val got = Cdc.readCurrent(spark, dir)
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((2L, "y", 2.0)))
  }

  test("empty changelog returns the snapshot; seq/op collision guarded") {
    val empty = Seq.empty[(Long, String, Double, Long, String)]
      .toDF("id", "name", "bal", "seq", "op")
    assert(Cdc.applyChangelog(snapshot, empty, Seq("id")).count() === 4L)
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snapshot.withColumn("seq", lit(1L)), empty, Seq("id"))
    }
  }
}
