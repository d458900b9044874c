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

  test("empty changelog returns the snapshot; seq/op collision guarded") {
    val empty = Seq.empty[(Long, String, Double, Long, String)]
      .toDF("id", "name", "bal", "seq", "op")
    assert(Cdc.applyChangelog(snapshot, empty, Seq("id")).count() === 4L)
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snapshot.withColumn("seq", lit(1L)), empty, Seq("id"))
    }
  }
}
