package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Bucketed co-located joins: the shuffle is paid at write time, not per
  * join — the join plan must carry NO exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("join of two same-bucketed tables runs without any shuffle exchange") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    // a previous JVM's managed-table directory survives the in-memory
    // catalog — clear both the catalog entry and the location
    Seq("b_orders", "b_lineitem").foreach(Bucketing.dropTable(spark, _))

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)

    // the MERGE hint forces a sort-merge join (a broadcast join would hide
    // the exchange question) without mutating shared session conf, which
    // could race with concurrently running suites
    val joined = Bucketing.readBucketed(spark, "b_orders").hint("merge")
      .join(Bucketing.readBucketed(spark, "b_lineitem"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"expected exchange-free co-located join:\n$plan")
    // and it computes the right thing
    assert(joined.count() ==
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count())
  }
}
