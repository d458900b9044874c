package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/**
 * Column wrappers over Spark's native bloom-filter expressions — the
 * same `BloomFilterAggregate` / `BloomFilterMightContain` pair Catalyst's
 * own runtime row-level filtering (InjectRuntimeFilter) injects into
 * large joins, exposed for explicit use in graft's semi-join-shaped
 * operators. Both are codegen'd Catalyst expressions: no UDF, no
 * per-row closure, and `might_contain` is a pure predicate the scan
 * stage evaluates in place.
 *
 * The aggregate side builds ONE serialized filter (binary, `numBits/8`
 * bytes — ~1 MiB at the 8M-bit default), which a caller collects as a
 * single metadata-sized row and re-embeds as a literal. False positives
 * are possible, false negatives are not — callers must keep an exact
 * verification step after the prefilter when exactness matters.
 */
object BloomExprs {

  /** Spark's defaults for runtime bloom filters (see BloomFilterAggregate):
    * 1M expected items / 8M bits ⇒ ~3% fpp when full. */
  val DefaultExpectedItems: Long = 1000000L
  val DefaultNumBits: Long = 8388608L

  /** Aggregate a LONG column into a serialized bloom filter (one binary
    * value). Partial-aggregates like any TypedImperativeAggregate: each
    * map task builds a local filter, merge ORs the bit sets — one
    * `numBits/8`-byte row crosses the wire per task, never the values. */
  def bloomAgg(
    c: Column,
    expectedItems: Long = DefaultExpectedItems,
    numBits: Long = DefaultNumBits
  ): Column = {
    require(expectedItems > 0 && numBits > 0,
      s"expectedItems and numBits must be positive: $expectedItems, $numBits")
    GraftSqlBridge.column(
      new BloomFilterAggregate(GraftSqlBridge.expression(c),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** `might_contain(filter, value)` over a driver-collected serialized
    * filter: true for every inserted value (no false negatives), true
    * with probability ~fpp for absent ones. NULL value ⇒ NULL. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column = {
    require(bloomBytes != null && bloomBytes.nonEmpty, "empty bloom filter bytes")
    GraftSqlBridge.column(
      BloomFilterMightContain(Literal.create(bloomBytes, BinaryType),
        GraftSqlBridge.expression(value)))
  }

  /** Per-ROW bloom probe: `might_contain(bloomCol, hashCol)` where the
    * FILTER side is a column, not a constant — what Spark's own
    * `BloomFilterMightContain` refuses (it requires a foldable filter).
    * Built for probing a TABLE of filters, one per row — e.g. the
    * [[graft.operators.SkipIndex]] per-file blooms, probed inside the
    * plan so only surviving FILE NAMES are collected, never the bloom
    * bytes. Deserializes the filter per row — right when each row's
    * filter is probed once (a per-file index); keep the constant
    * [[mightContain]] for probing one filter against many rows. */
  def mightContainCol(bloomCol: Column, hashCol: Column): Column =
    GraftSqlBridge.column(BloomProbeExpr(
      GraftSqlBridge.expression(bloomCol), GraftSqlBridge.expression(hashCol)))
}
