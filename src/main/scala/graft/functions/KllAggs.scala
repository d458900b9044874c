package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/**
 * Mergeable KLL quantile sketches (Karnin–Lang–Liberty 2016; the Apache
 * DataSketches implementation already on Spark's classpath for its HLL
 * functions) as typed aggregates — the QUANTILE member of the sketch-
 * index family next to HLL distinct and Count-Min frequency
 * ([[graft.operators.Sketches]]): Spark ships `approx_percentile`
 * (answers once, not an artifact) but NO persistable/mergeable quantile
 * sketch aggregate, which is what an incremental corpus-statistics
 * index needs — sketch each drop once, persist per-group KB-scale
 * blobs, fold new drops in with the union, read quantiles off the
 * artifact without rescanning history.
 *
 * Accuracy: normalized RANK error ε(k) ≈ 1.65% at the k = 200 default
 * (99% confidence, one-sided). The VALUE returned for rank q is an
 * actual retained input value whose true rank is within ε of q. KLL
 * compaction is randomized, so sketch BYTES are not run-deterministic
 * once a group exceeds the uncompacted capacity — the rank-error band
 * is the contract (gates check the band verdict, the HLL precedent).
 */
case class KllBuildAgg(
  child: Expression,
  k: Int = 200,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[KllDoublesSketch]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a DOUBLE value column, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_sketch"

  override def createAggregationBuffer(): Array[KllDoublesSketch] =
    new Array[KllDoublesSketch](1)

  override def update(
    b: Array[KllDoublesSketch], input: InternalRow): Array[KllDoublesSketch] = {
    val v = child.eval(input)
    if (v != null) {
      if (b(0) == null) b(0) = KllDoublesSketch.newHeapInstance(k)
      b(0).update(v.asInstanceOf[Double])
    }
    b
  }

  override def merge(
    b: Array[KllDoublesSketch], o: Array[KllDoublesSketch]): Array[KllDoublesSketch] = {
    if (o(0) != null) {
      if (b(0) == null) b(0) = o(0) else b(0).merge(o(0))
    }
    b
  }

  override def eval(b: Array[KllDoublesSketch]): Any =
    if (b(0) == null) null else b(0).toByteArray

  override def serialize(b: Array[KllDoublesSketch]): Array[Byte] =
    if (b(0) == null) Array.emptyByteArray else b(0).toByteArray

  override def deserialize(bytes: Array[Byte]): Array[KllDoublesSketch] = {
    val b = createAggregationBuffer()
    if (bytes.nonEmpty) b(0) = KllDoublesSketch.heapify(Memory.wrap(bytes))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllBuildAgg =
    copy(child = newChild)
}

object KllBuildAgg {
  def apply(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      KllBuildAgg(GraftSqlBridge.expression(c), k).toAggregateExpression())
}

/**
 * Union of serialized KLL sketches — the [[CmsUnionAgg]] sibling for
 * quantiles: fold a new drop's per-group sketch table into the
 * persisted index. Mixed-k unions are legal (DataSketches downgrades
 * to the coarser k, like `hll_union_agg`'s allowDifferentLgConfigK
 * path). NULL inputs contribute nothing; a group of only NULLs yields
 * NULL.
 */
case class KllUnionAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[KllDoublesSketch]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY serialized KLL sketch, got " +
        child.dataType.catalogString)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_union"

  override def createAggregationBuffer(): Array[KllDoublesSketch] =
    new Array[KllDoublesSketch](1)

  private def mergeInto(b: Array[KllDoublesSketch], s: KllDoublesSketch): Unit =
    if (b(0) == null) b(0) = s else b(0).merge(s)

  override def update(
    b: Array[KllDoublesSketch], input: InternalRow): Array[KllDoublesSketch] = {
    val v = child.eval(input)
    if (v != null)
      mergeInto(b, KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(
    b: Array[KllDoublesSketch], o: Array[KllDoublesSketch]): Array[KllDoublesSketch] = {
    if (o(0) != null) mergeInto(b, o(0))
    b
  }

  override def eval(b: Array[KllDoublesSketch]): Any =
    if (b(0) == null) null else b(0).toByteArray

  override def serialize(b: Array[KllDoublesSketch]): Array[Byte] =
    if (b(0) == null) Array.emptyByteArray else b(0).toByteArray

  override def deserialize(bytes: Array[Byte]): Array[KllDoublesSketch] = {
    val b = createAggregationBuffer()
    if (bytes.nonEmpty) b(0) = KllDoublesSketch.heapify(Memory.wrap(bytes))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
}

object KllUnionAgg {
  def apply(c: Column): Column =
    GraftSqlBridge.column(
      KllUnionAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}
