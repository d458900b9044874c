package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Union of serialized Count-Min sketches as ONE typed aggregate — the
 * missing sibling of Spark's built-in `hll_union_agg` (Spark ships
 * `count_min_sketch(col, eps, conf, seed)` to BUILD per-group sketches
 * but no SQL aggregate to MERGE them, which is exactly what an
 * incremental frequency index needs: fold a new drop's sketch table
 * into the persisted one without driver round-trips).
 *
 * Buffers deserialize lazily and merge in place; merging sketches with
 * different (depth, width, seed) throws Spark's
 * IncompatibleMergeException — mixed-parameter indexes are a pipeline
 * bug, not something to paper over. NULL inputs contribute nothing; a
 * group of only NULLs yields NULL.
 */
case class CmsUnionAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[CountMinSketch]] with UnaryLike[Expression] {
  // buffer is a 1-slot mutable cell: Array(null) until the first sketch

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY serialized count-min sketch, got " +
        child.dataType.catalogString)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_union"

  override def createAggregationBuffer(): Array[CountMinSketch] =
    new Array[CountMinSketch](1)

  private def mergeInto(b: Array[CountMinSketch], s: CountMinSketch): Unit =
    if (b(0) == null) b(0) = s else b(0).mergeInPlace(s)

  override def update(
    b: Array[CountMinSketch], input: InternalRow): Array[CountMinSketch] = {
    val v = child.eval(input)
    if (v != null)
      mergeInto(b, CountMinSketch.readFrom(
        new ByteArrayInputStream(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(
    b: Array[CountMinSketch], o: Array[CountMinSketch]): Array[CountMinSketch] = {
    if (o(0) != null) mergeInto(b, o(0))
    b
  }

  override def eval(b: Array[CountMinSketch]): Any =
    if (b(0) == null) null else serializeSketch(b(0))

  private def serializeSketch(s: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    s.writeTo(out)
    out.toByteArray
  }

  override def serialize(b: Array[CountMinSketch]): Array[Byte] =
    if (b(0) == null) Array.emptyByteArray else serializeSketch(b(0))

  override def deserialize(bytes: Array[Byte]): Array[CountMinSketch] = {
    val b = createAggregationBuffer()
    if (bytes.nonEmpty)
      b(0) = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CmsUnionAgg =
    copy(child = newChild)
}

object CmsUnionAgg {
  def apply(c: Column): Column =
    GraftSqlBridge.column(
      CmsUnionAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}
