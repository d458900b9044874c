package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Running per-position sums and non-null counts; arrays are sized lazily
  * from the first non-null vector seen. */
final class VectorMeanBuffer(
  var sums: Array[Double],
  var counts: Array[Long]
)

/**
 * Element-wise mean of a group's vectors as ONE typed aggregate:
 * `groupBy(k).agg(vector_mean(vec))` shuffles at most
 * groups × dim(sums+counts) per map partition thanks to partial
 * aggregation. The relational equivalent — posexplode → avg per
 * (group, position) → collect_list reassembly — multiplies the shuffled
 * row count by the dimension (64× for the embeddings table) and pays two
 * shuffles; this is the k-means mean-update shape, so the Lloyd loop
 * drops from 2 shuffles per round to 1.
 *
 * Semantics match the posexplode/avg form: NULL vectors contribute
 * nothing, NULL ELEMENTS are skipped per position (counts are tracked
 * per position), a position with no non-null values yields a NULL
 * element, and a group of only-NULL vectors yields NULL (the relational
 * form emits no row at all — both read the same through the
 * `coalesce(next, prev)` join in the Lloyd update). Sums accumulate in
 * double like avg does; accumulation ORDER differs from avg's
 * partial/merge order, so results agree to fp-roundoff, not bitwise —
 * fine for centroids, asserted with tolerance in SimilaritySpec.
 *
 * Vectors of mismatched dimensions in one group throw (k-means corpora
 * are fixed-dimension; silently zero-padding would corrupt centroids).
 */
case class VectorMeanAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[VectorMeanBuffer] with UnaryLike[Expression] {

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_mean"

  @transient private lazy val elemT: DataType = elemType.get

  private def get(arr: ArrayData, i: Int): Double = elemT match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case _ => arr.getInt(i).toDouble
  }

  override def createAggregationBuffer(): VectorMeanBuffer =
    new VectorMeanBuffer(null, null)

  private def ensureDim(b: VectorMeanBuffer, dim: Int): Unit =
    if (b.sums == null) {
      b.sums = new Array[Double](dim)
      b.counts = new Array[Long](dim)
    } else require(b.sums.length == dim,
      s"$prettyName: mixed vector dimensions in one group " +
        s"(${b.sums.length} vs $dim)")

  override def update(b: VectorMeanBuffer, input: InternalRow): VectorMeanBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      ensureDim(b, n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          b.sums(i) += get(arr, i)
          b.counts(i) += 1
        }
        i += 1
      }
    }
    b
  }

  override def merge(b: VectorMeanBuffer, o: VectorMeanBuffer): VectorMeanBuffer = {
    if (o.sums != null) {
      ensureDim(b, o.sums.length)
      var i = 0
      while (i < o.sums.length) {
        b.sums(i) += o.sums(i)
        b.counts(i) += o.counts(i)
        i += 1
      }
    }
    b
  }

  override def eval(b: VectorMeanBuffer): Any =
    if (b.sums == null) null
    else {
      val out = new Array[Any](b.sums.length)
      var i = 0
      while (i < b.sums.length) {
        if (b.counts(i) > 0) out(i) = b.sums(i) / b.counts(i)
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(b: VectorMeanBuffer): Array[Byte] =
    if (b.sums == null) Array.emptyByteArray
    else {
      val dim = b.sums.length
      val bb = ByteBuffer.allocate(4 + dim * 16)
      bb.putInt(dim)
      var i = 0
      while (i < dim) { bb.putDouble(b.sums(i)); i += 1 }
      i = 0
      while (i < dim) { bb.putLong(b.counts(i)); i += 1 }
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): VectorMeanBuffer =
    if (bytes.isEmpty) new VectorMeanBuffer(null, null)
    else {
      val bb = ByteBuffer.wrap(bytes)
      val dim = bb.getInt
      val sums = new Array[Double](dim)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < dim) { sums(i) = bb.getDouble; i += 1 }
      i = 0
      while (i < dim) { counts(i) = bb.getLong; i += 1 }
      new VectorMeanBuffer(sums, counts)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMeanAgg =
    copy(child = newChild)
}

object VectorMeanAgg {
  def apply(vec: Column): Column =
    GraftSqlBridge.column(
      VectorMeanAgg(GraftSqlBridge.expression(vec)).toAggregateExpression())
}
