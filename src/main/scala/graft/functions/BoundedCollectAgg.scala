package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Aggregation state of [[BoundedCollectAgg]]: the exact member count and
 * AT MOST `cap` buffered items. `seen` (distinct arm only) dedups via
 * single-field [[UnsafeRow]] copies — byte-wise equals/hashCode, sound
 * for any item type including structs. A SATURATED distinct buffer
 * (count exceeded the cap, membership tracking abandoned) has
 * `items == null`; the row arm never saturates its count (a long
 * increment is free) and only stops buffering items.
 */
final class BoundedCollectBuffer(
  var n: Long,
  var items: java.util.ArrayList[Any],
  var seen: java.util.HashSet[UnsafeRow]
)

/**
 * SINGLE-PASS bounded bucket collection: `bounded_collect(item, cap)`
 * returns `struct(n, items)` where `n` counts the group's non-null
 * items (`distinct = true`: distinct items) and `items` holds them ALL
 * when `n <= cap` and is EMPTY otherwise — one ordinary hash
 * aggregation whose per-group buffer physically cannot exceed `cap`
 * buffered items.
 *
 * This is the engine's LSH-family bucket cap ([[graft.operators.Dedup]]):
 * in-bucket pair generation is O(|bucket|²), so a degenerate key
 * (boilerplate every page shares, a black-frame dHash) must be dropped
 * loudly, and — the r17 hardening — its bucket must never materialize
 * in one executor's aggregation buffer first (a `collect_*` buffer is a
 * single object; the aggregate's sort fallback cannot spill WITHIN a
 * group). The r17 spelling enforced that with a separate count pass
 * joined back over a shared exchange — memory-safe but 2–4 extra stages
 * per capped step, the round's measured regression. This operator
 * enforces the same bound INSIDE the aggregate instead:
 *
 *  - row parity (`distinct = false`, ≡ `size(collect_list)`): the count
 *    is an exact long increment forever; items stop buffering at `cap`.
 *    Count and drop metrics are EXACT.
 *  - distinct parity (`distinct = true`, ≡ `size(collect_set)`): items
 *    and the dedup set grow to at most `cap` + 1 distinct members, then
 *    the buffer SATURATES — state is freed, `n` pins at `cap + 1`, and
 *    every further update is an O(1) no-op (a degenerate bucket costs
 *    nothing past saturation). Exact distinct counting past the cap
 *    would need unbounded state by definition, so an over-cap group
 *    reports `n = cap + 1` — a floor, not the true size. The
 *    keep/drop decision (`n <= cap`) is EXACT either way; only the
 *    dropped-rows diagnostic is a lower bound on the distinct arm.
 *
 * NULL items are skipped in BOTH the count and the buffer (exactly like
 * `collect_list`/`collect_set`), so `n == size(items)` unconditionally
 * for surviving groups — including groups containing null items, where
 * the r17 count-all-rows spelling could over-count and cap a boundary
 * bucket collect_list would have kept.
 *
 * Partial aggregation works like any [[TypedImperativeAggregate]]:
 * map-side partials serialize `(n, items)` (a saturated partial ships
 * `n = cap + 1` with no items, which is proof enough — a superset of a
 * saturated partial is saturated), merges re-dedup on the distinct arm.
 */
case class BoundedCollectAgg(
  child: Expression,
  cap: Int,
  distinct: Boolean,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BoundedCollectBuffer] with UnaryLike[Expression] {

  private def hasMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case s: StructType => s.fields.exists(f => hasMap(f.dataType))
    case a: ArrayType => hasMap(a.elementType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (cap < 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName cap must be >= 2 (a pair), got $cap")
    else if (distinct && hasMap(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName distinct cannot compare map-typed items " +
          s"(${child.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(child.dataType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect"

  /** Single-field projection used both as the dedup key maker (byte-wise
    * row equality) and the buffer serializer's value layout. */
  @transient private lazy val keyProj =
    UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val keyHolder = new GenericInternalRow(1)
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](
      LongType, ArrayType(child.dataType, containsNull = false)))
  @transient private lazy val serHolder = new GenericInternalRow(2)

  private def saturated(b: BoundedCollectBuffer): Boolean = b.items == null

  override def createAggregationBuffer(): BoundedCollectBuffer =
    new BoundedCollectBuffer(
      0L,
      new java.util.ArrayList[Any](),
      if (distinct) new java.util.HashSet[UnsafeRow]() else null)

  private def saturate(b: BoundedCollectBuffer): Unit = {
    b.n = cap + 1L
    b.items = null
    b.seen = null
  }

  /** Add one (already non-null) item to a distinct, non-saturated
    * buffer; saturates it when this is the (cap+1)-th distinct value. */
  private def addDistinct(b: BoundedCollectBuffer, v: Any): Unit = {
    keyHolder.update(0, v)
    val key = keyProj(keyHolder).copy()
    if (b.seen.add(key)) {
      b.n += 1
      if (b.n > cap) saturate(b)
      else b.items.add(key.get(0, child.dataType))
    }
  }

  override def update(b: BoundedCollectBuffer, input: InternalRow): BoundedCollectBuffer = {
    if (distinct && saturated(b)) return b // O(1) past the cap
    val v = child.eval(input)
    if (v == null) return b
    if (distinct) addDistinct(b, v)
    else {
      b.n += 1
      if (b.items.size < cap) b.items.add(InternalRow.copyValue(v))
    }
    b
  }

  override def merge(b: BoundedCollectBuffer, o: BoundedCollectBuffer): BoundedCollectBuffer = {
    if (distinct) {
      if (saturated(b)) return b
      if (saturated(o)) { saturate(b); return b }
      val it = o.items.iterator()
      while (it.hasNext && !saturated(b)) addDistinct(b, it.next())
    } else {
      b.n += o.n
      val it = o.items.iterator()
      while (it.hasNext && b.items.size < cap) b.items.add(it.next())
    }
    b
  }

  override def eval(b: BoundedCollectBuffer): Any = {
    val items: Array[Any] =
      if (saturated(b) || b.n > cap) Array.empty[Any]
      else b.items.toArray
    new GenericInternalRow(Array[Any](b.n, new GenericArrayData(items)))
  }

  override def serialize(b: BoundedCollectBuffer): Array[Byte] = {
    val items: Array[Any] =
      if (saturated(b)) Array.empty[Any] else b.items.toArray
    serHolder.update(0, b.n)
    serHolder.update(1, new GenericArrayData(items))
    serProj(serHolder).getBytes
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectBuffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val n = row.getLong(0)
    if (distinct && n > cap) new BoundedCollectBuffer(n, null, null)
    else {
      val arr = row.getArray(1)
      val m = arr.numElements()
      val items = new java.util.ArrayList[Any](m)
      val seen = if (distinct) new java.util.HashSet[UnsafeRow]() else null
      var i = 0
      while (i < m) {
        val v = arr.get(i, child.dataType)
        items.add(v)
        if (distinct) {
          keyHolder.update(0, v)
          seen.add(keyProj(keyHolder).copy())
        }
        i += 1
      }
      new BoundedCollectBuffer(n, items, seen)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectAgg =
    copy(child = newChild)
}

object BoundedCollectAgg {
  /** `bounded_collect(item, cap)` as a DataFrame aggregate Column:
    * `struct(n, items)` — see the class scaladoc for the contract. */
  def apply(item: Column, cap: Int, distinct: Boolean): Column =
    GraftSqlBridge.column(
      BoundedCollectAgg(GraftSqlBridge.expression(item), cap, distinct)
        .toAggregateExpression())
}
