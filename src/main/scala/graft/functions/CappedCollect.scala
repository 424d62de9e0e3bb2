package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/**
 * Bounded aggregation buffer: the TRUE group count plus at most `cap`
 * collected values. Memory per group is O(cap) by construction — the
 * property `collect_list` lacks and the reason skewed posting lists
 * can OOM a task at 100 TB.
 */
final class CappedCollectBuffer(val cap: Int) {
  var total: Long = 0L
  var n: Int = 0
  var ids: Array[Long] = new Array[Long](math.min(cap, 16))

  private def grow(): Unit =
    if (n == ids.length && n < cap)
      ids = java.util.Arrays.copyOf(ids, math.min(cap, ids.length * 2))

  /** One input value: always counted, kept only below the cap. */
  def add(v: Long): Unit = {
    total += 1
    if (n < cap) { grow(); ids(n) = v; n += 1 }
  }

  def mergeIn(o: CappedCollectBuffer): Unit = {
    total += o.total
    var i = 0
    while (i < o.n && n < cap) { grow(); ids(n) = o.ids(i); n += 1; i += 1 }
  }
}

/**
 * `capped_collect(v, cap)` → `struct<total:bigint, ids:array<bigint>>`:
 * the exact group size plus the first `cap` values seen. ONE
 * map-combinable aggregation answers both "is this group oversized?"
 * (total) and "what are its members?" (ids, complete iff total ≤ cap)
 * — the skew-detection count and the member collection that previously
 * took two full shuffles over the same rows fuse into one, with task
 * memory bounded at `cap` longs per group regardless of skew
 * (partial-aggregation buffers serialize at most `cap` values too).
 * Groups past the cap report an arbitrary subset; callers re-read
 * those groups' rows (a tiny, explicitly detected tail) rather than
 * trusting the truncation — no silent drops.
 */
case class CappedCollect(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedCollectBuffer] {

  require(cap > 0, "capped_collect cap must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "capped_collect"

  override def createAggregationBuffer(): CappedCollectBuffer =
    new CappedCollectBuffer(cap)

  override def update(b: CappedCollectBuffer,
      input: InternalRow): CappedCollectBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: CappedCollectBuffer,
      o: CappedCollectBuffer): CappedCollectBuffer = {
    b.mergeIn(o)
    b
  }

  override def eval(b: CappedCollectBuffer): Any =
    new GenericInternalRow(Array[Any](b.total,
      UnsafeArrayData.fromPrimitiveArray(
        java.util.Arrays.copyOf(b.ids, b.n))))

  override def serialize(b: CappedCollectBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * b.n)
    bb.putLong(b.total)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedCollectBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new CappedCollectBuffer(cap)
    b.total = bb.getLong()
    val n = bb.getInt()
    b.ids = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { b.ids(i) = bb.getLong(); i += 1 }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollect =
    copy(child = newChildren.head)
}

/** [[CappedCollectBuffer]] for (key, value) long pairs: true count plus
  * at most `cap` aligned (ids(i), vals(i)) entries. */
final class CappedCollectPairBuffer(val cap: Int) {
  var total: Long = 0L
  var n: Int = 0
  var ids: Array[Long] = new Array[Long](math.min(cap, 16))
  var vals: Array[Long] = new Array[Long](math.min(cap, 16))

  private def grow(): Unit =
    if (n == ids.length && n < cap) {
      val sz = math.min(cap, ids.length * 2)
      ids = java.util.Arrays.copyOf(ids, sz)
      vals = java.util.Arrays.copyOf(vals, sz)
    }

  def add(k: Long, v: Long): Unit = {
    total += 1
    if (n < cap) { grow(); ids(n) = k; vals(n) = v; n += 1 }
  }

  def mergeIn(o: CappedCollectPairBuffer): Unit = {
    total += o.total
    var i = 0
    while (i < o.n && n < cap) {
      grow(); ids(n) = o.ids(i); vals(n) = o.vals(i); n += 1; i += 1
    }
  }
}

/**
 * `capped_collect_pair(k, v, cap)` →
 * `struct<total:bigint, ids:array<bigint>, vals:array<bigint>>`: the
 * two-column sibling of [[CappedCollect]], for group members that carry
 * a 64-bit payload alongside the id (simhash members are (id,
 * signature) — two longs, unpackable into one). Same contract: exact
 * `total`, first `cap` members, O(cap) task memory per group, one
 * map-combinable shuffle replacing the count + collect two-pass shape.
 */
case class CappedCollectPair(key: Expression, value: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedCollectPairBuffer] {

  require(cap > 0, "capped_collect_pair cap must be positive")

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("vals", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "capped_collect_pair"

  override def createAggregationBuffer(): CappedCollectPairBuffer =
    new CappedCollectPairBuffer(cap)

  override def update(b: CappedCollectPairBuffer,
      input: InternalRow): CappedCollectPairBuffer = {
    val k = key.eval(input)
    val v = value.eval(input)
    if (k != null && v != null)
      b.add(k.asInstanceOf[Long], v.asInstanceOf[Long])
    b
  }

  override def merge(b: CappedCollectPairBuffer,
      o: CappedCollectPairBuffer): CappedCollectPairBuffer = {
    b.mergeIn(o)
    b
  }

  override def eval(b: CappedCollectPairBuffer): Any =
    new GenericInternalRow(Array[Any](b.total,
      UnsafeArrayData.fromPrimitiveArray(
        java.util.Arrays.copyOf(b.ids, b.n)),
      UnsafeArrayData.fromPrimitiveArray(
        java.util.Arrays.copyOf(b.vals, b.n))))

  override def serialize(b: CappedCollectPairBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 16 * b.n)
    bb.putLong(b.total)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)); bb.putLong(b.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedCollectPairBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new CappedCollectPairBuffer(cap)
    b.total = bb.getLong()
    val n = bb.getInt()
    b.ids = new Array[Long](math.max(n, 1))
    b.vals = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { b.ids(i) = bb.getLong(); b.vals(i) = bb.getLong(); i += 1 }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): CappedCollectPair =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): CappedCollectPair =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollectPair =
    copy(key = newChildren(0), value = newChildren(1))
}
