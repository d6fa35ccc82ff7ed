package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic bottom-k-by-hash sampling aggregate.
  *
  * A uniform k-sample per group, picked as the k ids with the smallest
  * (polyHash(id), id) — the same engine-portable hash the curation
  * samplers use, so the sample is (a) EXACT, not approximate: bottom-k
  * selection is independent of partition layout and merge order,
  * (b) reproducible across engines (the DuckDB oracle replays the hash
  * and rank), and (c) stable under appends: adding rows can only
  * displace the largest-hash members, never reshuffle the rest — the
  * property `df.sample` lacks (its output changes with partitioning).
  *
  * 100 TB shape: this is the distributed top-k pattern — O(k) state
  * per partial, map-side bounded heaps below the group exchange, merge
  * = heap union capped at k. The window-function formulation
  * (row_number ≤ k) SORTS EVERY GROUP'S FULL ROW SET; this never holds
  * more than k (hash, id) pairs per buffer regardless of group size.
  */
final class BKSample(val k: Int) extends Serializable {
  require(k >= 1, "sample size must be >= 1")

  /** max-heap on (hash, id): the root is the current worst member. */
  private[functions] val heap =
    mutable.PriorityQueue.empty[(Long, Long)](Ordering.Tuple2[Long, Long])

  def size: Int = heap.size

  def add(hash: Long, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((hash, id))
    else if (Ordering.Tuple2[Long, Long].lt((hash, id), heap.head)) {
      heap.dequeue(); heap.enqueue((hash, id))
    }
  }

  def mergeWith(o: BKSample): Unit = {
    require(o.k == k, s"cannot merge samples of size $k and ${o.k}")
    o.heap.foreach { case (h, id) => add(h, id) }
  }

  /** Member ids in (hash, id) order — the deterministic sample ranking. */
  def members: Array[Long] = heap.toArray.sorted.map(_._2)

  def serialize: Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + heap.size * 16)
    buf.putInt(k).putInt(heap.size)
    heap.foreach { case (h, id) => buf.putLong(h).putLong(id) }
    buf.array()
  }
}

object BKSample {
  def deserialize(bytes: Array[Byte]): BKSample = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val s = new BKSample(buf.getInt)
    val n = buf.getInt
    (0 until n).foreach(_ => s.add(buf.getLong, buf.getLong))
    s
  }
}

/** `graft_bottomk_sample(id, k)` — returns the group's sample ids as an
  * array<long> ordered by (polyHash(id), id); empty groups yield an
  * empty array. Null ids are skipped.
  */
case class BottomKSampleAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BKSample] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[TypeBridge.AbstractDataType] = Seq(LongType)

  override def createAggregationBuffer(): BKSample = new BKSample(k)

  override def update(b: BKSample, input: InternalRow): BKSample = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      b.add(PolyHash.hash(UTF8String.fromString(id.toString)), id)
    }
    b
  }

  override def merge(b: BKSample, o: BKSample): BKSample = { b.mergeWith(o); b }

  override def eval(b: BKSample): Any = new GenericArrayData(b.members)

  override def serialize(b: BKSample): Array[Byte] = b.serialize
  override def deserialize(bytes: Array[Byte]): BKSample = BKSample.deserialize(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): BottomKSampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BottomKSampleAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_bottomk_sample"
}

object BottomKSample {
  /** Column wrapper: `bottomKSample($"doc_id", 100)`. */
  def bottomKSample(id: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKSampleAgg(ColumnBridge.expression(id.cast("long")), k)
        .toAggregateExpression())
}
