package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types._

/** Grouped top-k as a mergeable bounded-heap aggregate.
  *
  * `graft_topk_by(score, id, k)` keeps the k largest (score, id) pairs
  * per group — id ascending breaks score ties, so the result is EXACT
  * and deterministic regardless of partition layout or merge order.
  *
  * 100 TB shape: the standard formulation (`row_number() OVER
  * (PARTITION BY g ORDER BY score DESC) <= k`) SORTS EVERY GROUP'S
  * FULL ROW SET after the exchange; this carries O(k) state per
  * partial, prunes map-side (a partition's non-top-k rows never reach
  * the shuffle), and merges as a capped heap union — the same pattern
  * as [[BKSample]] with the ranking key caller-supplied instead of
  * hash-derived. Scores are longs: the exact-compare contract (the
  * gate hashes values), same discipline as the quantile sketch.
  */
final class TKState(val k: Int) extends Serializable {
  require(k >= 1, "top-k size must be >= 1")

  /** min-heap on (score, id-desc): the root is the current weakest
    * member — evicted first. Comparing (score asc, id desc) makes the
    * WORST element (lowest score, then highest id) the head. */
  private[functions] val heap =
    mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.by[(Long, Long), (Long, Long)] { case (s, id) => (-s, id) })

  def size: Int = heap.size

  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def add(score: Long, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (beats((score, id), heap.head)) {
      heap.dequeue(); heap.enqueue((score, id))
    }
  }

  def mergeWith(o: TKState): Unit = {
    require(o.k == k, s"cannot merge top-k of size $k and ${o.k}")
    o.heap.foreach { case (s, id) => add(s, id) }
  }

  /** (score, id) pairs, best first: score desc, id asc on ties. */
  def members: Array[(Long, Long)] =
    heap.toArray.sortBy { case (s, id) => (-s, id) }

  def serialize: Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + heap.size * 16)
    buf.putInt(k).putInt(heap.size)
    heap.foreach { case (s, id) => buf.putLong(s).putLong(id) }
    buf.array()
  }
}

object TKState {
  def deserialize(bytes: Array[Byte]): TKState = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val s = new TKState(buf.getInt)
    val n = buf.getInt
    (0 until n).foreach(_ => s.add(buf.getLong, buf.getLong))
    s
  }
}

/** `graft_topk_by(score, id, k)` — array<struct<score,id>> of the
  * group's k best rows, best first. Rows with a null score or id are
  * skipped; empty groups yield an empty array.
  */
case class TopKByAgg(
    left: Expression,  // score
    right: Expression, // id
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TKState] with BinaryLike[Expression]
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[TypeBridge.AbstractDataType] = Seq(LongType, LongType)

  override def createAggregationBuffer(): TKState = new TKState(k)

  override def update(b: TKState, input: InternalRow): TKState = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null) b.add(s.asInstanceOf[Long], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TKState, o: TKState): TKState = { b.mergeWith(o); b }

  override def eval(b: TKState): Any =
    new GenericArrayData(b.members.map { case (s, id) =>
      InternalRow(s, id)
    }.toArray[Any])

  override def serialize(b: TKState): Array[Byte] = b.serialize
  override def deserialize(bytes: Array[Byte]): TKState = TKState.deserialize(bytes)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByAgg =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_topk_by"
}

object TopKBy {
  /** Column wrapper: `topKBy($"n_chars", $"doc_id", 5)`. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByAgg(
        ColumnBridge.expression(score.cast("long")),
        ColumnBridge.expression(id.cast("long")), k)
        .toAggregateExpression())
}
