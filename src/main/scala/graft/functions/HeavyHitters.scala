package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters summary (SpaceSaving, Metwally et al.
  * 2005): at most `k` (item → (count, err)) entries; an unseen item
  * evicts the minimum-count entry and inherits its count as its
  * overestimation error.
  *
  * Contract tiers (the [[QSketch]] pattern):
  *  - distinct ≤ k: NO eviction ever runs — counts are EXACT and
  *    independent of partial-merge order. This is the gate tier: the
  *    oracle compares against DuckDB's exact word-count top-k
  *    (`st5_heavy_hitters`).
  *  - distinct > k: the classic guarantees — every item with true
  *    count > n/k is present, reported count overestimates by at most
  *    its `err` ≤ n/k. Eviction ties break deterministically (count
  *    asc, then item asc) so a given buffer history is reproducible,
  *    but Spark's partial-merge order is not a stable cluster
  *    property — tests pin the bound, not exact values, above
  *    capacity.
  *
  * 100 TB shape: fixed-size state per group per partition (≤ k
  * entries regardless of input), map-side partials, merge is
  * entry-wise addition + bounded re-eviction — the vocabulary top-k
  * without a corpus-wide wordcount shuffle carrying every distinct
  * token.
  */
final class HHSketch(val k: Int) extends Serializable {
  require(k >= 1, "sketch capacity must be >= 1")

  /** item → (count, err). */
  private[functions] val entries = mutable.HashMap.empty[String, (Long, Long)]
  private[functions] var n: Long = 0L

  def count: Long = n
  def size: Int = entries.size

  private def minEntry: (String, (Long, Long)) =
    entries.minBy { case (item, (c, _)) => (c, item) }

  def add(item: String, w: Long = 1L, carriedErr: Long = 0L): Unit = {
    n += w
    entries.get(item) match {
      case Some((c, e)) => entries(item) = (c + w, e + carriedErr)
      case None if entries.size < k => entries(item) = (w, carriedErr)
      case None =>
        val (evicted, (minC, _)) = minEntry
        entries.remove(evicted)
        entries(item) = (minC + w, minC + carriedErr)
    }
  }

  def mergeWith(o: HHSketch): Unit = {
    require(o.k == k, s"cannot merge sketches of capacity $k and ${o.k}")
    // entry-wise: shared items sum counts and errors; new items go
    // through the eviction path carrying their accumulated error.
    // n is total weight — add() bumps it per merged entry, so set it
    // from the true totals afterwards.
    val total = n + o.n
    o.entries.toSeq.sortBy { case (item, (c, _)) => (-c, item) }.foreach {
      case (item, (c, e)) => add(item, c, e)
    }
    n = total
  }

  /** Top `topN` entries, count desc then item asc — deterministic. */
  def top(topN: Int): Seq[(String, Long, Long)] =
    entries.toSeq.map { case (item, (c, e)) => (item, c, e) }
      .sortBy { case (item, c, _) => (-c, item) }
      .take(topN)

  def serialize: Array[Byte] = {
    val items = entries.toSeq.sortBy(_._1)
    val itemBytes = items.map(_._1.getBytes("UTF-8"))
    val buf = java.nio.ByteBuffer.allocate(
      4 + 8 + 4 + itemBytes.map(_.length + 4 + 16).sum)
    buf.putInt(k).putLong(n).putInt(items.size)
    items.zip(itemBytes).foreach { case ((_, (c, e)), b) =>
      buf.putInt(b.length).put(b).putLong(c).putLong(e)
    }
    buf.array()
  }
}

object HHSketch {
  def deserialize(bytes: Array[Byte]): HHSketch = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val s = new HHSketch(buf.getInt)
    s.n = buf.getLong
    val sz = buf.getInt
    (0 until sz).foreach { _ =>
      val b = new Array[Byte](buf.getInt)
      buf.get(b)
      s.entries(new String(b, "UTF-8")) = (buf.getLong, buf.getLong)
    }
    s
  }
}

/** `graft_heavy_hitters(col, topN, k)` — typed imperative aggregate
  * over a string column; null inputs are skipped. Returns the top-N
  * entries as an array of (item, count, err) structs, count desc then
  * item asc (explode to scalar rows for gate output — list columns
  * break the driver comparator).
  */
case class HeavyHittersAgg(
    child: Expression,
    topN: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HHSketch] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  // SQL calls coerce the item column to string at analysis — without
  // this a non-string column analyzes fine and ClassCastExceptions at
  // execution.
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractDataType] =
    Seq(StringType)

  override def createAggregationBuffer(): HHSketch = new HHSketch(k)

  override def update(b: HHSketch, input: InternalRow): HHSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: HHSketch, o: HHSketch): HHSketch = { b.mergeWith(o); b }

  override def eval(b: HHSketch): Any =
    new GenericArrayData(b.top(topN).map { case (item, c, e) =>
      InternalRow(UTF8String.fromString(item), c, e)
    }.toArray[Any])

  override def serialize(b: HHSketch): Array[Byte] = b.serialize
  override def deserialize(bytes: Array[Byte]): HHSketch = HHSketch.deserialize(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType),
    StructField("err", LongType))))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_heavy_hitters"
}

object HeavyHitters {
  /** Column wrapper: `topK($"token", 10)`. */
  def topK(c: Column, topN: Int, k: Int = 1 << 16): Column =
    ColumnBridge.column(
      HeavyHittersAgg(ColumnBridge.expression(c), topN, k)
        .toAggregateExpression())
}
