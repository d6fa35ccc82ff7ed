package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{DataType, LongType}

/** Mergeable rank/quantile sketch (KLL-style level compactors) with a
  * DETERMINISTIC compaction rule.
  *
  * Structure: level `h` holds items each standing for `2^h` original
  * values. Inserts land in level 0; when a level exceeds `k` items it
  * is sorted and every second item survives to the next level, the
  * starting parity alternating per compaction (deterministic — KLL
  * flips a coin here; we trade its probabilistic guarantee for exact
  * reproducibility, keeping the classic deterministic bound of ~2n/k
  * rank error per level, KLL §2 / Manku-Rajagopalan-Lindsay).
  *
  * Contract tiers:
  *  - `n ≤ k`: NO compaction ever runs — the sketch holds every value
  *    and `quantile(q)` is the EXACT lower quantile (element at rank
  *    `floor(q·(n-1))`), independent of partial-merge order. This is
  *    the gate tier: the oracle compares against DuckDB's exact rank
  *    pick (`st4_quantile_sketch`).
  *  - `n > k`: bounded-error estimate; size stays O(k·log(n/k)).
  *    Compaction is deterministic per buffer history, but Spark's
  *    partial-merge ORDER is not a stable property of a cluster run,
  *    so above capacity the estimate is reproducible only per plan —
  *    tests pin the rank-error bound, not the exact value.
  *
  * 100 TB shape: constant-size partial state per partition, one
  * map-side partial per group, merge is level-wise concatenation —
  * exactly the shape `approx_percentile` has, but with an explicit,
  * documented, cross-engine-checkable exact tier.
  */
final class QSketch(val k: Int) extends Serializable {
  require(k >= 2, "sketch capacity must be >= 2")

  /** levels(h): items of weight 2^h. */
  private[functions] var levels: ArrayBuffer[ArrayBuffer[Long]] =
    ArrayBuffer(ArrayBuffer.empty[Long])
  /** per-level compaction counters (drive the surviving parity). */
  private[functions] var compactions: ArrayBuffer[Long] = ArrayBuffer(0L)
  private[functions] var n: Long = 0L

  def count: Long = n

  /** Items currently held across all levels — O(k·log(n/k)), not O(n). */
  def heldItems: Int = levels.map(_.size).sum

  def add(v: Long): Unit = {
    levels(0) += v
    n += 1
    var h = 0
    while (h < levels.size && levels(h).size > k) { compact(h); h += 1 }
  }

  private def ensureLevel(h: Int): Unit =
    while (levels.size <= h) { levels += ArrayBuffer.empty[Long]; compactions += 0L }

  private def compact(h: Int): Unit = {
    ensureLevel(h + 1)
    val buf = levels(h)
    val sorted = buf.sortInPlace()
    val offset = (compactions(h) & 1L).toInt
    var i = offset
    while (i < sorted.size) { levels(h + 1) += sorted(i); i += 2 }
    compactions(h) += 1
    levels(h) = ArrayBuffer.empty[Long]
    // a dropped odd tail item is absorbed by the bound, not resampled
  }

  def mergeWith(o: QSketch): Unit = {
    require(o.k == k, s"cannot merge sketches of capacity $k and ${o.k}")
    ensureLevel(o.levels.size - 1)
    var h = 0
    while (h < o.levels.size) {
      levels(h) ++= o.levels(h)
      compactions(h) += o.compactions(h)
      h += 1
    }
    n += o.n
    h = 0
    while (h < levels.size) {
      if (levels(h).size > k) compact(h)
      h += 1
    }
  }

  /** Lower quantile: smallest value whose cumulative (weighted) rank
    * exceeds `floor(q·(n-1))`. Exact while no compaction has run. */
  def quantile(q: Double): Option[Long] = {
    if (n == 0) return None
    require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0,1]")
    val items = ArrayBuffer.empty[(Long, Long)] // (value, weight)
    var h = 0
    while (h < levels.size) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    val target = math.floor(q * (n - 1)).toLong
    var cum = 0L
    var i = 0
    while (i < sorted.size) {
      cum += sorted(i)._2
      if (cum > target) return Some(sorted(i)._1)
      i += 1
    }
    Some(sorted.last._1) // weight lost to compaction tails: clamp to max
  }

  def serialize: Array[Byte] = {
    val nItems = levels.map(_.size.toLong).sum
    val buf = java.nio.ByteBuffer.allocate(4 + 8 + 4 + levels.size * (8 + 4) + nItems.toInt * 8)
    buf.putInt(k).putLong(n).putInt(levels.size)
    levels.indices.foreach { h =>
      buf.putLong(compactions(h)).putInt(levels(h).size)
      levels(h).foreach(buf.putLong)
    }
    buf.array()
  }
}

object QSketch {
  def deserialize(bytes: Array[Byte]): QSketch = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val s = new QSketch(buf.getInt)
    s.n = buf.getLong
    val nLevels = buf.getInt
    s.levels = ArrayBuffer.fill(nLevels)(ArrayBuffer.empty[Long])
    s.compactions = ArrayBuffer.fill(nLevels)(0L)
    (0 until nLevels).foreach { h =>
      s.compactions(h) = buf.getLong
      val sz = buf.getInt
      (0 until sz).foreach(_ => s.levels(h) += buf.getLong)
    }
    s
  }
}

/** `graft_quantile_sketch(col, q, k)` — typed imperative aggregate over
  * a long column; null input rows are skipped, empty groups yield null.
  */
case class QuantileSketchAgg(
    child: Expression,
    q: Double,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  // SQL calls analyze through the implicit cast (an int/short column
  // coerces to long); without this, `graft_quantile_sketch(int_col,…)`
  // would pass analysis and ClassCastException at execution.
  override def inputTypes: Seq[TypeBridge.AbstractDataType] = Seq(LongType)

  override def createAggregationBuffer(): QSketch = new QSketch(k)

  override def update(b: QSketch, input: InternalRow): QSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: QSketch, o: QSketch): QSketch = { b.mergeWith(o); b }

  override def eval(b: QSketch): Any = b.quantile(q).orNull

  override def serialize(b: QSketch): Array[Byte] = b.serialize
  override def deserialize(bytes: Array[Byte]): QSketch = QSketch.deserialize(bytes)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_quantile_sketch"
}

object QuantileSketch {
  /** Column wrapper: `quantileSketch($"n_chars", 0.5)`. Casts to long —
    * the sketch's exact tier is an integer contract. */
  def quantileSketch(c: Column, q: Double, k: Int = 8192): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(c.cast("long")), q, k)
        .toAggregateExpression())
}
