package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode–Muthukrishnan): `depth` rows of `width`
  * counters; an item increments one counter per row (row-specific
  * hash), a point query reads the MIN across rows — an upper bound on
  * the true count that over-counts only when some other item collides
  * in EVERY row (probability ≈ distinct·width^-depth per target).
  *
  * Complements the family: SpaceSaving answers "who are the top k",
  * KMV answers "how many distinct" — count-min answers "how often did
  * THIS item occur" for items outside any top-k, under a fixed memory
  * budget and with FULLY commutative merges (elementwise counter
  * addition — no tie rules, no compaction history), which makes the
  * partial-aggregate plan trivially exact w.r.t. the sketch contract.
  *
  * Determinism: the row hashes derive from two fixed 64-bit byte
  * hashes of the item, so the filled sketch is a pure function of the
  * input MULTISET — partition layout and merge order cannot change any
  * counter (addition commutes).
  */
final class CMSketch(val width: Int, val depth: Int) extends Serializable {
  require(width >= 2 && Integer.bitCount(width) == 1,
    "count-min width must be a power of two >= 2")
  require(depth >= 1 && depth <= 16, "count-min depth must be in [1, 16]")

  private[functions] val rows: Array[Array[Long]] =
    Array.fill(depth)(new Array[Long](width))
  private[functions] var n: Long = 0L

  def count: Long = n

  /** Row-`i` bucket via Kirsch–Mitzenmacher double hashing over TWO
    * independent 64-bit hashes of the raw item bytes: g_i = h1 + (i+1)·h2,
    * finalized with a full-avalanche mix. With per-row buckets derived
    * from 128 bits of item identity, two distinct items collide in
    * every row with probability ≈ width^-depth as the analysis
    * assumes — the previous single ~30-bit base hash (polyHash mod
    * 1e9+7) floored accuracy at ~distinct²/1e9 full-collision pairs
    * regardless of depth once vocab reached the birthday regime. */
  private def bucket(h1: Long, h2: Long, i: Int): Int = {
    var mixed = h1 + (i + 1).toLong * h2
    mixed = (mixed ^ (mixed >>> 30)) * 0xbf58476d1ce4e5b9L
    ((mixed >>> 17) & (width - 1)).toInt
  }

  def add(h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < depth) { rows(i)(bucket(h1, h2, i)) += 1; i += 1 }
    n += 1
  }

  def estimate(h1: Long, h2: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = rows(i)(bucket(h1, h2, i))
      if (c < best) best = c
      i += 1
    }
    best
  }

  def mergeWith(o: CMSketch): Unit = {
    require(o.width == width && o.depth == depth,
      s"cannot merge count-min ($width,$depth) with (${o.width},${o.depth})")
    var i = 0
    while (i < depth) {
      var j = 0
      while (j < width) { rows(i)(j) += o.rows(i)(j); j += 1 }
      i += 1
    }
    n += o.n
  }

  def serialize: Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(16 + depth * width * 8)
    buf.putInt(width).putInt(depth).putLong(n)
    rows.foreach(_.foreach(buf.putLong))
    buf.array()
  }
}

object CMSketch {
  /** Two independent 64-bit FNV-1a-then-avalanche hashes of the item's
    * UTF-8 bytes — the full-entropy inputs [[CMSketch.add]] needs. */
  def hashPair(s: UTF8String): (Long, Long) = {
    val bytes = s.getBytes
    var h1 = 0xcbf29ce484222325L
    var h2 = 0x6c62272e07bb0142L
    var i = 0
    while (i < bytes.length) {
      h1 = (h1 ^ (bytes(i) & 0xff)) * 0x100000001b3L
      h2 = (h2 ^ (bytes(i) & 0xff)) * 0x3f25e217a3d8af17L
      i += 1
    }
    def fin(x0: Long): Long = {
      var x = x0
      x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    (fin(h1), fin(h2 + bytes.length))
  }

  def deserialize(bytes: Array[Byte]): CMSketch = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val s = new CMSketch(buf.getInt, buf.getInt)
    s.n = buf.getLong
    var i = 0
    while (i < s.depth) {
      var j = 0
      while (j < s.width) { s.rows(i)(j) = buf.getLong; j += 1 }
      i += 1
    }
    s
  }
}

/** `graft_countmin(item, targets, width, depth)` — fills a count-min
  * sketch over a string column and returns the point estimates for the
  * literal `targets`, in target order, as array<long>. Null items are
  * skipped. Item and target hashes are the 128-bit byte-hash pair.
  */
case class CountMinAgg(
    child: Expression,
    targets: Seq[String],
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CMSketch] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  require(targets.nonEmpty, "graft_countmin needs at least one target")

  override def inputTypes: Seq[TypeBridge.AbstractDataType] = Seq(StringType)

  private lazy val targetHashes: Array[(Long, Long)] =
    targets.map(t => CMSketch.hashPair(UTF8String.fromString(t))).toArray

  override def createAggregationBuffer(): CMSketch = new CMSketch(width, depth)

  override def update(b: CMSketch, input: InternalRow): CMSketch = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) = CMSketch.hashPair(v.asInstanceOf[UTF8String])
      b.add(h1, h2)
    }
    b
  }

  override def merge(b: CMSketch, o: CMSketch): CMSketch = { b.mergeWith(o); b }

  override def eval(b: CMSketch): Any =
    new GenericArrayData(targetHashes.map { case (h1, h2) => b.estimate(h1, h2) })

  override def serialize(b: CMSketch): Array[Byte] = b.serialize
  override def deserialize(bytes: Array[Byte]): CMSketch = CMSketch.deserialize(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_countmin"
}

object CountMin {
  /** Column wrapper: `countMinEstimates($"token", Seq("the", "a"), 1 << 14, 4)`. */
  def countMinEstimates(
      item: Column,
      targets: Seq[String],
      width: Int = 1 << 14,
      depth: Int = 4): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(item.cast("string")), targets, width, depth)
        .toAggregateExpression())
}
