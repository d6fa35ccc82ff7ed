package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types._

/** Fused per-column profile state: null count, min/max, and the
  * distinct sketch — ONE aggregate buffer instead of four separate
  * aggregate expressions per column. An 8-column profile plans 8
  * object-agg buffers instead of 32 mixed declarative/imperative ones
  * (the sketch already forces ObjectHashAggregate, so the fused
  * min/max/nulls lose no codegen) — smaller plans, fewer buffer
  * round-trips per streaming micro-batch (the st7s path).
  */
private[functions] final class PState(k: Int, p: Int) extends Serializable {
  var nulls: Long = 0L
  var n: Long = 0L
  var mn: Double = 0.0
  var mx: Double = 0.0
  // var (r16): deserialize ADOPTS the restored sketch instead of
  // merging it into a fresh one — the merge re-inserted every exact
  // value a second time on every state-store restore (st7s pays this
  // per column per micro-batch)
  var sketch = new DSketch(k, p)

  /** Spark double ordering (java Double.compare: NaN largest,
    * -0.0 < 0.0) — min/max must match the declarative aggregates. */
  def add(d0: Double): Unit = {
    val d = if (d0 == 0.0) 0.0 else if (d0 != d0) Double.NaN else d0
    if (n == 0L || java.lang.Double.compare(d0, mn) < 0) mn = d0
    if (n == 0L || java.lang.Double.compare(d0, mx) > 0) mx = d0
    n += 1
    sketch.add(java.lang.Double.doubleToLongBits(d))
  }

  def mergeWith(o: PState): Unit = {
    nulls += o.nulls
    if (o.n > 0) {
      if (n == 0L || java.lang.Double.compare(o.mn, mn) < 0) mn = o.mn
      if (n == 0L || java.lang.Double.compare(o.mx, mx) > 0) mx = o.mx
      n += o.n
    }
    sketch.mergeWith(o.sketch)
  }

  def serialize: Array[Byte] = {
    val sk = sketch.serialize
    val buf = java.nio.ByteBuffer.allocate(8 + 8 + 8 + 8 + 4 + sk.length)
    buf.putLong(nulls).putLong(n).putDouble(mn).putDouble(mx)
    buf.putInt(sk.length).put(sk)
    buf.array()
  }
}

private[functions] object PState {
  def deserialize(bytes: Array[Byte]): PState = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val nulls = buf.getLong
    val n = buf.getLong
    val mn = buf.getDouble
    val mx = buf.getDouble
    val skBytes = new Array[Byte](buf.getInt)
    buf.get(skBytes)
    val sk = DSketch.deserialize(skBytes)
    val s = new PState(sk.k, sk.p)
    s.nulls = nulls; s.n = n; s.mn = mn; s.mx = mx
    s.sketch = sk // adopt, don't re-insert (same set, same estimate)
    s
  }
}

/** `graft_profile(col, k, p)` → struct(n_nulls, n_distinct, min_v,
  * max_v) — the per-column numeric profile in one buffer. Same value
  * semantics as the unfused quadruple `sum(when isNull)/
  * graft_distinct_sketch/min/max` over the double-cast column
  * (min_v/max_v are NULL when every value was null).
  */
case class ProfileSketchAgg(
    child: Expression,
    k: Int,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PState] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[TypeBridge.AbstractDataType] = Seq(DoubleType)

  override def createAggregationBuffer(): PState = new PState(k, p)

  override def update(b: PState, input: InternalRow): PState = {
    val v = child.eval(input)
    if (v == null) b.nulls += 1
    else b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: PState, o: PState): PState = { b.mergeWith(o); b }

  override def eval(b: PState): Any =
    InternalRow(b.nulls, b.sketch.estimate,
      if (b.n == 0L) null else b.mn,
      if (b.n == 0L) null else b.mx)

  override def serialize(b: PState): Array[Byte] = b.serialize
  override def deserialize(bytes: Array[Byte]): PState = PState.deserialize(bytes)

  override def dataType: DataType = StructType(Seq(
    StructField("n_nulls", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("min_v", DoubleType),
    StructField("max_v", DoubleType)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): ProfileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ProfileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ProfileSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_profile"
}

object ProfileSketch {
  /** Column wrapper: `profile($"l_quantity", 1 << 18)`. */
  def profile(c: Column, k: Int = 1 << 16, p: Int = 14): Column =
    ColumnBridge.column(
      ProfileSketchAgg(ColumnBridge.expression(c.cast("double")), k, p)
        .toAggregateExpression())
}
