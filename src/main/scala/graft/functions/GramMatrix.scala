package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass exact second-moment (Gram) accumulator over an embedding
  * column, the substrate for distributed PCA / whitening at corpus
  * scale: a single scan produces `n`, the per-dimension sums, and the
  * upper-triangular sum-of-products matrix, from which mean and
  * covariance follow on the driver (`Pca.covariance`) without a second
  * pass over the data.
  *
  * Exactness contract: each component is quantized to a 64-bit integer
  * by `trunc(toDouble(x) * 2^scaleBits)` BEFORE any accumulation.
  * Scaling by a power of two is exact in binary floating point and
  * `trunc` rounds toward zero in both Spark and DuckDB, so every
  * accumulated value is an integer that is a pure function of the
  * input multiset — partition layout, merge order, and partial
  * aggregation cannot change any cell (long addition commutes), and
  * the DuckDB oracle can reproduce the matrix bit-for-bit. Headroom:
  * a cell accumulates Σ q_i·q_j over ALL rows (partials merge by
  * addition, so the TOTAL row count is what bounds it). At the
  * default `scaleBits = 20` and unit-norm 64-dim vectors (components
  * ~2^-3 → q ~ 2^17, products ~2^34) the 2^63 long ceiling allows
  * ~10^8–10^9 rows; at corpus scales beyond that, pass a smaller
  * `scaleBits` — each bit removed from the scale buys two bits of
  * row-count headroom per cell, and covariance consumers need far
  * less than 20 fractional bits. Every accumulation is CHECKED
  * (`addExact`/`multiplyExact`): the contract is exact-or-fail,
  * never a silent wrap.
  *
  * 100 TB shape: the shuffle carries ONE buffer of
  * `dim*(dim+5)/2 + 1` longs per partition (≈ 17 KB at dim=64), never
  * a row; this is the canonical map-side-combine aggregate plan.
  */
final class GramBuf(val dim: Int) extends Serializable {
  val tri: Int = dim * (dim + 1) / 2
  var n: Long = 0L
  val sums: Array[Long] = new Array[Long](dim)
  val prods: Array[Long] = new Array[Long](tri)

  // checked arithmetic throughout: the contract is EXACT-OR-FAIL.
  // A silent wrap would corrupt every covariance cell downstream with
  // no symptom; the fix at scale is a smaller scaleBits (each bit off
  // the scale doubles the row-count headroom per cell), so the error
  // message names the knob.
  private def chk(a: Long, b: Long): Long =
    try java.lang.Math.addExact(a, b)
    catch {
      case _: ArithmeticException => throw new ArithmeticException(
        s"graft_gram accumulator overflow (dim=$dim): lower scaleBits " +
          "(each bit halves per-cell magnitude twice over) or reduce rows")
    }

  def add(q: Array[Long]): Unit = {
    n += 1
    var i = 0
    var p = 0
    while (i < dim) {
      sums(i) = chk(sums(i), q(i))
      var j = i
      while (j < dim) {
        prods(p) = chk(prods(p), java.lang.Math.multiplyExact(q(i), q(j)))
        p += 1; j += 1
      }
      i += 1
    }
  }

  def mergeWith(o: GramBuf): Unit = {
    n += o.n
    var i = 0
    while (i < dim) { sums(i) = chk(sums(i), o.sums(i)); i += 1 }
    var p = 0
    while (p < tri) { prods(p) = chk(prods(p), o.prods(p)); p += 1 }
  }

  def serialize: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * (2 + dim + tri))
    bb.putLong(dim.toLong).putLong(n)
    sums.foreach(bb.putLong)
    prods.foreach(bb.putLong)
    bb.array()
  }
}

object GramBuf {
  def deserialize(bytes: Array[Byte]): GramBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new GramBuf(bb.getLong.toInt)
    b.n = bb.getLong
    var i = 0
    while (i < b.dim) { b.sums(i) = bb.getLong; i += 1 }
    var p = 0
    while (p < b.tri) { b.prods(p) = bb.getLong; p += 1 }
    b
  }
}

/** `graft_gram(vec, dim, scaleBits)` over `array<float|double>`:
  * returns `array<struct<i:int, j:int, v:long>>` with 1-based matrix
  * coordinates — row `(0,0)` is the vector count, `(0,j)` the sum of
  * quantized component `j`, and `(i,j), i<=j` the sum of quantized
  * products. Null vectors are skipped; a vector of the wrong length
  * fails fast (a silent skip would bias every downstream covariance).
  */
case class GramMatrixAgg(
    child: Expression,
    dim: Int,
    scaleBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuf] with UnaryLike[Expression] {

  require(dim >= 1 && dim <= 4096, "graft_gram dim must be in [1, 4096]")
  require(scaleBits >= 0 && scaleBits <= 30, "graft_gram scaleBits must be in [0, 30]")

  private val scale: Double = java.lang.Math.scalb(1.0, scaleBits)

  private lazy val elementToDouble: Any => Double = {
    child.dataType match {
      case ArrayType(FloatType, _) => (v: Any) => v.asInstanceOf[Float].toDouble
      case ArrayType(DoubleType, _) => (v: Any) => v.asInstanceOf[Double]
      case other => sys.error(s"graft_gram needs array<float|double>, got $other")
    }
  }

  override def createAggregationBuffer(): GramBuf = new GramBuf(dim)

  override def update(b: GramBuf, input: InternalRow): GramBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"graft_gram: vector length ${arr.numElements()} != dim $dim")
      val q = new Array[Long](dim)
      var k = 0
      val elemType = child.dataType.asInstanceOf[ArrayType].elementType
      while (k < dim) {
        val e = arr.get(k, elemType)
        require(e != null, s"graft_gram: null component at index $k")
        // trunc-toward-zero of an exactly power-of-two-scaled double:
        // identical to DuckDB CAST(trunc(CAST(x AS DOUBLE)*2^s) AS BIGINT)
        q(k) = (elementToDouble(e) * scale).toLong
        k += 1
      }
      b.add(q)
    }
    b
  }

  override def merge(b: GramBuf, o: GramBuf): GramBuf = { b.mergeWith(o); b }

  override def eval(b: GramBuf): Any = {
    // empty input: emit ONLY the count row — matches the SQL oracle
    // (whose sum/product CTEs group away to nothing on zero rows) and
    // gives consumers an unambiguous n=0 signal instead of 2 144
    // zero cells that look like a degenerate-but-real matrix
    if (b.n == 0L)
      return new GenericArrayData(
        Array[Any](new GenericInternalRow(Array[Any](0, 0, 0L))))
    val out = new Array[Any](1 + dim + b.tri)
    out(0) = new GenericInternalRow(Array[Any](0, 0, b.n))
    var k = 0
    while (k < dim) {
      out(1 + k) = new GenericInternalRow(Array[Any](0, k + 1, b.sums(k)))
      k += 1
    }
    var i = 0
    var p = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(1 + dim + p) =
          new GenericInternalRow(Array[Any](i + 1, j + 1, b.prods(p)))
        p += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: GramBuf): Array[Byte] = b.serialize
  override def deserialize(bytes: Array[Byte]): GramBuf = GramBuf.deserialize(bytes)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): GramMatrixAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_gram"
}

object GramMatrix {
  /** Default quantization scale: 2^20 (see the class doc for headroom). */
  val DefaultScaleBits = 20

  /** Column wrapper: `gramTriples($"embedding", 64)`. */
  def gramTriples(vec: Column, dim: Int,
      scaleBits: Int = DefaultScaleBits): Column =
    ColumnBridge.column(
      GramMatrixAgg(ColumnBridge.expression(vec), dim, scaleBits)
        .toAggregateExpression())
}
