package graft.tools

/** Microbench for the [[graft.functions.DSketch]] state-store
  * round-trip (r15 verdict task 4): st7s keeps 8 exact-tier sketches
  * (k = 2^18, ~150k values for l_orderkey at sf0.1) in the streaming
  * agg state, so every micro-batch pays serialize + deserialize per
  * column per partial/final hop. This times those pieces in isolation
  * so a serde change is judged on measurement, not on the r8-vs-r15
  * attribution disagreement. No Spark session — pure JVM cost.
  */
object SketchSerdeProbe {
  def main(args: Array[String]): Unit = {
    val k = 1 << 18
    val n = if (args.length > 0) args(0).toInt else 150000
    val reps = 20
    val rnd = new java.util.Random(42)
    val s = new graft.functions.DSketch(k, 14)
    (0 until n).foreach(_ =>
      s.add(java.lang.Double.doubleToLongBits(rnd.nextInt(1000000).toDouble)))
    (0 until 3).foreach { _ =>
      val b = s.serialize; graft.functions.DSketch.deserialize(b)
    }
    var t0 = System.nanoTime()
    var bytes: Array[Byte] = null
    (0 until reps).foreach(_ => bytes = s.serialize)
    println(f"serialize   x$reps: ${(System.nanoTime() - t0) / 1e9}%.3f s (${bytes.length} bytes, ${s.estimate} values)")
    t0 = System.nanoTime()
    (0 until reps).foreach(_ => graft.functions.DSketch.deserialize(bytes))
    println(f"deserialize x$reps: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    t0 = System.nanoTime()
    var i = 0
    while (i < 200000) {
      s.add(java.lang.Double.doubleToLongBits((i % 1000000).toDouble)); i += 1
    }
    println(f"200k adds       : ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }
}
