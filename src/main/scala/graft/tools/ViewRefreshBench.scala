package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.core.ChannelSpec
import graft.operators.ViewConfig
import graft.sinks.ViewServer
import graft.streaming.ChannelRuntime

/** A/B: ViewServer full-recompute vs delta-maintained refresh cost on
  * a large state (round-8 task 2's "measured refresh-cost A/B on a
  * 1M-row state"). Prints per-path steady-state refresh times after a
  * small tick — the 2 s periodic-refresh loop pays exactly this cost.
  *
  *   sbt "runMain graft.tools.ViewRefreshBench [stateRows] [deltaRows]"
  */
object ViewRefreshBench {
  def main(args: Array[String]): Unit = {
    val stateRows = args.headOption.map(_.toInt).getOrElse(1000000)
    val deltaRows = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = graft.core.GraftSession.build("local[8]", "graft-view-bench", 8)
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("timestamp", TimestampType),
      StructField("k", StringType), StructField("cat", StringType),
      StructField("x", LongType)))
    val rt = new ChannelRuntime(spark,
      Map("ch" -> ChannelSpec("ch", schema, stateKeyby = Seq("k"),
        omitFromLookup = true)),
      Files.createTempDirectory("graft-vb-ckpt").toString)
    rt.start()

    def mkRows(from: Int, n: Int): Seq[Map[String, Any]] =
      (from until from + n).map(i => Map[String, Any](
        "k" -> s"k$i", "cat" -> s"c${i % 100}", "x" -> i.toLong))

    val batch = 100000
    var sent = 0
    while (sent < stateRows) {
      val n = math.min(batch, stateRows - sent)
      rt.send("ch", mkRows(sent, n))
      rt.processAllAvailable()
      sent += n
      if (sent % 500000 == 0) println(s"ingested $sent")
    }

    val views = Map(
      "indexed" -> ViewConfig(
        index = Some((Seq("k"), ChannelRuntime.SeqCol)),
        filter = Seq(("x", ">=", 0L))),
      "ring" -> ViewConfig()) // default ring-buffer cap

    def timeRefresh(vs: ViewServer, label: String, afterTick: Boolean): Double = {
      if (afterTick) {
        rt.send("ch", mkRows(sent, deltaRows)); rt.processAllAvailable()
        sent += deltaRows
      }
      val t0 = System.nanoTime()
      vs.refresh()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s ${dt}%8.3f s")
      dt
    }

    // FULL path: every refresh recomputes + collects the frontier
    val vsFull = new ViewServer(rt, deltaMaintenance = false)
    views.foreach { case (n, c) => vsFull.define(n, "ch", c) }
    timeRefresh(vsFull, "full: first", afterTick = false)
    val fullTimes = (1 to 3).map(_ => timeRefresh(vsFull, "full: after 1k-tick", afterTick = true))

    // DELTA path: first refresh builds the base, then per-tick deltas;
    // snapshot materialization is lazy, so time reads separately
    val vsDelta = new ViewServer(rt)
    views.foreach { case (n, c) => vsDelta.define(n, "ch", c) }
    timeRefresh(vsDelta, "delta: initial build", afterTick = false)
    val deltaTimes = (1 to 3).map(_ => timeRefresh(vsDelta, "delta: after 1k-tick", afterTick = true))
    val read0 = System.nanoTime()
    vsDelta.snapshot("indexed"); vsDelta.snapshot("ring")
    println(f"delta: first read (materialize) ${(System.nanoTime() - read0) / 1e9}%8.3f s")
    val read1 = System.nanoTime()
    vsDelta.snapshot("indexed"); vsDelta.snapshot("ring")
    println(f"delta: cached read           ${(System.nanoTime() - read1) / 1e9}%8.3f s")
    val idle0 = System.nanoTime()
    vsDelta.refresh() // no tick: should be ~free
    println(f"delta: idle refresh          ${(System.nanoTime() - idle0) / 1e9}%8.3f s")

    // sanity: both paths agree on the indexed snapshot size
    require(vsDelta.snapshot("indexed").size == vsFull.snapshot("indexed").size,
      "delta/full snapshot size mismatch")
    println(f"VIEW_BENCH_OK state=$stateRows delta=$deltaRows " +
      f"full_min=${fullTimes.min}%.3f delta_min=${deltaTimes.min}%.3f " +
      f"speedup=${fullTimes.min / deltaTimes.min}%.1fx")
    rt.stop(); spark.stop()
  }
}
