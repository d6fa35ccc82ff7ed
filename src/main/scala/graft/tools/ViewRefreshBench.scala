package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.core.ChannelSpec
import graft.operators.ViewConfig
import graft.sinks.ViewServer
import graft.streaming.ChannelRuntime

/** A/B: ViewServer full-recompute vs delta-maintained refresh cost
  * across state sizes (round-8 task 2's 1M-row measurement, extended
  * in round 9 to the crossover curve + mixed view shapes + the
  * staleness-skip hit rate). One JVM; at each cumulative state size,
  * both paths are timed over 3 small ticks — the 2 s periodic-refresh
  * loop pays exactly this cost per tick, so O(delta) vs O(state) is
  * the serving-path scalability question.
  *
  *   sbt "runMain graft.tools.ViewRefreshBench [size1,size2,…] [deltaRows]"
  */
object ViewRefreshBench {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10000, 100000, 1000000))
    val deltaRows = args.lift(1).map(_.toInt).getOrElse(1000)
    require(sizes == sizes.sorted, "sizes must ascend (state only grows)")
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

    // the mixed shapes a real gateway mounts: key-collapsed index view,
    // ring-buffer view, bounded sorted view, aggregate view (the last
    // is NEVER delta-eligible — it rides the tick-staleness skip)
    val views = Map(
      "indexed" -> ViewConfig(
        index = Some((Seq("k"), ChannelRuntime.SeqCol)),
        filter = Seq(("x", ">=", 0L))),
      "ring" -> ViewConfig(),
      "limited" -> ViewConfig(sort = Seq(("x", false)), limit = Some(50)),
      "agg" -> ViewConfig(
        groupBy = Seq("cat"), aggregates = Seq("mx" -> ("x", "max"))))

    var sent = 0
    def growTo(target: Int): Unit = {
      val batch = 100000
      while (sent < target) {
        val n = math.min(batch, target - sent)
        rt.send("ch", mkRows(sent, n))
        rt.processAllAvailable()
        sent += n
      }
    }

    def timeRefresh(vs: ViewServer, label: String, afterTick: Boolean): Double = {
      if (afterTick) {
        rt.send("ch", mkRows(sent, deltaRows)); rt.processAllAvailable()
        sent += deltaRows
      }
      val t0 = System.nanoTime()
      vs.refresh()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-34s ${dt}%8.3f s")
      dt
    }

    val summary = Seq.newBuilder[String]
    sizes.foreach { size =>
      growTo(size)

      val vsFull = new ViewServer(rt, deltaMaintenance = false)
      views.foreach { case (n, c) => vsFull.define(n, "ch", c) }
      timeRefresh(vsFull, s"[$size] full: first", afterTick = false)
      val fullTimes =
        (1 to 3).map(_ => timeRefresh(vsFull, s"[$size] full: after tick", afterTick = true))

      val vsDelta = new ViewServer(rt)
      views.foreach { case (n, c) => vsDelta.define(n, "ch", c) }
      timeRefresh(vsDelta, s"[$size] delta: initial build", afterTick = false)
      val preFull = vsDelta.fullRefreshCount
      val deltaTimes =
        (1 to 3).map(_ => timeRefresh(vsDelta, s"[$size] delta: after tick", afterTick = true))
      // staleness skip: idle refreshes must not recompute the agg view
      val ticked = vsDelta.fullRefreshCount - preFull
      (1 to 5).foreach(_ => vsDelta.refresh())
      val idle = vsDelta.fullRefreshCount - preFull - ticked
      val idle0 = System.nanoTime()
      vsDelta.refresh()
      val idleSec = (System.nanoTime() - idle0) / 1e9
      println(f"[$size] delta: idle refresh            ${idleSec}%8.3f s  " +
        s"(agg recomputes: $ticked on 3 ticks, $idle on 5 idle refreshes)")
      require(idle == 0L, "idle refresh must skip the aggregate recompute")
      // parity across paths at this size (the delta server's ticks
      // advanced the state past the full server's last refresh —
      // refresh it once so both views see the same frontier)
      vsFull.refresh()
      require(vsDelta.snapshot("indexed").size == vsFull.snapshot("indexed").size,
        "delta/full indexed snapshot size mismatch")

      summary += f"state=$size%7d  full_min=${fullTimes.min}%7.3f s  " +
        f"delta_min=${deltaTimes.min}%7.3f s  speedup=${fullTimes.min / deltaTimes.min}%5.1fx"
    }
    println("VIEW_BENCH_OK")
    summary.result().foreach(println)
    rt.stop(); spark.stop()
  }
}
