package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shuffle-bytes-per-entry probe across scale factors (r12 verdict
  * task 3): the committed extrapolation argument for 100 TB is not a
  * wall-time ratio (box-speed-confounded) but the SHUFFLE VOLUME curve —
  * an operator whose shuffle bytes grow linearly (or sublinearly) in
  * input while its plan shape holds is one whose 1000-executor behavior
  * is a bandwidth calculation, not a hope.
  *
  * For each (dir, entry): runs the catalog query, sums per-stage
  * shuffle write + read bytes via a SparkListener, prints one line
  * `SHUFFLE name dir rows=<out> write=<B> read=<B> sec=<t>`.
  * The listener bus is async — a short quiesce follows each query so
  * late stage-completed events land before the counters are read.
  *
  * Run: `sbt "runMain graft.tools.ShuffleProbe <entry> [entry ...]"`
  * with `GRAFT_PROBE_DIRS=/root/testdata/sf0.1,/tmp/graft_sf1,...`.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ShuffleProbe <entry> [entry ...]")
    val dirs = sys.env.getOrElse("GRAFT_PROBE_DIRS", "/root/testdata/sf0.1")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val write = new AtomicLong
    val read = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          read.addAndGet(m.shuffleReadMetrics.localBytesRead
            + m.shuffleReadMetrics.remoteBytesRead)
        }
      }
    })
    for (dir <- dirs; name <- args.toSeq) {
      // settle events from the previous query before zeroing
      Thread.sleep(1500)
      write.set(0); read.set(0)
      val t0 = System.nanoTime()
      // force the FULL output plan, not count()'s pruned one: count()
      // lets Catalyst drop unreferenced window/computed columns and
      // their exchanges (measured: a19's window shuffle vanished under
      // count(), reporting 59 bytes) — toRdd materializes every output
      // column exactly as Verify's parquet write does
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val rows = df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(1500) // async listener bus: let stage events land
      println(f"SHUFFLE $name%-24s $dir%-28s rows=$rows%-10d " +
        f"write=${write.get}%-12d read=${read.get}%-12d sec=$dt%.2f")
    }
    spark.stop()
    graft.core.Scratch.sweep()
  }
}
