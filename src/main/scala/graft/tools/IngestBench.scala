package graft.tools

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.core.ChannelSpec
import graft.streaming.ChannelRuntime

/** Measures the driver ingest ceiling: rows/s through
  * [[ChannelRuntime.send]] (validate → coerce → seq-stamp → fan-out)
  * at 1/8/32 concurrent client threads — the single-node bottleneck
  * a 100×-ingest deployment hits first (SCALE.md "Serving layer").
  * The scale-out path for bulk ingest is NOT this method: the Kafka /
  * file-drop / engine-replay sources feed executors directly and
  * shard with the cluster; `send` is the interactive REST/WS surface,
  * whose ceiling this records.
  *
  * Each client thread sends batches of `batchRows` maps for
  * `runMillis`; reported rate is total rows / wall time, 2 reps after
  * a warmup. The runtime consumes its MemoryStream continuously so
  * the measurement includes the real per-batch handoff, not an
  * unbounded enqueue.
  */
object IngestBench {
  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("timestamp", TimestampType),
    StructField("sym", StringType),
    StructField("px", DoubleType),
    StructField("qty", LongType)))

  def main(args: Array[String]): Unit = {
    val runMillis = args.headOption.map(_.toLong).getOrElse(3000L)
    val batchRows = 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(threads: Int): Double = {
      val rt = new ChannelRuntime(spark,
        Map("ticks" -> ChannelSpec("ticks", schema, stateKeyby = Seq("sym"))))
      rt.start()
      val batch = (0 until batchRows).map(i =>
        Map[String, Any]("sym" -> s"S${i % 50}", "px" -> (100.0 + i), "qty" -> i.toLong))
      val sent = new AtomicLong(0L)
      val done = new CountDownLatch(threads)
      val t0 = System.nanoTime()
      val deadline = t0 + runMillis * 1000000L
      (1 to threads).foreach { _ =>
        new Thread(() => {
          try while (System.nanoTime() < deadline) {
            rt.send("ticks", batch)
            sent.addAndGet(batchRows.toLong)
          } finally done.countDown()
        }).start()
      }
      done.await(runMillis * 3, TimeUnit.MILLISECONDS)
      rt.processAllAvailable() // drain INSIDE the timed window: the
      // rate includes the per-batch handoff debt, not just enqueue
      val secs = (System.nanoTime() - t0) / 1e9
      rt.stop()
      sent.get() / secs
    }

    run(8) // warmup: JIT the coerce/validate path
    for (threads <- Seq(1, 8, 32)) {
      val rates = (1 to 2).map(_ => run(threads))
      println(f"INGEST threads=$threads%2d rows_per_s=${rates.max}%,.0f")
    }
    spark.stop()
  }
}
