package graft.tools

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.client.{GatewayClient, GatewayClientConfig}
import graft.core.ChannelSpec
import graft.server.Gateway
import graft.streaming.ChannelRuntime

/** End-to-end EXTERNAL throughput of the gateway — the in-process
  * [[IngestBench]] number re-measured through the real serving stack:
  * HTTP POST /send via [[GatewayClient]] (JSON encode → socket →
  * parse → validate → ingest → echo), concurrent state queries, and
  * a live WebSocket subscriber counting egress frames while ingest
  * runs. The gap between this and IngestBench is the web tier's
  * cost; both live in SCALE.md "Serving layer".
  *
  *   sbt "runMain graft.tools.ClientSoak [runMillis]"
  */
object ClientSoak {
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

    val rt = new ChannelRuntime(spark,
      Map("ticks" -> ChannelSpec("ticks", schema, stateKeyby = Seq("sym"),
        omitFromLookup = true)))
    rt.start()
    val gw = new Gateway(rt, 0).start()
    def client() = new GatewayClient(GatewayClientConfig(
      host = "127.0.0.1", port = gw.boundPort, wsPort = Some(gw.wsPort)))
    val batch = (0 until batchRows).map(i =>
      Map[String, Any]("sym" -> s"S${i % 50}", "px" -> (100.0 + i), "qty" -> i.toLong))

    def sendRun(threads: Int): Double = {
      val sent = new AtomicLong(0L)
      val done = new CountDownLatch(threads)
      val t0 = System.nanoTime()
      val deadline = t0 + runMillis * 1000000L
      (1 to threads).foreach { _ =>
        new Thread(() => {
          val c = client()
          try while (System.nanoTime() < deadline) {
            c.sendMany("ticks", batch)
            sent.addAndGet(batchRows.toLong)
          } finally done.countDown()
        }).start()
      }
      done.await(runMillis * 3, TimeUnit.MILLISECONDS)
      rt.processAllAvailable() // drain inside the window: landed rows
      val secs = (System.nanoTime() - t0) / 1e9
      sent.get() / secs
    }

    try {
      sendRun(8) // warmup (JIT both sides of the socket)

      for (threads <- Seq(1, 8, 32)) {
        val rate = (1 to 2).map(_ => sendRun(threads)).max
        println(f"CLIENT_SOAK send threads=$threads%2d rows_per_s=$rate%,.0f")
      }

      // state-query latency through the live stack (state has 50 keys)
      val c = client()
      val lat = (1 to 50).map { _ =>
        val t0 = System.nanoTime()
        require(c.state("ticks").size == 50)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"CLIENT_SOAK state_query p50=${lat(24)}%.1f ms p95=${lat(47)}%.1f ms")
      // the same query in-process, isolating engine cost from the
      // HTTP round trip (loopback delayed-ACK floors small responses)
      val latIn = (1 to 200).map { _ =>
        val t0 = System.nanoTime()
        require(rt.state("ticks").size == 50)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"CLIENT_SOAK state_query_inproc p50=${latIn(99)}%.3f ms p95=${latIn(189)}%.3f ms")

      // ws egress: subscriber counts frames while a PACED ingest runs
      // (an unthrottled firehose just trips the designed slow-consumer
      // eviction — one subscriber's sustainable rate is the metric)
      val stream = c.connect(Seq("ticks" -> None))
      Thread.sleep(300)
      val stop = new AtomicLong(System.nanoTime() + runMillis * 1000000L)
      val sender = new Thread(() => {
        val cs = client()
        while (System.nanoTime() < stop.get()) {
          cs.sendMany("ticks", batch.take(50))
          Thread.sleep(1)
        }
      })
      sender.start()
      var frames = 0L
      val t0 = System.nanoTime()
      while (System.nanoTime() < stop.get() + 500000000L) {
        if (stream.take(200).exists(f => f.get("channel").asText() == "ticks"))
          frames += 1
      }
      sender.join()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"CLIENT_SOAK ws_receive frames_per_s=${frames / secs}%,.0f")
      stream.close()
    } finally {
      gw.stop(); rt.stop(); spark.stop()
    }
  }
}
