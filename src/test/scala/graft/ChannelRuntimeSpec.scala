package graft

import java.nio.file.Files

import scala.concurrent.duration._

import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ChannelSpec
import graft.state.{FilterBy, StateFilter, StateQuery}
import graft.streaming.{ChannelRuntime, EngineLog}

/** End-to-end streaming gateway tests, mirroring the reference's
  * GatewayTestHarness flow: send events into the graph, let micro-
  * batches process, assert last/next/state/lookup and the engine-log
  * encode/replay roundtrip.
  */
class ChannelRuntimeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val exampleSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("timestamp", TimestampType),
    StructField("x", LongType),
    StructField("y", StringType)))

  private def newRuntime(): ChannelRuntime = {
    val specs = Map(
      "example" -> ChannelSpec("example", exampleSchema, stateKeyby = Seq("y")),
      "basket" -> ChannelSpec("basket", exampleSchema, basketKey = Some("y"),
        stateKeyby = Seq("y")),
      "out" -> ChannelSpec("out", exampleSchema))
    new ChannelRuntime(spark, specs,
      Files.createTempDirectory("graft-test-ckpt").toString)
  }

  test("send assigns system fields and state accumulates last-per-key") {
    val rt = newRuntime()
    rt.start()
    try {
      val sent = rt.send("example", Seq(
        Map("x" -> 1L, "y" -> "a"), Map("x" -> 2L, "y" -> "b"), Map("x" -> 3L, "y" -> "a")))
      assert(sent.forall(r => r.getAs[String]("id") != null))
      rt.processAllAvailable()

      assert(rt.last("example").map(_.getAs[Long]("x")) === Some(3L))
      assert(rt.tickCount("example") === 3L)

      val st = rt.state("example")
      assert(st.map(r => (r.getAs[String]("y"), r.getAs[Long]("x"))) === Seq("a" -> 3L, "b" -> 2L))

      val filtered = rt.state("example",
        StateQuery(Seq(StateFilter("x", FilterBy.Value(2), "<="))))
      assert(filtered.map(_.getAs[String]("y")) === Seq("b"))

      val id = sent.head.getAs[String]("id")
      assert(rt.lookup("example", id).map(_.getAs[Long]("x")) === Some(1L))
      assert(rt.lookup("example", "nope").isEmpty)
    } finally rt.stop()
  }

  test("send validation: unknown fields and missing required fields rejected") {
    val rt = newRuntime()
    intercept[IllegalArgumentException] {
      rt.send("example", Seq(Map("ghost" -> 1)))
    }
    intercept[NoSuchElementException] { rt.send("ghost_channel", Seq(Map.empty)) }
  }

  test("processor hook rewrites/drops records; validateAfter rejects (2.6 UDF surface)") {
    val specs = Map(
      "hooked" -> ChannelSpec("hooked", exampleSchema,
        // drop x<0, double x otherwise (KafkaChannelProcessor.process shape)
        processor = Some(r =>
          if (r.getAs[Long]("x") < 0) None
          else Some(org.apache.spark.sql.Row.fromSeq(
            r.toSeq.updated(exampleSchema.fieldIndex("x"), r.getAs[Long]("x") * 2)))),
        // model validator: y must be non-empty
        validateAfter = Some(r =>
          if (r.getAs[String]("y") == null || r.getAs[String]("y").isEmpty)
            Left("y must be non-empty") else Right(r))))
    val rt = new ChannelRuntime(spark, specs,
      Files.createTempDirectory("graft-test-ckpt").toString)
    rt.start()
    try {
      val sent = rt.send("hooked", Seq(
        Map("x" -> 2L, "y" -> "a"), Map("x" -> -1L, "y" -> "b"), Map("x" -> 5L, "y" -> "c")))
      assert(sent.map(_.getAs[Long]("x")) === Seq(4L, 10L)) // dropped + doubled
      intercept[IllegalArgumentException] {
        rt.send("hooked", Seq(Map("x" -> 1L, "y" -> "")))
      }
      // replay path (applyHooks = false): rows pass verbatim — no
      // double-transform, no re-drop, no re-validation
      val replayed = rt.send("hooked",
        Seq(Map("x" -> -3L, "y" -> "")), applyHooks = false)
      assert(replayed.map(_.getAs[Long]("x")) === Seq(-3L))
      rt.processAllAvailable()
      assert(rt.tickCount("hooked") === 3L)
    } finally rt.stop()
  }

  test("start(endAfter): bounded run stops itself; next resolves None") {
    val rt = newRuntime()
    import scala.concurrent.duration._
    rt.start(endAfter = Some(2.seconds))
    val f = rt.next("example")
    // the endtime thread stops the runtime; waiters resolve None
    assert(scala.concurrent.Await.result(f, 30.seconds).isEmpty)
    rt.stop() // idempotent
  }

  test("next future resolves on the following tick; None at shutdown") {
    val rt = newRuntime()
    rt.start()
    try {
      val fut = rt.next("example")
      rt.send("example", Seq(Map("x" -> 42L, "y" -> "z")))
      rt.processAllAvailable()
      val row = scala.concurrent.Await.result(fut, 10.seconds)
      assert(row.map(_.getAs[Long]("x")) === Some(42L))
      val dangling = rt.next("example")
      rt.stop()
      assert(scala.concurrent.Await.result(dangling, 10.seconds).isEmpty)
    } finally rt.stop()
  }

  test("basket: last per basket key") {
    val rt = newRuntime()
    rt.start()
    try {
      rt.send("basket", Seq(
        Map("x" -> 1L, "y" -> "k1"), Map("x" -> 2L, "y" -> "k2"), Map("x" -> 9L, "y" -> "k1")))
      rt.processAllAvailable()
      val byKey = rt.lastByBasketKey("basket")
      assert(byKey("k1").getAs[Long]("x") === 9L)
      assert(byKey("k2").getAs[Long]("x") === 2L)
    } finally rt.stop()
  }

  test("concurrent senders: per-channel seq order holds, no ticks lost") {
    val rt = newRuntime()
    rt.start()
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val futures = (0 until 8).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until 50).foreach { i =>
            rt.send("example", Seq(Map("x" -> (t * 1000L + i), "y" -> s"k$t")))
          }
        })
      }
      futures.foreach(_.get())
      pool.shutdown()
      rt.processAllAvailable()
      assert(rt.tickCount("example") === 400L)
      // per-key last must be each thread's final value (seq order intact)
      val st = rt.state("example")
        .map(r => (r.getAs[String]("y"), r.getAs[Long]("x"))).toMap
      (0 until 8).foreach(t => assert(st(s"k$t") === t * 1000L + 49))
    } finally rt.stop()
  }

  test("feedback edge re-injects with one-batch delay (T8)") {
    val rt = newRuntime()
    rt.addFeedback("example", "out") { r =>
      if (r.getAs[Long]("x") < 3) Some(org.apache.spark.sql.Row(
        r.get(0), r.get(1), r.getAs[Long]("x") + 1, r.get(3), 0L))
      else None
    }
    rt.addFeedback("out", "example")(r => Some(r)) // cycle: out -> example
    rt.start()
    try {
      rt.send("example", Seq(Map("x" -> 1L, "y" -> "fb")))
      // loop: 1 -> out(2) -> example(2) -> out(3) -> example(3) -> stop
      var tries = 0
      while (rt.tickCount("example") < 3 && tries < 100) {
        rt.processAllAvailable(); Thread.sleep(20); tries += 1
      }
      assert(rt.last("example").map(_.getAs[Long]("x")) === Some(3L))
    } finally rt.stop()
  }

  test("engine log: encode cycles, demux with SQL, replay into fresh runtime") {
    val rt = newRuntime()
    val log = Files.createTempFile("graft", ".jsonl").toString
    new java.io.File(log).delete()
    val writer = new EngineLog.Writer(log, rt)
    rt.start()
    try {
      rt.send("example", Seq(Map("x" -> 1L, "y" -> "a",
        "timestamp" -> "2020-01-01T00:00:00Z")))
      rt.processAllAvailable(); writer.flushCycle()
      rt.send("example", Seq(Map("x" -> 2L, "y" -> "b",
        "timestamp" -> "2020-01-01T00:01:00Z")))
      rt.processAllAvailable(); writer.flushCycle()
      writer.close()
    } finally rt.stop()

    // T11 demux via typed read
    val demuxed = EngineLog.demux(spark, log, "example",
      StructType(exampleSchema.fields :+ StructField("_seq", LongType)))
    assert(demuxed.collect().map(_.getAs[Long]("x")).sorted.toSeq === Seq(1L, 2L))

    // A8: full SQL over the log
    assert(EngineLog.readLog(spark, log).count() === 2)

    // replay into a fresh runtime with forced new ids (X11)
    val rt2 = newRuntime()
    rt2.start()
    try {
      val n = EngineLog.replay(rt2, log, Seq("example"), forceNewIds = true)
      assert(n === 2)
      rt2.processAllAvailable()
      assert(rt2.tickCount("example") === 2)
      assert(rt2.state("example").map(_.getAs[Long]("x")).toSet === Set(1L, 2L))
    } finally rt2.stop()

    // startTime fast-forward (JSONPullAdapter shape): only cycles at or
    // after the cutoff re-emit
    val cycleTs = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      Files.readAllLines(java.nio.file.Paths.get(log)).get(1) match {
        case line => mapper.readTree(line).get("csp_engine_timestamp").asLong()
      }
    }
    val rt3 = newRuntime()
    rt3.start()
    try {
      val n = EngineLog.replay(rt3, log, Seq("example"), forceNewIds = true,
        startTime = Some(cycleTs))
      assert(n === 1)
      rt3.processAllAvailable()
      assert(rt3.state("example").map(_.getAs[Long]("x")).toSet === Set(2L))
    } finally rt3.stop()
  }

  test("set_state keyby on the FIRST schema field keys rows distinctly") {
    // stateKeyby is user-declared, so the keyed column can sit at
    // schema index 0; each distinct key must still hold its own state
    // row. Kills the h163 `i >= 0` -> `i > 0` key-index mutant (which
    // nulls a position-0 key and collapses every row into one bucket).
    val keyFirst = StructType(Seq(
      StructField("k", StringType),
      StructField("id", StringType),
      StructField("timestamp", TimestampType),
      StructField("x", LongType)))
    val rt = new ChannelRuntime(spark,
      Map("kf" -> ChannelSpec("kf", keyFirst, stateKeyby = Seq("k"))),
      Files.createTempDirectory("graft-test-ckpt").toString)
    rt.start()
    try {
      rt.send("kf", Seq(
        Map("k" -> "a", "x" -> 1L), Map("k" -> "b", "x" -> 2L),
        Map("k" -> "a", "x" -> 3L)))
      rt.processAllAvailable()
      val st = rt.state("kf").map(r => r.getAs[String]("k") -> r.getAs[Long]("x")).toMap
      assert(st === Map("a" -> 3L, "b" -> 2L),
        "distinct position-0 keys must occupy distinct state rows")
    } finally rt.stop()
  }

  test("engine log: cycle timestamp honors a timestamp-FIRST channel schema") {
    // Channel schemas are user-declared, so `timestamp` can be field 0;
    // the cycle stamp must still come from the rows' event time, never
    // fall back to wall clock. Kills the h165 `idx >= 0` -> `idx > 0`
    // tsOf mutant (which drops a position-0 timestamp column).
    val tsFirst = StructType(Seq(
      StructField("timestamp", TimestampType),
      StructField("id", StringType),
      StructField("x", LongType)))
    val rt = new ChannelRuntime(spark,
      Map("tsf" -> ChannelSpec("tsf", tsFirst)),
      Files.createTempDirectory("graft-test-ckpt").toString)
    val log = Files.createTempFile("graft", ".jsonl").toString
    new java.io.File(log).delete()
    val writer = new EngineLog.Writer(log, rt)
    rt.start()
    try {
      rt.send("tsf", Seq(Map("x" -> 1L, "timestamp" -> "2020-06-01T00:00:00Z")))
      rt.processAllAvailable(); writer.flushCycle(); writer.close()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val line = Files.readAllLines(java.nio.file.Paths.get(log)).get(0)
      val want = java.time.Instant.parse("2020-06-01T00:00:00Z").toEpochMilli
      assert(mapper.readTree(line).get("csp_engine_timestamp").asLong === want,
        "engine cycle timestamp must be the rows' event time, not wall clock")
    } finally rt.stop()
  }

  test("replay logs lagging engine cycles but still emits them in file order") {
    // cycles stamped 10, 30, 20: the third is BEHIND engine time 30 —
    // the late-data contract (json_converter.py:126-133) emits it
    // immediately and logs; nothing is dropped or reordered
    val log = Files.createTempFile("graft-lag", ".jsonl")
    Files.write(log, java.util.Arrays.asList(
      """{"csp_engine_timestamp":10,"example":[{"x":1,"y":"a"}]}""",
      """{"csp_engine_timestamp":30,"example":[{"x":2,"y":"b"}]}""",
      """{"csp_engine_timestamp":20,"example":[{"x":3,"y":"c"}]}"""))
    val rt = newRuntime()
    rt.start()
    try {
      val logged = scala.collection.mutable.Buffer.empty[String]
      val n = EngineLog.replay(rt, log.toString, Seq("example"),
        forceNewIds = true, onLaggingCycle = logged += _)
      assert(n === 3)
      rt.processAllAvailable()
      // exactly one lagging cycle, with the reference's line shape
      assert(logged.size === 1)
      assert(logged.head ===
        "Timestamp for a replayed engine cycle is: 20 which is behind engine time: 30")
      // emission followed file order: arrival seq 1,2,3 for x=1,2,3
      val rows = rt.state("example")
      assert(rows.sortBy(_.getAs[Long]("_seq")).map(_.getAs[Long]("x")).toSeq
        === Seq(1L, 2L, 3L))
    } finally rt.stop()

    // opt-out silences the log without changing emission (fresh
    // runtime AFTER the first stopped: channel query names are
    // session-scoped)
    val rt2 = newRuntime()
    rt2.start()
    try {
      val logged2 = scala.collection.mutable.Buffer.empty[String]
      EngineLog.replay(rt2, log.toString, Seq("example"), forceNewIds = true,
        logLaggingEngineCycles = false, onLaggingCycle = logged2 += _)
      assert(logged2.isEmpty)
    } finally rt2.stop()
  }

  test("lookup registry: omitFromLookup opt-out and max-size eviction (base.py:72-78)") {
    val specs = Map(
      "omitted" -> ChannelSpec("omitted", exampleSchema, omitFromLookup = true),
      "bounded" -> ChannelSpec("bounded", exampleSchema, lookupMaxEntries = 2))
    val rt = new ChannelRuntime(spark, specs,
      Files.createTempDirectory("graft-lookup-ckpt").toString)
    rt.start()
    try {
      // opt-out: rows flow (last works) but the registry stays empty
      val r = rt.send("omitted", Seq(Map("x" -> 1L, "y" -> "a"))).head
      rt.processAllAvailable()
      assert(rt.last("omitted").isDefined)
      assert(rt.lookup("omitted", r.getAs[String]("id")).isEmpty)

      // bound: oldest-inserted entries evict beyond lookupMaxEntries
      val ids = Seq("i1", "i2", "i3").map { i =>
        rt.send("bounded", Seq(Map("id" -> i, "x" -> 1L, "y" -> "a")))
        rt.processAllAvailable()
        i
      }
      assert(rt.lookup("bounded", "i1").isEmpty, "eldest entry must be evicted")
      assert(rt.lookup("bounded", "i2").isDefined && rt.lookup("bounded", "i3").isDefined)
      assert(ids.size === 3)
    } finally rt.stop()
  }
}
