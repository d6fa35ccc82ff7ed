package graft

import java.nio.file.Files

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{HotAnnIndex, StreamingState}

/** Distributed streaming state: flatMapGroupsWithState-backed
  * last-by-key and dedup over MemoryStream micro-batches.
  */
class StreamingStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType),
    StructField("seq", LongType)))

  private def row(k: String, v: Long, seq: Long): Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](k, v, seq), schema)

  test("lastByKeyStream: state carries across micro-batches, max seq wins") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val out = StreamingState.lastByKeyStream(stream.toDF(), Seq("k"), "seq")
    val name = s"lbk_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("lbk-ckpt").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      stream.addData(row("a", 1, 1), row("a", 2, 2), row("b", 10, 3))
      q.processAllAvailable()
      // out-of-order late row for a (seq 1.5 < 2): state must keep seq 2
      stream.addData(row("a", 99, 1), row("b", 20, 4))
      q.processAllAvailable()
      val byKey = spark.table(name).collect()
        .groupBy(_.getString(0)).map { case (k, rs) =>
          k -> rs.maxBy(_.getLong(2)).getLong(1)
        }
      assert(byKey === Map("a" -> 2L, "b" -> 20L))
    } finally q.stop()
  }

  test("lastByKeyStream: equal-seq rows in one batch — first delivery wins") {
    // Tie contract: a row with the SAME seq as the current winner never
    // replaces it. The cross-batch rule already keeps `prev` on equal
    // seq (redelivery idempotence under at-least-once sources); the
    // within-batch reduce must agree, keeping the FIRST-delivered row.
    // coalesce(1) pins map-side arrival order so the tie is observable
    // deterministically. Kills the h167 `>=` -> `>` reduce mutant
    // (which would resolve the tie to the LAST-delivered row).
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val out = StreamingState.lastByKeyStream(
      stream.toDF().coalesce(1), Seq("k"), "seq")
    val name = s"lbk_tie_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("lbk-tie").toString)
      .start()
    try {
      stream.addData(row("a", 1, 5), row("a", 2, 5), row("b", 7, 1))
      q.processAllAvailable()
      val last = spark.table(name).collect()
        .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.last.getLong(1) }
      assert(last("a") === 1L, "equal-seq tie must keep the first-delivered row")
      assert(last("b") === 7L)
    } finally q.stop()
  }

  test("lastByKeyStream: equal-seq redelivery in a LATER batch never replaces state") {
    // Cross-batch half of the tie contract (the within-batch half is
    // pinned above): an at-least-once source redelivering the winning
    // seq in a later micro-batch must leave state untouched — `prev`
    // wins on equal seq. Kills the h168 `>=` -> `>` state-compare
    // mutant (under which the redelivered row would overwrite state
    // and re-emit with the new payload).
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val out = StreamingState.lastByKeyStream(stream.toDF(), Seq("k"), "seq")
    val name = s"lbk_redeliver_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("lbk-rd").toString)
      .start()
    try {
      stream.addData(row("a", 1, 5))
      q.processAllAvailable()
      // same key, same seq, different payload — a redelivery, not news
      stream.addData(row("a", 2, 5))
      q.processAllAvailable()
      val vals = spark.table(name).collect()
        .filter(_.getString(0) == "a").map(_.getLong(1)).toSet
      assert(vals === Set(1L),
        s"equal-seq redelivery must not overwrite or re-emit: got $vals")
    } finally q.stop()
  }

  test("multi-key grouping does not collide adjacent key fragments") {
    // ("ab","c") vs ("a","bc") must be distinct groups
    val s2 = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType),
      StructField("seq", LongType)))
    def r2(a: String, b: String, seq: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](a, b, seq), s2)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(s2), sqlCtx)
    val out = StreamingState.dedupStream(stream.toDF(), Seq("a", "b"))
    val name = s"collide_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("col-ckpt").toString)
      .start()
    try {
      stream.addData(r2("ab", "c", 1), r2("a", "bc", 2), r2(null, "null", 3), r2("null", null, 4))
      q.processAllAvailable()
      assert(spark.table(name).count() === 4) // all four are distinct keys
    } finally q.stop()
  }

  test("lastByKeyStream: dotted struct-path and missing keys resolve like the batch path") {
    // ADVICE r3: distributedState channels with dotted or missing
    // stateKeyby must not throw — dotted paths group by the nested
    // field, unknown attrs key everything under NULL (StateOps parity)
    val nested = StructType(Seq(
      StructField("meta", StructType(Seq(StructField("region", StringType)))),
      StructField("v", LongType), StructField("seq", LongType)))
    def nrow(region: String, v: Long, seq: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](Row(region), v, seq), nested)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(nested), sqlCtx)
    val out = StreamingState.lastByKeyStream(stream.toDF(), Seq("meta.region"), "seq")
    val name = s"dotted_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("dot-ckpt").toString)
      .start()
    try {
      stream.addData(nrow("eu", 1, 1), nrow("eu", 2, 2), nrow("us", 3, 3))
      q.processAllAvailable()
      val byRegion = spark.table(name).collect()
        .groupBy(_.getStruct(0).getString(0))
        .map { case (k, rs) => k -> rs.maxBy(_.getLong(2)).getLong(1) }
      assert(byRegion === Map("eu" -> 2L, "us" -> 3L))
    } finally q.stop()

    // a key absent from the schema folds the whole stream into one
    // NULL-keyed group instead of throwing (reference channels.py:704-717)
    val stream2 = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val out2 = StreamingState.lastByKeyStream(stream2.toDF(), Seq("no_such_col"), "seq")
    val name2 = s"misskey_${System.nanoTime()}"
    val q2 = out2.writeStream.format("memory").queryName(name2).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("miss-ckpt").toString)
      .start()
    try {
      stream2.addData(row("a", 1, 1), row("b", 2, 2))
      q2.processAllAvailable()
      val last = spark.table(name2).collect().maxBy(_.getLong(2))
      assert(spark.table(name2).count() >= 1 && last.getLong(1) === 2L)
    } finally q2.stop()
  }

  test("funnelStream: stage state carries across batches; out-of-order stage never advances") {
    val fs = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("ts", TimestampType), StructField("event_id", LongType)))
    def fr(u: Long, t: String, s: String, id: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](u, t, java.sql.Timestamp.valueOf(s), id), fs)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(fs), sqlCtx)
    val out = StreamingState.funnelStream(stream.toDF(), "user_id", "event_type",
      "ts", Seq("signup", "view", "click"), "event_id")
    val name = s"funnel_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("funnel-ckpt").toString)
      .start()
    try {
      // batch 1: u1 signs up + views; u2 has a click BEFORE its view
      // lands (same batch, ts-sorted fold must reject the click)
      stream.addData(
        fr(1L, "signup", "2024-01-01 10:00:00", 1),
        fr(1L, "view", "2024-01-01 11:00:00", 2),
        fr(2L, "signup", "2024-01-01 10:00:00", 3),
        fr(2L, "click", "2024-01-01 10:30:00", 4))
      q.processAllAvailable()
      // batch 2: u1 clicks (advances to 3 — cross-batch state carry);
      // u2 views (stage 2) — its earlier click must NOT retro-advance
      stream.addData(
        fr(1L, "click", "2024-01-01 12:00:00", 5),
        fr(2L, "view", "2024-01-01 11:00:00", 6))
      q.processAllAvailable()
      val last = spark.table(name).collect()
        .groupBy(_.getLong(0)).map { case (u, rs) =>
          u -> rs.map(_.getInt(1)).max
        }
      assert(last === Map(1L -> 3, 2L -> 2))
    } finally q.stop()
  }

  test("event-analytics streams fail fast on a non-BIGINT key column") {
    val bad = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("user_id", StringType), StructField("event_type", StringType),
        StructField("ts", TimestampType), StructField("event_id", LongType))))
    val e = intercept[IllegalArgumentException] {
      StreamingState.funnelStream(bad, "user_id", "event_type", "ts",
        Seq("a", "b"), "event_id")
    }
    assert(e.getMessage.contains("must be BIGINT"))
  }

  test("twapStream: intervals close across batch boundaries") {
    val ws = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("value", DoubleType), StructField("event_id", LongType)))
    def wr(u: Long, s: String, v: Double, id: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](u, java.sql.Timestamp.valueOf(s), v, id), ws)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(ws), sqlCtx)
    val out = StreamingState.twapStream(stream.toDF(), "user_id", "ts", "value", "event_id")
    val name = s"twap_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("twap-ckpt").toString)
      .start()
    try {
      stream.addData(wr(1L, "2024-01-01 00:00:00", 10.0, 1))
      q.processAllAvailable()
      // batch boundary: the 10.0 tick's interval closes when the NEXT
      // batch's tick arrives — 10 held 1s, then 20 held 3s
      stream.addData(
        wr(1L, "2024-01-01 00:00:01", 20.0, 2),
        wr(1L, "2024-01-01 00:00:04", 99.0, 3))
      q.processAllAvailable()
      val last = spark.table(name).collect().maxBy(_.getLong(2))
      assert(last.getLong(1) === 17500L) // (10000*1s + 20000*3s) div 4s
      assert(last.getLong(2) === 2L)       // n_intervals
      assert(last.getLong(3) === 4000000L) // span_us
    } finally q.stop()
  }

  test("twapStream: a zero-length-interval-only key emits NULL, not a crash (advisor r10)") {
    // two ticks at the SAME timestamp close one interval of span 0; the
    // Long division would throw ArithmeticException and kill the whole
    // streaming query — the batch twin's `_mass div span_us` is NULL
    // there, and the stream must mirror it. A later real interval then
    // resumes normal emission for the same key.
    val ws = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("value", DoubleType), StructField("event_id", LongType)))
    def wr(u: Long, s: String, v: Double, id: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](u, java.sql.Timestamp.valueOf(s), v, id), ws)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(ws), sqlCtx)
    val out = StreamingState.twapStream(stream.toDF(), "user_id", "ts", "value", "event_id")
    val name = s"twap_zero_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("twap0-ckpt").toString)
      .start()
    try {
      stream.addData(
        wr(1L, "2024-01-01 00:00:00", 10.0, 1),
        wr(1L, "2024-01-01 00:00:00", 20.0, 2)) // same-ts pair: span 0
      q.processAllAvailable()
      val zero = spark.table(name).collect().maxBy(_.getLong(2))
      assert(zero.isNullAt(1), "span-0 twap must be NULL (batch-twin div semantics)")
      assert(zero.getLong(2) === 1L && zero.getLong(3) === 0L)
      // a real interval closes: 20 held 2s → twap = 20000 over span 2s
      stream.addData(wr(1L, "2024-01-01 00:00:02", 7.0, 3))
      q.processAllAvailable()
      val last = spark.table(name).collect().maxBy(_.getLong(2))
      assert(last.getLong(1) === 20000L && last.getLong(3) === 2000000L)
    } finally q.stop()
  }

  test("checkpoint recovery: twapStream's running sums survive a restart") {
    // kill after one closed interval (10.0 held 1s), restart from the
    // same checkpoint, close a second interval (20.0 held 3s): the
    // resumed TWAP must blend BOTH — a lost store would restart the
    // weighted sums and report plain 20.0
    val ws = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("value", DoubleType), StructField("event_id", LongType)))
    def wr(u: Long, s: String, v: Double, id: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](u, java.sql.Timestamp.valueOf(s), v, id), ws)
    implicit val sqlCtx = spark.sqlContext
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]
    def sinkTo(df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r =>
        buf.add((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    val ckpt = Files.createTempDirectory("recov-twap-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(ws), sqlCtx)
    val out = StreamingState.twapStream(stream.toDF(), "user_id", "ts", "value", "event_id")
    val q1 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    stream.addData(
      wr(1L, "2024-01-01 00:00:00", 10.0, 1),
      wr(1L, "2024-01-01 00:00:01", 20.0, 2))
    q1.processAllAvailable()
    q1.stop() // killed holding (last=20.0@1s, wsum=10, span=1s)

    stream.addData(wr(1L, "2024-01-01 00:00:04", 99.0, 3))
    val q2 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val last = buf.asScala.maxBy(_._3)
      assert(last._2 === 17500L) // blended integer milli mass, not plain 20000
      assert(last._3 === 2L)
      assert(last._4 === 4000000L)
    } finally q2.stop()
  }

  test("rollingAnomalyStream: ring buffer carries across batches, spike flags once") {
    val ws = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("q", LongType), StructField("event_id", LongType)))
    def wr(s: String, q: Long, id: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](1L, java.sql.Timestamp.valueOf(s), q, id), ws)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(ws), sqlCtx)
    val out = StreamingState.rollingAnomalyStream(
      stream.toDF(), "user_id", "ts", "q", "event_id",
      window = 4, kMilli = 3000L, minPrior = 3)
    val name = s"anom_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("anom-ckpt").toString)
      .start()
    try {
      stream.addData(
        wr("2024-01-01 00:00:00", 10L, 1),
        wr("2024-01-01 00:00:01", 10L, 2),
        wr("2024-01-01 00:00:02", 10L, 3))
      q.processAllAvailable()
      // the spike arrives in a LATER batch — judged against the ring
      // carried from batch 1 (zero-variance prior -> flags)
      stream.addData(
        wr("2024-01-01 00:00:03", 100L, 4),
        wr("2024-01-01 00:00:04", 10L, 5))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => r.getLong(1) -> ((r.getLong(2), r.getBoolean(6)))).toMap
      assert(rows(1L) === ((0L, false)) && rows(3L) === ((2L, false)))
      assert(rows(4L) === ((3L, true)))  // spike vs carried {10,10,10}
      // tick 5's prior {10,10,10,100}: inflated sigma, no flag — and
      // every tick emitted exactly once
      assert(rows(5L) === ((4L, false)))
      assert(spark.table(name).count() === 5L)
    } finally q.stop()
  }

  test("noveltyStream: one emission per entity-day, first-day flag carries") {
    val ws = StructType(Seq(
      StructField("ent", StringType), StructField("ts", TimestampType)))
    def wr(e: String, s: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](e, java.sql.Timestamp.valueOf(s)), ws)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(ws), sqlCtx)
    val out = StreamingState.noveltyStream(stream.toDF(), "ent", "ts")
    val name = s"novelty_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("nov-ckpt").toString)
      .start()
    try {
      stream.addData(
        wr("a", "2024-01-01 10:00:00"), wr("a", "2024-01-01 12:00:00"), // same day: one row
        wr("b", "2024-01-01 11:00:00"))
      q.processAllAvailable()
      // day 2 in a LATER batch: a re-emits (not new); c debuts (new)
      stream.addData(
        wr("a", "2024-01-02 09:00:00"), wr("c", "2024-01-02 10:00:00"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(2)).toMap
      val d1 = java.time.LocalDate.parse("2024-01-01").toEpochDay
      assert(rows === Map(
        ("a", d1) -> true, ("b", d1) -> true,
        ("a", d1 + 1) -> false, ("c", d1 + 1) -> true), rows.toString)
    } finally q.stop()
  }

  test("hourProfileStream: counters carry across batches, profile refreshes whole") {
    val ws = StructType(Seq(
      StructField("event_type", StringType), StructField("ts", TimestampType)))
    def wr(t: String, s: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](t, java.sql.Timestamp.valueOf(s)), ws)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(ws), sqlCtx)
    val out = StreamingState.hourProfileStream(stream.toDF(), "event_type", "ts")
    val name = s"hour_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("hour-ckpt").toString)
      .start()
    try {
      stream.addData(wr("a", "2024-01-01 02:10:00"), wr("a", "2024-01-01 02:20:00"))
      q.processAllAvailable()
      // batch 2 touches a NEW hour: the re-emitted profile must
      // include the refreshed hour-2 row (total now 3) — whole-profile
      // refresh, not a delta
      stream.addData(wr("a", "2024-01-01 07:00:00"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3)) ->
          ((r.getLong(2), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))).toMap
      // batch 1 emission: hour 2 alone, total 2, peak, bursty (1000 > 500)
      assert(rows(("a", 2L, 2L)) === ((2L, 1000L, true, true)), rows.toString)
      // final: hour 2 = 2/3 (666 milli, peak, bursty), hour 7 = 1/3
      assert(rows(("a", 2L, 3L)) === ((2L, 666L, true, true)), rows.toString)
      assert(rows(("a", 7L, 3L)) === ((1L, 333L, false, true)), rows.toString)
    } finally q.stop()
  }

  test("cusumStream: drift state carries across batches, final row == batch cusum") {
    val ws = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("q", LongType), StructField("event_id", LongType)))
    def wr(k: Long, s: String, q: Long, id: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](k, java.sql.Timestamp.valueOf(s), q, id), ws)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(ws), sqlCtx)
    // ref=10, slack=2, h=15 on the unscaled grid (the batch spec data)
    val out = StreamingState.cusumStream(
      stream.toDF(), "user_id", "ts", "q", "event_id",
      refQ = 10L, slackQ = 2L, hQ = 15L)
    val name = s"cusum_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("cusum-ckpt").toString)
      .start()
    try {
      stream.addData(
        wr(1L, "2024-01-01 10:00:00", 10L, 1), wr(1L, "2024-01-01 11:00:00", 10L, 2),
        wr(1L, "2024-01-01 12:00:00", 25L, 3))
      q.processAllAvailable()
      // the drift continues in a LATER batch — cu/minCu carried over
      stream.addData(
        wr(1L, "2024-01-01 13:00:00", 25L, 4), wr(1L, "2024-01-01 14:00:00", 25L, 5),
        wr(1L, "2024-01-01 15:00:00", 2L, 6),
        wr(3L, "2024-01-01 10:00:00", 10L, 7))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) null else r.getLong(5)))).toMap
      // batch-1 emission: su so far 0,0,13 — no alarm yet
      assert(rows((1L, 3L)) === ((13L, 0L, 0L, null)), rows.toString)
      // final emission equals the batch cusum row for key 1
      val us13 = java.sql.Timestamp.valueOf("2024-01-01 13:00:00").getTime * 1000
      assert(rows((1L, 6L)) === ((39L, 6L, 3L, us13)), rows.toString)
      // a never-alarming key emits null first_alarm_us
      assert(rows((3L, 1L)) === ((0L, 0L, 0L, null)), rows.toString)
    } finally q.stop()
  }

  test("latenessStream: frontier carries across batches, first arrival never late") {
    val ws = StructType(Seq(
      StructField("event_type", StringType), StructField("ts", TimestampType),
      StructField("arr", LongType)))
    def wr(k: String, s: String, arr: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](k, java.sql.Timestamp.valueOf(s), arr), ws)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(ws), sqlCtx)
    val out = StreamingState.latenessStream(stream.toDF(), "event_type", "ts", "arr")
    val name = s"late_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("late-ckpt").toString)
      .start()
    try {
      // batch 1: frontier moves to 00:10; an in-batch straggler at
      // 00:05 arrives third (arr order) -> 5s late
      stream.addData(
        wr("a", "2024-01-01 00:00:00", 1),
        wr("a", "2024-01-01 00:00:10", 2),
        wr("a", "2024-01-01 00:00:05", 3))
      q.processAllAvailable()
      // batch 2: a CROSS-batch straggler at 00:02 (8s behind the
      // carried frontier) and a frontier advance — plus key b's first
      // arrival, which has no frontier before it and is never late
      stream.addData(
        wr("a", "2024-01-01 00:00:02", 4),
        wr("a", "2024-01-01 00:00:20", 5),
        wr("b", "2024-01-01 00:00:00", 6))
      q.processAllAvailable()
      val fin = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
      assert(fin("a") === (("a", 5L, 2L, 8000000L, 13000000L)), fin.toString)
      assert(fin("b") === (("b", 1L, 0L, 0L, 0L)))
    } finally q.stop()
  }

  test("realizedVarianceStream: lag crosses batches, bucket rollover resets, single-tick bucket silent") {
    val ws = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("q", LongType), StructField("event_id", LongType),
      StructField("bucket_us", LongType)))
    def us(s: String): Long = {
      val t = java.sql.Timestamp.valueOf(s).toInstant
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    }
    def wr(u: Long, s: String, q: Long, id: Long, bk: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](u, java.sql.Timestamp.valueOf(s), q, id, us(bk)), ws)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(ws), sqlCtx)
    val out = StreamingState.realizedVarianceStream(
      stream.toDF(), "user_id", "ts", "q", "event_id", "bucket_us")
    val name = s"rv_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("rv-ckpt").toString)
      .start()
    try {
      // batch 1: day-1 ticks 100 -> 110 (r=10)
      stream.addData(
        wr(1L, "2024-01-01 09:00:00", 100L, 1, "2024-01-01 00:00:00"),
        wr(1L, "2024-01-01 10:00:00", 110L, 2, "2024-01-01 00:00:00"))
      q.processAllAvailable()
      // batch 2: day-1 tick 90 (r=-20, lag carried ACROSS the batch
      // boundary), then day-2 rollover with two ticks (r=5), then a
      // single-tick day-3 bucket that must never emit
      stream.addData(
        wr(1L, "2024-01-01 11:00:00", 90L, 3, "2024-01-01 00:00:00"),
        wr(1L, "2024-01-02 09:00:00", 200L, 4, "2024-01-02 00:00:00"),
        wr(1L, "2024-01-02 10:00:00", 205L, 5, "2024-01-02 00:00:00"),
        wr(1L, "2024-01-03 09:00:00", 7L, 6, "2024-01-03 00:00:00"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val fin = rows.groupBy(_._1).map { case (bk, rs) => bk -> rs.maxBy(_._2) }
      // day 1 final: n=2, net=10-20=-10, rv=100+400=500
      assert(fin(us("2024-01-01 00:00:00")) ===
        ((us("2024-01-01 00:00:00"), 2L, -10L, 500L)))
      // day 2: n=1, net=5, rv=25 (the 90->200 overnight gap is NOT a return)
      assert(fin(us("2024-01-02 00:00:00")) ===
        ((us("2024-01-02 00:00:00"), 1L, 5L, 25L)))
      // day 3 got one tick — no return, no emission
      assert(!fin.contains(us("2024-01-03 00:00:00")), fin.toString)
    } finally q.stop()
  }

  test("checkpoint recovery: runningStatsStream counts survive a restart") {
    // kill after 2 rows (n=2, sum=30), restart, add 1 row: the resumed
    // state must report n=3 / sum=70, not a fresh n=1 / sum=40
    val ss = StructType(Seq(
      StructField("source", StringType), StructField("n_chars", LongType)))
    def sr(s: String, v: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](s, v), ss)
    implicit val sqlCtx = spark.sqlContext
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Long)]
    def sinkTo(df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r =>
        buf.add((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    val ckpt = Files.createTempDirectory("recov-stats-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(ss), sqlCtx)
    val out = StreamingState.runningStatsStream(stream.toDF(), Seq("source"), "n_chars")
    val q1 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    stream.addData(sr("a", 10L), sr("a", 20L))
    q1.processAllAvailable()
    q1.stop()

    stream.addData(sr("a", 40L))
    val q2 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val last = buf.asScala.maxBy(_._2)
      assert(last === (("a", 3L, 3L, 70L)))
    } finally q2.stop()
  }

  test("calibrationStream: final per-cell state equals the batch report across slicings") {
    val ss = StructType(Seq(
      StructField("cell", LongType), StructField("label", BooleanType),
      StructField("qscore", LongType)))
    def cr(c: Long, l: Boolean, q: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](c, l, q), ss)
    implicit val sqlCtx = spark.sqlContext
    // cell 2 includes a NULL score: counted in n, excluded from the
    // sum — the batch report's SQL-sum semantics, not an NPE
    val rows = Seq(cr(0L, true, 100L), cr(0L, false, -40L), cr(1L, true, 7L),
      cr(0L, true, 12L), cr(2L, false, 0L), cr(1L, false, 9L)) :+
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](2L, true, null), ss)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]
    def sinkTo(df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r =>
        buf.add((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    val ckpt = Files.createTempDirectory("calib-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(ss), sqlCtx)
    val out = StreamingState.calibrationStream(
      stream.toDF(), "cell", "label", "qscore")
    val q = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    try {
      // adversarial slicing: 1 + 4 + 2 rows
      stream.addData(rows.head); q.processAllAvailable()
      stream.addData(rows.slice(1, 5): _*); q.processAllAvailable()
      stream.addData(rows.slice(5, 7): _*); q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val fin = buf.asScala.groupBy(_._1).map { case (c, es) => c -> es.maxBy(_._2) }
    assert(fin(0L) === ((0L, 3L, 2L, 72L)))
    assert(fin(1L) === ((1L, 2L, 1L, 16L)))
    assert(fin(2L) === ((2L, 2L, 1L, 0L)))
  }

  test("quotaAdmissionStream: cap enforced across batches, ranks contiguous, id-ordered") {
    val ss = StructType(Seq(
      StructField("source", StringType), StructField("doc_id", LongType)))
    def qr(s: String, id: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](s, id), ss)
    implicit val sqlCtx = spark.sqlContext
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]
    def sinkTo(df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r => buf.add((r.getString(0), r.getLong(1), r.getLong(2))))
    val ckpt = Files.createTempDirectory("quota-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(ss), sqlCtx)
    val out = StreamingState.quotaAdmissionStream(
      stream.toDF(), "source", "doc_id", cap = 3)
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    try {
      // batch 1: a has 2 (both admitted), b has 4 (3 admitted, 1 over);
      // unsorted arrival inside the batch — id order must win
      stream.addData(qr("b", 14L), qr("a", 1L), qr("b", 11L), qr("b", 13L),
        qr("a", 2L), qr("b", 12L))
      q.processAllAvailable()
      // batch 2: a gets its 3rd (admitted) and 4th (rejected); b is full
      stream.addData(qr("a", 3L), qr("a", 4L), qr("b", 15L))
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val got = buf.asScala.toSet
    assert(got === Set(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 11L, 1L), ("b", 12L, 2L), ("b", 13L, 3L)))
  }

  test("checkpoint recovery: calibrationStream cells survive a restart") {
    val ss = StructType(Seq(
      StructField("cell", LongType), StructField("label", BooleanType),
      StructField("qscore", LongType)))
    def cr(c: Long, l: Boolean, q: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](c, l, q), ss)
    implicit val sqlCtx = spark.sqlContext
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]
    def sinkTo(df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r =>
        buf.add((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    val ckpt = Files.createTempDirectory("calib-recov-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(ss), sqlCtx)
    val out = StreamingState.calibrationStream(
      stream.toDF(), "cell", "label", "qscore")
    val q1 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    stream.addData(cr(0L, true, 10L), cr(0L, false, 20L))
    q1.processAllAvailable()
    q1.stop()
    stream.addData(cr(0L, true, 30L))
    val q2 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    try q2.processAllAvailable() finally q2.stop()
    import scala.jdk.CollectionConverters._
    // resumed cell reports n=3/pos=2/sum=60, not a fresh n=1/pos=1/sum=30
    val last = buf.asScala.maxBy(_._2)
    assert(last === ((0L, 3L, 2L, 60L)))
  }

  test("checkpoint recovery: quotaAdmissionStream's admission counter survives a restart") {
    // admit 2 of cap 3, kill, restart, send 2 more: exactly ONE more
    // admission (rank 3) — a reset counter would re-admit both
    val ss = StructType(Seq(
      StructField("source", StringType), StructField("doc_id", LongType)))
    def qr(s: String, id: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](s, id), ss)
    implicit val sqlCtx = spark.sqlContext
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]
    def sinkTo(df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r => buf.add((r.getString(0), r.getLong(1), r.getLong(2))))
    val ckpt = Files.createTempDirectory("quota-recov-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(ss), sqlCtx)
    val out = StreamingState.quotaAdmissionStream(
      stream.toDF(), "source", "doc_id", cap = 3)
    val q1 = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    stream.addData(qr("a", 1L), qr("a", 2L))
    q1.processAllAvailable()
    q1.stop()
    stream.addData(qr("a", 3L), qr("a", 4L))
    val q2 = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    try q2.processAllAvailable() finally q2.stop()
    import scala.jdk.CollectionConverters._
    assert(buf.asScala.toSet === Set(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L)))
  }

  test("retentionStream: a period is emitted once, even across batches") {
    val rs = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def rr(u: Long, s: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](u, java.sql.Timestamp.valueOf(s)), rs)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(rs), sqlCtx)
    val out = StreamingState.retentionStream(stream.toDF(), "user_id", "ts", "week")
    val name = s"ret_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ret-ckpt").toString)
      .start()
    try {
      stream.addData(rr(1L, "2024-01-02 10:00:00"), rr(1L, "2024-01-03 10:00:00"))
      q.processAllAvailable()
      stream.addData(rr(1L, "2024-01-04 10:00:00"), rr(1L, "2024-01-08 10:00:00"))
      q.processAllAvailable()
      val rows = spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1)))
      // week of Jan 1 emitted exactly once despite three events in it
      assert(rows.toSeq.sorted === rows.toSet.toSeq.sorted)
      assert(rows.toSet.size === 2)
    } finally q.stop()
  }

  test("dedupStream: each key emitted exactly once across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val out = StreamingState.dedupStream(stream.toDF(), Seq("k"))
    val name = s"dedup_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("dedup-ckpt").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      stream.addData(row("a", 1, 1), row("a", 2, 2), row("b", 3, 3))
      q.processAllAvailable()
      stream.addData(row("a", 4, 4), row("c", 5, 5))
      q.processAllAvailable()
      val keys = spark.table(name).collect().map(_.getString(0)).sorted.toSeq
      assert(keys === Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("dedupStream: seqCol makes the in-batch winner the min-seq row") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    // key by v (two rows share v=7 in one batch); winner must be min seq
    val out = StreamingState.dedupStream(stream.toDF(), Seq("v"), seqCol = Some("seq"))
    val name = s"dedup_seq_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("dseq-ckpt").toString)
      .start()
    try {
      stream.addData(row("b", 7, 5), row("a", 7, 2), row("c", 9, 3))
      q.processAllAvailable()
      val winners = spark.table(name).collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(winners === Map(7L -> 2L, 9L -> 3L))
    } finally q.stop()
  }

  test("dedupStream: equal-seq rows in one batch — first delivery wins") {
    // Tie half of the min-seq contract (the distinct-seq half is pinned
    // above): equal seq resolves to the FIRST-delivered row, agreeing
    // with the lastByKeyStream tie rule (redelivery idempotence).
    // coalesce(1) pins map-side arrival order. Kills the h169
    // `<=` -> `<` reduce mutant (which keeps the LAST-delivered row).
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val out = StreamingState.dedupStream(
      stream.toDF().coalesce(1), Seq("v"), seqCol = Some("seq"))
    val name = s"dedup_tie_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("dtie-ckpt").toString)
      .start()
    try {
      stream.addData(row("first", 7, 5), row("second", 7, 5))
      q.processAllAvailable()
      val winners = spark.table(name).collect().map(_.getString(0)).toSeq
      assert(winners === Seq("first"),
        "equal-seq dedup winner must be the first-delivered row")
    } finally q.stop()
  }

  test("intervalJoinStream: left column colliding with an '_r' output name fails fast") {
    implicit val sqlCtx = spark.sqlContext
    val collSchema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampType),
      StructField("v", StringType), StructField("v_r", StringType)))
    val rightSchema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampType),
      StructField("v", StringType)))
    val ls = MemoryStream[Row](Encoders.row(collSchema), sqlCtx)
    val rs = MemoryStream[Row](Encoders.row(rightSchema), sqlCtx)
    val e = intercept[IllegalArgumentException] {
      StreamingState.intervalJoinStream(ls.toDF(), rs.toDF(), "k", "ts")
    }
    assert(e.getMessage.contains("v_r"))
  }

  test("intervalJoinStream: right frame holding both x and x_r fails fast") {
    implicit val sqlCtx = spark.sqlContext
    val leftSchema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampType)))
    // x→x_r would land on the existing x_r mid-fold and corrupt it
    val rightSchema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampType),
      StructField("x", StringType), StructField("x_r", StringType)))
    val ls = MemoryStream[Row](Encoders.row(leftSchema), sqlCtx)
    val rs = MemoryStream[Row](Encoders.row(rightSchema), sqlCtx)
    val e = intercept[IllegalArgumentException] {
      StreamingState.intervalJoinStream(ls.toDF(), rs.toDF(), "k", "ts")
    }
    assert(e.getMessage.contains("x_r"))
  }

  test("windowedCounts: watermarked tumbling window aggregates by event time") {
    val evSchema = StructType(Seq(
      StructField("t", TimestampType), StructField("g", StringType),
      StructField("v", DoubleType)))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(evSchema), sqlCtx)
    def ev(t: String, g: String, v: Double): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](java.sql.Timestamp.valueOf(t), g, v), evSchema)
    val out = StreamingState.windowedCounts(stream.toDF(), "t", "1 hour", "10 minutes",
      Seq("g"), "v")
    val name = s"win_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("win-ckpt").toString)
      .start()
    try {
      stream.addData(
        ev("2020-01-01 10:05:00", "x", 1.0), ev("2020-01-01 10:55:00", "x", 2.0),
        ev("2020-01-01 11:05:00", "y", 5.0))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getAs[java.sql.Timestamp]("bucket").toString, r.getAs[String]("g"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
      assert(rows.contains(("2020-01-01 10:00:00.0", "x", 2L, 3.0)))
      assert(rows.contains(("2020-01-01 11:00:00.0", "y", 1L, 5.0)))
    } finally q.stop()

    // hopping variant: 1h window sliding 30min — the 10:55 event lands
    // in both the 10:00 and 10:30 buckets
    val stream2 = MemoryStream[Row](Encoders.row(evSchema), sqlCtx)
    val out2 = StreamingState.windowedCounts(stream2.toDF(), "t", "1 hour", "10 minutes",
      Seq("g"), "v", slide = Some("30 minutes"))
    val name2 = s"win_stream2_${System.nanoTime()}"
    val q2 = out2.writeStream.format("memory").queryName(name2)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("win2-ckpt").toString)
      .start()
    try {
      stream2.addData(ev("2020-01-01 10:55:00", "x", 2.0))
      q2.processAllAvailable()
      val buckets = spark.table(name2).collect()
        .map(_.getAs[java.sql.Timestamp]("bucket").toString).toSet
      assert(buckets === Set("2020-01-01 10:00:00.0", "2020-01-01 10:30:00.0"))
    } finally q2.stop()
  }

  test("minhashLshDedupStream: near-dup pair surfaces when the second doc arrives") {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def doc(id: Long, text: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, text), docSchema)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(docSchema), sqlCtx)
    val out = StreamingState.minhashLshDedupStream(
      stream.toDF(), "doc_id", "text", threshold = 0.5)
    val name = s"lsh_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("lsh-ckpt").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again today"
      stream.addData(doc(1, base), doc(3, "completely unrelated content with other words entirely here"))
      q.processAllAvailable()
      assert(spark.table(name).count() === 0) // nothing to pair yet
      // near-dup of doc 1 arrives in a LATER batch: cross-batch state hit
      stream.addData(doc(2, base + " ok"))
      q.processAllAvailable()
      val pairs = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(pairs.toSeq === Seq((1L, 2L)))
      // exact duplicate id re-sent: ignored (no self-pair)
      stream.addData(doc(2, base + " ok"))
      q.processAllAvailable()
      assert(!spark.table(name).collect().exists(r => r.getLong(0) == r.getLong(1)))
    } finally q.stop()
  }

  test("packChunksStream: per-shard offsets continue across batches") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def doc(id: Long, nTokens: Int): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, (1 to nTokens).map(i => s"t$i").mkString(" ")), schema)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val out = StreamingState.packChunksStream(stream.toDF(), "doc_id", "text",
      ctxTokens = 10, shards = 1)
    val name = s"pack_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("pack-ckpt").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      stream.addData(doc(1L, 6), doc(2L, 7))
      q.processAllAvailable()
      stream.addData(doc(3L, 4)) // continues at offset 13, chunk 1
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("start_tok"), r.getAs[Long]("chunk"))).toMap
      assert(rows(1L) === ((0L, 0L)))
      assert(rows(2L) === ((6L, 0L)))
      assert(rows(3L) === ((13L, 1L))) // cross-batch offset survived
    } finally q.stop()
  }

  test("annQueryStream: streamed queries match batch ivfTopK across batches") {
    val dims = 8
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def vec(id: Long): Row = {
      // deterministic spread: unit-ish vectors pointing along varied axes
      val v = Array.tabulate(dims)(d => (((id * 7 + d * 3) % 11) - 5).toFloat)
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, v.toSeq), schema)
    }
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 40L).map(vec)), schema)
    val cents = Array.tabulate(3)(c =>
      (c.toLong, (0 until dims).map(d => (((c * 5 + d) % 7) - 3).toDouble): Seq[Double]))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val out = StreamingState.annQueryStream(
      stream.toDF(), corpus, "vec_id", "embedding", cents, k = 3, nprobe = 2)
    val name = s"annq_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("annq-ckpt").toString)
      .start()
    try {
      stream.addData(vec(1L), vec(2L))
      q.processAllAvailable()
      stream.addData(vec(3L)) // a later batch must be served identically
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      // batch reference over the same literal quantizer
      val centDf = spark.createDataFrame(
        spark.sparkContext.parallelize(cents.toSeq.map { case (c, ce) =>
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            Array[Any](c, ce.map(_.toFloat)), schema): Row
        }), schema)
      val want = graft.pipeline.Similarity.ivfTopK(
        corpus, corpus.filter(org.apache.spark.sql.functions.col("vec_id") <= 3),
        centDf, "vec_id", "embedding", k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("intervalJoinStream: two live streams pair within the interval, key-matched") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampType),
      StructField("v", StringType)))
    def row(k: Long, ts: String, v: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](k, java.sql.Timestamp.valueOf(ts), v), schema)
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val rs = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val out = StreamingState.intervalJoinStream(
      ls.toDF(), rs.toDF(), "k", "ts", within = "1 hour")
    val name = s"ivj_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ivj-ckpt").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      ls.addData(row(1L, "2020-01-01 10:00:00", "req1"), row(2L, "2020-01-01 10:00:00", "req2"))
      rs.addData(
        row(1L, "2020-01-01 10:30:00", "resp-in-window"),
        row(1L, "2020-01-01 12:00:00", "resp-too-late"),
        row(3L, "2020-01-01 10:30:00", "resp-wrong-key"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"), r.getAs[String]("v_r")))
      assert(rows.toSeq === Seq((1L, "req1", "resp-in-window")))
    } finally q.stop()
  }

  test("crossCorpusDupStream: arrivals matching the static reference are flagged") {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def doc(id: Long, text: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, text), docSchema)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val ref = Seq((100L, base), (101L, "some reference only content nothing like the stream docs at all"))
      .toDF("doc_id", "text")
    val stream = MemoryStream[Row](Encoders.row(docSchema), sqlCtx)
    val out = StreamingState.crossCorpusDupStream(
      stream.toDF(), ref, "doc_id", "text", threshold = 0.5)
    val name = s"xcorp_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("xcorp-ckpt").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      stream.addData(doc(1, base + " ok"), doc(2, "fresh unrelated words that match no reference document here"))
      q.processAllAvailable()
      val hits = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
      assert(hits === Seq((1L, 100L))) // doc 1 dups ref 100; doc 2 clean
      // second batch: still incremental, no state required
      stream.addData(doc(3, base))
      q.processAllAvailable()
      val hits2 = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
      assert(hits2 === Set((1L, 100L), (3L, 100L)))
    } finally q.stop()
  }

  test("embeddingNearDupStream: same-bucket cosine pair emitted cross-batch") {
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def vec(id: Long, xs: Seq[Float]): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, xs), vecSchema)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(vecSchema), sqlCtx)
    val out = StreamingState.embeddingNearDupStream(
      stream.toDF(), "vec_id", "embedding", threshold = 0.9, dims = 4)
    val name = s"vec_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("vec-ckpt").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      val a = Seq(1.0f, 0.1f, 0.0f, 0.2f)
      val ortho = Seq(-0.1f, 1.0f, 0.3f, -0.9f)
      stream.addData(vec(1, a), vec(9, ortho))
      q.processAllAvailable()
      assert(spark.table(name).count() === 0)
      // near-identical vector arrives later: pair with high cosine
      stream.addData(vec(2, a.map(_ * 2.0f)))
      q.processAllAvailable()
      val pairs = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
      assert(pairs.head._3 > 0.99)
    } finally q.stop()
  }

  test("semanticDedupStream: first arrival kept, later near-dup dropped cross-batch") {
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def vec(id: Long, xs: Seq[Float]): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, xs), vecSchema)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(vecSchema), sqlCtx)
    // fixed quantizer: two orthogonal cells
    val cents = Array((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val out = StreamingState.semanticDedupStream(
      stream.toDF(), "vec_id", "embedding", cents, threshold = 0.95)
    val name = s"semdedup_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sem-ckpt").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      stream.addData(vec(1, Seq(1.0f, 0.05f)), vec(10, Seq(0.05f, 1.0f)))
      q.processAllAvailable()
      // both kept (different cells)
      assert(spark.table(name).collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 10L))
      // batch 2: near-dup of 1 dropped, genuinely new direction kept
      stream.addData(vec(2, Seq(2.0f, 0.1f)), vec(11, Seq(0.4f, 0.9f)))
      q.processAllAvailable()
      val kept = spark.table(name).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(kept.keySet === Set(1L, 10L, 11L))
      assert(kept(11L) === 1L) // same cell as 10, below threshold => kept
    } finally q.stop()
  }

  test("checkpoint recovery: lastByKeyStream killed mid-run resumes with its state intact") {
    // the durability claim the reference's engine-replay restart makes
    // (shared/engine_replay.py:107-118): kill after tick 2 of 4,
    // restart from the SAME checkpoint, feed the remaining ticks — the
    // resumed query must behave exactly as the uninterrupted run
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recoverable sink, collecting into a driver-side buffer
    implicit val sqlCtx = spark.sqlContext
    def winners(buf: java.util.Queue[(String, Long, Long)]): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq.groupBy(_._1).map { case (k, rs) =>
        k -> { val r = rs.maxBy(_._3); (r._2, r._3) }
      }
    }
    def sinkTo(buf: java.util.Queue[(String, Long, Long)])(
        df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r => buf.add((r.getString(0), r.getLong(1), r.getLong(2))))
    val ckpt = Files.createTempDirectory("recov-lbk-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    val out = StreamingState.lastByKeyStream(stream.toDF(), Seq("k"), "seq")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]
    val q1 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo(buf) _).start()
    stream.addData(row("a", 1, 1), row("b", 10, 2)) // tick 1
    q1.processAllAvailable()
    stream.addData(row("a", 2, 3)) // tick 2: a's state advances to seq 3
    q1.processAllAvailable()
    q1.stop() // kill mid-run

    // ticks 3 and 4 arrive while the query is down
    stream.addData(row("b", 20, 4))              // tick 3
    stream.addData(row("a", 99, 2))              // tick 4: LATE row for a
    val resumedBuf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]
    val q2 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo(resumedBuf) _)
      .start() // resume, same checkpoint
    try {
      q2.processAllAvailable()
      val resumed = winners(resumedBuf)
      // the late (a, 99, seq 2) row must LOSE to the recovered seq-3
      // state — if the store had not been restored, 99 would win
      assert(resumed("a") === ((2L, 3L)))
      assert(resumed("b") === ((20L, 4L)))

      // and the final per-key winners equal an uninterrupted run's
      val stream2 = MemoryStream[Row](Encoders.row(schema), sqlCtx)
      val out2 = StreamingState.lastByKeyStream(stream2.toDF(), Seq("k"), "seq")
      val allBuf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]
      val q3 = out2.writeStream.outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("recov-lbk3").toString)
        .foreachBatch(sinkTo(allBuf) _).start()
      try {
        stream2.addData(row("a", 1, 1), row("b", 10, 2))
        stream2.addData(row("a", 2, 3))
        stream2.addData(row("b", 20, 4))
        stream2.addData(row("a", 99, 2))
        q3.processAllAvailable()
        assert(resumed === winners(allBuf))
      } finally q3.stop()
    } finally q2.stop()
  }

  test("checkpoint recovery: funnel stage state survives a restart") {
    // kill after the user reached stage 2 at 12:00, restart from the
    // SAME checkpoint, then feed a stage-3 event OLDER than the
    // recovered reach time plus a valid later one: the recovered
    // state's reach TIME must reject the stale click, so stage 3's
    // reach time is the 13:00 event — a lost store would either leave
    // the user at stage 0 (no advance at all) or, with only the stage
    // recovered, accept the 11:00 click
    val fs = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("ts", TimestampType), StructField("event_id", LongType)))
    def fr(u: Long, t: String, s: String, id: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](u, t, java.sql.Timestamp.valueOf(s), id), fs)
    implicit val sqlCtx = spark.sqlContext
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, Long)]
    def sinkTo(df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r => buf.add((r.getLong(0), r.getInt(1), r.getLong(2))))
    val ckpt = Files.createTempDirectory("recov-funnel-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(fs), sqlCtx)
    val out = StreamingState.funnelStream(stream.toDF(), "user_id", "event_type",
      "ts", Seq("signup", "view", "click"), "event_id")
    val q1 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    stream.addData(
      fr(1L, "signup", "2024-01-01 10:00:00", 1),
      fr(1L, "view", "2024-01-01 12:00:00", 2))
    q1.processAllAvailable()
    q1.stop() // kill with (stage 2, reached 12:00) in the store

    stream.addData(
      fr(1L, "click", "2024-01-01 11:00:00", 3),  // stale: before 12:00
      fr(1L, "click", "2024-01-01 13:00:00", 4))  // valid stage 3
    val q2 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo _).start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val stage3 = buf.asScala.filter(r => r._1 == 1L && r._2 == 3)
      assert(stage3.nonEmpty, buf.asScala.toSeq.toString)
      // 13:00 in micros (same wall-clock conversion as the operator) —
      // the stale 11:00 click must not have won
      val expected =
        java.sql.Timestamp.valueOf("2024-01-01 13:00:00").toInstant.toEpochMilli * 1000L
      assert(stage3.map(_._3).toSet === Set(expected), buf.asScala.toSeq.toString)
    } finally q2.stop()
  }

  test("checkpoint recovery: the distinct-count sketch state survives a restart") {
    // the custom (count ++ sketch-bytes) state layout is what restart
    // must round-trip: values seen BEFORE the kill must not recount as
    // new distincts after it
    implicit val sqlCtx = spark.sqlContext
    val s2 = StructType(Seq(
      StructField("g", StringType), StructField("v", LongType)))
    def r2(g: String, v: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](g, v), s2)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]
    def sinkTo(b: java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)])(
        df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r => b.add((r.getString(0), r.getLong(1), r.getLong(2))))
    val ckpt = Files.createTempDirectory("recov-dsk-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(s2), sqlCtx)
    val out = StreamingState.distinctCountStream(stream.toDF(), Seq("g"), "v")
    val q1 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo(buf) _).start()
    stream.addData(r2("a", 1), r2("a", 2), r2("b", 10))
    q1.processAllAvailable()
    q1.stop() // kill mid-run

    // post-restart: repeats of pre-kill values + genuinely new ones
    stream.addData(r2("a", 1), r2("a", 3), r2("b", 10))
    val resumed = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]
    val q2 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo(resumed) _).start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val fin = resumed.asScala.toSeq.groupBy(_._1)
        .map { case (g, rs) => g -> rs.maxBy(_._2) }
      // a: seen 4 values, distinct {1,2,3} = 3 (repeat of 1 NOT recounted)
      assert(fin("a") === (("a", 4L, 3L)))
      // b: repeat only — n grows, distinct stays 1
      assert(fin("b") === (("b", 2L, 1L)))
    } finally q2.stop()
  }

  test("checkpoint recovery: bootstrap replicate sums survive a restart, final == batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val s2 = StructType(Seq(
      StructField("doc_id", LongType), StructField("qm", LongType)))
    def r2(id: Long, qm: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, qm), s2)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long)]
    def sinkTo(b: java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long)])(
        df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r =>
        b.add((r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    val ckpt = Files.createTempDirectory("recov-boot-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(s2), sqlCtx)
    val out = StreamingState.bootstrapStream(
      graft.pipeline.Curation.bootstrapWeightedRows(
        stream.toDF(), "doc_id", "qm", reps = 8))
    val q1 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo(buf) _).start()
    stream.addData((1L to 50L).map(i => r2(i, i * 10)): _*)
    q1.processAllAvailable()
    q1.stop() // kill mid-run

    stream.addData((51L to 100L).map(i => r2(i, i * 10)): _*)
    val q2 = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo(buf) _).start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val fin = buf.asScala.toSeq.groupBy(_._1)
        .map { case (rep, rs) => rep -> { val m = rs.maxBy(_._2); (m._3, m._4) } }
      // the resumed sums must equal the one-shot batch aggregate —
      // pre-kill weights neither lost nor redrawn
      val batch = graft.pipeline.Curation.bootstrapReplicates(
        (1L to 100L).map(i => (i, i * 10)).toDF("doc_id", "qm"),
        "doc_id", "qm", reps = 8)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(fin === batch, s"$fin vs $batch")
    } finally q2.stop()
  }

  test("checkpoint recovery: the fused profile's sketch buffers survive a restart") {
    // st7s stores SEVERAL TypedImperativeAggregate buffers in one
    // state row (null counts + min/max + a distinct sketch per
    // column); a restart must round-trip all of them — a pre-kill
    // value recounted as a new distinct, or a lost min, would show
    implicit val sqlCtx = spark.sqlContext
    val s2 = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    def r2(a: java.lang.Long, b: java.lang.Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](a, b), s2)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Double, Double)]
    def sink(df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r => buf.add(
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
    val ckpt = Files.createTempDirectory("recov-prof-ckpt").toString
    val stream = MemoryStream[Row](Encoders.row(s2), sqlCtx)
    val out = graft.pipeline.Curation.numericProfileSketch(
      stream.toDF(), Seq("a", "b"), sketchK = 1024)
    val q1 = out.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt).foreachBatch(sink _).start()
    stream.addData(r2(1L, 100L), r2(2L, null), r2(3L, 300L))
    q1.processAllAvailable()
    q1.stop()

    buf.clear()
    // repeats of pre-kill values must NOT recount; new extremes must fold
    stream.addData(r2(1L, 100L), r2(5L, -7L), r2(null, 300L))
    val q2 = out.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt).foreachBatch(sink _).start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val fin = buf.asScala.toSeq.groupBy(_._1).map { case (c, rs) => c -> rs.last }
      // a: values 1,2,3,1,5,null → 1 null, distinct {1,2,3,5}=4, min 1, max 5
      assert(fin("a") === (("a", 1L, 4L, 1.0, 5.0)))
      // b: values 100,null,300,100,-7,300 → 1 null, distinct {100,300,-7}=3
      assert(fin("b") === (("b", 1L, 3L, -7.0, 300.0)))
    } finally q2.stop()
  }

  test("checkpoint recovery: an OPEN session window survives a restart") {
    // a session that is still open when the query dies must resume
    // with its start time and counts intact — the emitted (closed)
    // session proves it: n=3 spanning the restart, start pinned by the
    // pre-restart first event. If the session store were lost, the
    // resumed run would emit a 1-event session starting post-restart.
    implicit val sqlCtx = spark.sqlContext
    val sch = StructType(Seq(StructField("u", StringType),
      StructField("ts", TimestampType), StructField("v", LongType)))
    def ev(u: String, ms: Long, v: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](u, new java.sql.Timestamp(ms), v), sch)
    val t0 = 1000000000000L
    val hour = 3600L * 1000
    val day = 24 * hour
    val stream = MemoryStream[Row](Encoders.row(sch), sqlCtx)
    val out = StreamingState.sessionCounts(
      stream.toDF(), "ts", "12 hours", "10 minutes", Seq("u"), "v")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Long)]
    def sink(df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r => buf.add((r.getString(0),
        r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("sum_value")))))
    val ckpt = Files.createTempDirectory("recov-sess-ckpt").toString
    val q1 = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).foreachBatch(sink _).start()
    stream.addData(ev("u1", t0, 1), ev("u1", t0 + hour, 2)) // open session
    q1.processAllAvailable()
    q1.stop() // kill with the session still open

    val q2 = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).foreachBatch(sink _).start()
    try {
      stream.addData(ev("u1", t0 + 2 * hour, 4)) // extends the RECOVERED session
      q2.processAllAvailable()
      stream.addData(ev("zz", t0 + 100 * day, 0)) // watermark push
      q2.processAllAvailable()
      stream.addData(ev("zz", t0 + 200 * day, 0)) // apply it to open state
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val sessions = buf.asScala.toSeq.filter(_._1 == "u1")
      assert(sessions === Seq(("u1", t0, 3L, 7L)))
    } finally q2.stop()
  }

  test("checkpoint recovery: minhashLshDedupStream pairs docs across a restart") {
    // a pair whose first member arrived BEFORE the kill and second
    // member AFTER the restart can only surface if the bucket rosters
    // were recovered from the checkpointed store
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def doc(id: Long, text: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, text), docSchema)
    implicit val sqlCtx = spark.sqlContext
    def sinkTo(buf: java.util.Queue[(Long, Long)])(
        df: org.apache.spark.sql.Dataset[Row], @annotation.unused id: Long): Unit =
      df.collect().foreach(r => buf.add((r.getLong(0), r.getLong(1))))
    import scala.jdk.CollectionConverters._
    val ckpt = Files.createTempDirectory("recov-lsh-ckpt").toString
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val stream = MemoryStream[Row](Encoders.row(docSchema), sqlCtx)
    val out = StreamingState.minhashLshDedupStream(
      stream.toDF(), "doc_id", "text", threshold = 0.5)
    val preBuf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
    val q1 = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo(preBuf) _).start()
    stream.addData(doc(1, base)) // tick 1: future pair member
    q1.processAllAvailable()
    stream.addData(doc(3, "completely unrelated content with other words entirely here")) // tick 2
    q1.processAllAvailable()
    assert(preBuf.isEmpty)
    q1.stop() // kill mid-run

    stream.addData(doc(2, base + " ok"))                       // tick 3
    stream.addData(doc(4, base + " ok indeed"))                // tick 4
    val resumedBuf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
    val q2 = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).foreachBatch(sinkTo(resumedBuf) _).start()
    try {
      q2.processAllAvailable()
      val resumedPairs = resumedBuf.asScala.toSet
      // (1,2): cross-restart pair — proves doc 1's signature survived
      assert(resumedPairs.contains((1L, 2L)))

      // union of pre-kill + post-restart pairs == uninterrupted run
      val stream2 = MemoryStream[Row](Encoders.row(docSchema), sqlCtx)
      val out2 = StreamingState.minhashLshDedupStream(
        stream2.toDF(), "doc_id", "text", threshold = 0.5)
      val allBuf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
      val q3 = out2.writeStream.outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("recov-lsh3").toString)
        .foreachBatch(sinkTo(allBuf) _).start()
      try {
        stream2.addData(doc(1, base))
        stream2.addData(doc(3, "completely unrelated content with other words entirely here"))
        stream2.addData(doc(2, base + " ok"))
        stream2.addData(doc(4, base + " ok indeed"))
        q3.processAllAvailable()
        assert((preBuf.asScala.toSet ++ resumedPairs) === allBuf.asScala.toSet)
      } finally q3.stop()
    } finally q2.stop()
  }

  test("kmeansRefitStream: sharded integer partials accumulate; merged centroids exact") {
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def vec(id: Long, xs: Seq[Float]): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, xs), vecSchema)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(vecSchema), sqlCtx)
    val cents = Array((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val out = StreamingState.kmeansRefitStream(stream.toDF(), "embedding", cents, shards = 2)
    val name = s"kmref_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("kmref-ckpt").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      stream.addData(vec(1, Seq(1.0f, 0.0f)), vec(2, Seq(0.0f, 2.0f)))
      q.processAllAvailable()
      stream.addData(vec(3, Seq(3.0f, 0.0f)), vec(4, Seq(0.0f, 0.5f)))
      q.processAllAvailable()
      val merged = StreamingState.kmeansRefitCentroids(spark.table(name))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
      // cell 0 saw (1,0) and (3,0): sums = (4e6, 0); cell 1 saw (0,2) and
      // (0,0.5): sums = (0, 2.5e6) — integer-exact across batches/shards
      assert(merged(0L) === ((2L, Seq(4000000L, 0L))))
      assert(merged(1L) === ((2L, Seq(0L, 2500000L))))
    } finally q.stop()
  }

  test("hot ANN index: refit stream swaps the quantizer under the serving stream") {
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def vec(id: Long, xs: Seq[Float]): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, xs), vecSchema)
    implicit val sqlCtx = spark.sqlContext

    // corpus: id 3 sits at 60° — cell 1 under the axis-aligned initial
    // quantizer, cell 0 once the refit rotates c0 toward (0.8, 0.6)
    val corpusRows = Seq(
      vec(1, Seq(1.0f, 0.0f)), vec(2, Seq(0.95f, 0.3f)), vec(3, Seq(0.5f, 0.866f)),
      vec(4, Seq(0.0f, 1.0f)), vec(5, Seq(0.1f, 0.995f)), vec(6, Seq(0.3f, 0.95f)))
    val corpus = spark.createDataFrame(
      new java.util.ArrayList[Row](corpusRows.asJava), vecSchema)
    val initCents = Array((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val idx = new HotAnnIndex(corpus, "vec_id", "embedding", initCents)

    def asTuples(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
      df.select(col("qid"), col("cid"), col("rank"), col("cosine")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    def batchRebuild(centDf: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
      asTuples(graft.pipeline.Similarity.ivfTopK(
        corpus, corpus.filter(col("vec_id").isin(1L, 4L)), centDf,
        "vec_id", "embedding", k = 3))

    // serve a query stream through foreachBatch; collect per-batch answers
    val answers = scala.collection.mutable.Map[Long, Set[(Long, Long, Int, Double)]]()
    val qs = MemoryStream[Row](Encoders.row(vecSchema), sqlCtx)
    val q = idx.serve(qs.toDF(), k = 3)((out, bid) => answers(bid) = asTuples(out))
      .option("checkpointLocation", Files.createTempDirectory("hot-ann-ckpt").toString)
      .start()
    try {
      qs.addData(vec(1, Seq(1.0f, 0.0f)), vec(4, Seq(0.0f, 1.0f)))
      q.processAllAvailable()
      val preSwap = answers(0L)
      // pre-swap answers == a batch IVF over the initial quantizer
      val initDf = spark.createDataFrame(
        new java.util.ArrayList[Row](initCents.toSeq.map { case (c, v) =>
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            Array[Any](c, v.map(_.toFloat)), vecSchema): Row
        }.asJava), vecSchema)
      assert(preSwap === batchRebuild(initDf))
      assert(preSwap.collect { case (1L, cid, _, _) => cid } === Set(2L),
        "pre-swap: query 1's cell holds only id 2")

      // refit stream: two micro-batches of partials under the INITIAL
      // quantizer — cell 0 pulled toward (0.8, 0.6), cell 1 held at (0, 1)
      val rs = MemoryStream[Row](Encoders.row(vecSchema), sqlCtx)
      val rout = StreamingState.kmeansRefitStream(rs.toDF(), "embedding", initCents, shards = 2)
      val rname = s"hot_ann_refit_${System.nanoTime()}"
      val rq = rout.writeStream.format("memory").queryName(rname)
        .outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("hot-ann-refit-ckpt").toString)
        .start()
      try {
        rs.addData(vec(101, Seq(0.8f, 0.6f)), vec(102, Seq(0.0f, 1.0f)))
        rq.processAllAvailable()
        rs.addData(vec(103, Seq(0.8f, 0.6f)), vec(104, Seq(0.0f, 1.0f)))
        rq.processAllAvailable()
      } finally rq.stop()
      val partials = spark.table(rname)
      val snap = idx.swapFrom(partials)
      assert(snap.version === 1L)

      // post-swap: same queries, next micro-batch — answered under v1
      qs.addData(vec(1, Seq(1.0f, 0.0f)), vec(4, Seq(0.0f, 1.0f)))
      q.processAllAvailable()
      val postSwap = answers(1L)
      assert(postSwap !== preSwap, "the swap must change the answer set")
      assert(postSwap.collect { case (1L, cid, _, _) => cid } === Set(2L, 3L),
        "post-swap: id 3's cell flipped into query 1's probe cell")
      // post-swap answers == a from-scratch batch rebuild on the merged quantizer
      val mergedDf = StreamingState.kmeansRefitCentroids(partials)
        .select(col("cell").as("vec_id"), col("centroid").as("embedding"))
      assert(postSwap === batchRebuild(mergedDf))
    } finally { q.stop(); idx.release() }
  }

  test("cross-dup alert stream served from a persisted pair index equals inline ref") {
    import org.apache.spark.sql.functions.col
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def doc(id: Long, text: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, text), docSchema)
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val refDocs = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.List.of(
        doc(100L, base), doc(101L, "completely different content here entirely"))),
      docSchema)
    val arrivals = Seq(
      doc(1L, base + " ok"), doc(2L, "nothing like anything else at all"),
      doc(3L, base + " indeed"))

    def runVariant(op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val stream = MemoryStream[Row](Encoders.row(docSchema), sqlCtx)
      val name = s"xdup_idx_${System.nanoTime()}"
      val q = op(stream.toDF()).writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("xdup-ckpt").toString)
        .start()
      try {
        stream.addData(arrivals.take(2)); q.processAllAvailable()
        stream.addData(arrivals.drop(2)); q.processAllAvailable()
        spark.table(name).select(col("id"), col("ref_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q.stop()
    }

    val inline = runVariant(s =>
      StreamingState.crossCorpusDupStream(s, refDocs, "doc_id", "text"))
    val path = Files.createTempDirectory("dedup-pair-idx").toString + "/bands"
    graft.pipeline.Dedup.saveDedupPairIndex(refDocs, "doc_id", "text", path)
    val loaded = spark.read.parquet(path).withColumn("band", col("band").cast("int"))
      .cache()
    loaded.count() // the static-side contract: materialize before the stream
    try {
      val fromIndex = runVariant(s =>
        StreamingState.crossCorpusDupStreamAgainst(s, loaded, "doc_id", "text"))
      assert(inline === fromIndex, "loaded index must serve the same alerts")
      assert(inline.nonEmpty && inline.forall(_._2 === 100L),
        "near-dup arrivals must alert against the base reference doc")
    } finally loaded.unpersist()
  }

  test("hot ANN index: concurrent swaps never produce a torn answer") {
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def vec(id: Long, xs: Seq[Float]): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, xs), vecSchema)
    val corpus = spark.createDataFrame(new java.util.ArrayList[Row](Seq(
      vec(1, Seq(1.0f, 0.0f)), vec(2, Seq(0.95f, 0.3f)), vec(3, Seq(0.5f, 0.866f)),
      vec(4, Seq(0.0f, 1.0f)), vec(5, Seq(0.1f, 0.995f))).asJava), vecSchema)
    val centsA = Array((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val centsB = Array((0L, Seq(0.8, 0.6)), (1L, Seq(0.0, 1.0)))
    val queries = corpus.filter(col("vec_id") === 1L)
    def tuples(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select(col("qid"), col("cid"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val idx = new HotAnnIndex(corpus, "vec_id", "embedding", centsA)
    try {
      // the only two legal answer sets: fully under A, or fully under B
      val underA = tuples(idx.answer(queries, k = 3))
      idx.swapTo(centsB)
      val underB = tuples(idx.answer(queries, k = 3))
      assert(underA !== underB, "the two quantizers must disagree for the test to bite")
      idx.swapTo(centsA)

      // swap A<->B continuously while answering: every observed answer
      // must be EXACTLY one of the two committed states — a mixed
      // (torn) assignment/quantizer readout would produce a third set
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val swapper = new Thread(() => {
        var useB = true
        while (!stop.get()) {
          idx.swapTo(if (useB) centsB else centsA)
          useB = !useB
        }
      }, "hot-ann-swapper")
      swapper.start()
      try {
        (0 until 12).foreach { _ =>
          val seen = tuples(idx.answer(queries, k = 3))
          assert(seen === underA || seen === underB,
            s"torn answer: $seen is neither the A nor the B state")
        }
      } finally { stop.set(true); swapper.join(10000) }
    } finally idx.release()
  }

  test("gate results are partition-count independent (32-partition canary)") {
    // the gate harness pins state partitions to 4 purely for fixed
    // cost; the CONTRACT is that results are identical at any count.
    // One catalog entry re-run at 32 partitions pins that contract.
    val dir = "/root/testdata/sf0.001"
    val fn = graft.SparkEntry.queries("a14s_funnel_stream")
    def run(): Seq[Seq[Any]] =
      fn(spark, dir).collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val at4 = run()
    StreamingQueries.gatePartitionsOverride = Some(32)
    val at32 = try run() finally { StreamingQueries.gatePartitionsOverride = None }
    assert(at32 === at4)
    assert(at4.nonEmpty)
  }
}
