package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Monitoring
import graft.streaming.EngineLog

class MonitoringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("X14: level mapping and tag formatting per vendor") {
    val events = Seq(
      ("boom", "it broke", "CRITICAL"), ("fyi", "note", "INFO"), ("dbg", "trace", "DEBUG"))
      .toDF("title", "text", "level")
      .withColumn("tags", map(lit("env"), lit("prod"), lit("app"), lit("graft")))

    val dd = Monitoring.toDatadogEvent(events, "title", "text", "level", "tags").collect()
    // debug -> success per reference util.py:340
    assert(dd.map(_.getAs[String]("alert_type")).toSeq === Seq("error", "info", "success"))
    assert(dd.head.getSeq[String](3) === Seq("app:graft", "env:prod"))

    val og = Monitoring.toOpsgenieAlert(events, "title", "text", "level", "tags").collect()
    assert(og.map(_.getAs[String]("priority")).toSeq === Seq("P1", "P4", "P5"))
  }

  test("K7: symphony messages wrap each row as bot/room-addressed JSON") {
    val ticks = Seq((1L, "fill"), (2L, "cancel")).toDF("order_id", "kind")
    val msgs = Monitoring.toSymphonyMessages(ticks, "My Bot", "My Room").collect()
    assert(msgs.length === 2)
    assert(msgs.forall(r => r.getAs[String]("user") == "My Bot" &&
      r.getAs[String]("room") == "My Room"))
    assert(msgs.head.getAs[String]("msg") === """{"order_id":1,"kind":"fill"}""")
  }

  test("K7: logfire records carry level-thresholded method + structured attrs") {
    // threshold table logfire.py:515-523
    assert(Monitoring.logfireMethod(10) === "debug")
    assert(Monitoring.logfireMethod(20) === "info")
    assert(Monitoring.logfireMethod(30) === "warn")
    assert(Monitoring.logfireMethod(40) === "error")
    assert(Monitoring.logfireMethod(50) === "error")

    val ticks = Seq(("AAPL", 101.5, "2024-01-01T00:00:00Z")).toDF("sym", "px", "ts")
    val plain = Monitoring.toLogfireRecords(ticks, "quotes",
      logLevel = 30, tsCol = Some("ts")).collect().head
    assert(plain.getAs[String]("channel") === "quotes")
    assert(plain.getAs[String]("message") === "Channel tick: quotes")
    assert(plain.getAs[String]("method") === "warn")
    assert(plain.getAs[String]("data").contains("\"px\":101.5"))
    assert(plain.getAs[String]("csp_timestamp") === "2024-01-01T00:00:00Z")

    // dict-basket channels render channel[key] (logfire.py:444-452)
    val keyed = Monitoring.toLogfireRecords(ticks, "quotes",
      basketKeyCol = Some("sym")).collect().head
    assert(keyed.getAs[String]("channel") === "quotes[AAPL]")
    assert(keyed.getAs[String]("message") === "Channel tick: quotes[AAPL]")
    assert(keyed.getAs[String]("method") === "info")

    // include_metadata=false drops the timestamp attribute
    val bare = Monitoring.toLogfireRecords(ticks, "quotes", includeMetadata = false)
    assert(!bare.columns.contains("csp_timestamp"))
  }

  test("K7: monitoring level table is consistent across systems (util.py:314-346)") {
    val df = Monitoring.Levels.toDF("level")
    val r = df.select(
      col("level"),
      Monitoring.datadogAlertType(col("level")).as("dd"),
      Monitoring.opsgeniePriority(col("level")).as("og"),
      Monitoring.loggingLevel(col("level")).as("py")).collect()
      .map(x => (x.getString(0), (x.getString(1), x.getString(2), x.getInt(3)))).toMap
    assert(r("CRITICAL") === (("error", "P1", 50)))
    assert(r("ERROR") === (("error", "P2", 40)))
    assert(r("WARNING") === (("warning", "P3", 30)))
    assert(r("INFO") === (("info", "P4", 20)))
    assert(r("DEBUG") === (("success", "P5", 10)))
  }

  test("X15: stats enrichment adds process fields in place") {
    val enriched = Monitoring.enrichStats(Map("name" -> "stats"))
    assert(enriched("name") === "stats")
    assert(enriched("cpu_count").asInstanceOf[Int] > 0)
    assert(enriched.contains("mem_total_mb") && enriched.contains("now"))
  }

  test("S2: engine-cycle encodings parsed from kafka-shaped values") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType)))
    val raw = Seq(
      """{"csp_engine_timestamp": 100, "ch": [{"x": 1}, {"x": 2}]}""",
      """{"csp_engine_timestamp": 200, "other": [{"x": 9}]}""")
      .toDF("value")
    val rows = EngineLog.engineReplayFromValues(raw, "ch", schema).collect()
    assert(rows.map(_.getAs[Long]("x")).sorted.toSeq === Seq(1L, 2L))
    assert(rows.forall(_.getAs[Long]("csp_engine_timestamp") === 100L))
  }
}
