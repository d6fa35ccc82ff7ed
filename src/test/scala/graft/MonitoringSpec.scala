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
