package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.state.{FilterBy, StateFilter, StateOps, StateQuery}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator from SURVEY.md §2
  * through the graft library API; [[oracleSql]] holds the equivalent
  * DuckDB SQL the driver uses as a correctness oracle at sf0.01.
  */
object SparkEntry {

  /** Read one of the driver-provided tables (TESTDATA.md). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.load(spark, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A filtered state query over the events channel — the reference's
    * analytical read path (SURVEY.md §3.1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val events = table(spark, "/root/testdata/sf0.001", "events")
    StateOps.queryTicks(
      events,
      keys = Seq("user_id"),
      seqCol = "event_id",
      q = StateQuery(Seq(StateFilter("value", FilterBy.Value(500.0), "<="))))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
