package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.state.{FilterBy, StateFilter, StateOps, StateQuery}

/** The operator-coverage query catalog (SURVEY.md §2) with DuckDB
  * oracles. Kept separate from SparkEntry so the catalog can grow
  * per-operator-batch; every query is deterministically ordered so both
  * engines produce byte-identical result sets.
  */
object Queries {

  /** Midnight-UTC cutoff literal, built timezone-EXPLICITLY.
    * `Timestamp.valueOf("yyyy-…")` parses in the JVM default timezone —
    * under a non-UTC driver box the cutoff instant shifts by the zone
    * offset and the >= filters silently drop boundary rows (caught by
    * InvarianceSweep's hostile_env axis in r12: t3b/t9 lost 15/12 rows
    * under -Duser.timezone=America/New_York). The session timeZone conf
    * cannot protect a literal constructed before Spark ever sees it.
    */
  private def utcTs(y: Int, m: Int, d: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(
      java.time.LocalDateTime.of(y, m, d, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC))

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.load(s, dir, name)

  /** lineitem has no arrival-order column; derive a deterministic seq
    * from its unique (l_orderkey, l_linenumber) key, mirrored in SQL. */
  private def liSeq = col("l_orderkey") * 100 + col("l_linenumber")

  lazy val all: Map[String, (SparkSession, String) => DataFrame] =
    base ++ PipelineQueries.all ++ RelationalQueries.all ++ StreamingQueries.all

  lazy val oracles: Map[String, String] =
    baseOracles ++ PipelineQueries.oracles ++ RelationalQueries.oracles ++
      StreamingQueries.oracles

  private val base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- T1: last-tick-per-key state accumulation (channels.py:696-739)
    "t1_state_last_by_key" -> ((s, dir) =>
      StateOps.queryTicks(t(s, dir, "events"), Seq("user_id"), "event_id")),

    // ---- T2: two-key state scan, ASC NULLS FIRST (state.py:284-299)
    "t2_state_scan_two_keys" -> ((s, dir) =>
      StateOps.queryTicks(t(s, dir, "events"), Seq("user_id", "event_type"), "event_id")),

    // ---- T2's ORDERING contract made comparator-visible (r13 mutation
    // campaign: flipping scan()'s ASC NULLS FIRST survived the whole
    // catalog — the driver comparator sorts rows before hashing, and
    // the driver corpus has no null keys, so a pure-order bug was
    // unobservable). Here the order decides WHICH rows exist: a slice
    // of the key is nulled, the scan's head is kept — NULLS FIRST puts
    // every (null, *) group inside the head, NULLS LAST pushes them
    // out, so the surviving ROW SET differs and the hash gate fires.
    "t2b_scan_null_head" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("user_id",
          when(col("event_id") % 97 === 0, lit(null).cast("long"))
            .otherwise(col("user_id")))
      StateOps.query(
        StateOps.lastByKey(ev, Seq("user_id", "event_type"), "event_id"),
        Seq("user_id", "event_type"),
        graft.state.StateQuery(),
        tieBreak = Seq("event_id")
      ).limit(25)
    }),

    // ---- T3: conjunctive value+attr filters over state (state.py:339-376)
    "t3_state_filter_query" -> ((s, dir) =>
      StateOps.queryTicks(
        t(s, dir, "events"),
        Seq("user_id"),
        "event_id",
        StateQuery(Seq(
          StateFilter("value", FilterBy.Value(500.0), "<="),
          StateFilter("event_type", FilterBy.Value("click"), "=="))))),

    // ---- T3b: timestamp (`when`) filter (test_state_query_timestamp)
    // r15 optimization (§2.4): (l_partkey, l_suppkey) is the
    // high-cardinality keyby (417 k groups / 600 k rows at sf0.1 — the
    // partial-agg combiner collapses almost nothing), so the state
    // build takes lastByKeyRanged's one-range-exchange shape and the
    // scan's ORDER BY reuses that exchange. Same aggregate, same total
    // order — oracle-identical (gate re-proves per run).
    "t3_state_when_filter" -> ((s, dir) => {
      val keys = Seq("l_partkey", "l_suppkey")
      StateOps.query(
        StateOps.lastByKeyRanged(
          t(s, dir, "lineitem").withColumn("_seq", liSeq), keys, "_seq"),
        keys,
        StateQuery(Seq(StateFilter(
          "l_shipdate",
          FilterBy.When(utcTs(1997, 1, 1)),
          ">="))))
    }),

    // ---- T5: last — most recent tick of a channel (channels.py:747-787)
    "t5_last" -> ((s, dir) =>
      StateOps.last(t(s, dir, "events"), "event_id")),

    // ---- T7: lookup by id (utils/struct/base.py:26-94)
    "t7_lookup" -> ((s, dir) =>
      StateOps.lookup(t(s, dir, "events"), "event_id", "42")),

    // ---- T9: block-until time gate (channels.py:455-470)
    "t9_time_gate" -> ((s, dir) =>
      StateOps.timeGate(
        t(s, dir, "orders"), "o_orderdate", utcTs(1997, 6, 1))
        .orderBy(col("o_orderkey"))),

    // ---- A1: group-by aggregate (perspective server views)
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )

  private val baseOracles: Map[String, String] = Map(
    "t1_state_last_by_key" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "t2_state_scan_two_keys" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,
    "t2b_scan_null_head" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
        |      FROM (SELECT * REPLACE (CASE WHEN event_id % 97 = 0 THEN NULL ELSE user_id END AS user_id)
        |            FROM events)) t
        |WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST, event_id ASC NULLS FIRST
        |LIMIT 25""".stripMargin,
    "t3_state_filter_query" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1 AND value <= 500.0 AND event_type = 'click'
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "t3_state_when_filter" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate, _seq
        |FROM (SELECT *, l_orderkey * 100 + l_linenumber AS _seq,
        |             row_number() OVER (PARTITION BY l_partkey, l_suppkey
        |                                ORDER BY l_orderkey * 100 + l_linenumber DESC) AS rn
        |      FROM lineitem) WHERE rn = 1 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY l_partkey ASC NULLS FIRST, l_suppkey ASC NULLS FIRST""".stripMargin,
    "t5_last" ->
      "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events ORDER BY event_id DESC LIMIT 1",
    "t7_lookup" ->
      "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events WHERE event_id = 42",
    "t9_time_gate" ->
      """SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 4) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
