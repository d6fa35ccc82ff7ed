package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, EventAnalytics, Monitoring, Transforms, ViewConfig, Views}

/** Relational / view / transform query catalog: the SQL surface the
  * reference exposes through its embedded engines (Perspective views
  * A1-A9, DuckDB-over-engine-log A8) plus the transform operators
  * X1-X11 and the as-of join — each with a DuckDB oracle.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.load(s, dir, name)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- X2/X3: list wrap + unroll roundtrip (ts[T] ⇄ ts[List[T]])
    "x2_unroll_roundtrip" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"), col("value"))
      val wrapped = Transforms.toList(ev, Seq("event_id", "user_id", "value"))
      Transforms.unrollWithPos(wrapped.select(col("items")), "items", "item", "pos")
        .select(col("item.*"))
    }),

    // ---- X2's EMPTY-basket contract (r13 mutation campaign: no entry
    // exercised Transforms.unroll itself, nor the explode-vs-
    // explode_outer distinction — an empty basket must emit NO row,
    // matching SQL UNNEST). Every 7th user's basket is deliberately
    // empty; an explode_outer drift would add a null row per empty
    // basket and red the rowcount.
    "x2b_unroll_empty" -> ((s, dir) => {
      val baskets = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(
          when(col("user_id") % 7 =!= 0, col("event_id")))).as("items"))
      Transforms.unroll(baskets, "items", "item")
    }),

    // ---- X5: struct → JSON → struct serde roundtrip
    "x5_serde_roundtrip" -> ((s, dir) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      val li = t(s, dir, "lineitem").select(cols.map(col): _*)
      val ser = Transforms.serializeJson(li, cols).select(col("json"))
      Transforms.deserializeJson(ser, "json", li.schema)
    }),

    // ---- X6: psp_flatten — nested struct → dotted columns, list rows
    "x6_psp_flatten" -> ((s, dir) => {
      val nested = t(s, dir, "orders").select(
        col("o_orderkey"),
        struct(col("o_custkey"), col("o_totalprice")).as("meta"),
        array(struct(col("o_orderpriority").as("p"))).as("tags"))
      Transforms.pspFlatten(nested)
        .toDF("o_orderkey", "meta_o_custkey", "meta_o_totalprice", "tags_p")
    }),

    // ---- X8+X9: rename/augment projection + computed multi-field index
    "x8_index_rename" -> ((s, dir) => {
      val ren = Transforms.renameAugment(
        t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_quantity"),
        rename = Map("l_orderkey" -> "order_id", "l_linenumber" -> "line_no"),
        augment = Map("src" -> "graft"))
      Transforms.computedIndex(ren, Seq("order_id", "line_no"), "idx")
    }),

    // ---- X4: apply + null-drop channel processor (threshold chosen
    // inside the data range — a 0-row comparison proves nothing)
    "x4_apply_filter" -> ((s, dir) =>
      Transforms.applyFilter(
        t(s, dir, "events").select(col("event_id"), col("value")),
        "boosted",
        when(col("value") > 250, col("value") * 2))),

    // ---- X1: merge setters — two providers unioned by name, missing
    // columns null-filled (csp.flatten)
    "x1_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Transforms.merge(Seq(
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("value")),
        ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"))))
    }),

    // ---- K7/X14: vendor monitoring payload transforms — the graded
    // substance of the Datadog/OpsGenie/logging publishers: severity
    // mapping across systems and deterministic sorted tag formatting
    // (levels synthesized from event_id; tags joined to a scalar —
    // the comparator cannot sort list columns)
    "k7_vendor_payloads" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val lvl = element_at(typedLit(Monitoring.Levels),
        (pmod(col("event_id"), lit(5)) + 1).cast("int"))
      val tags = map(lit("type"), col("event_type"),
        lit("user"), col("user_id").cast("string"))
      ev.select(col("event_id"), lvl.as("level"),
        Monitoring.datadogAlertType(lvl).as("alert_type"),
        Monitoring.opsgeniePriority(lvl).as("priority"),
        Monitoring.loggingLevel(lvl).as("log_level"),
        concat_ws(",", Monitoring.tagList(tags)).as("tags"))
    }),

    // ---- K7: Symphony chat publisher — one message per row, msg =
    // row JSON, addressed to the configured bot user + room
    "k7b_symphony_messages" -> ((s, dir) =>
      Monitoring.toSymphonyMessages(
        t(s, dir, "events").select(col("event_id"), col("event_type")),
        "graft-bot@corp", "eng-alerts")),

    // ---- K3: SQL-sink projection — fields/rename/augment + nested
    // struct columns stringified to JSON (sql.py:141-176)
    "k3_sql_projection" -> ((s, dir) =>
      graft.sinks.Sinks.sqlSinkProjection(
        t(s, dir, "orders").withColumn("meta",
          struct(col("o_custkey").as("c"), col("o_orderstatus").as("s"))),
        fields = Seq("o_orderkey", "o_totalprice", "meta"),
        rename = Map("o_orderkey" -> "order_id"),
        augment = Map("src" -> "graft"))),

    // ---- X7 + X10: column exclusion + flag updates
    "x7_exclude_flags" -> ((s, dir) =>
      Transforms.flagUpdates(
        Transforms.excludeColumns(t(s, dir, "orders"),
          Seq("o_orderstatus", "o_orderpriority")),
        Map("replayed" -> true))),

    // ---- A1 via JSON view layout (perspective server_views config)
    "a1_json_view" -> ((s, dir) =>
      Views.compile(t(s, dir, "lineitem"), Views.fromJson(
        """{"group_by": ["l_returnflag"],
          |  "aggregates": {"sum_qty": {"col": "l_quantity", "fn": "sum"},
          |                 "n": {"col": "l_quantity", "fn": "count"}},
          |  "filter": [["l_linestatus", "==", "F"]],
          |  "sort": [["l_returnflag", "asc"]]}""".stripMargin))),

    // ---- X5c: semi-structured extraction from a JSON payload column
    "x5_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))),

    // ---- A2: pivot (split_by) through the view compiler
    "a2_pivot" -> ((s, dir) =>
      Views.compile(t(s, dir, "lineitem"), ViewConfig(
        groupBy = Seq("l_returnflag"),
        splitBy = Some(("l_linestatus", Seq("F", "O"))),
        aggregates = Seq(
          "sum_qty" -> ("l_quantity", "sum"),
          "cnt" -> ("l_quantity", "count"))))),

    // ---- A4+A5: view filter + computed expression + aggregate
    "a45_view_filter_expr" -> ((s, dir) =>
      Views.compile(t(s, dir, "lineitem"), ViewConfig(
        filter = Seq(("l_shipdate", ">=", "1997-01-01")),
        expressions = Seq(("revenue", "l_extendedprice * (1 - l_discount)")),
        groupBy = Seq("l_returnflag"),
        aggregates = Seq("sum_rev" -> ("revenue", "sum"), "n" -> ("revenue", "count"))))),

    // ---- A6+A7: index upsert (last per key) + sort + row limit
    "a67_upsert_limit" -> ((s, dir) =>
      Views.compile(t(s, dir, "events"), ViewConfig(
        index = Some((Seq("user_id"), "event_id")),
        sort = Seq(("value", false), ("user_id", true)),
        limit = Some(50)))),

    // ---- A9: tumbling time-bucket aggregation
    "a9_time_bucket" -> ((s, dir) =>
      Views.timeBucket(t(s, dir, "events"), "ts", "1 hour", Seq("event_type"),
        Seq(count(lit(1)).as("n"), sum(col("value")).as("sum_value")))),

    // ---- A8: multi-way join + aggregate (full SQL surface; dim broadcast)
    "j1_join_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ---- A8: six-table profit rollup (TPC-H Q9 shape) — exercises
    // part/supplier/region; all dims broadcast, one agg shuffle
    "j3_profit_rollup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val p = t(s, dir, "part")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("p_type").startsWith("STANDARD"))
        .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ---- as-of join: latest order at-or-before each event
    "j2_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      val od = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max_by(struct(col("o_orderkey"), col("o_totalprice")), col("o_orderkey")).as("_o"))
        .select(col("o_custkey"), col("o_orderdate"), col("_o.o_orderkey"), col("_o.o_totalprice"))
      AsofJoin.asofBackward(ev, od, "user_id", "o_custkey", "ts", "o_orderdate")
    }),

    // ---- A8 extra: grouping sets (cube) over the SQL surface
    "a10_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))),

    // ---- A8 extra: set ops (intersect / except)
    "u1_set_ops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def custsIn(year: Int) = o
        .filter(col("o_orderdate") >= lit(s"$year-01-01") &&
          col("o_orderdate") < lit(s"${year + 1}-01-01"))
        .select(col("o_custkey"))
      val big = o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
      custsIn(1996).intersect(custsIn(1997)).except(big)
    }),

    // ---- multiset set ops: INTERSECT ALL keeps per-customer order
    // multiplicity, EXCEPT ALL subtracts occurrence counts
    "u2_set_ops_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def custsIn(year: Int) = o
        .filter(col("o_orderdate") >= lit(s"$year-01-01") &&
          col("o_orderdate") < lit(s"${year + 1}-01-01"))
        .select(col("o_custkey"))
      val big = o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
      custsIn(1996).intersectAll(custsIn(1997)).exceptAll(big)
    }),

    // ---- exact interpolated median per group: l_quantity is
    // integer-valued, so the midpoint interpolation is bitwise-exact
    // on both engines regardless of formula association
    "a13_median" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          count(lit(1)).as("n"))),

    // ---- ranking window: top-3 orders by totalprice per priority
    "w1_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
    }),

    // ---- null-preserving outer join: customers with zero orders keep
    // their row (count 0, null max) — left join + agg
    "j4_outer_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          max(col("o_totalprice")).as("max_price"))),

    // ---- bucketed range join: every event inside a 2-hour window
    // opened by the same user's sampled anchor events — the bucket
    // expansion turns the BETWEEN predicate into an equi-join (a naive
    // plan is a nested loop); bucket width = 1h ≈ interval/2
    "j5_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val pts = ev.select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("p"))
      val wins = ev.filter(col("event_id") % 97 === 0)
        .select(col("event_id").as("win_id"), col("user_id").as("w_user"),
          unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) + lit(7200000000L)).as("hi"))
      graft.operators.RangeJoin.pointInRange(pts, wins, "p", "lo", "hi",
        bucketWidth = 3600000000L, equiKeys = Seq("user_id" -> "w_user"))
        .select(col("event_id"), col("win_id"))
    }),

    // ---- j5's CLOSED upper bound made observable (r13 mutation wave 2:
    // flipping `p <= hi` half-open survived — no sf0.01 point lands
    // exactly on a window's hi). Every window here ends EXACTLY on the
    // user's next event timestamp, so the boundary point exists by
    // construction in every window and the bound itself decides the
    // row set.
    "j5b_range_boundary" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val pts = ev.select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("p"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wins = ev
        .withColumn("_nx", lead(unix_micros(col("ts")), 1).over(w))
        .filter(col("event_id") % 53 === 0 && col("_nx").isNotNull)
        .select(col("event_id").as("win_id"), col("user_id").as("w_user"),
          unix_micros(col("ts")).as("lo"), col("_nx").as("hi"))
      graft.operators.RangeJoin.pointInRange(pts, wins, "p", "lo", "hi",
        bucketWidth = 3600000000L, equiKeys = Seq("user_id" -> "w_user"))
        .select(col("event_id"), col("win_id"))
    }),

    // ---- j5's DEGENERATE intervals made observable (mutation g011:
    // flipping the valid-interval filter `lo <= hi` to `<` survived —
    // the j5/j5b windows are all strictly positive-width). Every window
    // here is zero-width (hi == lo == the anchor's own timestamp), so
    // it contains exactly the point p == lo; the flipped filter drops
    // every window and the result empties.
    "j5c_range_degenerate" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val pts = ev.select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("p"))
      val wins = ev.filter(col("event_id") % 89 === 0)
        .select(col("event_id").as("win_id"), col("user_id").as("w_user"),
          unix_micros(col("ts")).as("lo"), unix_micros(col("ts")).as("hi"))
      graft.operators.RangeJoin.pointInRange(pts, wins, "p", "lo", "hi",
        bucketWidth = 3600000000L, equiKeys = Seq("user_id" -> "w_user"))
        .select(col("event_id"), col("win_id"))
    }),

    // ---- w10's minPrior gate made observable at the BOUNDARY
    // (mutation g010: `n >= minPrior` flipped to `>` survived — no
    // driver-data tick is anomalous at exactly n_prior == minPrior):
    // each key gets exactly 8 constant ticks then one spike, so the
    // spike tick sits at n_prior == minPrior == 8 with zero prior
    // variance — anomalous under >=, silent under >
    "w10b_anomaly_min_prior" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("event_id"))
      val feed = t(s, dir, "events").filter(col("event_id") <= 450)
        .select((col("event_id") % 50).as("k"), col("event_id"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 9)
        .withColumn("v", when(col("rk") <= 8, lit(5.0)).otherwise(lit(105.0)))
      EventAnalytics.rollingAnomaly(feed, "k", "rk", "v",
        orderCols = Seq("event_id"))
    }),

    // ---- salted skew join: lineitem joined to orders on (key, salt)
    // with the orders side replicated per salt — the manual hot-key
    // spread; same answer as the plain join, by construction
    "j6_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.SkewJoin.saltedJoin(li, ord, "l_orderkey", "o_orderkey",
        saltSource = col("l_orderkey") * lit(31) + col("l_linenumber"), salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
    }),

    // ---- A8: correlated EXISTS / NOT EXISTS — Catalyst decorrelates
    // to semi/anti joins (plan-audited); the ad-hoc SQL surface must
    // take the query as SQL text, so this entry goes through spark.sql
    "u3_exists" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g7_cust")
      t(s, dir, "orders").createOrReplaceTempView("g7_ord")
      s.sql("""SELECT c_custkey, c_name FROM g7_cust c
              |WHERE EXISTS (SELECT 1 FROM g7_ord o
              |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
              |  AND NOT EXISTS (SELECT 1 FROM g7_ord o
              |                  WHERE o.o_custkey = c.c_custkey
              |                    AND o.o_orderpriority = '5-LOW')""".stripMargin)
    }),

    // ---- A8: correlated scalar subquery — orders above their
    // customer's average; decorrelates to an aggregate + join
    "u4_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g7_ord2")
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM g7_ord2 o
              |WHERE o_totalprice > (SELECT avg(i.o_totalprice) FROM g7_ord2 i
              |                      WHERE i.o_custkey = o.o_custkey)""".stripMargin)
    }),

    // ---- A8: LATERAL correlated subquery — each customer's single
    // best order (deterministic: totalprice desc, orderkey asc)
    "u5_lateral" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g7_cust3")
      t(s, dir, "orders").createOrReplaceTempView("g7_ord3")
      s.sql("""SELECT c.c_custkey, b.o_orderkey, b.o_totalprice
              |FROM g7_cust3 c,
              |LATERAL (SELECT o_orderkey, o_totalprice FROM g7_ord3 o
              |         WHERE o.o_custkey = c.c_custkey
              |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) b""".stripMargin)
    }),

    // ---- window-function family sweep: ntile / percent_rank /
    // cume_dist / lag / lead over a unique ordering (orderkey breaks
    // nothing — it IS unique), all on one user-keyed window
    "w5_window_family" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"))
    }),

    // ---- unpivot (wide → long): per-order price components melted to
    // (order, component, amount) rows — the inverse of the A2 pivot
    "a16_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "component", "amount")),

    // ---- multi-touch (linear) attribution: each purchase's value
    // split equally across the user's clicks in the 24 h before it —
    // the BETWEEN predicate rides the bucketed range join (equi-join
    // on (time bucket, user), no nested loop); credit = value/n is an
    // exact rational per purchase
    "j9_linear_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("touch_id"), col("user_id"),
          unix_micros(col("ts")).as("p"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("value"),
          (unix_micros(col("ts")) - lit(24L * 3600 * 1000000)).as("lo"),
          unix_micros(col("ts")).as("hi"))
      val pairs = graft.operators.RangeJoin.pointInRange(
        clicks, purchases, "p", "lo", "hi",
        bucketWidth = 12L * 3600 * 1000000,
        equiKeys = Seq("user_id" -> "p_user"))
        .select(col("touch_id"), col("purchase_id"), col("value"))
      val n = pairs.groupBy(col("purchase_id")).agg(count(lit(1)).as("_n"))
      // credit quantized to integer micro-units BEFORE the integer
      // split — one double product + floor is bit-identical on both
      // engines and integer sums commute, so the gate stays on the
      // catalog's bit-exact discipline (no float-tolerance reliance)
      pairs.join(n, "purchase_id")
        .groupBy(col("touch_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(expr("floor(value * 1e6) div _n")).as("credited_micro"))
    }),

    // ---- last-touch attribution: each purchase credited to the
    // user's latest click at-or-before it — the as-of join reused as a
    // marketing-attribution operator; clicks pre-deduped per (user, ts)
    // so the match is deterministic
    "j7_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val touches = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("t_user"), col("ts").as("t_ts"))
        .agg(max(col("event_id")).as("touch_id"))
      AsofJoin.asofBackward(purchases, touches, "user_id", "t_user", "ts", "t_ts")
    }),

    // ---- ordered conversion funnel: signup → view → click → purchase,
    // each stage strictly after the previous stage's reach time. Every
    // join/agg in the chain keys on user_id (co-partitioned); stage
    // filters push to the scan.
    "a14_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(t(s, dir, "events"), "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"))),

    // ---- A8: generated week spine from the corpus's own min/max
    // joined to the retention cells, so empty cohort×offset cells
    // report 0 (the complete cohort matrix). r15 optimization (§1.2
    // step 1): the spine was a RECURSIVE CTE — Spark 4's UnionLoop
    // materializes ONE DRIVER JOB PER ITERATION, i.e. one job per
    // week of corpus span for a row generator whose output is pure
    // metadata (~3.1 s of the entry's 3.5 s at sf0.1). The identical
    // spine is `sequence(lo, hi, 7 days)`: both endpoints are
    // date_trunc('week')-aligned so hi − lo is a whole number of
    // weeks, the recursion (`WHERE w < hi`, step +7d) and the
    // inclusive sequence() therefore both yield exactly
    // {lo, lo+7d, …, hi}. The DuckDB oracle keeps the recursive form,
    // so the gate re-proves the equivalence on every run.
    // Timezone assumption (advisor r15): sequence-with-interval equals
    // the +7d recursion only when no step crosses a DST transition —
    // guaranteed here because every graft session pins
    // spark.sql.session.timeZone=UTC (GraftSession/Verify/Bench); in a
    // DST zone the last week could fall out of the sequence.
    "u6_recursive_spine" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("g7_ev6")
      EventAnalytics.retentionCohorts(t(s, dir, "events"), "user_id", "ts", "week")
        .createOrReplaceTempView("g7_ret6")
      s.sql("""WITH bounds AS (
              |  SELECT date_trunc('week', min(ts)) AS lo, date_trunc('week', max(ts)) AS hi
              |  FROM g7_ev6),
              |weeks AS (
              |  SELECT explode(sequence(lo, hi, INTERVAL '7' DAY)) AS w FROM bounds)
              |SELECT c.w AS cohort,
              |       CAST((unix_micros(a.w) - unix_micros(c.w)) / 604800000000 AS BIGINT)
              |         AS period_offset,
              |       coalesce(r.n_users, 0) AS n_users
              |FROM weeks c JOIN weeks a ON a.w >= c.w
              |LEFT JOIN g7_ret6 r
              |  ON r.cohort = c.w
              | AND r.period_offset = (unix_micros(a.w) - unix_micros(c.w)) / 604800000000
              |""".stripMargin)
    }),

    // ---- SCD2-style state history: each tick's validity interval per
    // user — valid_from = its ts, valid_to = the next tick's ts (null
    // while current); the reference's state-table history semantics
    "a19_state_history" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"),
          lead(col("ts"), 1).over(w).isNull.as("is_current"))
    }),

    // ---- as-of FORWARD: the user's next order at-or-after each event
    // (the fill-forward complement of j2; the oracle replays it as a
    // correlated LATERAL top-1, so both directions are gate-covered)
    "j8_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      val od = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max_by(struct(col("o_orderkey"), col("o_totalprice")), col("o_orderkey")).as("_o"))
        .select(col("o_custkey"), col("o_orderdate"), col("_o.o_orderkey"), col("_o.o_totalprice"))
      AsofJoin.asofForward(ev, od, "user_id", "o_custkey", "ts", "o_orderdate")
    }),

    // ---- windowed funnel: every hop must convert within 24 h of the
    // previous stage's reach time (conversion-deadline semantics)
    "a14b_funnel_window" -> ((s, dir) =>
      EventAnalytics.funnel(t(s, dir, "events"), "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"),
        withinUs = Some(24L * 3600 * 1000000))),

    // ---- event-type transition matrix: consecutive-event (from, to)
    // counts + exact rational probabilities; |types|² output rows
    "a17_transitions" -> ((s, dir) =>
      EventAnalytics.transitionMatrix(t(s, dir, "events"), "user_id",
        "event_type", "ts", orderCols = Seq("event_id"))),

    // ---- top user journeys: each user's first 5 event types as a
    // path string, counted across users
    "a18_user_paths" -> ((s, dir) =>
      EventAnalytics.topPaths(t(s, dir, "events"), "user_id", "event_type",
        "ts", firstN = 5, orderCols = Seq("event_id"))),

    // ---- OHLC bars: per (user, day) open/high/low/close over the
    // value tick stream — one partial-agg'd exchange; open/close are
    // min_by/max_by on the (unique) event time
    "w6_ohlc_bars" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(
          min_by(col("value"), unix_micros(col("ts"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), unix_micros(col("ts"))).as("close"),
          count(lit(1)).as("n_ticks"))),

    // ---- recency-decayed engagement: events weighted 2^-(age_days)
    // from the corpus max ts — exact power-of-two weights, one
    // metadata max + one keyed aggregate
    "a21_decayed_engagement" -> ((s, dir) =>
      EventAnalytics.decayedEngagement(t(s, dir, "events"), "user_id", "ts", "value")),

    // ---- max drawdown per user over the cumulative value path:
    // running peak minus running sum, worst point per key — the
    // path-risk statistic a final P&L hides; exact long arithmetic
    // on the quantized grid, per-key windows only
    "w7_drawdown" -> ((s, dir) =>
      EventAnalytics.drawdown(t(s, dir, "events"), "user_id", "ts", "value",
        orderCols = Seq("event_id"))),

    // ---- event-time lateness vs arrival order: the distribution a
    // watermark delay should be CHOSEN from (exact integer µs vs the
    // running high-water mark), measured before withWatermark drops
    // the tail
    // the corpus arrives in event-time order, so the gate delays every
    // 7th event's ARRIVAL deterministically — the late tail the audit
    // exists to measure (and both engines replay)
    "a22_lateness_audit" -> ((s, dir) =>
      EventAnalytics.latenessAudit(
        // ×100 + 2050: the delayed arrivals slot BETWEEN undelayed
        // ones (2050 is not a multiple of 100), so arrival order
        // stays a total order — a tie under a ROWS frame would be
        // engine-order-dependent
        t(s, dir, "events").withColumn("arr",
          col("event_id") * 100L + when(pmod(col("event_id"), lit(7)) === 0,
            2050L).otherwise(0L)),
        "event_type", "ts", "arr")),

    // ---- realized variance per (user, day): within-day tick returns
    // r = q_t − q_{t−1}, gated as exact integer masses (n, Σr, Σr²);
    // vol derives at read time, the gate stays integer
    "w9_realized_var" -> ((s, dir) =>
      EventAnalytics.realizedVariance(t(s, dir, "events"), "user_id", "ts",
        "value", orderCols = Seq("event_id"))),

    // ---- rolling z-score anomaly flags: each tick vs the mean/var of
    // the 16 ticks BEFORE it, exact integer cross-multiplication —
    // (n·x−S)²·10⁶ > k²·n·(nQ−S²) — so the spike verdict is
    // engine-portable with no division or float anywhere
    "w10_rolling_anomaly" -> ((s, dir) =>
      EventAnalytics.rollingAnomaly(t(s, dir, "events"), "user_id", "ts",
        "value", orderCols = Seq("event_id"))),

    // ---- lead-lag cross-correlation: does `view` activity lead
    // `purchase` activity, and by how many hours — exact integer dot
    // of the two hourly count series at every lag in [-6, 6]
    "w12_lead_lag" -> ((s, dir) =>
      EventAnalytics.leadLag(t(s, dir, "events"), "event_type", "ts",
        typeA = "view", typeB = "purchase", maxLag = 6)),

    // ---- diurnal periodicity audit: (type, hour-of-day) profile with
    // peak hour + integer burstiness verdict — the organic-vs-bot
    // first read on an event stream
    "a24_hour_profile" -> ((s, dir) =>
      EventAnalytics.hourOfDayProfile(t(s, dir, "events"), "event_type", "ts")),

    // ---- event-type co-occurrence with LIFT over activity sessions:
    // the unordered association the funnel family cannot express —
    // integer cross-multiplied lift verdict, pair join bounded by the
    // type domain per session
    "a23_cooccurrence" -> ((s, dir) =>
      EventAnalytics.cooccurrence(t(s, dir, "events"), "user_id", "ts",
        "event_type")),

    // ---- a23's session-break BOUNDARY made observable (mutation g009:
    // `>= gapUs` flipped to `>` survived the full gate because no event
    // pair in the driver data lands EXACTLY on the 12h boundary):
    // deterministic timestamps put even keys' consecutive events exactly
    // gapUs apart (every event its own session — singleton sessions, no
    // pairs) and odd keys' exactly gapUs−1µs apart (one session per key,
    // all pairs) — the flip merges every even key into one session and
    // the pair counts explode
    "a23b_cooccur_gap_boundary" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("event_id"))
      val stepped = t(s, dir, "events").filter(col("event_id") <= 400)
        .select((col("event_id") % 7).as("k"), col("event_id"), col("event_type"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("ts2", timestamp_micros(lit(1704067200000000L) +
          col("rk") * when(col("k") % 2 === 0, lit(43200000000L))
            .otherwise(lit(43200000000L - 1L))))
      EventAnalytics.cooccurrence(stepped, "k", "ts2", "event_type")
    }),

    // ---- two-sided CUSUM drift detection: the sequential mean-shift
    // detector (fires on SUSTAINED drift no single tick reveals — the
    // complement of w10's per-tick spikes); clamped recursions
    // computed closed-form on running windows, exact long arithmetic.
    // ref=50 ≈ corpus mean, slack=10 (~0.2σ), h=300 picked from the
    // measured alarm ladder (71 of 150 keys alarm — a discriminating
    // split, not all-or-nothing)
    "w11_cusum" -> ((s, dir) =>
      EventAnalytics.cusum(t(s, dir, "events"), "user_id", "ts", "value",
        refValue = 50.0, slack = 10.0, threshold = 300.0,
        orderCols = Seq("event_id"))),

    // ---- α=1/2 EWMA over the last 16 ticks per key, exact integer
    // shift weights (numerator a shifted long sum, denominator
    // 2^16 − 2^(16−m)) — no float recursion, no drift, bit-equal in
    // both engines; per-key windows only
    "w8_ewma" -> ((s, dir) =>
      EventAnalytics.ewma(t(s, dir, "events"), "user_id", "ts", "value",
        orderCols = Seq("event_id"))),

    // ---- per-hop conversion latency: converting users' time from
    // stage k to k+1 — count, mean, exact interpolated median (µs)
    "a20_funnel_hop_times" -> ((s, dir) =>
      EventAnalytics.funnelHopTimes(t(s, dir, "events"), "user_id", "event_type",
        "ts", Seq("signup", "view", "click", "purchase"))),

    // ---- weekly cohort retention: cohort = week of first event,
    // retained at offset p if active in cohort week + p
    "a15_retention" -> ((s, dir) =>
      EventAnalytics.retentionCohorts(t(s, dir, "events"), "user_id", "ts", "week")),

    // ---- time-weighted average value per user (TWAP): each tick
    // weighted by how long it stayed current; event_id breaks ts ties
    "w4_twap" -> ((s, dir) =>
      EventAnalytics.timeWeightedAvg(t(s, dir, "events"), "user_id", "ts", "value",
        orderCols = Seq("event_id"))),

    // ---- event-time RANGE frame: trailing-1h activity per user. The
    // frame is bounded by VALUE (microseconds), not rows, so peers on
    // the same timestamp enter together — deterministic regardless of
    // tie order; count/max (not sum-of-double) keep it exact.
    "w2_moving_window" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("_us"))
        .rangeBetween(-3600000000L, 0L)
      t(s, dir, "events")
        .withColumn("_us", unix_micros(col("ts")))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("max_1h", max(col("value")).over(w))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("n_1h"), col("max_1h"))
    })
  )

  val oracles: Map[String, String] = Map(
    "x2_unroll_roundtrip" ->
      "SELECT event_id, user_id, value FROM events",

    // UNNEST drops empty lists — the explode contract x2b pins
    "x2b_unroll_empty" ->
      "SELECT user_id, event_id AS item FROM events WHERE user_id % 7 <> 0",

    "x5_serde_roundtrip" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",

    "x6_psp_flatten" ->
      """SELECT o_orderkey, o_custkey AS meta_o_custkey, o_totalprice AS meta_o_totalprice,
        |       o_orderpriority AS tags_p
        |FROM orders""".stripMargin,

    "x8_index_rename" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no, l_quantity,
        |       'graft' AS src,
        |       coalesce(CAST(l_orderkey AS VARCHAR), 'None') || '-' ||
        |         coalesce(CAST(l_linenumber AS VARCHAR), 'None') AS idx
        |FROM lineitem""".stripMargin,

    "x4_apply_filter" ->
      """SELECT event_id, value, value * 2 AS boosted
        |FROM events WHERE value > 250""".stripMargin,

    "x1_merge" ->
      """SELECT event_id, user_id, value FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, user_id, NULL AS value FROM events WHERE event_type = 'view'""".stripMargin,

    "k7_vendor_payloads" ->
      """WITH b AS (SELECT event_id, event_type, user_id,
        |  ['DEBUG','INFO','WARNING','ERROR','CRITICAL'][CAST(event_id % 5 AS INT) + 1] AS level
        |  FROM events)
        |SELECT event_id, level,
        |  CASE WHEN level IN ('CRITICAL','ERROR') THEN 'error'
        |       WHEN level = 'WARNING' THEN 'warning'
        |       WHEN level = 'DEBUG' THEN 'success' ELSE 'info' END AS alert_type,
        |  CASE level WHEN 'CRITICAL' THEN 'P1' WHEN 'ERROR' THEN 'P2'
        |       WHEN 'WARNING' THEN 'P3' WHEN 'INFO' THEN 'P4' ELSE 'P5' END AS priority,
        |  CASE level WHEN 'CRITICAL' THEN 50 WHEN 'ERROR' THEN 40
        |       WHEN 'WARNING' THEN 30 WHEN 'INFO' THEN 20 ELSE 10 END AS log_level,
        |  array_to_string(list_sort(['type:' || event_type,
        |                             'user:' || CAST(user_id AS VARCHAR)]), ',') AS tags
        |FROM b""".stripMargin,

    "k7b_symphony_messages" ->
      """SELECT 'graft-bot@corp' AS "user", 'eng-alerts' AS room,
        |  '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}' AS msg
        |FROM events""".stripMargin,

    "k3_sql_projection" ->
      """SELECT o_orderkey AS order_id, o_totalprice,
        |       '{"c":' || o_custkey || ',"s":"' || o_orderstatus || '"}' AS meta,
        |       'graft' AS src
        |FROM orders""".stripMargin,

    "x7_exclude_flags" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, true AS replayed
        |FROM orders""".stripMargin,

    "a1_json_view" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(l_quantity) AS n
        |FROM lineitem WHERE l_linestatus = 'F'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "x5_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |       max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "a2_pivot" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F_sum_qty,
        |  count(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F_cnt,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O_sum_qty,
        |  count(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O_cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a45_view_filter_expr" ->
      """SELECT l_returnflag, sum(revenue) AS sum_rev, count(revenue) AS n
        |FROM (SELECT l_returnflag, l_extendedprice * (1 - l_discount) AS revenue
        |      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY l_returnflag""".stripMargin,

    "a67_upsert_limit" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1
        |ORDER BY value DESC NULLS LAST, user_id ASC NULLS FIRST LIMIT 50""".stripMargin,

    "a9_time_bucket" ->
      """SELECT event_type, count(*) AS n, sum(value) AS sum_value,
        |       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket
        |FROM events GROUP BY event_type, bucket""".stripMargin,

    "j1_join_agg" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "j3_profit_rollup" ->
      """SELECT r_name, EXTRACT(year FROM o_orderdate) AS o_year,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_type LIKE 'STANDARD%'
        |GROUP BY r_name, o_year""".stripMargin,

    "j2_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |od AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
        |              max_by(o_totalprice, o_orderkey) AS o_totalprice
        |       FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, e.ts,
        |       o.o_custkey, o.o_orderdate, o.o_orderkey, o.o_totalprice
        |FROM ev e ASOF LEFT JOIN od o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,

    "a10_cube" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "u1_set_ops" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 400000""".stripMargin,

    "u2_set_ops_all" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 400000""".stripMargin,

    "a13_median" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "w1_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |         o_orderpriority,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM orders) WHERE rank <= 3""".stripMargin,

    "j4_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders, max(o_totalprice) AS max_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,

    // the bucket expansion changes the PLAN, not the pair set — the
    // oracle is the plain BETWEEN join
    "j5_range_join" ->
      """WITH pts AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p
        |             FROM events),
        |wins AS (SELECT event_id AS win_id, user_id AS w_user,
        |                epoch_us(CAST(ts AS TIMESTAMP)) AS lo,
        |                epoch_us(CAST(ts AS TIMESTAMP)) + 7200000000 AS hi
        |         FROM events WHERE event_id % 97 = 0)
        |SELECT event_id, win_id FROM pts JOIN wins
        |ON user_id = w_user AND p >= lo AND p <= hi""".stripMargin,

    // zero-width windows (hi == lo): each contains exactly its
    // anchor's own point — the `lo <= hi` valid-interval filter (not
    // `<`) is load-bearing for every output row
    "j5c_range_degenerate" ->
      """WITH pts AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p
        |             FROM events),
        |wins AS (SELECT event_id AS win_id, user_id AS w_user,
        |                epoch_us(CAST(ts AS TIMESTAMP)) AS lo,
        |                epoch_us(CAST(ts AS TIMESTAMP)) AS hi
        |         FROM events WHERE event_id % 89 = 0)
        |SELECT event_id, win_id FROM pts JOIN wins
        |ON user_id = w_user AND p >= lo AND p <= hi""".stripMargin,

    // w10's pipeline over the constructed boundary feed: the spike
    // tick has n_prior == minPrior == 8 exactly (inclusive gate)
    "w10b_anomaly_min_prior" ->
      """WITH b AS (SELECT event_id % 50 AS k, event_id FROM events
        |           WHERE event_id <= 450),
        |r AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY event_id) AS rk
        |      FROM b),
        |f AS (SELECT k, event_id, rk,
        |             CASE WHEN rk <= 8 THEN 5 ELSE 105 END AS q
        |      FROM r WHERE rk <= 9),
        |w AS (SELECT k, event_id, q,
        |        CAST(count(q) OVER win AS BIGINT) AS n_prior,
        |        CAST(coalesce(sum(q) OVER win, 0) AS BIGINT) AS sum_prior,
        |        CAST(coalesce(sum(q*q) OVER win, 0) AS BIGINT) AS sumsq_prior
        |      FROM f WINDOW win AS (PARTITION BY k ORDER BY rk, event_id
        |        ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING))
        |SELECT k, event_id, n_prior, CAST(q AS BIGINT) AS q, sum_prior,
        |       sumsq_prior,
        |       n_prior >= 8 AND
        |         (n_prior*q - sum_prior)*(n_prior*q - sum_prior)*1000000
        |           > 3000*3000*(n_prior*(n_prior*sumsq_prior - sum_prior*sum_prior))
        |         AS is_anomaly
        |FROM w""".stripMargin,

    // every window's hi IS the user's next event timestamp — the
    // closed upper bound is load-bearing in every output row
    "j5b_range_boundary" ->
      """WITH pts AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p
        |             FROM events),
        |wins0 AS (SELECT event_id AS win_id, user_id AS w_user,
        |                 epoch_us(CAST(ts AS TIMESTAMP)) AS lo,
        |                 lead(epoch_us(CAST(ts AS TIMESTAMP)), 1)
        |                   OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS hi
        |          FROM events),
        |wins AS (SELECT * FROM wins0 WHERE win_id % 53 = 0 AND hi IS NOT NULL)
        |SELECT event_id, win_id FROM pts JOIN wins
        |ON user_id = w_user AND p >= lo AND p <= hi""".stripMargin,

    // salting is plan-only too: the oracle is the unsalted join
    "j6_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "w5_window_family" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       ntile(4) OVER w AS quartile,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       lag(o_orderkey, 1) OVER w AS prev_order,
        |       lead(o_orderkey, 1) OVER w AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,

    "a16_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS component,
        |       l_extendedprice AS amount FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin,

    "u3_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '5-LOW')""".stripMargin,

    "u4_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (SELECT avg(i.o_totalprice) FROM orders i
        |                      WHERE i.o_custkey = o.o_custkey)""".stripMargin,

    "u5_lateral" ->
      """SELECT c.c_custkey, b.o_orderkey, b.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) b""".stripMargin,

    "j9_linear_attribution" ->
      """WITH c AS (SELECT event_id AS touch_id, user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS p
        |           FROM events WHERE event_type = 'click'),
        |pu AS (SELECT event_id AS purchase_id, user_id, value,
        |              epoch_us(CAST(ts AS TIMESTAMP)) - 86400000000 AS lo,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS hi
        |       FROM events WHERE event_type = 'purchase'),
        |pairs AS (SELECT c.touch_id, pu.purchase_id, pu.value
        |          FROM c JOIN pu ON c.user_id = pu.user_id
        |                        AND c.p >= pu.lo AND c.p <= pu.hi),
        |n AS (SELECT purchase_id, count(*) AS n FROM pairs GROUP BY purchase_id)
        |SELECT touch_id, count(*) AS n_purchases,
        |       CAST(sum(CAST(floor(value * 1e6) AS BIGINT) // n) AS BIGINT) AS credited_micro
        |FROM pairs JOIN n USING (purchase_id) GROUP BY touch_id""".stripMargin,

    "j7_attribution" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS t_user, CAST(ts AS TIMESTAMP) AS t_ts,
        |             max(event_id) AS touch_id
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts, p.value, c.t_user, c.t_ts, c.touch_id
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.t_user AND p.ts >= c.t_ts""".stripMargin,

    "a14_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id)
        |SELECT 1 AS stage_idx, 'signup' AS stage, count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'view', count(*) FROM s2
        |UNION ALL SELECT 3, 'click', count(*) FROM s3
        |UNION ALL SELECT 4, 'purchase', count(*) FROM s4""".stripMargin,

    "u6_recursive_spine" ->
      """WITH RECURSIVE bounds AS (
        |  SELECT CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS lo,
        |         CAST(date_trunc('week', max(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS hi
        |  FROM events),
        |weeks(w) AS (
        |  SELECT lo FROM bounds
        |  UNION ALL
        |  SELECT w + INTERVAL 7 DAY FROM weeks, bounds WHERE w < hi),
        |ret AS (
        |  SELECT cohort, period_offset, count(*) AS n_users FROM (
        |    SELECT a.user_id, c.cohort,
        |           CAST((epoch_us(a.active) - epoch_us(c.cohort)) / 604800000000 AS BIGINT)
        |             AS period_offset
        |    FROM (SELECT DISTINCT user_id,
        |                 CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS active
        |          FROM events) a
        |    JOIN (SELECT user_id,
        |                 CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS cohort
        |          FROM events GROUP BY user_id) c USING (user_id))
        |  GROUP BY cohort, period_offset)
        |SELECT c.w AS cohort,
        |       CAST((epoch_us(a.w) - epoch_us(c.w)) / 604800000000 AS BIGINT) AS period_offset,
        |       coalesce(r.n_users, 0) AS n_users
        |FROM weeks c JOIN weeks a ON a.w >= c.w
        |LEFT JOIN ret r
        |  ON r.cohort = c.w
        | AND r.period_offset = (epoch_us(a.w) - epoch_us(c.w)) / 604800000000""".stripMargin,

    "a19_state_history" ->
      """SELECT user_id, event_id, value,
        |       CAST(ts AS TIMESTAMP) AS valid_from,
        |       lead(CAST(ts AS TIMESTAMP), 1) OVER w AS valid_to,
        |       lead(ts, 1) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin,

    "j8_asof_forward" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |od AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
        |              max_by(o_totalprice, o_orderkey) AS o_totalprice
        |       FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, e.ts,
        |       n.o_custkey, n.o_orderdate, n.o_orderkey, n.o_totalprice
        |FROM ev e LEFT JOIN LATERAL (
        |  SELECT * FROM od o
        |  WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
        |  ORDER BY o.o_orderdate ASC LIMIT 1) n ON true""".stripMargin,

    "a14b_funnel_window" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.ts > s1.t
        |         AND e.ts <= s1.t + INTERVAL 24 HOUR GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s2.t
        |         AND e.ts <= s2.t + INTERVAL 24 HOUR GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s3.t
        |         AND e.ts <= s3.t + INTERVAL 24 HOUR GROUP BY e.user_id)
        |SELECT 1 AS stage_idx, 'signup' AS stage, count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'view', count(*) FROM s2
        |UNION ALL SELECT 3, 'click', count(*) FROM s3
        |UNION ALL SELECT 4, 'purchase', count(*) FROM s4""".stripMargin,

    "a17_transitions" ->
      """WITH p AS (SELECT event_type AS to_type,
        |                  lag(event_type) OVER (PARTITION BY user_id
        |                    ORDER BY ts, event_id) AS from_type
        |           FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p
        |      WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       CAST(n AS DOUBLE) /
        |         CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
        |FROM c""".stripMargin,

    "a18_user_paths" ->
      """WITH l AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS evs
        |           FROM events GROUP BY user_id)
        |SELECT array_to_string(evs[1:5], '->') AS path, count(*) AS n_users
        |FROM l GROUP BY path""".stripMargin,

    "w6_ohlc_bars" ->
      """SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |       arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
        |       arg_max(value, ts) AS close, count(*) AS n_ticks
        |FROM events GROUP BY user_id, day""".stripMargin,

    "a22_lateness_audit" ->
      """WITH v AS (SELECT event_type,
        |             event_id * 100 + CASE WHEN event_id % 7 = 0
        |               THEN 2050 ELSE 0 END AS arr,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |h AS (SELECT event_type, us,
        |        max(us) OVER (PARTITION BY event_type ORDER BY arr
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |      FROM v),
        |l AS (SELECT event_type,
        |        CASE WHEN hwm > us THEN hwm - us ELSE 0 END AS late FROM h)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |       CAST(max(late) AS BIGINT) AS max_late_us,
        |       CAST(sum(late) AS BIGINT) AS sum_late_us
        |FROM l GROUP BY 1""".stripMargin,

    "w9_realized_var" ->
      """WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |             date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket,
        |             CAST(trunc(CAST(value AS DOUBLE)*1024) AS BIGINT) AS q
        |           FROM events),
        |r AS (SELECT user_id, bucket,
        |        q - lag(q) OVER (PARTITION BY user_id, bucket
        |                         ORDER BY ts, event_id) AS r
        |      FROM v)
        |SELECT user_id, CAST(bucket AS TIMESTAMP) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_returns,
        |       CAST(sum(r) AS BIGINT) AS net_q,
        |       CAST(sum(r*r) AS BIGINT) AS rv_q
        |FROM r WHERE r IS NOT NULL GROUP BY 1, 2""".stripMargin,

    "w10_rolling_anomaly" ->
      """WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |             CAST(trunc(CAST(value AS DOUBLE)) AS BIGINT) AS q
        |           FROM events),
        |w AS (SELECT user_id, event_id, q,
        |        CAST(count(q) OVER win AS BIGINT) AS n_prior,
        |        CAST(coalesce(sum(q) OVER win, 0) AS BIGINT) AS sum_prior,
        |        CAST(coalesce(sum(q*q) OVER win, 0) AS BIGINT) AS sumsq_prior
        |      FROM v WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, n_prior, q, sum_prior, sumsq_prior,
        |       n_prior >= 8 AND
        |         (n_prior*q - sum_prior)*(n_prior*q - sum_prior)*1000000
        |           > 3000*3000*(n_prior*(n_prior*sumsq_prior - sum_prior*sum_prior))
        |         AS is_anomaly
        |FROM w""".stripMargin,

    // hourly count series per type (floor-div buckets), dot at every
    // lag, best by (dot desc, |lag| asc, lag asc)
    "w12_lead_lag" ->
      """WITH sa AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |              CAST(count(*) AS BIGINT) AS n
        |            FROM events WHERE event_type = 'view' GROUP BY 1),
        |sb AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |lg AS (SELECT CAST(unnest(generate_series(-6, 6)) AS BIGINT) AS lag),
        |d AS (SELECT lg.lag, CAST(coalesce(sum(sa.n * sb.n), 0) AS BIGINT) AS dot
        |      FROM lg LEFT JOIN sa ON TRUE
        |           LEFT JOIN sb ON sb.h = sa.h + lg.lag
        |      GROUP BY 1),
        |b AS (SELECT lag AS bl FROM d
        |      ORDER BY dot DESC, abs(lag) ASC, lag ASC LIMIT 1)
        |SELECT d.lag, d.dot, d.lag = b.bl AS is_best FROM d, b""".stripMargin,

    "a24_hour_profile" ->
      """WITH c AS (SELECT event_type,
        |             CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour,
        |             CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1, 2),
        |t0 AS (SELECT *, CAST(sum(n) OVER w AS BIGINT) AS total,
        |         CAST(max(n) OVER w AS BIGINT) AS mx
        |       FROM c WINDOW w AS (PARTITION BY event_type)),
        |t AS (SELECT *, min(CASE WHEN n = mx THEN hour END)
        |        OVER (PARTITION BY event_type) AS ph
        |      FROM t0)
        |SELECT event_type, hour, n, total,
        |       CAST(n * 1000 // total AS BIGINT) AS share_milli,
        |       hour = ph AS is_peak,
        |       mx * 1000 > 500 * total AS bursty
        |FROM t""".stripMargin,

    // a11's session CTE + per-session distinct types + the pair join
    // and integer lift arithmetic
    "a23_cooccurrence" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |                  event_type FROM events),
        |m AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w >= 43200000000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s0 AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |                                ROWS UNBOUNDED PRECEDING) AS sid FROM m),
        |s AS (SELECT DISTINCT user_id, sid, event_type AS t FROM s0),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_sessions
        |        FROM (SELECT DISTINCT user_id, sid FROM s)),
        |pt AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY t),
        |p AS (SELECT a.t AS type_a, b.t AS type_b,
        |             CAST(count(*) AS BIGINT) AS together
        |      FROM s a JOIN s b ON a.user_id = b.user_id AND a.sid = b.sid
        |                        AND a.t < b.t
        |      GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.together, na.n AS n_a, nb.n AS n_b,
        |       tot.total_sessions,
        |       CAST(CAST(p.together AS HUGEINT) * tot.total_sessions * 1000
        |            // (CAST(na.n AS HUGEINT) * nb.n) AS BIGINT) AS lift_milli,
        |       CAST(p.together AS HUGEINT) * tot.total_sessions
        |         > CAST(na.n AS HUGEINT) * nb.n AS positive
        |FROM p JOIN pt na ON p.type_a = na.t
        |       JOIN pt nb ON p.type_b = nb.t, tot""".stripMargin,

    // a23's pipeline over the CONSTRUCTED boundary feed (µs positions
    // computed arithmetically — identical to unix_micros of the Spark
    // frame's timestamp_micros by construction); the session break
    // keeps a23's inclusive `>= gapUs` contract
    "a23b_cooccur_gap_boundary" ->
      """WITH b AS (SELECT event_id % 7 AS k, event_id, event_type
        |           FROM events WHERE event_id <= 400),
        |r AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY event_id) AS rk
        |      FROM b),
        |e AS (SELECT k, event_type,
        |             1704067200000000 + CAST(rk AS BIGINT) *
        |               (CASE WHEN k % 2 = 0 THEN 43200000000 ELSE 43199999999 END) AS us
        |      FROM r),
        |m AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w >= 43200000000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY k ORDER BY us)),
        |s0 AS (SELECT *, sum(brk) OVER (PARTITION BY k ORDER BY us
        |                                ROWS UNBOUNDED PRECEDING) AS sid FROM m),
        |s AS (SELECT DISTINCT k, sid, event_type AS t FROM s0),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_sessions
        |        FROM (SELECT DISTINCT k, sid FROM s)),
        |pt AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY t),
        |p AS (SELECT a.t AS type_a, b.t AS type_b,
        |             CAST(count(*) AS BIGINT) AS together
        |      FROM s a JOIN s b ON a.k = b.k AND a.sid = b.sid AND a.t < b.t
        |      GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.together, na.n AS n_a, nb.n AS n_b,
        |       tot.total_sessions,
        |       CAST(CAST(p.together AS HUGEINT) * tot.total_sessions * 1000
        |            // (CAST(na.n AS HUGEINT) * nb.n) AS BIGINT) AS lift_milli,
        |       CAST(p.together AS HUGEINT) * tot.total_sessions
        |         > CAST(na.n AS HUGEINT) * nb.n AS positive
        |FROM p JOIN pt na ON p.type_a = na.t
        |       JOIN pt nb ON p.type_b = nb.t, tot""".stripMargin,

    // CUSUM replayed closed-form: S = C − min(0, running-min C) per
    // side; refQ+slackQ = (50+10)·1024, hQ = 300·1024
    "w11_cusum" ->
      """WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |             CAST(trunc(CAST(value AS DOUBLE)*1024) AS BIGINT) AS q
        |           FROM events),
        |c AS (SELECT user_id, ts, event_id,
        |        sum(q - 61440) OVER w AS cu,
        |        sum(q - 40960) OVER w AS cd
        |      FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT user_id, ts,
        |        CAST(cu - least(min(cu) OVER w2, 0) AS BIGINT) AS su,
        |        CAST(greatest(max(cd) OVER w2, 0) - cd AS BIGINT) AS sd
        |      FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |       CAST(max(su) AS BIGINT) AS max_up_q,
        |       CAST(max(sd) AS BIGINT) AS max_dn_q,
        |       CAST(sum(CASE WHEN su >= 307200 OR sd >= 307200 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_alarms,
        |       min(CASE WHEN su >= 307200 OR sd >= 307200
        |           THEN epoch_us(ts) END) AS first_alarm_us
        |FROM s GROUP BY 1""".stripMargin,

    "w8_ewma" ->
      """WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |             CAST(trunc(CAST(value AS DOUBLE)*1024) AS BIGINT) AS q
        |           FROM events),
        |w AS (SELECT user_id, event_id,
        |        list(q) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS win
        |      FROM v),
        |f AS (SELECT user_id, event_id, CAST(len(win) AS INT) AS n_win,
        |        CAST(list_dot_product(win,
        |          [(1::BIGINT << (15 - len(win) + i)) for i in generate_series(1, len(win))]
        |        ) AS BIGINT) AS num,
        |        (1::BIGINT << 16) - (1::BIGINT << (16 - len(win))) AS den
        |      FROM w)
        |SELECT user_id, event_id, n_win,
        |       CAST(CASE WHEN num >= 0 THEN num // den
        |            ELSE -((-num) // den) END AS BIGINT) AS ewma_q
        |FROM f""".stripMargin,

    "w7_drawdown" ->
      """WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |             CAST(trunc(CAST(value AS DOUBLE)*1024) AS BIGINT) AS q
        |           FROM events),
        |c AS (SELECT user_id, ts, event_id, q,
        |        sum(q) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM v),
        |d AS (SELECT user_id, q, cum,
        |        max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |      FROM c)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(q) AS BIGINT) AS final_q,
        |       CAST(max(cum) AS BIGINT) AS peak_q,
        |       CAST(max(peak - cum) AS BIGINT) AS max_dd_q
        |FROM d GROUP BY 1""".stripMargin,

    "a21_decayed_engagement" ->
      """WITH m AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS mx FROM events),
        |w AS (SELECT user_id, value,
        |        power(0.5, CAST((mx - epoch_us(CAST(ts AS TIMESTAMP))) // 86400000000 AS BIGINT)) AS w
        |      FROM events CROSS JOIN m)
        |SELECT user_id, sum(w) AS decayed_n, sum(w * value) AS decayed_value,
        |       count(*) AS n_events
        |FROM w GROUP BY user_id""".stripMargin,

    "a20_funnel_hop_times" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id),
        |h1 AS (SELECT epoch_us(CAST(s2.t AS TIMESTAMP)) - epoch_us(CAST(s1.t AS TIMESTAMP)) AS dt
        |       FROM s1 JOIN s2 USING (user_id)),
        |h2 AS (SELECT epoch_us(CAST(s3.t AS TIMESTAMP)) - epoch_us(CAST(s2.t AS TIMESTAMP)) AS dt
        |       FROM s2 JOIN s3 USING (user_id)),
        |h3 AS (SELECT epoch_us(CAST(s4.t AS TIMESTAMP)) - epoch_us(CAST(s3.t AS TIMESTAMP)) AS dt
        |       FROM s3 JOIN s4 USING (user_id))
        |SELECT 1 AS hop_idx, 'signup->view' AS hop, count(*) AS n_converted,
        |       avg(dt) AS mean_us, quantile_cont(dt, 0.5) AS median_us FROM h1
        |UNION ALL SELECT 2, 'view->click', count(*), avg(dt), quantile_cont(dt, 0.5) FROM h2
        |UNION ALL SELECT 3, 'click->purchase', count(*), avg(dt), quantile_cont(dt, 0.5) FROM h3""".stripMargin,

    "a15_retention" ->
      """WITH c AS (SELECT user_id,
        |             CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS cohort
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id,
        |             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS active
        |      FROM events)
        |SELECT cohort,
        |       CAST((epoch_us(active) - epoch_us(cohort)) / 604800000000 AS BIGINT)
        |         AS period_offset,
        |       count(*) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY cohort, period_offset""".stripMargin,

    "w4_twap" ->
      """WITH d AS (
        |  SELECT user_id, value,
        |         epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER
        |             (PARTITION BY user_id ORDER BY ts, event_id))
        |           - epoch_us(CAST(ts AS TIMESTAMP)) AS dt
        |  FROM events)
        |SELECT user_id,
        |       CAST(sum(CAST(floor(value * 1000) AS BIGINT) * dt)
        |            // sum(dt) AS BIGINT) AS twap_milli,
        |       count(*) AS n_intervals, CAST(sum(dt) AS BIGINT) AS span_us
        |FROM d WHERE dt IS NOT NULL GROUP BY user_id""".stripMargin,

    "w2_moving_window" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |       count(*) OVER w AS n_1h, max(value) OVER w AS max_1h
        |FROM (SELECT *, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin
  )
}
