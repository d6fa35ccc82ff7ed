package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a ticking channel: ordered funnels,
  * cohort retention and time-weighted averages — the event-log OLAP a
  * gateway user runs over the engine log's `events` channel through
  * the ad-hoc SQL surface (reference A8,
  * csp_gateway/server/demo/demo.py:61-112 exposes exactly this kind of
  * per-user event stream to its query layer).
  *
  * Scale notes (100 TB):
  *  - [[funnel]]/[[funnelHopTimes]] are ONE stage-set-filtered scan +
  *    ONE user-keyed exchange + a codegen'd sorted fold (no per-stage
  *    frontier joins), and the per-user collect_list is bounded by the
  *    [[funnelCandidates]] dominance prefilter — a hot user spamming
  *    one stage keeps ~one candidate per stage alternation, not the
  *    whole history, and the prefilter's window sort spills where a
  *    hash-agg array cannot.
  *  - [[retentionCohorts]] shuffles the corpus ONCE: per-user active
  *    periods are a map-side-partial collect_set (state bounded by
  *    periods per user, e.g. ≤52 weeks/year, never events), the cohort
  *    falls out as the set minimum, and the final rollup runs over
  *    metadata-sized (cohort, offset) rows.
  *  - [[timeWeightedAvg]] is one window sort + one aggregate, both on
  *    the key column — a single exchange end-to-end.
  */
object EventAnalytics {

  /** Calendar-arithmetic operators (hour()/to_date()/date_trunc) are
    * session-timezone-dependent while their streaming twins and the
    * DuckDB oracles use UTC epoch arithmetic — batch==stream and
    * batch==oracle equality silently requires a UTC session, so
    * demand it loudly instead.
    */
  private def requireUtc(s: org.apache.spark.sql.SparkSession, op: String): Unit = {
    val tz = s.conf.get("spark.sql.session.timeZone", "")
    require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
      s"$op requires a UTC session timezone (got '$tz'): calendar " +
        "bucketing drifts from the UTC epoch arithmetic of its " +
        "streaming twin and oracle under any other zone")
  }

  /** Ordered conversion funnel. A user reaches stage k when an event of
    * type `stages(k)` occurs STRICTLY after the time the user reached
    * stage k-1 (stage 0 = the user's earliest `stages(0)` event).
    * Returns one row per stage: (stage_idx, stage, n_users).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String],
      withinUs: Option[Long] = None): DataFrame = {
    val reach = funnelReachTimes(events, userCol, typeCol, tsCol, stages, withinUs)
    // ONE global aggregate (partial-agg'd, 1 row out, emitted even on an
    // empty corpus): stage k's user count = non-null reach-times in slot k,
    // then the single row inlines to one row per stage IN-PLAN — no
    // persist+union fan-out (which evaluated lazily and leaked a cache
    // entry per call in long-running sessions, advisor r10)
    val aggs = stages.indices.map(k =>
      count(element_at(col("_t"), k + 1)).as(s"_c$k"))
    val packed = array(stages.zipWithIndex.map { case (stage, k) =>
      struct(lit(k + 1).as("stage_idx"), lit(stage).as("stage"),
        col(s"_c$k").as("n_users"))
    }: _*)
    reach.agg(aggs.head, aggs.tail: _*).select(inline(packed))
  }

  /** Per-user stage reach-times in ONE pass: (user, _t = array<µs>,
    * slot k = time the user reached stages(k), null = not reached).
    * frontier semantics: t_0 = min ts of a stage-0 event; t_k = min ts
    * of a stage-k event STRICTLY after t_{k-1} (and ≤ t_{k-1} +
    * `withinUs` in the windowed variant).
    *
    * Computed as a sorted-array fold instead of a frontier-join chain:
    * the chain form scans + shuffles the typed events once per stage
    * and joins each frontier to the next (O(S) corpus exchanges, ~10
    * shuffle stages at S=4 — a20's measured 1.26 s outlier); this form
    * is ONE scan (stage filter pushed to parquet) + ONE user-keyed
    * exchange, then a codegen'd per-user fold. The fold fills slots in
    * stage order (acc is prefix-filled, so "first null slot" ⇔
    * acc[k-1] set ∧ acc[k] null), takes the FIRST qualifying event in
    * (ts, type) order — exactly the min, since qualification is
    * monotone once t_{k-1} is fixed — and an out-of-window candidate
    * is skipped, not terminal (a later in-window event still
    * converts). Shuffle volume = in-stage events, the same rows the
    * chain's first frontier join moved.
    */
  /** The fold's candidate events, SKEW-GUARDED: per (user, stage k) an
    * event survives iff it could ever be the fold's slot-k pick —
    * slot 0 needs only the user's FIRST stage-0 event; slot k ≥ 1 only
    * events that are the first stage-k event strictly after SOME
    * stage-(k-1) event. Formally, with Mᵏ(e) = max ts of the user's
    * stage-k events strictly before e (a running conditional max over
    * one user-keyed RANGE window): keep e (stage k) iff k = 0 ∧ M⁰(e)
    * IS NULL, or k ≥ 1 ∧ Mᵏ⁻¹(e) IS NOT NULL ∧ (Mᵏ(e) IS NULL ∨ Mᵏ(e)
    * ≤ Mᵏ⁻¹(e)). This is EXACT (the fold over survivors equals the
    * fold over all events — the chosen slot-k event e* has no same-
    * stage event in (t_{k-1}, e*.ts), so Mᵏ(e*) ≤ t_{k-1} ≤ Mᵏ⁻¹(e*)
    * and e* always survives; survivors ⊆ events keeps every first-
    * qualifying pick identical, window variant included since the
    * first-after event decides conversion either way), and it bounds
    * the per-user collect_list under hot-user skew: a user spamming
    * one stage 10⁸ times keeps ~one event per (stage, preceding-other-
    * stage alternation) instead of all 10⁸ (r10 verdict task 4). The
    * guard shares the fold's single user exchange — the window and the
    * groupBy hash-partition on the same key, so Catalyst plans ONE
    * Exchange; the window's sort is spill-able (ExternalSorter),
    * unlike a hash-agg's in-memory per-key array.
    *
    * Duplicate stage NAMES (e.g. view → click → view) map one event to
    * EVERY matching slot index: the nested-when form resolved only the
    * last index, silently starving earlier slots (advisor r10). The
    * explode is only planned when duplicates exist.
    */
  private[graft] def funnelCandidates(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    val base = events
      .filter(col(typeCol).isin(stages.distinct: _*))
      .select(col(userCol), unix_micros(col(tsCol)).as("_ts"),
        col(typeCol).as("_tyname"))
    val typed =
      if (stages.distinct.size == stages.size) {
        val tyIdx = stages.zipWithIndex.foldLeft(lit(-1)) { case (acc, (st, k)) =>
          when(col("_tyname") === st, lit(k)).otherwise(acc)
        }
        base.select(col(userCol), col("_ts"), tyIdx.as("_ty"))
      } else {
        val idxs = array(stages.zipWithIndex.map { case (st, k) =>
          when(col("_tyname") === st, lit(k))
        }: _*)
        base.select(col(userCol), col("_ts"),
          explode(filter(idxs, _.isNotNull)).as("_ty"))
      }
    // strictly-before conditional running maxes: RANGE (not ROWS) frame
    // so same-ts events are excluded — the fold's qualification is
    // `ts > t_{k-1}` STRICT, and a ROWS frame would make the guard
    // depend on intra-timestamp row order
    val w = Window.partitionBy(col(userCol)).orderBy(col("_ts"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val prevMax = stages.indices.map(k =>
      max(when(col("_ty") === k, col("_ts"))).over(w).as(s"_m$k"))
    val keep = stages.indices.map { k =>
      if (k == 0) col("_ty") === 0 && col("_m0").isNull
      else col("_ty") === k && col(s"_m${k - 1}").isNotNull &&
        (col(s"_m$k").isNull || col(s"_m$k") <= col(s"_m${k - 1}"))
    }.reduce(_ || _)
    typed
      .select(col(userCol) +: col("_ts") +: col("_ty") +: prevMax: _*)
      .filter(keep)
      .select(col(userCol), col("_ts"), col("_ty"))
  }

  private[graft] def funnelReachTimes(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String],
      withinUs: Option[Long]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val win = withinUs
      .map(w => s"\n       AND (i = 0 OR e.ts <= get(acc, i - 1) + ${w}L)")
      .getOrElse("")
    // get() (0-based, null out-of-range) not element_at(): i = 0 must
    // not evaluate an index-0 access even transiently under ANSI mode
    val fold =
      s"""aggregate(_es,
         |  array_repeat(CAST(NULL AS BIGINT), ${stages.size}),
         |  (acc, e) -> transform(acc, (t, i) ->
         |    CASE WHEN t IS NOT NULL THEN t
         |     WHEN (i = 0 OR get(acc, i - 1) IS NOT NULL)
         |       AND e.ty = i
         |       AND (i = 0 OR e.ts > get(acc, i - 1))$win
         |     THEN e.ts ELSE CAST(NULL AS BIGINT) END))""".stripMargin
    // the type string is mapped to its stage INDEX before the exchange
    // (in funnelCandidates): integer shuffle payload + integer fold
    // comparisons. Same-ts tie order between different stages cannot
    // affect the result (the strictly-after rule decides independently
    // of intra-ts order), so sorting by index where the chain sorted
    // by name is semantics-free.
    funnelCandidates(events, userCol, typeCol, tsCol, stages)
      .select(col(userCol),
        struct(col("_ts").as("ts"), col("_ty").as("ty")).as("_e"))
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(col("_e"))).as("_es"))
      .select(col(userCol), expr(fold).as("_t"))
  }

  /** Per-hop conversion latency: for each consecutive stage pair, the
    * converting users' time-to-convert (µs) — count, mean and exact
    * interpolated median (integer µs inputs, so the midpoint
    * interpolation is engine-exact, the a13 rule). Rides the
    * [[funnelReachTimes]] single-exchange frame: a hop's Δt is a slot
    * difference (null-propagating, so only converters count), and all
    * hops aggregate in ONE global pass — no per-hop frontier joins.
    */
  def funnelHopTimes(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String],
      withinUs: Option[Long] = None): DataFrame = {
    require(stages.size >= 2, "funnelHopTimes needs at least two stages")
    val reach = funnelReachTimes(events, userCol, typeCol, tsCol, stages, withinUs)
    val aggs = (1 until stages.size).flatMap { k =>
      val dt = element_at(col("_t"), k + 1) - element_at(col("_t"), k)
      Seq(count(dt).as(s"_n$k"), avg(dt).as(s"_m$k"),
        expr(s"percentile(element_at(_t, ${k + 1}) - element_at(_t, $k), 0.5)")
          .as(s"_p$k"))
    }
    // single aggregate row inlined to one row per hop IN-PLAN (no
    // persist+union fan-out — advisor r10 cache-leak note, see funnel)
    val packed = array((1 until stages.size).map { k =>
      struct(lit(k).as("hop_idx"),
        lit(s"${stages(k - 1)}->${stages(k)}").as("hop"),
        col(s"_n$k").as("n_converted"), col(s"_m$k").as("mean_us"),
        col(s"_p$k").as("median_us"))
    }: _*)
    reach.agg(aggs.head, aggs.tail: _*).select(inline(packed))
  }

  /** Cohort retention: users are cohorted by the period (e.g. 'week')
    * of their first event; a cohort is "retained" in offset p if the
    * user has ANY event in cohort_period + p. Returns
    * (cohort, period_offset, n_users) with one row per non-empty cell.
    *
    * REQUIRES `spark.sql.session.timeZone = UTC` (every graft entry
    * point pins it): offsets are fixed-length divisions of
    * `date_trunc` deltas, which is exact only when period boundaries
    * are a whole multiple of the period apart — under a DST timezone
    * a week boundary shifts by ±1h and the truncating cast collapses
    * offset 1 into 0. The same assumption backs `ohlcStream`'s
    * day-floor. (A timezone-robust variant would dense_rank the
    * truncated period ordinals instead; not worth the extra exchange
    * while the engine pins UTC.)
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      period: String = "week"): DataFrame = {
    val periodUs: Long = period match {
      case "day"  => 86400000000L
      case "week" => 7L * 86400000000L
      case other  => throw new IllegalArgumentException(
        s"unsupported retention period '$other' (day|week)")
    }
    requireUtc(events.sparkSession, "retentionCohorts")
    val u = col(userCol)
    // One corpus-scale exchange total: the per-user active-period SET is
    // built with map-side partial collect_set (shuffle volume = distinct
    // (user, period) pairs per map partition, not events), the cohort is
    // its min (date_trunc is monotone, so min-of-periods = period-of-min),
    // and the final (cohort, offset) rollup aggregates metadata-sized
    // rows. The distinct+join alternative shuffles the corpus twice.
    events
      .select(u, unix_micros(date_trunc(period, col(tsCol))).as("_w"))
      .groupBy(u).agg(collect_set(col("_w")).as("_ws"))
      .select(array_min(col("_ws")).as("_cohort"), explode(col("_ws")).as("_active"))
      .select(timestamp_micros(col("_cohort")).as("cohort"),
        ((col("_active") - col("_cohort")) / periodUs).cast("long").as("period_offset"))
      .groupBy(col("cohort"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Event-type transition matrix: for consecutive events per key (ts
    * order, `orderCols` breaking ties), count each (from, to) pair and
    * its probability among the from-state's outgoing transitions. The
    * probability is the exact rational count ratio — engine-portable.
    * One key-partitioned window (the lag) + one metadata-sized
    * aggregate: |types|² rows.
    */
  def transitionMatrix(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      orderCols: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = col(tsCol) +: orderCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val pairs = events
      .withColumn("_from", lag(col(typeCol), 1).over(w))
      .filter(col("_from").isNotNull)
      .groupBy(col("_from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("from_type"))
    pairs.withColumn("prob",
      col("n").cast("double") / sum(col("n")).over(totals).cast("double"))
  }

  /** Top user journeys: each key's first `firstN` event types (ts
    * order, `orderCols` breaking ties) joined into a path string,
    * counted across keys. The per-key list is assembled by ONE keyed
    * aggregate (collect_list + array_sort — deterministic regardless
    * of arrival order); state per key is its events, truncated to the
    * path AFTER the sort, so keys with long histories dominate state,
    * not the result. Returns (path, n_users).
    */
  def topPaths(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      firstN: Int,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(firstN >= 1, "topPaths needs firstN >= 1")
    val ordCols = (unix_micros(col(tsCol)).as("_o0") +:
      orderCols.zipWithIndex.map { case (c, i) => col(c).as(s"_o${i + 1}") }) :+
      col(typeCol).as("_t")
    events
      .groupBy(col(keyCol))
      .agg(collect_list(struct(ordCols: _*)).as("_evs"))
      .select(array_join(
        slice(transform(array_sort(col("_evs")), x => x.getField("_t")), 1, firstN),
        "->").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Recency-decayed engagement: per key, events weighted by
    * `2^-(age_days)` relative to the corpus's max timestamp — a
    * half-life of one day (scale `ageUnit` for other half-lives). The
    * weight is an exact power of two, so the per-event product is
    * bit-exact on every IEEE engine and the only cross-engine wobble
    * is summation order (inside comparator tolerance). One metadata
    * max + one keyed aggregate.
    */
  def decayedEngagement(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      ageUnitUs: Long = 86400000000L): DataFrame = {
    val maxTs = events.agg(max(unix_micros(col(tsCol))).as("_mx"))
    events
      .crossJoin(broadcast(maxTs))
      .withColumn("_w", pow(lit(0.5),
        ((col("_mx") - unix_micros(col(tsCol))) / ageUnitUs).cast("long")))
      .groupBy(col(keyCol))
      .agg(sum(col("_w")).as("decayed_n"),
        sum(col("_w") * col(valCol)).as("decayed_value"),
        count(lit(1)).as("n_events"))
  }

  /** Max drawdown per key over the cumulative value series: ticks
    * ordered by (ts, orderCols) accumulate into a running sum, the
    * running PEAK tracks its high-water mark, and the drawdown at
    * each tick is `peak − cum`; the report row per key carries the
    * worst of them plus the final and peak levels — the
    * risk-of-the-path statistic a final P&L number hides (two series
    * ending at the same value differ enormously in how far underwater
    * they went). Values quantize to the portable trunc(v·2^bits)
    * integer grid, so every cumulative sum is exact long arithmetic.
    *
    * Shape: one keyed exchange + per-key sort for the two stacked
    * running windows (same window spec — one Sort, one Window
    * operator chain), then a partial-agg'd per-key rollup. No global
    * window anywhere. Returns (key, n, final_q, peak_q, max_dd_q).
    */
  def drawdown(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      scaleBits: Int = 10,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(scaleBits >= 0 && scaleBits <= 40, "scaleBits in [0, 40]")
    val scale = (1L << scaleBits).toDouble
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(tsCol) +: orderCols.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_q", expr(s"CAST(CAST($valCol AS DOUBLE) * ${scale}D AS LONG)"))
      .withColumn("_cum", sum(col("_q")).over(w))
      .withColumn("_peak", max(col("_cum")).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_q")).as("final_q"),
        max(col("_cum")).as("peak_q"),
        max(col("_peak") - col("_cum")).as("max_dd_q"))
  }

  /** Lead-lag cross-correlation between two event types' activity
    * series: counts per time bucket for each type, then the exact
    * integer dot product `Σ_h a(h)·b(h+lag)` for every lag in
    * [−maxLag, maxLag] — the "does A lead B" read (a positive best
    * lag means A's activity predicts B's that many buckets later:
    * deploys→errors, views→purchases). Best lag flagged
    * deterministically (dot desc, |lag| asc, lag asc).
    *
    * Buckets use FLOOR division (`(us − pmod(us, w)) div w` — exact
    * floor for any sign with pure integer ops; a truncating `div`
    * would diverge from DuckDB's flooring `//` pre-1970, the a24
    * review finding).
    *
    * Scale shape: two partial-agg'd exchanges to the per-type bucket
    * count series (metadata-sized — one row per active bucket); the
    * lag fan-out and dot products run over those series rows only.
    * Returns (lag, dot, is_best), 2·maxLag+1 rows.
    */
  def leadLag(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      typeA: String,
      typeB: String,
      maxLag: Int = 6,
      bucketUs: Long = 3600000000L): DataFrame = {
    require(maxLag >= 1 && maxLag <= 1000, "leadLag: maxLag in [1, 1000]")
    require(bucketUs >= 1, "leadLag: bucketUs must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    def series(t: String) = events.filter(col(typeCol) === t)
      .select(expr(
        s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), ${bucketUs}L))" +
          s" div ${bucketUs}L").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
    val a = series(typeA)
    val b = series(typeB)
    val lags = (-maxLag to maxLag).toDF("lag")
    val joined = a.select(col("h").as("_ha"), col("n").as("_na"))
      .crossJoin(broadcast(lags))
      .join(b.select(col("h").as("_hb"), col("n").as("_nb")),
        col("_hb") === col("_ha") + col("lag"))
      .groupBy(col("lag"))
      .agg(sum(col("_na") * col("_nb")).as("dot"))
    val full = lags.join(joined, Seq("lag"), "left")
      .withColumn("dot", coalesce(col("dot"), lit(0L)))
    val best = full
      .orderBy(col("dot").desc, abs(col("lag")).asc, col("lag").asc)
      .limit(1).select(col("lag").as("_bl")) // 1 row
    full.crossJoin(broadcast(best))
      .select(col("lag").cast("long").as("lag"), col("dot"),
        (col("lag") === col("_bl")).as("is_best"))
  }

  /** Entity-novelty curve: per UTC day, how many distinct entities
    * (the `entityCols` tuple) were active, how many were seen for the
    * FIRST time, and the cumulative distinct count — the temporal
    * Heaps audit ("is the stream still discovering new entities, or
    * re-treading the known set?"): a collapsing new-share means the
    * population is saturated (retention machinery applies); a flat
    * high new-share means churn or synthetic id inflation. Integer
    * day keys (epoch-days), exact counts.
    *
    * Scale shape: one entity-keyed partial-agg'd exchange computes
    * each entity's first day and the (entity, day) activity pairs
    * collapse map-side; day rows are metadata-sized and the
    * cumulative window runs over them. Returns (day, n_active,
    * n_new, cum_entities, new_milli).
    */
  def entityNovelty(
      events: DataFrame,
      entityCols: Seq[String],
      tsCol: String): DataFrame = {
    require(entityCols.nonEmpty, "entityNovelty: need at least one entity column")
    requireUtc(events.sparkSession, "entityNovelty")
    // calendar day (to_date floors in every era; truncating epoch
    // `div` would merge the two days around 1970-01-01 — review
    // finding), matching the v3 drift convention
    val day = to_date(col(tsCol)).as("day")
    val pairs = events
      .select((entityCols.map(col) :+ day): _*)
      .distinct() // (entity, day) activity pairs — map-side collapsed
    val firstDay = pairs.groupBy(entityCols.map(col): _*)
      .agg(min(col("day")).as("_fd"))
    val active = pairs.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val fresh = firstDay.groupBy(col("_fd").as("day"))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("day")) // metadata day rows
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active.join(fresh, Seq("day"), "full_outer")
      .withColumn("n_active", coalesce(col("n_active"), lit(0L)))
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_entities", sum(col("n_new")).over(w))
      .withColumn("new_milli",
        expr("n_new * 1000 div greatest(n_active, 1)"))
  }

  /** Diurnal periodicity audit: per (type, hour-of-day) event counts
    * with each type's peak hour and a `bursty` verdict — the peak
    * hour carrying more than `burstMilli`/1000 OF THE TYPE'S TOTAL
    * (integer cross-multiplication: `peak·1000 > burstMilli·total`;
    * default 500 = an absolute majority of events in one wall-clock
    * hour). Deliberately NOT "× the uniform 1/24 share": human
    * diurnal traffic concentrates in waking hours and would trip any
    * uniform-relative threshold; a single-hour majority is the cron
    * replay / burst-scrape shape. The hour profile itself feeds
    * capacity planning either way.
    *
    * Scale shape: one partial-agg'd exchange to the (type, hour)
    * cells — ≤ 24·|type domain| metadata rows; peak/total ride as
    * windows over each type's ≤ 24 rows. Returns (event type, hour,
    * n, total, share_milli, is_peak, bursty).
    */
  def hourOfDayProfile(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      burstMilli: Long = 500L): DataFrame = {
    require(burstMilli >= 1 && burstMilli <= 1000,
      "hourOfDayProfile: burstMilli in [1, 1000]")
    requireUtc(events.sparkSession, "hourOfDayProfile")
    // calendar hour, not truncating epoch arithmetic: Java-style
    // `div`/`%` go NEGATIVE for pre-1970 timestamps (an impossible
    // hour row that diverges from DuckDB's flooring `//`); hour() is
    // floor-correct in both engines for any era (review finding)
    val cells = events
      .select(col(typeCol),
        expr(s"CAST(hour($tsCol) AS BIGINT)").as("hour"))
      .groupBy(col(typeCol), col("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(typeCol)) // <= 24 rows per type
    cells
      .withColumn("total", sum(col("n")).over(w))
      .withColumn("_mx", max(col("n")).over(w))
      .withColumn("_peakHour",
        min(when(col("n") === col("_mx"), col("hour"))).over(w))
      .withColumn("share_milli", expr("n * 1000 div total"))
      .withColumn("is_peak", col("hour") === col("_peakHour"))
      .withColumn("bursty",
        expr(s"_mx * 1000 > $burstMilli * total"))
      .select(col(typeCol), col("hour"), col("n"), col("total"),
        col("share_milli"), col("is_peak"), col("bursty"))
  }

  /** Event-type co-occurrence with lift over per-key activity
    * sessions (gap-based, the a11 sessionization): for every
    * unordered pair of event types, in how many sessions do both
    * occur, versus what independence predicts — `lift = P(A∩B) /
    * (P(A)·P(B))`, reported as the integer cross-multiplication
    * `together·total·1000 div (n_a·n_b)` plus the exact `positive`
    * verdict `together·total > n_a·n_b`. The UNORDERED association
    * view the funnel family (a14/a20, ordered) cannot express —
    * "users who do A in a session also do B", the feature-pairing /
    * cannibalization read.
    *
    * Scale shape: one keyed exchange + per-key sort assigns session
    * ids (lag + running sum); per-session distinct types bound the
    * pair self-join by C(|type domain|, 2) rows per session — never
    * row-quadratic; type totals and the session count ride as
    * metadata frames. Returns (type_a, type_b, together, n_a, n_b,
    * total_sessions, lift_milli, positive).
    */
  def cooccurrence(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      gapUs: Long = 12L * 3600 * 1000000): DataFrame = {
    require(gapUs >= 1, "cooccurrence: gapUs must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val wc = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol))
    // r16 optimization (§2.4 remove shuffles / §2.3 shuffle fewer
    // bytes): the former shape materialized distinct (key, sid, type)
    // ROWS and self-joined them on (key, sid) — two extra corpus-keyed
    // exchanges plus a pair join whose probe side re-shuffled the
    // whole session table. Types per session are bounded by the type
    // DOMAIN, so the same pairs fall out of one per-session sorted
    // distinct-type ARRAY: the groupBy(key, sid) rides the window's
    // existing hash(key) partitioning (subset clustering — no new
    // exchange), and everything after it is session-level metadata
    // (one row per session). Pair enumeration `x < y over a sorted
    // distinct array` emits exactly the rows the `a._t < b._t`
    // self-join produced; per-type session counts explode the same
    // arrays. Output identical (oracle keeps the self-join form).
    val sess = events
      .select(col(keyCol), col(tsCol), col(typeCol))
      .withColumn("_brk",
        when(lag(us, 1).over(w).isNull ||
          us - lag(us, 1).over(w) >= gapUs, 1L).otherwise(0L))
      .withColumn("_sid", sum(col("_brk")).over(wc))
      .groupBy(col(keyCol), col("_sid"))
      .agg(sort_array(collect_set(col(typeCol))).as("_ts"))
      // session-level frame (one row per session, array bounded by the
      // type domain) reused 3x: total count, per-type counts, pair
      // counts; lifecycle = the harness/caller's clearCache, the
      // Dedup.trackPersist convention
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = sess.agg(count(lit(1)).as("total_sessions")) // 1 row
    // sessions containing type t — collect_set already dedup'd within
    // a session, so the explode emits each (session, type) once
    val perType = sess.select(explode(col("_ts")).as("_t"))
      .groupBy(col("_t")).agg(count(lit(1)).as("_n"))
    // unordered pairs within the sorted distinct array: element i with
    // every later element — the `_t < _t'` condition by construction
    val pairs = sess
      .select(explode(expr(
        "flatten(transform(_ts, (x, i) -> " +
          "transform(slice(_ts, i + 2, size(_ts)), y -> struct(x, y))))"))
        .as("_p"))
      .groupBy(col("_p.x").as("type_a"), col("_p.y").as("type_b"))
      .agg(count(lit(1)).as("together"))
    pairs
      .join(broadcast(perType.select(col("_t").as("type_a"), col("_n").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(perType.select(col("_t").as("type_b"), col("_n").as("n_b"))),
        Seq("type_b"))
      .crossJoin(broadcast(total))
      // lift products in DECIMAL(38,0): long arithmetic would wrap at
      // ~1e8 sessions for a near-ubiquitous pair (review finding);
      // the FINAL milli value is small, so the cast back is exact
      .withColumn("lift_milli",
        expr("CAST(floor(CAST(together AS DECIMAL(38,0)) * total_sessions " +
          "* 1000 / (CAST(n_a AS DECIMAL(38,0)) * n_b)) AS BIGINT)"))
      .withColumn("positive",
        expr("CAST(together AS DECIMAL(38,0)) * total_sessions " +
          "> CAST(n_a AS DECIMAL(38,0)) * n_b"))
      .select(col("type_a"), col("type_b"), col("together"), col("n_a"),
        col("n_b"), col("total_sessions"), col("lift_milli"), col("positive"))
  }

  /** Two-sided CUSUM change detection per key (Page 1954): the
    * sequential drift detector that fires on a SUSTAINED shift of the
    * mean long before any single tick looks anomalous (the complement
    * of w10's per-tick z-score spikes). Upper side accumulates
    * `S_i = max(0, S_{i−1} + (x_i − ref − slack))`, lower side the
    * mirror; an alarm is any tick where either side reaches
    * `threshold`. The clamped recursions are computed CLOSED-FORM on
    * the running windows — `S_i = C_i − min(0, min_{j≤i} C_j)` for
    * the cumulative sum C of the drift-adjusted deltas — so the whole
    * operator is the w7 drawdown shape: one keyed exchange, one
    * per-key sort, stacked running windows, exact long arithmetic on
    * the trunc(v·2^bits) grid.
    *
    * Returns one row per key: (key, n, max_up_q, max_dn_q, n_alarms,
    * first_alarm_us) — n_alarms counts ALARMED TICKS (no reset after
    * an alarm: the audit reports how long the shift persisted);
    * first_alarm_us is epoch-µs of the earliest alarm, null if the
    * key never alarmed.
    */
  def cusum(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      refValue: Double,
      slack: Double,
      threshold: Double,
      scaleBits: Int = 10,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(scaleBits >= 0 && scaleBits <= 40, "scaleBits in [0, 40]")
    require(slack >= 0, "cusum: slack must be >= 0")
    require(threshold > 0, "cusum: threshold must be > 0")
    val scale = (1L << scaleBits).toDouble
    val refQ = (refValue * scale).toLong
    val slackQ = (slack * scale).toLong
    val hQ = (threshold * scale).toLong
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(tsCol) +: orderCols.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_q", expr(s"CAST(CAST($valCol AS DOUBLE) * ${scale}D AS LONG)"))
      .withColumn("_cu", sum(col("_q") - lit(refQ + slackQ)).over(w))
      .withColumn("_cd", sum(col("_q") - lit(refQ - slackQ)).over(w))
      .withColumn("_su", col("_cu") - least(min(col("_cu")).over(w), lit(0L)))
      .withColumn("_sd", greatest(max(col("_cd")).over(w), lit(0L)) - col("_cd"))
      .withColumn("_al", col("_su") >= hQ || col("_sd") >= hQ)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        max(col("_su")).as("max_up_q"),
        max(col("_sd")).as("max_dn_q"),
        sum(when(col("_al"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("_al"), unix_micros(col(tsCol)))).as("first_alarm_us"))
  }

  /** Exponentially-weighted moving average with α = 1/2 over the last
    * `window` ticks per key, in EXACT integer arithmetic: tick j-back
    * carries weight 2^(window−1−j), so the numerator is a shifted
    * long sum and the denominator for m present ticks is
    * 2^window − 2^(window−m) — no float recursion, no drift, and the
    * DuckDB oracle reproduces every value bit-for-bit. The truncating
    * window IS the contract (a 2^-16 tail weight is below the
    * quantization floor anyway); the warm-up ticks renormalize over
    * the ticks actually present, the standard adjusted-EWMA start.
    *
    * Shape: one keyed exchange + per-key sort; the sliding frame is
    * a bounded collect (≤ window longs per row) folded by codegen'd
    * array arithmetic. Returns one row per tick —
    * (key, orderCols…, n_win, ewma_q).
    */
  def ewma(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      scaleBits: Int = 10,
      window: Int = 16,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(window >= 1 && window <= 62, "ewma window in [1, 62]")
    require(scaleBits >= 0 && scaleBits <= 40, "scaleBits in [0, 40]")
    val scale = (1L << scaleBits).toDouble
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(tsCol) +: orderCols.map(col)): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val wm = window - 1
    events
      .withColumn("_q", expr(s"CAST(CAST($valCol AS DOUBLE) * ${scale}D AS LONG)"))
      .withColumn("_win", collect_list(col("_q")).over(w))
      .withColumn("n_win", size(col("_win")))
      // weight of the i-th element (1-based, oldest first) of an
      // m-long window: 2^(window-1-m+i); denominator 2^w − 2^(w−m)
      .withColumn("_num", expr(
        s"""aggregate(
           |  zip_with(_win, sequence(1, n_win),
           |    (x, i) -> x * shiftleft(1L, $wm - n_win + i)),
           |  0L, (a, y) -> a + y)""".stripMargin))
      .withColumn("_den", expr(
        s"shiftleft(1L, $window) - shiftleft(1L, $window - n_win)"))
      .withColumn("ewma_q", expr(
        "CASE WHEN _num >= 0 THEN _num div _den " +
          "ELSE -((-_num) div _den) END"))
      .select((col(keyCol) +: orderCols.map(col)) ++
        Seq(col("n_win"), col("ewma_q")): _*)
  }

  /** Realized variance per (key, bucket): tick-over-tick arithmetic
    * returns `r_t = q_t − q_{t−1}` within the bucket (the first tick
    * of a bucket has no predecessor and contributes no return), then
    * the integer masses (n_returns, net_q = Σr, rv_q = Σr²) — the
    * realized-volatility building block, exact on the quantized grid
    * so both engines agree to the last unit. Derive vol as
    * `sqrt(rv_q)/2^bits` at read time; the GATED values stay integer.
    *
    * Shape: one (key, bucket) exchange + per-partition sort for the
    * lag, then a partial-agg'd rollup on the same keys — the second
    * aggregation reuses the first exchange's partitioning (no extra
    * shuffle in the plan).
    */
  def realizedVariance(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      bucket: String = "day",
      scaleBits: Int = 10,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(scaleBits >= 0 && scaleBits <= 40, "scaleBits in [0, 40]")
    val scale = (1L << scaleBits).toDouble
    val w = Window.partitionBy(col(keyCol), col("_bk"))
      .orderBy((col(tsCol) +: orderCols.map(col)): _*)
    events
      .withColumn("_bk", date_trunc(bucket, col(tsCol)))
      .withColumn("_q", expr(s"CAST(CAST($valCol AS DOUBLE) * ${scale}D AS LONG)"))
      .withColumn("_r", col("_q") - lag(col("_q"), 1).over(w))
      .filter(col("_r").isNotNull)
      .groupBy(col(keyCol), col("_bk").as("bucket"))
      .agg(count(lit(1)).as("n_returns"),
        sum(col("_r")).as("net_q"),
        sum(col("_r") * col("_r")).as("rv_q"))
  }

  /** Rolling z-score anomaly flags: each tick is compared against the
    * mean/variance of the `window` ticks BEFORE it (the prior window —
    * the tick never judges itself), flagged when
    * `z² > (kMilli/1000)²`, i.e. exactly when
    * `(n·x − S)²·10⁶ > kMilli²·(n·(n·Q − S²))` on the quantized
    * integer grid (S = Σq, Q = Σq² over the prior window) — the spike
    * detector the tick family (TWAP/OHLC/drawdown/EWMA/realized-var)
    * was missing, engine-portable because no division or float ever
    * happens. Ticks with fewer than `minPrior` predecessors never
    * flag; a zero-variance prior window flags ANY deviation (infinite
    * z — the constant-metric-just-jumped case, usually the one that
    * matters). Emits per tick (key, order…, n_prior, q, sum_prior,
    * sumsq_prior, is_anomaly); the masses are gated, z derives at
    * read time.
    *
    * Overflow envelope (ANSI: exact-or-fail, never a silent wrap):
    * keep |q| ≲ 2²¹/window for kMilli ≤ ~4000 — at the default
    * scaleBits = 0 any metric under ~10⁵ units is safe.
    *
    * Shape: one keyed exchange + per-key sort; both running masses and
    * the flag ride the SAME bounded ROWS window — no second shuffle,
    * state bounded by `window` longs per key however long the stream.
    */
  def rollingAnomaly(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      window: Int = 16,
      kMilli: Long = 3000L,
      minPrior: Int = 8,
      scaleBits: Int = 0,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(window >= 2 && window <= 64, "rollingAnomaly: window in [2, 64]")
    require(minPrior >= 2 && minPrior <= window,
      "rollingAnomaly: minPrior in [2, window]")
    require(kMilli >= 0 && kMilli <= 1000000L,
      "rollingAnomaly: kMilli in [0, 1e6]")
    require(scaleBits >= 0 && scaleBits <= 20, "scaleBits in [0, 20]")
    val scale = (1L << scaleBits).toDouble
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(tsCol) +: orderCols.map(col)): _*)
      .rowsBetween(-window, -1)
    val n = col("n_prior")
    val dev = n * col("q") - col("sum_prior")
    events
      .withColumn("q", expr(s"CAST(CAST($valCol AS DOUBLE) * ${scale}D AS LONG)"))
      // pre-derive q² so all three running masses land in ONE Window
      // operator (deriving it between withColumns splits Catalyst's
      // window grouping into two nodes — same exchange, noisier plan)
      .withColumn("_qq", col("q") * col("q"))
      .withColumn("n_prior", count(col("q")).over(w))
      .withColumn("sum_prior", coalesce(sum(col("q")).over(w), lit(0L)))
      .withColumn("sumsq_prior", coalesce(sum(col("_qq")).over(w), lit(0L)))
      .withColumn("is_anomaly",
        n >= minPrior &&
          dev * dev * lit(1000000L) >
            lit(kMilli * kMilli) *
              (n * (n * col("sumsq_prior") - col("sum_prior") * col("sum_prior"))))
      .select((col(keyCol) +: orderCols.map(col)) ++ Seq(col("n_prior"),
        col("q"), col("sum_prior"), col("sumsq_prior"), col("is_anomaly")): _*)
  }

  /** Event-time lateness audit: in ARRIVAL order (`arrivalCol`), how
    * far each event's timestamp falls behind the running event-time
    * high-water mark — the empirical distribution a Structured
    * Streaming watermark delay should be chosen FROM, measured before
    * a `withWatermark` guess silently drops the tail. Returns per key
    * (n, n_late, max_late_us, sum_late_us) — exact integer µs.
    *
    * Shape: one keyed exchange + per-key sort for the running max
    * (frame ends at the PREVIOUS row, so an event is compared to the
    * frontier before it arrived); the rollup reuses the exchange.
    */
  def latenessAudit(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      arrivalCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_hwm", max(col("_us")).over(w))
      .withColumn("_late",
        when(col("_hwm") > col("_us"), col("_hwm") - col("_us")).otherwise(0L))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_late") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("_late")).as("max_late_us"),
        sum(col("_late")).as("sum_late_us"))
  }

  /** Time-weighted average of `valCol` per key: each observation is
    * weighted by the time it remained current (until the key's next
    * event). The key's last event has no successor and carries no
    * weight. `orderCols` break timestamp ties deterministically.
    * Returns (key, twap, n_intervals, span_us).
    */
  def timeWeightedAvg(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      orderCols: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = col(tsCol) +: orderCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    // integer-milli mass, not a double weighted sum: Σ value·dt in
    // doubles is accumulation-order-dependent, and the sf1 gate caught
    // replicated keys whose last-ulp twap diffs broke sorted-row
    // alignment across engines (the a11 class). floor(value·1000)·dt
    // sums exactly; the div is truncating in both engines.
    events
      .withColumn("_dt", unix_micros(lead(col(tsCol), 1).over(w)) -
        unix_micros(col(tsCol)))
      .filter(col("_dt").isNotNull)
      .groupBy(col(keyCol))
      .agg(
        sum(floor(col(valCol) * 1000).cast("long") * col("_dt")).as("_mass"),
        count(lit(1)).as("n_intervals"),
        sum(col("_dt")).as("span_us"))
      .select(col(keyCol), expr("_mass div span_us").as("twap_milli"),
        col("n_intervals"), col("span_us"))
  }
}
