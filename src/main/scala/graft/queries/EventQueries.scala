package graft.queries

import graft.operators.Events
import org.apache.spark.sql.functions._
import QHelpers._

/**
 * Event-time / streaming-shaped queries over `events` (SURVEY §2.10 —
 * beyond-reference extension surface; the reference's only incrementality is
 * a daily batch re-crawl, scheduler.py:10-33). All shapes are
 * batch-equivalent so the DuckDB oracle can check them; the same plans lift
 * to Structured Streaming (see graft.streaming.StreamOps).
 */
object EventQueries {

  val queries: Map[String, Q] = Map(
    // tumbling event-time window aggregation
    "q26_events_hourly" -> ((s, dir) =>
      Events.tumblingCounts(t(s, dir, "events"), "1 hour")
        .orderBy(col("window_start"), col("event_type"))),

    // sessionization — gaps-and-islands spelling
    "q27_sessionize" -> ((s, dir) =>
      Events.sessionize(t(s, dir, "events"), gapMinutes = 30)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .orderBy(col("user_id"), col("session_start"))),

    // sessionization — native session_window spelling (same semantics)
    "q28_session_window" -> ((s, dir) =>
      Events.sessionWindows(t(s, dir, "events"), "30 minutes")
        .orderBy(col("user_id"), col("session_start"))),

    // DYNAMIC-gap session windows — per-event gap durations (a click
    // keeps a session alive 5 minutes, a view 15, anything heavier 45):
    // the engagement-weighted sessionization real attribution uses, and
    // the API surface beyond q28's fixed gap. Spark merges each event's
    // [ts, ts+gap) interval into sessions; the oracle replays that as
    // interval merging with a running-max-end island pass.
    "q183_dynamic_session" -> ((s, dir) => {
      val gap = when(col("event_type") === "click", lit("5 minutes"))
        .when(col("event_type") === "view", lit("15 minutes"))
        .otherwise(lit("45 minutes"))
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Distribution-drift gate (data-quality monitoring between ingest
    // periods — the check a training pipeline runs before admitting a new
    // crawl batch): per event_type, the before/after value histograms are
    // compared with a chi-square-style statistic in pure INTEGER basis
    // points (per-bin integer divisions, then a sum — no logarithm, no
    // float accumulation, so the oracle replays it bit-for-bit; the
    // greatest(·,1) guards a period-absent type). One pass bins both
    // periods (conditional sums), totals ride a per-type self-join of the
    // tiny cell table — the corpus is scanned once.
    "q131_drift_gate" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("bin", floor(col("value") / 100.0).cast("long"))
        .withColumn("in_a",
          (col("ts") < lit("2024-01-15").cast("timestamp")).cast("long"))
      val cells = ev.groupBy(col("event_type"), col("bin"))
        .agg(sum(col("in_a")).as("na"), sum(lit(1L) - col("in_a")).as("nb"))
        // tiny (#types × #bins); feeds both the totals and the join — the
        // checkpoint keeps the corpus scan single (no cross-branch CSE)
        .localCheckpoint()
      val tots = cells.groupBy(col("event_type"))
        .agg(sum(col("na")).as("na_tot"), sum(col("nb")).as("nb_tot"))
      cells.join(broadcast(tots), "event_type")
        .withColumn("pa_bp", expr("na * 10000 DIV greatest(na_tot, 1)"))
        .withColumn("pb_bp", expr("nb * 10000 DIV greatest(nb_tot, 1)"))
        .withColumn("contrib",
          expr("(pa_bp - pb_bp) * (pa_bp - pb_bp) DIV (pa_bp + pb_bp + 1)"))
        .groupBy(col("event_type"))
        .agg(max(col("na_tot")).as("n_a"), max(col("nb_tot")).as("n_b"),
          count(lit(1)).as("n_bins"), sum(col("contrib")).as("drift_bp"))
        .withColumn("drifted", col("drift_bp") >= 100)
        .orderBy(col("event_type"))
    }),

    // per-user event-type profile (conditional counts)
    "q29_user_profile" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "view", 1)).as("n_view"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "signup", 1)).as("n_signup"),
          count(when(col("event_type") === "error", 1)).as("n_error"),
          count(lit(1)).as("n_total"),
          dsum(col("value")).as("sum_value"))
        .orderBy(col("user_id"))),

    // as-of join: each purchase matched to the user's latest prior signup —
    // Spark-side union+running-window plan, DuckDB-side native ASOF JOIN
    "q30_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Events.asofJoin(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "signup"),
          keyCol = "user_id", tsCol = "ts", leftCols = Seq("event_id"))
        .select("event_id", "user_id", "ts", "asof_ts")
        .orderBy(col("event_id"))
    }),

    // bucketed range join: clicks in the hour before each purchase — the
    // hash-join spelling of an interval join (no theta-join explosion)
    "q39_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Events.rangeCountPreceding(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"),
          keyCol = "user_id", tsCol = "ts", windowSec = 3600L,
          leftIdCol = "event_id")
        .select(col("event_id"), col("user_id"), col("n_in_range").as("n_clicks"))
        .orderBy(col("event_id"))
    }),

    // pivot: hour-of-day × event-type value matrix
    "q45_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(hour(col("ts")).as("hh"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(dsum(col("value")))
        .orderBy(col("hh"))),

    // unpivot: the wide pivot matrix melted back to long form
    "q51_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "events")
        .groupBy(hour(col("ts")).as("hh"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(dsum(col("value")))
      wide.unpivot(Array(col("hh")),
          Array(col("click"), col("view"), col("purchase"), col("signup"), col("error")),
          "event_type", "sum_value")
        .filter(col("sum_value").isNotNull)
        .orderBy(col("hh"), col("event_type"))
    }),

    // window frame: 7-row trailing moving average per user
    "q46_moving_avg" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(avg(col("value")).over(w), 4).as("mavg7"))
        .orderBy(col("event_id"))
    }),

    // CDC changelog compaction (upsert materialization): treat events as a
    // change stream keyed by (user_id, event_type) — the LATEST record per
    // key (event-time, event_id tiebreak) is the current state, everything
    // older is superseded. One shuffle on the key; at 100 TB this runs
    // per-partition-of-key exactly like any log-structured table's
    // compaction pass (Delta/Hudi/Iceberg merge-on-read → copy-on-write).
    "q81_cdc_compact" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_keys"),
          dsum(col("value")).as("latest_sum"),
          max(col("ts")).as("max_ts"),
          sum(col("event_id")).as("sum_latest_ids"))
        .orderBy(col("event_type"))
    }),

    // Snapshot-as-of (time travel) over the keyed changelog: the state the
    // q81 compaction would have produced had the log been cut at T — filter
    // the log to ts <= T FIRST (partition/row-group pruning does the work at
    // 100 TB: the predicate reaches the scan), then latest-per-key. This is
    // the read side of every log-structured table's AS OF query; per-key
    // detail rows are the result, so the oracle checks the full state.
    "q91_snapshot_asof" -> ((s, dir) => {
      val asOf = "2024-01-15 00:00:00"
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .filter(col("ts") <= lit(asOf).cast("timestamp"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("ts").as("state_ts"),
          col("event_id").as("state_event_id"),
          round(col("value"), 4).as("state_value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Time-based window frame (RANGE, not ROWS): each event's trailing-hour
    // per-user running sum/count — the frame is defined by the ORDER-BY
    // value (epoch micros), so tied timestamps form peer groups identically
    // in both engines; the windowed sum stays in DECIMAL (order-independent)
    "q92_range_frame" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_trailing_1h"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("sum_trailing_1h"))
        .orderBy(col("event_id"))
    }),

    // Time-series resample + gap fill: each user's hourly activity grid over
    // their own active span (sequence + explode — generated distributed, per
    // key, never a driver-side calendar), empty hours carrying the last
    // observed hourly sum forward (last/ignoreNulls over an unbounded
    // running frame). The ffill'd values are exact copies of DECIMAL-summed
    // hours, so the hash survives cross-engine. Bounded to users < 100 to
    // keep the graded grid small; the plan is user-count-independent.
    "q96_gap_fill" -> ((s, dir) => {
      val hourly = t(s, dir, "events").filter(col("user_id") < 100)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hh"))
        .agg(dsum(col("value")).as("sum_value"), count(lit(1)).as("n_events"))
      val grid = hourly.groupBy(col("user_id"))
        .agg(min(col("hh")).as("h0"), max(col("hh")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hh"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("hh"))
        .rowsBetween(Long.MinValue, 0)
      grid.join(hourly, Seq("user_id", "hh"), "left")
        .select(col("user_id"), col("hh"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("sum_value"), ignoreNulls = true).over(w).as("filled_value"))
        .orderBy(col("user_id"), col("hh"))
    }),

    // Sequential funnel (signup → first later click → first later purchase
    // per user): each stage is an equi join on the user plus a strictly-after
    // residual, then a min — never a per-user sort or a cross join; at scale
    // each stage is one hash join + partial-aggregated min on the key.
    "q97_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("cts"))
      val firstClick = signup
        .join(clicks, col("c_user") === col("user_id") && col("cts") > col("t_signup"), "left")
        .groupBy(col("user_id"), col("t_signup"))
        .agg(min(col("cts")).as("t_first_click"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("pts"))
      firstClick
        .join(purchases, col("p_user") === col("user_id") && col("pts") > col("t_first_click"), "left")
        .groupBy(col("user_id"), col("t_signup"), col("t_first_click"))
        .agg(min(col("pts")).as("t_first_purchase"))
        .orderBy(col("user_id"))
    }),

    // Time-weighted average (the time-series mean that's correct under
    // irregular sampling): each observation holds until the next one, so it
    // is weighted by its holding time. dt is exact integer micros; the
    // value·dt product is one IEEE multiply (bit-identical cross-engine)
    // and the sums ride DECIMAL so partial-merge order can't drift them.
    "q102_time_weighted" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("dt_s", (lead(col("us"), 1).over(w) - col("us")) / lit(1e6))
        .filter(col("dt_s").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          sum((col("value") * col("dt_s")).cast("decimal(28,6)"))
            .cast("double").as("sum_vdt"),
          sum(col("dt_s").cast("decimal(28,6)")).cast("double").as("sum_dt"))
        .select(col("user_id"),
          round(col("sum_vdt") / col("sum_dt"), 6).as("twa"))
        .orderBy(col("user_id"))
    }),

    // Co-occurrence / association matrix: for each unordered pair of event
    // types, how many users exhibit both — distinct (user, type) pairs,
    // then a self-join bounded by the (tiny) type vocabulary per user,
    // never a cartesian over rows.
    "q103_cooccurrence" -> ((s, dir) => {
      val ut = t(s, dir, "events")
        .select(col("user_id"), col("event_type")).distinct()
      val a = ut.select(col("user_id"), col("event_type").as("type_a"))
      val b = ut.select(col("user_id"), col("event_type").as("type_b"))
      a.join(b, Seq("user_id")).filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Cohort retention matrix: users grouped by first-activity week, counted
    // in each later week they return — the product-analytics staple. One
    // min-per-user pass, one distinct (cohort, offset, user) projection,
    // one count; every step partial-aggregates before its exchange.
    "q106_cohort_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cohort = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      ev.select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        .join(cohort, "user_id")
        .select(col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"),
          col("user_id"))
        .distinct()
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // SCD Type-2 dimension join: signups version each user's profile (valid
    // from their ts until the user's next signup — lead() builds the
    // validity interval, no self-join); purchases then join to the version
    // VALID AT fact time. The interval predicate rides an equi join on the
    // user, so the plan is a hash join + residual, never a theta explosion.
    "q107_scd_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val versions = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("v_user"), col("ts").as("valid_from"),
          col("event_id").as("version_id"), round(col("value"), 4).as("profile_value"))
        .withColumn("valid_to",
          lead(col("valid_from"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("v_user")).orderBy(col("valid_from"), col("version_id"))))
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .join(versions, col("user_id") === col("v_user") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
        .select(col("event_id"), col("user_id"), col("version_id"),
          col("profile_value"))
        .orderBy(col("event_id"))
    }),

    // Materialized-view rollup cascade: weekly and monthly aggregates
    // derived from the DAILY MV (sum-of-sums with DECIMAL recasts), never
    // from the base table — the warehouse hierarchy where each level costs
    // O(rows of the level below). Grading all three levels against direct
    // base-table aggregation proves the reaggregation algebra is lossless.
    // (Months roll up from days, not weeks — weeks straddle month bounds.)
    "q109_mv_cascade" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("period"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      def up(df: org.apache.spark.sql.DataFrame, unit: String) = df
        .groupBy(date_trunc(unit, col("period")).as("period"))
        .agg(sum(col("n_events")).as("n_events"),
          sum(col("sum_value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      daily.withColumn("level", lit("day"))
        .unionByName(up(daily, "week").withColumn("level", lit("week")))
        .unionByName(up(daily, "month").withColumn("level", lit("month")))
        .select(col("level"), col("period"), col("n_events"), col("sum_value"))
        .orderBy(col("level"), col("period"))
    }),

    // Rolling 7-day distinct actives WITHOUT a theta join: each (user, day)
    // contributes itself to the 7 trailing windows it belongs to (explode of
    // a 0..6 literal range), then one count-distinct per window day — the
    // shuffle-friendly spelling of a sliding distinct count; the semi join
    // keeps only calendar days the data actually contains.
    "q110_rolling_distinct" -> ((s, dir) => {
      val du = t(s, dir, "events")
        .select(date_trunc("day", col("ts")).cast("date").as("d2"), col("user_id"))
        .distinct()
      val days = du.select(col("d2").as("day")).distinct()
      du.select(explode(sequence(lit(0), lit(6))).as("i"), col("d2"), col("user_id"))
        .select(date_add(col("d2"), col("i")).as("day"), col("user_id"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("n_active_7d"))
        .select(col("day").cast("timestamp").as("day"), col("n_active_7d"))
        .orderBy(col("day"))
    }),

    // Mergeable-sketch MV for rolling distinct — the 100 TB spelling of
    // q110: ONE pass builds a per-day HLL sketch of user ids (the stored
    // MV is bytes per day, not users), and each rolling window UNIONS 7
    // tiny sketches instead of re-shuffling every (day,user) pair 7x the
    // way the exact contribute-to-window join must. That union is why
    // production rolling-actives are sketch MVs: backfilling a new window
    // width touches only the daily sketch table. Graded the q43/q50 way —
    // the exact value rides along and the lgK=14 estimate (rsd ≈ 0.8%)
    // must land inside a 5% gate, ≈6 sigma.
    "q127_sketch_mv" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(date_trunc("day", col("ts")).cast("date").as("d2"), col("user_id"))
      val daily = ev.groupBy(col("d2"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      val days = daily.select(col("d2").as("day"))
      val est = daily
        .select(explode(sequence(lit(0), lit(6))).as("i"), col("d2"), col("sk"))
        .select(date_add(col("d2"), col("i")).as("day"), col("sk"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_est"))
      val exact = ev.distinct()
        .select(explode(sequence(lit(0), lit(6))).as("i"), col("d2"), col("user_id"))
        .select(date_add(col("d2"), col("i")).as("day"), col("user_id"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("n_active_7d"))
      exact.join(est, "day")
        .select(col("day").cast("timestamp").as("day"), col("n_active_7d"),
          (abs(col("n_est") - col("n_active_7d"))
            <= col("n_active_7d").cast("double") * 0.05).as("sketch_ok"))
        .orderBy(col("day"))
    }),

    // Exact distributed statistics: variance/stddev/correlation assembled
    // from DECIMAL power sums (n, Σx, Σy, Σxy, Σx², Σy²) instead of the
    // built-in corr/stddev — the builtins merge float partials in shuffle
    // order and drift in the last bits across engines; power sums are
    // order-exact, and the closed-form combination is one deterministic
    // double expression per group. value vs hour-of-day over events.
    "q111_stats_exact" -> ((s, dir) => {
      def p(c: org.apache.spark.sql.Column) = c.cast("decimal(28,6)")
      val ev = t(s, dir, "events")
        .select(col("event_type"), col("value").as("x"),
          hour(col("ts")).cast("double").as("y"))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(p(col("x"))).cast("double").as("sx"),
          sum(p(col("y"))).cast("double").as("sy"),
          sum(p(col("x") * col("y"))).cast("double").as("sxy"),
          sum(p(col("x") * col("x"))).cast("double").as("sxx"),
          sum(p(col("y") * col("y"))).cast("double").as("syy"))
        .select(col("event_type"),
          round(col("sx") / col("n"), 4).as("mean_x"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - 1)), 4).as("stddev_x"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
              * sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 4)
            .as("corr_xy"))
        .orderBy(col("event_type"))
    }),

    // Rank-family window catalog: ntile / percent_rank / cume_dist over a
    // deterministic total order (value, event_id tiebreak) — the remaining
    // window functions the suite had not yet graded.
    "q112_rank_windows" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("event_id"), col("event_type"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("event_id"))
    }),

    // typed semi-structured processing: schema'd parse (from_json), path
    // extraction (get_json_object), and a construct→extract round trip
    // (to_json) — the real JSON workflow q33's regexes only approximate.
    // n_path_agree proves the typed and path APIs read the same values.
    "q117_json_extract" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("k", from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k"))
        .withColumn("k_path", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("uid_rt",
          get_json_object(to_json(struct(col("user_id"), col("event_type"))), "$.user_id")
            .cast("long"))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(when(col("k") === col("k_path"), 1L).otherwise(0L)).as("n_path_agree"),
          sum(col("uid_rt")).as("sum_uid_roundtrip"))
        .orderBy(col("event_type"))
    }),

    // F-string ops on the JSON-ish props column
    "q33_props_keys" -> ((s, dir) =>
      t(s, dir, "events")
        .select(regexp_extract(col("props"), "\"([a-z]+)\":", 1).as("key"),
          regexp_extract(col("props"), ":\\s*([0-9]+)", 1).cast("long").as("v"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
        .orderBy(col("key"))))

  private val islandsSql =
    s"""WITH x AS (
       |  SELECT user_id, ts, value,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
       |  FROM events),
       |y AS (
       |  SELECT *, CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800.0
       |            THEN 1 ELSE 0 END AS new_session FROM x),
       |z AS (
       |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |    ROWS UNBOUNDED PRECEDING) AS sid FROM y)
       |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       |  count(*) AS n_events, ${dsumSql("value")} AS sum_value
       |FROM z GROUP BY user_id, sid""".stripMargin

  val oracle: Map[String, String] = Map(
    "q131_drift_gate" ->
      """WITH ev AS (
        |  SELECT event_type, cast(floor(value / 100.0) as bigint) AS bin,
        |    CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END AS in_a
        |  FROM events),
        |cells AS (
        |  SELECT event_type, bin, cast(sum(in_a) as bigint) AS na,
        |    cast(sum(1 - in_a) as bigint) AS nb
        |  FROM ev GROUP BY 1, 2),
        |tots AS (
        |  SELECT event_type, cast(sum(na) as bigint) AS na_tot,
        |    cast(sum(nb) as bigint) AS nb_tot
        |  FROM cells GROUP BY 1),
        |j AS (
        |  SELECT c.event_type, c.na, c.nb, t.na_tot, t.nb_tot,
        |    (c.na * 10000 // greatest(t.na_tot, 1)) AS pa_bp,
        |    (c.nb * 10000 // greatest(t.nb_tot, 1)) AS pb_bp
        |  FROM cells c JOIN tots t USING (event_type))
        |SELECT event_type, max(na_tot) AS n_a, max(nb_tot) AS n_b,
        |  count(*) AS n_bins,
        |  cast(sum((pa_bp - pb_bp) * (pa_bp - pb_bp) // (pa_bp + pb_bp + 1))
        |    as bigint) AS drift_bp,
        |  cast(sum((pa_bp - pb_bp) * (pa_bp - pb_bp) // (pa_bp + pb_bp + 1))
        |    as bigint) >= 100 AS drifted
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q26_events_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS n_events, ${dsumSql("value")} AS sum_value
         |FROM events
         |GROUP BY date_trunc('hour', ts), event_type
         |ORDER BY window_start, event_type""".stripMargin,

    // interval-merge replay: running max of per-event window ends, new
    // session when the next event starts at or past every prior end
    "q183_dynamic_session" ->
      s"""WITH x AS (
         |  SELECT user_id, ts, value,
         |    ts + CASE event_type WHEN 'click' THEN INTERVAL 5 MINUTE
         |         WHEN 'view' THEN INTERVAL 15 MINUTE
         |         ELSE INTERVAL 45 MINUTE END AS e
         |  FROM events),
         |y AS (
         |  SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM x),
         |z AS (
         |  SELECT *, CASE WHEN pmax IS NULL OR ts >= pmax THEN 1 ELSE 0 END AS ns
         |  FROM y),
         |w AS (
         |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM z)
         |SELECT user_id, min(ts) AS session_start, max(e) AS session_end,
         |  count(*) AS n_events, ${dsumSql("value")} AS sum_value
         |FROM w GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,

    "q27_sessionize" -> (islandsSql + "\nORDER BY user_id, session_start"),

    "q28_session_window" -> (islandsSql + "\nORDER BY user_id, session_start"),

    "q29_user_profile" ->
      s"""SELECT user_id,
         |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
         |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
         |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
         |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
         |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
         |  count(*) AS n_total,
         |  ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q30_asof_join" ->
      """SELECT l.event_id, l.user_id, l.ts, r.ts AS asof_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q81_cdc_compact" ->
      s"""WITH r AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |    ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events)
         |SELECT event_type, count(*) AS n_keys,
         |  ${dsumSql("value")} AS latest_sum,
         |  max(ts) AS max_ts,
         |  cast(sum(event_id) as bigint) AS sum_latest_ids
         |FROM r WHERE rn = 1
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q45_pivot" -> {
      def c(t: String) =
        s"cast(sum(cast(CASE WHEN event_type = '$t' THEN value END as decimal(18,2))) as double) AS $t"
      s"""SELECT hour(ts) AS hh, ${c("click")}, ${c("view")}, ${c("purchase")},
         |  ${c("signup")}, ${c("error")}
         |FROM events GROUP BY hour(ts) ORDER BY hh""".stripMargin
    },

    "q51_unpivot" ->
      s"""SELECT hour(ts) AS hh, event_type, ${dsumSql("value")} AS sum_value
         |FROM events
         |WHERE event_type IN ('click', 'view', 'purchase', 'signup', 'error')
         |GROUP BY hour(ts), event_type
         |ORDER BY hh, event_type""".stripMargin,

    "q46_moving_avg" ->
      """SELECT event_id, user_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mavg7
        |FROM events ORDER BY event_id""".stripMargin,

    "q39_range_join" ->
      """SELECT p.event_id, p.user_id, count(c.user_id) AS n_clicks
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        |  AND epoch(c.ts) >= epoch(p.ts) - 3600.0 AND epoch(c.ts) < epoch(p.ts)
        |GROUP BY p.event_id, p.user_id
        |ORDER BY p.event_id""".stripMargin,

    "q91_snapshot_asof" ->
      """WITH r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |SELECT user_id, event_type, ts AS state_ts,
        |  event_id AS state_event_id, round(value, 4) AS state_value
        |FROM r WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q92_range_frame" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_trailing_1h,
        |  cast(sum(cast(value as decimal(18,2))) OVER w as double) AS sum_trailing_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q96_gap_fill" ->
      s"""WITH hourly AS (
         |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hh,
         |    ${dsumSql("value")} AS sum_value, count(*) AS n_events
         |  FROM events WHERE user_id < 100 GROUP BY 1, 2),
         |spans AS (SELECT user_id, min(hh) AS h0, max(hh) AS h1
         |          FROM hourly GROUP BY user_id),
         |grid AS (SELECT user_id,
         |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hh FROM spans)
         |SELECT g.user_id, g.hh,
         |  cast(coalesce(h.n_events, 0) as bigint) AS n_events,
         |  last_value(h.sum_value IGNORE NULLS) OVER (PARTITION BY g.user_id
         |    ORDER BY g.hh ROWS UNBOUNDED PRECEDING) AS filled_value
         |FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hh = h.hh
         |ORDER BY g.user_id, g.hh""".stripMargin,

    "q97_funnel" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS t_signup FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |fc AS (
        |  SELECT su.user_id, su.t_signup, min(c.ts) AS t_first_click
        |  FROM su LEFT JOIN events c ON c.user_id = su.user_id
        |    AND c.event_type = 'click' AND c.ts > su.t_signup
        |  GROUP BY 1, 2),
        |fp AS (
        |  SELECT fc.user_id, fc.t_signup, fc.t_first_click,
        |    min(p.ts) AS t_first_purchase
        |  FROM fc LEFT JOIN events p ON p.user_id = fc.user_id
        |    AND p.event_type = 'purchase' AND p.ts > fc.t_first_click
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, t_signup, t_first_click, t_first_purchase
        |FROM fp ORDER BY user_id""".stripMargin,

    "q102_time_weighted" ->
      """WITH d AS (
        |  SELECT user_id, value,
        |    (lead(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
        |       PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |     - epoch_us(CAST(ts AS TIMESTAMP))) / 1e6 AS dt_s
        |  FROM events),
        |g AS (
        |  SELECT user_id,
        |    cast(sum(cast(value * dt_s as decimal(28,6))) as double) AS sum_vdt,
        |    cast(sum(cast(dt_s as decimal(28,6))) as double) AS sum_dt
        |  FROM d WHERE dt_s IS NOT NULL GROUP BY user_id)
        |SELECT user_id, round(sum_vdt / sum_dt, 6) AS twa
        |FROM g ORDER BY user_id""".stripMargin,

    "q103_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_users
        |FROM ut a JOIN ut b ON a.user_id = b.user_id
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin,

    "q106_cohort_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT c.cohort_week,
        |    cast(datediff('day', c.cohort_week, date_trunc('week', e.ts)) / 7 as int)
        |      AS week_offset,
        |    e.user_id
        |  FROM events e JOIN cohort c USING (user_id))
        |SELECT cohort_week, week_offset, count(*) AS n_users
        |FROM act GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q107_scd_join" ->
      """WITH v AS (
        |  SELECT user_id AS v_user, ts AS valid_from, event_id AS version_id,
        |    round(value, 4) AS profile_value,
        |    lead(ts, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS valid_to
        |  FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id, v.version_id, v.profile_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN v ON p.user_id = v.v_user AND p.ts >= v.valid_from
        |  AND (v.valid_to IS NULL OR p.ts < v.valid_to)
        |ORDER BY p.event_id""".stripMargin,

    "q109_mv_cascade" ->
      s"""WITH base AS (SELECT date_trunc('day', ts) AS d, value FROM events)
         |SELECT 'day' AS level, d AS period, count(*) AS n_events,
         |  ${dsumSql("value")} AS sum_value
         |FROM base GROUP BY d
         |UNION ALL
         |SELECT 'week' AS level, date_trunc('week', d) AS period,
         |  count(*) AS n_events, ${dsumSql("value")} AS sum_value
         |FROM base GROUP BY date_trunc('week', d)
         |UNION ALL
         |SELECT 'month' AS level, date_trunc('month', d) AS period,
         |  count(*) AS n_events, ${dsumSql("value")} AS sum_value
         |FROM base GROUP BY date_trunc('month', d)
         |ORDER BY level, period""".stripMargin,

    "q127_sketch_mv" ->
      """WITH du AS (
        |  SELECT DISTINCT cast(date_trunc('day', ts) as date) AS d2, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT d2 AS day FROM du),
        |contrib AS (
        |  SELECT d2 + cast(i as int) AS day, user_id
        |  FROM du, (SELECT unnest(generate_series(0, 6)) AS i))
        |SELECT cast(c.day as timestamp) AS day,
        |  count(DISTINCT c.user_id) AS n_active_7d, true AS sketch_ok
        |FROM contrib c JOIN days dd ON dd.day = c.day
        |GROUP BY c.day ORDER BY day""".stripMargin,

    "q110_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT cast(date_trunc('day', ts) as date) AS d2, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT d2 AS day FROM du),
        |contrib AS (
        |  SELECT d2 + cast(i as int) AS day, user_id
        |  FROM du, (SELECT unnest(generate_series(0, 6)) AS i))
        |SELECT cast(c.day as timestamp) AS day,
        |  count(DISTINCT c.user_id) AS n_active_7d
        |FROM contrib c JOIN days dd ON dd.day = c.day
        |GROUP BY c.day ORDER BY day""".stripMargin,

    "q111_stats_exact" ->
      """WITH m AS (
        |  SELECT event_type,
        |    cast(count(*) as double) AS n,
        |    cast(sum(cast(value as decimal(28,6))) as double) AS sx,
        |    cast(sum(cast(cast(hour(ts) as double) as decimal(28,6))) as double) AS sy,
        |    cast(sum(cast(value * cast(hour(ts) as double) as decimal(28,6))) as double) AS sxy,
        |    cast(sum(cast(value * value as decimal(28,6))) as double) AS sxx,
        |    cast(sum(cast(cast(hour(ts) as double) * cast(hour(ts) as double)
        |      as decimal(28,6))) as double) AS syy
        |  FROM events GROUP BY event_type)
        |SELECT event_type,
        |  round(sx / n, 4) AS mean_x,
        |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_x,
        |  round((n * sxy - sx * sy)
        |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 4) AS corr_xy
        |FROM m ORDER BY event_type""".stripMargin,

    "q112_rank_windows" ->
      """SELECT event_id, event_type,
        |  cast(ntile(4) OVER w as int) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM events WHERE user_id < 50
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,

    "q117_json_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |    cast(json_extract(props, '$.k') as bigint) AS k,
        |    cast(json_extract_string(props, '$.k') as bigint) AS k_path,
        |    cast(json_extract_string(
        |      to_json(struct_pack(user_id := user_id, event_type := event_type)),
        |      '$.user_id') as bigint) AS uid_rt
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  cast(sum(k) as bigint) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k,
        |  cast(sum(CASE WHEN k = k_path THEN 1 ELSE 0 END) as bigint) AS n_path_agree,
        |  cast(sum(uid_rt) as bigint) AS sum_uid_roundtrip
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q33_props_keys" ->
      """SELECT regexp_extract(props, '"([a-z]+)":', 1) AS key,
        |  count(*) AS n,
        |  cast(sum(cast(regexp_extract(props, ':\s*([0-9]+)', 1) as bigint)) as bigint) AS sum_v
        |FROM events
        |GROUP BY regexp_extract(props, '"([a-z]+)":', 1)
        |ORDER BY key""".stripMargin)
}
