package graft.queries

import graft.operators.Ingest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QHelpers._

/**
 * Relational spine (SURVEY §2.3–§2.6): the join/filter/agg/window/sort
 * repertoire the reference exercises imperatively (Meta-Kaggle join chain
 * `kaggle.py:50-61`, anti-join ingest `crawler.py:39-50`, `$in` hydration
 * `vdb.py:114`), expressed over the TPC-H-ish testdata tables.
 *
 * Scale notes: dimension joins (region/nation/customer/supplier) are
 * broadcast; fact-side aggregations are partial-aggregated map-side before
 * the shuffle; filters and projections sit directly on the parquet scan.
 */
object RelationalQueries {

  private val profileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val queries: Map[String, Q] = Map(
    // Bloom-prefiltered join (Joins.bloomPrefilteredJoin — semi-join
    // reduction): the urgent pre-1996 order keyset (≈3% of orders) becomes
    // a bloom the lineitem scan probes BEFORE shuffling, so the join moves
    // ~selectivity+fpp of the fact table instead of all of it. False
    // positives are harmless (the exact join drops them), so the graded
    // result equals the plain relational join — the oracle never sees the
    // bloom; JoinsSpec gates the pruning itself.
    "q160_bloom_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") < "1996-01-01")
        .select(col("o_orderkey"), col("o_custkey"))
      graft.operators.Joins.bloomPrefilteredJoin(
        t(s, dir, "lineitem"), "l_orderkey", urgent, "o_orderkey",
        expectedItems = 200000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Equi-DEPTH binning (NTILE) — the feature-engineering discretizer
    // q101's fixed-width histogram can't provide when the distribution is
    // skewed: 8 buckets each holding ~1/8 of the rows, with data-driven
    // edges (min/max per bucket) and exact occupancy. One window over the
    // value order per group; at scale NTILE is a range-partitioned sort,
    // not a single-task window, because it's keyed by l_returnflag here.
    "q184_equidepth_bins" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"), col("l_orderkey"))
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
        .withColumn("bin", ntile(8).over(w).cast("long"))
        .groupBy(col("l_returnflag"), col("bin"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"), col("bin"))
    }),

    // Window-function breadth in one graded pass: percent_rank, cume_dist,
    // ntile and lag/lead deltas over the same keyed order — the remaining
    // §2.7 analytic functions not yet exercised by q92/q112/q46. Ranks are
    // emitted in integer basis points (floor ×10000) so the float window
    // outputs hash identically across engines.
    "q185_window_breadth" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("pr_bp", floor(percent_rank().over(w) * 10000).cast("long"))
        .withColumn("cd_bp", floor(cume_dist().over(w) * 10000).cast("long"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("delta_prev",
          (col("o_totalprice") - coalesce(lag(col("o_totalprice"), 1).over(w),
            col("o_totalprice"))).cast(DecimalType(18, 2)))
        .groupBy(col("o_orderpriority"), col("quartile"))
        .agg(count(lit(1)).as("n"), max(col("pr_bp")).as("max_pr_bp"),
          max(col("cd_bp")).as("max_cd_bp"),
          sum(col("delta_prev")).cast(DoubleType).as("sum_delta"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"), col("quartile"))
    }),

    // Join-key skew profiler — the pre-join diagnostic that decides whether
    // a shuffle join needs salting (q40) or AQE skew splitting: per
    // candidate key column, the share of rows held by the hottest key (in
    // basis points) and the hot/median frequency ratio. Each branch is two
    // partial-aggregated passes whose second input is |distinct keys| rows;
    // the p50 interpolation is dyadic so the ratio replays exactly.
    "q147_skew_stats" -> ((s, dir) => {
      def stats(table: String, c: String): DataFrame =
        t(s, dir, table)
          .groupBy(col(c).as("k")).agg(count(lit(1)).as("cnt"))
          .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
            max(col("cnt")).as("mx"), percentile(col("cnt"), lit(0.5)).as("med"))
          .select(lit(s"$table.$c").as("key_col"),
            col("n_rows"), col("n_keys"),
            floor(lit(10000.0) * col("mx") / col("n_rows") + 0.5).cast("long")
              .as("top_share_bp"),
            floor(lit(100.0) * col("mx") / col("med") + 0.5).cast("long")
              .as("skew_x100"))
      stats("lineitem", "l_partkey")
        .unionAll(stats("lineitem", "l_suppkey"))
        .unionAll(stats("orders", "o_custkey"))
        .unionAll(stats("events", "user_id"))
        .orderBy(col("key_col"))
    }),
    // Column-statistics profiling (the ANALYZE pass an ingest pipeline runs
    // before planning): min / max / exact NDV / null count per numeric
    // column, in ONE scan with per-column conditional aggregates — the
    // distinct counts expand the aggregate (one pass per distinct column);
    // at 100 TB the same query swaps countDistinct for
    // approx_count_distinct and loses the oracle, not the shape.
    "q82_profile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val aggs = profileCols.flatMap(c => Seq(
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")))
      li.agg(count(lit(1)).as("n_rows"), aggs: _*)
        .select(explode(array(profileCols.map(c => struct(
          lit(c).as("column_name"), col("n_rows"),
          col(s"min_$c").as("min_value"), col(s"max_$c").as("max_value"),
          col(s"ndv_$c").as("n_distinct"), col(s"nulls_$c").as("n_nulls"))): _*)).as("p"))
        .select("p.*")
        .orderBy(col("column_name"))
    }),

    // EXACT quantile profiling (the percentile companion to q82's
    // min/max/NDV — the p50/p90/p99 doc-length numbers every corpus report
    // carries): type-1 discrete quantiles via per-group rank against the
    // group size — hash-partition by source, one per-group sort window,
    // then a conditional aggregate picks the ceil(q·n)-th value. At 100 TB
    // this IS how exact per-group quantiles are computed (the group is the
    // shuffle key, the sort is within-partition); approx_percentile trades
    // the oracle away, not the plan shape.
    "q191_exact_quantiles" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("source"), col("doc_id"), length(col("text")).cast("long").as("len"))
      val ws = Window.partitionBy(col("source")).orderBy(col("len"), col("doc_id"))
      val ranked = base
        .withColumn("rn", row_number().over(ws).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      ranked.groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"),
          max(when(col("rn") === ceil(col("n") * 0.5), col("len"))).as("p50"),
          max(when(col("rn") === ceil(col("n") * 0.9), col("len"))).as("p90"),
          max(when(col("rn") === ceil(col("n") * 0.99), col("len"))).as("p99"),
          max(when(col("rn") === col("n"), col("len"))).as("p100"))
        .orderBy(col("source"))
    }),

    // Data-quality constraint validation (the expectations gate before a
    // corpus ships): PK uniqueness, FK integrity (set-oriented anti join,
    // never a driver loop), range and null checks — each check one small
    // pruned-column aggregate; the qty check genuinely FAILS on this data,
    // so both outcomes of the gate are exercised.
    "q83_dq_checks" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val pk = ord.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"))
        .select(lit("orders_pk_unique").as("check_name"), col("n_violations"))
      val nn = ord.agg(sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_violations"))
        .select(lit("orders_custkey_notnull").as("check_name"), col("n_violations"))
      val rng = li.agg(
          sum(when(col("l_quantity") > 45, 1L).otherwise(0L)).as("v1"),
          sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L).otherwise(0L)).as("v2"))
        .select(explode(array(
          struct(lit("lineitem_qty_le_45").as("check_name"), col("v1").as("n_violations")),
          struct(lit("lineitem_discount_range").as("check_name"), col("v2").as("n_violations")))).as("r"))
        .select("r.*")
      val fk = li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("lineitem_fk_orders").as("check_name"), col("n_violations"))
      pk.unionAll(nn).unionAll(rng).unionAll(fk)
        .withColumn("passed", col("n_violations") === 0L)
        .orderBy(col("check_name"))
    }),

    // Incremental aggregation maintenance (materialized-view delta merge):
    // history rows were aggregated once (the stored MV); a new batch arrives
    // and only ITS aggregate is computed and merged — cost O(groups), never
    // a history re-scan. The partials stay DECIMAL until the final cast
    // (merging doubles would reintroduce summation-order drift), and the
    // oracle is the full recompute — base ⊎ delta must equal it exactly,
    // which IS the incremental-maintenance contract.
    "q85_incremental_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def partial(df: DataFrame) = df
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("q"))
      val base = partial(li.filter(col("l_orderkey") % 7 =!= 0))
        .localCheckpoint() // the stored MV: materialized once, never re-derived
      val delta = partial(li.filter(col("l_orderkey") % 7 === 0))
      base.unionAll(delta)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("n")).as("count_order"),
          sum(col("q")).cast(DoubleType).as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Versioned-MV retention vacuum (Compaction.vacuumVersions — the
    // VACUUM / expire_snapshots verb, completing the maintenance triple
    // with compaction q128/q149 and backup q150): five incremental
    // copy-on-write refreshes land v0..v4 via q85's delta-merge algebra
    // (each version derived from the previous + one slice, never a
    // re-scan), then the vacuum keeps the newest 2 and deletes v0-v2 —
    // driver-side file metadata, zero Spark jobs, superseded data only.
    // Graded: the surviving latest version must STILL equal the full
    // recompute (the vacuum provably touched nothing live), with the
    // version census pinned by the oracle.
    "q166_mv_vacuum" -> ((s, dir) => {
      import graft.operators.Compaction
      val mv = s"${System.getProperty("java.io.tmpdir")}/graft_mv_vacuum_" +
        Integer.toHexString(dir.hashCode)
      val root = new org.apache.hadoop.fs.Path(mv)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) fs.delete(root, true) // clean slate for the fixture
      val li = t(s, dir, "lineitem")
      def partial(df: DataFrame) = df
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("q"))
      (0 to 4).foreach { k =>
        val delta = partial(li.filter(pmod(col("l_orderkey"), lit(5L)) === k))
        val merged =
          if (k == 0) delta
          else s.read.parquet(s"$mv/v${k - 1}").unionByName(delta)
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(sum(col("n")).as("n"), sum(col("q")).as("q"))
        merged.coalesce(1).write.mode("overwrite").parquet(s"$mv/v$k")
      }
      val deleted = Compaction.vacuumVersions(s, mv, keep = 2)
      require(deleted == Seq("v0", "v1", "v2"), s"q166: vacuum deleted $deleted")
      val remaining = fs.listStatus(root).filter(_.isDirectory)
        .map(_.getPath.getName).sorted.toSeq
      require(remaining == Seq("v3", "v4"), s"q166: left $remaining")
      s.read.parquet(s"$mv/v4")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("n").as("count_order"), col("q").cast(DoubleType).as("sum_qty"),
          lit(remaining.length).cast("long").as("versions_kept"),
          lit(deleted.length).cast("long").as("versions_vacuumed"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // MV maintenance under a changelog WITH updates and deletes — the
    // retract-stream algebra (Flink's retraction semantics) as a graded
    // batch query, completing q85 (insert-only deltas) and q81 (key-level
    // compaction): every change becomes signed retraction entries
    // (delete → retract; update → retract old + insert new), the delta
    // aggregates those signs, and the merge touches O(groups) — the stored
    // MV is never re-derived from history. One scan of the CHANGED rows
    // only (array+explode builds both retraction entries in one pass; no
    // per-branch rescans — the q75 lesson). Deterministic changelog:
    // event_id%10==0 deleted, else event_id%7==0 value-doubled. The oracle
    // is the full recompute over the post-change table; linear aggregates
    // (count, decimal sum) are exactly maintainable, which is the contract.
    "q88_mv_retract" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).as("v"))
        .localCheckpoint() // the stored MV: materialized once
      val retr = ev
        .filter(col("event_id") % 10 === 0 || col("event_id") % 7 === 0)
        .select(col("event_type"), explode(
          when(col("event_id") % 10 === 0,
            array(struct(lit(-1L).as("sign"), col("value").as("value"))))
            .otherwise(array(
              struct(lit(-1L).as("sign"), col("value").as("value")),
              struct(lit(1L).as("sign"), (col("value") * 2).as("value"))))).as("r"))
      val delta = retr.groupBy(col("event_type"))
        .agg(sum(col("r.sign")).as("n"),
          sum((col("r.value") * col("r.sign")).cast(DecimalType(18, 2))).as("v"))
      base.unionAll(delta)
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_events"),
          sum(col("v")).cast(DoubleType).as("sum_value"))
        .filter(col("n_events") > 0) // fully-retracted groups disappear
        .orderBy(col("event_type"))
    }),

    // A1/A5 + §2.5 — full-scan aggregation with exact decimal sums
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.3 P3/P7 — projection + predicate, pushed into the parquet scan
    "q02_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-06-01").cast(TimestampType) &&
          col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")
        .orderBy(col("l_orderkey"), col("l_partkey"), col("l_shipdate"),
          col("l_quantity"), col("l_extendedprice"))
    }),

    // J1 join chain (kaggle.py:50-61 shape): fact ⋈ broadcast dims + agg
    "q03_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // J4/K1 — set-oriented anti join (replaces per-row find_one, crawler.py:40)
    "q04_ingest_antijoin" -> ((s, dir) => {
      Ingest.newRows(t(s, dir, "customer"),
          t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .withColumnRenamed("o_custkey", "c_custkey"), "c_custkey")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // semi join (EXISTS) + group count
    "q05_semijoin_segments" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // TK2 idiom — per-group top-k via ranking window
    "q06_topk_per_customer" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
        .orderBy(col("o_custkey"), col("rank"))
    }),

    // A4 distinct
    "q07_distinct_segments" -> ((s, dir) =>
      t(s, dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")),

    // J2 — row-wise COALESCE after an outer join (kaggle.py:64-71 resolve_owner)
    "q08_owner_coalesce" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(broadcast(c),
          o("o_custkey") === c("c_custkey") && c("c_acctbal") > 5000, "left")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("c_name"), lit("UNKNOWN")).as("owner"),
          coalesce(col("n_name"), lit("NONE")).as("nation_name"))
        .orderBy(col("o_orderkey"))
    }),

    // beyond-reference corpus stats: rollup
    "q09_rollup_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // beyond-reference corpus stats: cube
    "q10_cube_lineitem" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // arbitrary GROUPING SETS (beyond rollup/cube's fixed lattices): the
    // exact set list an OLAP report asks for, in ONE shuffle — Catalyst
    // expands the sets map-side (Expand node) so each input row fans out
    // only to the sets it belongs to, then one partial-aggregated exchange.
    // grouping_id disambiguates a NULL data value from a NULL group slot.
    "q90_grouping_sets" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .select(col("gid"), col("o_orderstatus"), col("o_orderpriority"),
          col("n_orders"), col("total_price"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // Anti-entropy table diff (replica reconciliation / migration
    // validation): a deterministic replica drifts from orders by planted
    // deletions (%101), value edits (%97, precedence below deletion) and
    // inserts (%103, shifted keys) — the diff operator (one full-outer
    // join, Joins.tableDiff) must report exactly that drift and nothing
    // else. The oracle derives the same drift set arithmetically.
    "q98_table_diff" -> ((s, dir) => {
      import graft.operators.Joins
      val base = t(s, dir, "orders")
      val replica = base.filter(col("o_orderkey") % 101 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1.5)
            .otherwise(col("o_totalprice")))
        .unionByName(base.filter(col("o_orderkey") % 103 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
      Joins.tableDiff(base, replica, "o_orderkey",
          Seq("o_totalprice", "o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // MERGE INTO (upsert) semantics as one full-outer join: a disjoint
    // change set (D deletes %101; U price updates %97 minus the deletes;
    // I inserts on shifted keys %103) applied in a single co-partitioned
    // pass — the copy-on-write merge every log-structured table executes;
    // never a per-row driver loop. Result summarized per status so the
    // graded output stays small while every merged price participates.
    "q99_merge_upsert" -> ((s, dir) => {
      val target = t(s, dir, "orders")
      val del = target.filter(col("o_orderkey") % 101 === 0)
        .select(col("o_orderkey"), lit("D").as("op"),
          lit(null).cast("double").as("new_price"),
          lit(null).cast("string").as("new_status"))
      val upd = target.filter(col("o_orderkey") % 97 === 0 && col("o_orderkey") % 101 =!= 0)
        .select(col("o_orderkey"), lit("U").as("op"),
          (col("o_totalprice") + 10.0).as("new_price"),
          lit(null).cast("string").as("new_status"))
      val ins = target.filter(col("o_orderkey") % 103 === 0)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"), lit("I").as("op"),
          col("o_totalprice").as("new_price"), col("o_orderstatus").as("new_status"))
      target.join(del.unionByName(upd).unionByName(ins), Seq("o_orderkey"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(
          coalesce(col("o_orderstatus"), col("new_status")).as("o_orderstatus"),
          when(col("op").isin("U", "I"), col("new_price"))
            .otherwise(col("o_totalprice")).as("price"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("price")).as("total_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // Equi-width histogram (the profiling companion to q82's min/max/NDV):
    // explicit floor-division binning — one partial-aggregated exchange over
    // however many rows, output bounded by the bucket count. The same
    // spelling an engine uses to build zone-map / CLI histogram stats.
    "q101_histogram" -> ((s, dir) => {
      val width = 20000.0
      t(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / width).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .withColumn("bucket_lo", (col("bucket") * width).cast("double"))
        .select(col("bucket"), col("bucket_lo"), col("n_orders"), col("sum_price"))
        .orderBy(col("bucket"))
    }),

    // Global-share computation: each nation's revenue as a fraction of the
    // world total — the scalar-subquery shape, spelled as an empty-frame
    // window so the total rides the same (small, post-aggregation) exchange
    // instead of a second scan of the fact table.
    "q113_revenue_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val ord = t(s, dir, "orders")
      val byNation = li
        .join(ord.select("o_orderkey", "o_custkey"),
          li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust.select("c_custkey", "c_nationkey")),
          ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat.select("n_nationkey", "n_name")),
          cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice")).as("revenue"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      byNation
        .withColumn("total",
          sum(col("revenue").cast("decimal(28,2)")).over(w).cast("double"))
        .select(col("n_name"), col("revenue"),
          round(col("revenue") / col("total") * 100.0, 4).as("share_pct"))
        .orderBy(col("n_name"))
    }),

    // IQR outlier gate (the statistical data-quality extension of q83):
    // quartiles per group from exact interpolated percentiles, rows outside
    // 1.5×IQR flagged — two passes (bounds, then a broadcast-joined filter),
    // which at 100 TB is one stats scan plus one gated scan.
    "q114_iqr_outliers" -> ((s, dir) => {
      // the synthetic prices are uniform (no natural outliers at any SF),
      // so plant deterministic ones: every 500th order reappears at 20×
      // its price on a shifted key — tens of true outliers per status
      val base = t(s, dir, "orders")
      val ord = base.unionByName(base.filter(col("o_orderkey") % 500 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("o_totalprice", col("o_totalprice") * 20.0))
      val bounds = ord.groupBy(col("o_orderstatus"))
        .agg(percentile(col("o_totalprice"), lit(0.25)).as("q1"),
          percentile(col("o_totalprice"), lit(0.75)).as("q3"))
        // bounds rounded at 6 decimals on BOTH sides: a raw interpolated
        // bound can differ cross-engine in its last bit, and a price within
        // that ulp would flip the filter — rounding pins the gate exactly
        .select(col("o_orderstatus"),
          round(col("q1") - (col("q3") - col("q1")) * 1.5, 6).as("lo"),
          round(col("q3") + (col("q3") - col("q1")) * 1.5, 6).as("hi"))
      ord.join(broadcast(bounds), "o_orderstatus")
        .filter(col("o_totalprice") < col("lo") || col("o_totalprice") > col("hi"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_outliers"),
          dsum(col("o_totalprice")).as("outlier_price_sum"))
        .orderBy(col("o_orderstatus"))
    }),

    // set operators: INTERSECT / EXCEPT (distinct semantics both engines)
    "q47_setops" -> ((s, dir) => {
      val withOrders = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val positive = t(s, dir, "customer")
        .filter(col("c_acctbal") > 0).select(col("c_custkey").as("custkey"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      positive.intersect(withOrders).except(urgent).orderBy(col("custkey"))
    }),

    // skew-safe salted join: row-identical to the plain equi-join (the
    // oracle proves it), but the hot key's rows spread over `salts` reducers
    "q40_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "okey")
      val o = t(s, dir, "orders").withColumnRenamed("o_orderkey", "okey")
      graft.operators.Joins.saltedJoin(li, o, "okey", salts = 4)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }))

  val oracle: Map[String, String] = Map(
    "q191_exact_quantiles" ->
      """WITH r AS (
        |  SELECT source, cast(length(text) as bigint) AS len,
        |    cast(row_number() OVER (PARTITION BY source
        |      ORDER BY length(text), doc_id) as bigint) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source, max(n) AS n_docs,
        |  max(CASE WHEN rn = ceil(n * 0.5) THEN len END) AS p50,
        |  max(CASE WHEN rn = ceil(n * 0.9) THEN len END) AS p90,
        |  max(CASE WHEN rn = ceil(n * 0.99) THEN len END) AS p99,
        |  max(CASE WHEN rn = n THEN len END) AS p100
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q184_equidepth_bins" ->
      s"""WITH r AS (
         |  SELECT l_returnflag, l_orderkey, l_extendedprice,
         |    ntile(8) OVER (PARTITION BY l_returnflag
         |      ORDER BY l_extendedprice, l_orderkey) AS bin
         |  FROM lineitem)
         |SELECT l_returnflag, cast(bin as bigint) AS bin, count(*) AS n_rows,
         |  min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
         |  ${dsumSql("l_extendedprice")} AS sum_price
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q185_window_breadth" ->
      s"""WITH f AS (
         |  SELECT o_orderpriority, o_orderkey, o_totalprice
         |  FROM orders WHERE o_orderkey % 13 = 0),
         |r AS (
         |  SELECT *,
         |    cast(floor(percent_rank() OVER w * 10000) as bigint) AS pr_bp,
         |    cast(floor(cume_dist() OVER w * 10000) as bigint) AS cd_bp,
         |    cast(ntile(4) OVER w as bigint) AS quartile,
         |    cast(o_totalprice - coalesce(lag(o_totalprice, 1) OVER w, o_totalprice)
         |      as decimal(18,2)) AS dp
         |  FROM f
         |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey))
         |SELECT o_orderpriority, quartile, count(*) AS n, max(pr_bp) AS max_pr_bp,
         |  max(cd_bp) AS max_cd_bp, cast(sum(dp) as double) AS sum_delta,
         |  ${dsumSql("o_totalprice")} AS sum_price
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the latest surviving version must equal the full recompute; the
    // version census is pinned (2 kept, 3 vacuumed)
    "q166_mv_vacuum" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS count_order,
        |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
        |  cast(2 as bigint) AS versions_kept,
        |  cast(3 as bigint) AS versions_vacuumed
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the bloom is physical-only: the oracle is the plain equi-join
    "q160_bloom_join" ->
      s"""SELECT l_returnflag, count(*) AS n_items,
         |  count(DISTINCT o_orderkey) AS n_orders,
         |  ${dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT' AND o_orderdate < DATE '1996-01-01'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q147_skew_stats" -> {
      def s(table: String, c: String) =
        s"""SELECT '$table.$c' AS key_col,
           |  cast(sum(cnt) as bigint) AS n_rows, cast(count(*) as bigint) AS n_keys,
           |  cast(floor(10000.0 * max(cnt) / sum(cnt) + 0.5) as bigint) AS top_share_bp,
           |  cast(floor(100.0 * max(cnt)
           |    / (percentile_cont(0.5) WITHIN GROUP (ORDER BY cnt)) + 0.5) as bigint)
           |    AS skew_x100
           |FROM (SELECT $c, count(*) AS cnt FROM $table GROUP BY $c)""".stripMargin
      s"""${s("lineitem", "l_partkey")}
         |UNION ALL
         |${s("lineitem", "l_suppkey")}
         |UNION ALL
         |${s("orders", "o_custkey")}
         |UNION ALL
         |${s("events", "user_id")}
         |ORDER BY key_col""".stripMargin
    },
    // the full recompute — what the base ⊎ delta merge must reproduce
    "q85_incremental_agg" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS count_order,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // full recompute over the post-change table: deletes gone, updates
    // applied — the maintained MV must be indistinguishable from it
    "q88_mv_retract" ->
      s"""SELECT event_type, count(*) AS n_events, ${dsumSql("value")} AS sum_value
         |FROM (
         |  SELECT event_type,
         |    CASE WHEN event_id % 7 = 0 THEN value * 2 ELSE value END AS value
         |  FROM events WHERE event_id % 10 <> 0)
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin,

    "q82_profile" -> profileCols.map(c =>
      s"""SELECT '$c' AS column_name,
         |  (SELECT count(*) FROM lineitem) AS n_rows,
         |  min($c) AS min_value, max($c) AS max_value,
         |  count(DISTINCT $c) AS n_distinct,
         |  cast(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) as bigint) AS n_nulls
         |FROM lineitem""".stripMargin).mkString("", "\nUNION ALL\n",
      "\nORDER BY column_name"),

    "q83_dq_checks" ->
      """WITH checks AS (
        |  SELECT 'orders_pk_unique' AS check_name,
        |    count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
        |  UNION ALL
        |  SELECT 'orders_custkey_notnull',
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_qty_le_45',
        |    sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_discount_range',
        |    sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_fk_orders', count(*) FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |SELECT check_name, cast(n_violations as bigint) AS n_violations,
        |  n_violations = 0 AS passed
        |FROM checks ORDER BY check_name""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00' AND l_quantity > 45
        |ORDER BY l_orderkey, l_partkey, l_shipdate, l_quantity, l_extendedprice""".stripMargin,

    "q03_revenue_by_nation" ->
      s"""SELECT r_name, n_name,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin,

    "q04_ingest_antijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q05_semijoin_segments" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q06_topk_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  cast(row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey ASC) as int) AS rank
        |FROM orders
        |QUALIFY rank <= 3
        |ORDER BY o_custkey, rank""".stripMargin,

    "q07_distinct_segments" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q08_owner_coalesce" ->
      """SELECT o_orderkey,
        |  coalesce(c_name, 'UNKNOWN') AS owner,
        |  coalesce(n_name, 'NONE') AS nation_name
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey AND c_acctbal > 5000
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY o_orderkey""".stripMargin,

    "q09_rollup_orders" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  count(*) AS n_orders, ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q10_cube_lineitem" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  count(*) AS n_items, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q90_grouping_sets" ->
      s"""SELECT cast(grouping(o_orderstatus, o_orderpriority) as int) AS gid,
         |  o_orderstatus, o_orderpriority,
         |  count(*) AS n_orders, ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
         |  (o_orderstatus), (o_orderpriority), ())
         |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q98_table_diff" ->
      """SELECT o_orderkey, status FROM (
        |  SELECT o_orderkey, 'missing_right' AS status
        |  FROM orders WHERE o_orderkey % 101 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'mismatch' AS status
        |  FROM orders WHERE o_orderkey % 101 <> 0 AND o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS o_orderkey, 'missing_left' AS status
        |  FROM orders WHERE o_orderkey % 103 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    "q99_merge_upsert" ->
      s"""WITH merged AS (
         |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 10.0
         |              ELSE o_totalprice END AS price,
         |    o_orderstatus
         |  FROM orders WHERE o_orderkey % 101 <> 0
         |  UNION ALL
         |  SELECT o_totalprice AS price, o_orderstatus
         |  FROM orders WHERE o_orderkey % 103 = 0)
         |SELECT o_orderstatus, count(*) AS n_orders,
         |  ${dsumSql("price")} AS total_price
         |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q101_histogram" ->
      s"""SELECT cast(floor(o_totalprice / 20000.0) as int) AS bucket,
         |  cast(floor(o_totalprice / 20000.0) as int) * 20000.0 AS bucket_lo,
         |  count(*) AS n_orders, ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY 1, 2 ORDER BY bucket""".stripMargin,

    "q113_revenue_share" ->
      s"""WITH bn AS (
         |  SELECT n_name, ${dsumSql("l_extendedprice")} AS revenue
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY n_name),
         |t AS (SELECT cast(sum(cast(revenue as decimal(28,2))) as double) AS total FROM bn)
         |SELECT n_name, revenue, round(revenue / total * 100.0, 4) AS share_pct
         |FROM bn, t ORDER BY n_name""".stripMargin,

    "q114_iqr_outliers" ->
      s"""WITH ord AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice * 20.0 AS o_totalprice
         |  FROM orders WHERE o_orderkey % 500 = 0),
         |b AS (
         |  SELECT o_orderstatus,
         |    quantile_cont(o_totalprice, 0.25) AS q1,
         |    quantile_cont(o_totalprice, 0.75) AS q3
         |  FROM ord GROUP BY o_orderstatus),
         |bb AS (SELECT o_orderstatus,
         |  round(q1 - (q3 - q1) * 1.5, 6) AS lo,
         |  round(q3 + (q3 - q1) * 1.5, 6) AS hi FROM b)
         |SELECT o.o_orderstatus, count(*) AS n_outliers,
         |  ${dsumSql("o_totalprice")} AS outlier_price_sum
         |FROM ord o JOIN bb USING (o_orderstatus)
         |WHERE o.o_totalprice < bb.lo OR o.o_totalprice > bb.hi
         |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin,

    "q47_setops" ->
      """SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
        |  INTERSECT
        |  SELECT o_custkey AS custkey FROM orders)
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,

    "q40_salted_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin)
}
