package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Relational, Stats}

/** Scans, filters, joins, aggregations, set ops — SURVEY.md §2.1–2.4, §2.7.
  * Each query name carries the SURVEY operator id it certifies.
  */
object CoreQueries {

  def qs: Seq[Q] = Seq(

    // S1/P1/P2 — scan with projection + pushed filter.
    Q("s1_scan_project",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // A1-style pricing summary (TPC-H Q1 shape): grouped multi-aggregate.
    Q("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  COUNT(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // P3 — conjunctive multi-predicate filter incl. endswith
    // (reference: cosmo/monitors/acq_monitors.py:214–223).
    Q("p3_conjunctive_filter",
      """SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_returnflag = 'A' AND l_quantity BETWEEN 10 AND 30
        |  AND l_extendedprice < 20000 AND l_linestatus LIKE '%F'""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "A"
          && col("l_quantity").between(10, 30)
          && col("l_extendedprice") < 20000
          && col("l_linestatus").endsWith("F"))
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
    },

    // P5/P7 — sentinel filter + null handling
    // (reference: cosmo/filesystem.py:249–253; aper_shift_monitors.py:71–74).
    Q("p5_sentinel_nulls",
      """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_v
        |FROM events WHERE value < 1e30 AND value > 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("v", when(col("value") < 1e30 && col("value") > 0, col("value")))
        .na.drop(Seq("v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("v"), 2).as("sum_v"))
        .orderBy("event_type")
    },

    // P8 — dedup / distinct (reference: aper_shift_monitors.py:65).
    Q("p8_distinct",
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    },

    // P9/U2 — anti-join (incremental "not yet ingested" discovery,
    // reference: cosmo/data_models.py:62–77).
    Q("p9_anti_join",
      """SELECT COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem l WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
    },

    // P10 — semi-join (reference: osm_shift_monitors.py:50–52 match_dfs).
    Q("p10_semi_join",
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 100000)
        .withColumnRenamed("o_custkey", "c_custkey")
      Relational.semiJoin(c, o, "c_custkey")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // P11 — IN-list predicate (reference: cosmo/data_models.py:157–165).
    Q("p11_in_list",
      """SELECT c_nationkey, COUNT(*) AS n FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    },

    // P12 — date-range slice (reference: dark_monitors.py:123).
    Q("p12_date_range",
      """SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders WHERE o_orderdate
        |  BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .filter(col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
    },

    // P13/W9 — recency window vs dataset max
    // (reference: acq_monitors.py:94–99).
    Q("p13_recency",
      """SELECT event_type, COUNT(*) AS n FROM events
        |WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Relational.recentWindow(Tables(s, dir, "events"), "ts", 7)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // P14 — breakpoint/interval containment join
    // (reference: acq_monitors.py:347–361).
    Q("p14_interval_join",
      """SELECT w.window_id, COUNT(*) AS n, ROUND(SUM(e.value), 2) AS sum_v
        |FROM events e JOIN (VALUES
        |  (1, TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08'),
        |  (2, TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-15'),
        |  (3, TIMESTAMP '2024-01-15', TIMESTAMP '2024-01-22'),
        |  (4, TIMESTAMP '2024-01-22', TIMESTAMP '2024-02-01')) AS w(window_id, lo, hi)
        |ON e.ts >= w.lo AND e.ts < w.hi
        |GROUP BY w.window_id ORDER BY w.window_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dims = Seq(
        (1, "2024-01-01", "2024-01-08"), (2, "2024-01-08", "2024-01-15"),
        (3, "2024-01-15", "2024-01-22"), (4, "2024-01-22", "2024-02-01"))
        .toDF("window_id", "lo_s", "hi_s")
        .select(col("window_id"),
          to_timestamp(col("lo_s")).as("lo"), to_timestamp(col("hi_s")).as("hi"))
      Relational.intervalJoin(Tables(s, dir, "events"), dims, col("ts"), "lo", "hi")
        .groupBy("window_id")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
        .orderBy("window_id")
    },

    // J1 — fact ⋈ small dim, explicitly broadcast
    // (reference: monitor_helpers.py:147–159).
    Q("j1_broadcast_join",
      """SELECT p.p_brand, COUNT(*) AS n,
        |  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("p_brand")
    },

    // J2 — derived-key equi join (reference: data_models.py:157–180,
    // `sms.ROOTNAME + 'q' == data.ROOTNAME`).
    Q("j2_derived_key_join",
      """SELECT c.c_mktsegment, COUNT(*) AS n, ROUND(SUM(e.value), 2) AS sum_v
        |FROM events e JOIN customer c
        |  ON 'u' || CAST(e.user_id AS VARCHAR) = 'u' || CAST(c.c_custkey AS VARCHAR)
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin) { (s, dir) =>
      Relational.derivedKeyJoin(
        Tables(s, dir, "events"), Tables(s, dir, "customer"),
        concat(lit("u"), col("user_id")), concat(lit("u"), col("c_custkey")))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
        .orderBy("c_mktsegment")
    },

    // J5 — left join with coalesced defaults (reference: filesystem.py:228–247).
    Q("j5_left_coalesce",
      """SELECT COALESCE(c.c_mktsegment, 'N/A') AS seg, COUNT(*) AS n
        |FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
        |  ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer").filter(col("c_acctbal") > 0),
          col("o_custkey") === col("c_custkey"), "left")
        .select(coalesce(col("c_mktsegment"), lit("N/A")).as("seg"))
        .groupBy("seg").agg(count(lit(1)).as("n"))
        .orderBy("seg")
    },

    // J6/J7 — segment-pair diff via pivot (reference:
    // osm_shift_monitors.py:55–86 compute_segment_diff).
    Q("j6_segment_diff",
      """SELECT l_orderkey,
        |  ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END)
        |      - SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) + 0 AS seg_diff
        |FROM lineitem GROUP BY l_orderkey
        |HAVING SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) IS NOT NULL
        |   AND SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) IS NOT NULL
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      // one keyed repartition feeds BOTH aggregations exchange-free:
      // HashPartitioning(l_orderkey) satisfies the (l_orderkey,
      // l_returnflag) clustering, so the per-segment agg and the pivot
      // reuse it (2 exchanges total instead of 3, and the first agg no
      // longer runs on the scan's single split)
      val perSeg = Tables(s, dir, "lineitem")
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey", "l_returnflag")
        .agg(sum("l_quantity").as("q"))
      Relational.segmentDiff(perSeg, Seq("l_orderkey"), "l_returnflag", "q", "A", "R")
        // + lit(0): A−R is a difference of float partial sums — equal
        // segments can land ±ε and round to a signed zero (flake class).
        .select(col("l_orderkey"),
          (round(col("seg_diff"), 2) + lit(0)).as("seg_diff"))
        .orderBy("l_orderkey")
    },

    // J10/O4 — nearest row by absolute distance (reference:
    // telemetry_monitors.py:172–176).
    Q("j10_nearest_lookup",
      """SELECT event_id, event_type,
        |  ABS(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-15 12:00:00')) AS d
        |FROM events ORDER BY d, event_id LIMIT 1""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("d", abs(unix_micros(col("ts"))
          - unix_micros(lit("2024-01-15 12:00:00").cast("timestamp"))))
        .orderBy(col("d"), col("event_id"))
        .select("event_id", "event_type", "d")
        .limit(1)
    },

    // J11/W8 — as-of (step-function) lookup (reference:
    // telemetry_monitors.py:428–457). DuckDB oracle uses native ASOF JOIN.
    Q("j11_asof_lookup",
      """SELECT p.event_id, p.user_id, q.value AS last_view_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') q
        |  ON p.user_id = q.user_id AND p.ts >= q.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val probes = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val quotes = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value")
      Relational.asOfLookup(probes, quotes, Seq("user_id"), "ts", "value", "last_view_value")
        .select("event_id", "user_id", "last_view_value")
        .orderBy("event_id")
    },

    // J11 again through the CUSTOM physical operator (AsOfJoinPlan →
    // AsOfJoinStrategy → AsOfJoinExec, SparkSessionExtensions-injected):
    // one hash exchange + one sort per side, then a linear per-partition
    // merge — vs the union+window formulation's combined sort over both
    // streams. Same DuckDB ASOF JOIN oracle proves the operator
    // end-to-end.
    Q("j11_asof_native",
      """SELECT p.event_id, p.user_id, q.value AS last_view_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') q
        |  ON p.user_id = q.user_id AND p.ts >= q.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val probes = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val quotes = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value")
      org.apache.spark.sql.graft.AsOfJoinApi
        .asOf(probes, quotes, Seq("user_id"), "ts", "value", "last_view_value")
        .select("event_id", "user_id", "last_view_value")
        .orderBy("event_id")
    },

    // J11 multi-value: several quote columns through ONE merge (one
    // shuffle+sort per side regardless of width — the alternative is a
    // whole as-of join per column). Same ASOF oracle, two outputs.
    Q("j11_asof_multi",
      """SELECT p.event_id, q.value AS last_view_value,
        |  q.event_id AS last_view_event
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'view') q
        |  ON p.user_id = q.user_id AND p.ts >= q.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val probes = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val quotes = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_event"), col("user_id"),
          col("ts"), col("value"))
      org.apache.spark.sql.graft.AsOfJoinApi
        .asOfMulti(probes, quotes, Seq("user_id"), "ts",
          Seq("value", "view_event"),
          Seq("last_view_value", "last_view_event"))
        .select("event_id", "last_view_value", "last_view_event")
        .orderBy("event_id")
    },

    // J11 GLOBAL (unkeyed) as-of through the custom operator's
    // range-partitioned path: one step function over ALL quotes, range
    // partitioning by time shared across both sides + cross-partition
    // seed hand-off — no single-task window. Quotes deduped to max(value)
    // per instant first (as-of at a duplicate instant is order-dependent
    // in every formulation, DuckDB's included). Keyless ASOF JOIN oracle.
    Q("j11_asof_global",
      """WITH q AS (SELECT ts, MAX(value) AS v FROM events
        |  WHERE event_type = 'click' GROUP BY ts)
        |SELECT p.event_id, q.v AS last_click_value
        |FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN q ON p.ts >= q.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val probes = ev.filter(col("event_type") === "purchase")
        .select("event_id", "ts")
      val quotes = ev.filter(col("event_type") === "click")
        .groupBy("ts").agg(max("value").as("v"))
      org.apache.spark.sql.graft.AsOfJoinApi
        .asOf(probes, quotes, Seq.empty, "ts", "v", "last_click_value")
        .select("event_id", "last_click_value")
        .orderBy("event_id")
    },

    // A1 — grouped describe() (reference: acq_monitors.py:68).
    Q("a1_describe",
      """SELECT l_returnflag, COUNT(l_quantity) AS n,
        |  ROUND(AVG(l_quantity), 4) AS mean, ROUND(STDDEV_SAMP(l_quantity), 4) AS std,
        |  MIN(l_quantity) AS vmin,
        |  ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25,
        |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS median,
        |  ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75,
        |  MAX(l_quantity) AS vmax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Stats.describeBy(Tables(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity")
        .select(col("l_returnflag"), col("n"),
          round(col("mean"), 4).as("mean"), round(col("std"), 4).as("std"),
          col("min").as("vmin"),
          round(col("q25"), 4).as("q25"), round(col("median"), 4).as("median"),
          round(col("q75"), 4).as("q75"),
          col("max").as("vmax"))
        .orderBy("l_returnflag")
    },

    // A3/S9 — keep-latest-version per key (reference: ingest_sms.py:274–280).
    Q("a3_latest_version",
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      Relational.latestByKey(Tables(s, dir, "orders"),
        Seq("o_custkey"), Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
        .orderBy("o_custkey")
    },

    // A4 — global min/max/mean (reference: osm_drift_monitors.py:85–86).
    Q("a4_global_minmax",
      """SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price, COUNT(*) AS n
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem").agg(
        min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"), count(lit(1)).as("n"))
    },

    // A5 — central-band quantiles (reference: telemetry_monitors.py:165–170).
    // Interpolated quantiles rounded to 2 decimals: Spark `percentile` and
    // DuckDB `quantile_cont` agree only to ~8 significant digits (FP
    // interpolation), so 4-decimal rounding can flip on large magnitudes.
    Q("a5_quantiles",
      """SELECT ROUND(quantile_cont(l_extendedprice, 0.005), 2) AS q005,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS q50,
        |  ROUND(quantile_cont(l_extendedprice, 0.995), 2) AS q995
        |FROM lineitem""".stripMargin) { (s, dir) =>
      // ONE percentile aggregate with an array of percentages: three
      // separate percentile(...) calls each buffer the full column
      // (value->count map) and sort it — 3× the memory and wall for
      // identical values (same exact-interpolation algorithm).
      Tables(s, dir, "lineitem")
        .agg(expr("percentile(l_extendedprice, array(0.005D, 0.5D, 0.995D))")
          .as("qs"))
        .select(round(element_at(col("qs"), 1), 2).as("q005"),
          round(element_at(col("qs"), 2), 2).as("q50"),
          round(element_at(col("qs"), 3), 2).as("q995"))
    },

    // A5 serving twin (judge r15 task 4): `a5_quantiles`' exact
    // `percentile` is the right oracle plan but buffers a value→count
    // map per partition — unbounded on high-cardinality doubles, so the
    // 100 TB serving answer is `approx_percentile` (GK sketch: bounded
    // state, map-side combinable, rank error ≤ n/accuracy). A sketch
    // value cannot hash-match a DuckDB re-derivation (different sketch,
    // different collapse order), so the oracled contract is the
    // GUARANTEE, not the sketch internals: for each percentile the plan
    // re-derives the approx value's EXACT rank window (count(< q),
    // count(≤ q) — one extra map-side pass with the 3 values broadcast)
    // and emits whether the window intersects [p·n − n/acc − 1,
    // p·n + n/acc + 1]. The oracle pins (pct, n, in_bound=true): a
    // broken sketch fails the hash-compare through the bound flag while
    // the approximate values themselves stay free to differ.
    Q("a5_quantiles_approx",
      """SELECT CAST(pct AS DOUBLE) AS pct,
        |  (SELECT COUNT(*) FROM lineitem)::BIGINT AS n, true AS in_bound
        |FROM (VALUES (0.005), (0.5), (0.995)) v(pct)
        |ORDER BY pct""".stripMargin) { (s, dir) =>
      val acc = 10000 // rank error guarantee: |rank(q) - p*n| <= n/acc
      val x = Tables(s, dir, "lineitem").select(col("l_extendedprice").as("x"))
      val sk = x.agg(
        expr(s"approx_percentile(x, array(0.005D, 0.5D, 0.995D), $acc)")
          .as("qs"),
        count(lit(1)).as("n"))
      val pcts = broadcast(sk.select(col("n"),
        posexplode(col("qs")).as(Seq("i", "q")))
        .select(element_at(array(lit(0.005), lit(0.5), lit(0.995)),
          col("i") + 1).as("pct"), col("q"), col("n")))
      // cross-bound: pcts is the broadcast 3-row (pct, q, n) table
      x.crossJoin(pcts)
        .groupBy("pct", "n", "q")
        .agg(sum(when(col("x") < col("q"), 1L).otherwise(0L)).as("lt"),
          sum(when(col("x") <= col("q"), 1L).otherwise(0L)).as("le"))
        .select(col("pct"), col("n"),
          // the rank window [lt+1, le] must intersect the guaranteed
          // band around p·n (±n/acc, ±1 for ceil ties)
          (col("lt") + 1 <= col("pct") * col("n") + col("n") / acc + 1 &&
            col("le") >= col("pct") * col("n") - col("n") / acc - 1)
            .as("in_bound"))
        .orderBy("pct")
    },

    // A6 — fixed-bin histogram (reference: dark_monitors.py:402).
    Q("a6_histogram",
      """SELECT CAST(LEAST(FLOOR(l_extendedprice / 5000), 21) AS INT) AS bucket,
        |  COUNT(*) AS n
        |FROM lineitem WHERE l_extendedprice BETWEEN 0 AND 110000
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Stats.histogram(Tables(s, dir, "lineitem"), "l_extendedprice", 0, 110000, 22)
        .orderBy("bucket")
    },

    // A7 — CDF thresholds from histogram (reference: dark_monitors.py:402–418).
    Q("a7_cdf_thresholds",
      """WITH h AS (
        |  SELECT CAST(LEAST(FLOOR(l_extendedprice / 5000), 21) AS INT) AS bucket,
        |    COUNT(*) AS n
        |  FROM lineitem WHERE l_extendedprice BETWEEN 0 AND 110000 GROUP BY 1),
        |c AS (SELECT bucket,
        |        SUM(n) OVER (ORDER BY bucket) * 1.0 / SUM(n) OVER () AS cdf FROM h)
        |SELECT q.quantile, MIN(c.bucket) AS bucket
        |FROM c, (VALUES (0.5), (0.95), (0.99)) q(quantile)
        |WHERE c.cdf >= q.quantile GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val h = Stats.histogram(Tables(s, dir, "lineitem"), "l_extendedprice", 0, 110000, 22)
      Stats.cdfThresholds(h, Seq(0.5, 0.95, 0.99)).orderBy("quantile")
    },

    // A8 — mean/median/σ bundle (reference: dark_monitors.py:409–418).
    Q("a8_stats_bundle",
      """SELECT ROUND(AVG(value), 4) AS mean,
        |  ROUND(quantile_cont(value, 0.5), 4) AS median,
        |  ROUND(STDDEV_SAMP(value), 4) AS std
        |FROM events""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events").agg(
        round(avg("value"), 4).as("mean"),
        round(expr("percentile(value, 0.5)"), 4).as("median"),
        round(stddev_samp(col("value")), 4).as("std"))
    },

    // A11 — per-group linear fit, closed-form OLS
    // (reference: monitor_helpers.py:28–32 np.polyfit deg 1).
    Q("a11_linfit",
      """SELECT event_type, COUNT(*) AS n,
        |  ROUND(regr_slope(value, epoch_us(ts - TIMESTAMP '2024-01-01') / 1e6 / 86400), 6) + 0 AS slope,
        |  ROUND(regr_intercept(value, epoch_us(ts - TIMESTAMP '2024-01-01') / 1e6 / 86400), 4) + 0 AS intercept
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events").withColumn("xdays",
        (unix_micros(col("ts")) - unix_micros(lit("2024-01-01").cast("timestamp")))
          / lit(1e6) / lit(86400))
      Stats.linFit(ev, Seq("event_type"), "xdays", "value")
        .select(col("event_type"), col("n"),
          // + lit(0): regr_slope/intercept are float sums of signed terms;
          // a near-flat group can round to -0.0 under one summation order
          // and +0.0 under another (the t_heaps_law flake class).
          (round(col("slope"), 6) + lit(0)).as("slope"),
          (round(col("intercept"), 4) + lit(0)).as("intercept"))
        .orderBy("event_type")
    },

    // X4 — global-sigma outliers (reference: osm_shift_monitors.py:634–638).
    Q("x4_global_sigma_outliers",
      """SELECT event_id, value FROM events
        |WHERE ABS(value - (SELECT AVG(value) FROM events))
        |    > 2 * (SELECT STDDEV_SAMP(value) FROM events)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Relational.globalSigmaOutliers(Tables(s, dir, "events"), "value", 2.0)
        .select("event_id", "value")
        .orderBy("event_id")
    },

    // U1 — union-by-name with missing columns (reference:
    // monitor_helpers.py:119–143 concat(sort=True)).
    Q("u1_union_by_name",
      """SELECT src, COUNT(*) AS n, ROUND(SUM(v), 2) AS sum_v, COUNT(event_type) AS n_et
        |FROM (
        |  SELECT o_orderkey AS k, o_totalprice AS v, 'orders' AS src,
        |         CAST(NULL AS VARCHAR) AS event_type FROM orders
        |  UNION ALL
        |  SELECT event_id, value, 'events', event_type FROM events)
        |GROUP BY src ORDER BY src""".stripMargin) { (s, dir) =>
      val a = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_totalprice").as("v"), lit("orders").as("src"))
      val b = Tables(s, dir, "events").select(
        col("event_id").as("k"), col("value").as("v"), lit("events").as("src"),
        col("event_type"))
      a.unionByName(b, allowMissingColumns = true)
        .groupBy("src")
        .agg(count(lit(1)).as("n"), round(sum("v"), 2).as("sum_v"),
          count(col("event_type")).as("n_et"))
        .orderBy("src")
    })
}
