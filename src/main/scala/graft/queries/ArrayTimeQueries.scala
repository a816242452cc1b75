package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Tables, TimeFns}
import graft.ops.{Relational, Stats}

/** Array-cell reshaping (SURVEY.md §2.9), time-axis functions (§2.8),
  * window / time-series operators (§2.5) and outlier rules (§2.10),
  * certified on the embeddings/events tables.
  */
object ArrayTimeQueries {

  def qs: Seq[Q] = Seq(

    // R1 — explode_df: array cells → one row per element, scalars repeated
    // (reference: cosmo/monitor_helpers.py:35–49). posexplode keeps the
    // element index like the reference's repeated-index join.
    Q("r1_explode_arrays",
      """SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
        |  ROUND(CAST(unnest(embedding) AS DOUBLE), 4) + 0 AS val
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      Tables(s, dir, "embeddings")
        .filter(col("vec_id") < 50)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("label"), col("pos"), (round(col("val"), 4) + lit(0)).as("val"))
        .orderBy("vec_id", "pos")
    },

    // W2 — relative-to-first transform on in-cell arrays
    // (reference: cosmo/monitors/osm_drift_monitors.py:22–23).
    Q("w2_rel_to_first",
      """SELECT vec_id, ROUND(list_aggregate(list_transform(
        |    CAST(embedding AS DOUBLE[]), x -> x - CAST(embedding[1] AS DOUBLE)),
        |  'sum'), 4) + 0 AS rel_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val arr = col("embedding").cast("array<double>")
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          (round(aggregate(transform(arr, x => x - element_at(arr, 1)),
            lit(0.0d), _ + _), 4) + lit(0)).as("rel_sum"))
        .orderBy("vec_id")
    },

    // W3 — drop-first-element slice (reference: osm_drift_monitors.py:26–27).
    Q("w3_slice_drop_first",
      """SELECT vec_id, len(embedding[2:]) AS n,
        |  ROUND(list_aggregate(CAST(embedding[2:] AS DOUBLE[]), 'sum'), 4) + 0 AS tail_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val tail = slice(col("embedding").cast("array<double>"), 2, 63)
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), size(tail).as("n"),
          (round(aggregate(tail, lit(0.0d), _ + _), 4) + lit(0)).as("tail_sum"))
        .orderBy("vec_id")
    },

    // A9 — per-row array reduction `reduce_to_stat`
    // (reference: cosmo/filesystem.py:255–278): mean/std/max of the cell
    // array without exploding. std is sample std (ddof=1), same formula
    // both sides.
    Q("a9_array_stats",
      """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) a FROM embeddings)
        |SELECT vec_id,
        |  ROUND(list_aggregate(a, 'sum') / len(a), 4) + 0 AS amean,
        |  ROUND(sqrt((list_aggregate(list_transform(a, x -> x*x), 'sum')
        |    - list_aggregate(a,'sum')*list_aggregate(a,'sum')/len(a)) / (len(a)-1)), 4) + 0 AS astd,
        |  ROUND(CAST(list_max(a) AS DOUBLE), 4) + 0 AS amax
        |FROM t ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val a = col("embedding").cast("array<double>")
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          (round(Stats.arrayStat(a, "mean"), 4) + lit(0)).as("amean"),
          (round(Stats.arrayStat(a, "std"), 4) + lit(0)).as("astd"),
          (round(Stats.arrayStat(a, "max"), 4) + lit(0)).as("amax"))
        .orderBy("vec_id")
    },

    // W7 — stride sampling of array cells (reference: dark_monitors.py:60–63,
    // `TIME_3[::25]`): every 8th element here.
    Q("w7_stride_sample",
      """SELECT vec_id, pos, ROUND(val, 4) + 0 AS val FROM (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings)
        |WHERE pos % 8 = 0 AND vec_id < 50 ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      Tables(s, dir, "embeddings")
        .filter(col("vec_id") < 50)
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "val")))
        .filter(col("pos") % 8 === 0)
        .select(col("vec_id"), col("pos"), (round(col("val"), 4) + lit(0)).as("val"))
        .orderBy("vec_id", "pos")
    },

    // §2.8 date/time — MJD <-> timestamp and Besselian year
    // (reference: cosmo/monitor_helpers.py:52–76; acq_monitors.py:241).
    Q("fn_time_axes",
      """SELECT event_id,
        |  ROUND(epoch_us(ts) / 1e6 / 86400 + 40587, 6) AS mjd,
        |  ROUND(1900.0 + (epoch_us(ts) / 1e6 / 86400 + 40587 + 2400000.5
        |    - 2415020.31352) / 365.242198781, 6) AS byear
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val mjd = TimeFns.tsToMjd(col("ts"))
      Tables(s, dir, "events")
        .select(col("event_id"),
          round(mjd, 6).as("mjd"),
          round(TimeFns.besselianYear(mjd), 6).as("byear"))
        .orderBy("event_id")
    },

    // §2.8 — day-of-year format `yyyy.DDD:HH:mm:ss` round trip
    // (reference: cosmo/monitor_helpers.py:15–25). DuckDB's strptime %j is
    // unreliable, so the oracle re-derives the timestamp arithmetically.
    Q("fn_doy_roundtrip",
      """WITH s AS (SELECT ts, strftime(ts, '%Y.%j:%H:%M:%S') f FROM events)
        |SELECT COUNT(*) AS n_total, SUM(CASE WHEN
        |  make_timestamp(CAST(f[1:4] AS BIGINT), 1, 1, CAST(f[10:11] AS BIGINT),
        |    CAST(f[13:14] AS BIGINT), CAST(f[16:17] AS DOUBLE))
        |    + ((CAST(f[6:8] AS BIGINT) - 1) * INTERVAL 1 DAY)
        |  = date_trunc('second', ts) THEN 1 ELSE 0 END)::BIGINT AS n_roundtrip
        |FROM s""".stripMargin) { (s, dir) =>
      val f = date_format(col("ts"), "yyyy.DDD:HH:mm:ss")
      Tables(s, dir, "events")
        .select((TimeFns.doyToTs(f) === date_trunc("second", col("ts")))
          .cast("int").as("ok"))
        .agg(count(lit(1)).as("n_total"), sum(col("ok")).as("n_roundtrip"))
    },

    // §2.8 string scalar bundle: concat_ws, substring-from-end, case
    // mapping, regexp_replace, split (reference: SURVEY.md §2.8 String row).
    Q("fn_scalar_strings",
      """SELECT c_custkey,
        |  concat_ws('-', c_name, c_mktsegment) AS tag,
        |  right(c_name, 2) AS tail2,
        |  upper(c_mktsegment) AS seg_u,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
        |  len(string_split(c_name, '0')) AS n_parts
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
          concat_ws("-", col("c_name"), col("c_mktsegment")).as("tag"),
          substring(col("c_name"), -2, 2).as("tail2"),
          upper(col("c_mktsegment")).as("seg_u"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("name_masked"),
          size(split(col("c_name"), "0", -1)).as("n_parts"))
        .orderBy("c_custkey")
    },

    // §2.8 map/dict lookup (reference: telemetry_monitors.py:305–327
    // label→number maps): literal MapType lookup with default.
    Q("fn_map_lookup",
      """SELECT CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'AUTOMOBILE' THEN 2
        |    WHEN 'MACHINERY' THEN 3 ELSE 0 END AS seg_code,
        |  COUNT(*) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val m = map(lit("BUILDING"), lit(1), lit("AUTOMOBILE"), lit(2), lit("MACHINERY"), lit(3))
      Tables(s, dir, "customer")
        .select(coalesce(element_at(m, col("c_mktsegment")), lit(0)).as("seg_code"))
        .groupBy("seg_code").agg(count(lit(1)).as("n"))
        .orderBy("seg_code")
    },

    // W1 — rolling time-range mean (reference:
    // cosmo/monitors/osm_shift_monitors.py:444–452, 180-day rolling, here
    // 7-day per event_type). RANGE frame over microseconds on both sides.
    // Verified through integer cents (window sum + count) — a rounded
    // mean ties exactly on x.xx5 values where decimal-aware (DuckDB) and
    // binary-double (Spark) rounding disagree.
    Q("w1_rolling_mean_7d",
      """SELECT event_id,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_cents,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_win
        |FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts
        |  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      // engine path: Stats.trailingSums (cumulative frames + one as-of
      // boundary lookup, O(n log n)) — a sliding RANGE frame here is
      // re-evaluated per row by Spark (no retraction), O(rows × frame):
      // 9 s vs <1 s at sf0.1. The oracle keeps the sliding-window
      // formulation — an independent derivation of the same numbers.
      Stats.trailingSums(
          Tables(s, dir, "events")
            .withColumn("cents", round(col("value") * 100, 0).cast("long")),
          Seq("event_type"), "ts", "cents", 7L * 86400L * 1000000L)
        .select(col("event_id"),
          col("win_sum").cast("long").as("sum_cents"),
          col("win_n").as("n_win"))
        .orderBy("event_id")
    },

    // W6 — boxcar smoothing, centered width-4 rows window on a unique
    // ordering (reference: cosmo/monitors/dark_monitors.py:125–127).
    Q("w6_boxcar",
      """SELECT event_id,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_cents,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_win
        |FROM events WINDOW w AS (PARTITION BY event_type
        |  ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 1)
      Tables(s, dir, "events")
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .select(col("event_id"),
          sum("cents").over(w).as("sum_cents"),
          count(lit(1)).over(w).as("n_win"))
        .orderBy("event_id")
    },

    // O5-adjacent — top-k per group via row_number (version-max family,
    // reference: cosmo/sms/ingest_sms.py:274–280 generalized).
    Q("o5_topk_per_group",
      """SELECT event_type, event_id, ROUND(value, 4) AS value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY value DESC, event_id) AS rn FROM events)
        |WHERE rn <= 3 ORDER BY event_type, value DESC, event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("event_type"), col("event_id"), round(col("value"), 4).as("value"))
        .orderBy(col("event_type"), col("value").desc, col("event_id"))
    },

    // A12 — binned event rate: counts per day bucket per type
    // (reference: cosmo/monitors/dark_monitors.py:60–63, 87–93).
    Q("a12_binned_rate",
      """SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n,
        |  ROUND(COUNT(*) / 86400.0, 6) AS rate_per_sec
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          round(count(lit(1)) / lit(86400.0), 6).as("rate_per_sec"))
        .orderBy("event_type", "day")
    },

    // X1/X2 — threshold outlier flags (reference: acq_monitors.py:71–77,
    // 505–507): boolean rule columns, then counts per rule.
    Q("x1_outlier_flags",
      """SELECT event_type,
        |  SUM(CASE WHEN value >= 180 THEN 1 ELSE 0 END)::BIGINT AS n_high,
        |  SUM(CASE WHEN ABS(value - 100) >= 95 THEN 1 ELSE 0 END)::BIGINT AS n_far,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("is_high", (col("value") >= 180).cast("int"))
        .withColumn("is_far", (abs(col("value") - 100) >= 95).cast("int"))
        .groupBy("event_type")
        .agg(sum("is_high").as("n_high"), sum("is_far").as("n_far"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // Streaming-shape tumbling window aggregation (same plan Structured
    // Streaming uses for event-time windows; batch-verifiable).
    Q("w_tumbling_window",
      """SELECT date_trunc('day', ts) AS win_start, event_type, COUNT(*) AS n,
        |  ROUND(SUM(value), 2) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("sum_v"))
        .orderBy("win_start", "event_type")
    })
}
