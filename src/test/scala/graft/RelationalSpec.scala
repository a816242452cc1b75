package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("explodeArrays expands equal-length arrays with position") {
    val df = Seq(
      ("a", Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0, 30.0)),
      ("b", Seq(4.0), Seq(40.0))
    ).toDF("id", "x", "y")
    val out = Relational.explodeArrays(df, Seq("x", "y")).collect()
    assert(out.length == 4)
    val row = out.find(r => r.getAs[String]("id") == "a" && r.getAs[Int]("pos") == 1).get
    assert(row.getAs[Double]("x") == 2.0 && row.getAs[Double]("y") == 20.0)
  }

  test("explodeArrays raises on ragged arrays (reference contract)") {
    val df = Seq(("a", Seq(1.0, 2.0), Seq(10.0))).toDF("id", "x", "y")
    val ex = intercept[Exception] {
      Relational.explodeArrays(df, Seq("x", "y")).collect()
    }
    assert(ex.getMessage.contains("ragged") ||
      ex.getCause != null && ex.getCause.getMessage.contains("ragged"))
  }

  test("asOfLookup picks most recent quote at or before probe time") {
    val quotes = Seq(("u1", 10L, 1.0), ("u1", 20L, 2.0), ("u2", 5L, 5.0))
      .toDF("k", "t", "v")
    val probes = Seq(("u1", 15L), ("u1", 20L), ("u1", 5L), ("u2", 100L))
      .toDF("k", "t")
    val out = Relational.asOfLookup(probes, quotes, Seq("k"), "t", "v", "last_v")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("t"),
        Option(r.getAs[java.lang.Double]("last_v")))).toSet
    assert(out == Set(
      ("u1", 15L, Some(1.0)),   // quote@10
      ("u1", 20L, Some(2.0)),   // quote at equal time counts
      ("u1", 5L, None),         // before first quote
      ("u2", 100L, Some(5.0))))
  }

  test("segmentDiff pairs A/B per key and subtracts") {
    val df = Seq(("r1", "A", 12.0), ("r1", "B", 2.0),
      ("r2", "A", 1.0), ("r3", "B", 9.0)).toDF("k", "seg", "v")
    val out = Relational.segmentDiff(df, Seq("k"), "seg", "v", "A", "B")
      .select("k", "seg_diff").as[(String, Double)].collect().toSet
    assert(out == Set(("r1", 10.0))) // unpaired r2/r3 dropped
  }

  test("latestByKey keeps the max-version row per key") {
    val df = Seq(("s1", 1, "old"), ("s1", 3, "new"), ("s2", 2, "only"))
      .toDF("id", "ver", "val")
    val out = Relational.latestByKey(df, Seq("id"), Seq(col("ver")))
      .select("id", "val").as[(String, String)].collect().toSet
    assert(out == Set(("s1", "new"), ("s2", "only")))
  }

  test("globalSigmaOutliers keeps |x - mu| > k sigma without collect") {
    val df = (Seq.fill(98)(10.0) ++ Seq(10.5, 1000.0)).toDF("v")
    val out = Relational.globalSigmaOutliers(df, "v", 2.0).as[Double].collect()
    assert(out.toSeq == Seq(1000.0))
  }

  test("prefixSum equals a single-window cumsum, including negatives") {
    val df = spark.range(1, 501).select(
      col("id").as("k"),
      (when(col("id") % 7 === 0, -col("id")).otherwise(col("id") % 97))
        .cast("long").as("v"))
    val got = Relational.prefixSum(df, "k", "v", "cum")
      .select("k", "cum").as[(Long, Long)].collect().toMap
    // reference: driver-side running total in k order
    val rows = df.as[(Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    for ((k, v) <- rows) {
      acc += v
      assert(got(k) == acc, s"k=$k")
    }
    assert(got.size == 500)
  }

  test("prefixSum refuses a nondeterministic input unless persisted") {
    // rand() in the plan: both phases would re-sample → offsets could
    // disagree with bucket sums; must fail fast with a clear message
    val nondet = spark.range(1, 301).select(
      col("id").as("k"), (rand(7) * 100).cast("long").as("v"))
    val err = intercept[IllegalArgumentException](
      Relational.prefixSum(nondet, "k", "v", "cum"))
    assert(err.getMessage.contains("nondeterministic"), err.getMessage)
    // persisted: one materialization serves both phases → accepted and
    // internally consistent (cum is the running total of the cached v's)
    val cached = nondet.persist()
    try {
      val out = Relational.prefixSum(cached, "k", "v", "cum")
        .select("k", "v", "cum").as[(Long, Long, Long)].collect().sortBy(_._1)
      var acc = 0L
      out.foreach { case (_, v, cum) => acc += v; assert(cum == acc) }
      assert(out.length == 300)
    } finally { cached.unpersist(); () }
    // sample() is likewise refused (rejection is plan-shape based)
    val sampled = spark.range(1, 301)
      .select(col("id").as("k"), lit(1L).as("v")).sample(0.5)
    intercept[IllegalArgumentException](
      Relational.prefixSum(sampled, "k", "v", "cum"))
  }

  test("prefixSum spreads work over multiple range partitions") {
    val df = spark.range(1, 2001).select(col("id").as("k"), lit(1L).as("v"))
    val out = Relational.prefixSum(df, "k", "v", "cum")
    // cum of an all-ones column in k order is k itself
    assert(out.filter(col("cum") =!= col("k")).isEmpty)
    // the running total must come from the two-phase bucketed form —
    // the DATA-side window is partitioned by the bucket column, never a
    // global-order window over the rows (only the tiny per-bucket offset
    // table goes through a single-partition window)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__b"), plan)
    // and no window may be ORDERED by the data key without a partition
    // spec — the regression this contract exists to catch (the offsets
    // window orders by __b, never by k)
    assert(!plan.contains("windowspecdefinition(k#"), plan)
  }

  test("bandJoin equals the nested-loop range join, negatives included") {
    val rnd = new scala.util.Random(31)
    val probes = (1 to 400).map(i => (i.toLong, rnd.nextDouble() * 200 - 100))
      .toDF("pid", "v")
    val ivs = (1 to 60).map { i =>
      val c = rnd.nextDouble() * 200 - 100
      val w = rnd.nextDouble() * 15
      (i.toLong, c - w, c + w)
    }.toDF("iid", "lo", "hi")
    val got = Relational.bandJoin(probes, "v", ivs, "lo", "hi", width = 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = probes.as[(Long, Double)].collect().flatMap { case (pid, v) =>
      ivs.as[(Long, Double, Double)].collect().collect {
        case (iid, lo, hi) if v >= lo && v <= hi => (pid, iid)
      }
    }.toSet
    assert(got == want)
    assert(want.nonEmpty, "degenerate sample: no range matches")
  }

  test("bandJoin errors on an interval spanning more than maxBucketsPerInterval") {
    val probes = Seq((1L, 5.0)).toDF("pid", "v")
    val wide = Seq((1L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      Relational.bandJoin(probes, "v", wide, "lo", "hi",
        width = 1.0, maxBucketsPerInterval = 100).collect()
    }
    assert(e.getMessage.contains("bandJoin") ||
      Option(e.getCause).exists(_.getMessage.contains("bandJoin")), e.getMessage)
  }

  test("trailingSums equals the sliding RANGE frame, ties included") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Stats
    val rnd = new scala.util.Random(47)
    // duplicate timestamps on purpose: RANGE tie semantics must agree
    val rows = (1 to 300).map { i =>
      val t = 1700000000000000L + (rnd.nextInt(80) * 3600L * 1000000L)
      (i.toLong, s"k${i % 3}", new java.sql.Timestamp(t / 1000), rnd.nextDouble() * 10)
    }
    val df = rows.toDF("id", "k", "ts", "v")
    val win = 24L * 3600L * 1000000L // 1 day
    val fast = Stats.trailingSums(df, Seq("k"), "ts", "v", win)
      .select("id", "win_n", "win_sum")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val w = Window.partitionBy("k").orderBy(unix_micros(col("ts")))
      .rangeBetween(-win, 0L)
    val slow = df.select(col("id"),
        count(lit(1)).over(w).as("n"), sum("v").over(w).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(fast.keySet == slow.keySet)
    for ((id, (n, sm)) <- fast) {
      assert(n == slow(id)._1, s"row $id count")
      assert(math.abs(sm - slow(id)._2) < 1e-9, s"row $id sum")
    }
  }

  test("trailingSums win_var: constant window is exactly 0 despite long history") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Stats
    // large-magnitude varying history, then a far-later constant tail
    // whose trailing window holds only the constant: the naive
    // cumulative-sum-of-squares difference lands at ±ε there (the
    // cancellation error scales with the CUMULATIVE magnitude, not the
    // frame) — win_var must be exactly 0.0, never a tiny positive that
    // would turn a NULL z-score into an enormous one
    val base = 1700000000000000L
    def t(us: Long) = new java.sql.Timestamp((base + us) / 1000)
    val hist = (1 to 200).map(i =>
      (i.toLong, "k", t(i * 1000000L), 1.0e6 + i * 1237.53125))
    val tail = (201 to 210).map(i =>
      (i.toLong, "k", t((10000 + i) * 1000000L), 42.5))
    val df = (hist ++ tail).toDF("id", "k", "ts", "v")
    val win = 10L * 1000000L // 10 s
    val out = Stats.trailingSums(df, Seq("k"), "ts", "v", win)
      .select("id", "win_n", "win_var")
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // tail rows past the first: constant window, n > 1 → exactly 0
    for (i <- 202L to 210L) {
      assert(out(i)._1 > 1, s"row $i n")
      assert(out(i)._2.contains(0.0), s"row $i win_var=${out(i)._2}")
    }
    // single-row window (first tail row) → null (no sample variance)
    assert(out(201L)._1 == 1 && out(201L)._2.isEmpty)
    // varying-history rows still agree with the sliding-frame var_samp
    val w = Window.partitionBy("k").orderBy(unix_micros(col("ts")))
      .rangeBetween(-win, 0L)
    val ref = df.select(col("id"), var_samp("v").over(w).as("vs"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    for (i <- 2L to 200L) {
      val (a, b) = (out(i)._2.get, ref(i).get)
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, b.abs), s"row $i $a vs $b")
    }
  }
}
