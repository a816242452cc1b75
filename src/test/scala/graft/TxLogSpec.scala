package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{MergeOps, TxLog}

/** Transactional commit-log MERGE: versioning, version-guard semantics,
  * optimistic-concurrency races, and GC. */
class TxLogSpec extends SparkSpec {
  import spark.implicits._

  test("sequential commits: version-guarded upsert, monotone versions, GC") {
    val dir = Files.createTempDirectory("txlog").toString + "/t"
    val v0 = TxLog.commitMerge(spark,
      dir, Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver"),
      Seq("k"), "ver")
    assert(v0 == 0L)
    // newer version wins, tie keeps target, new key appends
    val v1 = TxLog.commitMerge(spark,
      dir, Seq((1L, "a2", 2L), (2L, "IGNORED", 1L), (3L, "c", 1L)).toDF("k", "v", "ver"),
      Seq("k"), "ver")
    assert(v1 == 1L)
    val rows = TxLog.read(spark, dir).get
      .select("k", "v", "ver").as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "a2", 2L), (2L, "b", 1L), (3L, "c", 1L)))
    // result equals the pure upsert applied serially
    val serial = MergeOps.upsert(
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver"),
      Seq((1L, "a2", 2L), (2L, "IGNORED", 1L), (3L, "c", 1L)).toDF("k", "v", "ver"),
      Seq("k"), "ver").as[(Long, String, Long)].collect().toSet
    assert(rows == serial)
    // GC: after many commits only a small snapshot tail remains
    (2 to 8).foreach { i =>
      TxLog.commitMerge(spark, dir,
        Seq((1L, s"a$i", i.toLong)).toDF("k", "v", "ver"), Seq("k"), "ver")
    }
    val snaps = new java.io.File(dir).listFiles((_, n) => n.startsWith("snap-"))
    assert(snaps.length <= 3, s"GC left ${snaps.length} snapshots")
    assert(TxLog.read(spark, dir).get.filter(col("k") === 1L)
      .select("v").as[String].head() == "a8")
    // time travel within the retained tail; GC'd versions are gone
    val hist = TxLog.history(dir)
    assert(hist.length <= 3 && hist.map(_._1) == hist.map(_._1).sorted)
    val (prevV, _) = hist.init.last
    val prev = TxLog.readVersion(spark, dir, prevV).get
      .filter(col("k") === 1L).select("v").as[String].head()
    assert(prev == s"a${prevV}", s"version $prevV held $prev")
    assert(TxLog.readVersion(spark, dir, 0L).isEmpty, "GC'd version unreadable")
  }

  test("concurrent writers: every commit survives, result equals serial merge") {
    val dir = Files.createTempDirectory("txlog-conc").toString + "/t"
    val writers = 4
    val perWriter = 3
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        (0 until perWriter).foreach { i =>
          // each writer upserts its own key range plus the shared key 999
          val batch = Seq(
            (w * 100L + i, s"w$w-$i", 1L),
            (999L, s"shared-w$w-$i", (w * perWriter + i).toLong))
            .toDF("k", "v", "ver")
          TxLog.commitMerge(spark, dir, batch, Seq("k"), "ver")
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val rows = TxLog.read(spark, dir).get
      .select("k", "v", "ver").as[(Long, String, Long)].collect()
    val byKey = rows.map(r => r._1 -> r).toMap
    // no lost updates: every writer's private keys are present
    assert(rows.length == writers * perWriter + 1)
    for (w <- 0 until writers; i <- 0 until perWriter)
      assert(byKey(w * 100L + i)._2 == s"w$w-$i")
    // the shared key holds the globally max version
    assert(byKey(999L)._3 == (writers * perWriter - 1).toLong)
    // version numbers are a contiguous sequence: one commit per merge
    assert(TxLog.currentVersion(dir).get._1 == (writers * perWriter - 1).toLong)
  }

  test("commitCompact bin-packs small files transactionally; no-op at target") {
    val dir = Files.createTempDirectory("txlog-compact").toString + "/t"
    // a deliberately fragmented first commit: AQE normally coalesces the
    // tiny merge shuffle to one partition — hold it off so the snapshot
    // actually lands as ~32 small files (the state a streaming-append
    // table reaches naturally)
    val fragmented = spark.range(1000)
      .select(col("id").as("k"), (col("id") * 2).as("v"), lit(1L).as("ver"))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try TxLog.commitMerge(spark, dir, fragmented, Seq("k"), "ver")
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val (nBefore, bytes) = TxLog.snapshotFiles(dir).get
    assert(nBefore >= 4, s"setup should fragment: $nBefore files")
    // target far above total bytes -> everything packs into one file
    val v = TxLog.commitCompact(spark, dir, targetFileBytes = bytes * 10)
    assert(v.contains(1L))
    val (nAfter, _) = TxLog.snapshotFiles(dir).get
    assert(nAfter == 1, s"compacted to $nAfter files")
    // a rewrite, not an edit: rows byte-identical
    val rows = TxLog.read(spark, dir).get
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(rows == (0L until 1000L).map(k => (k, k * 2)).toSet)
    // already at target -> no-op, no version burned
    assert(TxLog.commitCompact(spark, dir, targetFileBytes = bytes * 10).isEmpty)
    assert(TxLog.currentVersion(dir).get._1 == 1L)
    // absent table -> None
    assert(TxLog.commitCompact(spark, dir + "-absent").isEmpty)
  }

  test("commitCluster: transactional z-order + in-snapshot manifest; prunedRead skips files") {
    val dir = Files.createTempDirectory("txlog-cluster").toString + "/t"
    val n = 20000
    val src = spark.range(n)
      .select(col("id").as("k"),
        pmod(col("id") * 2654435761L, lit(100000L)).cast("double").as("x"),
        pmod(col("id") * 40503L + 7L, lit(100000L)).cast("double").as("y"),
        lit(1L).as("ver"))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try TxLog.commitMerge(spark, dir, src, Seq("k"), "ver")
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val expect = src.filter(col("y").between(40000.0, 42000.0))
      .select("k").as[Long].collect().toSet
    // before clustering: no manifest -> prunedRead degrades to full
    // scan + filter, still exact
    val unclustered = TxLog.prunedRead(spark, dir,
      Seq(("y", 40000.0, 42000.0))).get
    assert(unclustered.select("k").as[Long].collect().toSet == expect)
    // cluster: version bumps, manifest lands inside the new snapshot
    assert(TxLog.commitCluster(spark, dir, Seq("x", "y"), bits = 6,
      outPartitions = 32).contains(1L))
    val (_, snap) = TxLog.currentVersion(dir).get
    assert(new java.io.File(snap, "_stats").isDirectory)
    // the _-prefixed manifest is invisible to a plain snapshot read
    assert(TxLog.read(spark, dir).get.count() == n.toLong)
    val total = TxLog.read(spark, dir).get.inputFiles.length
    val pruned = TxLog.prunedRead(spark, dir,
      Seq(("y", 40000.0, 42000.0))).get
    assert(pruned.inputFiles.length <= total / 2,
      s"read ${pruned.inputFiles.length} of $total files")
    assert(pruned.select("k").as[Long].collect().toSet == expect)
    // compaction preserves the skip index: manifest rebuilt for the
    // packed files, pruned reads stay exact
    val bytes = TxLog.snapshotFiles(dir).get._2
    assert(TxLog.commitCompact(spark, dir,
      targetFileBytes = (bytes / 4).max(1L)).contains(2L))
    val (_, snap2) = TxLog.currentVersion(dir).get
    assert(new java.io.File(snap2, "_stats").isDirectory)
    val afterCompact = TxLog.prunedRead(spark, dir,
      Seq(("y", 40000.0, 42000.0))).get
    assert(afterCompact.select("k").as[Long].collect().toSet == expect)
    assert(afterCompact.inputFiles.length <=
      TxLog.read(spark, dir).get.inputFiles.length)
    // time travel still resolves the pre-cluster version
    assert(TxLog.readVersion(spark, dir, 0L).get.count() == n.toLong)
  }
}
