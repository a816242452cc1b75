package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scheduling-shape profiler (judge r16 task 1 — root-cause the
  * LM-construction contention blow-up): runs named registry queries and
  * reports, per sample, the WALL time next to the scheduler's view of
  * the same work — job count, stage count, task count, summed executor
  * task time, and the summed executor CPU time. The diagnostic ratios:
  *
  *   - `par` = taskTime / wall — realized parallelism. A query whose
  *     work is genuinely wide reads near the core count; a query built
  *     from many small SEQUENTIAL stages reads near 1, and THAT shape
  *     multiplies under host contention: each of its N stage barriers
  *     pays contended scheduling + straggler latency serially, where a
  *     wide query pays once.
  *   - `cpuShare` = cpuTime / taskTime — below ~0.7 the tasks are
  *     waiting (spill I/O, lock, memory pressure), not computing.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProfileJobs name [name…]
  * SPARK_GRAFT_PROFILE_N repeats (default 2; min reported, all samples
  * printed — under deliberate contention the VARIANCE is the signal). */
object ProfileJobs {
  private final class Counters extends SparkListener {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val cpuTimeNs = new AtomicLong(0L)
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet(); ()
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
      if (t.taskMetrics != null) cpuTimeNs.addAndGet(t.taskMetrics.executorCpuTime)
      ()
    }
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0L); cpuTimeNs.set(0L)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_PROFILE_N", "2").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    core.Logs.quietKnownWarnings()
    // collect-bound: 1-row JVM/codegen warm-up aggregate
    spark.range(1000000).selectExpr("sum(id)").collect()
    val counters = new Counters
    spark.sparkContext.addSparkListener(counters)
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[jobs] unknown query: $name")
        case Some(fn) =>
          (1 to repeats).foreach { i =>
            // drain stale events from the previous sample before reset
            org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
            counters.reset()
            val t0 = System.nanoTime()
            core.Measure.consume(fn(spark, sfDir))
            val wall = (System.nanoTime() - t0) / 1e9
            org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
            core.Measure.releaseAll(spark)
            val tt = counters.taskTimeMs.get() / 1e3
            val cpu = counters.cpuTimeNs.get() / 1e9
            println(f"[jobs] $name%-24s #$i wall $wall%7.2f s  jobs ${counters.jobs.get()}%3d  " +
              f"stages ${counters.stages.get()}%3d  tasks ${counters.tasks.get()}%5d  " +
              f"taskTime $tt%8.2f s  cpu $cpu%8.2f s  par ${tt / wall}%5.1f  " +
              f"cpuShare ${if (tt > 0) cpu / tt else 0.0}%4.2f")
          }
      }
    }
    spark.stop()
  }
}
