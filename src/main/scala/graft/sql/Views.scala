package graft.sql

import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.functions.GraftExtensions

/** SQL surface (SURVEY.md §7.1): temp views over the star-schema tables
  * plus the native function registrations, so every operator is reachable
  * from `spark.sql(...)` — the ad-hoc query path of the reference
  * (docs/source/sms.rst:62–95: users query tables directly). */
object Views {
  // one registration per (session, dir): re-registering re-reads every
  // table's parquet footer, a visible per-query tax on the ad-hoc path.
  // A WeakHashMap keyed on the session itself, not identityHashCode —
  // identity hashes can be reused after a session is GC'd, which would
  // silently skip registration for a fresh session at the same dir; weak
  // keys also let dead sessions drop out instead of leaking entries.
  private val registered =
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]()

  def register(spark: SparkSession, dir: String): Unit = {
    val firstForDir = registered.synchronized {
      registered
        .computeIfAbsent(spark, _ => new java.util.HashSet[String]())
        .add(dir)
    }
    if (firstForDir) {
      Tables.names.foreach { name =>
        // missing optional table: skip it, register the rest. NonFatal
        // only — an OOM or linkage error here must propagate, not turn
        // into a silently half-registered catalog.
        try Tables(spark, dir, name).createOrReplaceTempView(name)
        catch { case scala.util.control.NonFatal(_) => () }
      }
      GraftExtensions.register(spark)
    }
  }
}
