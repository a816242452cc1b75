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
  // table's parquet footer, a visible per-query tax on the ad-hoc path
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def register(spark: SparkSession, dir: String): Unit = {
    if (registered.add(s"${System.identityHashCode(spark)}@$dir")) {
      Tables.names.foreach { name =>
        try Tables(spark, dir, name).createOrReplaceTempView(name)
        catch { case _: Throwable => () } // missing optional table
      }
      GraftExtensions.register(spark)
    }
  }
}
