package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single registry of all verifiable operator queries. Query groups
  * register themselves here by contributing a `Seq[Q]`. */
object Registry {

  def all: Seq[Q] =
    CoreQueries.qs ++ ArrayTimeQueries.qs ++ TextQueries.qs ++
      SimilarityQueries.qs ++ ExtQueries.qs ++ GapQueries.qs ++
      TrainQueries.qs ++ RetrievalQueries.qs ++ WebQueries.qs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  def byName(name: String): (SparkSession, String) => DataFrame =
    queries(name)
}
