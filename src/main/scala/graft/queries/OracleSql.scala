package graft.queries

/** Shared DuckDB-oracle SQL fragments used by more than one query. */
object OracleSql {

  /** The md5-seeded deterministic k-means chain (the DuckDB twin of
    * [[graft.ops.Similarity.kmeansCentroids]] with `seedHash = md5`,
    * `simRound = 6`): `iters` Lloyd rounds unrolled as CTE stages
    * (assign by round-6 argmax cosine, then per-cell elementwise AVG),
    * mirroring the Spark plan stage for stage. Ends after the final
    * assignment CTE `af(vec_id, cid)` — callers append `,` + their own
    * CTEs or a `SELECT`. Exposes `v(vec_id, x, pos)` too. */
  def kmeansMd5Ctes(k: Int, iters: Int, trainWhere: String = "",
                    recursive: Boolean = false): String = {
    // Training runs over `vt` (the optionally-filtered subset); the final
    // assignment `af` covers ALL of `v` — identical to before when
    // trainWhere is empty (vt == v), and the hook sim_ivf_drift uses to
    // train on the t0 slice while assigning both slices.
    // `recursive` emits WITH RECURSIVE so a caller's appended CTEs may
    // be recursive (connected-components reachability) — DuckDB only
    // accepts the keyword at the WITH itself.
    val withKw = if (recursive) "WITH RECURSIVE" else "WITH"
    val where = if (trainWhere.isEmpty) "" else s" WHERE $trainWhere"
    def round(n: Int, prev: String): String =
      s"""s$n AS (SELECT v.vec_id, c.cid,
         |    SUM(v.x*c.c)/(SQRT(SUM(v.x*v.x))*SQRT(SUM(c.c*c.c))) AS s
         |  FROM vt v JOIN $prev c USING (pos) GROUP BY 1,2),
         |a$n AS (SELECT vec_id, cid FROM s$n
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY ROUND(s,6) DESC, cid) = 1),
         |c$n AS (SELECT a.cid, v.pos, AVG(v.x) AS c
         |  FROM a$n a JOIN vt v USING (vec_id) GROUP BY 1,2)""".stripMargin
    val rounds = (1 to iters).map(i => round(i, s"c${i - 1}")).mkString(",\n")
    s"""$withKw v AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
       |    generate_subscripts(embedding, 1) AS pos FROM embeddings),
       |vt AS (SELECT v.* FROM v JOIN embeddings e USING (vec_id)$where),
       |seeds AS (SELECT vec_id,
       |    ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
       |  FROM embeddings$where
       |  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= $k),
       |c0 AS (SELECT s.cid, v.pos, v.x AS c FROM seeds s JOIN vt v USING (vec_id)),
       |$rounds,
       |sf AS (SELECT v.vec_id, c.cid,
       |    SUM(v.x*c.c)/(SQRT(SUM(v.x*v.x))*SQRT(SUM(c.c*c.c))) AS s
       |  FROM v JOIN c$iters c USING (pos) GROUP BY 1,2),
       |af AS (SELECT vec_id, cid FROM sf
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY ROUND(s,6) DESC, cid) = 1)""".stripMargin
  }
}
