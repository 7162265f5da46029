package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg hubs & authorities) over a DIRECTED edge list —
  * the link-analysis complement of [[PageRank]]: authorities are
  * pointed-to by good hubs, hubs point at good authorities. On a
  * similarity graph oriented low-id → high-id this separates "template"
  * vectors many near-dups point at (authorities) from the near-dup
  * copies themselves (hubs).
  *
  * Determinism: scores live in integer MICRO-units with L∞ (max)
  * normalization — auth(v) = raw(v)·10⁶ div max(raw) — so every round
  * is exact integer arithmetic, bit-identical across partitionings and
  * engines (a float L2 normalization can't hash-match any oracle).
  *
  * Scale notes: each round is two (edge ⨝ score) equi-joins + two
  * integer-sum hash aggregates + two single-row broadcast max scalars;
  * shuffle per round is edge-proportional, score state one row per
  * vertex, lineage cut per round by localCheckpoint (the PageRank loop
  * discipline). The renormalization multiply (raw·10⁶, raw up to
  * degᵐᵃˣ·10⁶) rides DECIMAL(38,0) so no degree can overflow it; the
  * integral divide lands back in BIGINT (quotient ≤ 10⁶ by
  * construction).
  */
object Hits {

  private val Scale = 1000000L

  /** @param vertices one column `id`
    * @param edges    columns `src`, `dst` (directed)
    * @return (id, auth, hub) in integer micro-units
    */
  def run(vertices: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    var scores = vertices.select(col("id"),
      lit(Scale).as("auth"), lit(Scale).as("hub"))
    for (_ <- 1 to iters) {
      // authority update: sum incoming hub mass, max-normalize
      val authRaw = edges
        .join(scores.select(col("id").as("src"), col("hub")), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("__raw"))
      val withAuth = scores.select("id", "hub")
        .join(authRaw, Seq("id"), "left")
        .withColumn("__raw", coalesce(col("__raw"), lit(0L)))
      val maxA = withAuth.agg(greatest(max(col("__raw")), lit(1L)).as("__m"))
      val normA = withAuth.crossJoin(broadcast(maxA))
        .select(col("id"),
          expr(s"CAST(CAST(__raw AS DECIMAL(38,0)) * $Scale div __m AS BIGINT)")
            .as("auth"), col("hub"))
      // hub update: sum outgoing (fresh) authority mass, max-normalize
      val hubRaw = edges
        .join(normA.select(col("id").as("dst"), col("auth")), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("auth")).as("__raw"))
      val withHub = normA.select("id", "auth")
        .join(hubRaw, Seq("id"), "left")
        .withColumn("__raw", coalesce(col("__raw"), lit(0L)))
      val maxH = withHub.agg(greatest(max(col("__raw")), lit(1L)).as("__m"))
      scores = withHub.crossJoin(broadcast(maxH))
        .select(col("id"), col("auth"),
          expr(s"CAST(CAST(__raw AS DECIMAL(38,0)) * $Scale div __m AS BIGINT)")
            .as("hub"))
        .localCheckpoint()
    }
    scores
  }
}
