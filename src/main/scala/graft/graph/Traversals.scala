package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded traversal operators over an edge list — the graph-side
  * retrieval primitives (k-hop neighborhoods, local clustering signals)
  * that complement `Components` (global structure) and `PageRank`
  * (global importance).
  */
object Traversals {

  /** Minimum hop distance from `source` along directed edges, bounded
    * at `maxHops`; vertices not reached within the bound get NULL. The
    * bound makes the operator deterministic and oracle-replayable
    * without a convergence check, and matches the practical use — "the
    * k-hop neighborhood of this document" — where unbounded reach is
    * never wanted.
    *
    * Each round expands only the NEW frontier (dist == round−1) through
    * one equi-join — textbook distributed BFS, O(maxHops) shuffles,
    * lineage cut per round.
    */
  def bfsHops(vertices: DataFrame, edges: DataFrame, source: Long,
              maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.toDF("src", "dst")
      .select(col("src").cast("long"), col("dst").cast("long")).cache()
    // frontier/reached accumulation: each round touches only the NEW
    // frontier (never the full vertex set — the r4 shape joined all N
    // vertices every round, 4 shuffles/round of mostly-idle work). The
    // reached set is a lazy union of per-round checkpointed frontiers
    // (≤ maxHops branches, each materialized — no recursive lineage), so
    // a round is: frontier ⋈ edges → distinct → anti-join reached, ONE
    // checkpoint job, and the loop exits early once the frontier drains.
    // seed the source UNCONDITIONALLY (not filtered through the vertex
    // table): the recursive-CTE oracle starts from the source id and
    // walks all edges regardless of vertex membership, joining the
    // vertex table only at the end — a source present only in the edge
    // list must still propagate distances to reachable vertices
    val spark = vertices.sparkSession
    var frontier = spark.range(1)
      .select(lit(source).as("id"), lit(0L).as("dist"))
      .localCheckpoint()
    var reached = frontier
    var h = 1
    var drained = frontier.isEmpty
    while (h <= maxHops && !drained) {
      frontier = frontier
        .join(e, frontier("id") === e("src"))
        .select(col("dst").as("id")).distinct()
        .join(reached.select(col("id").as("__v")),
          col("id") === col("__v"), "left_anti")
        .select(col("id"), lit(h.toLong).as("dist"))
        .localCheckpoint()
      // count over just-checkpointed blocks — cheap, and an empty
      // frontier ends the loop (a diameter-3 graph pays 3 rounds, not
      // maxHops)
      drained = frontier.isEmpty
      if (!drained) reached = reached.unionAll(frontier)
      h += 1
    }
    val out = vertices
      .select(col(vertices.columns(0)).cast("long").as("id")).distinct()
      .join(reached.withColumnRenamed("id", "__r"),
        col("id") === col("__r"), "left")
      .select(col("id"), col("dist"))
    // free the cached edge table (see PageRank.fixedPoint — same
    // long-lived-session hygiene); `out` reads only checkpointed blocks
    e.unpersist(false)
    out
  }

  /** Per-vertex triangle count over an UNDIRECTED graph given as
    * canonical pairs (id_a < id_b). Triangles (a < b < c) come from the
    * standard two-step equi-self-join on the ordered edge list — the
    * ordering makes each triangle appear exactly once, and every join
    * is on edge endpoints (shuffle-partitionable; the heaviest key is
    * the highest-degree vertex, AQE-skew territory, never a cross
    * join).
    *
    * The canonical pair set is cached (three self-join references read
    * it) and the result is lazy, so the caller owns eviction after the
    * query runs (see Dedup's cache-lifecycle note).
    */
  /** Bounded k-core peeling: `rounds` synchronous rounds of "drop every
    * vertex whose degree within the surviving set is < k". The k-core
    * is the fixpoint; a FIXED round count keeps the operator
    * deterministic and oracle-replayable (the q118/q122 pattern — at
    * the densities that matter the peel converges in a few rounds, and
    * callers needing the true fixpoint loop until the alive count
    * stops shrinking). Classic graph-cleaning gate: the k-core is the
    * part of a near-dup graph dense enough to be template/boilerplate
    * structure rather than chance collisions.
    *
    * Output: (id, in_core 0/1, deg) where deg is the vertex's degree
    * WITHIN the surviving set after the last round (0 for peeled
    * vertices).
    *
    * Scale notes: each round is two semi-joins (edge endpoints against
    * the alive set) + one degree aggregate — all equi-joins on vertex
    * ids; alive shrinks monotonically and is localCheckpoint-ed per
    * round (the iterative-loop lineage rule).
    */
  def kcorePeel(vertices: DataFrame, pairs: DataFrame, k: Int,
                rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be >= 1")
    val p = pairs.toDF("id_a", "id_b")
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .distinct().localCheckpoint()
    val verts = vertices
      .select(col(vertices.columns(0)).cast("long").as("id")).distinct()
    def degreesWithin(alive: DataFrame): DataFrame = {
      val e = p
        .join(alive.select(col("id").as("id_a")), Seq("id_a"))
        .join(alive.select(col("id").as("id_b")), Seq("id_b"))
      e.select(col("id_a").as("id")).union(e.select(col("id_b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    }
    var alive = verts.localCheckpoint()
    for (_ <- 1 to rounds) {
      alive = alive.join(degreesWithin(alive), Seq("id"))
        .filter(col("deg") >= k).select(col("id"))
        .localCheckpoint()
    }
    val finalDeg = degreesWithin(alive)
    verts
      .join(alive.withColumn("in_core", lit(1)), Seq("id"), "left")
      .join(finalDeg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("in_core"), lit(0)).as("in_core"),
        coalesce(col("deg"), lit(0L)).as("deg"))
  }

  /** Local clustering coefficient per vertex: the share of a vertex's
    * neighbor pairs that are themselves connected —
    * coef = 2·triangles / (deg·(deg−1)), 0 for deg < 2. The standard
    * "how clique-like is this node's neighborhood" signal; over a
    * similarity graph it separates tight duplicate clusters (coef → 1)
    * from hub-and-spoke template families (coef → 0) at equal degree.
    *
    * Input is the same canonical (id_a < id_b) distinct pair list as
    * `triangleCounts`; degree is counted over the symmetrized list.
    * One triangle pass + one degree aggregate + an equi-join — no new
    * join shapes beyond the q105 path. `coef` is one double division
    * of exact integers, rounded 6 dp.
    */
  def clusteringCoefficient(vertices: DataFrame, pairs: DataFrame): DataFrame = {
    val p = pairs.toDF("id_a", "id_b")
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .distinct()
    val deg = p.select(col("id_a").as("id"))
      .union(p.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    triangleCounts(vertices, p)
      .join(deg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        col("n_triangles"),
        when(coalesce(col("deg"), lit(0L)) >= 2,
          round(lit(2.0) * col("n_triangles").cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"), 6))
          .otherwise(lit(0.0)).as("coef"))
  }

  def triangleCounts(vertices: DataFrame, pairs: DataFrame): DataFrame = {
    // non-canonical pairs would silently undercount (the a<b<c join
    // never matches them); duplicates would multi-count — guard + dedup
    val p = pairs.toDF("id_a", "id_b")
      .select(
        when(col("id_a").cast("long") >= col("id_b").cast("long"),
          raise_error(lit("triangleCounts requires canonical pairs " +
            "(id_a < id_b)")).cast("long"))
          .otherwise(col("id_a").cast("long")).as("id_a"),
        col("id_b").cast("long"))
      .distinct().cache()
    val tri = p.as("ab").join(p.as("bc"), col("ab.id_b") === col("bc.id_a"))
      .join(p.as("ac"),
        col("ac.id_a") === col("ab.id_a") && col("ac.id_b") === col("bc.id_b"))
      .select(col("ab.id_a").as("a"), col("ab.id_b").as("b"),
        col("bc.id_b").as("c"))
    // single-pass corner explode — a 3-branch union would execute the
    // two-step triangle join three times
    val members = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    vertices.select(col(vertices.columns(0)).cast("long").as("id")).distinct()
      .join(members, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
