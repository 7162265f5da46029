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

  /** Bounded single-source shortest paths (Bellman–Ford, `rounds`
    * synchronous relaxation rounds) over directed weighted edges
    * (src, dst, w) with non-negative INTEGER weights; unreached
    * vertices get NULL. After r rounds every shortest path of ≤ r
    * edges is exact — the same fixed-round determinism contract as
    * `bfsHops`/`kcorePeel` (an unbounded loop is not oracle-replayable
    * and rarely wanted: "cost to reach within k steps" is the product
    * question). Integer weights ⇒ exact min arithmetic, no FP-sum
    * ordering anywhere.
    *
    * Each round relaxes only vertices with a finite distance through
    * ONE edge equi-join + a min aggregate on the destination key, then
    * folds into the running distance table with a left join — O(rounds)
    * shuffles, all hash-partitioned on vertex ids; distances
    * localCheckpoint per round (iterative-lineage rule). The edge list
    * materializes once and is read by every round.
    */
  def ssspBounded(vertices: DataFrame, edges: DataFrame, source: Long,
                  rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.toDF("src", "dst", "w")
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"))
      .localCheckpoint()
    val verts = vertices
      .select(col(vertices.columns(0)).cast("long").as("id")).distinct()
    var dist = verts
      .select(col("id"),
        when(col("id") === source, lit(0L)).cast("long").as("dist"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val relax = dist.filter(col("dist").isNotNull)
        .join(e, dist("id") === e("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("nd"))
        .groupBy(col("id")).agg(min(col("nd")).as("nd"))
      dist = dist.join(relax, Seq("id"), "left")
        .select(col("id"),
          when(col("dist").isNull, col("nd"))
            .when(col("nd").isNull, col("dist"))
            .otherwise(least(col("dist"), col("nd"))).as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /** Deterministic random walks (the DeepWalk/node2vec corpus
    * generator, made reproducible): one walk starts at every vertex and
    * takes `steps` steps; at each step the walker moves to the neighbor
    * minimizing md5(walk_id | step | neighbor) — a reproducible
    * "uniform" choice that every engine, run, and partitioning replays
    * exactly (the hash-gate idea from `Sampling`, applied to neighbor
    * choice). A walk at a vertex with no out-edge terminates.
    *
    * Output: (walk_id, step, node) — step 0 is the start vertex.
    *
    * Each step is ONE edge equi-join + a packed-long min aggregate per
    * walk (hash = high 40 bits, neighbor id = low `idBits`, so
    * arg-min rides an integer `min` — the q34 packed-argmin pattern;
    * hash ties, ~2⁻⁴⁰ within a neighborhood, break toward the smaller
    * neighbor id deterministically). O(steps) shuffles on walk ids;
    * state per walk is one row. Requires ids < 2^idBits
    * (idBits ≤ 23 keeps hash·2^idBits inside int64) — guarded with a
    * row-level raise, like `triangleCounts`' canonical-pair guard; at
    * larger id spaces the id would pack by dense-rank instead.
    */
  def deterministicWalks(vertices: DataFrame, edges: DataFrame,
                         steps: Int, idBits: Int = 20): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(idBits >= 1 && idBits <= 23, "idBits must be in [1, 23]")
    val lim = 1L << idBits
    val e = edges.toDF("src", "dst")
      .select(col("src").cast("long"),
        when(col("dst").cast("long") >= lim || col("dst").cast("long") < 0,
          raise_error(lit(s"deterministicWalks requires 0 <= id < 2^$idBits"))
            .cast("long"))
          .otherwise(col("dst").cast("long")).as("dst"))
      .localCheckpoint()
    val verts = vertices
      .select(col(vertices.columns(0)).cast("long").as("id")).distinct()
    var cur = verts.select(col("id").as("walk_id"), col("id").as("node"))
    var out = cur.select(col("walk_id"), lit(0).as("step"), col("node"))
      .localCheckpoint()
    for (i <- 1 to steps) {
      // 40-bit md5 fold of (walk, step, candidate) packed above the id
      val h = conv(substring(md5(
          concat_ws("|", col("walk_id"), lit(i), col("dst"))), 1, 10), 16, 10)
        .cast("long")
      cur = cur.join(e, cur("node") === e("src"))
        .select(col("walk_id"), (h * lim + col("dst")).as("pack"))
        .groupBy(col("walk_id")).agg(min(col("pack")).as("pack"))
        .select(col("walk_id"), pmod(col("pack"), lit(lim)).as("node"))
        .localCheckpoint()
      out = out.unionAll(
        cur.select(col("walk_id"), lit(i).as("step"), col("node")))
    }
    out
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

  /** Degree-mixing (assortativity) sufficient statistics: one row of
    * exact BIGINT sums over the SYMMETRIZED edge list from which
    * Newman's degree assortativity coefficient is one division —
    * r = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) with x the source degree and
    * y the destination degree of each directed orientation (so
    * Σx = Σy and Σxx = Σyy; only the independent sums ship). A hubby
    * crawl graph (hubs linking leaves) goes negative; a near-dup
    * cluster graph (cliques) goes positive — a cheap one-row shape
    * audit before anyone runs community detection.
    *
    * Input: canonical distinct pairs (id_a < id_b). Shape: one degree
    * aggregate (vertex-sized), two vertex-sized equi-joins to label
    * edge endpoints, one global sum — never pairwise; the single-row
    * output is the broadcast-totals idiom. Degrees are bounded by the
    * LSH bucket cap so the BIGINT products hold far past test scale.
    */
  def degreeMixing(pairs: DataFrame): DataFrame = {
    val p = pairs.toDF("id_a", "id_b")
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .distinct()
      .localCheckpoint() // degree aggregate + endpoint labeling both read it
    val deg = p.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    p.join(deg.select(col("id").as("id_a"), col("deg").as("__da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("deg").as("__db")), "id_b")
      .agg(
        (lit(2L) * count(lit(1))).as("n_endpoints"),
        sum(col("__da") + col("__db")).as("sum_x"),
        sum(col("__da") * col("__da") + col("__db") * col("__db"))
          .as("sum_xx"),
        (lit(2L) * sum(col("__da") * col("__db"))).as("sum_xy"))
  }
}
