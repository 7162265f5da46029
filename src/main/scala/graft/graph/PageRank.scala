package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-point PageRank with damping 0.85 over a directed edge list.
  *
  * Ranks are BIGINT micro-units (`scale` units = rank 1.0) and every
  * step is integer arithmetic — `div`, `*`, `+` — so the result is
  * BIT-IDENTICAL on any engine, partitioning, or cluster size. A
  * floating-point PageRank cannot make that promise on Spark: the
  * per-vertex contribution sum is a shuffle aggregate whose
  * accumulation order is nondeterministic, and double addition is not
  * associative. Fixed-point trades ~1e-12 of precision for exact
  * reproducibility (and an exact DuckDB oracle).
  *
  * Per iteration: contrib(u→v) = (rank(u)·w(u,v)) div Σw(u), evaluated
  * in the overflow-safe decomposition `(rank div Σw)·w +
  * ((rank mod Σw)·w) div Σw`; dangling mass (Σw = 0 vertices)
  * redistributes per variant; rank'(v) = base(v) + d·(Σ contrib +
  * dangling term), with d = 85/100 applied as `(85·x) div 100`.
  *
  * Scale notes: the loop is iters × (one equi-join + one integer-sum
  * shuffle) — the textbook distributed PageRank shape, one Spark job
  * per round. `localCheckpoint` truncates lineage each round; the
  * dangling term folds in as a broadcast single-row aggregate.
  * Mass bound: total mass is ~N·scale in every variant (uniform spreads
  * it, personalized concentrates it), and in the worst case one vertex
  * receives all of it, so the 85× damping product needs
  * 100·N·scale < 2⁶³ — enforced by a `require` in the shared loop
  * (~9×10⁴ vertices at the default 1e12 scale; scale=1e6 admits ~9×10¹⁰
  * vertices at micro-unit precision — drop `scale` for larger graphs,
  * trading precision for headroom).
  */
object PageRank {

  val DefaultScale = 1000000000000L // 1e12 units = rank 1.0

  /** @param vertices one-column DataFrame of vertex ids (castable to long)
    * @param edges    two-column DataFrame (src, dst), DIRECTED — pass
    *                 both directions for an undirected graph
    */
  def run(vertices: DataFrame, edges: DataFrame, iters: Int,
          scale: Long = DefaultScale): DataFrame =
    runWeighted(vertices,
      edges.toDF("src", "dst").withColumn("w", lit(1L)), iters, scale)

  /** Weighted fixed-point PageRank: contribution along u→v is
    * `(rank(u) · w(u,v)) div Σ_x w(u,x)` — unit weights reduce exactly
    * to the unweighted `rank div deg`. Weights must be POSITIVE BIGINT
    * units (quantize a similarity to integer units first; 6-dp sims ×
    * 1e6 are exact); non-positive weights raise at execution. The
    * decomposed contribution keeps the largest intermediate at `Σw·w`
    * (per-vertex weight mass squared), independent of hub-rank growth.
    *
    * @param edges three-column DataFrame (src, dst, w), DIRECTED
    */
  def runWeighted(vertices: DataFrame, edges: DataFrame, iters: Int,
                  scale: Long = DefaultScale): DataFrame =
    fixedPoint(vertices, edges, iters, scale,
      initRank = _ => lit(scale),
      baseTerm = (_, scale, _) => lit((15L * scale) / 100L),
      danglingSql = n => s"__dang div ${n}L")

  /** Personalized PageRank: the teleport mass — the (1−d) share and
    * all dangling mass — returns to ONE source vertex instead of
    * spreading uniformly, so ranks measure proximity to the source
    * (the similarity-graph re-ranking primitive: "important AND near
    * this document"). Initial mass (N·scale) starts on the source;
    * unreachable vertices decay to exactly 0.
    */
  def runPersonalized(vertices: DataFrame, edges: DataFrame, source: Long,
                      iters: Int, scale: Long = DefaultScale): DataFrame =
    fixedPoint(vertices, edges, iters, scale,
      // total mass N·scale sits on one vertex; the shared fixedPoint
      // require enforces the 100·N·scale < 2⁶³ bound before this runs
      initRank = n =>
        when(col("id") === source, lit(n * scale)).otherwise(lit(0L)),
      baseTerm = (n, scale, _) =>
        when(col("id") === source, lit((15L * scale * n) / 100L))
          .otherwise(lit(0L)),
      danglingSql = _ => s"CASE WHEN id = ${source}L THEN __dang ELSE 0L END")

  /** Shared fixed-point loop. `initRank(n)` seeds the rank column;
    * `baseTerm(n, scale, id)` is the per-vertex teleport term;
    * `danglingSql(n)` is a SQL fragment over columns (id, __dang)
    * yielding each vertex's share of the dangling mass.
    */
  private def fixedPoint(vertices: DataFrame, edges: DataFrame, iters: Int,
                         scale: Long,
                         initRank: Long => Column,
                         baseTerm: (Long, Long, Column) => Column,
                         danglingSql: Long => String): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    // NULL guard catches both missing weights and values that cast to
    // NULL (e.g. non-numeric strings) — without it such edges would be
    // silently dropped by the sum aggregates instead of failing loudly
    val e = edges.toDF("src", "dst", "w")
      .select(col("src").cast("long"), col("dst").cast("long"),
        when(col("w").cast("long").isNull || col("w").cast("long") <= 0,
          raise_error(lit("PageRank: edge weights must be positive " +
            "integer units")).cast("long"))
          .otherwise(col("w").cast("long")).as("w")).cache()
    val sw = e.groupBy(col("src")).agg(sum(col("w")).as("sumw"))
    val v = vertices.select(col(vertices.columns(0)).cast("long").as("id"))
      .distinct()
      .join(sw, col("id") === col("src"), "left")
      .select(col("id"), coalesce(col("sumw"), lit(0L)).as("sumw"))
      .cache()
    val n = v.count()
    if (n == 0)
      return v.withColumn("rank", lit(scale)).select(col("id"), col("rank"))
    // worst-case overflow bound for EVERY variant: total mass ≈ n·scale
    // and a single vertex can in principle receive all of it, so the
    // 85× damping product needs 100·n·scale < 2⁶³. Enforced here (not
    // just documented) so a too-large graph fails loudly instead of
    // silently wrapping ranks; drop `scale` to trade precision for size.
    require(n <= Long.MaxValue / 100L / scale,
      s"PageRank: n*scale = $n*$scale would overflow the 85x damping " +
        "product in the worst case - use a smaller scale")
    var ranks = v.withColumn("rank", initRank(n)).localCheckpoint()
    for (_ <- 1 to iters) {
      // dangling mass as a broadcast single-row aggregate: the whole
      // iteration is ONE job (the localCheckpoint), not a separate
      // driver-side collect per round
      val dang = ranks.filter(col("sumw") === 0)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__dang"))
      val inc = ranks.filter(col("sumw") > 0)
        .join(e, col("id") === col("src"))
        // == (rank * w) div sumw, without the rank-sized product
        .select(col("dst"),
          expr("(rank div sumw) * w + ((rank % sumw) * w) div sumw")
            .as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__in"))
      ranks = v.join(inc, col("id") === col("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("id"), col("sumw"),
          (baseTerm(n, scale, col("id")) +
            expr(s"(85 * (coalesce(__in, 0) + ${danglingSql(n)})) div 100"))
            .as("rank"))
        .localCheckpoint()
    }
    // ranks is localCheckpointed (materialized), so the loop inputs can
    // release executor storage — long-lived sessions would otherwise
    // accumulate one cached edge table per call
    e.unpersist(false)
    v.unpersist(false)
    ranks.select(col("id"), col("rank"))
  }
}
