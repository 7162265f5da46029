package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data curation.
  *
  * `rand()`-based sampling is non-reproducible across runs, partitions
  * and engines; the staple at corpus scale is a HASH GATE: bucket =
  * md5(key) reduced to 0..999, keep the row iff bucket < rate‰. The
  * same row lands in the same split on every engine, every run, every
  * repartition — which is what makes train/validation splits, corpus
  * down-sampling and A/B slices auditable. Pure map-side expression:
  * no shuffle, runs at scan speed at 100 TB, and the filter sits
  * directly above the scan for pushdown-adjacent pruning.
  */
object Sampling {

  /** Stable per-key bucket in [0, 1000): fold of the first 15 hex chars
    * of md5 (60 bits — overflow-free int64), mod 1000. Same arithmetic
    * as TextFunctions.md5Long, different modulus.
    */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(1000L))

  /** Uniform deterministic sample: keep rows with bucket < permille. */
  def sampleByHash(df: DataFrame, key: Column, permille: Int): DataFrame =
    df.filter(hashBucket(key) < permille)

  /** Mix-flattening sample: deterministically down-sample every group
    * (e.g. source × lang) to ≈ the SMALLEST group's size — the applied
    * form of `Corpus.domainMixWeights`. Per-group keep-permille =
    * (1000 · min_count) div count — exact integer arithmetic — then the
    * usual md5 hash gate. The permille clamps to ≥ 1 so a group more
    * than 1000× the smallest is still *represented* (at the gate's 1‰
    * floor) rather than silently vanishing. Group rates are a broadcast
    * join (group-count rows); the gate itself stays a map-side scan
    * filter.
    */
  def rebalancedSample(df: DataFrame, key: Column,
                       groupCols: Seq[String]): DataFrame = {
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val rates = counts
      .withColumn("__minn", min(col("__n")).over(w))
      .select(groupCols.map(col) :+
        greatest(lit(1L), expr("(1000 * __minn) div __n"))
          .as("__permille"): _*)
    df.join(broadcast(rates), groupCols)
      .filter(hashBucket(key) < col("__permille"))
      .select(df.columns.map(col): _*)
  }

  /** Leakage-safe split assignment: rows are assigned to
    * train/val/test by GROUP (near-dup cluster, user, session, …) so
    * no group straddles a split boundary — the contamination guard
    * every eval pipeline needs (a near-duplicate of a training doc in
    * the test set is a leak, not a holdout). `splits` are (name,
    * permille) and must sum to 1000; assignment is a cumulative gate
    * over the md5 bucket of the GROUP id — deterministic,
    * partition-invariant, and stable under re-runs/backfills.
    *
    * Scale: one codegen'd CASE over a map-side hash — zero extra
    * shuffles beyond whatever produced the group column.
    */
  def groupSplit(df: DataFrame, groupCol: String,
                 splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 1000,
      "split permilles must sum to 1000")
    val b = hashBucket(col(groupCol))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val assigned = splits.zip(cum).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((name, _), hi)) => when(b < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Deterministic k exemplars per group: rank rows inside each group
    * by the md5 of their key (a reproducible shuffle) and keep the
    * first k — "show me 3 random-but-stable examples per source", the
    * eyeball-QA staple. The window sorts group-locally; no global sort.
    *
    * `key` is the ranking identity and must be unique per row —
    * duplicate keys tie on both sort expressions and their relative
    * order is then partition-dependent. Adds a `rank` column; rejects
    * inputs that already have one rather than silently overwriting it.
    */
  def topKPerGroup(df: DataFrame, key: Column, groupCols: Seq[String],
                   k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    require(!df.columns.contains("rank"),
      "input already has a 'rank' column — rename it before topKPerGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(md5(key.cast("string")).asc, key.asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Stratified deterministic sample: per-stratum keep-rates (‰),
    * unknown strata fall back to `defaultPermille`. The rate map is a
    * literal CASE expression — broadcast-free, codegen'd.
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Int],
                       defaultPermille: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(key) < rate)
  }

  /** Importance-resampling gate — the EXECUTION half of DSIR data
    * selection (`Corpus.dsirWeights` computes per-document log-ratio
    * weights; this keeps documents with probability ∝ exp(weight),
    * targeting `targetPermille`‰ of the corpus overall). The paper
    * samples by Gumbel top-k; the reproducible engine form is the
    * hash gate with a per-row acceptance rate:
    * permille = min(1000, targetPermille · e / ē) where
    * e = round(exp(clamp(w, ±5)) · 10⁶) and ē = exact integer mean.
    *
    * Determinism: exp quantizes to integer micro-units per row, the
    * normalizer is an integer `div` of an exact integer sum (no
    * double accumulation anywhere), and the gate is the standard md5
    * bucket — partition- and engine-invariant. The ±5 clamp bounds
    * both the tail influence of extreme ratios (standard practice)
    * and the integer arithmetic (max term 1000·e⁵·10⁶ ≈ 1.5×10¹¹).
    *
    * Scale: the stats row broadcasts; the gate is a map-side filter
    * over the weights table — one scan at any corpus size.
    */
  /** Deterministic weighted sampling WITHOUT replacement: priority
    * sampling (Duffield, Lund & Thorup, JACM 2007). Each row draws a
    * reproducible uniform u ∈ (0, 2⁶⁰] from md5(key) and gets priority
    * w/u; the sample is the k highest-priority rows — heavier rows
    * win systematically, every row keeps a nonzero chance, and the
    * estimator properties of priority sampling carry over.
    *
    * Engine-portable total order: maximizing w/u = minimizing u/w, so
    * rows rank by the exact BIGINT `prio = u div w_micro` ascending
    * (w in round-half-up micro-units), tie-broken by (u, key). No
    * doubles anywhere — the order, and therefore the selected set, is
    * partition-, run- and engine-invariant. Rows with w ≤ 0 are
    * excluded (a zero-weight row must never be sampled; a negative
    * weight is meaningless here).
    *
    * Scale notes: the gate is one map-side expression; the top-k is
    * `orderBy().limit(k)` = TakeOrderedAndProject — per-partition heaps
    * of k rows + a k-row driver merge, no global sort at any scale.
    */
  def prioritySample(df: DataFrame, key: Column, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    // 60-bit uniform from the md5 fold (same arithmetic family as
    // hashBucket, full width instead of mod 1000); +1 keeps u > 0
    val u = conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long") + lit(1L)
    val wMicro = round(col(weightCol) * lit(1e6)).cast("long")
    df.withColumn("__u", u).withColumn("__w", wMicro)
      .filter(col("__w") > 0)
      .withColumn("prio", expr("__u div __w"))
      .orderBy(col("prio").asc, col("__u").asc, key.asc)
      .limit(k)
      .select(df.columns.map(col) :+ col("prio"): _*)
  }

  /** Per-group priority sampling: the [[prioritySample]] order (exact
    * BIGINT u div w priorities — Duffield-Lund-Thorup without-
    * replacement semantics) ranked INSIDE each group — "k weighted
    * exemplars per stratum", the stratified form of the weighted
    * sampler. One per-group window over the same deterministic
    * priority key; no global sort, no doubles in the order.
    */
  def prioritySamplePerGroup(df: DataFrame, key: Column, weightCol: String,
                             groupCols: Seq[String], k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    val u = conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long") + lit(1L)
    val wMicro = round(col(weightCol) * lit(1e6)).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__prio").asc, col("__u").asc, key.asc)
    df.withColumn("__u", u).withColumn("__w", wMicro)
      .filter(col("__w") > 0)
      .withColumn("__prio", expr("__u div __w"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(df.columns.map(col) ++ Seq(col("__prio").as("prio"),
        col("rank")): _*)
  }

  def importanceResample(df: DataFrame, key: Column, weightCol: String,
                         targetPermille: Int): DataFrame = {
    require(targetPermille >= 0 && targetPermille <= 1000,
      "targetPermille is a permille rate")
    val e = round(exp(least(greatest(col(weightCol), lit(-5.0)), lit(5.0)))
      * lit(1e6)).cast("long")
    // materialize the (narrow) weights projection ONCE: both the
    // normalizer aggregate and the gate read it, and the upstream
    // weight computation (e.g. the whole DSIR pipeline) must not run
    // twice (the r4-verdict recompute pattern)
    val withE = df.withColumn("__e", e).localCheckpoint()
    val stats = withE.agg(sum(col("__e")).as("__se"), count(lit(1)).as("__n"))
    withE.crossJoin(broadcast(stats))
      .withColumn("keep_permille",
        least(lit(1000L), expr(s"($targetPermille * __e) div (__se div __n)")))
      .filter(hashBucket(key) < col("keep_permille"))
      .select(df.columns.map(col) :+ col("keep_permille"): _*)
  }
}
