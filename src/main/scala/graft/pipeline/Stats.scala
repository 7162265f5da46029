package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution sketches over numeric columns.
  *
  * `histogramQuantiles` is the deterministic alternative to
  * `percentile_approx`: Spark's GK-based sketch is merge-order-dependent
  * (different partitionings give different estimates), which makes it
  * impossible to verify cross-engine and non-reproducible run-to-run.
  * An equi-width histogram is a pure function of the data — same bins,
  * same counts, same interpolated estimates on every engine, every
  * cluster size — while keeping the same one-pass, bounded-memory
  * profile (B counters vs GK's O(1/ε) tuples).
  */
object Stats {

  /** Approximate quantiles from a `bins`-bucket equi-width histogram
    * with linear interpolation inside the target bucket (the classic
    * NIST estimator). Two passes: exact min/max/count (one scan), then
    * the binned count aggregate (second scan, map-side combine to B
    * partials). The quantile resolution step runs over B rows — driver
    * -side-tiny at any data scale.
    *
    * Output: (q, bin, est) per requested quantile, `est` rounded 6 dp.
    * Degenerate input (all values equal, mx == mn) maps everything to
    * bin 0 and every quantile to mn.
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, bins: Int,
                         qs: Seq[Double]): DataFrame = {
    require(bins > 1, "need at least 2 bins")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1] — q=0 has no 'first bin reaching 0 mass' " +
        s"(use the min aggregate for it); got $qs")
    val spark = df.sparkSession
    // NULLs carry no value: excluded from both the count and the bins
    val vals = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    // the three scalars are needed as plain numbers in every downstream
    // expression — one scan, collected once (re-referencing the aggregate
    // subtree in two broadcasts would scan the input twice)
    val row = vals.agg(min(col("__v")), max(col("__v")), count(lit(1))).head()
    val n = row.getLong(2)
    if (n == 0) {
      import spark.implicits._
      return Seq.empty[(Double, Int, Double)].toDF("q", "bin", "est")
    }
    val (mn, mx) = (row.getDouble(0), row.getDouble(1))
    val counts = vals
      .select(
        (if (mx == mn) lit(0)
         else least(lit(bins - 1),
           floor((col("__v") - lit(mn)) * lit(bins.toDouble) /
             lit(mx - mn)).cast("int")))
          .as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("__c"))
    val cum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = counts.withColumn("__cum", sum(col("__c")).over(cum))
    val qdf = spark.createDataFrame(qs.map(Tuple1(_))).toDF("q")
    val t = col("q") * lit(n)
    val width = lit(mx - mn) / lit(bins.toDouble)
    binned.crossJoin(broadcast(qdf))
      .filter(col("__cum") >= t && (col("__cum") - col("__c")) < t)
      .select(col("q"), col("bin"),
        round(if (mx == mn) lit(mn)
          else lit(mn) + width *
            (col("bin") + (t - (col("__cum") - col("__c"))) / col("__c")), 6)
          .as("est"))
  }

  /** Per-group histogram quantiles — `histogramQuantiles` with an
    * independent equi-width histogram per group (each group gets its
    * own min/max range and B counters). The group stats stay a
    * DataFrame (group-cardinality rows, equi-joined back), so nothing
    * collects to the driver and group count is unbounded. Same
    * estimator arithmetic as the global form. Rows with a NULL group
    * key or NULL value are excluded (the equi-join back to the group
    * stats cannot address a NULL group).
    */
  def groupedHistogramQuantiles(df: DataFrame, groupCol: String,
                                valueCol: String, bins: Int,
                                qs: Seq[Double]): DataFrame = {
    require(bins > 1, "need at least 2 bins")
    require(qs.forall(q => q > 0.0 && q <= 1.0), s"quantiles in (0, 1]; got $qs")
    val vals = df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && col(groupCol).isNotNull)
    val stats = vals.groupBy(col(groupCol)).agg(
      min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
      count(lit(1)).as("__n"))
    val counts = vals.join(stats, groupCol)
      .select(col(groupCol),
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((col("__v") - col("__mn")) * lit(bins.toDouble) /
              (col("__mx") - col("__mn"))).cast("int")))
          .as("bin"))
      .groupBy(col(groupCol), col("bin")).agg(count(lit(1)).as("__c"))
    val cum = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = counts.withColumn("__cum", sum(col("__c")).over(cum))
      .join(stats, groupCol)
    val qdf = df.sparkSession.createDataFrame(qs.map(Tuple1(_))).toDF("q")
    val t = col("q") * col("__n")
    val width = (col("__mx") - col("__mn")) / lit(bins.toDouble)
    binned.crossJoin(broadcast(qdf))
      .filter(col("__cum") >= t && (col("__cum") - col("__c")) < t)
      .select(col(groupCol), col("q"), col("bin"),
        round(when(col("__mx") === col("__mn"), col("__mn"))
          .otherwise(col("__mn") + width *
            (col("bin") + (t - (col("__cum") - col("__c"))) / col("__c"))), 6)
          .as("est"))
  }

  /** Data-quality expectations audit (the Deequ/dbt-test shape): each
    * rule is a boolean predicate that every row MUST satisfy; the
    * report has one row per rule with its violation count and pass
    * flag. A predicate evaluating to NULL counts as a violation — an
    * expectation that cannot be established is not met (the SQL
    * three-valued-logic trap every hand-rolled check falls into).
    *
    * Scale notes: ALL rules fold into ONE aggregate scan (a conditional
    * sum per rule), map-side combined; the explode to long form runs
    * over a single row of |rules| counters.
    */
  def expectations(df: DataFrame,
                   rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(pred.isNull || !pred, 1L).otherwise(0L)).as(s"__v_$i")
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule_name"), col("__n").as("n_rows"),
          col(s"__v_$i").as("n_violations"),
          (col(s"__v_$i") === 0).as("pass"))
      }: _*)).as("r"))
      .select(col("r.rule_name"), col("r.n_rows"), col("r.n_violations"),
        col("r.pass"))
  }

  /** Exact-arithmetic z-score standardization: z = (x − μ)/σ over the
    * whole column, computed as (n·xᵢ − Σx)/√(n·Σx² − (Σx)²) on integer
    * units (xᵢ = round(value·scale), e.g. scale=100 for cents) with
    * DECIMAL(38,0) sums — no double accumulation, so the statistics
    * are partition- and engine-exact; doubles appear only in the final
    * division, rounded 6 dp. NULL values keep a NULL z. The feature-
    * scaling staple in a form an oracle can replay bit-for-bit.
    *
    * Scale notes: one aggregate scan to a single broadcast stats row +
    * one map-side transform scan — the same two-scan shape as
    * `quantileBins`, no shuffle in the transform.
    */
  def zscore(df: DataFrame, valueCol: String, scale: Int = 100): DataFrame = {
    require(scale > 0, "scale must be positive")
    val xi = round(col(valueCol) * scale).cast("long")
    val withX = df.withColumn("__x", xi)
    val xd = col("__x").cast("decimal(38,0)")
    val stats = withX.agg(
      sum(xd).as("__s"),
      sum(xd * xd).as("__s2"),
      count(col("__x")).as("__n"))
    val varNum = col("__n") * col("__s2") - col("__s") * col("__s")
    withX.crossJoin(broadcast(stats))
      .withColumn("z",
        when(col("__x").isNotNull && varNum > 0,
          round((col("__n") * col("__x").cast("decimal(38,0)") - col("__s"))
            .cast("double") / sqrt(varNum.cast("double")), 6)))
      .select(df.columns.map(col) :+ col("z"): _*)
  }

  /** Approximate-FD profiling (the discovery half of an expectations
    * suite): for each candidate functional dependency det → dep,
    * report ndv(det) vs ndv(det, dep) — the FD holds exactly when they
    * are equal, and the gap counts determinant values with more than
    * one dependent image. The profiling step schema-inference and
    * join-planning tools run before trusting a key.
    *
    * All candidates fold into ONE aggregate scan (Spark compiles the
    * multiple exact COUNT(DISTINCT)s to the Expand strategy — exact
    * but ×|pairs| pre-shuffle rows; at 100 TB swap in the KMV sketch,
    * same trade as `columnProfile`). Columns are assumed non-null for
    * the ndv comparison (Spark's multi-arg countDistinct drops rows
    * with any NULL) — profile nullability first via `columnProfile`.
    */
  def fdProfile(df: DataFrame, deps: Seq[(String, String)]): DataFrame = {
    require(deps.nonEmpty, "need at least one candidate dependency")
    val aggs = deps.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(countDistinct(col(a)).as(s"__da_$i"),
        countDistinct(col(a), col(b)).as(s"__dab_$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(deps.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(a).as("determinant"), lit(b).as("dependent"),
          col(s"__da_$i").as("ndv_det"), col(s"__dab_$i").as("ndv_pair"),
          (col(s"__da_$i") === col(s"__dab_$i")).as("fd_holds"))
      }: _*)).as("r"))
      .select(col("r.determinant"), col("r.dependent"), col("r.ndv_det"),
        col("r.ndv_pair"), col("r.fd_holds"))
  }

  /** Quantile discretizer (fit + transform): bucket every row of
    * `valueCol` into `q` quantile bins. Fit = `histogramQuantiles` at
    * the q-1 interior quantiles (deterministic, cross-engine — unlike
    * `QuantileDiscretizer`'s approxQuantile); the q-1 edges (a model
    * of constant size, like `kmeansFit`'s centroids) collect to the
    * driver and fold into ONE codegen'd map-side expression:
    * bin = count of edges e with value > e, in [0, q-1]. Values exactly on a
    * (6-dp-rounded) edge fall in the LOWER bin on every engine.
    *
    * Scale notes: two scans to fit (min/max + binned counts, both
    * map-side-combined), one scan to transform — no join, no shuffle
    * in the transform path; NULL values get a NULL bin.
    */
  def quantileBins(df: DataFrame, valueCol: String, histBins: Int,
                   q: Int): DataFrame = {
    require(q >= 2, "need at least 2 quantile bins")
    val qs = (1 until q).map(i => i.toDouble / q)
    val edges = histogramQuantiles(df, valueCol, histBins, qs)
      .select(col("est")).collect().map(_.getDouble(0)).sorted
    val v = col(valueCol).cast("double")
    val bin = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(v > lit(e), 1).otherwise(0)
    }
    df.withColumn("bin", when(v.isNotNull, bin))
  }

  /** Join-key skew profile: the diagnostic you run BEFORE deciding
    * whether a join needs salting (`operators.SaltedJoin`) or AQE skew
    * handling. One hash-aggregate to per-key counts, then a tiny
    * summary: key cardinality, total rows, the heaviest key's count,
    * the skew ratio (max/mean — >10 usually means salt), and the top-k
    * heaviest keys with their share of all rows.
    *
    * Output: one row per top-k key, ranked by (count desc, key asc),
    * each carrying the global summary columns alongside.
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt")).cache()
    // single-row global summary + TakeOrderedAndProject top-k: no global
    // window, so the per-key count table never collapses to one partition
    // even at billions of keys
    val summary = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_count"))
    val ord = Window.orderBy(col("cnt").desc, col("key").asc)
    counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
      .crossJoin(broadcast(summary))
      .withColumn("rank", row_number().over(ord))
      .select(
        col("rank"), col("key"), col("cnt"),
        col("n_keys"), col("total_rows"), col("max_count"),
        round(col("max_count").cast("double") /
          (col("total_rows").cast("double") / col("n_keys").cast("double")), 6)
          .as("skew_ratio"),
        round(col("cnt").cast("double") / col("total_rows").cast("double"), 6)
          .as("share"))
  }

  /** ANALYZE-style per-column optimizer statistics in ONE scan: row
    * count, non-null count, exact distinct count, min and max
    * (stringified into the uniform long-form schema). This is the
    * profile a cost-based planner (or a pipeline auditing a new data
    * drop) collects before choosing join orders and salting — the
    * `Stats` companion to `keySkewProfile`.
    *
    * Scale: one pass; the multiple exact COUNT(DISTINCT)s compile to
    * Spark's Expand strategy (one input row fans out per distinct
    * aggregate) — exact but ×|cols| pre-shuffle rows. At 100 TB swap
    * exact ndv for the KMV sketch aggregate (`functions.KmvSketch`,
    * q56) — same shape, constant-size state; exact is the oracle-able
    * default.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col("__n").as("n_rows"),
          col(s"__nn_$c").as("n_nonnull"), col(s"__ndv_$c").as("ndv"),
          col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
      }: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nonnull"),
        col("p.ndv"), col("p.min_value"), col("p.max_value"))
  }

  /** Profile drift between two table versions/slices — the
    * schema-statistics monitoring op (did a backfill change NDVs?
    * did a new code path widen a value range?): [[columnProfile]] of
    * both sides joined per column, with the NDV ratio and a
    * range-stability flag. Both profiles are single-aggregate scans;
    * the join is |columns|-row.
    */
  def profileDrift(a: DataFrame, b: DataFrame,
                   cols: Seq[String]): DataFrame = {
    val pa = columnProfile(a, cols).select(col("col_name"),
      col("n_rows").as("n_a"), col("n_nonnull").as("nonnull_a"),
      col("ndv").as("ndv_a"), col("min_value").as("min_a"),
      col("max_value").as("max_a"))
    val pb = columnProfile(b, cols).select(col("col_name"),
      col("n_rows").as("n_b"), col("n_nonnull").as("nonnull_b"),
      col("ndv").as("ndv_b"), col("min_value").as("min_b"),
      col("max_value").as("max_b"))
    pa.join(pb, "col_name")
      .withColumn("ndv_ratio",
        round(col("ndv_a").cast("double") / col("ndv_b").cast("double"), 6))
      .withColumn("range_stable",
        col("min_a") === col("min_b") && col("max_a") === col("max_b"))
  }

  /** Winsorize: clamp `valueCol` to its [pLow, pHigh] quantile band —
    * the standard outlier-trimming transform before scaling/training.
    * Bounds come from the deterministic histogram-quantile estimator
    * (`histogramQuantiles`, 6-dp rounded — engine-exact), so the
    * clamped values are bit-reproducible; inside the band the raw value
    * passes through untouched.
    *
    * Cost: the estimator's two scans + ONE map-side clamp scan with the
    * two bounds broadcast as a single stat row (the q95/q139 pattern) —
    * three scans total at any scale, no extra shuffle.
    */
  def winsorize(df: DataFrame, valueCol: String, bins: Int,
                pLow: Double, pHigh: Double): DataFrame = {
    require(pLow > 0.0 && pLow < pHigh && pHigh <= 1.0,
      "need 0 < pLow < pHigh <= 1")
    val lims = histogramQuantiles(df, valueCol, bins, Seq(pLow, pHigh))
      .agg(min(when(col("q") === pLow, col("est"))).as("__lo"),
        max(when(col("q") === pHigh, col("est"))).as("__hi"))
    df.crossJoin(broadcast(lims))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Inclusion-dependency (candidate foreign key) profile: what share
    * of `child.childCol`'s distinct non-NULL values appear in
    * `parent.parentCol` — containment 1.0 means the FK would validate.
    * The schema-discovery companion of `fdProfile` (functional
    * dependencies within a table; this is references ACROSS tables).
    *
    * One distinct per side + one left equi-join + one aggregate —
    * key-cardinality work, not row-cardinality; `containment` is one
    * IEEE division of exact integers rounded 6 dp.
    */
  /** Order-invariant table checksum — the replication/data-diff
    * equality primitive (two replicas are row-identical iff (n_rows,
    * checksum) match, up to the astronomically unlikely md5-sum
    * collision): each row's caller-supplied canonical fingerprint
    * hashes to a 60-bit md5 fold, the folds SUM exactly in
    * DECIMAL(38,0) (commutative — no ordering, no global sort), and
    * the result reduces mod 2⁶⁰. One scan, map-side partial sums, a
    * single-row output; the cheap pre-check before a full
    * `SnapshotDiff`.
    */
  def tableChecksum(df: DataFrame, name: String,
                    fingerprint: Column): DataFrame = {
    val lim = 1L << 60
    val h = conv(substring(md5(fingerprint), 1, 15), 16, 10).cast("long")
    df.agg(count(lit(1)).as("n_rows"),
        sum(h.cast("decimal(38,0)")).as("__sum"))
      .select(lit(name).as("table_name"), col("n_rows"),
        pmod(col("__sum"), lit(lim).cast("decimal(38,0)")).cast("long")
          .as("checksum"))
  }

  /** Benford first-digit audit — the classic fabricated-numbers screen
    * (naturally-occurring multiplicative quantities follow
    * P(d) = log₁₀(1 + 1/d); fabricated or constrained ones usually
    * don't). `cents` must be a POSITIVE integer column (quantize
    * currency first: `round(x*100).cast("long")` — the first
    * significant digit survives the shift, and the string route avoids
    * the float-log₁₀ boundary bug at exact powers of ten).
    *
    * One hash aggregate on a 9-value key + a broadcast total; share,
    * expectation and deviation are single double expressions rounded
    * 6 dp.
    */
  def benfordProfile(df: DataFrame, cents: Column): DataFrame = {
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val counts = df.filter(cents > 0)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__total").cast("double"), 6)
          .as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("benford"),
        round(col("n").cast("double") / col("__total").cast("double") -
          log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("deviation"))
  }

  /** Population-stability-index (PSI) profile between two slices of a
    * numeric column — THE production ML drift monitor (is the serving
    * distribution still the training distribution?). Equal-width bins
    * over the combined [min, max] (the q95 histogram convention),
    * add-one smoothing on both slices (empty bins stay finite), and a
    * per-bin contribution (p_a − p_b)·ln(p_a/p_b) in integer nano
    * units with the termDrift operand-order discipline — Σ psi_nano
    * over bins ≈ the PSI (>0.2·10⁹ is the classic "investigate" bar).
    *
    * Scale: one stats row broadcast + one bin-keyed aggregate + one
    * totals row broadcast — two scans of the column, constant-size
    * everything else.
    */
  def psiProfile(df: DataFrame, valueCol: String, slicePred: Column,
                 bins: Int): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val base = df.select(col(valueCol).cast("double").as("__v"),
      slicePred.as("__a")).filter(col("__v").isNotNull)
    val stats = base.agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    val binned = base.crossJoin(broadcast(stats))
      .withColumn("bin", when(col("__mx") === col("__mn"), lit(0))
        .otherwise(least(lit(bins - 1),
          floor((col("__v") - col("__mn")) * lit(bins.toDouble) /
            (col("__mx") - col("__mn"))).cast("int"))))
    val c = binned.groupBy(col("bin")).agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("c_a"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("c_b"))
    val tot = c.agg(sum(col("c_a")).as("__na"), sum(col("c_b")).as("__nb"),
      count(lit(1)).as("__k"))
    c.crossJoin(broadcast(tot))
      .withColumn("psi_nano", round(
        (((col("c_a") + 1).cast("double") /
            (col("__na") + col("__k")).cast("double")) -
          ((col("c_b") + 1).cast("double") /
            (col("__nb") + col("__k")).cast("double"))) *
        log(((col("c_a") + 1) * (col("__nb") + col("__k"))).cast("double") /
          ((col("c_b") + 1) * (col("__na") + col("__k"))).cast("double")) *
        lit(1e9)).cast("long"))
      .select("bin", "c_a", "c_b", "psi_nano")
  }

  /** [[auc]] per group — the fairness/segmentation audit (does the
    * scorer rank equally well for every cohort?). Identical midrank
    * machinery with the running sum PARTITIONED by group; one row per
    * group.
    */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol), col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__c"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("__cum", sum(col("__c")).over(w))
      .groupBy(col(groupCol))
      .agg(
        sum((col("__p") * (lit(2L) * col("__cum") - col("__c") + lit(1L)))
          .cast("decimal(38,0)")).as("__s2"),
        sum(col("__p")).as("pos_n"),
        sum(col("__c") - col("__p")).as("neg_n"))
      .select(col(groupCol), col("pos_n"), col("neg_n"),
        round((col("__s2") - (col("pos_n") * (col("pos_n") + lit(1L)))
            .cast("decimal(38,0)")).cast("double") /
          (lit(2.0) * col("pos_n").cast("double") *
            col("neg_n").cast("double")), 6).as("auc"))
  }

  /** Gini concentration coefficient per group over a non-negative
    * integer column — the inequality metric (how concentrated is
    * revenue across orders? token mass across documents?). Exact
    * arithmetic: values take a (value, tie) total order per group,
    * Σ rank·value and Σ value ride DECIMAL(38,0), and
    * G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) is one IEEE division at the
    * end. One per-group window + one aggregate over the same Exchange.
    */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
                  tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(tieCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("decimal(38,0)")).as("__sx"),
        sum((col("__rn").cast("decimal(38,0)") * col(valueCol)))
          .as("__srx"))
      .select(col(groupCol), col("n_rows"),
        round((lit(2L) * col("__srx") - (col("n_rows") + lit(1L)) *
            col("__sx")).cast("double") /
          (col("n_rows").cast("double") * col("__sx").cast("double")), 6)
          .as("gini"))
  }

  /** Exact per-group LOWER median of an integer column — the robust
    * central tendency the (approximate) histogram quantiles can't
    * guarantee: position ⌈n/2⌉ of the group's sorted values, the same
    * deterministic convention as the Theil-Sen median (no averaging of
    * middle pairs, so the result is always an attained value and
    * engines can't disagree on a half-sum). `tieCol` must make
    * (value, tie) a total order within each group.
    *
    * Scale: one per-group window rank + count over the SAME Exchange,
    * one filter — row-count work partitioned by group, no global sort.
    */
  def groupedMedian(df: DataFrame, groupCol: String, valueCol: String,
                    tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(tieCol).asc)
    val cw = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(cw))
      .filter(col("__rn") === expr("(__cnt + 1) div 2"))
      .select(col(groupCol), col("__cnt").as("n_rows"),
        col(valueCol).as("median"))
  }

  /** Exact ROC AUC of an integer score against a boolean label — the
    * Mann-Whitney rank-sum with midrank tie handling, the standard
    * offline evaluation of any quality/toxicity/relevance scorer used
    * as a curation gate.
    *
    * Shape: one hash aggregate collapses rows to (score → count,
    * positives), one running-sum window over the DISTINCT-score table
    * assigns midranks, one final aggregate folds the rank sum. The
    * window is partitionless but runs over distinct quantized scores —
    * bounded by the score CODOMAIN (here: integer cents of a 2-dp
    * metric), a constant of the data model like histogram bins or
    * calendar periods, never the row count.
    *
    * Exactness: 2·midrank(s) = 2·cum(s) − count(s) + 1 stays integer;
    * sums ride DECIMAL(38,0) (rank sums reach n² — past int64 at
    * cluster scale); AUC = (Σ 2r·p − P(P+1)) / (2PN) is one IEEE
    * division at the end.
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__c"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = g.withColumn("__cum", sum(col("__c")).over(w))
    ranked.agg(
        sum((col("__p") * (lit(2L) * col("__cum") - col("__c") + lit(1L)))
          .cast("decimal(38,0)")).as("__s2"),
        sum(col("__p")).as("pos_n"),
        sum(col("__c") - col("__p")).as("neg_n"))
      .select(col("pos_n"), col("neg_n"),
        round((col("__s2") - (col("pos_n") * (col("pos_n") + lit(1L)))
            .cast("decimal(38,0)")).cast("double") /
          (lit(2.0) * col("pos_n").cast("double") *
            col("neg_n").cast("double")), 6).as("auc"))
  }

  def inclusionDep(name: String, child: DataFrame, childCol: String,
                   parent: DataFrame, parentCol: String): DataFrame = {
    val c = child.select(col(childCol).cast("long").as("v"))
      .filter(col("v").isNotNull).distinct()
    val p = parent.select(col(parentCol).cast("long").as("v"))
      .filter(col("v").isNotNull).distinct()
      .withColumn("__hit", lit(1))
    c.join(p, Seq("v"), "left")
      .agg(count(lit(1)).as("n_distinct"),
        count(when(col("__hit").isNull, 1)).as("n_missing"))
      .select(lit(name).as("dep"), col("n_distinct"), col("n_missing"),
        round(lit(1.0) - col("n_missing").cast("double") /
          col("n_distinct").cast("double"), 6).as("containment"))
  }
}
