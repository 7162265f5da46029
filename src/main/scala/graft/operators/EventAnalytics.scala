package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analysis — the two classic
  * event-analytics primitives (the product-analytics layer a warehouse
  * serves) expressed as equi-join + hash-aggregate chains.
  *
  * Scale notes: each funnel step is one filtered scan + an equi-join
  * against the (user, time) table of the PREVIOUS step + a min
  * aggregate — per-step cost proportional to that step's events, state
  * per user one timestamp; retention is two hash aggregates and one
  * broadcast-joinable cohort-size table. No windows over user
  * histories, no per-user sequence materialization.
  */
object EventAnalytics {

  /** Strictly-ordered funnel: for each user, t1 = first `steps(0)`
    * event; tᵢ = first `steps(i-1)` event AT OR AFTER tᵢ₋₁. A user
    * appears iff they completed step 1; later columns are null from
    * the first uncompleted step on (the standard "ordered funnel"
    * semantics — re-orderings don't count, repeats are free).
    * Output: (userCol, t1 .. tN) with tᵢ in `tsCol`'s units.
    */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "a funnel needs at least one step")
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    for ((st, i) <- steps.tail.zipWithIndex) {
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      val next = events.filter(col(typeCol) === st)
        .join(acc.select(col(userCol), col(prev)), Seq(userCol))
        .filter(col(tsCol) >= col(prev))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
      acc = acc.join(next, Seq(userCol), "left")
    }
    acc
  }

  /** Funnel step report: per step, users reaching it and the
    * conversion rate from the previous step — the dashboard table over
    * [[funnelTimes]]'s per-user rows. One extra single-row aggregate +
    * a |steps|-row explode; rate is one IEEE division, NULL for the
    * entry step.
    */
  def funnelRates(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    val ft = funnelTimes(events, userCol, tsCol, typeCol, steps)
    val aggs = steps.indices.map(i =>
      count(col(s"t${i + 1}")).as(s"__n${i + 1}"))
    ft.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(steps.indices.map { i =>
        struct(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
          col(s"__n${i + 1}").as("n_users"),
          (if (i == 0) lit(null).cast("double")
           else round(col(s"__n${i + 1}").cast("double") /
             col(s"__n$i").cast("double"), 6)).as("rate"))
      }: _*)).as("r"))
      .select("r.*")
  }

  /** DAU/WAU stickiness: per period, the distinct-active count and the
    * trailing-`window`-period distinct-active count, plus their ratio
    * (the classic engagement metric). The trailing window is computed
    * WITHOUT a range join: each (period, user) activity row explodes
    * into the `window` future periods it is visible to, then one hash
    * aggregate per side — pure equi-join shapes that scale with
    * activity × window, never days × activity.
    */
  def stickiness(events: DataFrame, userCol: String, tsCol: String,
                 periodLength: Long, window: Int = 7): DataFrame = {
    require(periodLength > 0 && window >= 1, "positive period and window")
    val du = events
      .select(expr(s"$tsCol div $periodLength").as("day"),
        col(userCol).as("__u"))
      .distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"),
        col("day") + lit(window - 1))).as("day"), col("__u"))
      .groupBy(col("day")).agg(countDistinct(col("__u")).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 6)
          .as("stickiness"))
  }

  /** SCD Type-2 history from an ordered change log: per key, collapse
    * consecutive repeats of `stateCol` and assign each surviving state
    * its validity interval — valid_from = its first timestamp,
    * valid_to = the next state's valid_from (NULL while current, the
    * open interval every dimension-table reader joins with
    * `valid_to IS NULL OR ts < valid_to`). The warehouse-history
    * staple that complements `CdcMerge` (which keeps only the latest
    * image).
    *
    * Scale notes: two window passes over the SAME per-key partition —
    * one lag to drop no-change rows, one lead on the (smaller)
    * collapsed set — Spark plans a single Exchange on the key; state
    * per partition is one previous row.
    */
  def scd2History(log: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val collapsed = log
      .withColumn("__prev_state", lag(col(stateCol), 1).over(w))
      .filter(col("__prev_state").isNull ||
        col("__prev_state") =!= col(stateCol))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    collapsed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(stateCol).as("state"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Dense period spine (gap filling): re-grid the per-(key, period)
    * aggregate onto EVERY period between each key's first and last
    * activity, zero-filling the holes — the densification step that
    * makes trailing-window statistics (q130) and chart series
    * well-defined on calendar basis rather than observed basis.
    *
    * Scale notes: the spine explodes one row per (key, active-span
    * period) — proportional to the OUTPUT, not to raw events; the fill
    * is one left equi-join on (key, period). The raw scan is the same
    * single hash aggregate as the sparse series.
    */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              periodLength: Long): DataFrame = {
    require(periodLength > 0, "periodLength must be positive")
    val sparse = events
      .groupBy(col(keyCol), expr(s"$tsCol div $periodLength").as("period"))
      .agg(count(lit(1)).as("n"))
    val spine = sparse.groupBy(col(keyCol))
      .agg(min(col("period")).as("__lo"), max(col("period")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("period"))
    spine.join(sparse, Seq(keyCol, "period"), "left")
      .select(col(keyCol), col("period"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Growth accounting: per period, distinct actives (dau), first-time
    * users (new), returning = dau − new, and the cumulative user base.
    * The running sum is a window over the per-period aggregate — days,
    * not events — so the single-partition tail is bounded by the
    * calendar, never the data.
    */
  def growthAccounting(events: DataFrame, userCol: String, tsCol: String,
                       periodLength: Long): DataFrame = {
    require(periodLength > 0, "periodLength must be positive")
    val du = events
      .select(expr(s"$tsCol div $periodLength").as("period"),
        col(userCol).as("__u"))
      .distinct()
    val dau = du.groupBy(col("period")).agg(count(lit(1)).as("dau"))
    val firsts = du.groupBy(col("__u")).agg(min(col("period")).as("period"))
      .groupBy(col("period")).agg(count(lit(1)).as("new_users"))
    val cum = Window.orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dau.join(firsts, Seq("period"), "left")
      .select(col("period"), col("dau"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("returning", col("dau") - col("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(cum))
  }

  /** Markov transition matrix over the event stream: for every ordered
    * pair of consecutive events of the same user (ordered by `tsCol`,
    * tie-broken by `idCol`), count the (prev_type → next_type)
    * transition and its probability among all transitions leaving
    * prev_type. The behavioral-modeling staple: "after a click, what
    * happens next?".
    *
    * Scale notes: the lag window partitions BY USER — state is one
    * user's history, never the stream; the transition aggregate is at
    * most |types|² rows, and the per-prev normalizer joins back on that
    * tiny table (broadcast). `p` is one double division of exact
    * integer counts, rounded 6 dp.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val trans = events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("__tot"))
    trans.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("p"))
  }

  /** Trailing-window anomaly score for the per-(period, key) activity
    * series: each (key, period) count is z-scored against the trailing
    * `window` OBSERVED periods of the same key (rows-based window over
    * the aggregated series — periods with zero events carry no row and
    * are skipped, the "present-day basis" documented semantics).
    *
    * All window sums are exact BIGINT (Σx, Σx², w); the population
    * z-score — z = (x − μ)/σ with μ = Σx/w, σ² = (w·Σx² − (Σx)²)/w²,
    * which simplifies to z = (w·x − Σx) / √(w·Σx² − (Σx)²) — touches
    * doubles only in the final sqrt/division, rounded 6 dp, and is
    * NULL for a zero-variance window (including w = 1).
    *
    * Scale notes: the window runs over the AGGREGATED series — periods
    * × keys rows, not raw events — so partitions are per-key series,
    * tiny at any raw-data scale; the raw scan is one hash aggregate.
    */
  def rollingAnomaly(events: DataFrame, keyCol: String, tsCol: String,
                     periodLength: Long, window: Int = 7): DataFrame = {
    require(periodLength > 0 && window >= 2, "positive period, window >= 2")
    val daily = events
      .groupBy(col(keyCol), expr(s"$tsCol div $periodLength").as("period"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("period"))
      .rowsBetween(-(window - 1), 0)
    val scored = daily
      .withColumn("w_n", count(lit(1)).over(w))
      .withColumn("w_sum", sum(col("n")).over(w))
      .withColumn("w_sumsq", sum(col("n") * col("n")).over(w))
    // var·w² = w·Σx² − (Σx)² — exact integers; z's numerator w·x − Σx too.
    // z_num/z_den2 carry those integers verbatim (z = z_num/√z_den2):
    // the cross-engine contract compares THEM — int64-exact in any
    // DuckDB/pyarrow version — while z stays for human consumption.
    val varw2 = col("w_n") * col("w_sumsq") - col("w_sum") * col("w_sum")
    scored.select(col(keyCol), col("period"), col("n"), col("w_n"), col("w_sum"),
      (col("w_n") * col("n") - col("w_sum")).cast("long").as("z_num"),
      varw2.cast("long").as("z_den2"),
      when(varw2 > 0,
        round((col("w_n") * col("n") - col("w_sum")).cast("double") /
          sqrt(varw2.cast("double")), 6))
        .as("z"))
  }

  /** Top-k most common length-`pathLen` event-type sequences within
    * sessions (30-min-gap sessionization, the q61 machinery): the
    * "what do users actually do" path-analysis staple. Sessions bound
    * the sequences — a path never crosses a session gap.
    *
    * Plan shape: one per-user window pass assigns session ids (lag +
    * running sum), the SAME partition-by-user window computes the
    * leads (no second shuffle — Spark reuses the user exchange), a
    * session-equality filter keeps in-session windows, then one hash
    * aggregate + TakeOrderedAndProject top-k; rank attaches after
    * `.limit(topK)` so the global window orders k rows, not the
    * distinct-path table (the q100 pattern).
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, typeCol: String, gapNs: Long,
               pathLen: Int = 3, topK: Int = 20): DataFrame = {
    require(pathLen >= 2 && topK >= 1, "pathLen >= 2 and topK >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessioned = events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(cum))
    val withLeads = (1 until pathLen).foldLeft(
      sessioned.withColumn("__t0", col(typeCol))
        .withColumn("__sid_end", col("__sid"))) { (df, i) =>
      df.withColumn(s"__t$i", lead(col(typeCol), i).over(w))
        .withColumn("__sid_end", lead(col("__sid"), i).over(w))
    }
    val path = concat_ws(">", (0 until pathLen).map(i => col(s"__t$i")): _*)
    withLeads
      .filter(col(s"__t${pathLen - 1}").isNotNull &&
        col("__sid_end") === col("__sid"))
      .groupBy(path.as("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("path").asc)))
      .select(col("rank"), col("path"), col("n"))
  }

  /** Cohort retention: users cohort by the period (integer
    * `tsCol div periodLength`) of their FIRST event; for every
    * (cohort, periods-since-cohort) cell, the number of distinct
    * active users and the retention share of the cohort. `retention`
    * is one double division of exact integers, rounded 6 dp.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      periodLength: Long): DataFrame = {
    require(periodLength > 0, "periodLength must be positive")
    // integer `div`, not `/` (double division) — matches the oracle's
    // floor division exactly on the non-negative timestamp domain
    val firsts = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__t0"))
      .select(col(userCol), expr(s"__t0 div $periodLength").as("cohort"))
    val sizes = firsts.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    val active = events
      .select(col(userCol), expr(s"$tsCol div $periodLength").as("__p"))
      .join(firsts, Seq(userCol))
      .groupBy(col("cohort"), (col("__p") - col("cohort")).as("period"))
      .agg(countDistinct(col(userCol)).as("n_active"))
    active.join(sizes, "cohort")
      .select(col("cohort"), col("period"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
  }

  /** First-touch / last-touch conversion attribution: for every
    * `convType` event, the earliest and the latest preceding (or
    * simultaneous) event whose type is in `touchTypes`, per user — the
    * marketing-attribution primitive ("which channel opened the path,
    * which channel closed it").
    *
    * One window partition per user ordered by (`tsCol`, `idCol`) with
    * an explicit ROWS frame carries the running first/last touch as
    * `first/last(..., ignoreNulls)` over touch-conditional columns —
    * the three first_* (and three last_*) projections read the SAME
    * ordered frame, so they always describe the same touch row
    * ((ts, id) is a total order: no peers, no ambiguity). Single
    * Exchange on the user key; per-user state inside the window is one
    * running row. NULL touch columns = a conversion with no prior
    * touch (organic).
    *
    * Output: (userCol, conv_id, conv_ns, first_id, first_ns,
    * first_type, last_id, last_ns, last_type).
    */
  /** Theil–Sen robust trend per key: slope = the (lower) median of all
    * pairwise slopes between period points of the key's activity
    * series — the outlier-immune "is this metric drifting" answer (one
    * anomalous day moves a least-squares fit, not a pairwise median).
    *
    * The pair join runs over the AGGREGATED (key, period, n) series —
    * O(periods²) per key, bounded by the calendar (a year of days is
    * ~365 rows → ~66k pairs), never by event volume. Slopes are one
    * IEEE division of exact integers rounded 6 dp; the median picks
    * row (cnt+1) div 2 under the total order (slope, p_a, p_b) — a
    * per-key window over pair-cardinality rows.
    *
    * Output: (key, n_periods, n_pairs, slope) per key with ≥ 2 periods.
    */
  def theilSenTrend(events: DataFrame, keyCol: String, tsCol: String,
                    periodLength: Long): DataFrame = {
    require(periodLength > 0, "periodLength must be positive")
    val series = events
      .select(col(keyCol).as("k"), expr(s"$tsCol div $periodLength").as("p"))
      .groupBy(col("k"), col("p")).agg(count(lit(1)).as("n"))
    val a = series.select(col("k"), col("p").as("p_a"), col("n").as("n_a"))
    val b = series.select(col("k"), col("p").as("p_b"), col("n").as("n_b"))
    val pairs = a.join(b, Seq("k")).filter(col("p_a") < col("p_b"))
      .withColumn("slope",
        round((col("n_b") - col("n_a")).cast("double") /
          (col("p_b") - col("p_a")).cast("double"), 6))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("slope").asc, col("p_a").asc, col("p_b").asc)
    val wc = Window.partitionBy(col("k"))
    pairs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .filter(col("__rn") === expr("(__cnt + 1) div 2"))
      .join(series.groupBy(col("k")).agg(count(lit(1)).as("n_periods")), "k")
      .select(col("k").as(keyCol), col("n_periods"),
        col("__cnt").as("n_pairs"), col("slope"))
  }

  /** LOCF (last observation carried forward) fill: re-grid each key's
    * value series onto its dense period spine (the `gapFill` spine) and
    * fill empty periods with the latest earlier observation — the
    * sensor/price-series imputation standard. The per-period
    * observation is the LAST event in the period under the (ts, id)
    * total order; leading holes (before the first observation) stay
    * NULL.
    *
    * One per-key window pass over spine-sized data after one period
    * aggregate and one spine equi-join — the gapFill cost plus a
    * window; per-key state in the fill window is one value.
    *
    * Output: (keyCol, period, value, was_filled).
    */
  def locfFill(events: DataFrame, keyCol: String, tsCol: String,
               idCol: String, valueCol: String,
               periodLength: Long): DataFrame = {
    require(periodLength > 0, "periodLength must be positive")
    val wp = Window
      .partitionBy(col(keyCol), expr(s"$tsCol div $periodLength"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val perPeriod = events
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") === 1)
      .select(col(keyCol), expr(s"$tsCol div $periodLength").as("period"),
        col(valueCol).as("__obs"))
    val spine = gapFill(events, keyCol, tsCol, periodLength)
      .select(col(keyCol), col("period"))
    val wf = Window.partitionBy(col(keyCol)).orderBy(col("period").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perPeriod, Seq(keyCol, "period"), "left")
      .withColumn("value", last(col("__obs"), ignoreNulls = true).over(wf))
      .select(col(keyCol), col("period"), col("value"),
        (col("__obs").isNull && col("value").isNotNull).as("was_filled"))
  }

  /** RFM segmentation — the classic customer-value grid: per user,
    * Recency (periods since last conversion, relative to the corpus
    * max), Frequency (conversion count) and Monetary (cents sum), each
    * scored into `q` quantile bins by the deterministic histogram
    * estimator (`Stats.quantileBins` — bin edges are 6-dp-rounded
    * engine-exact values, so bin membership is reproducible), composed
    * into the 3-digit `rfm_code` (bins ascend with the RAW value:
    * r_bin 0 = most recent, f/m_bin q−1 = heaviest).
    *
    * Shape: one conversion aggregate (user-cardinality), a broadcast
    * corpus-max row, and three constant-size edge fits — no
    * user-pairwise anything.
    */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, convType: String, valueCol: String,
                  periodNs: Long, histBins: Int = 64,
                  q: Int = 5): DataFrame = {
    require(periodNs > 0, "periodNs must be positive")
    val conv = events.filter(col(typeCol) === convType)
    val gmax = conv.agg(max(col(tsCol)).as("__gmax"))
    val feats = conv.groupBy(col(userCol))
      .agg(max(col(tsCol)).as("__last"), count(lit(1)).as("frequency"),
        sum(round(col(valueCol) * 100).cast("long")).as("monetary_cents"))
      .crossJoin(broadcast(gmax))
      .withColumn("recency_days", expr(s"(__gmax - __last) div $periodNs"))
      .select(col(userCol), col("recency_days"), col("frequency"),
        col("monetary_cents"))
      // user-cardinality rows; each quantileBins call below runs an
      // eager edge collect, so without this the conversion aggregate
      // over the full event table recomputes 4× (3 edge passes + the
      // final plan) — measured 5.2 s → materialize once (r12)
      .localCheckpoint()
    val binned = Seq(("recency_days", "r_bin"), ("frequency", "f_bin"),
      ("monetary_cents", "m_bin"))
      .foldLeft(feats) { case (df, (c, b)) =>
        graft.pipeline.Stats.quantileBins(df, c, histBins, q)
          .withColumnRenamed("bin", b)
      }
    binned.withColumn("rfm_code",
      (col("r_bin") + 1) * 100 + (col("f_bin") + 1) * 10 + col("m_bin") + 1)
  }

  /** Time-weighted average (TWAP): per key, Σ valueᵢ·Δtᵢ / Σ Δtᵢ where
    * Δtᵢ is the time the i-th observation remained current (until the
    * next one) — the financial/sensor mean that ignores sampling
    * cadence (a value held for an hour weighs 60× one held a minute).
    * Keys with < 2 observations have no span and are excluded.
    *
    * Exactness: values quantize to integer cents, each cents·Δns
    * product and their sum run in DECIMAL(38,0) (nanosecond spans
    * overflow int64 products), and doubles appear only in the final
    * division — partition- and engine-invariant. One per-key window
    * (the lead) + one aggregate.
    */
  def twap(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val cents = round(col(valueCol) * 100).cast("long")
    events
      .withColumn("__next", lead(col(tsCol), 1).over(w))
      .withColumn("__contrib",
        (cents.cast("decimal(38,0)") *
          (col("__next") - col(tsCol)).cast("decimal(38,0)")))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__contrib")).as("__sumc"),
        (max(col(tsCol)) - min(col(tsCol))).as("__span"))
      .filter(col("__span") > 0)
      .select(col(keyCol), col("n_obs"),
        round(col("__sumc").cast("double") /
          col("__span").cast("double") / lit(100.0), 6).as("twap"))
  }

  /** Linear-interpolation fill on the dense period spine — `locfFill`'s
    * smoother sibling (sensor/price series): holes between two
    * observations take the straight line between them, holes after the
    * last observation carry it forward (LOCF), holes before the first
    * stay NULL. Two per-key window passes (backward carry + forward
    * peek) over spine-sized data.
    *
    * Exactness: observations quantize to integer cents and the line is
    * evaluated in integer MICRO-units with floor division —
    * cents·10⁴ + ((Δcents·10⁴·k) div n) — because the float form
    * systematically lands on 6-dp rounding TIES (2-dp values × simple
    * fractions ⇒ …5 at the 7th digit), where Spark's BigDecimal
    * HALF_UP and another engine's round disagree by 1 ulp. Integer
    * division has no ties; the final /1e6 is one correctly-rounded
    * IEEE division.
    */
  def interpFill(events: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, valueCol: String,
                 periodLength: Long): DataFrame = {
    require(periodLength > 0, "periodLength must be positive")
    val wp = Window
      .partitionBy(col(keyCol), expr(s"$tsCol div $periodLength"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val perPeriod = events
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") === 1)
      .select(col(keyCol), expr(s"$tsCol div $periodLength").as("period"),
        round(col(valueCol) * 100).cast("long").as("__obs"))
    val spine = gapFill(events, keyCol, tsCol, periodLength)
      .select(col(keyCol), col("period"))
    val wb = Window.partitionBy(col(keyCol)).orderBy(col("period").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(keyCol)).orderBy(col("period").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(perPeriod, Seq(keyCol, "period"), "left")
      .withColumn("__pv", last(col("__obs"), ignoreNulls = true).over(wb))
      .withColumn("__pp",
        last(when(col("__obs").isNotNull, col("period")), ignoreNulls = true)
          .over(wb))
      .withColumn("__nv", first(col("__obs"), ignoreNulls = true).over(wf))
      .withColumn("__np",
        first(when(col("__obs").isNotNull, col("period")), ignoreNulls = true)
          .over(wf))
      .withColumn("__micro",
        when(col("__obs").isNotNull, col("__obs") * 10000L)
          .when(col("__pv").isNull, lit(null).cast("long"))
          .when(col("__nv").isNull, col("__pv") * 10000L)
          .otherwise(col("__pv") * 10000L +
            expr("((__nv - __pv) * 10000 * (period - __pp)) div (__np - __pp)")))
      .select(col(keyCol), col("period"),
        (col("__micro").cast("double") / lit(1e6)).as("value"),
        col("__obs").isNull.as("was_filled"))
  }

  /** Two-proportion A/B conversion test: users split by `variantExpr`
    * (0/1), converted = at least one event satisfying `convPred`. One
    * row out:
    * per-variant user and converter counts, rates, absolute lift, and
    * the pooled two-proportion z statistic — the experimentation-
    * analytics primitive over the events stream.
    *
    * Shape: one per-user aggregate (conversion flag), one global
    * conditional-sum aggregate — two shuffles, single-row output.
    * Counts are exact integers; rates/lift/z are single double
    * expressions over them, rounded 6 dp (engine-exact).
    */
  def abTest(events: DataFrame, userCol: String, convPred: Column,
             variantExpr: Column): DataFrame = {
    val users = events.groupBy(col(userCol))
      .agg(max(variantExpr.cast("int")).as("__variant"),
        max(when(convPred, 1).otherwise(0)).as("__conv"))
    val agg = users.agg(
      sum(when(col("__variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__variant") === 0, col("__conv").cast("long"))
        .otherwise(0L)).as("conv_a"),
      sum(when(col("__variant") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__variant") === 1, col("__conv").cast("long"))
        .otherwise(0L)).as("conv_b"))
    val ra = col("conv_a").cast("double") / col("n_a").cast("double")
    val rb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(ra, 6).as("rate_a"), round(rb, 6).as("rate_b"),
      round(rb - ra, 6).as("lift"),
      round((rb - ra) / sqrt(pooled * (lit(1.0) - pooled) *
        (lit(1.0) / col("n_a").cast("double") +
          lit(1.0) / col("n_b").cast("double"))), 6).as("z"))
  }

  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String,
                       touchTypes: Seq[String], convType: String): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      "convType in touchTypes would make every conversion self-attributed")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col(typeCol).isInCollection(touchTypes)
    def touch(c: Column): Column = when(isTouch, c)
    events
      .withColumn("first_id", first(touch(col(idCol)), ignoreNulls = true).over(w))
      .withColumn("first_ns", first(touch(col(tsCol)), ignoreNulls = true).over(w))
      .withColumn("first_type", first(touch(col(typeCol)), ignoreNulls = true).over(w))
      .withColumn("last_id", last(touch(col(idCol)), ignoreNulls = true).over(w))
      .withColumn("last_ns", last(touch(col(tsCol)), ignoreNulls = true).over(w))
      .withColumn("last_type", last(touch(col(typeCol)), ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .select(col(userCol), col(idCol).as("conv_id"), col(tsCol).as("conv_ns"),
        col("first_id"), col("first_ns"), col("first_type"),
        col("last_id"), col("last_ns"), col("last_type"))
  }

  /** Gap-based sessionization with per-session statistics — the batch
    * form of the streaming `mapGroupsWithState` sessionizer: a new
    * session starts whenever a user's inter-event gap exceeds `gapNs`.
    * Output one row per (user, ordinal session): start, end, event
    * count, duration, and the bounce flag (single-event session — the
    * classic engagement denominator).
    *
    * Scale notes: the lag that marks session starts and the running
    * sum that numbers them share ONE per-user window partition (a
    * single Exchange), then one hash aggregate collapses events to
    * sessions. Per-user window state is that user's events — bounded
    * by activity, never global; at 100 TB this is the same
    * shuffle-once shape as any per-key groupBy.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, gapNs: Long): DataFrame = {
    require(gapNs > 0, "gapNs must be positive")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(cum))
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration_ns"),
        (count(lit(1)) === 1).as("is_bounce"))
  }

  /** Diurnal profile: per key, the hour-of-day activity histogram with
    * within-key shares — the load-shape fingerprint (bots are flat,
    * humans have a day) and the capacity-planning input. One 24-cell-
    * per-key aggregate + a key-total equi-join; shares are one IEEE
    * division, rounded 6 dp.
    */
  def diurnalProfile(events: DataFrame, keyCol: String,
                     tsCol: String): DataFrame = {
    val cells = events
      .groupBy(col(keyCol),
        expr(s"($tsCol div ${3600L * 1000 * 1000 * 1000}) % 24")
          .as("hour_of_day"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.groupBy(col(keyCol)).agg(sum(col("n")).as("__t"))
    cells.join(tot, Seq(keyCol))
      .select(col(keyCol), col("hour_of_day"), col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("share"))
  }

  /** CUSUM changepoint screen: per key, the period where the cumulative
    * deviation of the activity series from its own mean peaks — the
    * classic level-shift detector (did this source/type change behavior,
    * and when?).
    *
    * Exactness: deviations are scaled through the period count
    * (dev_t = c_t·P − T) so the running sum stays in exact integers —
    * cusum_t = P·Σc_i − t·T, zero at both ends, extremal at the shift.
    * The argmax is max(struct(|cusum|, −period)) — deterministic
    * earliest-period tie-break, no window beyond the per-key running
    * sum over the AGGREGATED series (calendar-bounded, never event
    * volume).
    */
  def cusumChangepoint(events: DataFrame, keyCol: String, tsCol: String,
                       periodLength: Long): DataFrame = {
    require(periodLength > 0, "periodLength must be positive")
    val per = events
      .groupBy(col(keyCol), expr(s"$tsCol div $periodLength").as("period"))
      .agg(count(lit(1)).as("__c"))
    val tot = per.groupBy(col(keyCol))
      .agg(sum(col("__c")).as("total"), count(lit(1)).as("n_periods"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.join(tot, Seq(keyCol))
      .withColumn("__cusum",
        sum(col("__c") * col("n_periods") - col("total")).over(w))
      .groupBy(col(keyCol), col("n_periods"), col("total"))
      .agg(max(struct(abs(col("__cusum")).as("a"),
        (-col("period")).as("np"))).as("__m"))
      .select(col(keyCol), col("n_periods"), col("total"),
        (-col("__m.np")).as("cp_period"),
        col("__m.a").as("max_abs_cusum"))
  }

  /** Linear multi-touch attribution, session-scoped: every touch in
    * the conversion's SESSION shares credit equally (weight = 1/n) —
    * the multi-touch complement of [[touchAttribution]]'s first/last
    * model. Session scoping is what makes this scale-safe: the
    * touch × conversion pairing is an equi-join on (user, session),
    * fan-out bounded by session length, never a user's whole history.
    * Weights are one IEEE division of exact counts, rounded 6 dp.
    */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
                        idCol: String, typeCol: String,
                        touchTypes: Seq[String], convType: String,
                        gapNs: Long): DataFrame = {
    require(touchTypes.nonEmpty && gapNs > 0, "touch types and a gap")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessioned = events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(cum))
      .localCheckpoint() // touches and conversions both read it
    val touches = sessioned
      .filter(col(typeCol).isin(touchTypes.map(lit): _*))
      .select(col(userCol), col("__sid"), col(idCol).as("touch_id"),
        col(tsCol).as("touch_ns"), col(typeCol).as("touch_type"))
    val convs = sessioned.filter(col(typeCol) === convType)
      .select(col(userCol), col("__sid"), col(idCol).as("conv_id"),
        col(tsCol).as("conv_ns"))
    convs.join(touches, Seq(userCol, "__sid"))
      .filter(col("touch_ns") < col("conv_ns"))
      .withColumn("__nb", count(lit(1)).over(
        Window.partitionBy(col(userCol), col("__sid"), col("conv_id"))))
      .select(col(userCol), col("conv_id"), col("touch_id"),
        col("touch_type"),
        round(lit(1.0) / col("__nb").cast("double"), 6).as("weight"))
  }

  /** Churn label/feature table — the supervised-learning labeling op:
    * per user, tenure, last-seen recency, activity counts, and the
    * churn bit (no activity in the trailing `churnNs` window before
    * the corpus horizon). One aggregate over events + one broadcast
    * horizon row; deterministic given the data (the horizon is the
    * max event time, not wall clock).
    */
  def churnLabels(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, convType: String,
                  churnNs: Long): DataFrame = {
    require(churnNs > 0, "churnNs must be positive")
    val horizon = events.agg(max(col(tsCol)).as("__h"))
    events.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col(typeCol) === convType, 1L).otherwise(0L))
          .as("n_conversions"),
        min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
      .crossJoin(broadcast(horizon))
      .select(col(userCol), col("n_events"), col("n_conversions"),
        (col("__last") - col("__first")).as("tenure_ns"),
        (col("__h") - col("__last")).as("recency_ns"),
        (col("__h") - col("__last") > churnNs).as("churned"))
  }

  /** Per-key Shannon entropy of the event-type mix — the behavioral
    * diversity score (bots hammer one action; engaged users spread
    * across the product). Exact nano-nat arithmetic per (user, type)
    * cell — Σ −(c/n)·ln(c/n) with the [[graft.pipeline.Corpus]]
    * operand-order discipline; |types| is bounded so the per-user
    * state is constant.
    */
  def behaviorEntropy(events: DataFrame, userCol: String,
                      typeCol: String): DataFrame = {
    val cells = events.groupBy(col(userCol), col(typeCol))
      .agg(count(lit(1)).as("__c"))
    val tot = cells.groupBy(col(userCol))
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("n_types"))
    cells.join(tot, Seq(userCol))
      .withColumn("__e_nano",
        round((col("__c").cast("double") / col("__n").cast("double")) *
          log(col("__n").cast("double") / col("__c").cast("double")) *
          lit(1e9)).cast("long"))
      .groupBy(col(userCol), col("n_types"), col("__n"))
      .agg(sum(col("__e_nano")).as("entropy_nano"))
      .select(col(userCol), col("__n").as("n_events"), col("n_types"),
        col("entropy_nano"))
  }

  /** Period-over-period change report: per (key, period) the activity
    * count with day-over-day and week-over-week comparisons — the BI
    * trend tile. The comparison is CALENDAR lag (value at period − L
    * via a self equi-join on the aggregated series), not positional
    * `lead`/`lag` — a missing period compares against NULL, exactly
    * what a dashboard should show. Percent change is one IEEE division
    * of exact integers, rounded 6 dp, NULL when the base is missing.
    *
    * Shape: one activity aggregate + one self equi-join per lag on the
    * calendar-bounded series.
    */
  def periodChanges(events: DataFrame, keyCol: String, tsCol: String,
                    periodLength: Long, dayLag: Int = 1,
                    weekLag: Int = 7): DataFrame = {
    require(periodLength > 0 && dayLag >= 1 && weekLag > dayLag,
      "positive period, weekLag > dayLag >= 1")
    val per = events
      .groupBy(col(keyCol), expr(s"$tsCol div $periodLength").as("period"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    def lagged(l: Int, name: String) = per.select(col(keyCol),
      (col("period") + l).as("period"), col("n").as(name))
    def pct(prev: String) = round(
      (col("n") - col(prev)).cast("double") / col(prev).cast("double"), 6)
    per
      .join(lagged(dayLag, "__d"), Seq(keyCol, "period"), "left")
      .join(lagged(weekLag, "__w"), Seq(keyCol, "period"), "left")
      .select(col(keyCol), col("period"), col("n"),
        col("__d").as("prev_day"), pct("__d").as("dod_pct"),
        col("__w").as("prev_week"), pct("__w").as("wow_pct"))
  }

  /** Holt linear (level + trend) smoothing of a per-key period series —
    * [[sesForecast]]'s two-component sibling, the forecast primitive
    * for trending series (SES lags a trend by design; Holt tracks it):
    *   l₀ = x₀·10⁶,            b₀ = 0
    *   lₜ = (xₜ·10⁶ + (d−1)·(lₜ₋₁ + bₜ₋₁)) div d       (α = 1/d)
    *   bₜ = ((lₜ − lₜ₋₁) + (d−1)·bₜ₋₁) div d           (β = 1/d)
    * All integer micro-units with truncating division —
    * bit-deterministic (both Spark's `div` and DuckDB's `//` truncate
    * toward ZERO, probed: −7//2 = −3, so negative trends agree too).
    * `forecast_micro` = lₜ + horizon·bₜ from the last period. The same
    * one-HOF-fold-over-the-calendar-bounded-series shape as SES, with
    * a two-field struct as the running state.
    */
  def holtForecast(events: DataFrame, keyCol: String, tsCol: String,
                   periodLength: Long, alphaDen: Int = 4,
                   horizon: Int = 7): DataFrame = {
    require(periodLength > 0 && alphaDen >= 2 && horizon >= 0,
      "period > 0, alphaDen >= 2, horizon >= 0")
    val d = alphaDen
    val per = events
      .groupBy(col(keyCol), expr(s"$tsCol div $periodLength").as("period"))
      .agg(count(lit(1)).as("__c"))
    per.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("period"), col("__c"))))
        .as("__series"))
      .withColumn("__f", expr(
        s"""aggregate(__series,
           |  CAST(array() AS ARRAY<STRUCT<period: BIGINT, c: BIGINT,
           |    l: BIGINT, b: BIGINT>>),
           |  (acc, x) -> array_append(acc,
           |    CASE WHEN size(acc) = 0 THEN named_struct(
           |      'period', x.period, 'c', x.`__c`,
           |      'l', x.`__c` * 1000000, 'b', CAST(0 AS BIGINT))
           |    ELSE named_struct(
           |      'period', x.period, 'c', x.`__c`,
           |      'l', (x.`__c` * 1000000 + ${d - 1} *
           |        (element_at(acc, -1).l + element_at(acc, -1).b)) div $d,
           |      'b', (((x.`__c` * 1000000 + ${d - 1} *
           |          (element_at(acc, -1).l + element_at(acc, -1).b)) div $d
           |          - element_at(acc, -1).l)
           |        + ${d - 1} * element_at(acc, -1).b) div $d) END))"""
          .stripMargin))
      .select(col(keyCol), col("__f"))
      .withColumn("__last", element_at(col("__f"), -1))
      .select(col(keyCol), explode(col("__f")).as("__e"),
        (col("__last.l") + lit(horizon.toLong) * col("__last.b"))
          .as("forecast_micro"))
      .select(col(keyCol), col("__e.period").as("period"),
        col("__e.c").as("n_events"), col("__e.l").as("level_micro"),
        col("__e.b").as("trend_micro"), col("forecast_micro"))
  }

  /** Lag-k autocorrelation of each key's activity series — the
    * seasonality detector (a strong lag-7 ACF on daily counts = weekly
    * cycle; the diagnostic that picks the seasonal period before any
    * forecast). Deviations are scaled through the period count
    * (dev_t = n·c_t − T, the CUSUM trick) so numerator products and
    * the variance denominator are exact integers riding DECIMAL(38,0);
    * r_k = num/den is one IEEE division rounded 6 dp. The series is
    * the key's OBSERVED periods in order (gap-fill first via
    * [[gapFill]] if zero-periods must count).
    *
    * Shape: one activity aggregate, then per lag one lead window +
    * one aggregate over the calendar-bounded series.
    */
  def autocorr(events: DataFrame, keyCol: String, tsCol: String,
               periodLength: Long, lags: Seq[Int]): DataFrame = {
    require(periodLength > 0 && lags.nonEmpty && lags.forall(_ >= 1),
      "positive period and lags")
    val per = events
      .groupBy(col(keyCol), expr(s"$tsCol div $periodLength").as("period"))
      .agg(count(lit(1)).as("__c"))
    val tot = per.groupBy(col(keyCol))
      .agg(sum(col("__c")).as("__t"), count(lit(1)).as("n_periods"))
    val dev = per.join(tot, Seq(keyCol))
      .withColumn("__dev", col("__c") * col("n_periods") - col("__t"))
      .localCheckpoint() // each lag re-reads the series; fold it once
    val w = Window.partitionBy(col(keyCol)).orderBy(col("period"))
    lags.map { k =>
      dev.withColumn("__devk", lead(col("__dev"), k).over(w))
        .groupBy(col(keyCol), col("n_periods"))
        .agg(sum(col("__dev").cast("decimal(38,0)") *
            col("__devk").cast("decimal(38,0)")).as("__num"),
          sum(col("__dev").cast("decimal(38,0)") *
            col("__dev").cast("decimal(38,0)")).as("__den"))
        .select(col(keyCol), col("n_periods"), lit(k).as("lag"),
          round(col("__num").cast("double") /
            col("__den").cast("double"), 6).as("autocorr"))
    }.reduce(_ unionAll _)
  }

  /** Single-exponential smoothing (SES) over a per-key period series —
    * the level-tracking forecast/denoiser (α = 1/`alphaDen`):
    * s₀ = x₀·10⁶;  sₜ = (xₜ·10⁶ + (alphaDen−1)·sₜ₋₁) div alphaDen.
    * The recurrence runs in integer MICRO-units with floor division —
    * bit-deterministic across engines and partitionings (a float fold
    * would accumulate rounding skew and can't hash-match any oracle).
    *
    * Shape: the recurrence is inherently sequential per key, so it
    * folds over the AGGREGATED series (calendar-bounded — thousands of
    * periods, not events) collected per key into one sorted array and
    * scanned by one codegen'd `aggregate` HOF; cost per key is
    * O(periods), state one array. Event volume is only touched by the
    * initial hash aggregate.
    */
  def sesForecast(events: DataFrame, keyCol: String, tsCol: String,
                  periodLength: Long, alphaDen: Int = 4): DataFrame = {
    require(periodLength > 0 && alphaDen >= 2, "period > 0, alphaDen >= 2")
    val per = events
      .groupBy(col(keyCol), expr(s"$tsCol div $periodLength").as("period"))
      .agg(count(lit(1)).as("__c"))
    per.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("period"), col("__c"))))
        .as("__series"))
      .withColumn("__f", expr(
        s"""aggregate(__series,
           |  CAST(array() AS ARRAY<STRUCT<period: BIGINT, c: BIGINT, sm: BIGINT>>),
           |  (acc, x) -> array_append(acc, named_struct(
           |    'period', x.period, 'c', x.`__c`,
           |    'sm', CASE WHEN size(acc) = 0 THEN x.`__c` * 1000000
           |          ELSE (x.`__c` * 1000000
           |            + ${alphaDen - 1} * element_at(acc, -1).sm)
           |            div $alphaDen END)))""".stripMargin))
      .select(col(keyCol), explode(col("__f")).as("__e"))
      .select(col(keyCol), col("__e.period").as("period"),
        col("__e.c").as("n_events"), col("__e.sm").as("smooth_micro"))
  }
}
