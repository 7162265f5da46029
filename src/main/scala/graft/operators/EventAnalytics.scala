package graft.operators

import org.apache.spark.sql.DataFrame
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
}
