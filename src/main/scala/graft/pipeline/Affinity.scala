package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket affinity: which items co-occur in the same basket more
  * often than chance — the "frequently bought together" / co-retrieval
  * signal, and (on a training corpus) the co-occurrence statistics
  * behind PMI-style association mining.
  *
  * Scale notes (100 TB): the naive form joins the basket-item table
  * with itself on the basket key — fan-out Σ_b k_b² where k_b is the
  * basket size. Two things keep that linear in practice and both are
  * applied here:
  *
  *  1. '''Apriori prefilter''': an item appearing in fewer than
  *     `minSupport` baskets cannot participate in any pair with support
  *     ≥ `minSupport` (anti-monotonicity), so low-frequency items are
  *     dropped BEFORE the self-join. On a Zipf catalogue this removes
  *     the long tail — most of the item table — for one extra hash
  *     aggregate.
  *  2. '''Basket-size cap''': k_b is bounded by the domain (an order
  *     has bounded lines; a session has bounded clicks), so per-basket
  *     fan-out is a constant, never n².
  *
  * The join itself is a basket-key equi-join (shuffle on the basket
  * id), the pair aggregate shuffles on the (a, b) pair key, and the
  * per-item counts re-attach by item-key equi-joins — all
  * hash-partitioned, no window, no cartesian anywhere.
  */
object Affinity {

  /** Frequent co-occurring item pairs with support and lift.
    *
    * Output: (item_a, item_b, pair_n, n_a, n_b, lift) for every
    * unordered pair appearing in ≥ `minSupport` distinct baskets, with
    * lift = pair_n · n_baskets / (n_a · n_b) — >1 means the pair
    * co-occurs more than independence predicts.
    *
    * Determinism: counts are exact integers; lift is ONE IEEE division
    * of exact integer products, rounded to 6 dp — engine-invariant.
    */
  def copurchasePairs(baskets: DataFrame, basketCol: String,
                      itemCol: String, minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val bi = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    // Apriori: per-item basket counts, keep only items that could still
    // form a frequent pair; the surviving item set re-attaches later as
    // the lift denominator (computed once, used twice — tiny, broadcast)
    val itemN = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
      .filter(col("n_i") >= minSupport)
      .localCheckpoint()
    val pruned = bi.join(itemN.select("i"), "i")
    val pairs = pruned.select(col("b"), col("i").as("item_a"))
      .join(pruned.select(col("b"), col("i").as("item_b")), "b")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minSupport)
    val total = bi.select(col("b")).distinct().agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(itemN.select(col("i").as("item_a"), col("n_i").as("n_a")), "item_a")
      .join(itemN.select(col("i").as("item_b"), col("n_i").as("n_b")), "item_b")
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("pair_n"), col("n_a"),
        col("n_b"),
        round((col("pair_n") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }
}
