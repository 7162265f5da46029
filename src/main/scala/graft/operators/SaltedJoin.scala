package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join: when one join key carries a disproportionate
  * share of probe rows, a plain hash join sends them all to one
  * partition. Salting splits each key into `r` sub-keys: the probe side
  * gets a deterministic salt in [0, r), the build side is replicated
  * once per salt, and the join runs on (key, salt) — the hot key's rows
  * spread over r partitions at the cost of building r copies of the
  * (small) build side. Results are EXACTLY the plain join's: every
  * probe row joins the one build replica matching its salt.
  *
  * This is the manual form of what AQE's skew-join handling does to
  * sort-merge joins at runtime; use it when the skew is known up front
  * or the build side is too big to broadcast but small enough to
  * replicate r times.
  */
object SaltedJoin {

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 r: Int): DataFrame = {
    require(r > 0, "salt factor must be positive")
    // deterministic per-row salt: hash of the whole probe row
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(r.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(r.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
