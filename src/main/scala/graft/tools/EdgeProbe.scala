package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: count the LSH candidate-edge set for ScaleSmoke's
  * constant-mode replicas at a given (copies, bitsPerBand). The soak's
  * CC/LPA/PageRank shuffle is driven by TWO inputs — the candidate
  * edge count E (workload: within-copy structure + random cross-copy
  * band collisions, which grow super-linearly when the band width is
  * HELD FIXED across a data decade) and the per-edge/per-round engine
  * cost. This probe measures E so a cross-decade shuffle ratio can be
  * normalized per edge: engine linearity shows up as
  * shuffle_bytes / E ≈ constant even when raw ratios exceed the data
  * ratio at fixed width. Replica construction mirrors ScaleSmoke's
  * constant mode exactly (same Rademacher signs, same id shifts).
  *
  * Usage: EdgeProbe [sfDir] [copies] [bits]
  */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(300)
    val bits = args.drop(2).headOption.map(_.toInt).getOrElse(12)
    // each concurrent task deserializes the full copies-way union plan;
    // at 1000 branches x 32 tasks that alone OOMs a 24g heap - default
    // to modest parallelism, override via SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    val base = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n0 = base.count()
    val embN = (0 until copies).map { c =>
      val shiftedId = (col("vec_id") + lit(c.toLong * n0)).as("vec_id")
      val replica = transform(col("embedding"), (x, i) =>
        (x * when(pmod(hash(i, lit(c)), lit(2)) === 0, 1.0f).otherwise(-1.0f))
          .cast("float"))
      base.select(shiftedId, replica.as("embedding"))
    }.reduce(_ unionAll _)
    // the banded self-join's fan-out — the true shuffle driver — is
    // Σ_buckets C(n_b, 2) over all (band, key) buckets, computable
    // with ONE aggregate instead of the join itself
    val bands = 3
    val mask = (1L << bits) - 1
    val banded = embN
      .select(graft.functions.VectorFunctions
        .hyperplaneSignature(col("embedding"), bands * bits).as("__sig"))
      .select(explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("__sig"), b * bits).bitwiseAND(lit(mask))
            .as("key"))
      }: _*)).as("__bk"))
    val cand = banded.groupBy(col("__bk"))
      .agg(count(lit(1)).as("__n"))
      .agg(sum(expr("__n * (__n - 1) div 2")).as("__pairs"))
      .collect()(0).getLong(0)
    // JSON null (not a -1 sentinel) when the verify pass was skipped:
    // -1 collides with Bench's -1-means-failed convention (r8 ADVICE)
    val verified: String =
      if (args.contains("--verified"))
        graft.similarity.SimilarityOps.lshCandidatePairs(
            embN, "vec_id", "embedding", threshold = 0.4,
            bands = bands, bitsPerBand = bits)
          .count().toString
      else "null"
    println(s"""{"metric":"edge_probe","copies":$copies,"bits_per_band":$bits,""" +
      s""""n_vectors":${copies * n0},"n_candidate_pairs":$cand,""" +
      s""""n_verified_edges":$verified}""")
    spark.stop()
  }
}
