package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.SimilarityOps

/** Dev probe: per-component wall clock of the q256 trained-encoding
  * ladder — times each public piece (exact ground truth via the raw
  * ladder, residual ladder, k-means fit, PQ codebook fit, full trained
  * ladder) in isolation so the 10.6 s warm median decomposes into
  * attributable parts before anything is restructured (guide §1).
  *
  * Usage: IvfPqComponentProbe [sfDir]   (q256 contract parameters)
  */
object IvfPqComponentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    def time(label: String)(body: => Long): Unit = {
      graft.Graft.evictAll(spark)
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[component] $label%-28s $dt%6.2fs rows=$n")
    }
    val emb = graft.Tables.embeddings(spark, sfDir)
    val qp = col("vec_id") < 10
    // warm the scan + JIT once
    emb.queryExecution.toRdd.count()
    for (round <- 1 to 2) {
      println(s"[component] --- round $round ---")
      time("raw_ladder") {
        SimilarityOps.ivfPqRecallLadder(emb, "vec_id", "embedding", qp,
          nCentroids = 8, m = 8, nCodes = 16, k = 3, nprobes = Seq(1, 2, 4))
          .queryExecution.toRdd.count()
      }
      time("residual_ladder") {
        SimilarityOps.ivfPqRecallLadderResidual(emb, "vec_id", "embedding",
          qp, nCentroids = 8, m = 8, nCodes = 16, k = 3,
          nprobes = Seq(1, 2, 4)).queryExecution.toRdd.count()
      }
      time("kmeans_centroids_2it") {
        SimilarityOps.kmeansCentroids(emb, "vec_id", "embedding", 8, 2)
          .queryExecution.toRdd.count()
      }
      time("pq_codebook_fit_2it") {
        SimilarityOps.pqCodebookFit(emb, "vec_id", "embedding", 8, 16, 2)
          .queryExecution.toRdd.count()
      }
      time("trained_ladder") {
        SimilarityOps.ivfPqRecallLadderTrained(emb, "vec_id", "embedding",
          qp, nCentroids = 8, m = 8, nCodes = 16, k = 3,
          nprobes = Seq(1, 2, 4), iters = 2).queryExecution.toRdd.count()
      }
      time("full_q256_ladder") {
        SimilarityOps.ivfPqEncodingLadder(emb, "vec_id", "embedding", qp,
          nCentroids = 8, m = 8, nCodes = 16, k = 3, nprobes = Seq(1, 2, 4),
          includeTrained = true, trainIters = 2)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
