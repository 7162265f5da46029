package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the IVF-PQ ENCODING ladder (raw vs residual vs trained)
  * at measurement-scale parameters — the r11 round-status numbers'
  * harness (sf0.1, 256 codes / 32 cells / k=10 / 50 queries), extended
  * with the r12 trained rows so the "does training the quantizers buy
  * recall" answer is measured at the same scale the raw-vs-residual
  * answer was.
  *
  * Usage: LadderProbe [sfDir] [nCentroids] [nCodes] [k] [nQueries]
  *   [trainIters]
  * Prints one JSON line per ladder row plus a wall-clock summary.
  */
object LadderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nCents = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val nCodes = args.drop(2).headOption.map(_.toInt).getOrElse(256)
    val k = args.drop(3).headOption.map(_.toInt).getOrElse(10)
    val nQ = args.drop(4).headOption.map(_.toInt).getOrElse(50)
    val iters = args.drop(5).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val t0 = System.nanoTime()
    val rows = graft.similarity.SimilarityOps.ivfPqEncodingLadder(
        emb, "vec_id", "embedding", queryPred = col("vec_id") < nQ,
        nCentroids = nCents, m = 8, nCodes = nCodes, k = k,
        nprobes = Seq(1, 2, 4, 8), includeTrained = true,
        trainIters = iters)
      .orderBy(col("encoding"), col("nprobe"))
      .collect()
    val dt = (System.nanoTime() - t0) / 1e9
    rows.foreach { r =>
      println(s"""{"metric":"ladder","encoding":"${r.getString(0)}",""" +
        s""""nprobe":${r.getLong(1)},"n_queries":${r.getLong(2)},""" +
        s""""n_hits":${r.getLong(3)},"n_exact":${r.getLong(4)},""" +
        s""""recall_permille":${r.getLong(5)}}""")
    }
    println(s"""{"metric":"ladder_probe","sf_dir":"$sfDir","n_centroids":$nCents,"n_codes":$nCodes,"k":$k,"n_queries":$nQ,"train_iters":$iters,"wall_sec":${f"$dt%.1f"}}""")
    spark.stop()
  }
}
