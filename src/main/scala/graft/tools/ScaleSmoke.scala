package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Opt-in 10× scale smoke (not part of the driver contract): runs the
  * q74 (LSH candidate graph → connected components) and q98 (integer
  * PageRank) pipelines on a GENERATED embeddings table ~10× sf0.1
  * (≈ sf1-equivalent), recording wall time and total shuffle bytes —
  * evidence that the iterative LSH-CC and PageRank loops scale as
  * designed rather than just asserting it.
  *
  * The 10× table replicates sf0.1 with deterministic per-copy
  * perturbations (id offset + small element-wise delta), so neighbor
  * structure is preserved without creating degenerate identical-vector
  * megaclusters. Usage:
  *   tools/scale_smoke.sh   (or runMain graft.tools.ScaleSmoke [sfDir] [copies])
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val peakTaskMem = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        peakTaskMem.getAndAccumulate(
          sc.stageInfo.taskMetrics.peakExecutionMemory, math.max(_, _))
      }
    })

    val base = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n0 = base.count()
    // deterministic 10×: copy c shifts ids by c*n0 and perturbs element
    // i by ((i*31 + c*17) % 7 - 3) * 0.002 — neighborhoods survive,
    // copies stay distinct
    val emb10 = (0 until copies).map { c =>
      base.select(
        (col("vec_id") + lit(c.toLong * n0)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x + ((i * 31 + lit(c * 17)) % 7 - 3).cast("float") * 0.002f)
            .cast("float")).as("embedding"))
    }.reduce(_ unionAll _).cache()
    val n = emb10.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // q74 shape: LSH candidate edges -> RDD pointer-jumping CC
    val (ccRows, ccSec) = timed {
      val pairs = graft.similarity.SimilarityOps.lshCandidatePairs(
        emb10, "vec_id", "embedding", threshold = 0.4, bands = 3, bitsPerBand = 4)
      graft.graph.Components.connectedComponentsFast(
        emb10.select("vec_id"), pairs.select("id_a", "id_b")).count()
    }

    // q98 shape: 3-iteration integer PageRank over the same graph
    val (prRows, prSec) = timed {
      val pairs = graft.similarity.SimilarityOps.lshCandidatePairs(
        emb10, "vec_id", "embedding", threshold = 0.4, bands = 3, bitsPerBand = 4)
        .select(col("id_a"), col("id_b"))
      val sym = pairs.union(pairs.select(col("id_b"), col("id_a")))
      // default 1e12 scale caps at ~9e4 vertices; micro-unit scale has
      // overflow headroom to ~9e10 (see PageRank scaladoc)
      graft.graph.PageRank.run(emb10.select("vec_id"), sym.toDF("src", "dst"),
        iters = 3, scale = 1000000L).count()
    }

    val json =
      s"""{"metric":"scale_smoke","sf_dir":"$sfDir","copies":$copies,""" +
        s""""n_vectors":$n,"cc_rows":$ccRows,"cc_sec":${f"$ccSec%.2f"},""" +
        s""""pagerank_rows":$prRows,"pagerank_sec":${f"$prSec%.2f"},""" +
        s""""shuffle_write_bytes":${shuffleWrite.get},""" +
        s""""peak_task_memory_bytes":${peakTaskMem.get}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("scale_smoke.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
