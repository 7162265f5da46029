package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Graft
import graft.functions.VectorFunctions

/** Dev microbenchmark: HOF-fold cosine vs the native codegen
  * expression, on a synthetic all-pairs workload
  * (`spark.range`-generated vectors — SURVEY S11 pattern).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val dim = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.install(spark)

    // deterministic synthetic vectors (id-seeded, no RNG)
    val vecs = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => sin(col("id") * 131 + i).cast("float")).as("v"))
      .cache()
    vecs.count()

    val a = vecs.select(col("id").as("ia"), col("v").as("va"))
    val b = vecs.select(col("id").as("ib"), col("v").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs (rows=$r)")
    }
    // warm-up
    pairs.select(Graft.cosineSim(col("va"), col("vb"))).filter(col("cosine_sim(va, vb)") > 2).count()

    time("HOF zip_with+aggregate") {
      pairs.filter(VectorFunctions.cosine(col("va"), col("vb")) >= 0.95).count()
    }
    time("native codegen cosine_sim") {
      pairs.filter(Graft.cosineSim(col("va"), col("vb")) >= 0.95).count()
    }
    spark.stop()
  }
}
