package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: candidate fan-out (Σ C(n_b, 2)), bucket count, and max
  * bucket occupancy of the binarydedup soak section's byte-histogram
  * sign-LSH banding — the EdgeProbe companion for blobs. Reads the
  * same blob construction as ScaleSmoke's binarydedup section (hash-
  * derived byte runs per (doc, copy) + a copy-0 re-append), so a
  * bucket-collapse in the synthetic histogram population is visible
  * BEFORE an hours-long soak is spent on it.
  *
  * Usage: BlobProbe [sfDir] [copies] [bits] [bins]
  */
object BlobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val bits = args.drop(2).headOption.map(_.toInt).getOrElse(12)
    val bins = args.drop(3).headOption.map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val d0 = docs.count()
    def blobs(c: Int, idShift: Long) = {
      val body = concat((0 until 8).map { j =>
        expr(s"repeat(char(pmod(hash(doc_id, $j, $c), 256)), " +
          s"pmod(hash(doc_id, $j, $c, 7), 32) + 1)")
      }: _*)
      docs.select((col("doc_id") + lit(idShift)).as("doc_id"),
        encode(body, "ISO-8859-1").as("bin"))
    }
    val blobN = (0 until copies).map(c => blobs(c, c.toLong * d0))
      .reduce(_ unionAll _).unionAll(blobs(0, copies.toLong * d0))
    val hist = graft.pipeline.Dedup
      .binaryHistograms(blobN, "doc_id", "bin", bins)
    val bands = 3
    // mirror binaryNearDupPairs' centered signature (histograms are
    // all-nonnegative — see the lshCandidatePairs scaladoc). Band keys
    // come from the MULTI-WORD signature, identical to the old
    // single-long slices for bands×bits ≤ 63 and well-defined past it
    // (r11 order sheet #1: the 1000×/b16 run realized 83% of the
    // 3·2¹⁶ sign cells — the next decade needs wider keys than one
    // long can carry).
    val banded = hist.select(posexplode(graft.functions.VectorFunctions
        .hyperplaneSignatureWide(col("hist"), bands, bits, center = true))
        .as(Seq("band", "key")))
      .select(struct(col("band"), col("key")).as("__bk"))
    val t0 = System.nanoTime()
    val c = banded.groupBy(col("__bk")).agg(count(lit(1)).as("__n"))
      .agg(sum(expr("__n * (__n - 1) div 2")).as("__p"),
        count(lit(1)).as("__nb"), max(col("__n")).as("__maxb"))
      .collect()(0)
    println(s"""{"metric":"blob_probe","copies":$copies,"bits_per_band":$bits,"bins":$bins,""" +
      s""""n_blobs":${(copies + 1) * d0},"n_candidate_pairs":${c.getLong(0)},""" +
      s""""n_buckets":${c.getLong(1)},"max_bucket":${c.getLong(2)},""" +
      s""""probe_sec":${(System.nanoTime() - t0) / 1e9}}""")
    spark.stop()
  }
}
