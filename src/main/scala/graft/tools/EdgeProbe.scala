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
    // SAME replicas as ScaleSmoke's constant mode (same Murmur3
    // Rademacher signs — hash(i, c) is identical whether c is a
    // literal or the exploded copy column — same id shifts), but built
    // by ONE explode instead of a copies-way union: at 1000 branches
    // the union's task binaries are ~7 MB and every task deserializes
    // the whole plan through a contended classloader — r10 measured
    // the 1000x verify pass spending its wall clock there, not in the
    // join. The explode plan is constant-size at any copy count; the
    // base repartition spreads the 1-partition source so the explode
    // parallelizes. Validated: 300x/b12 reproduces the union-built
    // candidate and verified counts exactly.
    val embN = base.repartition(cpus.toInt)
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(copies - 1))).as("__c"))
      .select((col("vec_id") + col("__c").cast("long") * n0).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x * when(pmod(hash(i, col("__c")), lit(2)) === 0, 1.0f)
            .otherwise(-1.0f)).cast("float")).as("embedding"))
    // the banded self-join's fan-out — the true shuffle driver — is
    // Σ_buckets C(n_b, 2) over all (band, key) buckets, computable
    // with ONE aggregate instead of the join itself. Band keys come
    // from the MULTI-WORD signature (word b = band b's key — identical
    // to the old single-long slices for bands×bits ≤ 63, spec-pinned),
    // so the probe can measure widths PAST the one-long cap (r11 order
    // sheet #1: at the frozen b12 this probe grew candidates 11.1× for
    // 3.33× data — the escape needs keys wider than 63/bands bits).
    val bands = 3
    val banded = embN
      .select(posexplode(graft.functions.VectorFunctions
        .hyperplaneSignatureWide(col("embedding"), bands, bits))
        .as(Seq("band", "key")))
      .select(struct(col("band"), col("key")).as("__bk"))
    val cand = banded.groupBy(col("__bk"))
      .agg(count(lit(1)).as("__n"))
      .agg(sum(expr("__n * (__n - 1) div 2")).as("__pairs"))
      .collect()(0).getLong(0)
    // JSON null (not a -1 sentinel) when the verify pass was skipped:
    // -1 collides with Bench's -1-means-failed convention (r8 ADVICE)
    val verified: String =
      if (args.contains("--verified")) {
        // SLIM verify: the engine path (lshCandidatePairs) carries two
        // 256-byte vectors through every joined row — right for the
        // operator (verification must run inline at scale), wrong for a
        // counting probe: at 1000x/b12 the 1.68B-candidate join churned
        // 860 GB of transient row width and ran 5+ hours (r9, never
        // finished in-window). The verified-edge COUNT is a data
        // property, not an engine path, so the probe joins IDS only
        // (the banded exchange drops to ~150 MB), resolves vectors from
        // one in-memory array (local mode: a single copy — ids tile
        // [0, copies*n0) by construction), and replays the engine's
        // exact arithmetic: strict left-fold double accumulation in
        // index order (VectorFunctions.cosine's fsum), HALF_UP 6-dp
        // round, >= threshold, distinct pairs. Validated: at 300x/b12
        // this path reproduces r9's engine-measured 1,143,752 exactly.
        // Collect the n0 BASE vectors only (r10 ADVICE: collecting the
        // replicated table put copies×n0 rows on the driver — at 1000x
        // that collect was the new OOM ceiling). Replica c's vector is
        // a deterministic sign-flip of its base (the same Murmur3
        // Rademacher rule the DF construction above uses, replayed
        // element-wise at lookup: id = c*n0 + base), so driver and
        // broadcast memory are copy-count-INDEPENDENT.
        require(n0 < Int.MaxValue, "id-indexed base vector table")
        val vecs = new Array[Array[Float]](n0.toInt)
        base.collect().foreach { r =>
          vecs(r.getLong(0).toInt) = r.getSeq[Float](1).toArray
        }
        require(!vecs.contains(null),
          "base vec_ids must be contiguous [0, n0) for the id-indexed table")
        val bcVecs = spark.sparkContext.broadcast(vecs)
        val threshold = 0.4
        val nBase = n0
        // hash(i, c) = Murmur3(int c, seed = Murmur3(int i, seed = 42));
        // pmod 2 == 0 -> +1 — bit-identical to the column spelling in
        // the replica construction (hash/pmod on two int columns)
        def rade(i: Int, c: Int): Float = {
          var h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(i, 42)
          h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(c, h)
          val m = h % 2
          if ((if (m < 0) m + 2 else m) == 0) 1.0f else -1.0f
        }
        // cos over two replica ids: element i of replica c is the FLOAT
        // product base(i) * sign(i, c) — same IEEE float multiply the
        // DF transform applied — then the engine's strict double fold
        def cos6(v: Array[Array[Float]], idA: Long, idB: Long): Double = {
          val ca = (idA / nBase).toInt; val a = v((idA % nBase).toInt)
          val cb = (idB / nBase).toInt; val b = v((idB % nBase).toInt)
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            val x = (a(i) * rade(i, ca)).toDouble
            val y = (b(i) * rade(i, cb)).toDouble
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          val (sa, sb) = (math.sqrt(na), math.sqrt(nb))
          val c = if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
          BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        }
        val bandedIds = embN
          .select(col("vec_id"), posexplode(graft.functions.VectorFunctions
            .hyperplaneSignatureWide(col("embedding"), bands, bits))
            .as(Seq("band", "key")))
          .select(col("vec_id"),
            struct(col("band"), col("key")).as("__bk"))
        val a = bandedIds.select(col("vec_id").as("id_a"), col("__bk"))
        val b = bandedIds.select(col("vec_id").as("id_b"), col("__bk"))
        import spark.implicits._
        a.join(b, Seq("__bk"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).as[(Long, Long)]
          .filter { p =>
            cos6(bcVecs.value, p._1, p._2) >= threshold
          }
          .distinct().count().toString
      } else "null"
    println(s"""{"metric":"edge_probe","copies":$copies,"bits_per_band":$bits,""" +
      s""""n_vectors":${copies * n0},"n_candidate_pairs":$cand,""" +
      s""""n_verified_edges":$verified}""")
    spark.stop()
  }
}
