package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{TextFunctions, VectorFunctions}
import graft.tags.TagOps

/** Property tests (SURVEY §5.1) for the scalar-algebra invariants:
  * T5 Jaccard symmetry/range/identity, T7 normalize idempotence,
  * V1 cosine symmetry/range/guards. Deterministically seeded scalacheck
  * generators; each property evaluates ALL its cases in one Spark job
  * (a DataFrame of generated inputs), not one job per case.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val tagsGen: Gen[Seq[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "gg", "hh")).map(_.toSeq)

  test("T5 jaccard: symmetric, in [0,1], 1 on equal non-empty, 0 when a side is empty") {
    val ps = cases(Gen.zip(tagsGen, tagsGen), 300)
    val rows = ps.toDF("a", "b").select(
        TextFunctions.jaccard(col("a"), col("b")).as("jab"),
        TextFunctions.jaccard(col("b"), col("a")).as("jba"),
        TextFunctions.jaccard(col("a"), col("a")).as("jaa"),
        (size(col("a")) === 0 || size(col("b")) === 0).as("anyEmpty"),
        (size(col("a")) === 0).as("aEmpty"))
      .collect()
    rows.foreach { r =>
      val (jab, jba, jaa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(jab == jba, "symmetry")
      assert(jab >= 0.0 && jab <= 1.0, "range")
      if (r.getBoolean(3)) assert(jab == 0.0, "empty side => 0 (GraphDB.cpp:553-555)")
      assert(jaa == (if (r.getBoolean(4)) 0.0 else 1.0), "self-similarity")
    }
  }

  test("T7 normalizeTag: idempotent; output is lowercase with no spaces or trailing hyphen") {
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\t', '-', '_', 'Ж', 'ß'))).map(_.mkString)
    val ss = cases(strGen, 300)
    val rows = ss.toDF("s").select(
        TagOps.normalizeTag(col("s")).as("n1"),
        TagOps.normalizeTag(TagOps.normalizeTag(col("s"))).as("n2"))
      .collect()
    rows.foreach { r =>
      val (n1, n2) = (r.getString(0), r.getString(1))
      assert(n1 == n2, s"idempotence: '$n1' vs '$n2'")
      // ASCII-only lowercase — the reference's bytewise std::tolower
      // leaves non-ASCII untouched (TagClient.cpp:104-106)
      assert(!n1.exists(c => c >= 'A' && c <= 'Z'), "ascii lowercase")
      assert(!n1.exists(_.isWhitespace), "no whitespace")
      assert(!n1.endsWith("-"), "no trailing hyphen (TagClient.cpp:115-121)")
    }
  }

  test("V1 cosine: symmetric, |cos| <= 1+eps, self ~ 1, dim-mismatch and zero-norm give 0") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f)).map(_.toSeq)
    val ps = cases(Gen.zip(vecGen, vecGen), 300)
    val zero = Seq.fill(8)(0.0f)
    val short = Seq(1.0f, 2.0f)
    val rows = ps.map { case (a, b) => (a, b, zero, short) }
      .toDF("a", "b", "z", "s")
      .select(
        VectorFunctions.cosine(col("a"), col("b")).as("cab"),
        VectorFunctions.cosine(col("b"), col("a")).as("cba"),
        VectorFunctions.cosine(col("a"), col("a")).as("caa"),
        VectorFunctions.cosine(col("a"), col("z")).as("caz"),
        VectorFunctions.cosine(col("a"), col("s")).as("cas"),
        VectorFunctions.normSq(col("a")).as("na"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "symmetry (same fold order)")
      assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-9, "range")
      if (r.getDouble(5) > 0)
        assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, "self-similarity")
      assert(r.getDouble(3) == 0.0, "zero-norm guard (Clustering.cpp:13-18)")
      assert(r.getDouble(4) == 0.0, "dim-mismatch guard (Clustering.cpp:9-12)")
    }
  }

  test("minhash: equal token sets get equal length-k signatures") {
    val ps = cases(tagsGen.map(_.distinct), 200)
    val rows = ps.map(t => (t, t)).toDF("a", "b").select(
        TextFunctions.minhashSignature(col("a"), 16).as("sa"),
        TextFunctions.minhashSignature(col("b"), 16).as("sb"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](0).length == 16)
    }
  }

  test("partitionQuality + degreeMixing invariants on the real LSH graph") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = graft.similarity.SimilarityOps
      .lshCandidatePairs(emb, "vec_id", "embedding",
        threshold = 0.4, bands = 3, bitsPerBand = 4)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    val m = pairs.count()
    val nV = emb.count()
    val labels = graft.graph.Components.connectedComponentsFast(
      emb.select("vec_id"), pairs)
    val pq = graft.graph.Components.partitionQuality(labels, pairs)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // conservation laws, partition-independent: sizes cover V, degree
    // mass covers both endpoints of every edge, intra + half the cut
    // edges cover E
    assert(pq.map(_._1).sum == nV, "sum(n_nodes) == |V|")
    assert(pq.map(_._3).sum == 2 * m, "sum(degree_sum) == 2|E|")
    assert(pq.map(_._2).sum + pq.map(_._4).sum / 2 == m,
      "sum(intra) + sum(boundary)/2 == |E|")
    // CC labels put every edge inside a cluster: zero cut edges
    assert(pq.forall(_._4 == 0L), "CC partition has no boundary edges")
    val dm = graft.graph.Traversals.degreeMixing(pairs).collect()(0)
    val (n, sx, sxx, sxy) =
      (dm.getLong(0), dm.getLong(1), dm.getLong(2), dm.getLong(3))
    assert(n == 2 * m, "one (x, y) observation per edge orientation")
    // Cauchy-Schwarz keeps the assortativity coefficient in [-1, 1]
    val num = (n * sxy - sx * sx).toDouble
    val den = (n * sxx - sx * sx).toDouble
    assert(den >= 0 && (den == 0 || math.abs(num / den) <= 1.0 + 1e-9))
  }

  test("componentSizeHistogram conservation + dimVarianceProfile " +
    "partition invariance on real tables") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val nV = emb.count()
    val pairs = graft.similarity.SimilarityOps
      .lshCandidatePairs(emb, "vec_id", "embedding",
        threshold = 0.4, bands = 3, bitsPerBand = 4)
      .select(col("id_a"), col("id_b"))
    val cc = graft.graph.Components
      .connectedComponentsFast(emb.select("vec_id"), pairs)
      .toDF("id", "component")
    val hist = graft.graph.Components.componentSizeHistogram(cc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // members cover V exactly; n_members is size × families per row
    assert(hist.map(_._3).sum == nV, "sum(n_members) == |V|")
    assert(hist.forall(h => h._3 == h._1 * h._2))
    // integer-quantized sums make the profile partition-independent
    val p1 = graft.similarity.SimilarityOps
      .dimVarianceProfile(emb, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val p2 = graft.similarity.SimilarityOps
      .dimVarianceProfile(emb.repartition(13), "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(p1 == p2, "profile identical under repartition(13)")
    assert(p1.forall(d => d._2 == nV), "every dim sees every vector")
  }
}
