package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.functions.call_function
import graft.functions.{BloomSketch, ByteHistogram, CmsSketch, CosineSimilarity, ExifOrientationExpr, FlacStreaminfo, HyperplaneSignatureExpr, HyperplaneSignatureWideExpr, JaroWinklerSim, JpegDimsExpr, KmvSketch, Mp3Header, Mp4Meta, PngDimsExpr, WebpDimsExpr}

/** Session extension registering graft's native Catalyst expressions.
  * Install via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. `Graft.install`
  * registers at runtime on an existing session (same registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(Graft.cosineSimDescriptor)
    ext.injectFunction(Graft.kmvSketchDescriptor)
    ext.injectFunction(Graft.cmsSketchDescriptor)
    ext.injectFunction(Graft.byteHistogramDescriptor)
    ext.injectFunction(Graft.hyperplaneSigDescriptor)
    ext.injectFunction(Graft.hyperplaneSigWideDescriptor)
    ext.injectFunction(Graft.bloomSketchDescriptor)
    ext.injectFunction(Graft.jaroWinklerDescriptor)
    ext.injectFunction(Graft.exifOrientationDescriptor)
    ext.injectFunction(Graft.flacStreaminfoDescriptor)
    ext.injectFunction(Graft.mp3HeaderDescriptor)
    ext.injectFunction(Graft.mp4MetaDescriptor)
    ext.injectFunction(Graft.webpDimsDescriptor)
    ext.injectFunction(Graft.pngDimsDescriptor)
    ext.injectFunction(Graft.jpegDimsDescriptor)
  }
}

object Graft {

  private[graft] val cosineSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_sim expects exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  private[graft] val kmvSketchDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_sketch"),
    new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "kmv_sketch expects (hash_col, k)")
      val k = children(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"kmv_sketch k must be an integer literal, got $other")
      }
      KmvSketch(children.head, k)
    })

  private[graft] val cmsSketchDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cms_sketch"),
    new ExpressionInfo(classOf[CmsSketch].getName, "cms_sketch"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "cms_sketch expects (hash_col, depth, width)")
      (children(1), children(2)) match {
        case (Literal(d: Int, _), Literal(w: Int, _)) =>
          CmsSketch(children.head, d, w)
        case other => throw new IllegalArgumentException(
          s"cms_sketch depth/width must be integer literals, got $other")
      }
    })

  private[graft] val byteHistogramDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("byte_histogram"),
    new ExpressionInfo(classOf[ByteHistogram].getName, "byte_histogram"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "byte_histogram expects (binary_col, bins)")
      val bins = children(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"byte_histogram bins must be an integer literal, got $other")
      }
      ByteHistogram(children.head, bins)
    })

  private[graft] val hyperplaneSigDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_sig"),
    new ExpressionInfo(classOf[HyperplaneSignatureExpr].getName,
      "hyperplane_sig"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "hyperplane_sig expects (vec, bits, center)")
      (children(1), children(2)) match {
        case (Literal(bits: Int, _), Literal(center: Boolean, _)) =>
          HyperplaneSignatureExpr(children.head, bits, center)
        case other => throw new IllegalArgumentException(
          s"hyperplane_sig bits/center must be literals, got $other")
      }
    })

  private[graft] val hyperplaneSigWideDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_sig_wide"),
    new ExpressionInfo(classOf[HyperplaneSignatureWideExpr].getName,
      "hyperplane_sig_wide"),
    (children: Seq[Expression]) => {
      require(children.length == 4,
        "hyperplane_sig_wide expects (vec, words, bitsPerWord, center)")
      (children(1), children(2), children(3)) match {
        case (Literal(words: Int, _), Literal(bpw: Int, _),
              Literal(center: Boolean, _)) =>
          HyperplaneSignatureWideExpr(children.head, words, bpw, center)
        case other => throw new IllegalArgumentException(
          s"hyperplane_sig_wide words/bitsPerWord/center must be literals, got $other")
      }
    })

  private[graft] val bloomSketchDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_sketch"),
    new ExpressionInfo(classOf[BloomSketch].getName, "bloom_sketch"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "bloom_sketch expects (hash_col, bits, hashes)")
      (children(1), children(2)) match {
        case (Literal(bits: Int, _), Literal(k: Int, _)) =>
          BloomSketch(children.head, bits, k)
        case other => throw new IllegalArgumentException(
          s"bloom_sketch bits/hashes must be integer literals, got $other")
      }
    })

  private[graft] val jaroWinklerDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "jaro_winkler expects exactly 2 arguments")
      JaroWinklerSim(children.head, children(1))
    })

  private[graft] val exifOrientationDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("exif_orientation"),
    new ExpressionInfo(classOf[ExifOrientationExpr].getName, "exif_orientation"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "exif_orientation expects 1 argument")
      ExifOrientationExpr(children.head)
    })

  private[graft] val flacStreaminfoDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("flac_streaminfo"),
    new ExpressionInfo(classOf[FlacStreaminfo].getName, "flac_streaminfo"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "flac_streaminfo expects 1 argument")
      FlacStreaminfo(children.head)
    })

  private[graft] val mp3HeaderDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mp3_header"),
    new ExpressionInfo(classOf[Mp3Header].getName, "mp3_header"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "mp3_header expects 1 argument")
      Mp3Header(children.head)
    })

  private[graft] val mp4MetaDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mp4_meta"),
    new ExpressionInfo(classOf[Mp4Meta].getName, "mp4_meta"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "mp4_meta expects 1 argument")
      Mp4Meta(children.head)
    })

  private[graft] val webpDimsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("webp_dims"),
    new ExpressionInfo(classOf[WebpDimsExpr].getName, "webp_dims"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "webp_dims expects 1 argument")
      WebpDimsExpr(children.head)
    })

  private[graft] val pngDimsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("png_dims"),
    new ExpressionInfo(classOf[PngDimsExpr].getName, "png_dims"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "png_dims expects 1 argument")
      PngDimsExpr(children.head)
    })

  private[graft] val jpegDimsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jpeg_dims"),
    new ExpressionInfo(classOf[JpegDimsExpr].getName, "jpeg_dims"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "jpeg_dims expects 1 argument")
      JpegDimsExpr(children.head)
    })

  /** Runtime registration on an existing session (idempotent). */
  def install(spark: SparkSession): SparkSession = {
    Seq(cosineSimDescriptor, kmvSketchDescriptor, cmsSketchDescriptor,
        byteHistogramDescriptor, hyperplaneSigDescriptor,
        hyperplaneSigWideDescriptor,
        bloomSketchDescriptor,
        jaroWinklerDescriptor, exifOrientationDescriptor,
        flacStreaminfoDescriptor, mp3HeaderDescriptor,
        mp4MetaDescriptor, webpDimsDescriptor, pngDimsDescriptor,
        jpegDimsDescriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    graft.similarity.SimilarityOps.nativeCosineEnabled = true
    graft.functions.VectorFunctions.nativeSignatureEnabled = true
    // Engine session tuning (r12 optimization round, measured at sf0.1
    // and reasoned for scale; both are semantics-preserving):
    //
    // 1. InferFiltersFromGenerate synthesizes `size(e) > 0 AND
    //    isnotnull(e)` under every explode(e). For this engine's
    //    generators e is a tokenize/shingle/slice HOF chain, so the
    //    inferred filter re-evaluates the full chain TWICE per input
    //    row, and predicate pushdown drags it below the
    //    parallelism-restoring exchange into the scan stage
    //    (single-task on single-row-group files: q196 3.7 s of 3.9,
    //    q92 3.3 s of 4.2 at sf0.1). The filter can only drop rows
    //    whose generator output is empty — rows a non-outer Generate
    //    drops anyway — so excluding the rule changes cost, never
    //    results. Measured: q196 3.9→1.1 s, q92 4.2→2.2 s,
    //    q208 4.4→1.5 s.
    // 2. AQE coalescing sizes post-shuffle partitions by COMPRESSED
    //    bytes. Short-string text shuffles (n-gram/token aggregates)
    //    compress ~10× and carry heavy per-row compute, so the 1 MiB
    //    default floor coalesces them to ONE task (q244: a 3.7 s
    //    serial stage in a 4 s query). 64k keeps such stages parallel
    //    while still folding genuinely empty partitions; at scale
    //    partitions dwarf either floor and the setting is inert.
    val inferRule =
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    val prior = spark.conf.getOption("spark.sql.optimizer.excludedRules")
      .filter(_.nonEmpty)
    if (!prior.exists(_.contains(inferRule)))
      spark.conf.set("spark.sql.optimizer.excludedRules",
        prior.map(_ + ",").getOrElse("") + inferRule)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "64k")
    spark
  }

  /** Evict everything a query (or an operator that caches-and-returns:
    * prepared shingles, CC labels, checkpoint blocks) left in executor
    * storage: plan-keyed DataFrame caches AND raw RDD persists. Harness
    * mains (Bench/Verify/QueryProbe) call this between queries so
    * storage stays flat across a 100+ query session — safe THERE
    * because every plan is rebuilt from scratch after the call.
    *
    * A caller that still HOLDS DataFrames built before the call must
    * pass `includeCheckpointed = false`: a `localCheckpoint`ed RDD
    * (PageRank's edge cache, BFS frontiers, …) has its lineage
    * truncated, so unpersisting it makes any live plan that references
    * it permanently unrecoverable ("Checkpoint block not found"), where
    * plain cached data would just recompute. Long-lived API servers
    * evicting on a cadence are exactly this case.
    */
  def evictAll(spark: SparkSession, includeCheckpointed: Boolean = true): Unit = {
    try spark.catalog.clearCache() catch { case _: Throwable => () }
    try spark.sparkContext.getPersistentRDDs.values
      .filter(includeCheckpointed || !_.isCheckpointed)
      .foreach(_.unpersist(blocking = false))
    catch { case _: Throwable => () }
  }

  /** True iff `name` is registered on the CURRENT thread's active
    * session. The `native*Enabled` flags are JVM-global but function
    * registration is per-session, so a column built for a DIFFERENT
    * session in the same JVM (one that never ran `install`) must fall
    * back to the HOF twin instead of failing analysis with "undefined
    * function" (r10 ADVICE). Callers AND this with the flag: the flag
    * stays the tests' kill switch, this guard scopes it to sessions
    * that can actually resolve the function. A registry lookup per
    * COLUMN BUILD (driver-side, never per row).
    */
  def nativeFnAvailable(name: String): Boolean =
    SparkSession.getActiveSession.exists { s =>
      try s.sessionState.functionRegistry
        .functionExists(FunctionIdentifier(name))
      catch { case _: Throwable => false }
    }

  /** Column-level API for the native expression; requires `install`
    * (or the extension) on the session that runs the plan.
    */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Jaro-Winkler string similarity (native codegen expression). */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("jaro_winkler", a, b)

  /** EXIF orientation (1–8) of a JPEG binary column; NULL when absent
    * (native codegen expression, pure header byte walk).
    */
  def exifOrientation(bin: Column): Column =
    call_function("exif_orientation", bin)

  /** FLAC STREAMINFO struct (channels, sample_rate, bits_per_sample,
    * total_samples, duration_micros) of a binary column; NULL when the
    * payload is not FLAC (native codegen expression, header byte walk).
    */
  def flacStreaminfo(bin: Column): Column =
    call_function("flac_streaminfo", bin)

  /** MP3 frame-header struct (channels, sample_rate) of a binary
    * column; NULL when not accepted as MP3 (native codegen expression,
    * two-frame sniff shared with `Multimodal.decodeMp3`).
    */
  def mp3Header(bin: Column): Column = call_function("mp3_header", bin)

  /** ISO-BMFF movie struct (brand, width, height, timescale,
    * duration_micros) of a binary column; NULL when the payload is not
    * ISO-BMFF (native codegen expression, box walk shared with
    * `Multimodal.decodeVideo`).
    */
  def mp4Meta(bin: Column): Column = call_function("mp4_meta", bin)

  /** WebP dimension struct (variant, width, height) of a binary
    * column; NULL when the payload is not WebP (native codegen
    * expression, RIFF walk shared with `Multimodal.decodeWebp`).
    */
  def webpDims(bin: Column): Column = call_function("webp_dims", bin)

  /** PNG IHDR struct (width, height, bit_depth, color_type) of a
    * binary column; NULL when the payload is not PNG (native codegen
    * expression, IHDR walk shared with `Multimodal.decodePng`).
    */
  def pngDims(bin: Column): Column = call_function("png_dims", bin)

  /** JPEG SOF struct (width, height, precision, n_components) of a
    * binary column; NULL when the payload is not JPEG (native codegen
    * expression, segment walk shared with `Multimodal.decodeJpeg`).
    */
  def jpegDims(bin: Column): Column = call_function("jpeg_dims", bin)

  /** KMV distinct-count sketch over a pre-hashed bigint column. */
  def kmvSketch(hashed: Column, k: Int): Column =
    call_function("kmv_sketch", hashed, org.apache.spark.sql.functions.lit(k))

  /** Count-min sketch (flattened depth×width counters) over a
    * pre-hashed bigint column.
    */
  def cmsSketch(hashed: Column, depth: Int, width: Int): Column =
    call_function("cms_sketch", hashed,
      org.apache.spark.sql.functions.lit(depth),
      org.apache.spark.sql.functions.lit(width))

  /** Normalized byte histogram of a binary column (native codegen). */
  def byteHistogram(bin: Column, bins: Int): Column =
    call_function("byte_histogram", bin,
      org.apache.spark.sql.functions.lit(bins))

  /** Sign-LSH hyperplane signature of a numeric-array column (native
    * codegen, one fused loop for all bits; optional mean-centering for
    * all-nonnegative populations). Bit-identical to
    * `VectorFunctions.hyperplaneSignature`'s HOF fallback.
    */
  def hyperplaneSig(v: Column, bits: Int, center: Boolean = false): Column =
    call_function("hyperplane_sig", v,
      org.apache.spark.sql.functions.lit(bits),
      org.apache.spark.sql.functions.lit(center))

  /** Multi-word sign-LSH signature (`array<long>`, native codegen, one
    * fused loop for all words×bitsPerWord bits). Bit-identical to
    * `VectorFunctions.hyperplaneSignatureWide`'s HOF fallback and to
    * word-boundary slices of the single-long form.
    */
  def hyperplaneSigWide(v: Column, words: Int, bitsPerWord: Int,
                        center: Boolean = false): Column =
    call_function("hyperplane_sig_wide", v,
      org.apache.spark.sql.functions.lit(words),
      org.apache.spark.sql.functions.lit(bitsPerWord),
      org.apache.spark.sql.functions.lit(center))

  /** Bloom filter (packed bit words) over a pre-hashed bigint column. */
  def bloomSketch(hashed: Column, bits: Int, hashes: Int): Column =
    call_function("bloom_sketch", hashed,
      org.apache.spark.sql.functions.lit(bits),
      org.apache.spark.sql.functions.lit(hashes))

  /** Bloom membership probe: true iff ALL `hashes` addressed bits are
    * set — pure column arithmetic (element_at + mask), no UDF, so the
    * probe side stays inside whole-stage codegen. Same universal-hash
    * family as the sketch update. No false negatives; false positives
    * at the textbook (1−e^(−kn/m))^k rate, deterministically
    * reproducible in any engine that replays the bit arithmetic.
    */
  def bloomContains(sketch: Column, hashed: Column,
                    bits: Int, hashes: Int): Column = {
    import org.apache.spark.sql.functions._
    (0 until hashes).map { i =>
      val bit = pmod(
        (hashed * (2L * i + 1L) + (i.toLong * i + 98765L)),
        lit(graft.functions.TextFunctions.MinhashP)) % bits
      val word = element_at(sketch, (floor(bit / 64) + 1).cast("int"))
      val mask = call_function("shiftleft", lit(1L), (bit % 64).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }

  /** CMS inner product: min over depth rows of Σ_buckets a[d][w]·b[d][w]
    * — the classic equi-join SIZE estimate |A ⋈ B| (Alon-Matias-Szegedy
    * F₂/join-size line; overestimates by hash-collision mass, never
    * under). Two constant-size sketches stand in for scanning either
    * table: the optimizer-statistics primitive for join planning at
    * 100 TB. Pure column arithmetic over the two counter arrays
    * (transform + aggregate HOFs) — no UDF, replayable in any engine
    * that rebuilds the counter matrix.
    */
  def cmsInnerProduct(skA: Column, skB: Column,
                      depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    (0 until depth).map { d =>
      aggregate(
        transform(sequence(lit(d * width + 1), lit((d + 1) * width)),
          j => element_at(skA, j.cast("int")) * element_at(skB, j.cast("int"))),
        lit(0L), (acc, x) => acc + x)
    }.reduce(least(_, _))
  }

  /** CMS point estimate: min over rows of the addressed counter.
    * `hashed` is the probe key's md5Long; same universal-hash family as
    * the sketch update (a=2i+1, b=i²+98765 mod P mod width).
    */
  def cmsEstimate(sketch: Column, hashed: Column,
                  depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    (0 until depth).map { i =>
      val bucket = pmod(
        (hashed * (2L * i + 1L) + (i.toLong * i + 98765L)),
        lit(graft.functions.TextFunctions.MinhashP)) % width
      element_at(sketch, (bucket + i * width + 1).cast("int"))
    }.reduce(least(_, _))
  }
}
