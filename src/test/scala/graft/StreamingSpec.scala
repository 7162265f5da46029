package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {

  test("stream hourly agg == batch hourly agg (AvailableNow over sf0.001)") {
    // stage the events file into a stream-source dir
    val dir = Files.createTempDirectory("evstream").toString
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    Files.copy(src, java.nio.file.Paths.get(s"$dir/batch0.parquet"))

    val stream = EventStreams.readEventStream(spark, dir)
    assert(stream.isStreaming)
    val result = EventStreams.runToMemory(
      EventStreams.hourlyAgg(stream), "hourly_test", OutputMode.Update())

    val batch = EventStreams.hourlyAgg(
      graft.Tables.events(spark, "/root/testdata/sf0.001"))
    val s = result.orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    val b = batch.orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    assert(s == b, "streaming AvailableNow result must equal the batch plan")
  }

  test("streaming exact dedup: duplicated input files collapse to distinct contents") {
    val dir = Files.createTempDirectory("evstream3").toString
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    // two identical micro-batches: every event arrives twice
    Files.copy(src, java.nio.file.Paths.get(s"$dir/batch0.parquet"))
    Files.copy(src, java.nio.file.Paths.get(s"$dir/batch1.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    val deduped = EventStreams.runToMemory(
      EventStreams.dedupStream(stream, keyCols = Seq("event_id")),
      "dedup_test", OutputMode.Append())
    val expected = graft.Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(deduped.count() == expected,
      "each event kept exactly once despite arriving in two micro-batches")
  }

  test("stream-stream interval join == batch interval join " +
       "(click→purchase attribution)") {
    val dir = Files.createTempDirectory("evstream4").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/batch0.parquet"))
    def split(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "click"),
      df.filter(col("event_type") === "purchase"))
    val (sl, sr) = split(EventStreams.readEventStream(spark, dir))
    val streamed = EventStreams.runToMemory(
      EventStreams.intervalJoin(sl, sr, maxGapSec = 1800),
      "ssjoin_test", OutputMode.Append())
    val (bl, br) = split(graft.Tables.events(spark, "/root/testdata/sf0.001"))
    val batch = EventStreams.intervalJoin(bl, br, maxGapSec = 1800)
    val s = streamed.orderBy("user_id", "l_event_id", "r_event_id")
      .collect().map(_.toString).toSeq
    val b = batch.orderBy("user_id", "l_event_id", "r_event_id")
      .collect().map(_.toString).toSeq
    assert(s.nonEmpty, "attribution pairs exist in the fixture")
    assert(s == b, "stream-stream interval join must equal the batch join")
  }

  test("mapGroupsWithState sessionization == batch lag-window sessionization") {
    val dir = Files.createTempDirectory("evstream2").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/batch0.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    val sessions = EventStreams.runToMemory(
      EventStreams.sessionize(stream).toDF(), "sessions_test", OutputMode.Update())
    val batch = graft.queries.EventsPack
      .queries("q61_sessionize")(spark, "/root/testdata/sf0.001")
    val s = sessions.orderBy("user_id")
      .select("user_id", "n_events", "n_sessions").collect().map(_.toString).toSeq
    val b = batch.select("user_id", "n_events", "n_sessions")
      .collect().map(_.toString).toSeq
    assert(s == b, "custom-state sessionization must match the oracle-checked batch query")
  }

  test("windowed CMS sketch: micro-batch merged state == batch sketch") {
    Graft.install(spark)
    val dir = Files.createTempDirectory("evstream5").toString
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    // two micro-batches: the sketch state must MERGE across batches
    Files.copy(src, java.nio.file.Paths.get(s"$dir/batch0.parquet"))
    Files.copy(src, java.nio.file.Paths.get(s"$dir/batch1.parquet"))
    val streamed = EventStreams.runToMemory(
      EventStreams.hourlySketch(EventStreams.readEventStream(spark, dir)),
      "cms_stream_test", OutputMode.Complete())
    val batchEvents = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = EventStreams.hourlySketch(batchEvents.union(batchEvents))
    val s = streamed.orderBy("window_start").collect()
      .map(r => (r.get(0).toString, r.getSeq[Long](1).toSeq)).toSeq
    val b = batch.orderBy("window_start").collect()
      .map(r => (r.get(0).toString, r.getSeq[Long](1).toSeq)).toSeq
    assert(s == b, "CMS counter matrices must merge to the batch result")
    assert(s.nonEmpty && s.head._2.exists(_ > 0), "sketch carries counts")
  }

  test("windowed KMV sketch: micro-batch merged state == batch sketch") {
    Graft.install(spark)
    val dir = Files.createTempDirectory("evstream_kmv").toString
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    Files.copy(src, java.nio.file.Paths.get(s"$dir/batch0.parquet"))
    Files.copy(src, java.nio.file.Paths.get(s"$dir/batch1.parquet"))
    val streamed = EventStreams.runToMemory(
      EventStreams.hourlyDistinctSketch(
        EventStreams.readEventStream(spark, dir)),
      "kmv_stream_test", OutputMode.Complete())
    val batchEvents = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = EventStreams.hourlyDistinctSketch(
      batchEvents.union(batchEvents))
    val s = streamed.orderBy("window_start").collect()
      .map(r => (r.get(0).toString, r.getDouble(1))).toSeq
    val b = batch.orderBy("window_start").collect()
      .map(r => (r.get(0).toString, r.getDouble(1))).toSeq
    assert(s == b, "KMV minima sets must union to the batch state")
    assert(s.nonEmpty && s.forall(_._2 > 0), "estimates are positive")
  }

  test("stream-static corpus dedup: overlapping batches screened against " +
       "the static corpus and each other") {
    import org.apache.spark.sql.types._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 20)
    // two overlapping micro-batches: [10,35) and [25,50)
    val dir = Files.createTempDirectory("docstream").toString
    Seq((10, 35, "b0"), (25, 50, "b1")).foreach { case (lo, hi, name) =>
      val tmp = Files.createTempDirectory(s"docbatch$name").toString
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/batch_$name.parquet"))
    }
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = EventStreams.runToMemory(
      EventStreams.corpusDedupStream(stream, corpus),
      "corpus_dedup_test", OutputMode.Append())
    // expected: every doc id in [20,50) exactly once — corpus hashes
    // [10,20) anti-joined away, the [25,35) overlap deduped across batches
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (20L until 50L).toSeq,
      s"got ${ids.size} docs: ${ids.take(5)}...")
  }

  test("streaming Bloom screen == batch bloomDecontaminate probe side") {
    import org.apache.spark.sql.types._
    Graft.install(spark)
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 30)
    val probeDocs = docs.filter(col("doc_id") >= 30 && col("doc_id") < 70)
    val dir = Files.createTempDirectory("docstream-bloom").toString
    Seq((30, 50, "b0"), (50, 70, "b1")).foreach { case (lo, hi, name) =>
      val tmp = Files.createTempDirectory(s"bloombatch$name").toString
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/batch_$name.parquet"))
    }
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val streamed = EventStreams.runToMemory(
      EventStreams.corpusDecontaminateStreamBloom(stream, corpus),
      "bloom_screen_test", OutputMode.Update())
    // batch twin: bloomDecontaminate over corpus∪probe with the corpus
    // as the "eval" side — its probe rows are exactly the stream docs
    val batch = graft.pipeline.Corpus.bloomDecontaminate(
      corpus.unionByName(probeDocs), "doc_id", "text",
      evalPred = col("doc_id") < 30)
    val s = streamed.orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_flagged", "flagged")
      .collect().map(_.toString).toSeq
    val b = batch.orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_flagged", "flagged")
      .collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == b,
      "streamed Bloom decisions must equal the batch operator")
    assert(streamed.filter(col("flagged")).count() >= 1,
      "the synthetic corpus repeats shingles across docs — non-vacuous")
  }

  test("streaming contamination report == batch decontaminate probe side") {
    import org.apache.spark.sql.types._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val evalCorpus = docs.filter(col("doc_id") < 30)
    val probeDocs = docs.filter(col("doc_id") >= 30 && col("doc_id") < 70)
    val dir = Files.createTempDirectory("docstream-overlap").toString
    Seq((30, 50, "b0"), (50, 70, "b1")).foreach { case (lo, hi, name) =>
      val tmp = Files.createTempDirectory(s"overlapbatch$name").toString
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/batch_$name.parquet"))
    }
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val streamed = EventStreams.runToMemory(
      EventStreams.evalOverlapStream(stream, evalCorpus, n = 5),
      "eval_overlap_stream_test", OutputMode.Update())
    // batch twin: decontaminate over eval∪probe with the eval side as
    // the screen — its train rows are exactly the stream docs, and its
    // n_overlap counts the same per-doc distinct colliding shingles
    val batch = graft.pipeline.Corpus.decontaminate(
      evalCorpus.unionByName(probeDocs), "doc_id", "text",
      evalPred = col("doc_id") < 30, n = 5)
    val s = streamed.orderBy("doc_id")
      .select("doc_id", "n_dirty", "contaminated")
      .collect().map(_.toString).toSeq
    val b = batch.orderBy("doc_id")
      .select("doc_id", "n_overlap", "contaminated")
      .collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == b,
      "streamed collision reports must equal the batch decontaminate gate")
    assert(streamed.filter(col("contaminated")).count() >= 1,
      "the synthetic corpus repeats shingles across docs — non-vacuous")
    // the report columns are internally consistent integers
    assert(streamed.filter(col("n_dirty") > col("n_grams")).count() == 0)
    assert(streamed.filter(
      col("dirty_permille") =!= expr("(1000L * n_dirty) div n_grams"))
      .count() == 0)
  }

  test("streaming fuzzy-contamination pair report == batch evalNearDupReport") {
    import org.apache.spark.sql.types._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val evalCorpus = docs.filter(col("doc_id") < 30)
    // train stream = docs 20..60 under shifted ids: rows [20,30) are
    // verbatim copies of eval docs (jaccard 1.0 — caught in every
    // band), the rest exercise the no-collision path
    val train = docs.filter(col("doc_id") >= 20 && col("doc_id") < 60)
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val dir = Files.createTempDirectory("docstream-neardup").toString
    Seq((10020L, 10040L, "b0"), (10040L, 10060L, "b1")).foreach {
      case (lo, hi, name) =>
        val tmp = Files.createTempDirectory(s"ndbatch$name").toString
        train.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.copy(part.toPath,
          java.nio.file.Paths.get(s"$dir/batch_$name.parquet"))
    }
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val streamed = EventStreams.runToMemory(
      EventStreams.evalNearDupStream(stream, evalCorpus),
      "eval_neardup_stream_test", OutputMode.Append())
    val batch = graft.pipeline.Corpus.evalNearDupReport(
      evalCorpus.unionByName(train), "doc_id", "text",
      evalPred = col("doc_id") < 30)
    val s = streamed.orderBy("eval_id", "train_id")
      .collect().map(_.toString).toSeq
    val b = batch.orderBy("eval_id", "train_id")
      .collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == b,
      "streamed verified pair reports must equal the batch fuzzy audit")
    // the verbatim copies ARE in the report, at jaccard 1.0
    assert(streamed.filter(col("jaccard") === 1.0).count() >= 10,
      "rows [20,30) are verbatim eval copies — non-vacuous")
  }

  test("evalNearDupStream watermark option: in-window pairs match the " +
       "unwindowed report; expired pair state re-emits (bounded state)") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val evalCorpus = docs.filter(col("doc_id") < 30)
    val copyText = docs.filter(col("doc_id") === 5L)
      .select("text").collect()(0).getString(0)
    // three timed micro-batches: b0 plants a verbatim copy of eval doc 5
    // at T0; b1 is unrelated traffic 10h later (advances the watermark
    // far past T0 + the 1h delay, expiring b0's pair state); b2 replays
    // the SAME copy — the windowed dedup must re-emit it, proving state
    // was dropped, while the unwindowed variant holds the pair forever
    val t0 = "2024-01-01 00:00:00"
    def batchDf(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "__raw_ts")
        .select(col("doc_id"), col("text"),
          to_timestamp(col("__raw_ts")).as("ts"))
    val noise = docs.filter(col("doc_id") >= 100 && col("doc_id") < 105)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0) + 9100L, r.getString(1), "2024-01-01 10:00:00"))
    // the dedup operator evicts expired state at batch COMMIT, so the
    // watermark must cross T0+1h one full batch BEFORE the replay: b1
    // advances it (wm = T0+9h after b1), b2's commit evicts b0's pair
    // state, b3 replays the copy against empty state
    val batches = Seq(
      Seq((9005L, copyText, t0)),
      noise.toSeq,
      Seq((9200L, "unrelated filler row", "2024-01-01 10:00:30")),
      Seq((9005L, copyText, "2024-01-01 10:01:00")))
    val dir = Files.createTempDirectory("docstream-wm").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"wmbatch$i").toString
      batchDf(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"$dir/batch_$i.parquet")
      Files.copy(part.toPath, dst)
      // the file source orders micro-batches by mtime — pin it
      dst.toFile.setLastModified(1700000000000L + i * 10000L)
    }
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    def stream() = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val windowed = EventStreams.runToMemory(
      EventStreams.evalNearDupStream(stream(), evalCorpus,
        tsCol = Some("ts"), watermark = "1 hour"),
      "eval_neardup_wm_test", OutputMode.Append())
    val unwindowed = EventStreams.runToMemory(
      EventStreams.evalNearDupStream(stream(), evalCorpus),
      "eval_neardup_unwm_test", OutputMode.Append())
    // in-window pin: the DISTINCT pair evidence is identical — the
    // watermark changes state retention, never which pairs qualify
    val w = windowed.select("eval_id", "train_id", "jaccard").distinct()
      .orderBy("eval_id", "train_id").collect().map(_.toString).toSeq
    val u = unwindowed.orderBy("eval_id", "train_id")
      .collect().map(_.toString).toSeq
    assert(w.nonEmpty && w == u,
      "windowed report must match the unwindowed pairs distinct-for-distinct")
    // bounded state: the replayed pair re-emits AFTER its state expired
    // (2 rows windowed), while the unwindowed dedup holds it forever (1)
    assert(windowed.filter(col("eval_id") === 5L &&
      col("train_id") === 9005L).count() == 2L,
      "watermark-expired pair state must re-emit on replay")
    assert(unwindowed.filter(col("eval_id") === 5L &&
      col("train_id") === 9005L).count() == 1L,
      "unwindowed dedup keeps pair state forever")
    // the evidence rows carry the event time through
    assert(windowed.columns.contains("ts"))
  }

  test("stream-static LSH dedup decision table == batch crossCorpusDedupLsh") {
    import org.apache.spark.sql.types._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 30)
    val batchDocs = docs.filter(col("doc_id") >= 20 && col("doc_id") < 60)
    // two micro-batches covering the same probe set
    val dir = Files.createTempDirectory("docstream-lsh").toString
    Seq((20, 40, "b0"), (40, 60, "b1")).foreach { case (lo, hi, name) =>
      val tmp = Files.createTempDirectory(s"lshbatch$name").toString
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/batch_$name.parquet"))
    }
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val streamed = EventStreams.runToMemory(
      EventStreams.corpusDedupStreamLsh(stream, corpus),
      "corpus_lsh_test", OutputMode.Update())
    val batch = graft.pipeline.Dedup.crossCorpusDedupLsh(
      corpus, batchDocs, "doc_id", "text")
    val s = streamed.orderBy("doc_id")
      .select("doc_id", "exact_dup", "n_near", "is_new")
      .collect().map(_.toString).toSeq
    val b = batch.orderBy("doc_id")
      .select("doc_id", "exact_dup", "n_near", "is_new")
      .collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == b,
      "streamed band-probe decisions must equal the batch LSH operator")
    assert(streamed.filter(col("exact_dup")).count() >= 1,
      "overlap rows [20,30) are exact corpus duplicates — non-vacuous")
  }

  test("stream-static SimHash dedup gate == batch crossCorpusDedupSimhash " +
       "(the 18th stream==batch pin — wide-sketch word probe)") {
    import org.apache.spark.sql.types._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 30)
    val batchDocs = docs.filter(col("doc_id") >= 20 && col("doc_id") < 60)
    val dir = Files.createTempDirectory("docstream-simhash").toString
    Seq((20, 40, "b0"), (40, 60, "b1")).foreach { case (lo, hi, name) =>
      val tmp = Files.createTempDirectory(s"shbatch$name").toString
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/batch_$name.parquet"))
    }
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    // small sketch config keeps the stateless per-row fold tree modest;
    // the WIDTH semantics are identical at any (words, bitsPerWord)
    val streamed = EventStreams.runToMemory(
      EventStreams.corpusDedupStreamSimhash(stream, corpus,
        words = 4, bitsPerWord = 12),
      "corpus_simhash_test", OutputMode.Update())
    val batch = graft.pipeline.Dedup.crossCorpusDedupSimhash(
      corpus, batchDocs, "doc_id", "text", words = 4, bitsPerWord = 12)
    val s = streamed.orderBy("doc_id")
      .select("doc_id", "n_near", "is_new")
      .collect().map(_.toString).toSeq
    val b = batch.orderBy("id")
      .select("id", "n_near", "is_new")
      .collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == b,
      "streamed word-probe decisions must equal the batch SimHash gate")
    // the [20, 30) overlap rows ARE corpus docs: hamming 0 ⇒ near
    assert(streamed.filter(col("doc_id") < 30 && !col("is_new"))
      .count() == 10, "overlap rows must all flag near-dups — non-vacuous")
  }

  test("streaming transitions aggregate to the batch transition matrix") {
    val dir = Files.createTempDirectory("evstream_tr").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/batch0.parquet"))
    val streamed = EventStreams.runToMemory(
      EventStreams.transitionStream(EventStreams.readEventStream(spark, dir))
        .toDF(),
      "transition_test", OutputMode.Append())
    val s = streamed.groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val b = graft.operators.EventAnalytics
      .transitionMatrix(graft.Tables.events(spark, "/root/testdata/sf0.001"),
        "user_id", "ts_ns", "event_id", "event_type")
      .orderBy("prev_type", "next_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(s == b,
      "per-user emitted transitions must aggregate to the batch lag matrix")
  }

  test("streaming closed sessions equal batch sessionStats minus open tails") {
    val dir = Files.createTempDirectory("evstream_sess").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/batch0.parquet"))
    val streamed = EventStreams.runToMemory(
      EventStreams.sessionStatsStream(
        EventStreams.readEventStream(spark, dir)).toDF(),
      "session_stats_test", OutputMode.Append())
    val cols = Seq("user_id", "session_id", "session_start", "session_end",
      "n_events", "duration_ns", "is_bounce")
    val batch = graft.operators.EventAnalytics.sessionStats(
      graft.Tables.events(spark, "/root/testdata/sf0.001"),
      "user_id", "ts_ns", "event_id", gapNs = 1800L * 1000 * 1000 * 1000)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    // each user's LAST session is still open in the stream's state —
    // the batch pass emits it, the stream honestly can't know it ended
    val closed = batch.withColumn("__mx", max(col("session_id")).over(w))
      .filter(col("session_id") < col("__mx"))
    val s = streamed.select(cols.map(col): _*)
      .orderBy("user_id", "session_id").collect().map(_.toString).toSeq
    val b = closed.select(cols.map(col): _*)
      .orderBy("user_id", "session_id").collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == b,
      "emitted closed sessions must be row-identical to the batch operator")
  }

  test("streaming incremental CC converges to the full batch CC") {
    import spark.implicits._
    // a 60-vertex chain + a separate triangle, edges split across two
    // files in an order that interleaves the chain (merge-heavy case)
    val chain = (0L until 59L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val all = chain ++ tri
    val (evens, odds) = all.zipWithIndex.partition(_._2 % 2 == 0)
    val dir = Files.createTempDirectory("edge_stream").toString
    evens.map(_._1).toDF("src", "dst").coalesce(1)
      .write.parquet(s"$dir/b0.parquet.d")
    odds.map(_._1).toDF("src", "dst").coalesce(1)
      .write.parquet(s"$dir/b1.parquet.d")
    val schema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*.d")
    val verts = ((0L until 60L) ++ Seq(100L, 101L, 102L)).toDF("id")
    val init = verts.select(col("id"), col("id").as("component"))
    val streamed = EventStreams.incrementalCcStream(stream, init)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val batch = graft.graph.Components
      .connectedComponentsFast(verts, all.toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      "label-identical to one-shot CC regardless of batch split")
    assert(streamed.count(_._2 == 0L) == 60 &&
      streamed.count(_._2 == 100L) == 3, "chain -> 0, triangle -> 100")
  }

  test("streaming incremental CC seeds vertices first seen in a batch") {
    import spark.implicits._
    // initial labels know ONLY vertex 0; every other vertex arrives
    // with the edge stream (the live-crawl case: a new page links an
    // old one). Batch 0 even brings an edge whose BOTH endpoints are
    // new (10-11) — before the seeding fix those merges were silently
    // dropped by the label inner-join.
    val dir = Files.createTempDirectory("edge_stream_seed").toString
    Seq((0L, 1L), (10L, 11L)).toDF("src", "dst").coalesce(1)
      .write.parquet(s"$dir/b0.parquet.d")
    Seq((1L, 2L), (11L, 12L)).toDF("src", "dst").coalesce(1)
      .write.parquet(s"$dir/b1.parquet.d")
    val schema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*.d")
    val init = Seq((0L, 0L)).toDF("id", "component")
    val labels = EventStreams.incrementalCcStream(stream, init)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(labels.toSeq == Seq((0L, 0L), (1L, 0L), (2L, 0L),
      (10L, 10L), (11L, 10L), (12L, 10L)),
      s"new vertices self-seed then merge: ${labels.toSeq}")
  }

  test("streaming incremental checksum equals the batch table checksum") {
    val dir = Files.createTempDirectory("evstream_ck").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/batch0.parquet"))
    val fp = concat_ws("|", col("event_id"), col("user_id"), col("event_type"))
    val streamed = EventStreams.runToMemory(
      EventStreams.checksumStream(
        EventStreams.readEventStream(spark, dir), fp),
      "checksum_test", OutputMode.Complete())
    val s = streamed.collect()(0)
    val b = graft.pipeline.Stats.tableChecksum(
        graft.Tables.events(spark, "/root/testdata/sf0.001"), "events", fp)
      .collect()(0)
    assert(s.getLong(0) == b.getLong(1) && s.getLong(1) == b.getLong(2),
      "incremental fold-sum state must reproduce the batch checksum exactly")
  }

  test("streaming attribution rows equal the batch touchAttribution output") {
    val dir = Files.createTempDirectory("evstream_attr").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/batch0.parquet"))
    val streamed = EventStreams.runToMemory(
      EventStreams.attributionStream(
          EventStreams.readEventStream(spark, dir),
          touchTypes = Seq("click", "view"), convType = "purchase")
        .toDF(),
      "attribution_test", OutputMode.Append())
    val cols = Seq("user_id", "conv_id", "conv_ns", "first_id", "first_ns",
      "first_type", "last_id", "last_ns", "last_type")
    val s = streamed.orderBy("user_id", "conv_ns", "conv_id")
      .select(cols.map(col): _*).collect().map(_.toString).toSeq
    val b = graft.operators.EventAnalytics
      .touchAttribution(graft.Tables.events(spark, "/root/testdata/sf0.001"),
        "user_id", "ts_ns", "event_id", "event_type",
        Seq("click", "view"), "purchase")
      .orderBy("user_id", "conv_ns", "conv_id")
      .select(cols.map(col): _*).collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == b,
      "per-user streamed attributions must equal the batch window operator")
    // non-vacuous: both organic (NULL) and attributed conversions occur
    assert(streamed.filter(col("first_id").isNull).count() >= 1)
    assert(streamed.filter(col("first_id").isNotNull).count() >= 1)
  }

  test("streaming CDC apply == one-batch merge (seq respects batch order)") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    // batch 0: update 2, insert 4; batch 1 (later seqs): delete 2, update 4
    val b0 = Seq((2L, "b2", "U", 1L), (4L, "d", "U", 1L))
    val b1 = Seq((2L, "b2", "D", 2L), (4L, "d2", "U", 2L))
    val dir = Files.createTempDirectory("cdcstream").toString
    Seq((b0, "b0"), (b1, "b1")).foreach { case (rows, name) =>
      val tmp = Files.createTempDirectory(s"cdc$name").toString
      rows.toDF("id", "v", "op", "seq")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"$dir/batch_$name.parquet")
      Files.copy(part.toPath, dst)
    }
    // force source order = batch order (file-source processes by mtime)
    new java.io.File(s"$dir/batch_b0.parquet").setLastModified(1000000L)
    new java.io.File(s"$dir/batch_b1.parquet").setLastModified(2000000L)
    val chSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("op", StringType), StructField("seq", LongType)))
    val stream = spark.readStream.schema(chSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val streamed = EventStreams.applyChangesStream(target, stream,
        Seq("id"), "op", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val batch = graft.operators.CdcMerge.applyChanges(target,
        (b0 ++ b1).toDF("id", "v", "op", "seq"), Seq("id"), "op", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(streamed.toSeq == Seq((1L, "a"), (3L, "c"), (4L, "d2")),
      "delete of 2 and the later update of 4 win")
    assert(streamed.toSeq == batch.toSeq,
      "incremental micro-batch merges equal the one-batch merge")
  }
}
