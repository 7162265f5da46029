package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Chunking, Corpus, Export, TextAnalysis}
import graft.similarity.SimilarityOps

/** Training-data EXPORT pipeline operators: chunking, decontamination,
  * PII scrubbing, repetition scoring, TF-IDF, inverted index, source-mix
  * reweighting, deterministic sharding, embedding quantization.
  *
  * Oracle strategy: all arithmetic is integer, md5-derived, or explicit
  * IEEE double expressions with identical operation order in both
  * engines, rounded to 6 dp wherever a ranking/threshold depends on it.
  */
object TrainPack extends QueryPack {

  // ---- DuckDB fragments (mirror graft.functions.TextFunctions) ----
  private val toksSql =
    """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
  /** Word n-gram shingles over token-list expr `tk` (n literal). */
  private def shingleSql(tk: String, n: Int): String =
    s"""CASE WHEN len($tk) <= $n THEN [array_to_string($tk, ' ')]
       | ELSE list_transform(range(1, len($tk) - ${n - 2}), i -> array_to_string(($tk)[i:i+${n - 1}], ' ')) END"""
      .stripMargin.replace("\n", " ")
  private def md5LongSql(e: String): String =
    s"(list_reduce(list_prepend(0::BIGINT, list_transform(string_split(substr(md5($e), 1, 15), ''), c -> strpos('0123456789abcdef', c)::BIGINT - 1)), (a, b) -> a * 16 + b) % 2147483647)"

  // Regex literals pass through verbatim: DuckDB standard single-quoted
  // strings don't process backslash escapes, so the Java pattern string
  // is byte-identical on both sides.
  private val emailPat = TextAnalysis.EmailPattern
  private val phonePat = TextAnalysis.PhonePattern

  /** The deterministic PII-bearing column for q82 (the synthetic corpus
    * contains no natural PII, so the query constructs one from doc
    * fields — identically in both engines — and scrubs it).
    */
  private def contactCol = concat(
    lit("Reach user"), col("doc_id").cast("string"),
    lit(" at user"), col("doc_id").cast("string"),
    lit("@"), col("source"), lit(".com or +1-555-"),
    lpad(pmod(col("doc_id") * 7, lit(10000)).cast("string"), 4, "0"),
    lit(" now"))
  private val contactSql =
    "'Reach user' || doc_id::VARCHAR || ' at user' || doc_id::VARCHAR || '@' || source || '.com or +1-555-' || lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') || ' now'"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- context-window chunking with overlap ----
    "q80_chunk_documents" -> { (s, d) =>
      Chunking.tokenChunks(Tables.documents(s, d), "doc_id", "text",
          chunkSize = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ---- eval-set decontamination (5-gram overlap) ----
    "q81_decontaminate" -> { (s, d) =>
      Corpus.decontaminate(Tables.documents(s, d), "doc_id", "text",
          evalPred = col("doc_id") % 10 === 0, n = 5)
        .orderBy(col("doc_id"))
    },

    // ---- PII scrub over a constructed contact string ----
    "q82_pii_scrub" -> { (s, d) =>
      val withContact = Tables.documents(s, d)
        .select(col("doc_id"), contactCol.as("contact"))
      TextAnalysis.scrubPii(withContact, "doc_id", "contact")
        .orderBy(col("doc_id"))
    },

    // ---- repetition ratio (duplicate-shingle fraction) ----
    "q83_repetition_ratio" -> { (s, d) =>
      TextAnalysis.repetitionRatio(Tables.documents(s, d), "doc_id", "text", 3)
        .orderBy(col("doc_id"))
    },

    // ---- per-doc top-3 TF-IDF terms ----
    "q84_tfidf_topterms" -> { (s, d) =>
      Corpus.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank"))
    },

    // ---- inverted index (term -> df, tf, posting list) ----
    "q85_inverted_index" -> { (s, d) =>
      Corpus.invertedIndex(Tables.documents(s, d), "doc_id", "text", minDf = 2L)
        .orderBy(col("term"))
    },

    // ---- source x lang mix shares + flattening weights ----
    "q86_domain_mix" -> { (s, d) =>
      Corpus.domainMixWeights(Tables.documents(s, d), Seq("source", "lang"))
        .orderBy(col("source"), col("lang"))
    },

    // ---- deterministic export sharding ----
    "q87_export_shards" -> { (s, d) =>
      Export.shardAssignments(Tables.documents(s, d), "doc_id", numShards = 8)
        .select(col("doc_id"), col("shard"), col("seq"))
        .orderBy(col("doc_id"))
    },

    // ---- int8 scalar quantization of embeddings ----
    "q88_quantize_embeddings" -> { (s, d) =>
      SimilarityOps.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
        .orderBy(col("vec_id"))
    },
  )

  def oracleSql: Map[String, String] = Map(
    "q80_chunk_documents" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |c AS (SELECT doc_id, tk, unnest(range(0, len(tk), 24)) AS start
         |      FROM t WHERE len(tk) > 0)
         |SELECT doc_id, (start // 24)::INT AS chunk_idx,
         |  LEAST(32, len(tk) - start)::INT AS n_chunk_tokens,
         |  array_to_string(tk[start + 1 : start + 32], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q81_decontaminate" ->
      s"""WITH sh AS (
         |  SELECT doc_id, doc_id % 10 = 0 AS is_eval, unnest(list_distinct(${shingleSql("tk", 5)})) AS s
         |  FROM (SELECT doc_id, $toksSql AS tk FROM documents) t),
         |ev AS (SELECT DISTINCT s FROM sh WHERE is_eval),
         |ov AS (SELECT sh.doc_id, COUNT(DISTINCT sh.s) AS n_overlap
         |       FROM sh JOIN ev USING (s) WHERE NOT sh.is_eval GROUP BY sh.doc_id)
         |SELECT d.doc_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
         |  COALESCE(ov.n_overlap, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
         |WHERE d.doc_id % 10 <> 0 ORDER BY d.doc_id""".stripMargin,

    "q82_pii_scrub" ->
      s"""WITH t AS (SELECT doc_id, $contactSql AS contact FROM documents),
         |e AS (SELECT doc_id, contact,
         |  regexp_replace(contact, '$emailPat', '<EMAIL>', 'g') AS no_email FROM t)
         |SELECT doc_id,
         |  len(regexp_extract_all(contact, '$emailPat'))::BIGINT AS n_emails,
         |  len(regexp_extract_all(no_email, '$phonePat'))::BIGINT AS n_phones,
         |  regexp_replace(no_email, '$phonePat', '<PHONE>', 'g') AS scrubbed
         |FROM e ORDER BY doc_id""".stripMargin,

    "q83_repetition_ratio" ->
      s"""SELECT doc_id, len(sh)::BIGINT AS n_shingles,
         |  len(list_distinct(sh))::BIGINT AS n_distinct_shingles,
         |  ROUND(CASE WHEN len(sh) = 0 THEN 0.0
         |    ELSE 1.0 - len(list_distinct(sh))::DOUBLE / len(sh)::DOUBLE END, 6)
         |    AS repetition_ratio
         |FROM (SELECT doc_id, ${shingleSql("tk", 3)} AS sh
         |      FROM (SELECT doc_id, $toksSql AS tk FROM documents) t) s
         |ORDER BY doc_id""".stripMargin,

    "q84_tfidf_topterms" ->
      s"""WITH terms AS (SELECT doc_id, unnest(tk) AS term
         |  FROM (SELECT doc_id, $toksSql AS tk FROM documents) t),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
         |dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term,
         |    ROUND(tf.tf * LN((n.n_docs + 1.0) / (dfq.df + 1.0)), 6) AS score
         |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
         |ranked AS (
         |  SELECT doc_id, term, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC)::INT AS rank
         |  FROM scored)
         |SELECT doc_id, rank, term, score FROM ranked
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q85_inverted_index" ->
      s"""SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS total_tf,
         |  array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
         |FROM (SELECT doc_id, unnest(tk) AS term
         |      FROM (SELECT doc_id, $toksSql AS tk FROM documents) t) x
         |GROUP BY term HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY term""".stripMargin,

    "q86_domain_mix" ->
      s"""WITH g AS (SELECT source, lang, COUNT(*) AS n_docs
         |           FROM documents GROUP BY source, lang)
         |SELECT source, lang, n_docs,
         |  ROUND(n_docs::DOUBLE / SUM(n_docs) OVER (), 6) AS share,
         |  ROUND((1.0 / COUNT(*) OVER ()) /
         |    (n_docs::DOUBLE / SUM(n_docs) OVER ()), 6) AS weight
         |FROM g ORDER BY source, lang""".stripMargin,

    "q87_export_shards" ->
      s"""WITH h AS (SELECT doc_id, md5(doc_id::VARCHAR) AS hex,
         |  ${md5LongSql("doc_id::VARCHAR")} % 8 AS shard FROM documents)
         |SELECT doc_id, shard,
         |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hex ASC)::INT AS seq
         |FROM h ORDER BY doc_id""".stripMargin,

    "q88_quantize_embeddings" ->
      s"""WITH s AS (SELECT vec_id, embedding,
         |  CASE WHEN m = 0 THEN 0.0 ELSE 127.0 / m END AS sc
         |  FROM (SELECT vec_id, embedding,
         |        list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m
         |        FROM embeddings) t)
         |SELECT vec_id, ROUND(sc, 6) AS scale,
         |  array_to_string(list_transform(embedding,
         |    x -> (FLOOR(x::DOUBLE * sc + 0.5))::INT::VARCHAR), ',') AS qvec
         |FROM s ORDER BY vec_id""".stripMargin,
  )
}
