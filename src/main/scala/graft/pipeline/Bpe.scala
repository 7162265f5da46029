package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Distributed BPE merge learning (Sennrich et al., ACL 2016) — the
  * tokenizer-training half of an LLM data pipeline (`Chunking` and the
  * BPE-ish q54 counter consume a vocabulary; this LEARNS one).
  *
  * Classic trainer shape: BPE trains on the WORD-COUNT table, not the
  * corpus — one corpus scan aggregates words to (word, count), and all
  * `rounds` iterations run over that vocabulary-sized table. Per round:
  * (1) adjacent-symbol pair counts — one explode + one hash aggregate
  * weighted by word count; (2) the arg-max pair (count desc, then the
  * separator-joined pair key asc — a total order both engines compare
  * identically) — a 1-row TakeOrderedAndProject collected to the
  * driver, exactly like `kmeansFit`'s per-round model; (3) greedy
  * left-to-right merge applied as a codegen'd `aggregate` HOF fold over
  * each word's symbol list (no UDF), symbol lists localCheckpoint-ed
  * per round (the iterative-lineage rule).
  *
  * At 100 TB the corpus scan dominates and happens ONCE; vocabulary
  * tables are millions of rows (Heaps' law), so the per-round
  * aggregates are trivially distributed and the merge rule broadcasts
  * as two string literals.
  *
  * Determinism: counts are exact integers; the tie-break key
  * `a + U+0001 + b` is byte-comparable the same way in Spark and
  * DuckDB for any symbols above U+0001 (and the corpus tokenizer never
  * emits control characters).
  */
object Bpe {

  /** Learn `rounds` merge rules. Output: (round, sym_a, sym_b,
    * pair_count) — one row per learned rule, in learning order.
    */
  def learnMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val (rules, _) = train(df, textCol, rounds)
    val spark = df.sparkSession
    import spark.implicits._
    rules.toDF("round", "sym_a", "sym_b", "pair_count")
  }

  /** The ENCODER side: symbol frequencies of the corpus vocabulary
    * after `rounds` learned merges — the emerging subword vocabulary
    * (single characters absorb into merged units as rounds proceed).
    * Output: top `topK` symbols by total occurrence count (desc, then
    * symbol asc), with the count.
    */
  def symbolFrequencies(df: DataFrame, textCol: String, rounds: Int,
                        topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val (_, encoded) = train(df, textCol, rounds)
    encoded
      .select(explode(col("syms")).as("symbol"), col("cnt"))
      .groupBy(col("symbol")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("symbol").asc)
      .limit(topK)
  }

  /** Tokenizer APPLY: per-document BPE token counts under `rounds`
    * learned merges — the "how many tokens is this corpus" question
    * every training-budget estimate starts from, answered with the
    * tokenizer the corpus itself trained. The encode reuses the
    * trainer's word table (each distinct word is merged ONCE), so
    * per-doc cost is a vocabulary-keyed equi-join — documents are
    * never re-folded.
    * Output: (id, n_words, n_bpe_tokens).
    */
  def encodeDocs(df: DataFrame, idCol: String, textCol: String,
                 rounds: Int): DataFrame = {
    val (_, encoded) = train(df, textCol, rounds)
    val wordLen = encoded.select(col("w"), size(col("syms")).as("__len"))
    df.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .join(wordLen, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__len")).as("n_bpe_tokens"))
  }

  /** Per-language tokenizer FERTILITY — the multilingual-tokenizer
    * audit every training run wants (Rust et al., ACL 2021: how many
    * subword tokens a tokenizer spends per word, by language; a
    * vocabulary trained on English-heavy data "taxes" other languages
    * with higher fertility). Composes [[encodeDocs]] (per-doc BPE token
    * counts under the corpus's own learned merges) with the
    * `TextAnalysis.languageId` heuristic, then aggregates per predicted
    * language. Output: (pred_lang, n_docs, n_words, n_bpe_tokens,
    * fertility_milli) — fertility in FLOORED milli tokens/word
    * (integer-exact in both engines; no round(x,6) doubles).
    *
    * Scale shape: the encode is the vocabulary equi-join of
    * [[encodeDocs]] (docs never re-folded); the language join keys on
    * the doc id; the final aggregate is |languages| rows. Docs with
    * zero tokens have no words to encode and drop out of the join, so
    * every surviving group has n_words ≥ 1 — the division is total.
    */
  def fertilityByLang(df: DataFrame, idCol: String, textCol: String,
                      rounds: Int): DataFrame = {
    val enc = encodeDocs(df, idCol, textCol, rounds)
    val lang = TextAnalysis.languageId(df, idCol, textCol)
      .select(col(idCol), col("pred_lang"))
    enc.join(lang, Seq(idCol))
      .groupBy(col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast("long").as("n_words"),
        sum(col("n_bpe_tokens")).cast("long").as("n_bpe_tokens"))
      .withColumn("fertility_milli",
        expr("(1000L * n_bpe_tokens) div n_words"))
  }

  /** Shared trainer loop: returns (learned rules, the word-count table
    * re-symbolized by all of them).
    */
  private def train(df: DataFrame, textCol: String,
                    rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1, "rounds must be >= 1")
    val chars = (w: Column) => filter(split(w, ""), c => c =!= "")
    var cur = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), chars(col("w")).as("syms"), col("cnt"))
      .localCheckpoint()
    val rules = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // single-symbol words carry no pairs — and sequence(1, 0) would
      // count DOWN, indexing past the array
      val top = cur.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc,
          concat_ws("\u0001", col("a"), col("b")).asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += ((r, a, b, n))
        // greedy left-to-right merge: fold the tail over an accumulator
        // seeded with the first symbol; a (last==a, x==b) hit rewrites
        // the accumulator tail to the merged symbol
        val merged = lit(a + b)
        cur = cur.select(
          col("w"),
          aggregate(
            slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
            slice(col("syms"), 1, 1),
            (acc, x) =>
              when(element_at(acc, -1) === lit(a) && x === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
                .otherwise(concat(acc, array(x)))).as("syms"),
          col("cnt"))
          .localCheckpoint()
      }
      r += 1
    }
    (rules.result(), cur)
  }
}
