package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators (dedup,
  * fingerprinting, quality scoring) — all built from codegen'd built-ins /
  * higher-order functions, no UDFs.
  *
  * Every hash here is *cross-engine deterministic*: either md5 (identical
  * hex output in Spark and DuckDB, which the correctness oracle runs on) or
  * an explicit polynomial fold — so the DuckDB oracle can recompute the
  * exact same values.
  */
object TextFunctions {

  /** Whitespace tokenization; empty/whitespace-only text → empty array.
    * `split` on \s+ leaves a leading "" element when the string starts
    * with whitespace and produces [""] for "", so filter empties out.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Distinct token set (order-insensitive comparisons only). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Jaccard similarity of two array columns, by |∩|/|∪| on distinct
    * elements; 0.0 when either side is empty
    * (reference: src/core/GraphDB.cpp:548-574).
    */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    when(size(da) === 0 || size(db) === 0, lit(0.0))
      .otherwise(
        size(array_intersect(da, db)).cast("double") /
          size(array_union(da, db)).cast("double"))
  }

  /** Word n-gram shingles: ["a","b","c"] with n=2 → ["a b","b c"].
    * Docs shorter than n yield the whole doc as one shingle.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) <= n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Deterministic 31-base polynomial hash of a string mod 1e9+7, over
    * character code points. Matches the DuckDB fold
    * `list_reduce` over `ascii()` codes — both are strict left folds.
    */
  def polyHash(s: Column): Column =
    aggregate(
      transform(filter(split(s, ""), c => c =!= ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, c) => pmod(h * 31 + c, lit(1000000007L)))

  /** Mersenne prime 2^31-1: universal-hash modulus. Base hashes are
    * reduced below it, so a*h+b stays < 2^62 — overflow-free identical
    * int64 arithmetic in Spark and DuckDB.
    */
  val MinhashP: Long = 2147483647L

  /** Engine-portable strong hash of a string to [0, 2^31-1): first 15
    * hex chars of md5, parsed as an integer. (DuckDB mirrors the parse
    * with a fold over hex digits.)
    */
  def md5Long(s: Column): Column =
    pmod(conv(substring(md5(s), 1, 15), 16, 10).cast("long"), lit(MinhashP))

  /** MinHash signature of a token-set column: ONE md5 per token, then k
    * universal-hash permutations h_i(x) = (a_i·x + b_i) mod P with
    * deterministic odd multipliers — 16× fewer strong hashes than
    * seeding md5 per permutation, same theory. Empty sets get sentinel P
    * (greater than any real value) so banding never matches them.
    */
  def minhashSignature(tokSet: Column, k: Int): Column =
    minhashFromHashes(transform(tokSet, t => md5Long(t)), k)

  /** Signature from a PRE-HASHED long-array column. Callers doing bulk
    * work must materialize the hash array first (e.g. cache a
    * projection): Column trees are duplicated per use, so passing the
    * raw md5 transform here would recompute every md5 k times.
    */
  def minhashFromHashes(hashes: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i =>
        coalesce(
          array_min(transform(hashes,
            h => pmod(((i * 2 + 1) * h + (i * i + 98765)), lit(MinhashP)))),
          lit(MinhashP)))

  /** LSH band keys from a minhash signature: `bands` groups of `rowsPer`
    * signature entries, each hashed to one band key. Docs sharing ANY band
    * key are candidate duplicate pairs.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPer: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b =>
        concat(
          b.cast("string"),
          lit("|"),
          md5(concat_ws(",",
            transform(slice(sig, b * rowsPer + 1, lit(rowsPer)), x => x.cast("string"))))))

  /** Rolling/document fingerprint: polynomial fold over the token stream
    * (order-sensitive, unlike the minhash set signature).
    */
  def fingerprint(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (h, t) => pmod(h * 131 + polyHash(t), lit(2147483647L)))

  /** BPE-ish piece split: letter runs, digit runs, single other
    * non-space chars — the lexical pre-split every BPE tokenizer does.
    */
  def bpePieces(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Approximate BPE token count: each piece costs ceil(len/4) tokens
    * (~4 chars/subword, the usual BPE average). Integer arithmetic only,
    * so the oracle reproduces it exactly.
    */
  def bpeTokenCount(text: Column): Column =
    aggregate(bpePieces(text), lit(0L),
      (a, p) => a + floor((length(p) + lit(3)) / lit(4)).cast("long"))
}
