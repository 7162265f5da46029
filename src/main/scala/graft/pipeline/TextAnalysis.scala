package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators for training-data curation: token stats,
  * quality scoring, n-gram-heuristic language ID, and document
  * fingerprinting. All pure column expressions (codegen'd, shuffle-free
  * map-side work) — at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** English function-word markers for the language-ID heuristic. */
  val EnMarkers: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Stopword list used by the quality score. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in")

  /** Per-document token statistics: total/distinct token counts, char
    * count, average token length, type-token ratio.
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col(idCol),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      length(col(textCol)).as("n_chars"),
      round(
        when(size(toks) === 0, lit(0.0))
          .otherwise(
            aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") /
              size(toks)), 6).as("avg_token_len"),
      round(
        when(size(toks) === 0, lit(0.0))
          .otherwise(size(array_distinct(toks)).cast("double") / size(toks)), 6)
        .as("type_token_ratio"))
  }

  /** Stopword ratio: fraction of token occurrences that are stopwords. */
  def stopwordRatio(textCol: Column): Column = {
    val toks = tokens(textCol)
    val stops = filter(toks, t => t.isin(Stopwords.map(lit): _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks))
  }

  /** Heuristic quality score in [0,1]: rewards length (saturating at
    * 100 tokens), lexical diversity, and a moderate stopword ratio.
    * Deterministic integer-ratio arithmetic → portable to the oracle.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / 100.0, lit(1.0))
    val diversity = when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / nTok)
    val stopScore = lit(1.0) - abs(stopwordRatio(col(textCol)) - 0.3)
    df.select(
      col(idCol),
      round(stopwordRatio(col(textCol)), 6).as("stopword_ratio"),
      round(lenScore, 6).as("len_score"),
      round(diversity, 6).as("diversity"),
      round((lenScore * 0.4 + diversity * 0.3 + stopScore * 0.3), 6)
        .as("quality_score"))
  }

  /** N-gram-heuristic language ID: score = fraction of tokens that are
    * English function words; >= cutoff ⇒ "en", else falls back to a
    * character heuristic bucket. (Real systems use char-n-gram models;
    * the operator shape — pure column expression, broadcast marker
    * list — is what scales.)
    */
  def languageId(df: DataFrame, idCol: String, textCol: String,
                 cutoff: Double = 0.05): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col(idCol),
      round(enScore(toks), 6).as("en_score"),
      predLang(toks, cutoff).as("pred_lang"))
  }

  private def enScore(toks: Column): Column = {
    val markers = filter(toks, t => t.isin(EnMarkers.map(lit): _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(markers).cast("double") / size(toks))
  }

  private def predLang(toks: Column, cutoff: Double): Column =
    when(size(toks) === 0, "unknown")
      .when(enScore(toks) >= cutoff, "en").otherwise("other")

  /** Language-ID confusion matrix against the labeled `langCol` — the
    * classifier-evaluation staple: per (actual, predicted) cell the
    * count and the within-actual rate (diagonal rows are per-class
    * recall). `actual` collapses to en/other, matching the
    * classifier's codomain; one projection + one |classes|²-cell
    * aggregate + a class-total equi-join.
    */
  def languageIdConfusion(df: DataFrame, textCol: String, langCol: String,
                          cutoff: Double = 0.05): DataFrame = {
    val toks = tokens(col(textCol))
    val cells = df.select(
        when(col(langCol) === "en", "en").otherwise("other").as("actual"),
        predLang(toks, cutoff).as("predicted"))
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("actual")).agg(sum(col("n")).as("__t"))
    cells.join(broadcast(totals), Seq("actual"))
      .select(col("actual"), col("predicted"), col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("rate"))
  }

  /** Order-sensitive rolling fingerprint of the token stream. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(tokens(col(textCol))).as("fingerprint"))

  /** Canonical text normalization for dedup/training pipelines:
    * lowercase → strip non-alphanumerics (keep whitespace) → collapse
    * whitespace runs → trim. Pure codegen'd expression; the usual
    * pre-pass before exact/MinHash dedup so cosmetic variants collapse.
    */
  def normalizeText(textCol: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(textCol), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Per-document normalization table: normalized text, changed flag,
    * and the chars removed by normalization.
    */
  def normalized(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = normalizeText(col(textCol))
    df.select(col(idCol), norm.as("norm_text"),
      (norm =!= col(textCol)).as("changed"),
      (length(col(textCol)) - length(norm)).cast("int").as("chars_removed"))
  }

  /** Quality-filter decision table — the keep/drop gate of a training
    * pipeline, with the FIRST failing rule as the recorded reason
    * (ordered CASE, exactly reproducible):
    * length bounds → minimum token count → minimum alphabetic ratio.
    * All pure column arithmetic; at 100 TB this is a scan-speed map with
    * the decision column available for partition pruning downstream.
    */
  def filterDecision(df: DataFrame, idCol: String, textCol: String,
                     minChars: Int = 100, maxChars: Int = 20000,
                     minTokens: Int = 20,
                     minAlphaRatio: Double = 0.5): DataFrame = {
    val toks = tokens(col(textCol))
    val alphaRatio = round(
      when(length(col(textCol)) === 0, lit(0.0))
        .otherwise(length(regexp_replace(col(textCol), "[^a-zA-Z]", ""))
          .cast("double") / length(col(textCol))), 6)
    val reason = when(length(col(textCol)) < minChars, "too_short")
      .when(length(col(textCol)) > maxChars, "too_long")
      .when(size(toks) < minTokens, "too_few_tokens")
      .when(alphaRatio < minAlphaRatio, "low_alpha")
      .otherwise("ok")
    df.select(col(idCol), alphaRatio.as("alpha_ratio"), reason.as("reason"),
      (reason === "ok").as("keep"))
  }

  /** Email pattern for PII scrubbing — the RE2/Java-regex common subset
    * (no backrefs, no lookaround), so the oracle replays it verbatim.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-ish pattern: optional +, then 8+ digits/separators. */
  val PhonePattern: String = "\\+?[0-9][0-9-]{6,}[0-9]"

  /** PII scrubbing: replace emails with `<EMAIL>` then phone-shaped
    * digit runs with `<PHONE>`, counting each. Pure regexp column work —
    * scan-speed, no shuffle; the order (emails first) is part of the
    * contract since an email's domain can contain digits.
    */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val noEmail = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    df.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(noEmail, lit(PhonePattern)).cast("long").as("n_phones"),
      regexp_replace(noEmail, PhonePattern, "<PHONE>").as("scrubbed"))
  }

  /** Unigram-LM surprisal scoring — the cheap "perplexity filter" of
    * training pipelines: score every document by the mean surprisal
    * (−ln p) of its tokens under the corpus's own unigram distribution.
    * Gibberish and off-distribution text scores high, boilerplate low.
    *
    * Per-token surprisal is quantized to integer MICRO-NANO-NAT units
    * (round(−ln p · 1e9)) before the per-document aggregation, so the
    * shuffle sum is exact integer arithmetic — order-independent and
    * engine-portable, where a double sum over a shuffle is neither.
    * Two passes: vocabulary counts (hash-aggregate to vocab size), then
    * a vocab-keyed join back — no pairwise anything.
    *
    * Output: (id, n_tokens, surprisal_units, avg_surprisal) with
    * avg_surprisal in nats rounded to 6 dp.
    */
  def unigramSurprisal(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val terms = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val counts = terms.groupBy(col("term")).agg(count(lit(1)).as("__tf"))
    val total = counts.agg(sum(col("__tf")).as("__tot"))
    val units = counts.crossJoin(broadcast(total))
      .select(col("term"),
        round(-log(col("__tf").cast("double") / col("__tot").cast("double"))
          * lit(1e9)).cast("long").as("__u"))
    val perDoc = terms.join(units, "term")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__u")).as("surprisal_units"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("surprisal_units"), lit(0L)).as("surprisal_units"),
        round(when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise((col("surprisal_units").cast("double") / lit(1e9)) /
            col("n_tokens").cast("double")), 6).as("avg_surprisal"))
  }

  /** Per-document character-level Shannon entropy in nats — the
    * compressibility quality signal (low entropy = repetitive
    * boilerplate/junk, the cheap first gate web-corpus pipelines run
    * before any LM scoring). entropy = ln(n) − (Σ cᵢ·ln cᵢ)/n over
    * per-character counts cᵢ.
    *
    * Determinism: the Σ cᵢ·ln cᵢ term quantizes ln cᵢ to integer
    * nano-nats per DISTINCT count value and sums exact integers; the
    * final abs() absorbs the ±1e-9 quantization residue of
    * single-character documents (true entropy 0) and normalizes the
    * −0.0 it would otherwise round to. Pure map-side explode + two
    * hash aggregates — no joins, no windows.
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = df.filter(length(col(textCol)) > 0)
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
    val perDoc = chars.groupBy(col(idCol), col("ch"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("__c") *
          round(log(col("__c").cast("double")) * lit(1e9)).cast("long"))
          .as("__s"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_distinct_chars"), lit(0L)).as("n_distinct_chars"),
        round(when(coalesce(col("n_chars"), lit(0L)) === 0, lit(0.0))
          .otherwise(abs(log(col("n_chars").cast("double"))
            - (col("__s").cast("double") / lit(1e9))
              / col("n_chars").cast("double"))), 6).as("entropy"))
  }

  /** Interpolated bigram LM surprisal — the CCNet-shape perplexity
    * filter (Wenzek et al., LREC 2020) one order up from
    * `unigramSurprisal`: each token after the first scores
    * −ln(λ·P(w|prev) + (1−λ)·P(w)), the first token of a document
    * scores −ln(P(w)); `avg_surprisal` is the per-token mean in nats
    * (low = fluent/common text, high = noise — the quality gate
    * thresholds on it). Probabilities are corpus MLE
    * (bigram-count/prefix-count, tf/total).
    *
    * Determinism: like q99/q117, each DISTINCT (prev, term) key maps to
    * one integer nano-nat unit value (double → ln → ×10⁹ → round), and
    * per-document totals are exact integer sums — partition- and
    * engine-invariant. λ defaults to 0.5 (exactly representable).
    *
    * Scale: two vocabulary-keyed hash aggregates (unigram, bigram) +
    * equi-joins on term / (prev, term); the per-doc lag window
    * partitions by document — nothing global anywhere.
    */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String,
                      lambda: Double = 0.5): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos0", "term")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos0"))
    val seq = toks.withColumn("prev", lag(col("term"), 1).over(w))
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("__tf"))
    val total = counts.agg(sum(col("__tf")).as("__tot"))
    val uni = counts.crossJoin(broadcast(total)).select(
      col("term"),
      round(-log(col("__tf").cast("double") / col("__tot").cast("double"))
        * lit(1e9)).cast("long").as("__uu"),
      (col("__tf").cast("double") / col("__tot").cast("double")).as("__pu"))
    val big = seq.filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("term")).agg(count(lit(1)).as("__btf"))
    val pref = big.groupBy(col("prev")).agg(sum(col("__btf")).as("__ptf"))
    val bu = big.join(pref, "prev").join(uni.select(col("term"), col("__pu")), "term")
      .select(col("prev"), col("term"),
        round(-log(lit(lambda)
            * (col("__btf").cast("double") / col("__ptf").cast("double"))
          + lit(1.0 - lambda) * col("__pu")) * lit(1e9))
          .cast("long").as("__bu"))
    val perDoc = seq
      .join(uni.select(col("term"), col("__uu")), Seq("term"))
      .join(bu, Seq("prev", "term"), "left")
      .withColumn("__u",
        when(col("prev").isNull, col("__uu")).otherwise(col("__bu")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__u")).as("surprisal_units"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("surprisal_units"), lit(0L)).as("surprisal_units"),
        round(when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise((col("surprisal_units").cast("double") / lit(1e9)) /
            col("n_tokens").cast("double")), 6).as("avg_surprisal"))
  }

  /** Repetition ratio (Gopher-style quality signal): the fraction of a
    * document's word n-gram occurrences that are repeats —
    * 1 − distinct/total over the RAW (multiset) shingle list. High
    * values flag boilerplate/spam. Map-side column work only.
    */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    val sh = shingles(tokens(col(textCol)), n)
    val total = size(sh)
    val distinctN = size(array_distinct(sh))
    df.select(
      col(idCol),
      total.cast("long").as("n_shingles"),
      distinctN.cast("long").as("n_distinct_shingles"),
      round(when(total === 0, lit(0.0))
        .otherwise(lit(1.0) - distinctN.cast("double") / total.cast("double")), 6)
        .as("repetition_ratio"))
  }

  /** Readability profile (Flesch-style complexity gate for curation):
    * sentence count ([.!?]+ runs, floored at 1 so a fragment counts as
    * one sentence), word count, vowel-group count (the classic
    * syllable estimate: maximal [aeiouy]+ runs, case-insensitive), and
    * the two Flesch ratios + score in MILLI units via floored integer
    * division — `floor` on non-negative ratios is engine-identical
    * (DuckDB `//`), where round(x, 6) doubles were the r5 hash-red
    * class. flesch_milli = 206835 − ⌊1015·w/s⌋ − ⌊84600·v/w⌋ (each
    * term floored, then exact integer subtraction). Pure column
    * expressions — at 100 TB this runs at scan speed, shuffle-free.
    */
  def readabilityProfile(df: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val w = size(tokens(col(textCol))).cast("long")
    val s = greatest(regexp_count(col(textCol), lit("[.!?]+")), lit(1))
      .cast("long")
    val v = regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long")
    val wps = floor(lit(1000L) * w / s).cast("long")
    val vpw = when(w === 0, lit(0L))
      .otherwise(floor(lit(1000L) * v / w)).cast("long")
    val flesch = lit(206835L) - floor(lit(1015L) * w / s).cast("long") -
      when(w === 0, lit(0L)).otherwise(floor(lit(84600L) * v / w).cast("long"))
    df.select(
      col(idCol),
      s.as("n_sentences"),
      w.as("n_words"),
      v.as("n_vowel_groups"),
      wps.as("words_per_sentence_milli"),
      vpw.as("vowels_per_word_milli"),
      flesch.as("flesch_milli"))
  }
}
