package graft.enrich

import com.fasterxml.jackson.databind.ObjectMapper

/** HTTP transport seam for the provider clients — the curl analogue
  * (reference: src/embedding/EmbeddingClient.cpp:18-50 httpPost). A
  * plain function trait so specs can capture the request without any
  * network; the JDK implementation below is the production path.
  */
trait HttpTransport extends Serializable {
  def post(url: String, body: String, headers: Map[String, String]): String
}

/** `java.net.http.HttpClient` transport (JDK built-in, no extra deps),
  * 30 s timeout like the reference's CURLOPT_TIMEOUT
  * (EmbeddingClient.cpp:37).
  */
class JdkHttpTransport(timeoutSeconds: Long = 30) extends HttpTransport {
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()

  def post(url: String, body: String, headers: Map[String, String]): String = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }
}

/** E1/E2 over real HTTP: OpenAI-compatible `/v1/embeddings` client
  * (reference: src/embedding/EmbeddingClient.cpp:52-121). Runs inside
  * `mapPartitions` like the mock — the network boundary lives on
  * executors. Batch shape, headers, body fields and response parsing
  * mirror the reference: `{"model","input","encoding_format":"float"}`
  * POSTed with a Bearer header; `data[i].embedding` parsed back; any
  * error or missing field degrades to None per text (the reference
  * logs and returns nullopt, :83-91).
  */
class HttpEmbedder(apiKey: String,
                   baseUrl: String = "https://api.openai.com",
                   model: String = "text-embedding-3-small",
                   val dim: Int = 1536,
                   transport: HttpTransport = new JdkHttpTransport())
    extends Embedder {

  @transient private lazy val mapper = new ObjectMapper()

  def requestUrl: String = s"$baseUrl/v1/embeddings"

  def requestHeaders: Map[String, String] = Map(
    "Content-Type" -> "application/json",
    "Authorization" -> s"Bearer $apiKey")

  /** Request body for a batch (EmbeddingClient.cpp:94-99). */
  def buildRequestBody(texts: Seq[String]): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("model", model)
    val arr = root.putArray("input")
    texts.foreach(arr.add)
    root.put("encoding_format", "float")
    m.writeValueAsString(root)
  }

  /** `data[i].embedding` per input, index-aligned; anything malformed
    * → None for that slot (EmbeddingClient.cpp:71-91).
    */
  def parseResponse(json: String, n: Int): Seq[Option[Array[Float]]] = {
    try {
      val root = mapper.readTree(json)
      val data = root.get("data")
      (0 until n).map { i =>
        val item = if (data != null && data.isArray && i < data.size) data.get(i) else null
        val emb = if (item != null) item.get("embedding") else null
        if (emb == null || !emb.isArray) None
        else {
          val v = new Array[Float](emb.size)
          var j = 0
          while (j < emb.size) { v(j) = emb.get(j).floatValue(); j += 1 }
          Some(v)
        }
      }
    } catch { case _: Exception => Seq.fill(n)(None) }
  }

  def embed(texts: Seq[String]): Seq[Option[Array[Float]]] = {
    // empty text never reaches the wire (EmbeddingClient.cpp:52-54)
    val nonEmptyIdx = texts.zipWithIndex.collect {
      case (t, i) if t != null && t.nonEmpty => i
    }
    if (nonEmptyIdx.isEmpty) return Seq.fill(texts.size)(None)
    val batch = nonEmptyIdx.map(texts(_))
    val parsed =
      try parseResponse(
        transport.post(requestUrl, buildRequestBody(batch), requestHeaders),
        batch.size)
      catch { case _: Exception => Seq.fill(batch.size)(None) }
    val bySlot = nonEmptyIdx.zip(parsed).toMap
    texts.indices.map(i => bySlot.getOrElse(i, None))
  }
}

/** E6 over real HTTP: chat-completions tag client
  * (reference: src/tagging/TagClient.cpp). System prompt has the
  * reference's two modes — bootstrap (empty bank) vs reuse-the-bank —
  * with the same rules text skeleton; request is
  * `{"model","messages",[system,user],"temperature":0.3,
  * "max_tokens":200}` (TagClient.cpp:169-177). Returns the RAW model
  * reply — `EnrichService.parseTagReply` does the `[...]` extraction
  * and normalization, matching the reference's split of
  * parseTagsFromResponse.
  */
class HttpTagger(apiKey: String,
                 baseUrl: String = "https://api.deepseek.com",
                 model: String = "deepseek-chat",
                 transport: HttpTransport = new JdkHttpTransport())
    extends Tagger {

  @transient private lazy val mapper = new ObjectMapper()

  def requestUrl: String = s"$baseUrl/v1/chat/completions"

  def requestHeaders: Map[String, String] = Map(
    "Content-Type" -> "application/json",
    "Authorization" -> s"Bearer $apiKey")

  /** Reference TagClient.cpp:62-99 — two prompt modes. */
  def buildSystemPrompt(tagBank: Seq[String], maxNewTags: Int): String =
    if (tagBank.isEmpty)
      """You are a document tagging assistant. This is the first document, so you will establish the initial tag vocabulary.
        |
        |RULES:
        |1. Output ONLY a JSON array of tag strings, nothing else
        |2. Use lowercase, hyphenated tags (e.g., "machine-learning", "data-structures")
        |3. Generate 3-8 relevant tags for categorizing this document
        |4. Tags should be broad enough to potentially match other documents on similar topics
        |
        |Example output: ["algorithms", "python", "sorting"]
        |""".stripMargin
    else
      s"""You are a document tagging assistant for a knowledge base.
         |
         |CRITICAL: Documents with SHARED TAGS will be LINKED together. You MUST reuse existing tags when the topic is related!
         |
         |EXISTING TAG BANK:
         |[${tagBank.map(t => "\"" + t + "\"").mkString(", ")}]
         |
         |STRICT RULES:
         |1. Output ONLY a JSON array of tag strings
         |2. You MUST use at least 1-2 tags from the existing bank if ANY are relevant
         |3. Only add NEW tags (max $maxNewTags) if the topic is completely different
         |4. Use lowercase-hyphenated format
         |5. Generate 3-6 tags total
         |
         |EXAMPLES:
         |- If document is about 'neural networks' and bank has 'machine-learning' -> USE 'machine-learning'
         |- If document is about 'Python pandas' and bank has 'python' -> USE 'python'
         |
         |Output format: ["existing-tag", "existing-tag2", "new-if-needed"]
         |""".stripMargin

  def buildRequestBody(content: String, tagBank: Seq[String],
                       maxNewTags: Int): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("model", model)
    val msgs = root.putArray("messages")
    val sys = msgs.addObject()
    sys.put("role", "system")
    sys.put("content", buildSystemPrompt(tagBank, maxNewTags))
    val usr = msgs.addObject()
    usr.put("role", "user")
    usr.put("content", content)
    root.put("temperature", 0.3)
    root.put("max_tokens", 200)
    m.writeValueAsString(root)
  }

  /** `choices[0].message.content`, or "" on any error
    * (TagClient.cpp:188-201 → empty tags).
    */
  def parseReply(json: String): String =
    try {
      val c = mapper.readTree(json).path("choices")
      if (c.isArray && c.size > 0)
        c.get(0).path("message").path("content").asText("")
      else ""
    } catch { case _: Exception => "" }

  def generateTagsRaw(content: String, tagBank: Seq[String],
                      maxNewTags: Int): String = {
    if (content.isEmpty) return ""
    try parseReply(transport.post(requestUrl,
      buildRequestBody(content, tagBank, maxNewTags), requestHeaders))
    catch { case _: Exception => "" }
  }
}

/** Env-keyed provider factory (reference: src/main.cpp:43-58 — services
  * activate only when OPENAI_API_KEY / DEEPSEEK_API_KEY are set,
  * otherwise the feature degrades). Here "degrades" = the deterministic
  * offline mocks, so the pipeline stays runnable in zero-egress
  * environments (and in tests).
  */
object ProviderFactory {
  def embedderFromEnv(env: String => Option[String] = sys.env.get): Embedder =
    env("OPENAI_API_KEY") match {
      case Some(k) if k.nonEmpty => new HttpEmbedder(k)
      case _ => new MockEmbedder()
    }

  def taggerFromEnv(env: String => Option[String] = sys.env.get): Tagger =
    env("DEEPSEEK_API_KEY") match {
      case Some(k) if k.nonEmpty => new HttpTagger(k)
      case _ => new MockTagger()
    }
}
