package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import graft.enrich._

/** Provider HTTP clients (E1/E6 parity with the reference's curl
  * clients) exercised through a capturing transport — no network, the
  * runtime is zero-egress. Shapes pinned: URL, Bearer header, request
  * body fields, response parsing, empty-input short-circuits, env-keyed
  * activation (main.cpp:43-58).
  */
class HttpProvidersSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private class CapturingTransport(reply: String) extends HttpTransport {
    var url: String = _
    var body: String = _
    var headers: Map[String, String] = _
    var calls = 0
    def post(u: String, b: String, h: Map[String, String]): String = {
      url = u; body = b; headers = h; calls += 1; reply
    }
  }

  test("HttpEmbedder: request shape matches EmbeddingClient.cpp:94-106") {
    val t = new CapturingTransport(
      """{"data":[{"embedding":[0.1,0.2]},{"embedding":[0.3,0.4]}]}""")
    val e = new HttpEmbedder("sk-test", dim = 2, transport = t)
    val out = e.embed(Seq("hello", "world"))
    assert(t.url == "https://api.openai.com/v1/embeddings")
    assert(t.headers("Authorization") == "Bearer sk-test")
    assert(t.headers("Content-Type") == "application/json")
    val body = mapper.readTree(t.body)
    assert(body.get("model").asText == "text-embedding-3-small")
    assert(body.get("encoding_format").asText == "float")
    assert(body.get("input").size == 2 &&
      body.get("input").get(0).asText == "hello")
    assert(out.map(_.map(_.toSeq)) ==
      Seq(Some(Seq(0.1f, 0.2f)), Some(Seq(0.3f, 0.4f))))
  }

  test("HttpEmbedder: empty texts never reach the wire; slots align") {
    val t = new CapturingTransport("""{"data":[{"embedding":[1.0]}]}""")
    val e = new HttpEmbedder("k", dim = 1, transport = t)
    val out = e.embed(Seq("", "only-this", ""))
    assert(t.calls == 1, "one batch call for the single non-empty text")
    assert(mapper.readTree(t.body).get("input").size == 1)
    assert(out == Seq(None, Some(out(1).get), None) && out(1).nonEmpty)
    // all-empty batch: no call at all (EmbeddingClient.cpp:52-54)
    val t2 = new CapturingTransport("unused")
    assert(new HttpEmbedder("k", transport = t2).embed(Seq("", null)) ==
      Seq(None, None))
    assert(t2.calls == 0)
  }

  test("HttpEmbedder: API error / malformed reply degrades to None") {
    val t = new CapturingTransport("""{"error":{"message":"rate limit"}}""")
    val e = new HttpEmbedder("k", transport = t)
    assert(e.embed(Seq("x", "y")) == Seq(None, None))
    val boom = new HttpTransport {
      def post(u: String, b: String, h: Map[String, String]): String =
        throw new java.io.IOException("no route")
    }
    assert(new HttpEmbedder("k", transport = boom).embed(Seq("x")) == Seq(None))
  }

  test("HttpTagger: request shape + both system-prompt modes " +
       "(TagClient.cpp:62-99,169-177)") {
    val reply =
      """{"choices":[{"message":{"content":"tags: [\"algorithms\", \"Python\"]"}}]}"""
    val t = new CapturingTransport(reply)
    val g = new HttpTagger("dk-test", transport = t)
    val raw = g.generateTagsRaw("doc about sorting", Seq("algorithms"), 3)
    assert(t.url == "https://api.deepseek.com/v1/chat/completions")
    assert(t.headers("Authorization") == "Bearer dk-test")
    val body = mapper.readTree(t.body)
    assert(body.get("model").asText == "deepseek-chat")
    assert(body.get("temperature").asDouble == 0.3)
    assert(body.get("max_tokens").asInt == 200)
    val msgs = body.get("messages")
    assert(msgs.size == 2 && msgs.get(0).get("role").asText == "system" &&
      msgs.get(1).get("role").asText == "user")
    assert(msgs.get(0).get("content").asText.contains("EXISTING TAG BANK"))
    assert(msgs.get(0).get("content").asText.contains("\"algorithms\""))
    assert(msgs.get(1).get("content").asText == "doc about sorting")
    // raw reply passes through; EnrichService does [..] extract+normalize
    assert(raw.contains("[\"algorithms\", \"Python\"]"))
    val svc = new EnrichService(new MockEmbedder(4), g)
    assert(svc.parseTagReply(raw) == Seq("algorithms", "python"))
    // bootstrap mode: empty bank gets the first-document prompt
    assert(g.buildSystemPrompt(Nil, 3).contains("establish the initial tag vocabulary"))
    assert(g.buildSystemPrompt(Nil, 3).contains("Output ONLY a JSON array"))
    assert(g.buildSystemPrompt(Seq("a"), 5).contains("max 5"))
  }

  test("HttpTagger: empty content / transport failure give empty reply") {
    val t = new CapturingTransport("unused")
    val g = new HttpTagger("k", transport = t)
    assert(g.generateTagsRaw("", Seq(), 3) == "" && t.calls == 0)
    val boom = new HttpTransport {
      def post(u: String, b: String, h: Map[String, String]): String =
        throw new java.io.IOException("refused")
    }
    assert(new HttpTagger("k", transport = boom)
      .generateTagsRaw("x", Seq(), 3) == "")
  }

  test("ProviderFactory: env-keyed activation with mock fallback " +
       "(main.cpp:43-58)") {
    val withKeys = Map("OPENAI_API_KEY" -> "a", "DEEPSEEK_API_KEY" -> "b")
    assert(ProviderFactory.embedderFromEnv(withKeys.get).isInstanceOf[HttpEmbedder])
    assert(ProviderFactory.taggerFromEnv(withKeys.get).isInstanceOf[HttpTagger])
    val none = Map.empty[String, String]
    assert(ProviderFactory.embedderFromEnv(none.get).isInstanceOf[MockEmbedder])
    assert(ProviderFactory.taggerFromEnv(none.get).isInstanceOf[MockTagger])
  }
}
