package graft

import graft.config.ProseAuthoring
import graft.config.ProseAuthoring.{ChatApi, ChatMessage}

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** LLM config-authoring loop against a local OpenAI-compatible server — the
  * reference tests the same surface with a mocked API (sdvg
  * `cli/openai/general/service_test.go`, `commands/config/description_test.go`);
  * no network involved. */
class ProseAuthoringSpec extends AnyFunSuite {

  private val ValidYaml =
    """models:
      |  user:
      |    rows_count: 100
      |    columns:
      |      - { name: id, type: uuid }
      |""".stripMargin

  /** In-memory ChatApi scripted with canned responses. */
  private final class Scripted(responses: Seq[String]) extends ChatApi {
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[ChatMessage]]
    val baseUrl = "scripted://"
    def models(): Seq[String] = Seq("test-model")
    def chat(messages: Seq[ChatMessage]): String = {
      calls += messages
      responses(math.min(calls.size - 1, responses.size - 1))
    }
  }

  test("first attempt valid: one call, fences stripped, parseable content") {
    val api = new Scripted(Seq(s"```yaml\n$ValidYaml```"))
    val r = ProseAuthoring.tryGenerate(api, "yaml", "users with a uuid id")
    assert(r.valid && r.attempts == 1 && r.lastError.isEmpty)
    assert(!r.content.contains("```"), "fence must be stripped")
    graft.config.ConfigParser.parseYaml(r.content) // must not throw
    val roles = api.calls.head.map(_.role)
    assert(roles == Seq("system", "user"))
    assert(api.calls.head.last.content.contains("users with a uuid id"))
  }

  test("invalid first attempt retries with the validator errors and prior context") {
    val broken = "models: {user: {columns: []}}" // no rows_count, no columns
    val api = new Scripted(Seq(broken, ValidYaml))
    val r = ProseAuthoring.tryGenerate(api, "yaml", "users")
    assert(r.valid && r.attempts == 2)
    val retry = api.calls(1)
    assert(retry.map(_.role) == Seq("system", "user", "assistant"))
    assert(retry(1).content.contains(broken), "retry must include the failed config")
    assert(retry(1).content.toLowerCase.contains("validation"), "retry must carry the errors")
    assert(retry(2).content == broken, "failed attempts ride along as assistant context")
  }

  test("still-invalid after max attempts returns last content with the error, like the reference") {
    val api = new Scripted(Seq("nonsense: true"))
    val r = ProseAuthoring.tryGenerate(api, "yaml", "users", maxAttempts = 3)
    assert(!r.valid && r.attempts == 3 && r.lastError.isDefined)
    assert(r.content == "nonsense: true")
  }

  test("HTTP binding: bearer auth, chat payload shape, model list ping, fence-wrapped reply") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/v1/models", ex => {
      seen.add("models:" + ex.getRequestHeaders.getFirst("Authorization"))
      respond(ex, """{"data":[{"id":"m1"},{"id":"m2"}]}""")
    })
    server.createContext("/v1/chat/completions", ex => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      seen.add("chat:" + body)
      val content = ("```yaml\n" + ValidYaml + "```")
        .replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
      respond(ex, s"""{"choices":[{"message":{"role":"assistant","content":"$content"}}]}""")
    })
    server.start()
    try {
      val api = new ProseAuthoring.OpenAiHttpApi(
        s"http://localhost:${server.getAddress.getPort}/v1", "sk-test", "m1")
      assert(api.models() == Seq("m1", "m2"))
      ProseAuthoring.ping(api)
      val r = ProseAuthoring.tryGenerate(api, "yaml", "a users table")
      assert(r.valid && r.attempts == 1)
      val reqs = seen.toArray.map(_.toString)
      assert(reqs.exists(_.startsWith("models:Bearer sk-test")))
      val chat = reqs.find(_.startsWith("chat:")).get
      assert(chat.contains(""""model":"m1""""))
      assert(chat.contains(""""role":"system"""") && chat.contains(""""role":"user""""))
    } finally server.stop(0)
  }
}
