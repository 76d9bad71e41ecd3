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

  /** Scripted Menu — the test double the reference builds with its
    * generated renderer mock. */
  private final class ScriptedMenu(
      selections: Iterator[String], inputs: Iterator[String], texts: Iterator[String])
      extends graft.config.Menu {
    val titles = scala.collection.mutable.ArrayBuffer.empty[String]
    def selection(title: String, items: Seq[String]): String = {
      titles += title; val s = selections.next(); assert(items.contains(s)); s
    }
    def input(title: String, validate: String => Option[String]): String = {
      titles += title; val v = inputs.next(); assert(validate(v).isEmpty); v
    }
    def text(title: String): String = { titles += title; texts.next() }
  }

  test("interactive description: clarification loop appends info and regenerates") {
    val broken = "models: {user: {columns: []}}"
    // attempt 1 (3 tries, all broken) -> user clarifies -> attempt 2 valid
    val api = new Scripted(Seq(broken, broken, broken, ValidYaml))
    val menu = new ScriptedMenu(
      selections = Iterator("add clarifying information"),
      inputs = Iterator("/tmp/out_cfg.yaml"),
      texts = Iterator("a users table", "rows_count must be 100"))
    val (path, r) = ProseAuthoring.interactiveDescription(api, menu, savePath = None)
    assert(path == "/tmp/out_cfg.yaml")
    assert(r.valid)
    // the clarified request reaches the model verbatim
    val last = api.calls.last(1).content
    assert(last.contains("a users table") && last.contains("Clarifying information")
      && last.contains("rows_count must be 100"))
    // prompts fired in order: save path, description, invalid-choice, clarification
    assert(menu.titles.size == 4)
  }

  test("interactive description: accept as-is keeps the invalid config") {
    val broken = "models: {user: {columns: []}}"
    val api = new Scripted(Seq(broken))
    val menu = new ScriptedMenu(
      selections = Iterator("accept as-is"),
      inputs = Iterator.empty,
      texts = Iterator("whatever"))
    val (path, r) = ProseAuthoring.interactiveDescription(api, menu, savePath = Some("x.yaml"))
    assert(path == "x.yaml" && !r.valid && r.content == broken)
  }

  test("console menu: selection by number, input validation retry, dot-terminated text") {
    val in = new java.io.BufferedReader(new java.io.StringReader(
      "5\nfirst\n\nvalue\nline one\nline two\n.\n"))
    val bos = new java.io.ByteArrayOutputStream()
    val menu = new graft.config.ConsoleMenu(in, new java.io.PrintStream(bos, true, "UTF-8"))
    // "5" is out of range -> re-prompt -> literal item name accepted
    assert(menu.selection("pick one", Seq("first", "second")) == "first")
    // empty line fails nonEmpty -> re-prompt -> "value"
    assert(menu.input("enter path", graft.config.Menu.nonEmpty) == "value")
    assert(menu.text("describe") == "line one\nline two")
    val out = bos.toString("UTF-8")
    assert(out.contains("# pick one") && out.contains("1) first"))
    assert(out.contains("value must not be empty"))
  }
}
