package graft.config

import com.fasterxml.jackson.databind.ObjectMapper

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** LLM-backed config authoring — the reference's `generate-config
  * description` mode (sdvg `internal/openai/general/api.go:12-90`,
  * `cli/openai/general/service.go:37-107`,
  * `cli/commands/config/common.go:204-256`).
  *
  * Shape mirrors the reference exactly; the transport is INJECTABLE
  * (`ChatApi`), so the whole generate → parse-validate → retry loop runs
  * against a local OpenAI-compatible test server — the engine itself never
  * requires network access. `OpenAiHttpApi` is the production binding
  * (`/models` for ping, `/chat/completions` for generation).
  */
object ProseAuthoring {

  final case class ChatMessage(role: String, content: String)

  /** Minimal chat-completions surface (reference `openai.API`). */
  trait ChatApi {
    def baseUrl: String
    /** Available model ids — reachability probe (reference `Models`). */
    def models(): Seq[String]
    /** One chat turn; returns the first choice's message content. */
    def chat(messages: Seq[ChatMessage]): String
  }

  private val mapper = new ObjectMapper()

  /** OpenAI-compatible HTTP binding over the JDK client (the reference uses
    * go-openai; same wire format: bearer auth, JSON chat payload). */
  final class OpenAiHttpApi(
      val baseUrl: String, apiKey: String, model: String,
      timeoutMillis: Long = 30000L) extends ChatApi {

    private val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMillis)).build()

    private def request(path: String): HttpRequest.Builder =
      HttpRequest.newBuilder(URI.create(s"${baseUrl.stripSuffix("/")}$path"))
        .timeout(Duration.ofMillis(timeoutMillis))
        .header("Authorization", s"Bearer $apiKey")
        .header("Content-Type", "application/json")

    override def models(): Seq[String] = {
      val resp = client.send(
        request("/models").GET().build(), HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new RuntimeException(s"openai models: status ${resp.statusCode()}")
      val data = mapper.readTree(resp.body()).path("data")
      (0 until data.size()).map(i => data.get(i).path("id").asText())
    }

    override def chat(messages: Seq[ChatMessage]): String = {
      val root = mapper.createObjectNode()
      root.put("model", model)
      val arr = root.putArray("messages")
      messages.foreach { m =>
        val node = arr.addObject()
        node.put("role", m.role)
        node.put("content", m.content)
      }
      val resp = client.send(
        request("/chat/completions")
          .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root),
            StandardCharsets.UTF_8))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new RuntimeException(s"openai chat: status ${resp.statusCode()}")
      mapper.readTree(resp.body())
        .path("choices").path(0).path("message").path("content").asText()
    }
  }

  /** Reachability probe (reference `Ping` = list models with a timeout). */
  def ping(api: ChatApi): Unit =
    try api.models()
    catch { case e: Exception => throw new RuntimeException("openai api unreachable", e) }

  /** System prompt bundle: role + format contract + defaults + rules +
    * few-shot anchors, concatenated like the reference's prompt sections
    * (`service.go:41-50`). Wording is our own; the CONTRACT (emit only a
    * parseable config in the requested format) is what the retry loop
    * depends on. */
  private[config] def systemPrompt(format: String): String =
    s"""You write data-generation configs for the graft engine.
       |Respond with ONLY a $format document — no prose, no explanations.
       |The config schema:
       |  random_seed: <long>           # optional
       |  output: { type: parquet|csv|devnull|http, dir: <path> }  # optional
       |  models:                        # required, at least one model
       |    <model_name>:
       |      rows_count: <long>         # required, > 0
       |      columns:                   # required, at least one column
       |        - name: <string>         # required
       |          type: integer|float|string|datetime|uuid
       |          type_params: { from: .., to: .., bit_width: 8|16|32|64, min_length: .., max_length: .., logical_type: first_name|last_name|phone|text }
       |          values: [..]           # enum literals, alternative to type_params
       |          ordered: true|false
       |          distinct_percentage / distinct_count, null_percentage: 0..1
       |          foreign_key: <model.column>
       |Defaults: integer bit_width 32, float bit_width 32, seed random.
       |Rules: every model needs rows_count and columns; enum `values` need no
       |type; foreign keys must reference an existing model.column; emit
       |nothing but the $format document.""".stripMargin

  private[config] def userMessage(format: String, request: String): String =
    s"Generate a $format generation config for the following request.\n$request"

  private[config] def retryMessage(format: String, oldConfig: String, error: String): String =
    s"""The previous $format config failed validation.
       |Config:
       |$oldConfig
       |Validation errors:
       |$error
       |Emit a corrected $format config — the document only.""".stripMargin

  /** Strip a ```<format> ... ``` fence if the model wrapped the document
    * (reference `common.Trim(content, "```"+format, "```")`). */
  private[config] def stripFence(content: String, format: String): String = {
    var s = content.trim
    if (s.startsWith(s"```$format")) s = s.stripPrefix(s"```$format")
    else if (s.startsWith("```")) s = s.stripPrefix("```")
    if (s.endsWith("```")) s = s.stripSuffix("```")
    s.trim
  }

  /** First-attempt generation (reference `GenerateConfig`). */
  def generateConfig(api: ChatApi, format: String, request: String): String =
    stripFence(api.chat(Seq(
      ChatMessage("system", systemPrompt(format)),
      ChatMessage("user", userMessage(format, request)))), format)

  /** Retry with the failed config + validator errors, carrying earlier
    * failed attempts as assistant context (reference `RegenerateConfig`). */
  def regenerateConfig(
      api: ChatApi, format: String, oldConfig: String, error: String,
      context: Seq[String]): String =
    stripFence(api.chat(
      Seq(ChatMessage("system", systemPrompt(format)),
        ChatMessage("user", retryMessage(format, oldConfig, error)))
        ++ context.map(ChatMessage("assistant", _))), format)

  final case class AuthoringResult(
      content: String, valid: Boolean, attempts: Int, lastError: Option[String])

  /** The generate → parse-validate → retry loop, 3 attempts (reference
    * `tryGenerate`, `common.go:204-256`): each failed attempt feeds the
    * validator's error list back to the model; like the reference, the last
    * response is returned even if still invalid (caller warns + writes). */
  def tryGenerate(
      api: ChatApi, format: String, request: String,
      maxAttempts: Int = 3): AuthoringResult = {
    def parse(content: String): Option[String] =
      try {
        if (format == "json") ConfigParser.parseJson(content) else ConfigParser.parseYaml(content)
        None
      } catch { case e: Exception => Some(e.getMessage) }

    var content = generateConfig(api, format, request)
    var err = parse(content)
    var attempts = 1
    var context = Vector.empty[String]
    while (err.isDefined && attempts < maxAttempts) {
      context :+= content
      content = regenerateConfig(api, format, content, err.get, context)
      err = parse(content)
      attempts += 1
    }
    AuthoringResult(content, err.isEmpty, attempts, err)
  }

  /** The INTERACTIVE description flow (reference `cli/commands/config/
    * common.go:100-179` + `generate:31-98`): prompt for the save path when
    * not given, collect the multi-line description, run the
    * generate→validate→retry loop, and — the clarification menu — while
    * the result is still invalid, offer the user a choice of adding
    * clarifying information (appended to the request, full regenerate) or
    * accepting the config as-is. Returns (savePath, result). */
  def interactiveDescription(
      api: ChatApi, menu: Menu, savePath: Option[String]): (String, AuthoringResult) = {
    val path = savePath.getOrElse(
      menu.input("Enter path to save generation config", Menu.nonEmpty))
    val format = if (path.endsWith(".json")) "json" else "yaml"
    var request = menu.text(
      """# Please provide a detailed description for generating a configuration.
        |# Include any specific requirements, data types, formats, and any other
        |# relevant information.""".stripMargin)
    var result = tryGenerate(api, format, request)
    var done = result.valid
    while (!done) {
      val choice = menu.selection(
        s"generated config is still invalid: ${result.lastError.getOrElse("")}",
        Seq("add clarifying information", "accept as-is"))
      if (choice == "accept as-is") done = true
      else {
        val extra = menu.text("# Please provide clarifying information.")
        request = request + "\nClarifying information\n" + extra
        result = tryGenerate(api, format, request)
        done = result.valid
      }
    }
    (path, result)
  }
}
