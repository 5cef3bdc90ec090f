package graft

import com.fasterxml.jackson.databind.ObjectMapper

/** Minimal OpenAI-compatible chat-completions client — the request/response
  * shape of the reference's `client.chat.completions.create(model=…,
  * messages=[{role:system},{role:user}], temperature=0)` call
  * (app.py:250-251), with the TRANSPORT injectable so tests, CI and
  * air-gapped runs never open a socket: the wire format is exercised
  * against canned fixtures; deployments that do have an endpoint keep the
  * default `httpTransport` (JDK built-in HTTP client, no extra deps).
  */
final class LlmClient(endpoint: String, model: String, apiKey: String,
                      temperature: Double = 0.0,
                      transport: LlmClient.Transport = LlmClient.httpTransport) {

  /** One completion: (system, user) → assistant message content.
    * Throws on transport/shape errors — callers (LlmFrontend) turn that
    * into the literal error query, the reference's failure path. */
  def complete(systemPrompt: String, userMessage: String): String = {
    val body = LlmClient.requestJson(model, systemPrompt, userMessage, temperature)
    val headers = Map(
      "Content-Type" -> "application/json",
      "Authorization" -> s"Bearer $apiKey")
    LlmClient.extractContent(transport(s"$endpoint/chat/completions", headers, body))
  }
}

object LlmClient {
  /** (url, headers, requestBody) → responseBody. */
  type Transport = (String, Map[String, String], String) => String

  // Jackson ships with Spark — JSON building/parsing without new deps,
  // and proper escaping (prompts embed quotes/newlines freely).
  private val mapper = new ObjectMapper()

  /** Chat-completions request body: model, temperature, system+user
    * messages — the exact field set the reference sends. */
  def requestJson(model: String, systemPrompt: String, userMessage: String,
                  temperature: Double): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("temperature", temperature)
    val msgs = root.putArray("messages")
    val s = msgs.addObject(); s.put("role", "system"); s.put("content", systemPrompt)
    val u = msgs.addObject(); u.put("role", "user"); u.put("content", userMessage)
    mapper.writeValueAsString(root)
  }

  /** `choices[0].message.content` of a chat-completions response, the
    * reference's read path (app.py:251). Missing/null → error (no silent
    * empty SQL). */
  def extractContent(responseBody: String): String = {
    val content = mapper.readTree(responseBody)
      .path("choices").path(0).path("message").path("content")
    if (content.isMissingNode || content.isNull)
      throw new IllegalArgumentException(
        "completion response has no choices[0].message.content")
    content.asText()
  }

  /** Real HTTP POST via java.net.http (JDK 11+). Never exercised by tests
    * — they inject canned transports. */
  val httpTransport: Transport = (url, headers, body) => {
    val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => builder.header(k, v) }
    val resp = java.net.http.HttpClient.newHttpClient()
      .send(builder.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"LLM endpoint returned HTTP ${resp.statusCode()}")
    resp.body()
  }
}
