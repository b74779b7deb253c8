package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Live-transport spec for [[LlmHttp.HttpRewriteClient]] against an
  * in-process fake chat-completions server (JDK `HttpServer`, no
  * network egress): request shape parity with `llm_processing.py:163-174`,
  * response parsing, and the full [[Llm.withRetry]] rate-limit loop
  * driven by real HTTP 429s. */
class LlmHttpSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** One scripted server per test: `script(n)` = (status, body) for the
    * n-th request (1-based); records request bodies and headers. */
  private def withServer[A](script: Int => (Int, String))
                           (f: (String, AtomicInteger, java.util.List[String]) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    val bodies = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    server.createContext("/", (ex: HttpExchange) => {
      val n = calls.incrementAndGet()
      bodies.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        + "\n" + ex.getRequestURI.toString
        + "\n" + Option(ex.getRequestHeaders.getFirst("api-key")).getOrElse(""))
      val (status, body) = script(n)
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", calls, bodies)
    finally server.stop(0)
  }

  private def completion(text: String): String = {
    val root = mapper.createObjectNode()
    val m = root.putArray("choices").addObject().putObject("message")
    m.put("role", "assistant")
    m.put("content", text)
    mapper.writeValueAsString(root)
  }

  test("happy path: parses choices[0].message.content and trims") {
    withServer(_ => (200, completion("  rewritten text \n"))) { (url, calls, _) =>
      val c = new LlmHttp.HttpRewriteClient(url, "k")
      assert(c.rewrite("2", "original") == "rewritten text")
      assert(calls.get() == 1)
    }
  }

  test("request shape matches the reference call: url, api-key, messages, params") {
    withServer(_ => (200, completion("x"))) { (url, _, bodies) =>
      new LlmHttp.HttpRewriteClient(url, "secret-key", "gpt-4o", "2024-08-01-preview")
        .rewrite("2", "some finding")
      val Array(body, uri, apiKey) = bodies.get(0).split("\n")
      assert(uri == "/openai/deployments/gpt-4o/chat/completions?api-version=2024-08-01-preview")
      assert(apiKey == "secret-key")
      val j = mapper.readTree(body)
      assert(j.get("model").asText == "gpt-4o")
      assert(j.get("max_tokens").asInt == 300)
      assert(j.get("temperature").asInt == 0)
      assert(j.get("top_p").asInt == 1)
      assert(j.get("frequency_penalty").asInt == 0)
      assert(j.get("presence_penalty").asInt == 0)
      val msgs = j.get("messages")
      assert(msgs.size == 2)
      assert(msgs.get(0).get("role").asText == "system")
      assert(msgs.get(0).get("content").asText == LlmHttp.Prompts("2")._1)
      assert(msgs.get(1).get("role").asText == "user")
      assert(msgs.get(1).get("content").asText == LlmHttp.Prompts("2")._2 + "some finding")
    }
  }

  test("withRetry retries real HTTP 429s (wait hint honored) then succeeds") {
    val rateLimited = """{"error":{"code":"429","message":"rate_limit exceeded, try again in 0.01s"}}"""
    withServer(n => if (n <= 2) (429, rateLimited) else (200, completion("ok"))) {
      (url, calls, _) =>
        val c = new LlmHttp.HttpRewriteClient(url, "k")
        assert(Llm.withRetry(c, baseDelaySec = 0.01)("1", "hello") == "ok")
        assert(calls.get() == 3)
    }
  }

  test("withRetry degrades non-rate-limit HTTP errors to the input, no retry") {
    withServer(_ => (500, """{"error":"internal"}""")) { (url, calls, _) =>
      val c = new LlmHttp.HttpRewriteClient(url, "k")
      assert(Llm.withRetry(c)("1", "hello") == "hello")
      assert(calls.get() == 1)
    }
  }

  test("withRetry degrades an unknown language number to the input (no call made)") {
    withServer(_ => (200, completion("x"))) { (url, calls, _) =>
      val c = new LlmHttp.HttpRewriteClient(url, "k")
      assert(Llm.withRetry(c)("9", "hello") == "hello")
      assert(calls.get() == 0, "prompt lookup fails before any HTTP call")
    }
  }

  test("malformed completion body degrades to the input") {
    withServer(_ => (200, """{"unexpected":true}""")) { (url, _, _) =>
      val c = new LlmHttp.HttpRewriteClient(url, "k")
      assert(Llm.withRetry(c)("1", "hello") == "hello")
    }
  }

  test("fromEnv: live client only when endpoint AND key are set") {
    assert(LlmHttp.fromEnv(env = _ => None) == Llm.MockClient)
    assert(LlmHttp.fromEnv(env = Map("AZURE_OPENAI_ENDPOINT" -> "http://x").get) == Llm.MockClient)
    assert(LlmHttp.fromEnv(env = Map("AZURE_OPENAI_API_KEY" -> "k").get) == Llm.MockClient)
    val live = LlmHttp.fromEnv(env =
      Map("AZURE_OPENAI_ENDPOINT" -> "http://x", "AZURE_OPENAI_API_KEY" -> "k").get)
    assert(live.isInstanceOf[LlmHttp.HttpRewriteClient])
  }

  test("client survives executor serialization through rewritePairs") {
    withServer(_ => (200, completion("served"))) { (url, _, _) =>
      val spark = TestSpark.session
      import spark.implicits._
      val c = new LlmHttp.HttpRewriteClient(url, "k")
      val out = Llm.rewritePairs(Seq(("1", "alpha"), ("2", "beta")).toDS(), c)
        .collect().map { case (l, s, r) => (l, s) -> r }.toMap
      assert(out == Map(("1", "alpha") -> "served", ("2", "beta") -> "served"))
    }
  }
}
