package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicInteger

/** §2.10 LLM operator semantics beyond the golden path: retry/backoff
  * (`llm_processing.py:161-205`), default-sentence short-circuit, and
  * distinct-batch shape. */
class LlmSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private class FlakyClient(failures: Int, msg: String) extends Llm.RewriteClient {
    val calls = new AtomicInteger(0)
    def rewrite(langNo: String, text: String): String = {
      if (calls.incrementAndGet() <= failures) throw new RuntimeException(msg)
      s"[OK]$text"
    }
  }

  test("non-rate-limit errors degrade gracefully to the input") {
    val c = new FlakyClient(failures = 99, msg = "boom")
    assert(Llm.withRetry(c)("1", "hello") == "hello")
    assert(c.calls.get() == 1, "non-rate-limit errors must not retry")
  }

  test("rate-limit errors retry with backoff then succeed") {
    val c = new FlakyClient(failures = 2, msg = "rate_limit: try again in 0.01s")
    assert(Llm.withRetry(c, baseDelaySec = 0.01)("1", "hello") == "[OK]hello")
    assert(c.calls.get() == 3)
  }

  test("rate-limit exhaustion returns the input unchanged") {
    val c = new FlakyClient(failures = 99, msg = "429 too many requests; try again in 0.01s")
    assert(Llm.withRetry(c, baseDelaySec = 0.005)("1", "hello") == "hello")
    assert(c.calls.get() == 3, "must stop after maxRetries attempts")
  }

  test("default sentences bypass the client; summaries deduplicate") {
    import spark.implicits._
    val counting = new Llm.RewriteClient {
      def rewrite(langNo: String, text: String): String = s"[N]$text"
    }
    val default1 = Schemas.LANG_DEFAULT_SUMMARY("1")
    val pairs = Seq(
      ("1", "alpha"), ("1", "alpha"), ("1", " alpha "),   // dedups to one call
      ("1", default1),                                     // bypasses client
      ("1", "")).toDS()                                    // dropped
    val out = Llm.rewritePairs(pairs, counting)
      .collect().map { case (l, s, r) => (l, s) -> r }.toMap
    assert(out == Map(
      ("1", "alpha") -> "[N]alpha",
      ("1", default1) -> default1))
  }
}
