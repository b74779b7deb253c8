package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import java.util.concurrent.{Callable, Executors, TimeUnit}

/** The LLM summary-rewrite operator — the reference's one black-box scalar
  * function (`llm_processing.py`), re-shaped for Spark.
  *
  * NOT a per-row UDF (that would re-call the endpoint once per fact row and
  * lose batching): the correct distributed shape is
  * `distinct summaries → mapPartitions (bounded-concurrency client per
  * partition) → rewrite-map DataFrame → broadcast join / map lookup back`.
  * The deterministic mock client is the default, making the whole operator
  * a pure function — tests and offline runs are hermetic, exactly like the
  * reference's mock mode (`llm_processing.py:102-107,157-159`).
  */
object Llm {

  /** Pluggable completion backend. Implementations must be serializable —
    * one instance is used per executor partition. */
  trait RewriteClient extends Serializable {
    /** Rewrite one suggestion; may throw (retries handled by the caller). */
    def rewrite(langNo: String, text: String): String
  }

  /** Offline mock (`llm_processing.py:157-159`): `"[LLM_OUTPUT]" + text`. */
  object MockClient extends RewriteClient {
    def rewrite(langNo: String, text: String): String = s"[LLM_OUTPUT]$text"
  }

  /** Retry/backoff policy port (`llm_processing.py:161-205`): ≤3 attempts;
    * rate-limit detected by 'rate_limit'/'429' substring; wait parsed from
    * "try again in Ns" else exponential `base·2^attempt`; on exhaustion or
    * any non-rate-limit error the input is returned unchanged (graceful
    * degradation). */
  def withRetry(client: RewriteClient, maxRetries: Int = 3, baseDelaySec: Double = 1.0)
      (langNo: String, text: String): String = {
    val tryAgain = "try again in ([\\d.]+)s".r
    var attempt = 0
    while (attempt < maxRetries) {
      try {
        return client.rewrite(langNo, text)
      } catch {
        case e: Exception =>
          val msg = Option(e.getMessage).getOrElse("").toLowerCase
          val isRateLimit = msg.contains("rate_limit") || msg.contains("429")
          if (!isRateLimit) return text
          val wait = tryAgain.findFirstMatchIn(msg)
            .map(_.group(1).toDouble + 0.1)
            .getOrElse(baseDelaySec * math.pow(2, attempt))
          Thread.sleep((wait * 1000).toLong)
          if (attempt == maxRetries - 1) return text
      }
      attempt += 1
    }
    text
  }

  /** Distributed rewrite: distinct non-empty trimmed summaries →
    * `(summary, rewritten)` pairs.
    *
    * Per-language default sentences map to themselves without a call
    * (`llm_processing.py:135-137`); empty strings are dropped
    * (`text_processing.py:75`). Within each partition a bounded pool of
    * `maxWorkers` threads drives the client concurrently
    * (`llm_processing.py:80,131` — `ThreadPoolExecutor(max_workers=3)`),
    * so total in-flight requests = partitions × maxWorkers, tunable by
    * repartitioning the distinct set.
    */
  def rewritePairs(summaries: Dataset[(String, String)],
                   client: RewriteClient = MockClient,
                   maxWorkers: Int = 3): Dataset[(String, String, String)] = {
    val spark = summaries.sparkSession
    import spark.implicits._
    summaries
      .map { case (lang, s) => (lang, s.trim) }
      .filter(_._2.nonEmpty)
      .distinct()
      .mapPartitions { it =>
        val batch = it.toVector
        val (defaults, toCall) =
          batch.partition { case (_, s) => Schemas.LANG_DEFAULT_TEXTS.contains(s) }
        val called =
          if (toCall.isEmpty) Vector.empty
          else {
            val pool = Executors.newFixedThreadPool(math.max(1, maxWorkers))
            try {
              val futures = toCall.map { case (lang, s) =>
                (lang, s, pool.submit(new Callable[String] {
                  def call(): String = withRetry(client)(lang, s)
                }))
              }
              futures.map { case (lang, s, f) => (lang, s, f.get()) }
            } finally {
              pool.shutdown()
              pool.awaitTermination(1, TimeUnit.MINUTES)
            }
          }
        (defaults.map { case (l, s) => (l, s, s) } ++ called).iterator
      }
  }

  /** The `(langNo, summary)` pairs the report stage will look up — one
    * summary column per language, as the report stage reads them
    * (`text_processing.py:15-20` positions 7), selected in a SINGLE
    * scan via a CASE over LANG_NO rather than one filtered pass per
    * language (4× fewer scans of the cleaned frame; at scale this is
    * the difference between one and four shuffle-reads of the fact
    * table). */
  private def summaryPairs(cleaned: DataFrame): Dataset[(String, String)] = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    val lang = trim(col("LANG_NO").cast("string"))
    val summary = Schemas.LANG_SUBSET.foldLeft(lit(null).cast("string")) {
      case (acc, (l, cols)) => when(lang === l, col(cols(7)).cast("string")).otherwise(acc)
    }
    cleaned
      .select(lang.as("_1"), summary.as("_2"))
      .filter(col("_2").isNotNull)
      .as[(String, String)]
  }

  /** The rewrite pairs as a DATAFRAME `(_rw_lang, _rw_orig, _rw_text)`,
    * for [[Report.reportJoined]]'s broadcast left join — the fully
    * distributed X12 path: no driver collect, the rewritten texts flow
    * executor-to-executor through the broadcast exchange. Distinct on
    * `(_rw_lang, _rw_orig)` by [[rewritePairs]] construction, so the
    * left join is at-most-one-match. */
  def rewriteFrame(cleaned: DataFrame, client: RewriteClient = MockClient,
                   maxWorkers: Int = 3): DataFrame =
    rewritePairs(summaryPairs(cleaned), client, maxWorkers)
      .toDF("_rw_lang", "_rw_orig", "_rw_text")

  /** The rewrite map as a broadcastable driver-side value, keyed by
    * (langNo, original) → rewritten. Used by the report serializer's
    * `summary_translated.get(summary, summary)` lookup
    * (`text_processing.py:124`). Bounded under reference semantics
    * (distinct summary texts come from dim tables), but it IS a driver
    * hop — [[rewriteFrame]] + [[Report.reportJoined]] is the
    * collect-free equivalent. */
  def rewriteMap(cleaned: DataFrame, client: RewriteClient = MockClient,
                 maxWorkers: Int = 3): Map[(String, String), String] =
    rewritePairs(summaryPairs(cleaned), client, maxWorkers)
      .collect()
      .map { case (l, s, r) => (l, s) -> r }
      .toMap
}
