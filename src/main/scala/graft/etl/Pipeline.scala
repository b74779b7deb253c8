package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end pipeline composition — the reference's `POST /process`
  * (`text_processing.py:144-177`): ingest → enrich → clean → report.
  *
  * Unlike the reference's materialize-after-every-step pandas flow, the
  * whole chain up to the report serializer is one lazy Catalyst plan: four
  * broadcast joins, codegen'd string normalization, one hash-partition
  * exchange for the keep-first dedup window, and one range exchange for the
  * display sort. The LLM rewrite is resolved once over the global distinct
  * summary set (per-value semantics identical to the reference's per-record
  * batching, since the map is keyed by text).
  */
object Pipeline {

  /** Run the full pipeline over request bodies already parsed to the
    * record level. @return (record_id, report, request) in request order.
    *
    * The LLM rewrite applies as a broadcast left join
    * ([[Report.reportJoined]]) — no driver-side rewrite map. The result
    * is materialized EAGERLY into a local frame before returning: the
    * reference's contract is request/response (the report table IS the
    * HTTP body, `text_processing.py:169-177`), so the output is
    * driver-sized by definition, and eager materialization lets the
    * intermediate caches unpersist deterministically — a long-lived
    * serving process holds zero cached RDDs between requests (pinned by
    * `PipelinePropertiesSpec`). For bulk offline composition where the
    * output is NOT driver-sized, call the stage functions directly
    * ([[Ingest.flatten]] → [[Enrich.enrich]] → [[Clean.clean]] →
    * [[Report.reportJoined]]) and sink the lazy frame. */
  def runRecords(records: DataFrame, dims: Option[Dims] = None,
                 client: Llm.RewriteClient = Llm.MockClient): DataFrame = {
    // LOCALIZE the fact rather than cache it: the request path's input
    // is driver-sized by contract (see class doc — bulk flows compose
    // the stage functions directly), and a dozen downstream jobs read
    // the fact to build broadcasts (4 dims + code set + org/max
    // scalars). Against a cached distributed frame each of those jobs
    // pays scheduling + block-manager reads; against a LocalTableScan
    // they are plan-local. Same rows either way — the golden suite
    // stays byte-exact.
    val fact = localize(Ingest.flatten(records))
    val d = dims.getOrElse(Dims.fallback(fact)).restrictedTo(fact)
    val enriched = Enrich.enrich(fact, d)
    val cleaned = Clean.clean(enriched).cache()
    try {
      val rewrite = Llm.rewriteFrame(cleaned, client)
      localize(Report.reportJoined(cleaned, Ingest.requestEcho(records), rewrite))
    } finally {
      cleaned.unpersist()
    }
  }

  /** EP1 as ONE LAZY Catalyst plan — the corpus-scale twin of
    * [[runRecords]]. Same stage composition (flatten → enrich → clean →
    * LLM rewrite join → report), but nothing is collected, cached, or
    * localized: the returned frame is a pure logical plan the caller can
    * sink with `df.write` / [[Sinks.writeReportJsonl]], `explain`, or
    * compose further. Output is byte-identical to [[runRecords]]
    * (pinned by `PipelinePropertiesSpec` on random requests and the
    * golden fixtures) and `repartition(n)`-invariant — every
    * order-dependent operator keys on the `_rid` / `_rec_ord` ingest
    * ordinals, never on physical row order.
    *
    * Scale notes:
    *  - the cleaned subtree feeds BOTH the rewrite-pair scan and the
    *    report serializer (and `records` also feeds the request echo);
    *    with no cache those subtrees evaluate independently. The input
    *    must therefore be DETERMINISTIC — re-evaluating it must yield
    *    the same rows — because the `_rid`/`_rec_ord` ordinals derive
    *    from `monotonically_increasing_id`, and a nondeterministic
    *    source (a `sample`, an unstable shuffle output, a task retry
    *    over changing data) could assign different ordinals per branch,
    *    silently changing keep-first dedup and output order. For such
    *    sources persist or checkpoint `records` first; the
    *    repartition-invariance guarantee holds only for deterministic
    *    inputs. With no cache the fact scan also appears twice in the
    *    physical plan — at corpus scale persist the upstream `records`
    *    frame (or checkpoint `Clean.clean`'s output) if the input scan
    *    is expensive; the engine will not hide a persistence decision
    *    inside a lazy API;
    *  - dims resolve exactly as in [[runRecords]]: explicit dims are
    *    broadcast after a left-semi restriction to the fact's codes;
    *    fallback dims derive from the fact frame itself, still lazily.
    */
  def runDistributed(records: DataFrame, dims: Option[Dims] = None,
                     client: Llm.RewriteClient = Llm.MockClient): DataFrame = {
    val fact = Ingest.flatten(records)
    val d = dims.getOrElse(Dims.fallback(fact)).restrictedTo(fact)
    val cleaned = Clean.clean(Enrich.enrich(fact, d))
    val rewrite = Llm.rewriteFrame(cleaned, client)
    Report.reportJoined(cleaned, Ingest.requestEcho(records), rewrite)
  }

  /** Collect a driver-sized result and rebuild it as a local DataFrame,
    * cutting all lineage to the pipeline's cached intermediates so they
    * can unpersist immediately. */
  private def localize(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Run on a single JSON request body (array of records or bare object). */
  def run(spark: SparkSession, requestBody: String,
          dims: Option[Dims] = None,
          client: Llm.RewriteClient = Llm.MockClient): DataFrame =
    runRecords(Ingest.parseBodies({
      import spark.implicits._
      spark.createDataset(Seq(requestBody))
    }), dims, client)

  /** EP1 with the reference's CSV intermediates
    * (`text_processing.py:157-166`): persists the cleaned frame and the
    * final report table under timestamped names in `outDir`, then
    * returns the report frame. Single-file CSVs mirror the reference's
    * artifact shape; pass `singleFile = false` at scale. */
  def runAndPersist(spark: SparkSession, requestBody: String, outDir: String,
                    dims: Option[Dims] = None,
                    client: Llm.RewriteClient = Llm.MockClient,
                    singleFile: Boolean = true): DataFrame = {
    val records = Ingest.parseBodies({
      import spark.implicits._
      spark.createDataset(Seq(requestBody))
    })
    val fact = localize(Ingest.flatten(records)) // see runRecords note
    val d = dims.getOrElse(Dims.fallback(fact)).restrictedTo(fact)
    val cleaned = Clean.clean(Enrich.enrich(fact, d)).cache()
    try {
      Sinks.writeCsv(cleaned.drop("_rid"),
        s"$outDir/${Sinks.timestampedName("df_preprocessed_", "")}", singleFile)
      val rewrite = Llm.rewriteFrame(cleaned, client)
      val report = localize(
        Report.reportJoined(cleaned, Ingest.requestEcho(records), rewrite))
      Sinks.writeCsv(report,
        s"$outDir/${Sinks.timestampedName("df_result_", "")}", singleFile)
      report
    } finally {
      cleaned.unpersist()
    }
  }

  /** The reference's shipped smoke fixture (`sample_request.json:1-29`),
    * used by the flagship entry and the golden tests. */
  val SampleRequest: String =
    """[
      |  {
      |    "RECORD_ID": "R001",
      |    "LANG_NO": "1",
      |    "ORG_ID": "ORG_A",
      |    "ITEMS": [
      |      {
      |        "ITEM_CODE": "I001",
      |        "FINDINGS": [
      |          {"DIAG_CODE": "D001", "COMMENT": "範例說明文字 A", "SUMMARY_CODE": "S001"}
      |        ]
      |      },
      |      {
      |        "ITEM_CODE": "I002",
      |        "FINDINGS": [
      |          {"DIAG_CODE": "D002", "COMMENT": "範例說明文字 B", "SUMMARY_CODE": "S002"}
      |        ]
      |      }
      |    ]
      |  }
      |]""".stripMargin
}
