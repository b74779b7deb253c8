package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Partition-invariance of the FULL pipeline on randomized structured
  * requests (SURVEY.md §7.2: the `_rid` ingest ordinal must make every
  * order-dependent operator deterministic for arbitrary inputs, not
  * just the golden fixtures). */
class PipelinePropertiesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  /** Seeded random request body: multi-record, all languages, shared
    * diag codes (summary sharing), duplicate findings, empty/whitespace
    * comments, full-width punctuation. */
  private def randomBody(seed: Long, nRecords: Int): String = {
    val rnd = new Random(seed)
    def pick(vs: String*) = vs(rnd.nextInt(vs.length))
    val comments = Seq("正常（範圍內） 值", "需要\r\n追蹤", "ok value", "  ", "",
      "５０％ 以上！", "テスト結果", "简体 说明")
    val records = (0 until nRecords).map { r =>
      val items = (0 until 1 + rnd.nextInt(3)).map { i =>
        val findings = (0 until 1 + rnd.nextInt(3)).map { _ =>
          s"""{"DIAG_CODE": "D${rnd.nextInt(5)}", "COMMENT": ${escape(pick(comments: _*))}, "SUMMARY_CODE": "X"}"""
        }
        s"""{"ITEM_CODE": "I${rnd.nextInt(4)}", "FINDINGS": [${findings.mkString(", ")}]}"""
      }
      s"""{"RECORD_ID": "R$r", "LANG_NO": "${1 + rnd.nextInt(4)}", "ORG_ID": "O${rnd.nextInt(2)}", "ITEMS": [${items.mkString(", ")}]}"""
    }
    s"[${records.mkString(", ")}]"
  }
  private def escape(s: String): String =
    "\"" + s.flatMap {
      case '\r' => "\\r"; case '\n' => "\\n"; case '"' => "\\\""
      case c => c.toString
    } + "\""

  test("rewrite map path ≡ broadcast-join path on random requests") {
    import spark.implicits._
    // a client whose output is distinguishable per (lang, text), so a
    // join-key mismatch can't hide behind identity rewrites
    val marker = new Llm.RewriteClient {
      def rewrite(langNo: String, text: String): String = s"[RW:$langNo]$text"
    }
    Seq(7L, 23L, 99L).foreach { seed =>
      val body = randomBody(seed, nRecords = 6)
      val records = Ingest.parseBodies(spark.createDataset(Seq(body)))
      val fact = Ingest.flatten(records)
      // fallback dims leave summaries empty → Clean fills the per-language
      // DEFAULTS, which bypass the LLM; give the summary dim real texts so
      // the rewrite path actually fires
      val d0 = Dims.fallback(fact)
      val d = d0.copy(summaryTbl = d0.summaryTbl.select(
          col("SUMMARY_CODE"),
          concat(lit("摘要 "), col("SUMMARY_CODE")).as("TCNAME_SUMMARY"),
          concat(lit("摘要simp "), col("SUMMARY_CODE")).as("SCNAME_SUMMARY"),
          concat(lit("Sum "), col("SUMMARY_CODE")).as("ENNAME_SUMMARY"),
          concat(lit("要約 "), col("SUMMARY_CODE")).as("JPNAME_SUMMARY")))
        .restrictedTo(fact)
      val cleaned = Clean.clean(Enrich.enrich(fact, d))
      val echo = Ingest.requestEcho(records)
      val viaMap = Report.report(cleaned, echo, Llm.rewriteMap(cleaned, marker))
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
      val viaJoin = Report.reportJoined(cleaned, echo, Llm.rewriteFrame(cleaned, marker))
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
      assert(viaMap.exists(_._2.contains("[RW:")), s"seed $seed: no rewrite exercised")
      assert(viaJoin == viaMap, s"seed $seed: joined path diverged from map path")
    }
  }

  test("runRecords leaves no cached RDDs behind") {
    import spark.implicits._
    spark.catalog.clearCache()
    // DELTA assertion, not absolute emptiness: the shared test session
    // legitimately carries session-scoped memo tables (the ops
    // catalog's shared pair/component/canonical maps are
    // localCheckpointed BY DESIGN and owned by the session, not by
    // this pipeline). The contract under test is that the PIPELINE
    // adds nothing — its own intermediates unpersist once the report
    // materializes.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val records = Ingest.parseBodies(spark.createDataset(Seq(randomBody(5L, 4))))
    val out = Pipeline.runRecords(records)
    assert(out.count() > 0)
    val added = spark.sparkContext.getPersistentRDDs -- before
    assert(added.isEmpty,
      "pipeline intermediates must unpersist once the report materializes; " +
        s"left behind: $added")
  }

  test("runDistributed ≡ runRecords on random requests (marker client)") {
    import spark.implicits._
    val marker = new Llm.RewriteClient {
      def rewrite(langNo: String, text: String): String = s"[RW:$langNo]$text"
    }
    Seq(11L, 29L).foreach { seed =>
      val records = Ingest.parseBodies(
        spark.createDataset(Seq(randomBody(seed, nRecords = 5))))
      val eager = Pipeline.runRecords(records, client = marker).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
      val lazyOut = Pipeline.runDistributed(records, client = marker).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
      assert(eager.nonEmpty, s"seed $seed produced empty output")
      assert(lazyOut == eager, s"seed $seed: runDistributed diverged from runRecords")
    }
  }

  test("runDistributed composes without running any Spark job (fully lazy)") {
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        descs.add(js.stageInfos.map(si => si.name + "@" + si.details.linesIterator
          .take(3).mkString("|")).mkString(" / "))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // the listener bus is async: job events from earlier tests may still be
    // draining. Drain it fully (not a wall-clock quiet period, which can
    // flake on a loaded machine) before reading the counter.
    def settle(): Int = {
      org.apache.spark.graft.TestListenerBus.waitUntilEmpty(spark.sparkContext)
      jobs.get()
    }
    try {
      // a sentinel query's job count is not 1 under AQE (each query stage
      // is its own job) — measure it instead of assuming
      val cInit = settle()
      spark.range(1).count()
      val cA = settle()
      val sentinelCost = cA - cInit
      assert(sentinelCost > 0, "sentinel must run at least one job")
      // delta-based for the same reason as the cached-RDD test above:
      // session-scoped memo tables from other components are not this
      // pipeline's cache
      val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val records = Ingest.parseBodies(spark.createDataset(Seq(randomBody(1L, 3))))
      val out = Pipeline.runDistributed(records)
      // force full analysis — still no execution may happen
      out.queryExecution.optimizedPlan
      spark.range(1).count() // post-composition sentinel
      val cB = settle()
      assert(cB - cA == sentinelCost,
        s"expected only the sentinel's $sentinelCost job(s); composition ran " +
          s"${cB - cA - sentinelCost} extra: " + descs.toArray.mkString("[", "; ", "]"))
      val cachedAdded = spark.sparkContext.getPersistentRDDs -- cachedBefore
      assert(cachedAdded.isEmpty,
        s"runDistributed must not cache anything; added: $cachedAdded")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("runDistributed is partition-count invariant on random requests") {
    import spark.implicits._
    Seq(13L, 37L).foreach { seed =>
      val records = Ingest.parseBodies(spark.createDataset(Seq(randomBody(seed, 6))))
      val base = Pipeline.runDistributed(records).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
      assert(base.nonEmpty, s"seed $seed produced an empty pipeline output")
      Seq(1, 5).foreach { n =>
        val rep = Pipeline.runDistributed(records.repartition(n)).collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
        assert(rep == base, s"seed $seed: output changed under repartition($n)")
      }
    }
  }

  test("full pipeline is partition-count invariant on random requests") {
    import spark.implicits._
    Seq(3L, 17L, 42L).foreach { seed =>
      val body = randomBody(seed, nRecords = 6)
      val records = Ingest.parseBodies(spark.createDataset(Seq(body)))
      val base = Pipeline.runRecords(records).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
      assert(base.nonEmpty, s"seed $seed produced an empty pipeline output")
      Seq(1, 5).foreach { n =>
        val rep = Pipeline.runRecords(records.repartition(n)).collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
        assert(rep == base, s"seed $seed: output changed under repartition($n)")
      }
    }
  }
}
