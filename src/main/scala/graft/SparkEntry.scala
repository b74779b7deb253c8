package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator catalog: the reference-parity pipeline
  * (graft.etl), the relational inventory of SURVEY.md §2 mapped onto the
  * harness star schema (graft.ops.Relational), and the training-data
  * extensions — text analysis, dedup (exact / Jaccard / MinHash-LSH /
  * SimHash / embedding-cosine), similarity search, event windows, and
  * multimodal plumbing (graft.ops.*). Every SQL-expressible query carries
  * a DuckDB oracle in `oracleSql`; the pipeline report and the
  * float-fold centroid query are rows-only by design.
  */
object SparkEntry {
  /** Flagship: the full medical-report pipeline (ingest → broadcast-join
    * enrichment → clean → hierarchical report) on the reference's shipped
    * sample request, offline (fallback dims + mock LLM). Driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.etl.Pipeline.run(spark, graft.etl.Pipeline.SampleRequest)

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.5
    * extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.TextOps.queries ++ ops.Dedup.queries ++
      ops.Similarity.queries ++ ops.Events.queries ++ ops.Multimodal.queries ++
      ops.Skew.queries ++ ops.Sampling.queries ++ ops.Clusters.queries ++
      ops.Sketches.queries ++ ops.BloomJoin.queries ++
      ops.Pack.queries ++ ops.Search.queries ++ ops.Profile.queries ++
      ops.Layout.queries ++ ops.Bucketing.queries ++ ops.Entity.queries ++
      Map(
        // Reference-parity pipeline as a query (ignores sfDir — its input
        // is the reference's own sample request). Non-SQL-expressible
        // (hierarchical report serialization) → rows-only check.
        "p01_pipeline_report" -> ((s: SparkSession, _: String) =>
          graft.etl.Pipeline.run(s, graft.etl.Pipeline.SampleRequest)),
        // The serializer's decision layer (ordered nested grouping, block
        // reorder, header suppression) as a relational plan over a
        // documents-derived hierarchy — SQL-expressible, so unlike p01 it
        // carries a full hash oracle.
        "p02_report_blocks" -> ((s: SparkSession, d: String) =>
          graft.etl.Report.reportBlocks(
            graft.etl.Report.blocksInput(ops.Tables.documents(s, d)),
            graft.etl.Report.BlocksDefault)),
        // The full curation pipeline as ONE lazy plan — what a corpus
        // user actually runs end-to-end: near-dup dedup (min-id keeper)
        // → Gopher quality gate → deterministic split assignment. Every
        // stage is an existing catalog operator; the composition stays
        // declarative (no materialization between stages), so Catalyst
        // prunes/pushes across stage boundaries, and the whole thing
        // carries a composed DuckDB oracle.
        "p03_curation_pipeline" -> ((s: SparkSession, d: String) => {
          import org.apache.spark.sql.functions.col
          val docs = ops.Tables.documents(s, d)
          val kept = ops.Clusters.dedupCorpus(docs, "doc_id",
            ops.Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.6),
            "doc_a", "doc_b")
          val good = kept.join(
            ops.TextOps.gopherFilter(kept, "doc_id", "text", "lang")
              .filter(col("keep")).select("doc_id"),
            Seq("doc_id"), "left_semi")
          ops.Sampling.splitAssign(good, "doc_id", ops.Sampling.DefaultSplits)
            .select(col("doc_id"), col("lang"), col("split"))
        }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.TextOps.oracle ++ ops.Dedup.oracle ++
      ops.Similarity.oracle ++ ops.Events.oracle ++ ops.Multimodal.oracle ++
      ops.Skew.oracle ++ ops.Sampling.oracle ++ ops.Clusters.oracle ++
      ops.Sketches.oracle ++ ops.BloomJoin.oracle ++
      ops.Pack.oracle ++ ops.Search.oracle ++ ops.Profile.oracle ++
      ops.Layout.oracle ++ ops.Bucketing.oracle ++ ops.Entity.oracle ++
      Map("p02_report_blocks" -> graft.etl.Report.blocksOracleSql,
        "p03_curation_pipeline" -> {
          val swList = ops.TextOps.Stopwords.map(w => s"'$w'").mkString(", ")
          s"""WITH RECURSIVE ${ops.Clusters.componentsCte(ops.Dedup.oracle("d02_ngram_jaccard"))},
             |kept AS (
             |  SELECT doc_id, lang, text FROM documents
             |  WHERE doc_id NOT IN (SELECT id FROM lab WHERE cluster < id)),
             |feat AS (
             |  SELECT doc_id, lang,
             |    CAST(len(w) AS BIGINT) AS n_words,
             |    CAST(reduce(list_prepend(0, list_transform(w, x -> length(x))), (acc, x) -> acc + x) AS BIGINT) AS sl,
             |    CAST(len(list_filter(w, x -> x IN ($swList))) AS BIGINT) AS n_stop
             |  FROM (SELECT doc_id, lang,
             |          list_filter(string_split(text, ' '), x -> x <> '') AS w
             |        FROM kept) t),
             |good AS (
             |  SELECT doc_id, lang FROM feat
             |  WHERE (n_words BETWEEN 15 AND 90)
             |    AND (sl::DOUBLE / n_words::DOUBLE BETWEEN 2.0 AND 12.0)
             |    AND (lang <> 'en' OR n_stop >= 2))
             |SELECT doc_id, lang,
             |  ${ops.Sampling.splitSql("doc_id", ops.Sampling.DefaultSplits)} AS split
             |FROM good""".stripMargin
        })
}
