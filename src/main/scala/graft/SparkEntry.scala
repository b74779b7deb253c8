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
      ops.Pack.queries ++ ops.Search.queries ++
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
            graft.etl.Report.BlocksDefault)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.TextOps.oracle ++ ops.Dedup.oracle ++
      ops.Similarity.oracle ++ ops.Events.oracle ++ ops.Multimodal.oracle ++
      ops.Skew.oracle ++ ops.Sampling.oracle ++ ops.Clusters.oracle ++
      ops.Sketches.oracle ++ ops.BloomJoin.oracle ++
      ops.Pack.oracle ++ ops.Search.oracle ++
      Map("p02_report_blocks" -> graft.etl.Report.blocksOracleSql)
}
