package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full medical-report pipeline (ingest → broadcast-join
    * enrichment → clean → hierarchical report) on the reference's shipped
    * sample request, offline (fallback dims + mock LLM). Driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.etl.Pipeline.run(spark, graft.etl.Pipeline.SampleRequest)
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
