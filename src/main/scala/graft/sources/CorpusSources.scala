package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Corpus readers for the formats training data actually arrives in —
  * JSONL dumps, CSV exports, ORC/parquet lake files — all normalized to
  * the same `documents` schema so every downstream operator
  * ([[graft.ops.TextOps]], [[graft.ops.Dedup]], [[graft.ops.Sampling]],
  * …) is source-agnostic.
  *
  * Scale rules encoded here:
  *  - the schema is ALWAYS passed explicitly — schema inference reads
  *    the whole input once before the real job (2× the scan at corpus
  *    scale) and can silently widen types between batches;
  *  - malformed records go to PERMISSIVE null-rows rather than failing
  *    the job (a 100 TB crawl always has a few broken lines); callers
  *    needing a quarantine use `columnNameOfCorruptRecord`;
  *  - JSONL is splittable by line and CSV by row only when uncompressed
  *    or block-compressed (bzip2) — gzip forces one task per file, so
  *    shard gzip corpora into many files upstream (documented here
  *    because it is the #1 accidental single-task scan in the wild);
  *  - ORC/parquet read through the vectorized reader with predicate
  *    pushdown + column pruning; prefer them for re-reads.
  */
object CorpusSources {
  /** The canonical documents schema every reader lands on. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** JSON-lines corpus: one JSON object per line. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** CSV corpus with a header row. `multiLine=false` keeps the input
    * line-splittable; escaped quotes/newlines inside `text` follow RFC
    * 4180 via the default quote handling. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** ORC corpus (vectorized, pushdown-capable, like parquet). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(documentsSchema).orc(path)

  /** BINARY media ingest — Spark's built-in `binaryFile` source: one
    * row per file, `(path, modificationTime, length, content)`, the
    * real ingestion seam of the multimodal family (the harness's
    * `documents.text`-synthesized blobs stand in only because the
    * testdata ships no media files). Files are read WHOLE — the source
    * never splits a blob — so shard media into object-store-sized
    * files upstream; `pathGlobFilter` prunes by extension at listing
    * time (never a post-scan filter) and nested prefixes are walked
    * with `recursiveFileLookup`. Feed `content` straight into
    * [[graft.ops.Multimodal.decode]]'s codec seam
    * (CorpusSourcesSpec pins that round trip). */
  def readBinaryDir(spark: SparkSession, path: String,
                    glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(path)

  /** Sharded corpus writer: bounds records per output file so the next
    * consumer gets splittable, evenly-sized shards regardless of this
    * job's partitioning (one 50 GB gzip shard is the classic way to
    * hand the next pipeline a single-task scan). `maxRecordsPerFile`
    * caps file size without a repartition — each task rolls to a new
    * file at the limit; add `partitionBy` columns for directory-level
    * pruning on top. */
  def writeSharded(df: DataFrame, path: String, format: String,
                   maxRecordsPerFile: Long,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .format(format)
      .mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }
}
