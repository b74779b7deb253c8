package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The ONE availableNow file-drain the frozen-artifact stream runners
  * share (IndexStream, MediaStream, QualityStream grew three copies of
  * the same reader/checkpoint/foreachBatch scaffolding — three places
  * for the exactly-once wiring to drift apart): read the directory as
  * a delta stream under an explicit schema (streaming reads never
  * infer), filter, and hand each micro-batch — WITH its batchId — to
  * `body` with exact batch semantics.
  *
  * Exactly-once across restarts needs BOTH halves:
  *  - `checkpointDir` makes the SOURCE exact: a re-run replays only
  *    batches whose offsets were not yet committed. Without one (None —
  *    the single-shot spec/harness mode) every invocation reprocesses
  *    the whole directory, so `body`'s appends must target a fresh
  *    location or rows silently double.
  *  - the SINK must be idempotent under replay of the one in-flight
  *    batch: a crash INSIDE a batch (rows appended, offset not yet
  *    committed) replays that batch with the SAME batchId on restart.
  *    A plain `mode("append")` sink doubles its rows; [[appendBatch]] —
  *    batchId-keyed subdirectory, overwrite semantics — lands the
  *    replay on the same subdir and cannot. Every graft runner that
  *    claims restart recovery appends through it and reads back
  *    through [[readSink]]. */
object Drain {
  def availableNow(spark: SparkSession, dir: String, schema: StructType,
                   glob: String, deltaFilter: Column,
                   checkpointDir: Option[String])
                  (body: (DataFrame, Long) => Unit): Unit = {
    val reader = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
      .filter(deltaFilter)
    val writer0 = reader.writeStream
    val writer = checkpointDir.fold(writer0)(cp =>
      writer0.option("checkpointLocation", cp))
    val q = writer
      .foreachBatch { (batch: DataFrame, id: Long) => body(batch, id) }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** IDEMPOTENT per-batch parquet append: batch `batchId`'s rows write
    * to their own batchId-keyed subdirectory with OVERWRITE semantics.
    * Structured Streaming re-invokes an uncommitted batch with the
    * same batchId after a restart, so the replay overwrites its own
    * subdir instead of doubling rows — the standard foreachBatch
    * exactly-once sink idiom (a transactional table would do the same
    * with the batchId as the transaction key). A crash mid-write
    * leaves only that subdir torn, and the replay's overwrite clears
    * it before rewriting. Read the sink back with [[readSink]]. */
  def appendBatch(df: DataFrame, outPath: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$outPath/b$batchId")

  /** Read a sink/store directory that mixes [[appendBatch]] subdirs
    * with plain top-level parquet files (a standing segment written by
    * a batch publisher plus streamed batch subdirs): recursive file
    * listing, NO partition inference — the subdir names are commit
    * units, not data. Hidden files (`_`-prefixed stamps, _SUCCESS)
    * stay excluded as in any parquet read. */
  def readSink(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(path)
}
