package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The ONE availableNow file-drain the frozen-artifact stream runners
  * share (IndexStream, MediaStream, QualityStream grew three copies of
  * the same reader/checkpoint/foreachBatch scaffolding — three places
  * for the exactly-once wiring to drift apart): read the directory as
  * a delta stream under an explicit schema (streaming reads never
  * infer), filter, and hand each micro-batch to `body` with exact
  * batch semantics.
  *
  * Exactly-once across restarts requires `checkpointDir`: with one, a
  * re-run over the same source directory replays nothing already
  * committed. Without one (None — the single-shot spec/harness mode)
  * every invocation reprocesses the whole directory, so `body`'s
  * appends must target a fresh location or rows silently double. */
object Drain {
  def availableNow(spark: SparkSession, dir: String, schema: StructType,
                   glob: String, deltaFilter: Column,
                   checkpointDir: Option[String])
                  (body: DataFrame => Unit): Unit = {
    val reader = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
      .filter(deltaFilter)
    val writer0 = reader.writeStream
    val writer = checkpointDir.fold(writer0)(cp =>
      writer0.option("checkpointLocation", cp))
    val q = writer
      .foreachBatch { (batch: DataFrame, _: Long) => body(batch) }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
