package graft.streaming

import graft.etl.TestSpark
import graft.ops.{Dedup, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** foreachBatch incremental dedup ≡ the one-shot batch run (d10) on the
  * same static input. */
class IncrementalDedupStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("availableNow foreachBatch dedup matches batch d10") {
    val corpus = Tables.documents(spark, sf).filter(col("doc_id") % 2 === 0)
    val out = Files.createTempDirectory("graft_incdedup").toString + "/pairs"
    IncrementalDedupStream.runAvailableNow(spark, sf, corpus, out,
      deltaFilter = col("doc_id") % 2 =!= 0)
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    val batch = Dedup.queries("d10_incremental_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(batch.nonEmpty, "fixture must contain cross-set near-dups")
    assert(streamed == batch)
  }

  test("indexed foreachBatch dedup (persisted bands) matches batch d10") {
    val corpus = Tables.documents(spark, sf).filter(col("doc_id") % 2 === 0)
    val idxDir = Files.createTempDirectory("graft_incdedup_idx").toString
    Dedup.minhashWriteIndex(corpus, "doc_id", "text", idxDir)
    val out = Files.createTempDirectory("graft_incdedup2").toString + "/pairs"
    IncrementalDedupStream.runAvailableNowIndexed(spark, sf, corpus, idxDir,
      out, deltaFilter = col("doc_id") % 2 =!= 0)
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    val batch = Dedup.queries("d10_incremental_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(streamed == batch,
      "serving micro-batches from the loaded band table must equal batch d10")
  }
}
