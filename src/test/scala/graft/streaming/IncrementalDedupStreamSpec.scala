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
    val streamed = Drain.readSink(spark, out)
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
    val streamed = Drain.readSink(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    val batch = Dedup.queries("d10_incremental_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(streamed == batch,
      "serving micro-batches from the loaded band table must equal batch d10")
  }

  test("CJK stream edge: micro-batches served from the loaded d21 store " +
    "equal the one-shot cjkServeDelta") {
    def cjk(f: org.apache.spark.sql.Column) =
      Tables.documents(spark, sf).filter(f).select(col("doc_id"),
        graft.ops.TextOps.cjkFixture(col("text")).as("text"))
    val idxDir = Files.createTempDirectory("graft_cjk_idx").toString
    Dedup.cjkPublishIndex(cjk(col("doc_id") % 2 === 0), "doc_id", "text",
      idxDir)
    val out = Files.createTempDirectory("graft_cjk_out").toString + "/pairs"
    IncrementalDedupStream.runAvailableNowCjk(spark, sf, idxDir, out,
      deltaFilter = col("doc_id") % 2 =!= 0,
      textOf = graft.ops.TextOps.cjkFixture(col("text")))
    val streamed = Drain.readSink(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    val batch = Dedup.cjkServeDelta(spark, cjk(col("doc_id") % 2 =!= 0),
        "doc_id", "text", 0.6, idxDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(batch.nonEmpty, "fixture must contain cross-set CJK near-dups")
    assert(streamed == batch,
      "standing text must never be needed: the loaded hashes/bands alone " +
        "reproduce the one-shot serve")
  }
}
