package graft.streaming

import graft.etl.TestSpark
import graft.ops.{Search, Tables}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streamed segment store, merged at read time, must serve the
  * EXACT one-shot r01 ranking — r07's integer merge theorem makes the
  * result independent of how the corpus was micro-batched into
  * segments. */
class IndexStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("availableNow segment stream serves the exact one-shot BM25 ranking") {
    val segDir = java.nio.file.Files
      .createTempDirectory("graft_index_stream").toString
    IndexStream.runAvailableNow(spark, sf, segDir)
    val (p, l, st) = IndexStream.mergedIndex(spark, segDir)
    // merged segments equal the one-shot index build bit-for-bit
    val full = Search.bm25BuildIndex(Tables.documents(spark, sf),
      "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(p) == rows(full._1), "segment postings must union exactly")
    assert(rows(l) == rows(full._2), "segment lexicons must re-sum exactly")
    assert(rows(st) == rows(full._3), "segment stats must re-sum exactly")
    // and the serve path lands on r01's ranking
    val served = Search.bm25QueryIndex(p, l, st).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = Search.bm25TopK(Tables.documents(spark, sf),
      "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == direct)
  }
}
