package graft.streaming

import graft.etl.TestSpark
import graft.ops.{Similarity, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Stream-edge PQ encoding ≡ the one-shot batch encode (k18) on the
  * same delta, served from a PERSISTED codebook — the full
  * train → persist → load → stream-encode loop. */
class EncodeStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("availableNow foreachBatch encode matches batch k18 from a loaded index") {
    val e = Tables.embeddings(spark, sf)
    val corpus = e.filter(col("vec_id") % 2 === 0)
    val (codes, cbs) = Similarity.pqTrainIndex(corpus, "vec_id", "embedding")
    val idxDir = Files.createTempDirectory("graft_enc_idx").toString
    Similarity.pqWriteIndex(codes, cbs, idxDir)
    val (_, loadedCbs) = Similarity.pqLoadIndex(spark, idxDir)

    val out = Files.createTempDirectory("graft_enc_out").toString + "/codes"
    EncodeStream.runAvailableNow(spark, sf, loadedCbs, out,
      deltaFilter = col("vec_id") % 2 =!= 0)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        (1 until r.size).map(r.getLong).toSeq)).sortBy(_._1).toSeq
    val streamed = norm(Drain.readSink(spark, out))
    val batch = norm(Similarity.pqEncodeWith(
      e.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding", cbs))
    assert(batch.nonEmpty)
    assert(streamed == batch,
      "stream-edge encoding from the loaded codebooks must equal batch k18")
  }
}
