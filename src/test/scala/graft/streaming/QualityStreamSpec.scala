package graft.streaming

import graft.etl.TestSpark
import graft.ops.{Tables, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Stream-edge quality gating ≡ the one-shot batch gate (t22) on the
  * same delta, served from a PERSISTED model — the full
  * train → publish → load → stream-score loop on the text-quality
  * seam. */
class QualityStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("availableNow foreachBatch gate matches the batch t22 serve " +
    "from a loaded model") {
    val docs = Tables.documents(spark, sf)
    val (uni, bi) = TextOps.lmTrain(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val modelDir = Files.createTempDirectory("graft_lm_model").toString
    TextOps.lmWriteModel(uni, bi, modelDir)
    val (lu, lb) = TextOps.lmLoadModel(spark, modelDir)

    val out = Files.createTempDirectory("graft_lm_out").toString + "/verdicts"
    QualityStream.runAvailableNow(spark, sf, lu, lb, out,
      deltaFilter = col("doc_id") % 2 =!= 0)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    val streamed = norm(Drain.readSink(spark, out))
    val batch = norm(TextOps.lmScoreWith(
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", uni, bi)
      .withColumn("keep", col("logp2_q6") >= TextOps.LmKeepThresholdQ6))
    assert(batch.nonEmpty)
    assert(streamed == batch,
      "stream-edge gating from the loaded model must equal the batch serve")
  }

  test("checkpointed restart gates only the new tranche — no verdict " +
    "duplicates — and the union equals the batch gate") {
    val docs = Tables.documents(spark, sf)
    val (uni, bi) = TextOps.lmTrain(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val watch = Files.createTempDirectory("graft_lm_watch")
    val ckpt = Files.createTempDirectory("graft_lm_ckpt").toString
    val out = Files.createTempDirectory("graft_lm_out2").toString + "/verdicts"

    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_lm_tranche")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      // Files.list holds a directory handle until closed
      val listing = Files.list(tmp)
      val part =
        try listing.filter(p =>
          p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
      Files.copy(part, watch.resolve(s"$name.parquet"))
    }
    def runOnce(): Unit =
      QualityStream.runAvailableNow(spark, watch.toString, uni, bi, out,
        deltaFilter = lit(true), checkpointDir = Some(ckpt),
        glob = "*.parquet")
    def readOut() = Drain.readSink(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

    val arriving = docs.filter(col("doc_id") % 2 =!= 0)
    stage(arriving.filter(col("doc_id") % 4 === 1), "t1")
    runOnce()
    val firstRun = readOut()
    stage(arriving.filter(col("doc_id") % 4 === 3), "t2")
    runOnce()
    val resumed = readOut()

    val batch = TextOps.lmScoreWith(arriving, "doc_id", "text", uni, bi)
      .withColumn("keep", col("logp2_q6") >= TextOps.LmKeepThresholdQ6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(firstRun.nonEmpty && firstRun.length < batch.length,
      "split produced no partial first run")
    assert(resumed.length == resumed.map(_._1).distinct.length,
      "a reprocessed tranche would duplicate verdict rows")
    assert(resumed.sortBy(_._1).toSeq == batch.sortBy(_._1).toSeq,
      "restarted gate must equal the uninterrupted batch gate")
  }
}
