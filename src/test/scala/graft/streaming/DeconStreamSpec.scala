package graft.streaming

import graft.etl.TestSpark
import graft.ops.{Dedup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stream-edge semantic decontamination (d27) ≡ one-shot d25 on the
  * same corpus, under any micro-batch partitioning — the zero-state
  * argument: a vector's verdict depends only on (vector, benchmark),
  * the benchmark is the standing side of every batch, so per-batch
  * exact sweeps compose by plain union. */
class DeconStreamSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"
  // 0.35 (not the catalog's 0.45): at sf0.001 both parity tranches
  // must contribute rows or the split proves nothing
  val Threshold = 0.35

  private def rows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq

  test("streamed decontamination equals one-shot d25, and a forced " +
    "batch boundary does not change any vector's verdict") {
    val emb = Tables.embeddings(spark, sf)
    val bench = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val oneShot = rows(Dedup.semanticDecontaminate(
      corpus, bench, "vec_id", "embedding", Threshold))
    assert(oneShot.nonEmpty, "fixture must contain contamination hits")

    // single drain over the whole corpus
    val out1 = Files.createTempDirectory("graft_decon_o1").toString + "/f"
    DeconStream.runAvailableNow(spark, sf, bench, out1, Threshold,
      deltaFilter = col("vec_id") % 10 =!= 0)
    assert(rows(Drain.readSink(spark, out1)) == oneShot)

    // the corpus staged as two files behind ONE checkpoint, drained
    // into ONE sink — a real micro-batch boundary with distinct
    // batchIds (two uncheckpointed invocations would both number their
    // batches from 0 and collide in the idempotent batchId-keyed sink;
    // the Drain contract demands the checkpoint for shared sinks)
    val watch = Files.createTempDirectory("graft_decon_watch")
    val ckpt = Files.createTempDirectory("graft_decon_ckpt").toString
    def stage(df: DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_decon_tr")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(p =>
          p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
      Files.copy(part, watch.resolve(s"$name.parquet"))
      ()
    }
    val out2 = Files.createTempDirectory("graft_decon_o2").toString + "/f"
    def runOnce(): Unit =
      DeconStream.runAvailableNow(spark, watch.toString, bench, out2,
        Threshold, checkpointDir = Some(ckpt), glob = "*.parquet")
    stage(corpus.filter(col("vec_id") % 2 === 0), "evens")
    runOnce()
    stage(corpus.filter(col("vec_id") % 2 =!= 0), "odds")
    runOnce()
    assert(rows(Drain.readSink(spark, out2)) == oneShot,
      "a batch boundary must not change any vector's verdict")
  }
}
