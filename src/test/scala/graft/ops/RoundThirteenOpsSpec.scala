package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Round-13 additions: the p08 df-drift guard (serve from the
  * published standing labels exactly when no standing hash crossed
  * the df cap) and the m11 stream-edge cross readout. */
class RoundThirteenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  private def frames(rows: (Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "frame_hash")
  }

  private def labels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  private def oneShot(all: DataFrame, floor: Long, maxDf: Int): DataFrame =
    Clusters.connectedComponents(
      Multimodal.videoNearDupPairs(all, floor, maxDf)
        .select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")

  test("p08 guard PASS: no df crossover serves the published labels, " +
    "equal to one-shot") {
    // standing (even ids): (0,2) share h1 at publish-time jac 0.5;
    // delta doc 1 shares h2 with doc 0 (global df(h2)=2 ≤ maxDf=2,
    // df(h1)=2 unchanged) — no standing hash crosses the cap
    val floor = 500000L
    val standing = frames(0L -> 101L, 0L -> 102L, 2L -> 101L)
    val delta = frames(1L -> 102L)
    val published = Clusters.connectedComponents(
      Multimodal.videoNearDupPairs(standing, floor, 2)
        .select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
    assert(labels(published) == Map(0L -> 0L, 2L -> 0L))
    var loads = 0
    val served = Multimodal.mediaServeFrom(standing, delta,
      () => { loads += 1; published }, floor, maxDf = 2)
    val want = oneShot(standing.unionByName(delta), floor, 2)
    assert(labels(want) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L),
      "fixture must produce a cross pair that extends the cluster")
    assert(labels(served) == labels(want))
    assert(loads == 1, "the guard must have served the published labels")
  }

  test("p08 guard FIRE: a delta-induced df crossover forces the " +
    "recompute, equal to one-shot") {
    // publish-time pair (0,2) via h1 (standing df 2 ≤ maxDf 2); the
    // delta re-uses h1, pushing global df to 3 > 2 — h1 becomes
    // boilerplate, the published (0,2) pair is no longer real, and
    // serving the stale labels would wrongly keep 0 and 2 clustered.
    // (4,6) is an untouched standing cluster that must survive.
    val floor = 300000L
    val standing = frames(0L -> 101L, 0L -> 106L, 2L -> 101L, 2L -> 107L,
      4L -> 104L, 4L -> 105L, 6L -> 104L, 6L -> 105L)
    val delta = frames(1L -> 101L)
    val published = Clusters.connectedComponents(
      Multimodal.videoNearDupPairs(standing, floor, 2)
        .select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
    assert(labels(published) ==
      Map(0L -> 0L, 2L -> 0L, 4L -> 4L, 6L -> 4L),
      "fixture must publish a pair the delta will invalidate")
    val served = Multimodal.mediaServeFrom(standing, delta,
      () => fail("stale labels must not be served across a df crossover"),
      floor, maxDf = 2)
    val want = oneShot(standing.unionByName(delta), floor, 2)
    assert(labels(want) == Map(4L -> 4L, 6L -> 4L),
      "the crossover must dissolve the (0,2) cluster in the one-shot run")
    assert(labels(served) == labels(want))
  }

  test("m11 stream-edge readout: frozen-df cross pairs are " +
    "standing×delta only and reproducible") {
    val out = Multimodal.streamEdgeNearDup(spark, sf)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(rows.nonEmpty, "fixture must contain cross-set media near-dups")
    rows.foreach { case (a, b, inter, union, jac) =>
      assert(a % 2 == 0 && b % 2 != 0, "doc_a standing (even), doc_b delta (odd)")
      assert(inter >= 1 && union >= inter)
      assert(jac == inter * 1000000L / union && jac >= Multimodal.VideoJacFloorQ6)
    }
    // deterministic: a second run over the same corpus is identical
    val again = Multimodal.streamEdgeNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(again == rows)
  }
}
