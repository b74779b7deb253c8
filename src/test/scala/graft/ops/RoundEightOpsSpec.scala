package graft.ops

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Targeted checks for the round-8 operators: q47 skyline, k16 MIPS,
  * t19 readability, c17 modularity. Each is verified against either a
  * brute-force recomputation on real data or a hand-computed fixture —
  * independent of the DuckDB oracle, which checks the same answers
  * cross-engine. */
class RoundEightOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("q47 skyline equals the O(n²) dominance definition") {
    val got = Relational.queries("q47_skyline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val want = parts.filter { case (_, px, sx) =>
      !parts.exists { case (_, qx, qs) =>
        qx <= px && qs >= sx && (qx < px || qs > sx)
      }
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("k16 MIPS ranks by exact dot product, self excluded") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val k = Similarity.TopK
    val want = vecs.filter(_._1 < Similarity.NumProbes).flatMap {
      case (pid, pv) =>
        vecs.filter(_._1 != pid)
          .map { case (nid, nv) => (nid, dot(pv, nv)) }
          .sortBy { case (nid, d) => (-d, nid) }
          .take(k).zipWithIndex
          .map { case ((nid, d), i) => (pid, i + 1L, nid, d) }
    }.toSet
    val got = Similarity.queries("k16_mips")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want)
    // (At sf0.001 the dot-product ranking happens to coincide with
    // cosine's — the synthetic vectors' norms are near-uniform. The
    // score COLUMN is still the raw dot, which the exact recomputation
    // above pins; whether norms reorder neighbors is a data property,
    // not an operator contract.)
  }

  test("t19 readability on hand-computed fixtures") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world."),           // 2 words, 1 sentence, 3 vowel runs
      (2L, "a b!! c? d"),             // 4 words, 2 ender runs, 1 vowel run
      (3L, "xyz")                     // y counts as a vowel run; no enders
    ).toDF("doc_id", "text")
    val got = TextOps.withReadability(docs, "text")
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "fre_q3")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def fre(w: Long, s: Long, sy: Long): Long =
      math.round((206.835 - 1.015 * (w.toDouble / s) - 84.6 * (sy.toDouble / w)) * 1000)
    assert(got(1L) == ((2L, 1L, 3L, fre(2, 1, 3))))
    assert(got(2L) == ((4L, 2L, 1L, fre(4, 2, 1))))
    assert(got(3L) == ((1L, 1L, 1L, fre(1, 1, 1))))
  }

  test("c17 modularity on two triangles joined by a bridge") {
    import spark.implicits._
    // nodes 1-3 and 4-6 are triangles; (3,4) bridges them. m = 7.
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val comm = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
      .toDF("doc_id", "community")
    val got = Clusters.modularity(pairs, "doc_a", "doc_b", comm)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // each triangle: 3 intra edges, degree sum 2+2+3 = 7
    // contrib = (4·7·3 − 49) / (4·49) = 35/196 → 178571 in q6 (truncated)
    assert(got(1L) == ((3L, 7L, 3L, 35L * 1000000L / 196L)))
    assert(got(4L) == ((3L, 7L, 3L, 35L * 1000000L / 196L)))
  }

  test("c17 negative contributions use magnitude division (floor ≡ trunc)") {
    import spark.implicits._
    // a community with NO intra edges and high degree → negative contrib
    // star: center 1 with leaves 2,3,4; communities {1} and {2,3,4}
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val comm = Seq(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L)
      .toDF("doc_id", "community")
    val got = Clusters.modularity(pairs, "doc_a", "doc_b", comm)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    // m=3; c1: L=0, d=3 → (0−9)/36 = −0.25 → −250000 exactly
    // c2: L=0, d=3 → same
    assert(got(1L) == -250000L)
    assert(got(2L) == -250000L)
  }
}
