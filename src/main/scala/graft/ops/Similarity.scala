package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (SURVEY.md §7.5):
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale reasoning:
  *  - brute force is O(probes × corpus): fine when the probe set is small
  *    (it broadcasts) — the corpus side streams through one codegen'd map
  *    stage plus a per-probe top-k window. It is the exact-answer
  *    baseline the approximate variant is judged against.
  *  - the LSH variant buckets the corpus ONCE by 4 signed random
  *    hyperplanes (16 buckets) and joins probe→bucket, so per-probe work
  *    drops to corpus/16; at 1000 executors the bucket key is the shuffle
  *    key and no pair outside a shared bucket is ever scored. Hyperplane
  *    weights are integer-valued and derived from a public LCG formula so
  *    the DuckDB oracle reproduces the same buckets bit-for-bit.
  *
  * All float math is double-widened, left-folded in index order —
  * bit-identical across engines (see Dedup.d05 note).
  */
object Similarity {
  val NumProbes = 10
  val TopK = 5
  val NumPlanes = 4

  /** Integer hyperplane weights w(i,j) from an LCG over (i,j) — portable
    * to SQL as a literal list. */
  def weight(i: Int, j: Int): Long =
    ((1103515245L * (i * 64 + j) + 12345L) % 2039L) - 1019L

  /** Cosine via the native codegen'd [[graft.functions.DotProduct]]
    * (float elements widen to double before multiplying — identical IEEE
    * results to the oracle's explicit double fold, ~20× faster than the
    * zip_with/aggregate HOF form). */
  private def cosExpr: String =
    "graft_dot(a.v, b.v) / (a.nrm * b.nrm)"

  private def vecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
  }

  /** Bucket id: 4 sign bits of integer-weighted hyperplane projections. */
  private def withBucket(df: DataFrame): DataFrame = {
    val bitCols = (0 until NumPlanes).map { i =>
      val w = (0 until 64).map(j => s"${weight(i, j)}D").mkString(", ")
      when(expr(s"graft_dot(v, array($w))") > 0d, 1 << i).otherwise(0)
    }
    df.withColumn("bucket", bitCols.reduce(_ + _))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact k-NN: probes (vec_id < NumProbes) broadcast against the
    // corpus; top-k per probe via ranking window.
    "k01_knn_brute" -> ((s, d) => {
      val v = vecs(s, d)
      val probes = v.filter(col("vec_id") < NumProbes)
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      v.as("b").join(broadcast(probes.as("a")),
          col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          expr(cosExpr).as("cos"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= TopK)
        .select(col("probe_id"), col("rnk"), col("neighbor_id"), col("cos"))
    }),

    // Approximate k-NN: only candidates sharing the probe's LSH bucket
    // are scored. Same output shape; recall < 1 by construction, and the
    // oracle implements the identical approximation.
    "k02_knn_lsh" -> ((s, d) => {
      val v = withBucket(vecs(s, d))
      val probes = v.filter(col("vec_id") < NumProbes)
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      v.as("b").join(broadcast(probes.as("a")),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          expr(cosExpr).as("cos"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= TopK)
        .select(col("probe_id"), col("rnk"), col("neighbor_id"), col("cos"))
    }),

    // IVF-style two-stage ANN: the `label` column plays the role of the
    // coarse cells (a real deployment would k-means them); stage 1 finds
    // each probe's nearest cell centroid, stage 2 searches exactly but
    // ONLY within that cell — per-probe work drops from O(corpus) to
    // O(corpus / cells), and the centroid table is a broadcast. Centroid
    // sums fold in vec_id order (array_sort of collected structs) so the
    // result is deterministic run-to-run. No DuckDB oracle: the centroid
    // averaging's float-sum ordering has no portable SQL mirror →
    // rows-only check; OpsSpec asserts the structural invariants.
    "k03_ivf_knn" -> ((s, d) => {
      val v = vecs(s, d)
      val cents = Tables.embeddings(s, d)
        .select(col("label"), col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          expr("aggregate(array_sort(collect_list(struct(vec_id, v))), " +
               "array_repeat(0D, 64), (acc, x) -> zip_with(acc, x.v, (p, q) -> p + q))")
            .as("sum_v"))
        .select(col("label"),
          expr("transform(sum_v, x -> x / n)").as("centroid"))
        .withColumn("cnrm", expr("sqrt(graft_dot(centroid, centroid))"))
      val probes = v.filter(col("vec_id") < NumProbes)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pnrm"))
      val wCell = Window.partitionBy(col("probe_id"))
        .orderBy(col("ccos").desc, col("label"))
      val probeCell = probes.crossJoin(broadcast(cents))
        .withColumn("ccos",
          expr("graft_dot(pv, centroid)") / (col("pnrm") * col("cnrm")))
        .withColumn("crnk", row_number().over(wCell))
        .filter(col("crnk") === 1)
        .select(col("probe_id"), col("pv"), col("pnrm"), col("label"))
      val wK = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      v.join(broadcast(probeCell), Seq("label"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("label"),
          (expr("graft_dot(pv, v)") / (col("pnrm") * col("nrm"))).as("cos"))
        .withColumn("rnk", row_number().over(wK).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("probe_id"), col("rnk"), col("neighbor_id"), col("label"), col("cos"))
    }))

  def oracle: Map[String, String] = {
    val wLists = (0 until NumPlanes).map { i =>
      (0 until 64).map(j => weight(i, j)).mkString("[", ", ", "]")
    }
    val bucketSql = (0 until NumPlanes).map { i =>
      s"""CASE WHEN reduce(list_prepend(0.0, list_transform(range(1, 65),
         |  k -> v[k] * (${wLists(i)}::BIGINT[])[k])), (acc, x) -> acc + x) > 0
         |  THEN ${1 << i} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    val cosSql =
      """reduce(list_prepend(0.0, list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
        |           (acc, x) -> acc + x) / (a.nrm * b.nrm)""".stripMargin
    Map(
      "k01_knn_brute" ->
        s"""WITH v AS (
           |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
           |n AS (
           |  SELECT vec_id, v,
           |    sqrt(reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
           |  FROM v),
           |scored AS (
           |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
           |    $cosSql AS cos
           |  FROM n a JOIN n b ON a.vec_id < $NumProbes AND a.vec_id <> b.vec_id),
           |ranked AS (
           |  SELECT probe_id, neighbor_id, cos,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
           |  FROM scored)
           |SELECT probe_id, rnk, neighbor_id, cos FROM ranked WHERE rnk <= $TopK""".stripMargin,
      "k02_knn_lsh" ->
        s"""WITH v AS (
           |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
           |n AS (
           |  SELECT vec_id, v,
           |    sqrt(reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm,
           |    $bucketSql AS bucket
           |  FROM v),
           |scored AS (
           |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
           |    $cosSql AS cos
           |  FROM n a JOIN n b
           |    ON a.vec_id < $NumProbes AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
           |ranked AS (
           |  SELECT probe_id, neighbor_id, cos,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
           |  FROM scored)
           |SELECT probe_id, rnk, neighbor_id, cos FROM ranked WHERE rnk <= $TopK""".stripMargin)
  }
}
