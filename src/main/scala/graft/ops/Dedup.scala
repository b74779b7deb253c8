package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over `documents`
  * and `embeddings` (SURVEY.md §7.5): exact hash-dedup, token-3-gram
  * Jaccard, MinHash + LSH banding, SimHash, and embedding-cosine
  * near-dup.
  *
  * Design for 100 TB:
  *  - everything is shingle/token-level `explode` → hash-partitioned
  *    `groupBy`/self-join on the shingle key — the classic scalable shape
  *    (no per-pair work until candidates are bucketed; the only O(n²)
  *    operator is the cosine near-dup, whose scale path is the LSH
  *    variant in [[Similarity]]);
  *  - hashes are the engine-portable [[Hashing.polyHash]] (codegen'd
  *    higher-order functions), so the driver's DuckDB oracle reproduces
  *    every intermediate value bit-for-bit;
  *  - MinHash signatures are one `groupBy(doc_id)` with 16 `min` aggs
  *    (partial map-side mins → tiny shuffle), then band keys explode to a
  *    (band, key) self-join — at 1000 executors the band join shuffles
  *    only signature rows, never documents.
  */
object Dedup {
  import Hashing._

  /** Ultra-common-shingle guard for the Jaccard candidate generator: a
    * shingle shared by d docs yields O(d²) candidate pairs, so one stop-
    * phrase shingle at corpus scale would dominate the whole job. Far
    * above any df in the testdata (max 25 at sf0.1) — the cap only ever
    * binds where the pairs were near-useless anyway (a shingle in 1000+
    * docs carries no dedup signal). Mirrored in the oracle. */
  val MaxShingleDf = 1000

  private val ShingleArr =
    "array_distinct(transform(sequence(0, size(tk) - 3), " +
    "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))"

  private def tokenized(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')").as("tk"))
      .filter(size(col("tk")) >= 3)

  /** Distinct token-3-gram shingles per doc: (doc_id, shingle). */
  private def shingles(s: SparkSession, d: String): DataFrame =
    tokenized(s, d)
      .select(col("doc_id"), explode(expr(ShingleArr)).as("shingle"))

  /** DuckDB CTE mirroring [[shingles]] — `sh(doc_id, shingle)`. */
  private val shinglesSql: String =
    """tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      |       FROM documents WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 3),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
      |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle FROM tk) raw)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: group by content hash, keep lowest doc_id
    // (the A2 keep-first rule with an explicit deterministic order key).
    "d01_exact_dedup" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("sig"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
    }),

    // n-gram Jaccard near-dup: shingle self-join → |A∩B| → J = i/(|A|+|B|-i).
    // Threshold 0.6 sits far from both the planted near-dups (≥0.9) and the
    // background (≤0.1) — no float-boundary ambiguity.
    "d02_ngram_jaccard" -> ((s, d) => {
      val sh = shingles(s, d)
      val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      // one pass: group docs per shingle, expand in-bucket pairs — the
      // shingle set is computed ONCE (a self-join would run the whole
      // shingle subplan twice) and the only shuffles are the two groupBys
      val inter = sh
        .groupBy(col("shingle"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1 && size(col("ids")) <= MaxShingleDf)
        .select(explode(expr(
          "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))"))
          .as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("inter"))
      val ca = counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
      val cb = counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"))
      inter.join(ca, "doc_a").join(cb, "doc_b")
        .withColumn("jaccard",
          col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.6)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
    }),

    // MinHash + LSH banding: 16 minhashes = 4 bands × 4 rows; docs sharing
    // any full band key are candidate pairs. Candidate generation only —
    // callers re-verify with d02 on the (tiny) candidate set.
    "d03_minhash_lsh" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val h = shingles(s, d).withColumn("h", polyHash("shingle"))
      val mhAggs = (0 until Bands * RowsPerBand).map { i =>
        min(expr(s"(${MinHashA(i)}L * h + ${MinHashB(i)}L) % ${P}L")).as(s"mh$i")
      }
      val sig = h.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
      val bandKeys = (0 until Bands).map { b =>
        val cols = (0 until RowsPerBand).map(r => s"mh${b * RowsPerBand + r}")
        expr(s"concat_ws('_', ${cols.mkString(", ")})")
      }
      val bands = sig.select(col("doc_id"),
        posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
      // bucket-group + in-bucket pair expansion (see d02 note): the
      // 16-min signature aggregation runs once, not once per join side
      bands
        .groupBy(col("band"), col("key"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))"))
          .as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .distinct()
    }),

    // SimHash: 32-bit signed-sum signature over term-frequency-weighted
    // token hashes. One explode over bit positions keeps it relational
    // (no per-doc UDF) and partial-aggregates map-side.
    "d04_simhash" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(expr("filter(split(text, ' '), x -> x <> '')")).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
        .withColumn("h", polyHash("token"))
      tok
        .select(col("doc_id"), col("cnt"), col("h"),
          explode(expr("sequence(0, 31)")).as("j"))
        .groupBy(col("doc_id"), col("j"))
        .agg(sum(when(expr("(h div shiftleft(1L, j)) % 2") === 1, col("cnt"))
          .otherwise(-col("cnt"))).as("s"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("s") > 0, expr("shiftleft(1L, j)")).otherwise(0L))
          .as("simhash"))
    }),

    // Embedding cosine near-dup, brute force (correctness baseline; the
    // bucketed scale path is Similarity.k02). Dot products run through
    // the native codegen'd graft_dot expression — float elements widen
    // to double before multiplying and accumulate in index order, so the
    // oracle's explicit double fold reproduces the exact same IEEE
    // doubles (and the tight loop is ~20× faster than zip_with/aggregate
    // HOFs on 2M pairs).
    "d05_embedding_neardup" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", expr("graft_dot(a.v, b.v)") / (col("a.nrm") * col("b.nrm")))
        .filter(col("cos") >= 0.45)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))
    }))

  def oracle: Map[String, String] = {
    val mh = (0 until Bands * RowsPerBand).map { i =>
      s"min((${MinHashA(i)} * h + ${MinHashB(i)}) % $P) AS mh$i"
    }.mkString(",\n  ")
    val bandSelects = (0 until Bands).map { b =>
      val key = (0 until RowsPerBand).map(r => s"mh${b * RowsPerBand + r}")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    Map(
      "d01_exact_dedup" ->
        """SELECT md5(text) AS sig, min(doc_id) AS keep_id, count(*) AS n_dups
          |FROM documents GROUP BY md5(text)""".stripMargin,
      "d02_ngram_jaccard" ->
        s"""WITH $shinglesSql,
           |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
           |ok AS (SELECT shingle FROM sh GROUP BY shingle
           |       HAVING count(*) BETWEEN 2 AND $MaxShingleDf),
           |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
           |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           |       JOIN ok ON a.shingle = ok.shingle
           |       GROUP BY 1, 2)
           |SELECT doc_a, doc_b, inter,
           |  inter::DOUBLE / (ca.n_sh + cb.n_sh - inter)::DOUBLE AS jaccard
           |FROM pr
           |JOIN cnt ca ON pr.doc_a = ca.doc_id
           |JOIN cnt cb ON pr.doc_b = cb.doc_id
           |WHERE inter::DOUBLE / (ca.n_sh + cb.n_sh - inter)::DOUBLE >= 0.6""".stripMargin,
      "d03_minhash_lsh" ->
        s"""WITH $shinglesSql,
           |h AS (SELECT doc_id, ${Hashing.polyHashSql("shingle")} AS h FROM sh),
           |sig AS (SELECT doc_id,
           |  $mh
           |  FROM h GROUP BY doc_id),
           |bands AS (
           |  $bandSelects)
           |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |FROM bands a JOIN bands b
           |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id""".stripMargin,
      "d04_simhash" ->
        s"""WITH tok AS (
           |  SELECT doc_id, token, count(*) AS cnt FROM (
           |    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
           |    FROM documents) t GROUP BY 1, 2),
           |th AS (SELECT doc_id, cnt, ${Hashing.polyHashSql("token")} AS h FROM tok),
           |bits AS (
           |  SELECT doc_id, j,
           |    sum(CASE WHEN ((h // (1::BIGINT << j::INTEGER)) % 2) = 1 THEN cnt ELSE -cnt END) AS s
           |  FROM th, (SELECT unnest(range(0, 32)) AS j) js GROUP BY 1, 2)
           |SELECT doc_id,
           |  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j::INTEGER) ELSE 0 END) AS BIGINT) AS simhash
           |FROM bits GROUP BY doc_id""".stripMargin,
      "d05_embedding_neardup" ->
        """WITH v AS (
          |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          |n AS (
          |  SELECT vec_id, v,
          |    sqrt(reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
          |  FROM v)
          |SELECT vec_a, vec_b, cos FROM (
          |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          |    reduce(list_prepend(0.0, list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
          |           (acc, x) -> acc + x) / (a.nrm * b.nrm) AS cos
          |  FROM n a JOIN n b ON a.vec_id < b.vec_id) pairs
          |WHERE cos >= 0.45""".stripMargin)
  }
}
