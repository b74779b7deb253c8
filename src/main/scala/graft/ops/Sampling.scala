package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation
  * (SURVEY.md §7.5 extensions): rate-based stratified sampling and
  * fixed-count-per-stratum selection.
  *
  * Production corpus subsampling must be DETERMINISTIC — re-running the
  * pipeline (or re-computing a lost partition!) has to pick the same
  * rows, which rules out `rand()`: Spark's sample/rand are seeded per
  * partition, so a repartition or recovery changes the sample. Both
  * operators here key on an affine hash of the row id,
  * `h(id) = ((id mod P)·a + b) mod P` (the [[Hashing.MinHashA]]/`B`
  * family — `id mod P` first so the product stays < 2^60, no ANSI
  * overflow at any id), which is a fixed pseudo-random total order over
  * rows that any engine reproduces exactly — the DuckDB oracles mirror
  * it literal-for-literal.
  *
  * Scale shapes:
  *  - [[sampleByRate]] is a pure map-side filter — zero shuffles, zero
  *    state, trivially parallel at any corpus size;
  *  - [[sampleFixedPerStratum]] is a rank window, which Spark executes
  *    with `WindowGroupLimit`: each map task pre-prunes to the k
  *    smallest rows per stratum BEFORE the exchange, so the shuffle
  *    carries at most k·(map partitions) rows per stratum, not the
  *    stratum's full population (same idiom as the q08 keep-first
  *    dedup).
  */
object Sampling {
  /** Affine-hash family member used for the sampling permutation. */
  private val A = Hashing.MinHashA(0)
  private val B = Hashing.MinHashB(0)
  private val P = Hashing.P

  // pmod, not %: both engines' % follows the dividend's sign, so a
  // negative id would hash negative and always pass the rate gate —
  // the (x % P + P) % P form keeps the coin fair over the full id range
  private def h(id: String): Column =
    expr(s"(((($id % ${P}L + ${P}L) % ${P}L) * ${A}L + ${B}L) % ${P}L)")

  /** SQL fragment of [[h]] for the DuckDB oracles. */
  private def hSql(id: String): String =
    s"(((($id % $P + $P) % $P) * $A + $B) % $P)"

  /** Keep each row iff `h(id) < rate(stratum)·P` — per-stratum Bernoulli
    * sampling with a deterministic coin. Rates are compared as exact
    * long thresholds (`⌊rate·P⌋`), so engines agree bit-for-bit. */
  def sampleByRate(df: DataFrame, id: String, strata: String,
                   rates: Map[String, Double], default: Double): DataFrame = {
    val thr = rates.foldLeft(lit((default * P).toLong)) {
      case (acc, (k, r)) => when(col(strata) === k, lit((r * P).toLong)).otherwise(acc)
    }
    df.filter(h(id) < thr)
  }

  /** The CASE threshold of [[sampleByRate]] as oracle SQL. */
  private def thrSql(strata: String, rates: Map[String, Double],
                     default: Double): String =
    if (rates.isEmpty) (default * P).toLong.toString
    else "CASE " + rates.map { case (k, r) =>
      s"WHEN $strata = '$k' THEN ${(r * P).toLong}"
    }.mkString(" ") + s" ELSE ${(default * P).toLong} END"

  /** The k rows with the smallest `h(id)` per stratum — a deterministic
    * fixed-size sample (equivalently: the first k of a fixed
    * pseudo-random permutation). Ties (hash collisions) break on the id
    * itself, keeping the order total. Appends `rk` (1-based). */
  def sampleFixedPerStratum(df: DataFrame, id: String, strata: String,
                            k: Int): DataFrame = {
    val w = Window.partitionBy(col(strata)).orderBy(h(id), col(id))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Deterministic train/val/test split assignment (s03) — every
    * training pipeline's first partitioning decision. Each row lands in
    * the split whose cumulative hash range covers `h(id)`: the
    * assignment is a pure map-side expression (zero shuffles, zero
    * state), stable under repartition/recovery/re-runs (same affine-
    * hash coin as [[sampleByRate]]), and docs never migrate between
    * splits when the corpus grows — the membership of a given id is a
    * function of the id alone, the property that keeps yesterday's test
    * set uncontaminated by tomorrow's training run.
    *
    * `splits` are (name, weight) in order; weights normalize to 1. */
  def splitAssign(df: DataFrame, id: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    val total = splits.map(_._2).sum
    // cumulative EXACT long thresholds — engines agree bit-for-bit
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(f => (f * P).toLong)
    val c = splits.map(_._1).zip(cuts).init
      .foldRight(lit(splits.last._1): Column) { case ((name, cut), acc) =>
        when(h(id) < cut, lit(name)).otherwise(acc)
      }
    df.withColumn("split", c)
  }

  /** The CASE expression of [[splitAssign]] as oracle SQL. */
  private def splitSql(id: String, splits: Seq[(String, Double)]): String = {
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(f => (f * P).toLong)
    "CASE " + splits.map(_._1).zip(cuts).init.map { case (name, cut) =>
      s"WHEN ${hSql(id)} < $cut THEN '$name'"
    }.mkString(" ") + s" ELSE '${splits.last._1}' END"
  }

  /** The split spec the s03 harness query instantiates. */
  val DefaultSplits: Seq[(String, Double)] =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Per-ROW weighted Bernoulli sampling (s04): keep each row with
    * probability `weightExpr` (any expression in [0, 1] — a quality
    * score, a per-source up/down-weight, a length-based curriculum
    * rate). The same deterministic affine coin as [[sampleByRate]], so
    * re-runs, repartitions, and recomputed partitions keep identical
    * rows; still a pure map-side filter, zero shuffles. The comparison
    * is `h(id) < floor(weight·P)` with the product computed in IEEE
    * doubles — both engines round identically, so the oracle matches
    * bit-for-bit even at weight boundaries. */
  def sampleByWeight(df: DataFrame, id: String, weightExpr: String): DataFrame =
    df.filter(h(id) < floor(expr(weightExpr).cast("double") * P).cast("long"))

  /** SQL mirror of [[sampleByWeight]]'s predicate. */
  private def weightSql(id: String, weightExpr: String): String =
    s"${hSql(id)} < CAST(floor(($weightExpr)::DOUBLE * $P) AS BIGINT)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_sample_rate" -> ((s, d) =>
      sampleByRate(Tables.documents(s, d), "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 0.25), default = 0.1)
        .select(col("doc_id"), col("lang"), col("source"))),
    "s02_sample_fixed" -> ((s, d) =>
      sampleFixedPerStratum(Tables.documents(s, d), "doc_id", "lang", k = 20)
        .select(col("lang"), col("doc_id"), col("rk"))),
    "s03_split_assign" -> ((s, d) =>
      splitAssign(Tables.documents(s, d), "doc_id", DefaultSplits)
        .select(col("doc_id"), col("split"))),
    // length-proportional curriculum weight: longer docs keep more often
    "s04_sample_weighted" -> ((s, d) =>
      sampleByWeight(Tables.documents(s, d), "doc_id",
        "least(cast(n_chars as double) / 4000.0, 1.0)")
        .select(col("doc_id"), col("lang"), col("n_chars"))))

  def oracle: Map[String, String] = Map(
    "s01_sample_rate" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${hSql("doc_id")} <
         |  ${thrSql("lang", Map("en" -> 0.5, "zh" -> 0.25), 0.1)}""".stripMargin,
    "s02_sample_fixed" ->
      s"""SELECT lang, doc_id, rk FROM (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |                       ORDER BY ${hSql("doc_id")}, doc_id) AS rk
         |  FROM documents) ranked
         |WHERE rk <= 20""".stripMargin,
    "s03_split_assign" ->
      s"""SELECT doc_id, ${splitSql("doc_id", DefaultSplits)} AS split
         |FROM documents""".stripMargin,
    "s04_sample_weighted" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${weightSql("doc_id", "least(n_chars / 4000.0, 1.0)")}""".stripMargin)
}
