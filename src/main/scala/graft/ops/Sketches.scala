package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distinct-count sketching (SURVEY.md §7.5 extensions): a PORTABLE
  * HyperLogLog — the "novel sketch" slot of the custom-operator brief,
  * built so the DuckDB oracle reproduces the estimate bit-for-bit.
  *
  * Why not `approx_count_distinct`: Spark's HLL++ hashes with xxhash64
  * and applies engine-private bias corrections — no other engine
  * reproduces its output, so it can only ever get a rows-only check.
  * This sketch derives every register from [[Hashing.polyHash]] and
  * uses only integer arithmetic plus EXACT double operations (powers of
  * two, addition, one division), so the estimate is a deterministic
  * function of the input SET in any engine.
  *
  * Construction (classic Flajolet HLL, m = 2^p registers):
  *   h      = polyHash(value)           ∈ [0, P), ~30 bits
  *   bucket = h mod m
  *   w      = h div m                   (the remaining ~24 bits)
  *   rho    = 24 − bitlength(w) + 1     (leading-zero rank; w = 0 → 25)
  *   register[bucket] = max(rho)        ← the ONLY aggregation
  *   E      = alpha_m · m² / Σ_b 2^(−register[b])   (empty bucket → 2^0)
  *
  * `max` per register is associative/commutative — partial-aggregates
  * map-side and merges across any partitioning, which is the whole
  * scale story: the shuffle carries at most m rows regardless of input
  * size. 2^(−r) for integer r is exact in IEEE doubles, the sum is
  * ordered by bucket id in both engines, so cross-engine equality is
  * exact, not approximate. The small-cardinality linear-counting and
  * large-range corrections of HLL++ use logarithms (not bit-portable);
  * this sketch deliberately omits them and documents the raw-estimate
  * regime n ≫ m — callers needing corrected small-n estimates should
  * count exactly (n small enough to correct is small enough to count).
  */
object Sketches {
  /** Register-count exponent: m = 2^p = 64 registers → ~13% standard
    * error, tiny enough that the oracle SQL stays readable. */
  val P2: Int = 6
  val M: Int = 1 << P2

  /** alpha_m for m = 64 (Flajolet et al. 2007, the published constant
    * for m ≥ 64: 0.709). */
  val Alpha: Double = 0.709

  /** Bit length of the post-bucket hash remainder: polyHash < 2^30,
    * so h div 64 < 2^24. */
  val WBits: Int = 24

  private def bitLenCase(w: String): Column = {
    // bitlength(w) as a nested CASE over the 24 possible widths — pure
    // integer compares, portable to any SQL engine. Ascending fold so
    // the WIDEST width check lands outermost (the conditions overlap:
    // w ≥ 2^23 implies w ≥ 1, so nesting order is load-bearing).
    (1 to WBits).foldLeft(lit(0)) { (acc, k) =>
      when(expr(w) >= (1L << (k - 1)), lit(k)).otherwise(acc)
    }
  }

  /** SQL fragment mirroring [[bitLenCase]]. */
  private def bitLenSql(w: String): String =
    "CASE " + (WBits to 1 by -1).map { k =>
      s"WHEN $w >= ${1L << (k - 1)} THEN $k"
    }.mkString(" ") + " ELSE 0 END"

  /** Post-hash scatter: polyHash of a SHORT string is range-concentrated
    * (a k-char hash is < 31^k·maxCp, nowhere near uniform on [0, P)),
    * and HLL reads rho from raw bit positions — so scatter with an
    * invertible affine map mod P first (distinct stays distinct,
    * buckets and leading-zero ranks become ~uniform). */
  val ScatterA: Long = Hashing.MinHashA(1)
  val ScatterB: Long = Hashing.MinHashB(1)

  /** HLL distinct estimate of a string column. Output: one row
    * `(n_registers, est)`. */
  def hllDistinct(df: DataFrame, valueCol: String): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val regs = df
      .select(expr(
        s"(graft_polyhash(cast($valueCol as string)) * ${ScatterA}L + ${ScatterB}L) % ${Hashing.P}L")
        .as("h"))
      .filter(col("h").isNotNull)
      .select((col("h") % M).as("bucket"), expr(s"h div $M").as("w"))
      .select(col("bucket"), (lit(WBits) - bitLenCase("w") + 1).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
    // Σ 2^-r over the m registers; buckets never hit contribute 2^0 = 1
    // (m − hit count of them). power-of-two doubles and the ordered sum
    // keep the arithmetic exact cross-engine.
    regs
      .select(expr("cast(power(2.0D, -cast(r as double)) as double)").as("t"))
      .agg(count(lit(1)).as("hit"), sum(col("t")).as("s"))
      .select(lit(M.toLong).as("n_registers"),
        (lit(Alpha * M * M) / (col("s") + (lit(M) - col("hit")).cast("double")))
          .as("est"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // distinct suppliers-per-part key space on lineitem: ~20k-80k
    // distinct values at test SFs — squarely the raw-HLL regime n >> 64
    "x01_hll_distinct" -> ((s, d) =>
      hllDistinct(Tables.lineitem(s, d).select(col("l_partkey")), "l_partkey")))

  def oracle: Map[String, String] = Map(
    "x01_hll_distinct" -> {
      val ph = Hashing.polyHashSql("CAST(l_partkey AS VARCHAR)")
      s"""WITH h AS (SELECT (($ph) * $ScatterA + $ScatterB) % ${Hashing.P} AS h FROM lineitem),
         |b AS (SELECT h % $M AS bucket, h // $M AS w FROM h WHERE h IS NOT NULL),
         |r AS (SELECT bucket, max($WBits - (${bitLenSql("w")}) + 1) AS r
         |      FROM b GROUP BY bucket),
         |s AS (SELECT count(*) AS hit, sum(power(2.0, -r)) AS s FROM r)
         |SELECT ${M}::BIGINT AS n_registers,
         |  ${Alpha * M * M} / (s + ($M - hit)::DOUBLE) AS est
         |FROM s""".stripMargin
    })
}
