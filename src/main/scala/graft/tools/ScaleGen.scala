package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the harness testdata — reads one sf dir
  * and writes an N× copy with consistent foreign keys, so scaling
  * behaviour can be probed beyond the largest driver-generated sf
  * (BENCH_SCALE.md; VERDICT r7 item 5).
  *
  * Scaling model ("more users, same window", the way real corpora grow):
  *  - fixed dims `region`/`nation` are copied unchanged (TPC-H keeps
  *    them constant across sf for the same reason);
  *  - every int64 entity key (custkey, orderkey, partkey, suppkey,
  *    event/user ids, doc/vec ids) is shifted by `copy * 1e9` so the N
  *    copies are disjoint but every FK still joins to its parent copy —
  *    join fan-outs, group sizes and key cardinalities all scale
  *    linearly;
  *  - `documents.text` is decorrelated per copy at BOTH seams (copy 0
  *    stays byte-identical):
  *    (a) a per-copy ROTATION CIPHER over the letters a–u — the exact
  *    alphabet the CJK fixture translate maps to ideographs — so after
  *    the downstream `cjkFixture`/`scriptTokens` derivation, copies
  *    share no char n-grams either. This closes the r15 verdict's
  *    probe-fidelity hole: the old token SUFFIX decorrelated word
  *    shingles but left the long CJK char runs between suffixes
  *    identical across copies, inflating char-gram pair density ~4000×
  *    (BENCH_SCALE.md r15) — the sf1 CJK rows measured the generator,
  *    not the operators. A cipher keyed only on the copy is a
  *    BIJECTION applied uniformly within each copy, so every intra-copy
  *    shingle equality (word- or char-level) is preserved EXACTLY —
  *    planted near-dups stay near-dups at the same Jaccard — while
  *    cross-copy windows differ in every rotated char; and because it
  *    permutes WITHIN a–u, the fixture maps exactly the same positions
  *    to CJK, so length, script mix, and df SHAPE are all preserved.
  *    True pair density then scales linearly (N× the sf0.1 pairs),
  *    like a real corpus of independent shards. Guaranteed distinct
  *    for factor ≤ 21 rotations (the probe uses 10);
  *    (b) the per-copy `_cN` token suffix, kept for the tokens the
  *    cipher cannot separate (pure v–z/digit tokens) and for exact-dup
  *    word-level disjointness. Without decorrelation, every doc would
  *    be an exact dup of its N-1 siblings: LSH buckets would grow N×,
  *    candidate pairs N²×, and the probe would report a quadratic
  *    blowup that is an artifact of naive replication, not of the
  *    operators under test. Deliberate trade-off: per-copy vocabularies
  *    are disjoint, so a QUERY term's posting lists stay copy-0-sized
  *    rather than growing N× — search-entry ratios measure the corpus
  *    scan + index build (the parts that scale), not posting growth;
  *  - `embeddings.embedding` gets a small deterministic per-element
  *    jitter (±0.05, hash-keyed) on copies ≥1 — same reasoning as text:
  *    identical vectors across copies would put N duplicates in every
  *    cosine bucket. Magnitude is small enough that the overall
  *    distribution (norms, cluster structure) is preserved;
  *  - `events.ts` is NOT shifted: N× the users inside the same time
  *    window, so windows/sessionization see N× keys with unchanged
  *    per-key series — the realistic growth mode for an event stream.
  *
  * Output is timing-grade, not oracle-grade: correctness is pinned at
  * sf0.01 by the DuckDB oracles; this data exists to measure how the
  * plans scale.
  *
  * Usage: ScaleGen SRC_DIR DST_DIR FACTOR
  */
object ScaleGen {
  private val KeyOffset = 1000000000L

  /** Cross-join the table with `range(copies)` (single scan, stays in
    * whole-stage codegen) and shift the named long keys per copy. */
  private def replicate(df: DataFrame, copies: Int, keys: Seq[String]): DataFrame = {
    val withCopy = df.crossJoin(
      df.sparkSession.range(copies.toLong).toDF("_copy"))
    keys.foldLeft(withCopy) { (acc, k) =>
      acc.withColumn(k, col(k) + col("_copy") * lit(KeyOffset))
    }
  }

  private def write(df: DataFrame, dst: String, name: String, parts: Int): Unit =
    df.repartition(parts)
      .write.mode("overwrite").parquet(s"$dst/$name.parquet")

  /** Per-copy disjoint token suffix; copy 0 byte-identical. */
  private def suffixTokens(text: Column, copy: Column): Column =
    when(copy === 0, text).otherwise(
      concat_ws(" ", transform(split(text, " "),
        t => when(length(t) === 0, t)
          .otherwise(concat(t, lit("_c"), copy.cast("string"))))))

  /** The CJK-fixture alphabet (a–u, both cases — the corpus is
    * lowercase, upper kept for safety since `cjkFixture` lowers
    * first). Rotating WITHIN this set keeps the fixture translate
    * total on the same positions. */
  private val RotAlphabet = "abcdefghijklmnopqrstu"
  private def rotTo(k: Int): String = {
    val n = RotAlphabet.length
    val lo = RotAlphabet.drop(k % n) + RotAlphabet.take(k % n)
    lo + lo.toUpperCase
  }
  private val RotFrom = RotAlphabet + RotAlphabet.toUpperCase

  /** Per-copy rotation cipher over the fixture alphabet — one
    * `translate` per copy value, selected by a when-chain (factor
    * branches, all codegen'd maps). Copy 0 is the identity.
    *
    * Rotations repeat with period |alphabet| = 21 — `rotTo(21)` wraps
    * to `rotTo(0)`, the identity, so copy 21 would get copy 0's
    * cipher — which would silently re-correlate char runs between
    * those copies, the exact density inflation the cipher exists to
    * remove. An oversized factor therefore FAILS here instead of
    * quietly corrupting probe fidelity; a >21× probe needs a second
    * per-copy permutation composed in, not a bigger loop. */
  private def rotateLetters(text: Column, copy: Column,
                            copies: Int): Column = {
    require(copies <= RotAlphabet.length,
      s"rotateLetters supports at most ${RotAlphabet.length} copies " +
        s"(got $copies): rotation ciphers repeat with period " +
        s"${RotAlphabet.length}, re-correlating cross-copy char n-grams")
    (1 until copies).foldLeft(when(copy === 0, text)) { (acc, k) =>
      acc.when(copy === k, translate(text, RotFrom, rotTo(k)))
    }.otherwise(text)
  }

  /** Deterministic per-copy jitter: hash(vec_id, pos, copy) → ±0.05. */
  private def jitter(emb: Column, vecId: Column, copy: Column): Column =
    when(copy === 0, emb).otherwise(
      transform(emb, (x, j) =>
        (x + (pmod(xxhash64(vecId, j, copy), lit(101L)) - lit(50L))
          .cast("double") / lit(1000.0)).cast("float")))

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def in(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    // fixed dims: unchanged
    write(in("region"), dst, "region", 1)
    write(in("nation"), dst, "nation", 1)
    write(replicate(in("customer"), factor, Seq("c_custkey"))
      .drop("_copy"), dst, "customer", factor)
    write(replicate(in("supplier"), factor, Seq("s_suppkey"))
      .drop("_copy"), dst, "supplier", 1)
    write(replicate(in("part"), factor, Seq("p_partkey"))
      .drop("_copy"), dst, "part", factor)
    write(replicate(in("orders"), factor, Seq("o_orderkey", "o_custkey"))
      .drop("_copy"), dst, "orders", factor)
    write(replicate(in("lineitem"), factor,
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
      .drop("_copy"), dst, "lineitem", 2 * factor)
    write(replicate(in("events"), factor, Seq("event_id", "user_id"))
      .drop("_copy"), dst, "events", factor)
    val docs = replicate(in("documents"), factor, Seq("doc_id"))
    write(docs
      .withColumn("text", suffixTokens(
        rotateLetters(col("text"), col("_copy"), factor), col("_copy")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_copy"), dst, "documents", factor)
    val embs = replicate(in("embeddings"), factor, Seq("vec_id"))
    write(embs
      .withColumn("embedding",
        jitter(col("embedding"), col("vec_id"), col("_copy")))
      .drop("_copy"), dst, "embeddings", factor)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen SRC_DIR DST_DIR FACTOR")
    val spark = graft.Conf.localSession(graft.Conf.Env.cpus(8))
    try run(spark, args(0), args(1), args(2).toInt)
    finally spark.stop()
  }
}
