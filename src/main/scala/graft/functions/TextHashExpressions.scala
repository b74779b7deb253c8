package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native token-window hashing for the dedup operators
  * ([[graft.ops.Dedup]]): shingle hashes, MinHash signatures, and SimHash
  * — each a single map-side pass over the token array, replacing chains
  * of interpreted higher-order functions (`transform`/`concat_ws`/
  * `array_distinct`/`reverse`) that materialized every shingle as a
  * string before hashing it.
  *
  * Why this matters at scale: the HOF form made the FIRST stage of every
  * dedup query — the stage that reads the corpus, before any shuffle can
  * spread work — allocate O(shingles) strings and evaluate several
  * interpreted closures per shingle (measured 4.8s of a 6.5s d02 run at
  * sf0.1 in one scan task). These expressions compose the shingle hash
  * from per-token partial hashes instead (Rabin–Karp style): for token t
  * with code-point-wise polynomial hash h(t) and length L, the hash of
  * `prefix ⧺ t` is `acc·31^L + h(t) (mod P)`, so each token's
  * `(hFwd, hRev, 31^len mod P)` is computed ONCE and every window folds
  * in O(window) multiplications — no string concatenation, no
  * intermediate arrays. Values are bit-identical to the string form, so
  * the DuckDB oracles are unchanged.
  *
  * All three participate in whole-stage codegen via a static helper call
  * (same pattern as [[PolyHash]]).
  */
object TextHash { // public: whole-stage generated code calls into it
  val P: Long = graft.ops.Hashing.P
  /** Multiplier combining (fwd, rev) into one ~60-bit key; mirrored in
    * the d02 oracle SQL. fwd,rev < P < 2^30 ⇒ fwd·C + rev < 2^60. */
  val C: Long = 1000000009L
  private val Space: Long = 32L // code point of ' ', the join separator

  /** Per-token partials over `tokens[from .. until)`: forward hash,
    * reversed-string hash, and 31^len mod P. A null token is marked by
    * pow = -1 (concat_ws semantics: it contributes neither chars nor a
    * separator). */
  private final class Pre(val hf: Array[Long], val hr: Array[Long], val pow: Array[Long])

  private def precompute(tokens: ArrayData, needRev: Boolean): Pre = {
    val m = tokens.numElements()
    val hf = new Array[Long](m)
    val hr = if (needRev) new Array[Long](m) else null
    val pow = new Array[Long](m)
    var i = 0
    while (i < m) {
      if (tokens.isNullAt(i)) {
        pow(i) = -1L
      } else {
        val s = tokens.getUTF8String(i).toString
        var f = 0L
        var p = 1L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          f = (f * 31 + cp) % P
          p = (p * 31) % P
          j += Character.charCount(cp)
        }
        hf(i) = f
        pow(i) = p
        if (needRev) {
          var r = 0L
          var j2 = s.length
          while (j2 > 0) {
            val cp = s.codePointBefore(j2)
            r = (r * 31 + cp) % P
            j2 -= Character.charCount(cp)
          }
          hr(i) = r
        }
      }
      i += 1
    }
    new Pre(hf, hr, pow)
  }

  /** Fold the window `[from, from+n)` forward (rev = false) or reversed
    * (rev = true), skipping null tokens, separators only between kept
    * tokens — exactly `concat_ws(' ', ...)` then [[PolyHash.hash]]. */
  private def windowHash(pre: Pre, from: Int, n: Int, rev: Boolean): Long = {
    var acc = 0L
    var first = true
    var k = 0
    while (k < n) {
      val j = if (rev) from + n - 1 - k else from + k
      if (pre.pow(j) >= 0) {
        if (!first) acc = (acc * 31 + Space) % P
        val h = if (rev) pre.hr(j) else pre.hf(j)
        acc = (acc * pre.pow(j) + h) % P
        first = false
      }
      k += 1
    }
    acc
  }

  /** Distinct combined (or forward-only) hashes of all n-token shingles,
    * sorted ascending. Exactly the hash set of
    * `array_distinct(transform(sequence(0, size-n), i ->
    * concat_ws(' ', tk[i..i+n-1])))` — distinct-by-hash equals
    * distinct-by-string up to a ~2^-60 per-document collision (for the
    * combined key; the forward-only variant is used where downstream
    * aggregation is duplicate-insensitive). */
  def shingleHashes(tokens: ArrayData, n: Int, combined: Boolean): ArrayData = {
    val m = tokens.numElements()
    val wins = m - n + 1
    if (wins <= 0) return new GenericArrayData(Array.emptyLongArray)
    val pre = precompute(tokens, needRev = combined)
    val out = new Array[Long](wins)
    var i = 0
    while (i < wins) {
      val f = windowHash(pre, i, n, rev = false)
      out(i) = if (combined) f * C + windowHash(pre, i, n, rev = true) else f
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place unique over the sorted array
    var w = 1
    var r = 1
    while (r < wins) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** The 16 MinHash values `min_h((a_i·h + b_i) mod P)` over the doc's
    * shingle forward hashes. Min is duplicate-insensitive, so iterating
    * raw windows equals iterating the distinct shingle set — the value
    * the oracle computes from `SELECT DISTINCT doc_id, shingle`. */
  def minhash(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val wins = m - n + 1
    val a = graft.ops.Hashing.MinHashA
    val b = graft.ops.Hashing.MinHashB
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    if (wins <= 0) return new GenericArrayData(mins)
    val pre = precompute(tokens, needRev = false)
    var i = 0
    while (i < wins) {
      val h = windowHash(pre, i, n, rev = false)
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Intersection COUNT of two SORTED DISTINCT long arrays — one
    * two-pointer merge pass, zero allocation. Replaces
    * `size(array_intersect(a, b))` on the dedup verify paths, where
    * Spark's generic set-intersection builds a hash set from one side
    * and materializes the common elements as a new array per pair just
    * to take its length; the verify stage evaluates this once per band
    * CANDIDATE, so it sits directly on the pair-scoring hot path.
    * Correct ONLY for sorted inputs — every caller's arrays come from
    * [[shingleHashes]] (sorted distinct by construction; parquet and
    * `array_except` both preserve order). */
  def sortedInterCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** 32-bit SimHash over token OCCURRENCES: each occurrence of a token
    * with hash h moves bit-counter j by +1 if bit j of h is set, else
    * −1 — linear in occurrences, so it equals the reference shape
    * `sum over distinct tokens of cnt·(±1)` exactly. A null token
    * matches the relational form's null-hash semantics (`when(bit = 1)`
    * is null ⇒ otherwise branch): −1 on every bit. */
  def simhash(tokens: ArrayData): Long = {
    val s = new Array[Long](32)
    val m = tokens.numElements()
    var i = 0
    while (i < m) {
      if (tokens.isNullAt(i)) {
        var j = 0
        while (j < 32) { s(j) -= 1; j += 1 }
      } else {
        val h = PolyHash.hash(tokens.getUTF8String(i).toString)
        var j = 0
        while (j < 32) {
          s(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (s(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

private[functions] trait TokenArrayExpression extends UnaryExpression {
  override def dataType: DataType
  override def nullIntolerant: Boolean = true
  /** Window width, where applicable; 1 for width-free expressions. */
  def windowN: Int = 1
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if windowN < 1 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n >= 1, got $windowN")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> column, got ${t.sql}")
  }
}

/** `graft_shingle_hashes(tk, n, combined)` — sorted distinct hashes of
  * the n-token shingles of a token array; `combined = 1` emits the
  * ~60-bit (fwd·C + rev) key used by the Jaccard bucket shuffle,
  * `combined = 0` the plain forward [[PolyHash]]. */
case class ShingleHashes(child: Expression, n: Int, combined: Boolean)
    extends TokenArrayExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override def windowN: Int = n

  override def nullSafeEval(input: Any): Any =
    TextHash.shingleHashes(input.asInstanceOf[ArrayData], n, combined)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.shingleHashes($c, $n, $combined)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_minhash(tk, n)` — the 16-element MinHash signature of the
  * n-token shingle set, computed map-side in one pass (no token-level
  * shuffle; the LSH band shuffle then carries 4 keys per doc). */
case class MinHashSig(child: Expression, n: Int)
    extends TokenArrayExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def windowN: Int = n

  override def nullSafeEval(input: Any): Any =
    TextHash.minhash(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_inter_count(a, b)` — intersection count of two sorted
  * distinct long arrays ([[TextHash.sortedInterCount]]): the MinHash
  * verify stage's inner loop as one codegen'd two-pointer merge. */
case class SortedInterCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_inter_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> columns, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHash.sortedInterCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.sortedInterCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_simhash(tk)` — 32-bit SimHash of a token array as one map-side
  * expression: the whole d04 operator with ZERO shuffles. */
case class SimHash(child: Expression) extends TokenArrayExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    TextHash.simhash(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
