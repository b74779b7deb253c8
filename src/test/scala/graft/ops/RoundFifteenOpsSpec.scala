package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Round-15 additions: the r08 CJK BM25 proof artifacts (analyzer
  * equality between the driver-side query analyzer and the column-side
  * index-term derivation), the width/punctuation fold composed into the
  * script tokenizer seam, and the CJK Extension A repertoire widening.
  */
class RoundFifteenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def colTerms(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("t").select(Search.cjkIndexTerms(col("t")))
      .head.getSeq[String](0)
  }
  private def toks(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextOps.scriptTokens(col("t")))
      .head.getSeq[String](0)
  }

  test("r08 analyzer equality: cjkAnalyze(s) ≡ cjkIndexTerms column on " +
    "crafted mixed-script / full-width / Ext-A / punctuation strings") {
    val crafted = Seq(
      "",                       // empty
      "plain latin words",      // no CJK at all
      "一二三",                  // unsegmented han
      "ab一cd 二ef",             // mixed runs
      "カナがな漢字",             // kana + kanji adjacency
      "ＡＢＣ１２３",             // full-width Latin/digit run
      "中ＡＢ外",                // full-width run embedded in CJK
      "Ａ　Ｂ",                  // ideographic space separates runs
      "句。読、引“用”『x』",       // CJK punctuation foldings
      "㐀㑇㠀",                  // CJK Extension A (U+3400 block)
      "㐀一カ",                  // Ext-A + Unified + kana adjacency
      "大左一中百 右山五中y 六一大小") // the fixture-query shapes
    crafted.foreach { s =>
      assert(Search.cjkAnalyze(s) == colTerms(s),
        s"analyzer mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("bigram rule: adjacent CJK-CJK pairs only, Ext-A counts as CJK") {
    assert(colTerms("一二ab三") ==
      Seq("一", "二", "ab", "三", "一二"))
    assert(colTerms("㐀㐁") == Seq("㐀", "㐁", "㐀㐁"),
      "Extension A chars must tokenize singly AND form bigrams")
    assert(colTerms("ab cd") == Seq("ab", "cd"),
      "no bigrams across non-CJK tokens")
  }

  test("fold at the tokenizer seam: full-width runs tokenize as their " +
    "ASCII twins, ideographic space separates runs") {
    assert(toks("ＡＢＣ１２３") == Seq("ABC123"))
    assert(toks("Ａ　Ｂ") == Seq("A", "B"),
      "U+3000 must fold to a run separator")
    assert(toks("中。外") == Seq("中", ".", "外"),
      "ideographic full stop folds to ASCII '.'")
    // t24 over a full-width doc: two word-like runs, zero CJK chars
    import spark.implicits._
    val r = TextOps.withScriptTokenCounts(
      Seq((1L, "ＡＢ　ＣＤ")).toDF("doc_id", "text"), "text")
      .select("n_tokens", "n_cjk").head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 0L)))
  }

  test("Ext-A chars are CJK for the t24/t25 counters") {
    import spark.implicits._
    val extA = (0 until 60).map(i => (0x3400 + i).toChar).mkString
    val r = TextOps.scriptGopherFilter(
      Seq((1L, extA)).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_tokens", "n_cjk", "cjk_ratio_q6", "keep").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)) ==
      ((60L, 60L, 1000000L, true)),
      "an Ext-A document must pass the CJK-share screen, not read as " +
        "one opaque non-CJK run")
  }

  test("d22 folds the reference's CJK punctuation: 。、【】 curly quotes " +
    "unify with their ASCII twins") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a. b, [c] \"d\" 'e'"),
      (2L, "a。 b、 【c】 “d” ‘e’")).toDF("doc_id", "text")
    val sigs = Dedup.exactDedupWidthFolded(docs, "doc_id", "text").collect()
    assert(sigs.length == 1 && sigs.head.getLong(2) == 2L,
      "punctuation-variant twins must hash together under d22")
  }

  test("CjkQuery: fixture-translated DefaultQuery analyzed to unigrams " +
    "+ CJK bigrams, Latin tail kept word-like") {
    val q = Search.CjkQuery.toSet
    // "spark" → 大左一中百: five unigrams, four bigrams
    assert(Set("大", "左", "一", "中", "百", "大左", "左一", "一中", "中百")
      .subsetOf(q))
    // "query" → 右山五中y: 'y' stays a Latin run, no 中y bigram
    assert(q.contains("y") && !q.contains("中y"))
  }

  test("tokenize-once refactor is a no-op on results: bm25 over the " +
    "array column equals bm25 over the concat_ws text round-trip") {
    import spark.implicits._
    val docs = Seq(
      (1L, "大左一中百大左 右山五中y"),
      (2L, "六一大小 六一大小 right"),
      (3L, "中 left alone"),
      (4L, "no cjk at all here")).toDF("doc_id", "text")
    val terms = docs.select(col("doc_id"),
      Search.cjkIndexTerms(col("text")).as("terms"))
    val viaArrays = Search.bm25TopKTokens(terms, "doc_id", "terms",
      terms = Search.CjkQuery).collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaText = Search.bm25TopK(
      terms.select(col("doc_id"), concat_ws(" ", col("terms")).as("text")),
      "doc_id", "text", terms = Search.CjkQuery)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaArrays.toSeq == viaText.toSeq && viaArrays.nonEmpty)
  }

  test("r09: the persisted CJK index served back equals the one-shot " +
    "r08 ranking bit-for-bit") {
    import spark.implicits._
    val docs = Seq(
      (1L, "大左一中百大左 右山五中y"),
      (2L, "六一大小 六一大小 extra"),
      (3L, "中右山 middle run"),
      (4L, "一二三四五"),
      (5L, "no cjk at all")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      Search.cjkIndexTerms(col("text")).as("terms"))
    val dir = java.nio.file.Files.createTempDirectory("r09spec").toString
    val (p, l, st) = Search.bm25BuildIndexTokens(toks, "doc_id", "terms")
    Search.bm25WriteIndex(p, l, st, dir)
    val (lp, ll, ls) = Search.bm25LoadIndex(spark, dir)
    val served = Search.bm25QueryIndex(lp, ll, ls, terms = Search.CjkQuery)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val oneShot = Search.bm25TopKTokens(toks, "doc_id", "terms",
      terms = Search.CjkQuery)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(served.toSeq == oneShot.toSeq && served.nonEmpty)
  }

  test("r10 CJK phrase: consecutive chars only, interruptions break " +
    "adjacency, occurrences counted") {
    import spark.implicits._
    // CjkPhrase = fixture("fast") = 六一大小
    assert(Search.CjkPhrase == Seq("六", "一", "大", "小"))
    val docs = Seq(
      (1L, "前六一大小後"),      // one occurrence, embedded
      (2L, "六一大小六一大小"),  // two occurrences
      (3L, "六一大 小"),         // whitespace is NOT a token: positions
                                 //  are token ordinals, so the chars
                                 //  stay adjacent (standard positional-
                                 //  index semantics)
      (4L, "六一ab大小"),        // a Latin RUN occupies a position and
                                 //  breaks the chain
      (5L, "六一大"),            // prefix only
      (6L, "小大一六"))          // right chars, wrong order
      .toDF("doc_id", "text")
    val got = Search.cjkPhraseMatch(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("p11 composition: near-dup loser dropped BEFORE the gate, short " +
    "and low-CJK docs gated, survivors split-assigned") {
    import spark.implicits._
    val base = (1 to 60).map(i => TextOps.CjkTo(i % 21)).mkString
    val docs = Seq(
      (1L, base),            // keeper of the dup pair (min id), passes gate
      (2L, base + "一"),      // near-dup of 1 → dropped by dedup
      (3L, "一二三"),          // unique but too short → gated
      (4L, base.reverse),    // unique, 60 CJK tokens → kept
      (5L, ("ab " * 60).trim)) // unique, 60 tokens but zero CJK → gated
      .toDF("doc_id", "text")
    val labels = Clusters.connectedComponents(
      Dedup.cjkNearDupPairs(docs, "doc_id", "text", 0.6)
        .select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
    val kept = Clusters.dedupCorpusFromComponents(docs, "doc_id", labels)
    val good = kept.join(
      TextOps.scriptGopherFilter(kept, "doc_id", "text")
        .filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi")
    val out = Sampling.splitAssign(good, "doc_id", Sampling.DefaultSplits)
      .select(col("doc_id"), col("split")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(out.forall(r =>
      Sampling.DefaultSplits.map(_._1).contains(r.getString(1))))
  }

  test("r11 fusion: fused set = union of the two CJK retrievers' " +
    "top-k lists, surfaced-by-both docs outrank single-list docs " +
    "at equal ranks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "大左一中百大左 右山五中y"),
      (2L, "六一大小 六一大小 extra"),
      (3L, "中右山 middle run"),
      (4L, "一二三四五"),
      (5L, "no cjk at all")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      Search.cjkIndexTerms(col("text")).as("terms"))
    val a = Search.bm25TopKTokens(toks, "doc_id", "terms",
      terms = Search.CjkQuery)
    val b = Search.tfidfCosineTopKTokens(toks, "doc_id", "terms",
      terms = Search.CjkQuery)
    val fused = Search.rrfFuse(a, b, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = (a.collect().map(_.getLong(0)) ++
      b.collect().map(_.getLong(0))).toSet
    assert(fused.keySet == ids && ids.nonEmpty)
    assert(fused.values.forall(_ > 0))
  }

  test("CJK benchmark leakage that d09 MISSES and d23 CATCHES") {
    import spark.implicits._
    // an unsegmented benchmark doc quoted verbatim inside a training
    // doc: word-level sees each doc as ONE token (no 3-gram exists,
    // the tripwire is blind); char-level shares every 5-gram of the
    // quoted span
    val benchText = "山川日月水火大小上下中左右"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val train = Seq(
      (1L, "前置" + benchText + "後置"),
      (2L, "完全無関係な別の文書内容です")).toDF("doc_id", "text")
    assert(Dedup.contaminationHits(train, "doc_id", "text", bench, "text")
      .isEmpty, "the word-level tripwire must be blind on unsegmented text")
    val hits = Dedup.cjkContaminationHits(train, "doc_id", "text",
      bench, "text").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(1L) && hits(1L) >= (benchText.length - 4).toLong,
      s"char-gram tripwire must flag the quoting doc: $hits")
  }
}
