package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Round-14 additions: CJK/unsegmented-script support (the script-aware
  * tokenizer behind d20/t24), the K-keyed Pocock boundary for e27, and
  * the v14 headline drift verdict. */
class RoundFourteenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("CJK constants survive source encoding: 21-ideograph alphabet, " +
    "BMP range endpoints") {
    // the fixture alphabet is load-bearing in BOTH engines' oracle
    // text — a compiler charset regression would mangle it silently
    assert(TextOps.CjkFrom.length == 22 && TextOps.CjkFrom.last == ' ')
    assert(TextOps.CjkTo.length == 21,
      "each CJK char must be ONE UTF-16 code unit (BMP)")
    assert(TextOps.CjkTo.head == 0x4E00.toChar) // 一
    assert(TextOps.CjkTo.forall(c => c >= 0x4E00.toChar && c <= 0x9FFF.toChar))
    // [x-x x-x x-x x-x x-x]: 10 literal chars (jamo, kana, Ext-A,
    // Unified, Hangul syllables) + brackets + 5 dashes
    assert(TextOps.CjkCharClass.length == 17)
    assert(TextOps.CjkHangulTo.length == 21 &&
      TextOps.CjkHangulTo.toSet.size == 21,
      "each Hangul fixture char must be ONE distinct BMP code unit")
    assert(TextOps.CjkHangulTo.forall(c =>
      c >= 0xAC00.toChar && c <= 0xD7AF.toChar))
  }

  test("cjkFixture maps letters to ideographs and DELETES spaces") {
    import spark.implicits._
    val out = Seq("the part").toDF("text")
      .select(TextOps.cjkFixture(col("text"))).head.getString(0)
    val expected = "the part".filter(_ != ' ')
      .map(c => TextOps.CjkTo(TextOps.CjkFrom.indexOf(c))).mkString
    assert(out == expected && !out.contains(' '))
  }

  test("scriptTokens: CJK chars are single tokens, Latin/digit runs stay " +
    "word-like, kana included") {
    import spark.implicits._
    def toks(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextOps.scriptTokens(col("t")))
        .head.getSeq[String](0)
    assert(toks("ab一cd 二ef") == Seq("ab", "一", "cd", "二", "ef"))
    assert(toks("一二三") == Seq("一", "二", "三"))
    assert(toks("カナがな") == Seq("カ", "ナ", "が", "な"))
    assert(toks("一23四") == Seq("一", "23", "四"))
    assert(toks("") == Seq.empty)
  }

  test("t24 counts: crafted mixed-script doc") {
    import spark.implicits._
    val r = TextOps.withScriptTokenCounts(
      Seq((1L, "ab一cd 二ef")).toDF("doc_id", "text"), "text")
      .select("n_tokens", "n_cjk", "n_other", "cjk_ratio_q6").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 2L, 3L, 400000L)))
  }

  test("t26 script language ID: every branch on crafted text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "山川日月水火"), // han only → zh
      (2L, "山はきれいです"), // kanji + kana → ja
      (3L, "the value of a table"), // stopword hits → en
      (4L, "xyz qqq"), // no script signal at all → unk
      (5L, "カタカナです"), // kana-only (no kanji) → ja, not zh
      (6L, "mostly latin words with one 山 char in the middle"), // → en
      (7L, "한국어 텍스트입니다"), // Hangul syllables → ko, not zh
      (8L, "한자 混用 문장이다"), // Korean with embedded hanja → ko
      (9L, "한")) // decomposed jamo → ko
      .toDF("doc_id", "text")
    val got = TextOps.scriptLangId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(got == Map(1L -> "zh", 2L -> "ja", 3L -> "en", 4L -> "unk",
      5L -> "ja", 6L -> "en", 7L -> "ko", 8L -> "ko", 9L -> "ko"))
  }

  test("t25 script gate: token bounds and CJK-share screen, crafted " +
    "verdicts") {
    import spark.implicits._
    val goodCjk = (1 to 60).map(i => TextOps.CjkTo(i % 21)).mkString
    val docs = Seq(
      (1L, goodCjk), // 60 CJK tokens, ratio 1.0 → keep
      (2L, "latin only text with no ideographs at all " * 3), // ratio 0
      (3L, "一二三"), // 3 tokens, under the floor
      (4L, "")) // token-free: NULL ratio must gate FALSE, not null
      .toDF("doc_id", "text")
    val got = TextOps.scriptGopherFilter(docs, "doc_id", "text",
        minTokens = 50L, maxTokens = 400L, minCjkRatioQ6 = 500000L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // mixed text right AT the ratio boundary: 30 CJK + 30 Latin runs
    // interleaved = ratio exactly 500000 → kept
    val mixed = (1 to 30).map(i => TextOps.CjkTo(i % 21) + " ab ").mkString
    val m = TextOps.scriptGopherFilter(
      Seq((9L, mixed)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(m.getLong(3) == 500000L && m.getBoolean(4))
  }

  test("a Chinese duplicate pair that d02 MISSES and d20 CATCHES") {
    import spark.implicits._
    // unsegmented near-identical pair: doc 2 appends one ideograph —
    // char-5-gram Jaccard 16/17 ≈ 0.94, word-level sees ONE token each
    val a = "山川日月水火大小上下中左右千万百十九八七"
    val b = a + "一"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    // the word-level operator finds nothing even at a floor threshold:
    // each doc is a single split-on-space token, below the 3-token
    // shingle minimum
    assert(Dedup.jaccardPairs(docs, "doc_id", "text", 0.1).isEmpty,
      "word-level Jaccard must no-op on unsegmented text")
    assert(Dedup.minhashVerifiedPairs(docs, "doc_id", "text", 0.1).isEmpty,
      "word-level MinHash must no-op on unsegmented text")
    val caught = Dedup.cjkNearDupPairs(docs, "doc_id", "text", 0.6).collect()
    assert(caught.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)), "char-shingle MinHash must catch the pair")
    val row = caught.head
    assert(row.getLong(2) == 16L) // inter: a's 16 windows all in b
    assert(math.abs(row.getDouble(3) - 16.0 / 17.0) < 1e-12)
  }

  test("band-bucket cap: an over-cap bucket is dropped, under-cap pairs " +
    "survive") {
    import spark.implicits._
    // 5 IDENTICAL docs band-agree everywhere: cap 3 drops every bucket
    // (all have 5 members), cap 10 keeps the full clique
    val clones = (1L to 5L).map(i => (i, "山川日月水火大小上下中左右"))
      .toDF("doc_id", "text")
    assert(Dedup.cjkNearDupPairs(clones, "doc_id", "text", 0.6,
      maxBandDocs = 3).isEmpty)
    assert(Dedup.cjkNearDupPairs(clones, "doc_id", "text", 0.6,
      maxBandDocs = 10).count() == 10L) // C(5,2)
  }

  test("d20 harness entry ⊆ true char-gram near-dups and is non-empty " +
    "at sf0.001") {
    val got = graft.SparkEntry.queries("d20_cjk_neardup")(spark, sf).collect()
    assert(got.nonEmpty, "planted near-dups must survive the fixture")
    assert(got.forall(_.getDouble(3) >= 0.6))
    assert(got.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("e27 at a second K gates on the MATCHING Pocock boundary") {
    val events = Tables.events(spark, sf)
    val convertIf = col("event_type") === "purchase" &&
      col("value") >= Events.ConvertValue
    val k2 = Events.sequentialAbReadout(events, "user_id", "ts", convertIf,
      looks = 2).collect().sortBy(_.getLong(0))
    assert(k2.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    k2.foreach { r =>
      val z = Option(r.get(5)).map(_ => r.getLong(5))
      val expect = z.map(v => math.abs(v) >= Events.PocockZq6(2))
      assert(Option(r.get(6)).map(_ => r.getBoolean(6)) == expect,
        s"look ${r.getLong(0)}: reject must compare against the K=2 " +
          s"boundary ${Events.PocockZq6(2)}")
    }
    // the FINAL look is the fixed-horizon readout whatever K is: its
    // z equals K=4's final look (both bounds are exactly max ts)
    val k4Last = Events.sequentialAbReadout(events, "user_id", "ts",
      convertIf).collect().maxBy(_.getLong(0))
    val k2Last = k2.last
    assert(k2Last.getLong(5) == k4Last.getLong(5))
    // an untabulated K fails loudly instead of gating on the wrong c
    val e = intercept[IllegalArgumentException] {
      Events.sequentialAbReadout(events, "user_id", "ts", convertIf,
        looks = 7)
    }
    assert(e.getMessage.contains("Pocock"))
  }

  test("v14 verdict = sum of v13's per-bin rows, banded by the 0.1/0.25 " +
    "thresholds") {
    val events = Tables.events(spark, sf)
    val isRef = col("user_id") % 2 === 0
    val perBin = Profile.driftPsi(events, "value", isRef)
      .agg(sum(col("psi_q6"))).head.getLong(0)
    val v = Profile.driftPsiVerdict(events, "value", isRef).collect()
    assert(v.length == 1)
    assert(v.head.getLong(0) == perBin)
    val expectBand =
      if (perBin < Profile.PsiStableQ6) "stable"
      else if (perBin <= Profile.PsiDriftedQ6) "shifting"
      else "drifted"
    assert(v.head.getString(1) == expectBand)
  }

  test("d22 width fold unifies full-width retypings that d14 cannot") {
    import spark.implicits._
    val fw = new String(Array(0xFF41, 0xFF42, 0xFF43, 0x3000,
      0xFF11, 0xFF01).flatMap(Character.toChars)) // ａｂｃ　１！
    val docs = Seq((1L, "abc 1!"), (2L, fw), (3L, "other")).toDF("doc_id", "text")
    val folded = Dedup.exactDedupWidthFolded(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(folded == Set((1L, 2L), (3L, 1L)),
      "full-width retyping must hash WITH its ASCII twin")
    val plain = Dedup.exactDedupNormalized(docs, "doc_id", "text")
    assert(plain.count() == 3L,
      "d14 must NOT unify them — that gap is d22's reason to exist")
    // the fold table is the 1:1 FF01-FF5E -> 21-7E map + U+3000
    assert(Dedup.FullwidthFrom.length == 95 &&
      Dedup.FullwidthTo.length == 95)
    assert(Dedup.FullwidthFrom.head == 0xFF01.toChar &&
      Dedup.FullwidthFrom.last == 0x3000.toChar)
  }

  test("d21 frozen-cap serve is batch-independent: per-batch serves " +
    "union to the one-shot serve") {
    val docs = Tables.documents(spark, sf)
    def cjk(f: org.apache.spark.sql.Column) =
      docs.filter(f).select(col("doc_id"),
        TextOps.cjkFixture(col("text")).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_d21_r14").toString
    Dedup.cjkPublishIndex(cjk(col("doc_id") % 2 === 0), "doc_id", "text", dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val oneShot = rows(Dedup.cjkServeDelta(spark,
      cjk(col("doc_id") % 2 =!= 0), "doc_id", "text", 0.6, dir))
    assert(oneShot.nonEmpty, "fixture must contain cross-set CJK near-dups")
    // split the delta into two arbitrary batches: the standing gate is
    // a pure function of the frozen store, so the union must be exact
    val b1 = rows(Dedup.cjkServeDelta(spark,
      cjk(col("doc_id") % 4 === 1), "doc_id", "text", 0.6, dir))
    val b2 = rows(Dedup.cjkServeDelta(spark,
      cjk(col("doc_id") % 4 === 3), "doc_id", "text", 0.6, dir))
    assert((b1 ++ b2) == oneShot)
    assert(oneShot.forall { case (a, b, _, j) =>
      a % 2 == 0 && b % 2 != 0 && j >= 0.6 })
  }

  test("p05 store serve: published labels + loaded verify arrays equal " +
    "the one-shot clustering") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_p05_r14").toString
    Dedup.minhashPublishStanding(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", 0.6, dir)
    // the serve sees ONLY the delta docs and the store — the standing
    // corpus frame is not an input at all
    val served = Dedup.minhashServeIncremental(spark,
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", 0.6, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val oneShot = Clusters.connectedComponents(
        Dedup.minhashVerifiedPairs(docs, "doc_id", "text", 0.6),
        "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(oneShot.nonEmpty, "fixture must contain minhash near-dups")
    assert(served == oneShot)
  }

  test("p08 guard pass with a MISSING labels artifact falls back to the " +
    "recompute instead of failing") {
    import spark.implicits._
    def frames(rows: (Long, Long)*) = rows.toSeq.toDF("doc_id", "frame_hash")
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the RoundThirteenOpsSpec guard-PASS fixture: no df crossover, so
    // pre-r13 behavior would read the labels dir — which a store
    // published by an older publisher does not have
    val floor = 500000L
    val standing = frames(0L -> 101L, 0L -> 102L, 2L -> 101L)
    val delta = frames(1L -> 102L)
    val served = Multimodal.mediaServeFrom(standing, delta,
      () => spark.read.parquet("/tmp/graft_r14_missing_labels_dir"),
      floor, maxDf = 2)
    val want = Clusters.connectedComponents(
      Multimodal.videoNearDupPairs(standing.unionByName(delta), floor, 2)
        .select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
    assert(labels(want) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
    assert(labels(served) == labels(want))
  }

  test("v14 bands: identical populations read stable, disjoint supports " +
    "read drifted") {
    import spark.implicits._
    val same = (0 until 200).flatMap(i =>
      Seq((true, (i % 10) * 25.0 + 1), (false, (i % 10) * 25.0 + 1)))
      .toDF("is_ref", "value")
    val s = Profile.driftPsiVerdict(same, "value", col("is_ref")).head
    assert(s.getLong(0) == 0L && s.getString(1) == "stable")
    val apart = ((0 until 200).map(_ => (true, 10.0)) ++
      (0 until 200).map(_ => (false, 240.0))).toDF("is_ref", "value")
    val d = Profile.driftPsiVerdict(apart, "value", col("is_ref")).head
    assert(d.getString(1) == "drifted" && d.getLong(0) > Profile.PsiDriftedQ6)
  }
}
