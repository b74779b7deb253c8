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

  test("t20 stupid backoff on a hand-computed corpus (attested + backoff branches)") {
    import spark.implicits._
    // counts: a=3 b=3 c=1, N=7; vocab(2)={a,b}; bigrams "a b"×3,
    // "b a"×1, "b c"×1; biTop(2)={"a b","b a"} → "b c" backs off
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextOps.backoffLogProb(docs, "doc_id", "text",
        vocabSize = 2, bigramTop = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    def q6(v: Double): Long =
      new java.math.BigDecimal(v * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    // doc1: ln(3/3) + ln(1/3) + ln(3/3) over 3 bigrams
    val d1 = (math.log(1.0) + math.log(1.0 / 3.0) + math.log(1.0)) / 3.0
    // doc2: ln(3/3) + ln(0.4·(0+1)/(7+2)) over 2 bigrams
    val d2 = (math.log(1.0) + math.log(0.4 * 1.0 / 9.0)) / 2.0
    assert(got(1L) == ((3L, q6(d1))))
    assert(got(2L) == ((2L, q6(d2))))
  }

  test("a06 length buckets: bucket = bit length, batches bounded and contiguous") {
    val rows = Pack.queries("a06_length_buckets")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (docId, w, bucket, shard, _) =>
      assert(bucket == java.lang.Long.toBinaryString(math.max(w, 1L)).length)
      assert(shard == docId % Pack.BucketShards)
    }
    rows.groupBy { case (_, _, b, s, _) => (b, s) }.foreach { case (_, g) =>
      val byBatch = g.groupBy(_._5)
      byBatch.foreach { case (_, members) =>
        assert(members.size <= Pack.BucketBatch)
      }
      val ids = byBatch.keys.toSeq.sorted
      assert(ids == (0L until ids.size.toLong)) // contiguous from 0
      // every batch except the last is exactly full
      ids.dropRight(1).foreach { b =>
        assert(byBatch(b).size == Pack.BucketBatch)
      }
    }
  }

  test("x11 verified heavy hitters: superset, never-underestimate, exact counts") {
    import spark.implicits._
    val got = Sketches.queries("x11_cms_heavy_verified")(spark, sf)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    val exact = Tables.documents(spark, sf)
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')")).as("t"))
      .groupBy("t").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    got.foreach { case (tok, (est, ex, over)) =>
      assert(ex == exact(tok))          // verify pass is truly exact
      assert(est >= ex && over == est - ex) // CMS never underestimates
    }
    // no false negatives: every truly-heavy token was nominated
    exact.filter(_._2 >= Sketches.HeavyMin).keys.foreach { t =>
      assert(got.contains(t), s"missing true heavy hitter $t")
    }
  }

  test("s15 interleave: closed-form position equals the global sort") {
    val rows = Sampling.queries("s15_interleave")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    // pos must be the exact permutation induced by (round, source, id)
    val expected = rows.sortBy { case (id, src, r, _) => (r, src, id) }
      .zipWithIndex.map { case ((id, _, _, _), i) => id -> i.toLong }.toMap
    rows.foreach { case (id, _, _, pos) => assert(pos == expected(id)) }
    assert(rows.map(_._4).sorted.toSeq == (0L until rows.length.toLong))
  }

  test("q48 continuous quantiles match a direct interpolation recompute") {
    val got = Relational.queries("q48_quantile_cont")(spark, sf)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val byFlag = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def interp(vs: Array[Double], q: Double): Double = {
      val pos = (vs.length - 1) * q
      val lo = math.floor(pos).toInt
      val frac = pos - math.floor(pos)
      val hi = if (lo + 1 < vs.length) vs(lo + 1) else vs(lo)
      vs(lo) + (hi - vs(lo)) * frac
    }
    byFlag.foreach { case (flag, vs) =>
      val (p50, p90) = got(flag)
      assert(p50 == interp(vs, 0.5), s"p50 mismatch for $flag")
      assert(p90 == interp(vs, 0.9), s"p90 mismatch for $flag")
    }
  }

  test("e23 session stats on a crafted two-session timeline") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000L)
    // user 7: session 0 = view@0, click@10, purchase@20 (converts at
    // +20min); 40-min gap; session 1 = view@60, error@65 (no convert)
    val ev = Seq(
      (1L, t(0), 7L, "view"), (2L, t(10), 7L, "click"),
      (3L, t(20), 7L, "purchase"), (4L, t(60), 7L, "view"),
      (5L, t(65), 7L, "error"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.sessionStats(ev, "user_id", "ts", "event_id",
        gapMicros = 1800000000L)
      .collect().map(r => (r.getLong(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    assert(got(0L) == ((3L, 3L, 20L * 60000000L, 1L, Some(20L * 60000000L))))
    assert(got(1L) == ((2L, 2L, 5L * 60000000L, 0L, None)))
  }

  test("er06 blocking audit: exact counts and the single-block degenerate case") {
    val row = Entity.queries("er06_blocking_audit")(spark, sf).collect().head
    val (nNames, nCand, rr, nTrue, nFound) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(4),
        row.getLong(5))
    val allPairs = nNames * (nNames - 1) / 2
    assert(rr == (allPairs - nCand) * 1000000L / allPairs)
    assert(nFound <= nTrue && nCand <= allPairs)
    // distinct-name count cross-check
    val want = Tables.part(spark, sf).select("p_name").distinct().count()
    assert(nNames == want)
    // degenerate single-block dictionary: blocking generates ALL pairs,
    // so rr = 0 and every true match is found (pc = 1e6)
    import spark.implicits._
    val one = Seq("alpha x", "alphq x", "omega x")
      .toDF("p_name")
    val r2 = Entity.blockingAudit(one, "p_name", sampleMod = 1L)
      .collect().head
    assert(r2.getLong(1) == 3L)     // n_cand = 3·2/2
    assert(r2.getLong(2) == 0L)     // rr_q6 = 0
    assert(r2.getLong(4) == r2.getLong(5)) // n_found == n_true
    if (r2.getLong(4) > 0L) assert(r2.getLong(6) == 1000000L)
  }

  test("x12 sliding HLL: trailing merge equals a direct sketch of the window slice") {
    val est = Sketches.queries("x12_hll_sliding")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(est.nonEmpty)
    val ev = Tables.events(spark, sf)
    // spot-check 5 hours spread over the range: the merged trailing
    // registers must answer exactly what a fresh sketch over the raw
    // trailing slice answers — the mergeability contract
    val hours = est.keys.toSeq.sorted
    val picks = Seq(hours.head, hours(hours.size / 4), hours(hours.size / 2),
      hours(3 * hours.size / 4), hours.last)
    picks.foreach { h =>
      val slice = ev.filter(
        expr("(unix_micros(ts) div 3600000000L) * 3600L") <= h &&
          expr("(unix_micros(ts) div 3600000000L) * 3600L") > h - 24L * 3600L)
      val direct = Sketches.hllDistinct(
        slice.select(col("user_id")), "user_id")
        .select("est").collect().head.getDouble(0)
      assert(est(h) == direct, s"hour $h: merged ${est(h)} != direct $direct")
    }
  }

  test("k17 nprobe sweep: per-probe recall monotone, exact at nprobe = K") {
    val rows = Similarity.queries("k17_nprobe_recall")(spark, sf)
      .collect().map(r => ((r.getLong(1), r.getLong(0)), r.getLong(3))).toMap
    assert(rows.nonEmpty)
    val probes = rows.keys.map(_._1).toSet
    probes.foreach { p =>
      // widening the probe set can only displace an exact-hit by
      // another exact-hit, so recall is non-decreasing in nprobe
      assert(rows((p, 1L)) <= rows((p, 2L)))
      assert(rows((p, 2L)) <= rows((p, 4L)))
      assert(rows((p, 4L)) <= rows((p, Similarity.KmeansK.toLong)))
      // nprobe = K searches every cell — brute force, recall exactly 1
      assert(rows((p, Similarity.KmeansK.toLong)) == 1000000L)
    }
  }

  test("r05 dirichlet QL matches a direct recompute, absent terms smoothed") {
    val got = Search.queries("r05_dirichlet_ql")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty)))
    val sumDl = docs.map(_._2.length.toLong).sum
    val terms = Search.DefaultQuery
    val cf = terms.map(t =>
      t -> docs.map(_._2.count(_ == t).toLong).sum).toMap
    val scores = docs.flatMap { case (id, ws) =>
      val dl = ws.length.toLong
      val hasTerm = terms.exists(t => ws.contains(t))
      if (!hasTerm) None
      else Some(id -> math.round(terms.filter(cf(_) > 0).map { t =>
        val tf = ws.count(_ == t).toDouble
        math.log((tf + Search.Mu * cf(t).toDouble / sumDl.toDouble)
          / (dl.toDouble + Search.Mu))
      }.sum * 1e6))
    }.toMap
    val want = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(got.toSeq == want)
  }

  test("c18 threshold stability: borderline edge splits, strong edges hold") {
    import spark.implicits._
    // 1-2 strong (0.9), 2-3 borderline (0.65): one cluster at 0.6 that
    // splits into {1,2} + {3} at 0.75; 8-9 strong pair stays whole
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.65), (8L, 9L, 0.92))
      .toDF("doc_a", "doc_b", "jaccard")
    val comp = Clusters.connectedComponents(pairs, "doc_a", "doc_b")
    val got = Clusters.thresholdStability(pairs, "doc_a", "doc_b",
        "jaccard", 0.75, comp)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 2L, 2L * 1000000L / 3L)))
    assert(got(8L) == ((2L, 1L, 1000000L)))
  }

  test("er shared canonical map: memoized consumers equal direct recompute") {
    val parts = Tables.part(spark, sf)
    val shared = Entity.sharedCanonicalMap(spark, sf)
    assert(Entity.entityRollupFromMap(parts, "p_name", shared)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      == Entity.entityRollup(parts, "p_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
    // and the memo returns the same instance on a second call
    assert(Entity.sharedCanonicalMap(spark, sf) eq shared)
  }

  test("v11 freshness flags the silently-stopped source, not the healthy ones") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(hr: Long) = new Timestamp(hr * 3600000L)
    // feed A publishes through hour 100 (the frontier); feed B stopped
    // at hour 90 — 10h lag breaches the 6h SLA
    val ev = Seq((1L, t(98), "A"), (2L, t(100), "A"), (3L, t(90), "B"))
      .toDF("event_id", "ts", "event_type")
    val got = Profile.freshnessByType(ev, "event_type", "ts")
      .collect().map(r => (r.getString(0),
        (r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("A") == ((0L, false)))
    assert(got("B") == ((10L * 3600L * 1000000L, true)))
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
