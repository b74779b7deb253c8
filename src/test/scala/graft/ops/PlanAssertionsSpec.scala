package graft.ops

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape contracts: the scale properties the operators claim
  * (pushdown, broadcast selection, shuffle counts, map-side pruning)
  * asserted mechanically on the physical plan, so a refactor that
  * silently degrades a plan — an extra exchange, a broadcast that
  * became a shuffle join, a filter that stopped reaching the scan —
  * fails CI instead of surfacing as a 100× slowdown in production. */
class PlanAssertionsSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def shuffles(p: SparkPlan): Int =
    collectWithSubqueries(p) { case e: ShuffleExchangeLike => e }.size

  test("q02: the revenue filter is pushed down to the parquet scan") {
    val formatted = graft.SparkEntry.queries("q02_filter_revenue")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters: ["), formatted.take(2000))
    assert(formatted.matches("(?s).*PushedFilters: \\[[^\\]].*"),
      "expected at least one pushed filter:\n" + formatted.take(2000))
  }

  test("q03: the star join broadcasts its dimension sides") {
    val s = plan("q03_star_revenue").toString
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"),
      "dims must broadcast, not sort-merge:\n" + s.take(2000))
  }

  test("d04 simhash plans with zero exchanges (pure map-side)") {
    assert(shuffles(plan("d04_simhash")) == 0)
  }

  test("t02 quality scoring plans with zero exchanges (pure map-side)") {
    assert(shuffles(plan("t02_quality")) == 0)
  }

  test("s01 rate sampling plans with zero exchanges (pure map-side)") {
    assert(shuffles(plan("s01_sample_rate")) == 0)
  }

  test("t15 hashed classifier plans with zero exchanges (pure map-side)") {
    assert(shuffles(plan("t15_hashed_classifier")) == 0)
  }

  test("t22 serve joins the loaded model by broadcast, never sort-merge") {
    // the scoring path is one map-side join chain (bigrams ⋈ bi ⋈ uni)
    // plus the doc-keyed aggregation — a model join that degraded to a
    // sort-merge would shuffle the token-sized bigram explode
    val s = plan("t22_lm_quality_persisted").toString
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"),
      "model tables must broadcast, not sort-merge:\n" + s.take(2000))
  }

  test("v13 PSI plans scan-bound: tiny aggs only, no sort-merge join") {
    val p = plan("v13_drift_psi")
    val s = p.toString
    assert(!s.contains("SortMergeJoin"),
      "spine/total joins must broadcast:\n" + s.take(2000))
    // bin groupBy + the two 1-row/10-row readout exchanges at most —
    // nothing event-sized shuffles after the map-side partials
    assert(shuffles(p) <= 3, s.take(2000))
  }

  test("t24 script token counts plan with zero exchanges (pure map-side)") {
    assert(shuffles(plan("t24_cjk_tokens")) == 0)
  }

  test("t25 script gate plans with zero exchanges (pure map-side)") {
    assert(shuffles(plan("t25_cjk_gate")) == 0)
  }

  test("d20 CJK near-dup: band-bounded candidates, never cartesian or " +
    "token-level pair shuffle") {
    // the catalog entry now serves the session-memoized checkpoint
    // (sharedCjkPairs), so assert on the underlying operator directly
    // — the k04 precedent
    import org.apache.spark.sql.functions.col
    val p = Dedup.cjkNearDupPairs(
        Tables.documents(spark, sf).select(col("doc_id"),
          TextOps.cjkFixture(col("text")).as("text")),
        "doc_id", "text", 0.6)
      .queryExecution.executedPlan
    val s = p.toString
    assert(!s.contains("CartesianProduct"),
      "char shingles must pair through band buckets only:\n" + s.take(2000))
    // band groupBy + candidate distinct (+ at most the two verify-join
    // exchanges if the candidate set outgrows broadcast) — the shingle
    // stream itself never shuffles
    assert(shuffles(p) <= 4, s.take(2000))
  }

  test("v14 verdict plans v13's scan-bound shape + one single-row agg") {
    val p = plan("v14_drift_verdict")
    val s = p.toString
    assert(!s.contains("SortMergeJoin"), s.take(2000))
    assert(shuffles(p) <= 4, s.take(2000))
  }

  test("er10 delta canonicalization joins broadcast end to end — map, " +
    "blocks, and the rank-1 verdict — never sort-merge") {
    // every join side is dictionary-sized (names, not facts); the
    // rank-1 `best` frame's window hides that from the estimator, so
    // the explicit hint is load-bearing and this contract pins it
    val s = plan("er10_delta_canonicalize").toString
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"),
      "the verdict join must broadcast, not sort-merge:\n" + s.take(2000))
  }

  test("e27 sequential monitor: one user-keyed exchange feeds all K " +
    "looks; range and spine broadcast back") {
    val p = plan("e27_sequential_ab")
    val s = p.toString
    assert(!s.contains("SortMergeJoin"), s.take(2000))
    // per-user minima exchange + the K·2-row look/variant agg + final
    // K-row pivot (+ the 1-row range agg under its broadcast) — the
    // corpus is exchanged ONCE regardless of K
    assert(shuffles(p) <= 4, s.take(2000))
  }

  test("d03 minhash plans exactly two exchanges (bands + distinct), no token shuffle") {
    // map-side signatures: the only exchanges are the 4-key-per-doc band
    // bucket groupBy and the candidate-pair distinct
    assert(shuffles(plan("d03_minhash_lsh")) == 2)
  }

  test("t06 tf/df plans a single corpus-derived aggregation + one window exchange") {
    // single-scan shape: tf groupBy exchange + df window exchange only
    assert(shuffles(plan("t06_tf_df")) == 2)
  }

  test("x01 HLL shuffles at most the register count") {
    // one exchange for the register groupBy (<= 64 rows), one for the
    // final single-row aggregate
    assert(shuffles(plan("x01_hll_distinct")) <= 2)
  }

  test("b01 bloom probe is inlined arithmetic on the fact side") {
    val s = plan("b01_bloom_semi").toString
    assert(s.contains("element_at"), "bitmap probe must be inline:\n" + s.take(2000))
    assert(s.contains("BroadcastHashJoin") || s.contains("broadcast"),
      "the exact semi should broadcast the small dim:\n" + s.take(2000))
  }

  test("q25 two-phase quantiles: every window sorts a histogram, never the raw fact") {
    // q24's documented scale-killer is a window partitioned on 6 group
    // values over ALL fact rows (one unsplittable sort task per group).
    // q25's contract: each WindowExec's subtree contains an aggregation
    // (the bucket/value histogram) between the window and any scan, so
    // window partitions are bounded by histogram size, not row count.
    val p = plan("q25_quantiles_2p")
    val windows = collectWithSubqueries(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected histogram windows in the two-phase plan")
    windows.foreach { w =>
      val aggBelow = collect(w.child) {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(aggBelow.nonEmpty,
        "window must run over an aggregated histogram, not raw rows:\n" +
          w.toString.take(1500))
    }
  }

  test("q07/s02 rank-limit windows pre-prune map-side (WindowGroupLimit)") {
    assert(plan("q07_window_topk").toString.contains("WindowGroupLimit"))
    assert(plan("s02_sample_fixed").toString.contains("WindowGroupLimit"))
  }

  test("s03 split assignment plans with zero exchanges (pure map-side)") {
    assert(shuffles(plan("s03_split_assign")) == 0)
  }

  test("k11 standardization broadcasts the stats table; transform side never shuffles") {
    val p = plan("k11_standardize")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"),
      "dims-row stats must broadcast:\n" + s.take(2000))
    // the only exchange is the per-dim stats groupBy (dims rows); the
    // corpus explode → normalize path is map-side on both passes
    assert(shuffles(p) == 1, "expected 1 exchange (stats agg):\n" + s.take(2000))
  }

  test("a04 shard export plans exactly one exchange (the shard hash), no global sort") {
    val p = plan("a04_shuffle_shards")
    assert(shuffles(p) == 1,
      "expected only the shard-key exchange:\n" + p.toString.take(2000))
  }

  test("er03 applies the canonical map to facts via broadcast") {
    val s = plan("er03_entity_rollup").toString
    assert(s.contains("BroadcastHashJoin"),
      "dictionary-sized map must broadcast onto facts:\n" + s.take(2000))
  }

  test("d09 decontamination broadcasts the probe set; corpus tokens never shuffle") {
    val p = plan("d09_decontaminate")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"),
      "probe hash set must broadcast:\n" + s.take(2000))
    // only two exchanges: the probe-side distinct (probe-sized) and the
    // per-doc hit-count groupBy — the corpus shingle stream itself stays
    // map-side
    assert(shuffles(p) == 2, s"expected 2 exchanges:\n" + s.take(2000))
  }

  test("x05 histogram quantiles: every window sorts registers, never the raw fact") {
    // same contract as q25: the single-partition cumulative window is
    // over the bounded register table (an aggregation sits between the
    // window and any scan), so its size is range/width, not corpus rows
    val p = plan("x05_hist_quantiles")
    val windows = collectWithSubqueries(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected cumulative windows in the read-out")
    windows.foreach { w =>
      val aggBelow = collect(w.child) {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(aggBelow.nonEmpty,
        "window must run over aggregated registers, not raw rows:\n" +
          w.toString.take(1500))
    }
  }

  test("s06 token budget: bracket locator windows a histogram; bracket set broadcasts") {
    // s05's documented scale-killer is the running-sum window over whole
    // strata. s06's contract: the bracket-locating cumulative window runs
    // over the (stratum, bucket) HISTOGRAM (an aggregation sits between
    // it and any scan); only the bracket-bucket residue window touches
    // raw rows, and the ≤1-row-per-stratum bracket set reaches the fact
    // via broadcast.
    val p = plan("s06_token_budget_2p")
    val windows = collectWithSubqueries(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the bracket-locator window")
    val overHistogram = windows.filter { w =>
      collect(w.child) {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty
    }
    assert(overHistogram.nonEmpty,
      "the cumulative bracket locator must window an aggregated histogram")
    assert(p.toString.contains("BroadcastHashJoin"),
      "the per-stratum bracket set must broadcast:\n" + p.toString.take(2000))
  }

  test("c05 semantic dedup: pair scoring is cluster-keyed, never cartesian") {
    // the SemDeDup point: cosine pairs come from a self-equi-join on the
    // cluster key (shuffle co-location), not an all-pairs product — the
    // only nested-loop join allowed is the k-row centroid broadcast
    val s = plan("c05_semantic_dedup").toString
    assert(!s.contains("CartesianProduct"),
      "within-cluster scoring must not plan a cartesian product:\n" + s.take(2000))
  }

  test("t09 gopher filter plans with zero exchanges (pure map-side)") {
    assert(shuffles(plan("t09_gopher_filter")) == 0)
  }

  test("s07 mixture sampling: one totals exchange, rate table broadcasts back") {
    // the only shuffle is the per-stratum totals aggregation (stratum-
    // cardinality rows); the rate table re-joins by broadcast and the
    // keep decision stays map-side
    val p = plan("s07_mixture_sample")
    assert(shuffles(p) <= 2, "totals aggregation must be the only exchange")
    assert(p.toString.contains("BroadcastHashJoin"),
      "the rate table must broadcast:\n" + p.toString.take(2000))
  }

  test("q27 grouping sets plan one Expand + one aggregation, no fact rescan") {
    val p = plan("q27_grouping_sets")
    val expands = collectWithSubqueries(p) {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.size == 1, "grouping sets must expand once, not rescan per set")
    val scans = collectWithSubqueries(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1, "one scan of the fact for all grouping sets")
  }

  test("k04 final assignment broadcasts the centroid table") {
    // pin the TRAINING plan, not the catalog entry: k04's catalog
    // entry serves the shared memoized assignment (a checkpoint scan),
    // so the broadcast lives in the underlying kmeansAssign build
    val s = graft.ops.Similarity.kmeansAssign(
        graft.ops.Tables.embeddings(spark, sf), "vec_id", "embedding",
        graft.ops.Similarity.KmeansK, graft.ops.Similarity.KmeansIters)
      .queryExecution.executedPlan.toString
    assert(s.contains("Broadcast"), "centroids must broadcast:\n" + s.take(2000))
    assert(!s.contains("SortMergeJoin"),
      "the k-row centroid side must never sort-merge:\n" + s.take(2000))
  }

  test("t11 entropy plans with zero exchanges (pure map-side fold)") {
    assert(shuffles(plan("t11_entropy")) == 0)
  }

  test("t12 adjacent dedup plans with zero exchanges (pure map-side)") {
    assert(shuffles(plan("t12_dedup_adjacent")) == 0)
  }

  test("k06 filtered knn pushes the metadata predicate into the scan") {
    val formatted = graft.SparkEntry.queries("k06_filtered_knn")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.matches("(?s).*PushedFilters: \\[[^\\]]*LessThan\\(label,5\\).*"),
      "label < 5 must reach the parquet reader:\n" +
        formatted.take(3000))
  }

  test("t10 unigram score: vocab broadcasts; the score shuffle is per-doc partials") {
    val p = plan("t10_unigram_logprob")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), "the top-V vocab must broadcast")
    assert(!s.contains("SortMergeJoin"),
      "token-level rows must never sort-merge:\n" + s.take(2000))
    // vocab build + scalar total + per-doc score = exactly three
    // exchanges, none of them token-sized post-partial-agg
    assert(shuffles(p) == 3)
  }

  test("a03 sliding chunks plan with zero exchanges (pure generator)") {
    assert(shuffles(plan("a03_sliding_chunks")) == 0)
  }

  test("d13 simhash pairs: band groupBy + pair distinct, no token shuffle") {
    // signatures are map-side; the only exchanges key on 8-byte band
    // keys and the deduped pair rows
    assert(shuffles(plan("d13_simhash_pairs")) == 2)
  }

  test("q29 ntile + percent_rank share a single per-stratum exchange") {
    assert(shuffles(plan("q29_ntile_buckets")) == 1)
  }

  test("q28 gaps-islands: one exchange serves both windows AND the island agg") {
    // lag + running sum share a (partition, order) spec, and the island
    // aggregation's keys include user_id, so hashpartitioning(user_id)
    // satisfies its distribution — the whole query is one shuffle
    assert(shuffles(plan("q28_gaps_islands")) == 1)
  }

  test("s08 exact stratified sample: rank + stratum-count windows share one exchange") {
    // the per-stratum count comes from a whole-partition window over the
    // rank window's partitioning, not a separate aggregation + join
    assert(shuffles(plan("s08_stratified_exact")) == 1)
  }

  test("s11 DSIR: the log-ratio model broadcasts and top-n is a heap, not a sort") {
    val p = plan("s11_dsir_select")
    val s = p.toString
    // two broadcast joins: the B-row model onto the per-doc bucket
    // counts, and the n-row winner set back onto the corpus for lang.
    // (The model's own B-row full-outer merge is allowed to sort-merge —
    // Spark cannot broadcast a full-outer — but nothing corpus-sized may.)
    assert(s.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 2,
      "model and winner set must broadcast:\n" + s.take(2000))
    assert(s.contains("TakeOrderedAndProject"),
      "top-n must plan as per-partition heaps:\n" + s.take(2000))
  }

  test("s12 epoch mix plans with zero exchanges (pure map-side generate)") {
    assert(shuffles(plan("s12_epoch_mix")) == 0)
  }

  test("v07 snapshot diff: one exchange per snapshot side into the full-outer join") {
    assert(shuffles(plan("v07_snapshot_diff")) == 2)
  }

  test("t16 novelty: df window + doc aggregation, two exchanges, no join back") {
    // shingle-hash df is a count window sharing the key exchange; the
    // readout re-keys on doc_id — nothing else may shuffle
    assert(shuffles(plan("t16_shingle_novelty")) == 2)
  }

  test("a05 curriculum: the corpus never sorts; stages broadcast back") {
    val p = plan("a05_curriculum")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"),
      "histogram stages must broadcast onto the corpus:\n" + s.take(2000))
    // the only exchanges feed the bounded histogram (groupBy n_words +
    // its single-partition windows) — the corpus side itself stays
    // exchange-free, so no corpus-sized sort can exist
    assert(!s.contains("SortMergeJoin"),
      "stage map-back must not sort-merge:\n" + s.take(2000))
  }

  test("e20 decayed value: one-row max broadcasts; one user aggregation") {
    val p = plan("e20_decayed_value")
    val s = p.toString
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"),
      "the reference epoch must broadcast:\n" + s.take(2000))
  }

  test("e22 markov: lag window + pair aggregation; probability window on the type square") {
    // user_id exchange for the lag, (prev,next) exchange for the counts,
    // prev exchange for the row-normalize window — all key-compact
    assert(shuffles(plan("e22_markov_transitions")) <= 3)
  }

  test("k13 knn classify: probes broadcast against the corpus") {
    val s = plan("k13_knn_classify").toString
    assert(s.contains("BroadcastNestedLoopJoin"),
      "probe side must broadcast (k01's shape):\n" + s.take(2000))
  }

  test("d18 span scrub: window strings never shuffle — hash keys only") {
    val p = plan("d18_span_scrub")
    // duplicated-start detection (wh window) + per-doc collect + the
    // rejoin onto the token arrays; the window STRING column is gone
    // before every exchange (only 8-byte hashes and int positions ride)
    assert(shuffles(p) <= 4)
  }

  test("q47 skyline: fact side semi-joins the broadcast frontier, never self-joins") {
    val s = plan("q47_skyline").toString
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftSemi"),
      "frontier must broadcast back as a semi-join:\n" + s.take(2000))
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"),
      "the O(n²) dominance join must not appear:\n" + s.take(2000))
  }

  test("s15 interleave: per-source rank window + counts — no global ordering exchange") {
    val p = plan("s15_interleave")
    // one source-keyed exchange for the rank window, one for the
    // #sources-row totals; the global position is closed-form (the
    // oracle's row_number OVER (ORDER BY …) never appears here)
    assert(shuffles(p) <= 2, p.toString.take(2000))
  }

  test("q16 cube: Expand runs over the pre-aggregate, not the fact join") {
    val p = plan("q16_cube")
    val expands = collectWithSubqueries(p) {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.nonEmpty, "cube must plan an Expand")
    // the Expand's subtree must already contain the pre-aggregation —
    // i.e. an aggregate BELOW the Expand — so the ×4 multiplication
    // applies to ≤ |seg|·|status| rows, not the join output
    expands.foreach { e =>
      // count aggregates STRICTLY inside the Expand's subtree (collect
      // on the ExpandExec node never matches itself), so the assertion
      // actually pins "pre-aggregate below Expand" rather than the
      // vacuous leaf count it once checked
      val aggsBelow = e.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }.size
      assert(aggsBelow >= 1,
        "Expand must sit above the pre-aggregate:\n" + p.toString.take(3000))
    }
  }

  test("d19 serve plan never recomputes corpus signatures (bands scan from parquet)") {
    // the persisted-index contract, pinned on the plan: the serve's
    // only graft_minhash evaluation is the DELTA side's map-side band
    // pass (lazy, single-consumer — the serve-delta doctrine) — the
    // corpus bands arrive from the parquet index scan. The corpus
    // text appears only under graft_shingle_hashes (the verify
    // stage), never under a second signature computation.
    val s = plan("d19_minhash_persisted").toString
    val minhashCount = "graft_minhash".r.findAllIn(s).size
    assert(minhashCount >= 1 && minhashCount <= 2,
      s"expected only the delta band pass to compute signatures, found $minhashCount sites:\n" +
        s.take(2000))
    // the loaded band table reaches the join from a parquet scan
    assert(s.contains("signatures") || s.contains("bands") ||
      s.contains("FileScan parquet"),
      "corpus bands must come from the index files:\n" + s.take(2000))
  }

  test("k18 encode plan: codebooks broadcast, no shuffle of the delta vectors") {
    // encoding is a map-side pass: the 8-row-per-subspace codebooks
    // broadcast into the cross join; the only exchanges are the
    // per-subspace aggregate argmins and the final vec_id joins over
    // code tuples (2 longs/vector), never the float vectors
    val s = plan("k18_pq_encode_delta").toString
    assert(s.contains("BroadcastExchange"),
      "codebooks must broadcast:\n" + s.take(2000))
    assert(!s.contains("CartesianProduct"),
      "the codebook cross join must be a broadcast nested loop:\n" +
        s.take(2000))
  }

  test("q49 two-phase percentile_cont: windows over histograms only, brackets broadcast") {
    // same contract as q25, applied to the continuous-quantile twin:
    // no WindowExec may sort raw fact rows — an aggregation (the
    // bucket or within-bracket value histogram) must sit below every
    // window — and the 4-row bracket set must reach the fact by
    // broadcast, not shuffle
    val p = plan("q49_quantile_cont_2p")
    val windows = collectWithSubqueries(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected histogram windows in the two-phase plan")
    windows.foreach { w =>
      val aggBelow = collect(w.child) {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(aggBelow.nonEmpty,
        "window must run over an aggregated histogram, not raw rows:\n" +
          w.toString.take(1500))
    }
    assert(p.toString.contains("BroadcastExchange"),
      "bracket set must broadcast onto the fact:\n" + p.toString.take(2000))
  }

  test("x12 sliding HLL: the trailing merge joins broadcast register tables") {
    val s = plan("x12_hll_sliding").toString
    assert(s.contains("BroadcastExchange"),
      "hour×register range join must broadcast the register table:\n" +
        s.take(2000))
  }

  test("k21 SQ8: stats row and probes broadcast; corpus codes never shuffle") {
    val p = plan("k21_sq8")
    val s = p.toString
    // both the one-row stats frame and the probe batch arrive as
    // broadcasts over the corpus scan — decode/score is map-side
    assert(s.split("BroadcastNestedLoopJoin").length - 1 == 2,
      "stats + probes must both broadcast:\n" + s.take(2000))
    // exchanges: per-dim stats agg, one-row stats assembly, and the
    // probe_id rank window (k·probes rows after the map-side prune) —
    // the corpus vectors themselves never shuffle
    assert(shuffles(p) == 3, "expected 3 exchanges:\n" + s.take(2000))
    assert(s.contains("WindowGroupLimit"),
      "rank filter must prune map-side:\n" + s.take(2000))
  }

  test("s17 diversity sample: one cluster exchange, map-side rank prune") {
    val p = plan("s17_diversity_sample")
    assert(shuffles(p) == 1,
      "expected only the cluster-key window exchange:\n" + p.toString.take(2000))
    assert(p.toString.contains("WindowGroupLimit"),
      "cap must prune map-side:\n" + p.toString.take(2000))
  }

  test("x13 AMS: the sketch branch reduces to one row before its exchange") {
    val p = plan("x13_ams_f2")
    val s = p.toString
    // 1×1 readout join is a broadcast nested-loop, never a shuffle join
    assert(s.contains("BroadcastNestedLoopJoin"), s.take(2000))
    // three exchanges total: the one-row sketch agg, the exact side's
    // key agg (the audit the estimate exists to avoid), and its
    // one-row collapse — nothing else moves
    assert(shuffles(p) == 3, "expected 3 exchanges:\n" + s.take(2000))
  }

  test("global-window inventory: empty-partition windows are exactly the documented collapsed-frame sites") {
    // An unpartitioned window moves its whole input to ONE task — the
    // classic 100TB scale-killer. The catalog's global windows are all
    // deliberate: they run on frames already collapsed to months /
    // distinct prices / histogram registers / #strata rows, where one
    // task is the right plan. This contract pins that allowlist at
    // plan level, so a NEW empty-partition window anywhere in the
    // catalog fails CI by name (Bench silences the per-run WindowExec
    // warning these five spray; this spec is the real signal).
    val allowed = Set(
      "a05_curriculum",        // word-count histogram (distinct lengths)
      "q46_mom_delta",         // per-month lag (rows = months)
      "q47_skyline",           // distinct-price dominance scan
      "x05_hist_quantiles",    // histogram registers (rows = buckets)
      "s09_temperature_sample",// per-stratum share flattening (#strata)
      "s13_waterfill",         // per-stratum waterfill levels (#strata)
      "s11_dsir_select",       // bucket-model totals (rows = B buckets)
      "r04_hybrid_rrf",        // rank fuse of two top-k lists (2k rows)
      "r11_cjk_hybrid_rrf",    // same rank fuse on the CJK seam (2k rows)
      "v12_benford")           // leading-digit masses (rows = 9 digits)
    val found = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val lp = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan
      val hasGlobal = lp.collectWithSubqueries {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }.nonEmpty
      if (hasGlobal) Some(name) else None
    }.toSet
    assert(found == allowed,
      s"unexpected global windows: ${(found -- allowed).toSeq.sorted}; " +
        s"stale allowlist entries: ${(allowed -- found).toSeq.sorted}")
  }

  test("r08 tokenize-once: the executed plan contains ZERO tokenizer " +
    "expressions — every pass reads the checkpointed arrays") {
    val s = plan("r08_cjk_bm25").toString
    assert(!s.contains("regexp_extract_all") && !s.contains("translate"),
      "the fold+regex+bigram derivation must run exactly once, into " +
        "the checkpoint, never inside the bm25 passes:\n" + s.take(2000))
  }

  test("r09 serve: the CJK term predicate reaches the index parquet " +
    "scans (PushedFilters)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("r09plan").toString
    val toks = Tables.documents(spark, sf).select(col("doc_id"),
      Search.cjkIndexTerms(TextOps.cjkFixture(col("text"))).as("terms"))
    val (pst, lex, st) = Search.bm25BuildIndexTokens(toks, "doc_id", "terms")
    Search.bm25WriteIndex(pst, lex, st, dir)
    val (lp, ll, ls) = Search.bm25LoadIndex(spark, dir)
    val formatted = Search.bm25QueryIndex(lp, ll, ls, terms = Search.CjkQuery)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters: [In(token"),
      "term pruning must reach the postings scan:\n" + formatted.take(3000))
  }

  test("r13 tombstone serve: the term predicate still reaches the " +
    "postings scans and the tombstone set joins broadcast") {
    val formatted = graft.SparkEntry.queries("r13_bm25_tombstoned")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters: [In(token"),
      "term pruning must survive the tombstone anti/semi joins:\n" +
        formatted.take(3000))
    assert(formatted.contains("BroadcastHashJoin"),
      "the delete set must broadcast, never shuffle the postings:\n" +
        formatted.take(3000))
    assert(!formatted.contains("SortMergeJoin"),
      "no posting-store shuffle joins at serve:\n" + formatted.take(3000))
  }

  test("d28 multi-probe: candidates come from bucket equi-joins — " +
    "never a cartesian or nested-loop pairing") {
    val s = plan("d28_semantic_multiprobe").toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "every pairing must be gated by a bucket/id equi-join:\n" +
        s.take(2000))
  }

  test("d31 multi-probe: candidates come from bucket self-equi-joins — " +
    "never a cartesian or nested-loop pairing") {
    val s = plan("d31_neardup_multiprobe").toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "every pairing must be gated by a bucket/id equi-join:\n" +
        s.take(2000))
  }

  test("d32 store-backed multi-probe: candidates come from loaded-" +
    "bucket equi-joins — never a cartesian or nested-loop pairing") {
    val s = plan("d32_semantic_decon_store").toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "every pairing must be gated by a bucket/id equi-join:\n" +
        s.take(2000))
  }

  test("r16 streamed-tombstone serve: term pruning reaches the posting " +
    "scan and the accumulated delete set broadcasts") {
    val formatted = graft.SparkEntry.queries("r16_bm25_tombstone_stream")(
      spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters"),
      "term pruning must survive the streamed-set anti/semi joins:\n" +
        formatted.take(3000))
    assert(formatted.contains("BroadcastHashJoin"),
      "the accumulated delete set must broadcast, never shuffle the " +
        "postings:\n" + formatted.take(3000))
    assert(!formatted.contains("SortMergeJoin"),
      "no posting-store shuffle joins at serve:\n" + formatted.take(3000))
  }

  test("r10 phrase: chain joins read the pruned checkpoint — no " +
    "re-tokenize, no cartesian") {
    val s = plan("r10_cjk_phrase").toString
    assert(!s.contains("regexp_extract_all"),
      "positional postings must come from the single pruned pass:\n" +
        s.take(2000))
    assert(!s.contains("CartesianProduct"), s.take(2000))
  }
}
