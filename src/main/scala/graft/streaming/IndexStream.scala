package graft.streaming

import graft.ops.Search
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming search-index maintenance (engine extension, SURVEY.md
  * §2.9/§7.5): the r06/r07 seam at the stream edge — documents arrive,
  * each micro-batch's postings/lexicon/stats are built with
  * [[graft.ops.Search.bm25BuildIndex]] and appended as a SEGMENT
  * (three parquet subtables per batch), and queries serve from the
  * segment store after an exact-integer merge — precisely the
  * Lucene/Elasticsearch shape: writers append immutable segments,
  * readers merge at query time, a background compaction (here: one
  * [[graft.ops.Search.bm25MergeIndex]] pass rewritten through
  * [[graft.ops.Search.bm25WriteIndex]]) folds segments together when
  * they accumulate.
  *
  * NO state store at all: a batch's segment is a pure function of the
  * batch (tf/dl are per-doc, df and stats are per-segment sums), and
  * r07's merge theorem — postings concatenate, dfs ADD, stats ADD,
  * all exact integers — makes the merged read independent of how the
  * corpus was split into batches. Stream ≡ batch is therefore an
  * identity over ANY micro-batch partitioning (IndexStreamSpec pins
  * it against the one-shot r01 ranking).
  */
object IndexStream {
  /** The harness documents schema, declared explicitly — streaming
    * reads never infer. */
  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Drain the directory as a delta stream, appending one index
    * segment (postings/lexicon/stats parquet) per micro-batch under
    * `segDir`.
    *
    * Exactly-once across restarts REQUIRES `checkpointDir`: with a
    * checkpoint, a re-run over the same source directory replays
    * nothing already committed, so segments never double. Without one
    * (None — the single-shot spec/harness mode) every invocation
    * reprocesses the whole directory and MUST therefore write to a
    * fresh `segDir`, or the appended postings/df/stats would silently
    * double in [[mergedIndex]]. */
  def runAvailableNow(spark: SparkSession, dir: String,
                      segDir: String,
                      checkpointDir: Option[String] = None): Unit =
    Drain.availableNow(spark, dir, rawSchema, "documents.parquet",
      org.apache.spark.sql.functions.lit(true), checkpointDir) { batch =>
      val (p, l, st) = Search.bm25BuildIndex(batch, "doc_id", "text")
      p.write.mode("append").parquet(s"$segDir/postings")
      l.write.mode("append").parquet(s"$segDir/lexicon")
      st.write.mode("append").parquet(s"$segDir/stats")
    }

  /** [[runAvailableNow]]'s CJK twin (r12) — the last seam where the
    * CJK family lacked its word-family symmetry: each arriving
    * micro-batch of unsegmented documents is analyzed with the r08
    * unigram+bigram CJK analyzer (via the array-input index build, so
    * the batch is tokenized exactly once) and appended as an
    * immutable segment; queries serve from
    * [[mergedIndex]] after r07's exact-integer merge, which is
    * token-AGNOSTIC — postings concatenate, dfs ADD, stats ADD — so
    * merged CJK segments equal the one-shot r09 build bit-for-bit
    * over ANY micro-batch partitioning (IndexStreamSpec pins it, and
    * the serve hash-matches r08's oracle). Segments are script-token-
    * derived persisted artifacts, so the store carries the tokenizer-
    * version stamp ([[graft.ops.IndexMeta]]), guarding TWO failure
    * classes at the serve seam: an analyzer change between segment
    * writes fails loudly instead of silently splitting the lexicon
    * (checked before appending to a standing store), and a TORN
    * append — postings written, lexicon/stats not — also fails
    * closed, because the stamp is REMOVED before the drain starts and
    * re-written only after it completes, so a crash mid-append leaves
    * the store unstamped rather than serving wrong df/stats sums
    * under the previous valid stamp. `textOf` lets the harness inject
    * the fixture translate; a real deployment leaves the default raw
    * column. */
  def runAvailableNowCjk(spark: SparkSession, dir: String,
                         segDir: String,
                         textOf: org.apache.spark.sql.Column =
                           org.apache.spark.sql.functions.col("text"),
                         checkpointDir: Option[String] = None,
                         glob: String = "documents.parquet",
                         deltaFilter: org.apache.spark.sql.Column =
                           org.apache.spark.sql.functions.lit(true)): Unit = {
    // appending a segment built by a DIFFERENT tokenizer than the
    // standing segments would corrupt the merged lexicon silently —
    // check first if segments already exist; then UNSTAMP for the
    // duration of the append (torn-append fail-closed contract) and
    // re-stamp only once the drain has fully committed. An EXISTING
    // but UNSTAMPED store is a crashed append: only a CHECKPOINTED
    // restart may touch it (the checkpoint replays exactly the
    // uncommitted batches, completing the append consistently); an
    // uncheckpointed re-run would reprocess everything and double the
    // standing postings, so it fails loudly here instead.
    if (new java.io.File(segDir, "postings").exists()) {
      if (graft.ops.IndexMeta.isStamped(segDir))
        graft.ops.IndexMeta.check(segDir)
      else require(checkpointDir.isDefined,
        s"segment store at $segDir is mid-append (unstamped); only a " +
          "restart from the original stream checkpoint can complete it " +
          "— an uncheckpointed re-run would double its postings. " +
          "Provide the checkpoint or clear the store.")
    }
    graft.ops.IndexMeta.unstamp(segDir)
    Drain.availableNow(spark, dir, rawSchema, glob,
      deltaFilter, checkpointDir) { batch =>
      import org.apache.spark.sql.functions.col
      // tokenize ONCE per micro-batch (the r08 doctrine at the stream
      // edge): the index build reads the term arrays twice (corpus
      // scalars + postings), so an unmaterialized projection would run
      // the fold+regex+bigram analyzer twice per batch — measured 2×
      // the whole entry's analyzer cost at sf0.1
      val toks = batch.select(col("doc_id"),
        Search.cjkIndexTerms(textOf).as("terms")).localCheckpoint()
      val (p, l, st) = Search.bm25BuildIndexTokens(toks, "doc_id", "terms")
      p.write.mode("append").parquet(s"$segDir/postings")
      l.write.mode("append").parquet(s"$segDir/lexicon")
      st.write.mode("append").parquet(s"$segDir/stats")
    }
    graft.ops.IndexMeta.stamp(segDir)
  }

  /** [[mergedIndex]] with the CJK store's tokenizer-version check —
    * the serve seam for [[runAvailableNowCjk]] segment stores. */
  def mergedIndexCjk(spark: SparkSession,
                     segDir: String): (DataFrame, DataFrame, DataFrame) = {
    graft.ops.IndexMeta.check(segDir)
    mergedIndex(spark, segDir)
  }

  /** Read the segment store back as ONE logical index: the r07 merge
    * over however many segments the stream appended — postings are
    * already concatenated by the append writes; lexicon dfs and the
    * corpus stats re-sum exactly. Serve with
    * [[graft.ops.Search.bm25QueryIndex]]. */
  def mergedIndex(spark: SparkSession,
                  segDir: String): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, sum}
    val postings = spark.read.parquet(s"$segDir/postings")
    val lexicon = spark.read.parquet(s"$segDir/lexicon")
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
    val stats = spark.read.parquet(s"$segDir/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    (postings, lexicon, stats)
  }

  /** COMPACT a CJK segment store down to one segment (r15) — the
    * background half this object's scaladoc promises: every appended
    * micro-batch adds one lexicon/stats row-group per term, so an
    * unattended stream's serve-time merge re-sums an ever-growing
    * segment count (Lucene's exact problem, Lucene's exact answer).
    * One pass reads the merged view ([[mergedIndex]] — exact integer
    * adds), rewrites it as a single segment BESIDE the live store,
    * then swaps the subtables in. The swap runs under the
    * [[graft.ops.IndexMeta]] torn-write contract: the stamp comes off
    * before the first destructive move and back after the last, so a
    * crash mid-swap leaves an unstamped (unservable, un-appendable-
    * without-checkpoint) store instead of a silent mix of old and new
    * segments. On a real object store the swap is a manifest pointer
    * flip; the filesystem moves here are the local-mode equivalent.
    *
    * `tombstones` (optional) makes this Lucene's EXPUNGE-DELETES: the
    * rewritten segment drops the tombstoned docs' postings and
    * corrects the lexicon dfs and corpus stats from those same rows —
    * the store-wide, rebuild-time counterpart of
    * [[graft.ops.Search.bm25QueryIndexTombstoned]]'s serve-time
    * correction, after which the tombstone set can be retired. The
    * compacted store equals a fresh build over corpus-minus-tombstones
    * exactly (same integer arithmetic), so serving it needs no
    * tombstone logic at all. Same zero-term-doc contract as the
    * serve-time variant: a doc with no index terms has no posting
    * rows, so a doc_id-only tombstone cannot reclaim its n_docs slot
    * from the store — pass a tombstone table carrying `dl` (known at
    * delete time) and the removed stats come straight off it, exact
    * for zero-term docs and skipping the removed-postings pass.
    *
    * Cost shape: two passes over the merged postings — the rewrite
    * itself and one extraction of the (deletes-sized, checkpointed)
    * removed posting rows that both corrections read; one pass with
    * dl-carrying tombstones. */
  def compactCjk(spark: SparkSession, segDir: String,
                 tombstones: Option[DataFrame] = None): Unit = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit, max, sum}
    graft.ops.IndexMeta.check(segDir)
    val (p0, l0, st0) = mergedIndex(spark, segDir)
    val (p, l, st) = tombstones match {
      case None => (p0, l0, st0)
      case Some(tsRaw) =>
        val ts = broadcast(tsRaw.select(col("doc_id")).distinct())
        val live = p0.join(ts, Seq("doc_id"), "left_anti")
        // ONE extraction of the removed posting rows (deletes-sized),
        // checkpointed so the df and stats corrections don't each
        // re-scan the merged postings (the file's own tokenize-once
        // discipline, applied to the store scan)
        val rmPost = p0.join(ts, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("token"), col("dl"))
          .localCheckpoint()
        // store-wide df correction: one row per (doc, token) in the
        // postings, so count(*) per token over the removed rows is
        // the number of removed docs carrying it
        val rmDf = rmPost.groupBy(col("token")).agg(count(lit(1)).as("rm_df"))
        val lex = l0.join(rmDf, Seq("token"), "left")
          .select(col("token"),
            (col("df") - coalesce(col("rm_df"), lit(0L))).as("df"))
          .filter(col("df") > 0)
        val rm =
          if (tsRaw.columns.contains("dl"))
            tsRaw.select(col("doc_id"), col("dl")).distinct()
              .agg(count(lit(1)).as("rm_n"),
                coalesce(sum(col("dl")), lit(0L)).as("rm_dl"))
          else rmPost
            .groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
            .agg(count(lit(1)).as("rm_n"),
              coalesce(sum(col("dl")), lit(0L)).as("rm_dl"))
        val stats = st0.crossJoin(broadcast(rm))
          .select((col("n_docs") - col("rm_n")).as("n_docs"),
            (col("sum_dl") - col("rm_dl")).as("sum_dl"))
        (live, lex, stats)
    }
    // rewrite beside the live store (reads old paths, writes new —
    // never overlapping), then swap
    val tmp = s"$segDir.compacting"
    clearTree(new java.io.File(tmp),
      "stale compaction scratch — remove it and re-run")
    graft.ops.Search.bm25WriteIndex(p, l, st, tmp)
    graft.ops.IndexMeta.unstamp(segDir)
    Seq("postings", "lexicon", "stats").foreach { sub =>
      // a clear that silently left residue would surface as a
      // confusing Files.move failure mid-swap; fail loudly instead —
      // the store is already unstamped, so it cannot serve torn
      clearTree(new java.io.File(segDir, sub),
        "store left unstamped (unservable); clear it and re-compact")
      java.nio.file.Files.move(
        new java.io.File(tmp, sub).toPath,
        new java.io.File(segDir, sub).toPath)
      ()
    }
    deleteTree(new java.io.File(tmp))
    graft.ops.IndexMeta.stamp(segDir)
  }

  /** [[deleteTree]] with the clear VERIFIED — for the swap sites where
    * leftover files would corrupt or confuse the subsequent move. */
  private def clearTree(f: java.io.File, consequence: String): Unit = {
    deleteTree(f)
    if (f.exists())
      throw new IllegalStateException(
        s"could not fully remove $f — $consequence")
  }

  private def deleteTree(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteTree)
    }
    f.delete()
    ()
  }
}
