package graft.ops

import java.io.File

/** The REWRITE-BESIDE-AND-SWAP mechanics every store compaction shares
  * (the r15 search-segment move, generalized in round 18 to the
  * near-dup, media, and ANN stores): a compaction writes its rewritten
  * tables into a scratch sibling of the live store, then swaps them in
  * under the [[IndexMeta]] torn-write contract — the stamp is replaced
  * by [[SwapPoison]] before the first destructive move and by the real
  * version after the last, so a crash mid-swap leaves a
  * poison-stamped (unservable, un-appendable, un-RE-compactable) store
  * instead of a silent mix of old and new rows. On a real object store
  * the swap is a manifest pointer flip; the filesystem moves here are
  * the local-mode equivalent.
  *
  * Two layouts, matching the two persisted-store shapes in the engine:
  *  - [[swapSubtables]] for multi-subtable stores (BM25
  *    postings/lexicon/stats, the d21 signatures/bands/hashes index,
  *    the IVFPQ codes/assign dirs): only the named subdirectories are
  *    replaced, anything else under the store dir survives.
  *  - [[swapDir]] for single-table stores (the m10 frame store, whose
  *    parquet files live at the store root): the whole directory is
  *    replaced.
  */
object StoreSwap {
  /** Scratch path a compaction writes its rewritten tables into —
    * a sibling of the live store (same filesystem, so the swap is a
    * rename, not a copy). */
  def scratch(dir: String): String = s"$dir.compacting"

  /** Lucene's deletes-percentage merge policy, minimal version: pay
    * the rebuild when the tombstoned rows have grown past `maxRatio`
    * of the store's rows. Below the threshold the serve-time
    * anti-join stays the cheaper deal; above it, every query is
    * re-paying more than one compaction would cost — the trigger each
    * family's `compactIfNeeded` wrapper decides on. */
  def deletesExceed(dead: Long, total: Long, maxRatio: Double): Boolean =
    total > 0 && dead.toDouble >= maxRatio * total.toDouble

  /** ONE store scan for the ratio probe's two counts: total rows and
    * rows whose `key` is tombstoned (a separate semi-join count plus a
    * full count would scan the corpus-sized table twice for a
    * decision that usually says "don't compact"). The deletes side is
    * small by definition — broadcast left join, count(non-null). */
  def deadAndTotal(store: org.apache.spark.sql.DataFrame, key: String,
                   tombstones: org.apache.spark.sql.DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit}
    val row = store.select(col(key))
      .join(broadcast(tombstones.select(col(key)).distinct()
        .withColumn("_dead", lit(1))), Seq(key), "left")
      .agg(count(lit(1)).as("total"), count(col("_dead")).as("dead"))
      .head()
    (row.getLong(1), row.getLong(0))
  }

  /** Clear any stale scratch at [[scratch]]`(dir)` and return its path
    * — every compaction's first step (a previous crashed compaction
    * may have left one behind; its content is garbage by definition,
    * the live store was never touched before the swap). */
  def freshScratch(dir: String): String = {
    val tmp = scratch(dir)
    clearTree(new File(tmp),
      "stale compaction scratch — remove it and re-run")
    tmp
  }

  /** The stamp value a store carries WHILE a swap is rewriting it —
    * a POISON stamp, not a mere unstamp: an unstamped store is
    * indistinguishable from a torn APPEND, whose recovery contract
    * (checkpointed restart replays the in-flight batch and re-stamps)
    * would LAUNDER a half-swapped store back to validity. Under the
    * poison value every checked load and every appender's version
    * check fails with a self-explanatory `store=compaction-in-progress`
    * message, re-compaction refuses too (checkVersion at its top), and
    * the only way forward is a full republish — which unstamps,
    * rewrites everything, and stamps clean. */
  val SwapPoison = "compaction-in-progress"

  /** Swap subdirectories `subs` of the live store at `dir` for the
    * same-named subdirectories under [[scratch]]`(dir)` (already fully
    * written by the caller), then re-stamp with `version`. The caller
    * must have verified the live store's stamp BEFORE rewriting (a
    * compaction of a torn store would launder the tear). A crash
    * anywhere inside the swap leaves the [[SwapPoison]] stamp — every
    * consumer fails loudly, nothing can mistake the mix of old and
    * new subtables for either generation. */
  def swapSubtables(dir: String, subs: Seq[String], version: String): Unit = {
    IndexMeta.stampVersion(dir, SwapPoison)
    val tmp = scratch(dir)
    subs.foreach { sub =>
      // a clear that silently left residue would surface as a
      // confusing Files.move failure mid-swap; fail loudly instead —
      // the store is poison-stamped, so it cannot serve torn
      clearTree(new File(dir, sub),
        "store left poison-stamped (unservable); republish it")
      java.nio.file.Files.move(
        new File(tmp, sub).toPath,
        new File(dir, sub).toPath)
      ()
    }
    deleteTree(new File(tmp))
    IndexMeta.stampVersion(dir, version)
  }

  /** Whole-directory variant of [[swapSubtables]] for single-table
    * stores: replace the live store's DATA FILES with the scratch
    * dir's, then re-stamp. The store directory itself (and its poison
    * stamp) survive the whole swap — deleting the directory would
    * open a store-never-existed window in which an appender's
    * existing-store guards simply don't fire and the standing corpus
    * silently vanishes under a fresh valid stamp. */
  def swapDir(dir: String, version: String): Unit = {
    IndexMeta.stampVersion(dir, SwapPoison)
    val tmp = scratch(dir)
    val d = new File(dir)
    val kids = d.listFiles()
    if (kids != null) kids.foreach { kid =>
      if (kid.getName != IndexMeta.StampFile)
        clearTree(kid,
          "store left poison-stamped (unservable); republish it")
    }
    val tkids = new File(tmp).listFiles()
    if (tkids != null) tkids.foreach { kid =>
      java.nio.file.Files.move(kid.toPath,
        new File(d, kid.getName).toPath)
      ()
    }
    deleteTree(new File(tmp))
    IndexMeta.stampVersion(dir, version)
  }

  /** [[deleteTree]] with the clear VERIFIED — for the swap sites where
    * leftover files would corrupt or confuse the subsequent move. */
  def clearTree(f: File, consequence: String): Unit = {
    deleteTree(f)
    if (f.exists())
      throw new IllegalStateException(
        s"could not fully remove $f — $consequence")
  }

  def deleteTree(f: File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteTree)
    }
    f.delete()
    ()
  }
}
