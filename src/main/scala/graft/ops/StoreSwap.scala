package graft.ops

import java.io.File

/** The REWRITE-BESIDE-AND-SWAP mechanics every store compaction shares
  * (the r15 search-segment move, generalized in round 18 to the
  * near-dup, media, and ANN stores): a compaction writes its rewritten
  * tables into a scratch sibling of the live store, then swaps them in
  * under the [[IndexMeta]] torn-write contract — the stamp comes off
  * before the first destructive move and back after the last, so a
  * crash mid-swap leaves an unstamped (unservable) store instead of a
  * silent mix of old and new rows. On a real object store the swap is
  * a manifest pointer flip; the filesystem moves here are the
  * local-mode equivalent.
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

  /** Swap subdirectories `subs` of the live store at `dir` for the
    * same-named subdirectories under [[scratch]]`(dir)` (already fully
    * written by the caller), then re-stamp with `version`. The caller
    * must have verified the live store's stamp BEFORE rewriting (a
    * compaction of a torn store would launder the tear). */
  def swapSubtables(dir: String, subs: Seq[String], version: String): Unit = {
    val tmp = scratch(dir)
    IndexMeta.unstamp(dir)
    subs.foreach { sub =>
      // a clear that silently left residue would surface as a
      // confusing Files.move failure mid-swap; fail loudly instead —
      // the store is already unstamped, so it cannot serve torn
      clearTree(new File(dir, sub),
        "store left unstamped (unservable); clear it and re-compact")
      java.nio.file.Files.move(
        new File(tmp, sub).toPath,
        new File(dir, sub).toPath)
      ()
    }
    deleteTree(new File(tmp))
    IndexMeta.stampVersion(dir, version)
  }

  /** Whole-directory variant of [[swapSubtables]] for single-table
    * stores: replace the live store's entire contents with the
    * scratch dir's, then re-stamp. */
  def swapDir(dir: String, version: String): Unit = {
    val tmp = scratch(dir)
    IndexMeta.unstamp(dir)
    clearTree(new File(dir),
      "store left unstamped (unservable); clear it and re-compact")
    java.nio.file.Files.move(new File(tmp).toPath, new File(dir).toPath)
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
