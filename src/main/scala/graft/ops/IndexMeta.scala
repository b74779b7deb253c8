package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

/** Artifact-version stamping for PERSISTED derived stores — any store
  * that is a pure function of (data, some engine definition) where the
  * DEFINITION moves between releases:
  *
  *  - TOKEN stores (the d21 char-shingle index, the r09 CJK BM25
  *    index, the shared token-array store, the r12 segment stores):
  *    pure functions of [[TextOps.scriptTokens]], whose definition
  *    moved in round 15 (fold table, Ext-A) and round 16 (Hangul). An
  *    index published under an older tokenizer is silently
  *    incompatible with new delta-side tokenization — shingles and
  *    terms simply stop matching, so near-dup pairs and postings are
  *    MISSED with no error anywhere.
  *  - VECTOR stores (k15 PQ codes/codebooks, k24 SQ8 stats/codes, p07
  *    IVF coarse layer, m10 frame signatures): pure functions of the
  *    embedding/encoder version and the quantizer geometry
  *    ([[Similarity.annVersion]], [[Multimodal.frameVersion]]). A
  *    re-trained or swapped encoder silently zeroes ANN recall
  *    against a stale index — same failure class, embedding space
  *    instead of token space.
  *
  * A version stamp turns both silent recall holes into a loud
  * load-time failure, the same contract every search engine enforces
  * between its analyzer version and its segments (and FAISS leaves to
  * the user, to everyone's regret).
  *
  * The stamp is one tiny driver-side file next to the parquet
  * subtables; it is written AFTER the artifact's data (a crash
  * mid-publish leaves an unstamped, therefore unloadable, store —
  * failing closed). Append-mode stores ([[graft.streaming.IndexStream]]
  * segment dirs) additionally [[unstamp]] BEFORE each append and
  * re-stamp after, so a crash mid-append also fails closed instead of
  * serving a torn segment under the previous valid stamp. */
object IndexMeta {
  private[ops] val StampFile = "_ARTIFACT_VERSION"

  /** Mark `dir`'s artifacts as built by the CURRENT tokenizer — the
    * token-store convenience form of [[stampVersion]]. */
  def stamp(dir: String): Unit = stampVersion(dir, TextOps.tokenizerVersion)

  /** Mark `dir`'s artifacts as built under `version` (an
    * engine-definition fingerprint: tokenizer version for token
    * stores, encoder+quantizer fingerprint for vector stores). */
  def stampVersion(dir: String, version: String): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    java.nio.file.Files.write(new java.io.File(d, StampFile).toPath,
      version.getBytes(UTF_8))
    ()
  }

  /** Remove `dir`'s stamp (tolerating its absence) — the append-seam
    * half of the torn-write contract: an appender unstamps, appends,
    * and re-stamps, so a crash mid-append leaves the store unloadable
    * rather than serving half a segment under the old valid stamp. */
  def unstamp(dir: String): Unit = {
    java.nio.file.Files.deleteIfExists(
      new java.io.File(dir, StampFile).toPath)
    ()
  }

  /** Does `dir` carry any stamp at all? Appenders use this to tell a
    * HEALTHY standing store (stamped — verify the version, then
    * append) from one torn by a crashed append (unstamped — only a
    * checkpointed restart may complete it; see
    * [[graft.streaming.IndexStream.runAvailableNowCjk]]). */
  def isStamped(dir: String): Boolean =
    new java.io.File(dir, StampFile).isFile

  /** Fail loudly unless `dir` was stamped by the CURRENT tokenizer —
    * the token-store convenience form of [[checkVersion]]. */
  def check(dir: String): Unit = checkVersion(dir, TextOps.tokenizerVersion)

  /** Fail loudly unless `dir` was stamped with exactly `expected`.
    * An absent stamp fails too: it means the store predates
    * versioning, a publish died mid-write, or an append died between
    * [[unstamp]] and re-stamp — all cases where serving would
    * silently miss matches. */
  def checkVersion(dir: String, expected: String): Unit = {
    val f = new java.io.File(dir, StampFile)
    val found =
      if (f.isFile)
        new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8).trim
      else "<unstamped>"
    if (found != expected)
      throw new IllegalStateException(
        s"artifact version mismatch for persisted index at $dir: " +
          s"store=$found, engine=$expected — " +
          "rebuild the store with the current engine definition (a stale " +
          "store would silently miss matches / zero recall)")
  }
}
