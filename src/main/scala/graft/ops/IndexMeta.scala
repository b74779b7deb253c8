package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

/** Tokenizer-version stamping for PERSISTED script-token artifacts —
  * the d21 char-shingle index, the r09 CJK BM25 index, the shared
  * token-array store, and the streaming stores served from them.
  *
  * Why this exists: those stores are pure functions of
  * [[TextOps.scriptTokens]], and the tokenizer DEFINITION moves
  * (round 15 widened the fold table and added Ext-A; round 16 added
  * Hangul). An index published under an older definition is silently
  * incompatible with new delta-side tokenization — shingles and terms
  * simply stop matching, so near-dup pairs and postings are MISSED
  * with no error anywhere. A version stamp turns that silent recall
  * hole into a loud load-time failure, the same contract every search
  * engine enforces between its analyzer version and its segments.
  *
  * The stamp is one tiny driver-side file next to the parquet
  * subtables; it is written AFTER the artifact's data (a crash
  * mid-publish leaves an unstamped, therefore unloadable, store —
  * failing closed). */
object IndexMeta {
  private val StampFile = "_TOKENIZER_VERSION"

  /** Mark `dir`'s artifacts as built by the CURRENT tokenizer. */
  def stamp(dir: String): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    java.nio.file.Files.write(new java.io.File(d, StampFile).toPath,
      TextOps.tokenizerVersion.getBytes(UTF_8))
    ()
  }

  /** Fail loudly unless `dir` was stamped by the CURRENT tokenizer.
    * An absent stamp fails too: it means the store predates
    * versioning (or a publish died mid-write) — both cases where
    * serving would silently miss matches. */
  def check(dir: String): Unit = {
    val f = new java.io.File(dir, StampFile)
    val found =
      if (f.isFile)
        new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8).trim
      else "<unstamped>"
    if (found != TextOps.tokenizerVersion)
      throw new IllegalStateException(
        s"tokenizer version mismatch for persisted index at $dir: " +
          s"store=$found, engine=${TextOps.tokenizerVersion} — " +
          "rebuild the index with the current tokenizer (a stale store " +
          "would silently miss shingle/term matches)")
  }
}
