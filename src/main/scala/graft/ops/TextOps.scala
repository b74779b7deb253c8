package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`
  * (SURVEY.md §7.5): tokenization, token frequencies, quality scoring,
  * token counting (whitespace + regex), language-ID heuristic, and a
  * rolling-hash document fingerprint.
  *
  * Everything here is built-in expressions / higher-order functions —
  * fully whole-stage-codegen'd, no UDFs, so a 100 TB `documents` scan
  * stays one embarrassingly-parallel map stage (plus one shuffle for the
  * token-frequency aggregation, which is the minimum possible).
  */
object TextOps {
  /** English stopword sample for the ratio + language-ID heuristics.
    * Kept tiny and inlined so the oracle SQL can repeat it verbatim. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  private def swList = Stopwords.map(w => s"'$w'").mkString(", ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tokenize + explode + frequency count: the S3 generator shape over
    // text. One shuffle (token agg), map-side partial counts first.
    "t01_token_freq" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(25)
    }),

    // Quality scoring: length, word count, stopword ratio, punct count,
    // mean word length — the classic pre-training quality gates.
    "t02_quality" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("words", expr("filter(split(text, ' '), x -> x <> '')"))
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("len"),
          size(col("words")).cast("long").as("n_words"),
          expr(s"size(filter(words, x -> x IN ($swList)))").cast("long").as("n_stop"),
          expr("""size(filter(split(text, ''), ch -> ch IN ('.', ',', '!', '?', ';', ':')))""").cast("long").as("n_punct"),
          // int/int division: one IEEE op, bit-identical across engines
          (expr("size(filter(words, x -> x IN (" + swList + ")))").cast("double") /
            size(col("words")).cast("double")).as("stop_ratio"))
    }),

    // Token counting two ways: whitespace split vs BPE-ish regex classes
    // (runs of letters / digits / single other-symbols).
    "t03_token_counts" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          expr("size(filter(split(text, ' '), x -> x <> ''))").cast("long").as("n_ws_tokens"),
          regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long").as("n_re_tokens"))
    }),

    // Document fingerprint: base-31 rolling hash over all code points —
    // a deterministic, order-sensitive whole-doc signature (the building
    // block the dedup ops reuse per-shingle).
    "t04_fingerprint" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), Hashing.polyHash("text").as("fp"))
    }),

    // TF/DF statistics — the exact-integer core of TF-IDF (the idf log
    // stays downstream: transcendental functions are not bit-portable
    // across engines, the counts are). One explode + two aggregations;
    // df joins back on the token key.
    "t06_tf_df" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(expr("filter(split(text, ' '), x -> x <> '')")).as("token"))
      val tf = tok.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = tok.select(col("doc_id"), col("token")).distinct()
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(df, "token")
        .select(col("doc_id"), col("token"), col("tf"), col("df"))
    }),

    // Language-ID n-gram/stopword heuristic: score = English stopword
    // hits per token; classify en vs unk. (The synthetic corpus is
    // English-vocab with a `lang` label column; the heuristic's value is
    // its determinism + shape — one codegen'd map over the scan.)
    "t05_lang_id" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("words", expr("filter(split(text, ' '), x -> x <> '')"))
        .withColumn("hits", expr(s"size(filter(words, x -> x IN ($swList)))"))
        .select(
          col("doc_id"), col("lang").as("labeled_lang"),
          when(col("hits") >= 2, "en").otherwise("unk").as("guessed_lang"),
          col("hits").cast("long").as("n_stopword_hits"))
    }))

  def oracle: Map[String, String] = Map(
    "t01_token_freq" ->
      """SELECT token, count(*) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) toks
        |WHERE token <> '' GROUP BY token
        |ORDER BY freq DESC, token LIMIT 25""".stripMargin,
    "t02_quality" ->
      s"""SELECT doc_id, length(text) AS len,
         |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
         |  len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''), x -> x IN ($swList))) AS n_stop,
         |  len(list_filter(string_split(text, ''), ch -> ch IN ('.', ',', '!', '?', ';', ':'))) AS n_punct,
         |  len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''), x -> x IN ($swList)))::DOUBLE
         |    / len(list_filter(string_split(text, ' '), x -> x <> ''))::DOUBLE AS stop_ratio
         |FROM documents""".stripMargin,
    "t03_token_counts" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_re_tokens
        |FROM documents""".stripMargin,
    "t04_fingerprint" ->
      s"SELECT doc_id, ${Hashing.polyHashSql("text")} AS fp FROM documents",
    "t06_tf_df" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tok) u GROUP BY token)
        |SELECT tf.doc_id, tf.token, tf.tf, df.df FROM tf JOIN df ON tf.token = df.token""".stripMargin,
    "t05_lang_id" ->
      s"""SELECT doc_id, lang AS labeled_lang,
         |  CASE WHEN len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''), x -> x IN ($swList))) >= 2
         |       THEN 'en' ELSE 'unk' END AS guessed_lang,
         |  len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''), x -> x IN ($swList))) AS n_stopword_hits
         |FROM documents""".stripMargin)
}
