package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Hierarchical report generation — the Spark re-expression of
  * `text_processing.py:33-141`.
  *
  * Everything upstream is relational and Catalyst-optimized; this stage is
  * inherently sequential *per record* (ordered nested grouping, run-length
  * header suppression, indent assembly), so the idiomatic seam is
  * `groupByKey(RECORD_ID).mapGroups` with plain Scala inside — each group
  * is one medical record (tiny), and records distribute across executors,
  * so the operator scales horizontally with record count.
  */
object Report {

  /** One row of the per-language canonical view (P3/P4:
    * `text_processing.py:41-49`). `rewritten` carries the pre-joined
    * LLM rewrite of `summary` on the [[reportJoined]] path (None = no
    * join match, or the map-lookup path). */
  private[etl] final case class RRow(group: String, itemCode: String,
                                itemName: String, comment: String,
                                summary: String,
                                rewritten: Option[String] = None)

  private def s(r: Row, i: Int): String =
    if (r.isNullAt(i)) "" else String.valueOf(r.get(i))

  /** `process_1_record` (`text_processing.py:66-126`) ported as sequential
    * Scala over the record's rows, already sorted in display order.
    *
    * Hierarchy: GROUP (indent 0) → ITEMS (4) → COMMENTS (8) → SUMMARY (12,
    * with a trailing blank line). Nested groupings are first-occurrence
    * ordered (pandas `groupby(sort=False)`); rows whose SUMMARY equals the
    * language default are sub-grouped per COMMENT, all others per SUMMARY;
    * blocks re-order by first-seen item tuple; repeated item headers are
    * run-length suppressed.
    */
  private[etl] def processOneRecord(lang: String, rows: Seq[RRow],
                                    lookup: String => String): String = {
    val defaultText = Schemas.LANG_DEFAULT_SUMMARY.getOrElse(lang, "")

    // A7 — first-occurrence item-name collection keyed by trimmed code
    // (`text_processing.py:129-141`).
    def uniqueItemNames(rs: Seq[RRow]): Vector[String] = {
      val seen = mutable.LinkedHashSet[String]()
      val out = Vector.newBuilder[String]
      rs.foreach { r =>
        val code = r.itemCode.trim
        if (!seen.contains(code)) { seen += code; out += r.itemName.trim }
      }
      out.result()
    }

    // pandas groupby(sort=False): groups in first-occurrence order; rows
    // within a group keep frame order, even when non-contiguous.
    def groupedBy(rs: Seq[RRow])(key: RRow => String): Vector[(String, Vector[RRow])] = {
      val m = mutable.LinkedHashMap[String, mutable.ArrayBuffer[RRow]]()
      rs.foreach(r => m.getOrElseUpdate(key(r), mutable.ArrayBuffer()) += r)
      m.iterator.map { case (k, v) => (k, v.toVector) }.toVector
    }

    final case class Block(items: Vector[String], comments: Vector[String],
                           summary: String, rewritten: Option[String])

    val lines = mutable.ArrayBuffer[String]()
    groupedBy(rows)(_.group).foreach { case (group, dfGroup) =>
      lines += group.trim

      val blocks = mutable.ArrayBuffer[Block]()
      groupedBy(dfGroup)(_.summary).foreach { case (summary, dfSummary) =>
        if (summary == defaultText) {
          // default-summary branch: one block per COMMENT
          // (`text_processing.py:86-93`).
          groupedBy(dfSummary)(_.comment).foreach { case (comment, dfComment) =>
            blocks += Block(uniqueItemNames(dfComment),
              Vector(comment.trim), summary.trim, dfComment.head.rewritten)
          }
        } else {
          // one block per SUMMARY with its distinct comments in
          // first-occurrence order (`text_processing.py:94-101`).
          blocks += Block(uniqueItemNames(dfSummary),
            dfSummary.map(_.comment.trim).distinct.toVector, summary.trim,
            dfSummary.head.rewritten)
        }
      }

      // A8/O2 — blocks reorder by (first-seen item tuple, original index)
      // (`text_processing.py:103-110`).
      val firstSeen = mutable.HashMap[Vector[String], Int]()
      blocks.zipWithIndex.foreach { case (b, i) =>
        if (!firstSeen.contains(b.items)) firstSeen(b.items) = i
      }
      val ordered = blocks.zipWithIndex
        .sortBy { case (b, i) => (firstSeen(b.items), i) }

      // W2 — run-length suppression of repeated item headers
      // (`text_processing.py:112-117`); X10/X11 — `、` joins + indents.
      var lastItems: Option[Vector[String]] = None
      ordered.foreach { case (block, _) =>
        if (!lastItems.contains(block.items)) {
          lines += s"    ${block.items.mkString("、")}"
          lastItems = Some(block.items)
        }
        if (block.comments.nonEmpty)
          lines += s"        ${block.comments.mkString("、")}"
        if (block.summary.nonEmpty)
          lines += s"            ${block.rewritten.getOrElse(lookup(block.summary))}\n"
      }
    }
    lines.mkString("\n")
  }

  /** The serializer's DECISION layer — ordered nested grouping (A5–A8),
    * block reorder by first-seen item tuple (O2) and run-length header
    * suppression (W2) — re-expressed as a fully relational window/agg
    * plan, one block per output row. [[processOneRecord]] makes the same
    * decisions sequentially inside `mapGroups`; this variant exists so
    * they sit under the DuckDB hash gate (query `p02_report_blocks`) and
    * so the block structure is queryable without string assembly.
    * `ReportBlocksSpec` pins the two layers to each other: assembling
    * these rows reproduces [[processOneRecord]]'s text byte-for-byte.
    *
    * Input frame columns: `record_id` (any orderable type), `grp`,
    * `item_code`, `item_name`, `comment`, `summary` (strings), `ord`
    * (long; the display order, unique per row — the `_rid` analog).
    *
    * Decision mapping (reference `text_processing.py:66-126`):
    *  - pandas `groupby(sort=False)` = "first occurrence wins" = `min(ord)`
    *    windows per (grp), (grp, summary), (grp, summary, comment);
    *  - the default-summary branch blocks per COMMENT, others per
    *    SUMMARY: `blk_first`/`blk2` switch on `summary = default`;
    *  - per-block item names: first occurrence keyed by TRIMMED code
    *    (`uniqueItemNames`) = min-ord per code + `min_by` name, reheaded
    *    in code-first order;
    *  - per-block comments: trimmed-distinct in first-occurrence order
    *    (the default branch's single comment falls out of the same
    *    aggregate, since its block key pins the comment);
    *  - reorder = `row_number` over (first_seen(items), original index);
    *    suppression = `lag(items)` inequality. Item tuples compare by
    *    their `、`-joined header string (collision with a `、` inside a
    *    name is theoretically possible, never in the reference's data).
    *
    * Scale shape: everything is hash-partitionable by record — windows
    * partition by (record_id, …) and aggregations group by block keys, so
    * the plan is shuffle-on-record-key then map-local, no global sort,
    * no driver state. Output: one row per block,
    * `(record_id, grp_ord, grp, block_ord, show_header, items, comments,
    * summary)`. */
  def reportBlocks(frame: DataFrame, defaultSummary: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wG = Window.partitionBy(col("record_id"), col("grp"))
    val wS = Window.partitionBy(col("record_id"), col("grp"), col("summary"))
    val wC = Window.partitionBy(col("record_id"), col("grp"), col("summary"),
      col("comment"))
    val b1 = frame
      .withColumn("is_def", col("summary") === lit(defaultSummary))
      .withColumn("g_first", min(col("ord")).over(wG))
      .withColumn("s_first", min(col("ord")).over(wS))
      .withColumn("c_first", min(col("ord")).over(wC))
      .withColumn("blk_first",
        when(col("is_def"), col("c_first")).otherwise(col("s_first")))
      .withColumn("blk2", when(col("is_def"), col("comment")).otherwise(lit("")))
    val blkKeyNames =
      Seq("record_id", "grp", "summary", "blk2", "g_first", "s_first", "blk_first")
    val blkKeys = blkKeyNames.map(col)
    val items = b1
      .groupBy(blkKeys :+ trim(col("item_code")).as("code"): _*)
      .agg(min(col("ord")).as("code_first"),
        min_by(trim(col("item_name")), col("ord")).as("name"))
      .groupBy(blkKeys: _*)
      .agg(expr("transform(array_sort(collect_list(struct(code_first, name))), s -> s.name)")
        .as("item_names"))
    val comments = b1
      .groupBy(blkKeys :+ trim(col("comment")).as("cmt"): _*)
      .agg(min(col("ord")).as("cmt_first"))
      .groupBy(blkKeys: _*)
      .agg(expr("transform(array_sort(collect_list(struct(cmt_first, cmt))), s -> s.cmt)")
        .as("comment_list"))
    val wEnum = Window.partitionBy(col("record_id"), col("grp"))
      .orderBy(col("s_first"), col("blk_first"))
    val e0 = items.join(comments, blkKeyNames)
      .withColumn("blk_idx", row_number().over(wEnum))
      .withColumn("items_key", array_join(col("item_names"), "、"))
    val wFS = Window.partitionBy(col("record_id"), col("grp"), col("items_key"))
    val wOrd = Window.partitionBy(col("record_id"), col("grp"))
      .orderBy(col("first_seen"), col("blk_idx"))
    val wRec = Window.partitionBy(col("record_id")).orderBy(col("g_first"))
    e0.withColumn("first_seen", min(col("blk_idx")).over(wFS))
      .withColumn("block_ord", row_number().over(wOrd).cast("long"))
      .withColumn("prev_key", lag(col("items_key"), 1).over(wOrd))
      .withColumn("show_header",
        col("prev_key").isNull || col("prev_key") =!= col("items_key"))
      .withColumn("grp_ord", dense_rank().over(wRec).cast("long"))
      .select(col("record_id"), col("grp_ord"), trim(col("grp")).as("grp"),
        col("block_ord"), col("show_header"), col("items_key").as("items"),
        array_join(col("comment_list"), "、").as("comments"),
        trim(col("summary")).as("summary"))
  }

  /** The `p02_report_blocks` input: a synthetic hierarchy frame derived
    * from the harness `documents` table (docs bucket into records; `lang`
    * plays the group so groups interleave; every third row carries the
    * default summary to exercise the per-comment branch). Mirrored
    * literally by [[blocksOracleSql]]. */
  def blocksInput(docs: DataFrame): DataFrame = docs.select(
    (col("doc_id") % 40).as("record_id"),
    col("lang").as("grp"),
    col("source").as("item_code"),
    upper(col("source")).as("item_name"),
    concat(lit("c"), (col("doc_id") % 7).cast("string")).as("comment"),
    when(col("doc_id") % 3 === 0, lit(BlocksDefault))
      .otherwise(concat(lit("s"), (col("doc_id") % 5).cast("string"))).as("summary"),
    col("doc_id").as("ord"))

  val BlocksDefault = "-"

  /** DuckDB replay of [[blocksInput]] → [[reportBlocks]]. */
  def blocksOracleSql: String =
    s"""WITH src AS (
       |  SELECT doc_id % 40 AS record_id, lang AS grp, source AS item_code,
       |    upper(source) AS item_name,
       |    'c' || CAST(doc_id % 7 AS VARCHAR) AS comment,
       |    CASE WHEN doc_id % 3 = 0 THEN '$BlocksDefault'
       |         ELSE 's' || CAST(doc_id % 5 AS VARCHAR) END AS summary,
       |    doc_id AS ord
       |  FROM documents),
       |b1 AS (
       |  SELECT *, summary = '$BlocksDefault' AS is_def,
       |    min(ord) OVER (PARTITION BY record_id, grp) AS g_first,
       |    min(ord) OVER (PARTITION BY record_id, grp, summary) AS s_first,
       |    min(ord) OVER (PARTITION BY record_id, grp, summary, comment) AS c_first
       |  FROM src),
       |b2 AS (
       |  SELECT *, CASE WHEN is_def THEN c_first ELSE s_first END AS blk_first,
       |    CASE WHEN is_def THEN comment ELSE '' END AS blk2
       |  FROM b1),
       |i0 AS (
       |  SELECT record_id, grp, summary, blk2, g_first, s_first, blk_first,
       |    trim(item_code) AS code, min(ord) AS code_first,
       |    min_by(trim(item_name), ord) AS name
       |  FROM b2 GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |i1 AS (
       |  SELECT record_id, grp, summary, blk2, g_first, s_first, blk_first,
       |    list(name ORDER BY code_first) AS item_names
       |  FROM i0 GROUP BY 1, 2, 3, 4, 5, 6, 7),
       |c0 AS (
       |  SELECT record_id, grp, summary, blk2, g_first, s_first, blk_first,
       |    trim(comment) AS cmt, min(ord) AS cmt_first
       |  FROM b2 GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |c1 AS (
       |  SELECT record_id, grp, summary, blk2, g_first, s_first, blk_first,
       |    list(cmt ORDER BY cmt_first) AS comment_list
       |  FROM c0 GROUP BY 1, 2, 3, 4, 5, 6, 7),
       |e0 AS (
       |  SELECT i1.*, c1.comment_list,
       |    row_number() OVER (PARTITION BY i1.record_id, i1.grp
       |      ORDER BY i1.s_first, i1.blk_first) AS blk_idx,
       |    array_to_string(i1.item_names, '、') AS items_key
       |  FROM i1 JOIN c1 USING (record_id, grp, summary, blk2, g_first, s_first, blk_first)),
       |e1 AS (
       |  SELECT *, min(blk_idx) OVER (PARTITION BY record_id, grp, items_key) AS first_seen
       |  FROM e0),
       |e2 AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY record_id, grp ORDER BY first_seen, blk_idx) AS block_ord,
       |    lag(items_key) OVER (PARTITION BY record_id, grp ORDER BY first_seen, blk_idx) AS prev_key
       |  FROM e1)
       |SELECT record_id,
       |  dense_rank() OVER (PARTITION BY record_id ORDER BY g_first) AS grp_ord,
       |  trim(grp) AS grp, block_ord,
       |  (prev_key IS NULL OR prev_key <> items_key) AS show_header,
       |  items_key AS items,
       |  array_to_string(comment_list, '、') AS comments,
       |  trim(summary) AS summary
       |FROM e2""".stripMargin

  /** Assemble reports: cleaned frame → one `(record_id, report, request)`
    * row per record, in request order (`text_processing.py:33-62`).
    *
    * Documented divergences from the reference, all for degenerate
    * inputs only:
    *  - a record whose findings are ALL filtered out (empty ITEMS, or
    *    every COMMENT blank) makes the reference crash with a KeyError
    *    at `text_processing.py:39` (`get_group` on a missing key) → the
    *    whole request 500s; here the record is simply absent from the
    *    output — graceful degradation over crash replication;
    *  - duplicate RECORD_IDs across records emit one output row per
    *    distinct id (first request echoed), not one per request entry;
    *  - an unknown LANG_NO (not "1"–"4") makes the reference crash with
    *    a KeyError at `text_processing.py:36` (`LANGU_SUBSET[langu_no]`)
    *    → the whole request 500s; here the record renders with the
    *    language-1 (TC) columns and defaults — again graceful
    *    degradation, pinned by `GoldenPipelineSpec`'s unknown-language
    *    case.
    *
    * @param cleaned  output of [[Clean.clean]] (22 columns + `_rid`)
    * @param echo     output of [[Ingest.requestEcho]]
    * @param rewrite  (langNo, summary) → rewritten, from [[Llm.rewriteMap]]
    */
  def report(cleaned: DataFrame, echo: DataFrame,
             rewrite: Map[(String, String), String]): DataFrame = {
    val rewriteB = cleaned.sparkSession.sparkContext.broadcast(rewrite)
    assemble(cleaned, echo,
      (lang, summary) => rewriteB.value.getOrElse((lang, summary), summary))
  }

  /** [[report]] with the LLM rewrites applied as a BROADCAST LEFT JOIN
    * instead of a driver-collected map — the X12 lookup
    * (`text_processing.py:124`) without any driver hop, so the rewrite
    * set may be arbitrarily large (it only has to fit a broadcast, and
    * at that point a shuffle join is the next rung, not a driver map).
    *
    * Join key = (trimmed LANG_NO, trimmed per-language SUMMARY), exactly
    * the key [[Llm.rewriteMap]] builds; non-matches keep the original
    * summary, matching the map's `getOrElse`. Byte-identical output to
    * [[report]] — pinned by `PipelinePropertiesSpec` (map ≡ join on
    * random requests) and the golden suite.
    *
    * @param rewrite output of [[Llm.rewriteFrame]]:
    *                `(_rw_lang, _rw_orig, _rw_text)`
    */
  def reportJoined(cleaned: DataFrame, echo: DataFrame,
                   rewrite: DataFrame): DataFrame = {
    val lang = trim(col("LANG_NO").cast("string"))
    // same per-language CASE as Llm.summaryPairs — the column the
    // serializer will read for this row's language
    val summary = Schemas.LANG_SUBSET.foldLeft(lit(null).cast("string")) {
      case (acc, (l, cols)) => when(lang === l, col(cols(7)).cast("string")).otherwise(acc)
    }
    val joined = cleaned
      .join(broadcast(rewrite),
        lang === col("_rw_lang") && trim(summary) === col("_rw_orig"), "left")
      .drop("_rw_lang", "_rw_orig")
      .withColumnRenamed("_rw_text", "_summary_rw")
    assemble(joined, echo, (_, summary) => summary)
  }

  /** Shared serializer core: groups the frame by RECORD_ID and runs
    * [[processOneRecord]] per record. If the frame carries a
    * `_summary_rw` column (the joined path), each row's rewrite rides
    * in-row; otherwise `fallback(lang, summary)` resolves lookups. */
  private def assemble(frame: DataFrame, echo: DataFrame,
                       fallback: (String, String) => String): DataFrame = {
    val spark = frame.sparkSession
    import spark.implicits._

    val schema = frame.schema
    val idx = schema.fieldNames.zipWithIndex.toMap
    val recordIdIdx = idx("RECORD_ID")
    val langIdx = idx("LANG_NO")
    val groupNoIdx = idx("GROUPNO")
    val tcItemIdx = idx("TCNAME_ITEM")
    val itemCodeIdx = idx("ITEM_CODE")
    val ridIdx = idx("_rid")
    val rwIdx: Option[Int] = idx.get("_summary_rw")
    // per-language column positions for GROUP / ITEM_NAME / COMMENT / SUMMARY
    val langCols: Map[String, (Int, Int, Int, Int)] =
      Schemas.LANG_SUBSET.map { case (lang, cols) =>
        lang -> ((idx(cols(3)), idx(cols(5)), idx(cols(6)), idx(cols(7))))
      }

    val reports = frame
      .groupByKey(r => if (r.isNullAt(recordIdIdx)) "" else String.valueOf(r.get(recordIdIdx)))
      .mapGroups { (recordId, it) =>
        // Display order within the record (`data_preprocessing.py:75` +
        // ingest-ordinal stability): GROUPNO, TCNAME_ITEM, _rid.
        val rows = it.toVector.sortBy { r =>
          val rid = r.getStruct(ridIdx)
          (if (r.isNullAt(groupNoIdx)) Int.MaxValue else r.getInt(groupNoIdx),
            s(r, tcItemIdx),
            (rid.getLong(0), rid.getInt(1), rid.getInt(2), rid.getInt(3)))
        }
        val lang = s(rows.head, langIdx).trim
        val (gi, ii, ci, si) = langCols.getOrElse(lang, langCols("1"))
        val rrows = rows.map(r =>
          RRow(s(r, gi), s(r, itemCodeIdx), s(r, ii), s(r, ci), s(r, si),
            rwIdx.flatMap(i => if (r.isNullAt(i)) None else Some(r.getString(i)))))
        val lookup = (summary: String) => fallback(lang, summary)
        (recordId, processOneRecord(lang, rrows, lookup))
      }
      .toDF("record_id", "report")

    reports
      .join(echo.withColumnRenamed("RECORD_ID", "record_id"), Seq("record_id"))
      .orderBy(col("_rec_ord"))
      .select(col("record_id"), col("report"), col("_request_json").as("request"))
  }
}
