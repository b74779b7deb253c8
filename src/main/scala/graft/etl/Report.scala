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
  private final case class RRow(group: String, itemCode: String,
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
