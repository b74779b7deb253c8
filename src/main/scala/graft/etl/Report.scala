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
    * `text_processing.py:41-49`). */
  private final case class RRow(group: String, itemCode: String,
                                itemName: String, comment: String,
                                summary: String)

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
                           summary: String)

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
              Vector(comment.trim), summary.trim)
          }
        } else {
          // one block per SUMMARY with its distinct comments in
          // first-occurrence order (`text_processing.py:94-101`).
          blocks += Block(uniqueItemNames(dfSummary),
            dfSummary.map(_.comment.trim).distinct.toVector, summary.trim)
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
          lines += s"            ${lookup(block.summary)}\n"
      }
    }
    lines.mkString("\n")
  }

  /** Assemble reports: cleaned frame → one `(record_id, report, request)`
    * row per record, in request order (`text_processing.py:33-62`).
    *
    * Documented divergences from the reference, both for degenerate
    * inputs only:
    *  - a record whose findings are ALL filtered out (empty ITEMS, or
    *    every COMMENT blank) makes the reference crash with a KeyError
    *    at `text_processing.py:39` (`get_group` on a missing key) → the
    *    whole request 500s; here the record is simply absent from the
    *    output — graceful degradation over crash replication;
    *  - duplicate RECORD_IDs across records emit one output row per
    *    distinct id (first request echoed), not one per request entry.
    *
    * @param cleaned  output of [[Clean.clean]] (22 columns + `_rid`)
    * @param echo     output of [[Ingest.requestEcho]]
    * @param rewrite  (langNo, summary) → rewritten, from [[Llm.rewriteMap]]
    */
  def report(cleaned: DataFrame, echo: DataFrame,
             rewrite: Map[(String, String), String]): DataFrame = {
    val spark = cleaned.sparkSession
    import spark.implicits._

    val schema = cleaned.schema
    val idx = schema.fieldNames.zipWithIndex.toMap
    val recordIdIdx = idx("RECORD_ID")
    val langIdx = idx("LANG_NO")
    val groupNoIdx = idx("GROUPNO")
    val tcItemIdx = idx("TCNAME_ITEM")
    val itemCodeIdx = idx("ITEM_CODE")
    val ridIdx = idx("_rid")
    // per-language column positions for GROUP / ITEM_NAME / COMMENT / SUMMARY
    val langCols: Map[String, (Int, Int, Int, Int)] =
      Schemas.LANG_SUBSET.map { case (lang, cols) =>
        lang -> ((idx(cols(3)), idx(cols(5)), idx(cols(6)), idx(cols(7))))
      }

    val rewriteB = spark.sparkContext.broadcast(rewrite)

    val reports = cleaned
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
          RRow(s(r, gi), s(r, itemCodeIdx), s(r, ii), s(r, ci), s(r, si)))
        val lookup = (summary: String) =>
          rewriteB.value.getOrElse((lang, summary), summary)
        (recordId, processOneRecord(lang, rrows, lookup))
      }
      .toDF("record_id", "report")

    reports
      .join(echo.withColumnRenamed("RECORD_ID", "record_id"), Seq("record_id"))
      .orderBy(col("_rec_ord"))
      .select(col("record_id"), col("report"), col("_request_json").as("request"))
  }
}
