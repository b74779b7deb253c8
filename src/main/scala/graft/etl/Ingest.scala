package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest: nested request JSON → flat fact table, one row per
  * (record, item, finding).
  *
  * Mirrors `db_to_dataframe.py:33-44` (json_normalize → explode → struct
  * unnest → empty-COMMENT filter), re-expressed as `from_json` + two
  * `posexplode`s. The explode positions materialize the input order as a
  * sortable `_rid` struct column — pandas rows carry implicit stable order,
  * Spark DataFrames do not, so every downstream order-dependent operator
  * (keep-first dedup, stable sort, first-occurrence grouping) keys on
  * `_rid` explicitly. This makes the pipeline partition-count-invariant.
  */
object Ingest {

  /** Parse request bodies (each element one JSON array of records, or a
    * bare record object — `text_processing.py:152` coerces a bare dict to
    * a 1-element list) into a record-level frame
    * `(_rec_ord: struct(_body_ord: bigint, _rec_pos: int), record)`.
    *
    * `_rec_ord` is a STRUCT sort key, not packed arithmetic: the earlier
    * `_body_ord * 2^20 + _rec_pos` encoding silently collided once a body
    * held >2^20 records and wrapped negative past 1024 input partitions
    * (monotonically_increasing_id puts the partition index in the high
    * bits), breaking every order-dependent operator exactly at scale.
    * Struct comparison is lexicographic with no range limits — the same
    * design `_rid` already uses.
    *
    * Scale note: each body is parsed and exploded on its executor — no
    * driver-side JSON handling; a Dataset of millions of bodies
    * distributes evenly.
    */
  def parseBodies(bodies: Dataset[String]): DataFrame = {
    val spark = bodies.sparkSession
    import spark.implicits._
    val df = bodies.toDF("_body")
      // body order → record order: bodies are independent requests; within a
      // body, array position is the order. monotonically_increasing_id is
      // stable per partition and partitions are ordered by index, so record
      // order across bodies follows input order (as a SORT key; never as
      // arithmetic).
      .withColumn("_body_ord", monotonically_increasing_id())
      .withColumn("_parsed",
        coalesce(
          from_json($"_body", Schemas.request),
          array(from_json($"_body", Schemas.record))))
    df.select($"_body_ord", posexplode($"_parsed").as(Seq("_rec_pos", "record")))
      .select(struct($"_body_ord", $"_rec_pos").as("_rec_ord"), $"record")
  }

  /** Record-level frame for a single in-memory request body (the reference's
    * EP1 shape — one HTTP request). */
  def parseBody(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    parseBodies(spark.createDataset(Seq(body)))
  }

  /** Flatten records → fact rows.
    *
    * Input: `(_rec_ord, record)` from [[parseBodies]]. Output columns:
    * `RECORD_ID, LANG_NO, ORG_ID, ITEM_CODE, DIAG_CODE, COMMENT,
    * SUMMARY_CODE, _rid` where `_rid = struct(_body_ord, _rec_pos,
    * _item_pos, _find_pos)` is the lexicographically sortable ingest
    * ordinal (collision-free at any body/record count).
    *
    * Semantics matched to the reference:
    *  - records with empty `ITEMS` produce no rows (pandas
    *    `json_normalize(record_path='ITEMS')`, `db_to_dataframe.py:33`) →
    *    inner `posexplode`;
    *  - items with empty `FINDINGS` survive the pandas `explode` as a NaN
    *    row (`db_to_dataframe.py:34-38`) and are then dropped by the
    *    empty-COMMENT filter (`:41-44`) → `posexplode_outer` + same filter.
    */
  def flatten(records: DataFrame): DataFrame = {
    records
      .select(
        col("_rec_ord"),
        col("record.RECORD_ID").as("RECORD_ID"),
        col("record.LANG_NO").as("LANG_NO"),
        col("record.ORG_ID").as("ORG_ID"),
        posexplode(col("record.ITEMS")).as(Seq("_item_pos", "_item")))
      .select(
        col("_rec_ord"), col("RECORD_ID"), col("LANG_NO"), col("ORG_ID"),
        col("_item_pos"),
        col("_item.ITEM_CODE").as("ITEM_CODE"),
        posexplode_outer(col("_item.FINDINGS")).as(Seq("_find_pos", "_finding")))
      .select(
        col("RECORD_ID"), col("LANG_NO"), col("ORG_ID"), col("ITEM_CODE"),
        col("_finding.DIAG_CODE").as("DIAG_CODE"),
        col("_finding.COMMENT").as("COMMENT"),
        col("_finding.SUMMARY_CODE").as("SUMMARY_CODE"),
        struct(col("_rec_ord._body_ord").as("_body_ord"),
          col("_rec_ord._rec_pos").as("_rec_pos"), col("_item_pos"),
          coalesce(col("_find_pos"), lit(0)).as("_find_pos")).as("_rid"))
      // F1 — drop rows whose trimmed COMMENT is null/empty
      // (`db_to_dataframe.py:41-44`).
      .filter(trim(coalesce(col("COMMENT"), lit(""))) =!= "")
  }

  /** Record-level echo frame for report output: one row per record with its
    * Python-`json.dumps`-equivalent JSON string (`text_processing.py:51-52`
    * echoes the matched original request; first match in request order
    * wins). Output: `(_rec_ord, RECORD_ID, LANG_NO, _request_json)`. */
  def requestEcho(records: DataFrame): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    val echoed = records
      .select(col("_rec_ord._body_ord"), col("_rec_ord._rec_pos"), col("record"))
      .as[(Long, Int, MedRecord)]
      .map { case (bodyOrd, recPos, rec) =>
        (bodyOrd, recPos, Option(rec.RECORD_ID).getOrElse(""), PyJson.dumps(rec))
      }
      .toDF("_body_ord", "_rec_pos", "RECORD_ID", "_request_json")
    // first record in request order wins per RECORD_ID
    // (`text_processing.py:51` — linear `next()` search).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"RECORD_ID").orderBy($"_body_ord", $"_rec_pos")
    echoed.withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1).drop("_rn")
      .select(struct($"_body_ord", $"_rec_pos").as("_rec_ord"),
        $"RECORD_ID", $"_request_json")
  }
}

/** Typed mirror of [[Schemas.record]] for the echo serializer. */
case class MedFinding(DIAG_CODE: Option[String], COMMENT: Option[String],
                      SUMMARY_CODE: Option[String])
case class MedItem(ITEM_CODE: Option[String], FINDINGS: Option[Seq[MedFinding]])
case class MedRecord(RECORD_ID: String, LANG_NO: String, ORG_ID: String,
                     ITEMS: Option[Seq[MedItem]])

/** Python-`json.dumps(..., ensure_ascii=False)`-compatible serializer for
  * the fixed record schema: default separators `", "` / `": "`, key order =
  * schema order (= the sample request's insertion order), `null` for None.
  * Reproduces `text_processing.py:52` byte-exact for schema-conforming
  * requests. */
object PyJson {
  private def esc(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
  private def v(o: Option[String]): String = o.map(esc).getOrElse("null")
  private def v(s: String): String = if (s == null) "null" else esc(s)

  def dumps(f: MedFinding): String =
    s"""{"DIAG_CODE": ${v(f.DIAG_CODE)}, "COMMENT": ${v(f.COMMENT)}, "SUMMARY_CODE": ${v(f.SUMMARY_CODE)}}"""

  def dumps(i: MedItem): String = {
    val fs = i.FINDINGS.map(_.map(dumps).mkString("[", ", ", "]")).getOrElse("null")
    s"""{"ITEM_CODE": ${v(i.ITEM_CODE)}, "FINDINGS": $fs}"""
  }

  def dumps(r: MedRecord): String = {
    val items = r.ITEMS.map(_.map(dumps).mkString("[", ", ", "]")).getOrElse("null")
    s"""{"RECORD_ID": ${v(r.RECORD_ID)}, "LANG_NO": ${v(r.LANG_NO)}, "ORG_ID": ${v(r.ORG_ID)}, "ITEMS": $items}"""
  }
}
