package graft.etl

import org.apache.spark.sql.types._

/** Schema constants for the medical-report ETL engine.
  *
  * The reference keeps schemas implicit as hard-coded column-name lists
  * (`db_to_dataframe.py:7-13`, `data_preprocessing.py:18-19`,
  * `text_processing.py:15-20`); here they are explicit `StructType`s /
  * named constants so `from_json` parses deterministically (no inference).
  */
object Schemas {

  /** One FINDING struct (`sample_request.json:10-14`). */
  val finding: StructType = StructType(Seq(
    StructField("DIAG_CODE", StringType),
    StructField("COMMENT", StringType),
    StructField("SUMMARY_CODE", StringType)
  ))

  /** One ITEM struct (`sample_request.json:7-16`). */
  val item: StructType = StructType(Seq(
    StructField("ITEM_CODE", StringType),
    StructField("FINDINGS", ArrayType(finding))
  ))

  /** One RECORD struct (`sample_request.json:2-28`). Field order is the
    * sample's key order — reused for the JSON request echo. */
  val record: StructType = StructType(Seq(
    StructField("RECORD_ID", StringType),
    StructField("LANG_NO", StringType),
    StructField("ORG_ID", StringType),
    StructField("ITEMS", ArrayType(item))
  ))

  /** A request body: an array of records (`text_processing.py:152` wraps a
    * bare object into a 1-element array before processing). */
  val request: ArrayType = ArrayType(record)

  /** The 22-column enriched projection (`db_to_dataframe.py:7-13`). */
  val SUBSET: Seq[String] = Seq(
    "RECORD_ID", "ORG_ID", "LANG_NO", "DIAG_CODE",
    "GROUPNO", "TCNAME_GROUP", "ENNAME_GROUP", "JPNAME_GROUP", "SCNAME_GROUP",
    "ITEM_CODE", "TCNAME_ITEM", "ENNAME_ITEM", "JPNAME_ITEM", "SCNAME_ITEM",
    "COMMENT", "ENNAME_COMMENT", "JPNAME_COMMENT", "SCNAME_COMMENT",
    "TCNAME_SUMMARY", "ENNAME_SUMMARY", "JPNAME_SUMMARY", "SCNAME_SUMMARY"
  )

  /** Keep-first dedup key (`data_preprocessing.py:18-19`). */
  val SUBSET_2_KEEP: Seq[String] = Seq(
    "ITEM_CODE", "RECORD_ID", "LANG_NO", "ORG_ID",
    "TCNAME_SUMMARY", "ENNAME_SUMMARY", "JPNAME_SUMMARY", "SCNAME_SUMMARY"
  )

  /** Per-language 8-column projection (`text_processing.py:15-20`).
    * Positions 3/5/6/7 are renamed GROUP/ITEM_NAME/COMMENT/SUMMARY. */
  val LANG_SUBSET: Map[String, Seq[String]] = Map(
    "1" -> Seq("RECORD_ID", "LANG_NO", "GROUPNO", "TCNAME_GROUP", "ITEM_CODE", "TCNAME_ITEM", "COMMENT", "TCNAME_SUMMARY"),
    "2" -> Seq("RECORD_ID", "LANG_NO", "GROUPNO", "ENNAME_GROUP", "ITEM_CODE", "ENNAME_ITEM", "ENNAME_COMMENT", "ENNAME_SUMMARY"),
    "3" -> Seq("RECORD_ID", "LANG_NO", "GROUPNO", "JPNAME_GROUP", "ITEM_CODE", "JPNAME_ITEM", "JPNAME_COMMENT", "JPNAME_SUMMARY"),
    "4" -> Seq("RECORD_ID", "LANG_NO", "GROUPNO", "SCNAME_GROUP", "ITEM_CODE", "SCNAME_ITEM", "SCNAME_COMMENT", "SCNAME_SUMMARY")
  )

  /** Per-language default SUMMARY text (`text_processing.py:23-28`,
    * `llm_processing.py:10`, `data_preprocessing.py:10-15`). */
  val LANG_DEFAULT_SUMMARY: Map[String, String] = Map(
    "1" -> "本項無補充說明",
    "2" -> "No additional information for this item.",
    "3" -> "この項目に関する追加情報はありません。",
    "4" -> "本项无补充说明。"
  )

  /** Per-language default GROUP text (`data_preprocessing.py:10-15`). */
  val LANG_DEFAULT_GROUP: Map[String, String] = Map(
    "1" -> "其他",
    "2" -> "Others",
    "3" -> "その他",
    "4" -> "其他"
  )

  /** Language number for each summary/group column, in reference iteration
    * order (`data_preprocessing.py:58,68` — enumerate index + 1). */
  val SUMMARY_COLS: Seq[(String, String)] = Seq(
    "TCNAME_SUMMARY" -> "1", "ENNAME_SUMMARY" -> "2",
    "JPNAME_SUMMARY" -> "3", "SCNAME_SUMMARY" -> "4")
  val GROUP_COLS: Seq[(String, String)] = Seq(
    "TCNAME_GROUP" -> "1", "ENNAME_GROUP" -> "2",
    "JPNAME_GROUP" -> "3", "SCNAME_GROUP" -> "4")

  /** All four default summary sentences (`llm_processing.py:10`) — these
    * bypass the LLM rewrite and map to themselves. */
  val LANG_DEFAULT_TEXTS: Seq[String] = LANG_DEFAULT_SUMMARY.toSeq.sortBy(_._1).map(_._2)
}
