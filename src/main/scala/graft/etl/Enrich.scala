package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Star-schema enrichment: fact ⟕ item_meta ⟕ item_group_map ⟕ diag_tbl ⟕
  * summary_tbl (`db_to_dataframe.py:144-184`).
  *
  * All four joins are left equi joins on trimmed-string keys. The dims are
  * small (bounded by code-cardinality, not data volume), so each is
  * broadcast — at 100 TB the fact table never shuffles here; the plan is
  * four chained BroadcastHashJoins inside one whole-stage-codegen span.
  *
  * Fan-out semantics are preserved deliberately: a dim with duplicate keys
  * multiplies fact rows, and the downstream keep-first dedup
  * (`data_preprocessing.py:28`, [[Clean.keepFirst]]) is what makes the
  * pipeline tolerate it — same join-then-dedup order as the reference.
  */
object Enrich {

  /** J5 on the fact side: join keys cast to string and trimmed
    * (`db_to_dataframe.py:144-146`). */
  def normalizeFactKeys(fact: DataFrame): DataFrame =
    Seq("ITEM_CODE", "ORG_ID", "DIAG_CODE").foldLeft(fact)((df, k) =>
      df.withColumn(k, trim(col(k).cast("string"))))

  /** Rename dim columns that would collide with fact columns, mirroring the
    * pandas `suffixes=('_ITEM','_GROUP')` disambiguation at
    * `db_to_dataframe.py:165`. Spark has no suffix auto-rename, so the
    * rename is explicit: colliding fact columns get `_ITEM`, colliding dim
    * columns get `_GROUP`. */
  private def disambiguate(fact: DataFrame, dim: DataFrame, keys: Seq[String])
      : (DataFrame, DataFrame) = {
    val collisions = dim.columns.toSeq
      .filterNot(keys.contains).filter(fact.columns.contains)
    val f2 = collisions.foldLeft(fact)((d, c) => d.withColumnRenamed(c, s"${c}_ITEM"))
    val d2 = collisions.foldLeft(dim)((d, c) => d.withColumnRenamed(c, s"${c}_GROUP"))
    (f2, d2)
  }

  /** The enrichment chain J1→J2→J3→J4, then ensure-columns (P2) and the
    * fixed 22-column projection (P1), `_rid` carried through. */
  def enrich(fact: DataFrame, dims: Dims): DataFrame = {
    val d = dims.normalized
    val f = normalizeFactKeys(fact)

    // J1: display names, composite key (`db_to_dataframe.py:164`).
    val j1 = f.join(broadcast(d.itemMeta), Seq("ITEM_CODE", "ORG_ID"), "left")

    // J2: group mapping (`db_to_dataframe.py:165`).
    val (j1d, groupMap) = disambiguate(j1, d.itemGroupMap, Seq("ITEM_CODE"))
    val j2 = j1d.join(broadcast(groupMap), Seq("ITEM_CODE"), "left")

    // J3: DIAG → SUMMARY_CODE + translated comments (`db_to_dataframe.py:
    // 168-171`). The request's own SUMMARY_CODE (`sample_request.json:13`)
    // is unused by the pipeline — SUMMARY_CODE is re-derived through this
    // join — and keeping it would collide with the dim's column (in the
    // reference the pandas suffix collision at this merge actually crashes
    // the published snapshot's J4 with KeyError('SUMMARY_CODE'); the
    // intended semantics are clearly "drop the input's copy"). A dim-side
    // ORG_ID would collide the same way (another latent bug in the
    // reference's Mongo path); we keep the fact's ORG_ID and drop the
    // dim's, which matches the canonical fallback shape.
    val diag = if (d.diagTbl.columns.contains("ORG_ID")) d.diagTbl.drop("ORG_ID") else d.diagTbl
    val j3 = j2.drop("SUMMARY_CODE").join(broadcast(diag), Seq("DIAG_CODE"), "left")

    // J4: SUMMARY_CODE → summary texts (`db_to_dataframe.py:174-177`).
    val summ = if (d.summaryTbl.columns.contains("ORG_ID")) d.summaryTbl.drop("ORG_ID") else d.summaryTbl
    val j4 = j3.join(broadcast(summ), Seq("SUMMARY_CODE"), "left")

    // P2: inject any missing SUBSET column as '' (`db_to_dataframe.py:
    // 180-182`); P1: project to the 22 columns (`:184`) + `_rid`.
    val ensured = Schemas.SUBSET.foldLeft(j4)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit("")))
    ensured.select((Schemas.SUBSET :+ "_rid").map(col): _*)
  }
}
