package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join operators Spark lacks natively, composed from built-ins
  * (SURVEY.md §4: composition preferred over a custom physical operator
  * while built-ins express the semantics — Catalyst then keeps
  * optimizing through them).
  */
object Joins {

  /** As-of (point-in-time) join: for each left row, the single LATEST
    * right row with `rightTs <= leftTs` and within `toleranceMicros`,
    * matched on the equi `keys`.
    *
    * Scalable shape: the join shuffles on the equi keys only; the time
    * band is a post-join filter bounding fan-out to the tolerance
    * window; the keep-latest ranking window dedups per left row. Never a
    * cartesian — a right row outside the key+band never materializes.
    *
    * @param leftId    column uniquely identifying a left row (window key)
    * @param leftTs    left event-time column, epoch MICROSECONDS (long)
    * @param rightTs   right event-time column, epoch microseconds (long)
    * @param rightTie  deterministic tie-break among equal `rightTs`
    *                  (highest wins)
    * @return left+right columns of the matched pair, one row per left
    *         row that had a match
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftId: String, leftTs: String, rightTs: String, rightTie: String,
           toleranceMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(leftId))
      .orderBy(col(rightTs).desc, col(rightTie).desc)
    left.join(right, keys)
      .filter(col(rightTs) <= col(leftTs) &&
        col(rightTs) > col(leftTs) - toleranceMicros)
      .withColumn("_asof_rn", row_number().over(w))
      .filter(col("_asof_rn") === 1)
      .drop("_asof_rn")
  }

  /** [[asOf]] in the FORWARD direction: for each left row, the single
    * EARLIEST right row with `rightTs >= leftTs` within
    * `toleranceMicros` — "the next fill after the order", the other
    * half of a time-series engine's as-of pair. Same key-sharded,
    * band-bounded, rank-deduped shape; only the comparison direction
    * and the keep-order flip (lowest `rightTie` wins among equal
    * timestamps, mirroring backward's highest). */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftId: String, leftTs: String, rightTs: String,
                  rightTie: String, toleranceMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(leftId))
      .orderBy(col(rightTs).asc, col(rightTie).asc)
    left.join(right, keys)
      .filter(col(rightTs) >= col(leftTs) &&
        col(rightTs) < col(leftTs) + toleranceMicros)
      .withColumn("_asof_rn", row_number().over(w))
      .filter(col("_asof_rn") === 1)
      .drop("_asof_rn")
  }

  /** The NEAREST direction completing the as-of family: for each left
    * row, the right row with the smallest |rightTs − leftTs| within
    * the tolerance band, whichever side it falls on — sensor alignment
    * ("the reading closest to the photo's timestamp") where backward
    * and forward both bias the match. Equidistant candidates break to
    * the EARLIER right row, then `rightTie` ascending; the distance is
    * integer microseconds, so the ranking is exact on both engines.
    * The band is INCLUSIVE: `|rightTs − leftTs| <= toleranceMicros`,
    * so a candidate exactly at the tolerance qualifies (matching the
    * "within the band" contract; the backward/forward joins keep their
    * half-open bands, which is the asymmetric-direction convention).
    * Same key-sharded, band-bounded, rank-deduped shape as [[asOf]]. */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftId: String, leftTs: String, rightTs: String,
                  rightTie: String, toleranceMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(leftId))
      .orderBy(abs(col(rightTs) - col(leftTs)).asc, col(rightTs).asc,
        col(rightTie).asc)
    left.join(right, keys)
      .filter(col(rightTs) >= col(leftTs) - toleranceMicros &&
        col(rightTs) <= col(leftTs) + toleranceMicros)
      .withColumn("_asof_rn", row_number().over(w))
      .filter(col("_asof_rn") === 1)
      .drop("_asof_rn")
  }
}
