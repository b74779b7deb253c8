package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Streaming drift monitoring (engine extension, SURVEY.md §2.9/§7.5):
  * v13's PSI readout at the stream edge — the deployment shape of a
  * feature monitor, which is a STREAMING job by nature: the reference
  * bin counts are frozen when the baseline is accepted (10 rows, a
  * published artifact like t22's model or k15's codebooks), the
  * arriving metric values accumulate into a ≤`nBins`-key streaming
  * count aggregation (state is O(bins), never O(rows)), and each
  * trigger's snapshot feeds [[graft.ops.Profile.driftPsiFrom]] against
  * the frozen reference — the alert fires when Σ psi_q6 crosses the
  * 0.1/0.25 rules of thumb.
  *
  * Binning goes through the SAME [[graft.ops.Profile.psiBin]] column
  * the batch readout uses, so stream and batch can never bin
  * differently; DriftStreamSpec pins streamed-counts + frozen-reference
  * ≡ the one-pass batch v13 on the same split. */
object DriftStream {
  /** Minimal metric-stream schema — the monitor needs only the value
    * column; declared explicitly (streaming reads never infer). */
  val rawSchema: StructType = StructType(Seq(
    StructField("value", DoubleType)))

  def readValues(spark: SparkSession, dir: String,
                 glob: String = "*.parquet"): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)

  /** Cumulative current-population bin counts `(bin, n)` as a
    * streaming aggregation — complete-mode output is the monitor's
    * live histogram snapshot. */
  def binCountsStream(values: DataFrame, value: String = "value",
                      width: Double = graft.ops.Profile.PsiWidth,
                      nBins: Int = graft.ops.Profile.PsiBins): DataFrame =
    values
      .withColumn("bin", graft.ops.Profile.psiBin(col(value), width, nBins))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
}
