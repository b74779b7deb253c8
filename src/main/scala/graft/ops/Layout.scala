package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) storage layout — the multi-column data-
  * skipping technique of every modern lakehouse (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`): interleave the bits of two dimension keys so
  * that rows close in BOTH dimensions land close on the curve, then
  * lay files out along the curve. A single-column sort gives min/max
  * skipping on that column only; the z-layout gives useful skipping on
  * every interleaved dimension at once, because an aligned 2^k × 2^k
  * box of key space is EXACTLY one contiguous z-range (the quadrant
  * property, pinned by spec).
  *
  * Scale shape: [[zValue]] is a pure codegen'd bit expression (no
  * shuffle, no UDF); [[zorderWrite]] pays one range-partition+sort at
  * write time — the same price as any clustering rewrite — after which
  * a box query reads only the files/partitions whose z-interval
  * overlaps the box's covering cells ([[cellsForBox]], a driver-side
  * enumeration of at most (box_x/cell+1)·(box_y/cell+1) integers).
  * At 100 TB this is the difference between scanning the fact table
  * and scanning the handful of curve segments a (customer, day) box
  * touches.
  *
  * Dimensions are masked to `bits` low bits (caller range-normalizes
  * first — the harness query's keys already fit); the bit math is
  * portable integer arithmetic, so q40 carries a full DuckDB oracle.
  */
object Layout {
  val Bits = 16

  /** Morton interleave: bit `i` of `x` → bit `2i` of z, bit `i` of `y`
    * → bit `2i+1`. Pure bitwise expression — whole-stage codegen keeps
    * it in the scan's projection. */
  def zValue(x: Column, y: Column, bits: Int = Bits): Column = {
    val xm = x.bitwiseAND(lit((1L << bits) - 1))
    val ym = y.bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftrightunsigned(xm, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave on driver-side longs (for cell enumeration
    * and the spec's reference check). */
  def zValueLocal(x: Long, y: Long, bits: Int = Bits): Long = {
    val xm = x & ((1L << bits) - 1)
    val ym = y & ((1L << bits) - 1)
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((xm >> i) & 1L) << (2 * i)) | (((ym >> i) & 1L) << (2 * i + 1))
    }
  }

  /** Coarse curve cell of a z-value: its top `2·cellBits` bits — an
    * aligned 2^(bits-cellBits)-wide square of key space, and therefore
    * one contiguous z-interval. This is the partition key the layout
    * writes under. */
  def zCell(z: Column, cellBits: Int, bits: Int = Bits): Column =
    shiftrightunsigned(z, 2 * (bits - cellBits))

  /** All cells overlapping the box [x0,x1]×[y0,y1] — the driver-side
    * pruning list a box query sends into the partition filter. */
  def cellsForBox(x0: Long, x1: Long, y0: Long, y1: Long,
                  cellBits: Int, bits: Int = Bits): Seq[Long] = {
    val s = bits - cellBits
    (for {
      cx <- (x0 >> s) to (x1 >> s)
      cy <- (y0 >> s) to (y1 >> s)
    } yield zValueLocal(cx, cy, cellBits)).distinct.sorted
  }

  /** Write `df` z-clustered on (`xCol`, `yCol`): partitioned by curve
    * cell, z-sorted within each partition (range partition by cell →
    * one shuffle; the within-file sort gives row-group-level min/max
    * skipping inside each cell on top of the partition pruning). */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  cellBits: Int, bits: Int = Bits): Unit =
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .withColumn("z_cell", zCell(col("_z"), cellBits, bits))
      .repartitionByRange(col("z_cell"), col("_z"))
      .sortWithinPartitions(col("z_cell"), col("_z"))
      .write.partitionBy("z_cell").mode("overwrite").parquet(path)

  /** Box query over a [[zorderWrite]] layout: the cell list becomes a
    * PLANNING-TIME partition filter (pinned by LayoutSpec), the exact
    * box predicate re-applies on the survivors. */
  def zBoxScan(spark: SparkSession, path: String,
               xCol: String, yCol: String,
               x0: Long, x1: Long, y0: Long, y1: Long,
               cellBits: Int, bits: Int = Bits): DataFrame =
    spark.read.parquet(path)
      .filter(col("z_cell").isin(cellsForBox(x0, x1, y0, y1, cellBits, bits): _*))
      .filter(col(xCol).between(x0, x1) && col(yCol).between(y0, y1))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the curve itself, oracle-checked: every order's (custkey, order
    // day) interleave — the value the layout clusters and prunes on
    "q40_zorder_key" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          zValue(col("o_custkey"),
            datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
              .cast("long")).as("z"))))

  def oracle: Map[String, String] = Map(
    "q40_zorder_key" -> {
      val mask = (1L << Bits) - 1
      val terms = (0 until Bits).flatMap { i =>
        Seq(s"(((xm >> $i) & 1) << ${2 * i})",
          s"(((ym >> $i) & 1) << ${2 * i + 1})")
      }.mkString(" | ")
      s"""SELECT o_orderkey, ($terms) AS z FROM (
         |  SELECT o_orderkey,
         |    o_custkey & $mask AS xm,
         |    date_diff('day', DATE '1970-01-01', o_orderdate) & $mask AS ym
         |  FROM orders) t""".stripMargin
    })
}
