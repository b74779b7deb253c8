package graft.ops

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Z-order layout: the curve math (engine expression ≡ local
  * reference), the quadrant property that makes min/max skipping work,
  * and the write→box-scan path pruning partitions at planning time. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("zValue expression matches the local reference interleave") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (70000L, 3L)) // 70000 exercises the 16-bit mask
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == Layout.zValueLocal(x, y), s"($x, $y)")
    }
    // the first quadrant steps of the curve, by hand
    assert(Layout.zValueLocal(1, 0) == 1L && Layout.zValueLocal(0, 1) == 2L &&
      Layout.zValueLocal(1, 1) == 3L && Layout.zValueLocal(2, 0) == 4L)
  }

  test("aligned cells are contiguous z-intervals (the skipping property)") {
    // every point of an aligned 2^s-wide square lands in ONE interval
    // of length 4^s starting at the cell's base z — so a file holding
    // one cell has tight min/max stats, and cellsForBox prunes exactly
    val s = 4 // 16×16 cells
    for (cell <- Seq((0L, 0L), (3L, 5L), (4095L, 1L))) {
      val (cx, cy) = cell
      val base = Layout.zValueLocal(cx, cy, Layout.Bits - s) << (2 * s)
      val zs = for (dx <- 0L until 16L; dy <- 0L until 16L)
        yield Layout.zValueLocal((cx << s) + dx, (cy << s) + dy)
      assert(zs.min == base && zs.max == base + (1L << (2 * s)) - 1)
      assert(zs.toSet.size == 256, "the cell's z-values are a bijection")
    }
  }

  test("z-ordered write + box scan: partition pruning, exact results") {
    val dir = Files.createTempDirectory("graft_zorder").toString + "/orders_z"
    val orders = Tables.orders(spark, sf)
      .withColumn("o_day",
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).cast("long"))
    Layout.zorderWrite(orders, "o_custkey", "o_day", dir, cellBits = 4)

    val (x0, x1) = (20L, 60L)       // custkeys 0..149 at sf0.001
    val (y0, y1) = (9500L, 10200L)  // order days span 9131..11535
    val scanned = Layout.zBoxScan(spark, dir, "o_custkey", "o_day",
      x0, x1, y0, y1, cellBits = 4)
    val leaf = scanned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .get
    assert(leaf.partitionFilters.nonEmpty,
      "the cell list must prune at planning time, not as a data filter")

    val expected = orders
      .filter(col("o_custkey").between(x0, x1) && col("o_day").between(y0, y1))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val got = scanned.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"box scan drifted: ${got.size} vs ${expected.size}")
    assert(expected.nonEmpty, "empty box — vacuous")
  }
}
