package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct, sum, xxhash64}

object Bench {
  /** Force full evaluation of every output column. `count()` is NOT
    * enough: Catalyst prunes columns nothing references, so under a
    * bare count projection-only queries degenerate to row-counting
    * scans and their timings are fiction. Hashing a struct of all
    * columns into one aggregate makes every expression execute while
    * keeping driver traffic to a single row. Falls back to count for
    * the rare output type xxhash64 can't take (e.g. maps). */
  private def materialize(df: DataFrame): Unit = {
    val forced =
      try df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(sum(col("h")))
      catch { case _: Throwable => df }
    forced.collect()
    ()
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default 32 = the driver's local[32] environment; medians over
    // SPARK_GRAFT_REPS runs so one GC pause can't misrank a query
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Conf.localSession(cpus)
    // Untimed warmup: JIT + codegen + parquet-footer caches, so fixed
    // startup cost isn't attributed to whichever query happens to run
    // first (cold-vs-warm skew measured at 3-7s on the heavy queries).
    // Generated-code classes depend on plan shape, not data, so running
    // representative queries at the SMALLEST scale factor compiles the
    // same classes at negligible cost.
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      val warm = new java.io.File("/root/testdata/sf0.001")
      val warmDir = if (warm.isDirectory) warm.getPath else sfDir
      SparkEntry.queries.foreach { case (_, fn) =>
        try materialize(fn(spark, warmDir))
        catch { case _: Throwable => () }
      }
    } catch { case _: Throwable => () }
    // drop warmup leftovers (pipeline caches, broadcasts) so the
    // measured phase doesn't run under their GC pressure
    spark.catalog.clearCache()
    System.gc()
    val samples: Seq[Map[String, Double]] = (1 to math.max(1, reps)).map { _ =>
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = SparkEntry.queries.keys.map { name =>
      name -> median(samples.map(_.getOrElse(name, -1.0)))
    }.toMap
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":${math.max(1, reps)},"cpus":$cpus}""")
    spark.stop()
  }
}
