package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.headOption.getOrElse("q03_star_revenue").split(",").toSeq
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    for (_ <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sf).count()
      println(f"$n%s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
