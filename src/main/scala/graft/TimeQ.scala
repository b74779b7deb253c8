package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing: `runMain graft.TimeQ <q1,q2,...> [sfDir]` runs each
  * query three times and prints per-run wall time plus Spark job counts
  * (sequential tiny jobs are the usual fixed-overhead culprit). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = Conf.localSession(4)
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; starts.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(j.jobId, 0L)
        if (t0 > 0)
          println(f"    job ${j.jobId}%3d  ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    })
    val names = args.headOption.getOrElse("q03_star_revenue").split(",").toSeq
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    for (run <- 1 to 3; n <- names) {
      jobs = 0
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sf).count()
      println(f"$n%s run$run ${(System.nanoTime() - t0) / 1e9}%.2f s, $jobs jobs")
    }
    spark.stop()
  }
}
