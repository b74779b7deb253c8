package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: `runMain graft.Explain <query> [sfDir]`
  * prints the formatted physical plan for one catalog query (or all,
  * with `all`). Used to keep the 100 TB discipline honest: check
  * `PushedFilters` / `ReadSchema` on scans, broadcast vs shuffle join
  * selection, and WholeStageCodegen span coverage. */
object Explain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = Conf.localSession(4)
    spark.sparkContext.setLogLevel("ERROR")
    val qs =
      if (which == "all") SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter(_._1 == which).toSeq
    qs.foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
