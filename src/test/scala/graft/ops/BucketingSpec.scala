package graft.ops

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-layout contract: a join of two tables bucketed on the
  * join key with matching bucket counts plans with ZERO shuffle
  * exchanges, and the layout never changes answers. */
class BucketingSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("bucketed orders join plans with zero shuffle exchanges") {
    val joined = Bucketing.colocatedOrdersJoin(spark, sf)
    joined.count() // materialize so AQE finalizes the plan
    val n = collectWithSubqueries(joined.queryExecution.executedPlan) {
      case e: ShuffleExchangeLike => e
    }.size
    assert(n == 0,
      "co-located join must not exchange:\n" +
        joined.queryExecution.executedPlan.toString.take(3000))
    assert(joined.queryExecution.executedPlan.toString
      .contains("SortMergeJoin"), "merge hint must hold under AQE")
  }

  test("q42 equals the plain (unbucketed) join rollup") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val got = Bucketing.queries("q42_bucketed_join")(spark, sf)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val li = Tables.lineitem(spark, sf)
    val or = Tables.orders(spark, sf)
    val want = li.join(or, li("l_orderkey") === or("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))
        * col("l_discount").cast(DecimalType(18, 2))).cast("double").as("r"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(got == want)
  }
}
