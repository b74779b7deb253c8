package graft.ops

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Storage-layout scale techniques, proven on the physical plan:
  *
  *  - BUCKETING: two tables bucketed by their join key co-locate — the
  *    join compiles with NO shuffle exchange on either side. This is the
  *    100 TB answer to repeated fact-fact joins (pay the shuffle once at
  *    write time, never again at read time).
  *  - PARTITIONED LAYOUT: writes partitioned by a coarse key are pruned
  *    at planning time — a filtered scan lists only matching partitions.
  */
class StorageLayoutSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private lazy val warehouse = {
    val dir = Files.createTempDirectory("graft_warehouse").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucketed LOCATION '$dir'")
    dir
  }

  test("bucketed co-located join plans without any shuffle exchange") {
    warehouse
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_bucketed.orders_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_bucketed.lineitem_b")

    val joined = spark.table("graft_bucketed.lineitem_b")
      .join(spark.table("graft_bucketed.orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    // force a sort-merge/shuffled-hash path so a non-bucketed layout
    // WOULD need exchanges, then assert bucketing removed them
    val noBroadcast = joined.hint("merge")
    noBroadcast.collect()
    val plan = noBroadcast.queryExecution.executedPlan
    val shuffles = collectWithSubqueries(plan) { case e: ShuffleExchangeLike => e }
      .filterNot(_ => false)
    // one exchange is legitimate (the groupBy re-partition); the JOIN
    // itself must not shuffle either side: with bucketing the join keys
    // arrive pre-partitioned, so at most the aggregation exchange remains
    assert(shuffles.size <= 1,
      s"expected bucketed join without join-side shuffles, got ${shuffles.size}:\n$plan")

    // and results match the plain parquet join
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val bucketed = noBroadcast.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(bucketed == plain)
  }

  test("orc and json-lines sources round-trip losslessly") {
    val base = Files.createTempDirectory("graft_fmt").toString
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    li.write.mode("overwrite").orc(s"$base/li_orc")
    val orcBack = spark.read.orc(s"$base/li_orc")
    assert(orcBack.count() == li.count())
    assert(orcBack.schema == li.schema)

    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").json(s"$base/docs_json")
    val jsonBack = spark.read.json(s"$base/docs_json")
    assert(jsonBack.count() == docs.count())
    val a = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = jsonBack.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("partitioned write prunes non-matching partitions at scan time") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events_by_type"
    Tables.events(spark, sf).write
      .partitionBy("event_type").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("event_type") === "error")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .get
    assert(scanned.partitionFilters.nonEmpty,
      "the event_type predicate must become a partition filter (planning-time pruning)")

    val n = pruned.count()
    val expected = Tables.events(spark, sf).filter(col("event_type") === "error").count()
    assert(n == expected)
  }
}
