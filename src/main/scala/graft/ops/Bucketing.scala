package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucketed (pre-shuffled) storage layout — the co-located-join path
  * the builder brief names for big fact⋈fact joins: write both sides
  * hash-clustered into the SAME number of buckets on the join key, and
  * every later equi-join on that key plans with ZERO shuffle exchanges
  * — each bucket pair joins locally (pinned by BucketingSpec). At
  * 100 TB the one-time write-side cluster replaces a per-query
  * terabyte-scale exchange: the canonical amortize-the-shuffle trade,
  * and Spark's storage-level answer where q26/q39 are the compute-level
  * (salting) answers to the same join-cost problem.
  *
  * Bucketing needs the table catalog (parquet `bucketBy` metadata lives
  * there — plain `.parquet(path)` writes cannot carry it), so the
  * writer targets EXTERNAL tables under an explicit path: nothing
  * depends on a Hive metastore, the in-memory session catalog is
  * enough.
  *
  * The q42 catalog query runs the whole cycle honestly — bucket both
  * join sides, co-located-join them, aggregate — so its bench time
  * includes the write-side cost it amortizes; its oracle is the plain
  * join (layout must never change answers).
  */
object Bucketing {
  /** Bucket count. Locally small; at scale set ~(table size / 1 GB)
    * and keep it IDENTICAL across every table sharing the join key —
    * matching counts are what let the planner drop both exchanges. */
  val NBuckets = 8

  private def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9]+", "_")

  /** Write `df` as an external parquet table bucketed on `key`. */
  def writeBucketed(df: DataFrame, key: String, table: String,
                    path: String, nBuckets: Int = NBuckets): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Bucket lineitem and orders on the order key under tmpdir (names
    * and paths derived from `d`, so scale factors don't collide) and
    * return the co-located join — the frame BucketingSpec asserts plans
    * with zero shuffles. The `merge` hint keeps the join sort-merge so
    * the no-exchange property is about BUCKETING, not about AQE electing
    * a broadcast that would vanish at production fact sizes. */
  def colocatedOrdersJoin(s: SparkSession, d: String): DataFrame = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bkt_${sanitize(d)}"
    val lt = s"graft_bkt_li_${sanitize(d)}"
    val ot = s"graft_bkt_or_${sanitize(d)}"
    writeBucketed(Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      "l_orderkey", lt, s"$base/lineitem")
    writeBucketed(Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority")),
      "o_orderkey", ot, s"$base/orders")
    val l = s.table(lt)
    val o = s.table(ot)
    l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // write-cluster → co-located join → rollup; only the rollup
    // exchanges (on the tiny priority key)
    "q42_bucketed_join" -> ((s, d) =>
      colocatedOrdersJoin(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(col("l_extendedprice").cast(DecimalType(18, 2))
            * col("l_discount").cast(DecimalType(18, 2)))
            .cast("double").as("disc_revenue"),
          count(lit(1)).as("n_lines"))))

  def oracle: Map[String, String] = Map(
    "q42_bucketed_join" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin)
}
