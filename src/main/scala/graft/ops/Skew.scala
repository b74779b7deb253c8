package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks.
  *
  * When a groupBy key is pathologically hot (a handful of keys carrying
  * most rows — `l_returnflag` has cardinality 3 over the whole fact
  * table), a single-phase hash aggregation sends every row of a hot key
  * to one reducer. The classic fix is SALTING: append a random-ish salt
  * to the key, aggregate partially over (key, salt) — spreading each hot
  * key over `salt` reducers — then aggregate the partials. For algebraic
  * aggregates (count/sum/min/max) the two-phase result is identical to
  * the one-phase one, which the DuckDB oracle (plain GROUP BY) verifies.
  *
  * (Spark's map-side partial aggregation + AQE skew handling already
  * covers most of this automatically — the operator exists for the cases
  * that defeat them: high-cardinality distinct-ish states per key, or
  * deliberate two-stage topologies. The salt here is a deterministic
  * row-hash mod N, not rand(), so results are reproducible.)
  */
object Skew {
  /** Two-phase salted aggregation: count + decimal sum per key. */
  def saltedAgg(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(xxhash64(value), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_n"),
        sum(value.cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("_s"))
    salted
      .groupBy(col("key"))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).cast("double").as("total"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Salted two-phase aggregation over the 3-key (hot) l_returnflag —
    // identical results to the plain GROUP BY the oracle runs.
    "q20_salted_agg" -> ((s, d) => {
      saltedAgg(Tables.lineitem(s, d), col("l_returnflag"),
        col("l_extendedprice"), salts = 16)
        .withColumnRenamed("key", "l_returnflag")
    }),

    // Typed-Aggregator top-k (UDAF surface): per-segment top-3 customers
    // via a bounded k-row buffer — partials shrink to k BEFORE the
    // shuffle, unlike the window formulation (q07) which shuffles every
    // row. Identical results; the oracle reuses the windowed SQL.
    "q21_topk_aggregator" -> ((s, d) => {
      import org.apache.spark.sql.functions.udaf
      val topk = udaf(new graft.functions.TopKAggregator(3))
      Tables.customer(s, d)
        .select(col("c_mktsegment"),
          struct(col("c_acctbal").as("value"), col("c_custkey").as("key"),
            col("c_name").as("payload")).as("r"))
        .groupBy(col("c_mktsegment"))
        .agg(topk(col("r.value"), col("r.key"), col("r.payload")).as("top"))
        .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("c_mktsegment"), (col("i") + 1).cast("long").as("rnk"),
          col("t.key").as("c_custkey"), col("t.payload").as("c_name"),
          col("t.value").as("c_acctbal"))
    }),

    // Distinct aggregate (Expand-based two-phase distinct): active users
    // and event count per type.
    "q19_count_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    }))

  def oracle: Map[String, String] = Map(
    "q20_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q21_topk_aggregator" ->
      """SELECT c_mktsegment, rnk, c_custkey, c_name, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) ranked WHERE rnk <= 3""".stripMargin,
    "q19_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin)
}
