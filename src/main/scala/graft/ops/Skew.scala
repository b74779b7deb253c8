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

  /** SALTED JOIN — the join-side twin of [[saltedAgg]], for a skewed
    * fact⋈dim join where the dim is too big to broadcast and a handful
    * of hot fact keys would pin one reducer: the fact side gets a
    * deterministic salt in [0, salts), the dim side is REPLICATED once
    * per salt value (an explode of a literal range — `salts`× the dim,
    * which is the explicit price of spreading each hot key over `salts`
    * reducers), and the equi-join runs on (key, salt). Row-for-row
    * identical to the plain join — every fact row meets exactly the one
    * dim replica carrying its salt — which the q26 oracle (plain JOIN)
    * verifies.
    *
    * (AQE's skew-join split covers sort-merge joins automatically;
    * this operator is for the cases that defeat it: skew invisible to
    * stats, bucketed tables AQE won't re-split, or a deliberate
    * fixed-topology job. Salt is a row-hash mod N, not rand(), so
    * recovery/re-runs land rows identically.) */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int, saltOn: Column): DataFrame = {
    // the salt must VARY WITHIN a join key (a hash of the key itself
    // would send every hot-key row to the same reducer again) — the
    // caller points `saltOn` at any per-row-varying columns
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltOn), lit(salts.toLong)))
    val repDim = dim
      .withColumn("_salt", explode(expr(s"sequence(0L, ${salts - 1}L)")))
      .withColumnRenamed(dimKey, factKey)
    saltedFact.join(repDim, Seq(factKey, "_salt")).drop("_salt")
  }

  /** AUTO-salted join (q39) — [[saltedJoin]] with the hot keys
    * DETECTED, not declared, and the mitigation applied ONLY to them
    * (differential salting): a per-key fact count keeps keys at or
    * above `hotThreshold`; that hot list — at most `|fact| /
    * hotThreshold` keys, so broadcast-bounded by construction —
    * broadcasts into both sides. Hot fact rows salt over [0, salts),
    * cold rows keep salt 0; the dim replicates per salt only for hot
    * keys, so dim inflation is `hot_keys × salts` ROWS — independent
    * of dim size, where [[saltedJoin]] pays `salts ×` the whole dim.
    *
    * The detection pass is one map-side-partial count collapsing to
    * key cardinality (at extreme scale swap in a sample or the x02 CMS
    * — the hot SET just gets conservative; correctness never depends
    * on it, since salting any key is result-neutral). Row-for-row
    * identical to the plain join, which the oracle verifies. */
  def autoSaltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                     dimKey: String, salts: Int, saltOn: Column,
                     hotThreshold: Long): DataFrame = {
    val hot = fact.groupBy(col(factKey))
      .agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= hotThreshold)
      .select(col(factKey), lit(true).as("_hot"))
    val saltedFact = fact.join(broadcast(hot), Seq(factKey), "left")
      .withColumn("_salt",
        when(col("_hot"), pmod(xxhash64(saltOn), lit(salts.toLong)))
          .otherwise(lit(0L)))
      .drop("_hot")
    val repDim = dim.withColumnRenamed(dimKey, factKey)
      .join(broadcast(hot), Seq(factKey), "left")
      .withColumn("_salt", explode(
        when(col("_hot"), expr(s"sequence(0L, ${salts - 1}L)"))
          .otherwise(expr("array(0L)"))))
      .drop("_hot")
    saltedFact.join(repDim, Seq(factKey, "_salt")).drop("_salt")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Differential salting with detected hot keys (threshold 8 rows —
    // real hot keys exist at every harness SF, pinned by spec) —
    // identical to the plain join+group the oracle runs.
    "q39_auto_salted_join" -> ((s, d) => {
      autoSaltedJoin(Tables.lineitem(s, d),
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        "l_orderkey", "o_orderkey", salts = 4,
        saltOn = struct(col("l_linenumber"), col("l_partkey")),
        hotThreshold = 8L)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(
            org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_price"))
    }),
    // Salted fact⋈dim join on the order key, aggregated per priority —
    // identical to the plain join+group the oracle runs. Salt derives
    // from the line number (varies within an order), never the key.
    "q26_salted_join" -> ((s, d) => {
      saltedJoin(Tables.lineitem(s, d),
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        "l_orderkey", "o_orderkey", salts = 8,
        saltOn = struct(col("l_linenumber"), col("l_partkey")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(
            org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_qty"))
    }),
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
    "q39_auto_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q26_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
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
