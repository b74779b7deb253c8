package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator catalog over the harness star schema.
  *
  * Each query exercises one family from SURVEY.md §2 (the reference's
  * operator inventory re-expressed over the harness testdata so the
  * driver's DuckDB oracle can hash-compare it):
  * aggregation (§2.4), broadcast star joins (§2.3), left-join null
  * handling (X1), semi/anti membership (F2), keep-first dedup as a
  * window (A2/W1), stable sort + top-k (O1), conditional defaults
  * (X7/X8), rollup, set ops, string normalization (X3–X6).
  *
  * Scale discipline (100 TB north star):
  *  - monetary aggregates go through `DECIMAL(18,2)` so partial/final
  *    aggregation is exact and associative — a double `sum` differs
  *    between engines and between partition counts; a decimal sum never
  *    does;
  *  - tiny dims (`region` 5 rows, `nation` 25) are `broadcast()` hinted;
  *    fact-fact joins (orders⋈customer, lineitem⋈part) are left to
  *    shuffle hash/sort-merge + AQE, which is the right call when both
  *    sides are O(TB);
  *  - every filter is a plain column predicate so it pushes into the
  *    parquet scan (check `PushedFilters` in `.explain`).
  */
object Relational {
  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  // Sum exactly as DECIMAL (associative → partition-count-invariant),
  // then surface as DOUBLE: the decimal→double cast of the same exact sum
  // is identical on both engines, and a double output avoids
  // decimal-precision/representation skew between Spark parquet and the
  // oracle's result frame.
  private def sumDec(c: org.apache.spark.sql.Column) =
    sum(dec(c)).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-group mode (q41) — the categorical analogue of A3's scalar
    // max: most frequent order priority per order status, with a
    // deterministic value tiebreak. Count-then-rank is the distributed
    // mode shape: the count aggregation is map-side combinable and the
    // rank window runs over GROUP-CARDINALITY rows (statuses ×
    // priorities), not data — at 100 TB the window input is still tiny.
    "q41_mode" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("n").desc, col("o_orderpriority"))
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("n"))
    }),

    // §2.4 A-family: grouped aggregation with partial/final hash agg
    // (TPC-H Q1 flavor; reference site `data_preprocessing.py:63` max-agg).
    "q01_agg_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumDec(col("l_quantity")).as("sum_qty"),
          sumDec(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("sum_disc_revenue"),
          count(lit(1)).as("count_order"),
          max(col("l_quantity")).as("max_qty"))
    }),

    // §2.2 F1-family: predicate pushdown → scan-local filter + slim agg
    // (TPC-H Q6 flavor). Date + range predicates reach the parquet reader.
    "q02_filter_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
                col("l_discount").between(0.02, 0.09) &&
                col("l_quantity") < 30)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"),
             count(lit(1)).as("n_rows"))
    }),

    // §2.3 J1–J4: star-join enrichment chain. nation/region broadcast
    // (like the reference's 4 dim joins, `db_to_dataframe.py:164-177`);
    // orders⋈customer shuffles on the key — correct at 100 TB.
    "q03_star_revenue" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sumDec(col("o_totalprice")).as("revenue"),
             count(lit(1)).as("n_orders"))
    }),

    // §2.3 pitfall (a): left join fan-out + unmatched-null handling →
    // X1 `coalesce(c, lit(0))` (reference `fillna('')`).
    "q04_left_join_counts" -> ((s, d) => {
      val p = Tables.part(s, d)
      val l = Tables.lineitem(s, d)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"),
                                       sumDec(col("l_quantity")).as("qty"))
      p.join(l, p("p_partkey") === l("l_partkey"), "left")
        .select(col("p_partkey"), col("p_brand"),
          coalesce(col("cnt"), lit(0L)).as("n_lines"),
          coalesce(col("qty"), lit(0.0d)).as("total_qty"))
    }),

    // §2.2 F2: `$in` membership as a left-semi join (reference
    // `db_to_dataframe.py:104` `$in` dim restriction).
    "q05_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // Anti-join complement of F2: customers with no urgent order.
    "q06_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // §2.5 W1/W2: ranking window — top-3 customers per market segment.
    "q07_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("c_mktsegment"), col("rnk"), col("c_custkey"),
                col("c_name"), col("c_acctbal"))
    }),

    // §2.4 A2 keep-first dedup re-expressed as the W1 window
    // (`data_preprocessing.py:28`): first line (by ordinal) per order.
    "q08_dedup_keepfirst" -> ((s, d) => {
      // l_linenumber alone is NOT unique per order in the synthetic data —
      // the window order must be a total order or keep-first is
      // nondeterministic (the exact pitfall A2 solves with `_rid`).
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"))
      Tables.lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
                col("l_quantity"))
    }),

    // §2.6 O1: global top-k — Spark plans TakeOrderedAndProject (no full
    // sort materialization; each partition keeps k, driver merges).
    "q09_topk_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // Rollup — subtotal + grand-total rows (Catalyst Expand + single agg).
    // same two-level rewrite as q16: pre-aggregate on the full key
    // (≤ |regions|·|nations| rows), rollup the collapsed frame — the
    // Expand never multiplies fact rows
    "q10_rollup" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      val pre = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("_n"), sum(dec(col("c_acctbal"))).as("_b"))
      pre.rollup(col("r_name"), col("n_name"))
        .agg(sum(col("_n")).as("n_cust"), sum(col("_b")).cast("double").as("bal"))
    }),

    // §2.6 GROUPING SETS — the general form rollup (q10) and cube (q16)
    // are special cases of: an arbitrary set list, here one that is
    // neither a rollup chain nor a power set. Same single-pass Expand
    // shape: each input row replicates once per grouping set before one
    // hash aggregation — no per-set rescan of the fact.
    // two-level rewrite (q16's): every requested set is coarser than
    // the full (returnflag, linestatus) key, so the pre-aggregate is a
    // lossless partial for all three sets
    "q27_grouping_sets" -> ((s, d) => {
      val pre = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).as("_q"), count(lit(1)).as("_n"))
      pre.groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("_q")).cast("double").as("sum_qty"),
          sum(col("_n")).as("n_rows"))
    }),

    // Relational DIVISION ("for all"): customers ALL of whose orders
    // are urgent-or-high priority — the universal-quantifier query
    // classically written NOT EXISTS (order with another priority).
    // Expressed as one aggregate (total = matching count), which beats
    // the double anti-join form at scale: a single groupBy with
    // map-side partials instead of two corpus-sized join inputs.
    "q35_division" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit(1))).as("_n_match"))
        .filter(col("n_orders") === col("_n_match"))
        .select(col("o_custkey"), col("n_orders"))),

    // Ordered string aggregation (LISTAGG / string_agg family): each
    // customer's order priorities concatenated in order-KEY order —
    // the A4 order-preserving-list family as a catalog query. Spark has
    // no ordered string_agg, so the order key rides inside the
    // collected structs and one map-side sort_array fixes the order
    // AFTER the (order-insensitive) aggregation — deterministic under
    // any shuffle, no window needed. Struct sort is lexicographic on
    // (orderkey), which is unique, so the order is total.
    // PERIOD-OVER-PERIOD DELTA — monthly revenue with the
    // month-over-month change in basis points. The division is
    // sign-SAFE: deltas go negative, and Spark's `div` truncates
    // toward zero while DuckDB's `//` floors — they disagree exactly
    // on negative operands — so the quotient is computed on the
    // magnitude and the sign reapplied, making both engines divide
    // only non-negative integers. Cardinality collapses to one row
    // per month before the (tiny, unpartitioned) lag window.
    "q46_mom_delta" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("month_start"))
      Tables.orders(s, d)
        .groupBy(date_trunc("MONTH", col("o_orderdate")).cast("long")
          .as("month_start"))
        .agg(sum(round(col("o_totalprice") * lit(100)).cast("long")).as("rev_c"))
        .withColumn("prev_c", lag(col("rev_c"), 1).over(w))
        .withColumn("delta_q4", when(col("prev_c").isNotNull && col("prev_c") > 0L,
          expr("""case when rev_c >= prev_c
                 |  then ((rev_c - prev_c) * 10000) div prev_c
                 |  else -(((prev_c - rev_c) * 10000) div prev_c) end""".stripMargin)))
        .select(col("month_start"), col("rev_c"), col("delta_q4"))
    }),

    // RUNNING DISTINCT COUNT — the window aggregate neither engine
    // supports natively (no count(DISTINCT) OVER): per customer, how
    // many distinct order priorities have been seen up to each order.
    // Spark expresses it as size(collect_set) over the running frame —
    // per-row state is bounded by the domain (≤ 5 priorities), so the
    // frame never accumulates unbounded payload; one custkey exchange.
    // PRECONDITION (the same contract simhashPairs enforces with
    // require()): the tracked column's value DOMAIN must be small and
    // bounded — collect_set state is O(domain) PER ROW, so a
    // high-cardinality column here (an id, a timestamp) would OOM the
    // window operator at scale. For unbounded domains use a
    // first-seen flag + running sum: mark each (custkey, value)'s
    // first row via row_number() = 1, then sum the flags over the
    // running frame — O(1) state at the cost of one extra exchange.
    // The oracle decorrelates the equivalent subquery.
    "q45_running_distinct" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.orders(s, d)
        .withColumn("n_distinct_prio",
          size(collect_set(col("o_orderpriority")).over(w)).cast("long"))
        .select(col("o_orderkey"), col("o_custkey"), col("n_distinct_prio"))
    }),

    "q34_listagg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(expr(
          """array_join(transform(
            |  array_sort(collect_list(struct(o_orderkey, o_orderpriority))),
            |  x -> x.o_orderpriority), ',')""".stripMargin)
          .as("priorities"),
          count(lit(1)).as("n_orders"))),

    // UNPIVOT (long↔wide, the inverse of e05's PIVOT): per-nation
    // customer and supplier counts melted into (nation, entity, n) rows
    // via Spark's native `unpivot` (a Generate/Expand — map-side, no
    // shuffle beyond the two pre-shrunk aggregates; the dim join
    // broadcasts). The oracle mirrors as UNION ALL, the relational
    // definition of unpivot.
    "q36_unpivot" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("customers"))
      val su = Tables.supplier(s, d)
        .groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("suppliers"))
      Tables.nation(s, d)
        .select(col("n_nationkey").as("nk"), col("n_name"))
        .join(c, Seq("nk"), "left").join(su, Seq("nk"), "left")
        .na.fill(0L, Seq("customers", "suppliers"))
        .unpivot(Array(col("n_name")),
          Array(col("customers"), col("suppliers")), "entity", "n")
    }),

    // Relative-standing windows: percent_rank + cume_dist over account
    // balance within each market segment — the distribution-position
    // family q29's ntile buckets don't expose. One exchange (both
    // functions share the (segment, balance, key) spec); the unique
    // order key makes rank arithmetic total-order deterministic, and
    // (rank−1)/(n−1) over identical integers is a correctly-rounded
    // IEEE divide on both engines — exact without quantization.
    "q37_pct_windows" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
    }),

    // RUNNING DISTINCT COUNT: distinct order priorities each customer
    // has used, cumulatively over their order history. collect_set over
    // a running frame would carry O(distinct) state per row; the
    // scalable form is FIRST-OCCURRENCE FLAGS — row_number()==1 over
    // (customer, priority) marks each first sighting, a running sum
    // over (customer) counts them. Two keyed exchanges (the specs
    // partition on different keys) — the inherent cost of running
    // distinct, but each stage is hash-partitioned and O(1)-state,
    // vs. the set-carrying form's per-row set state.
    "q38_running_distinct" -> ((s, d) => {
      val wFirst = Window.partitionBy(col("o_custkey"), col("o_orderpriority"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRun = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("_first",
          when(row_number().over(wFirst) === 1, lit(1L)).otherwise(lit(0L)))
        .withColumn("n_distinct_prio", sum(col("_first")).over(wRun))
        .select(col("o_orderkey"), col("o_custkey"), col("n_distinct_prio"))
    }),

    // Moving average over a sliding ROWS frame — the bounded-frame
    // window family (q17 covers the unbounded running frame): each
    // user's spend smoothed over their trailing 5 events. Bounded
    // frames evaluate in O(1) memory per row; the decimal sum keeps the
    // 5-term average exact before one double divide.
    "q33_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      Tables.events(s, d)
        .withColumn("avg5",
          (sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double")
            / count(lit(1)).over(w).cast("double")))
        .select(col("event_id"), col("user_id"), col("avg5"))
    }),

    // Gaps-and-islands: runs of the same event_type per user (the W2
    // run-length family — `report_generation.py:61-78` suppresses
    // repeated headers by detecting exactly these runs — generalized to
    // the classic streak-detection shape). lag() flags run starts, a
    // running sum numbers the islands, then one aggregation collapses
    // each island to its bounds. BOTH window functions share one
    // (partition, order) spec → ONE exchange + sort evaluates them
    // together, and the island aggregation's keys include the window's
    // partition key, so hashpartitioning(user_id) already satisfies the
    // groupBy distribution — no second shuffle (pinned in
    // PlanAssertionsSpec).
    "q28_gaps_islands" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables.events(s, d)
        .withColumn("_chg",
          when(lag(col("event_type"), 1).over(w) === col("event_type"), lit(0))
            .otherwise(lit(1)))
        .withColumn("_island", sum(col("_chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("_island"), col("event_type"))
        .agg(min(col("event_id")).as("start_event"),
          max(col("event_id")).as("end_event"),
          count(lit(1)).as("n_events"))
        .filter(col("n_events") >= 2)
        .select(col("user_id"), col("event_type"),
          col("start_event"), col("end_event"), col("n_events"))
    }),

    // Curriculum bucketing: ntile quartiles + percent_rank over a
    // quality axis, per stratum — the assignment step of
    // curriculum-ordered training (easy→hard scheduling needs every doc
    // labeled with its difficulty quantile). Per-LANG windows, not a
    // global ORDER BY: a global ntile is one unsplittable frame (the
    // q24 cliff); partitioned by stratum each frame is a task. Both
    // functions share one (partition, order) spec → one exchange. The
    // (n_chars, doc_id) order key is unique, so ntile's bucket
    // boundaries and percent_rank's ranks are total-order deterministic
    // on both engines.
    "q29_ntile_buckets" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("bucket", ntile(4).over(w).cast("long"))
        .withColumn("pct_q6",
          round(percent_rank().over(w) * lit(1e6)).cast("long"))
    }),

    // Full-outer join — the last join type missing from the catalog's
    // J-family matrix (inner/left/semi/anti/range/as-of/salted are
    // covered): year-over-year customer activity where either side may
    // be absent. Keys COALESCE explicitly (not join-USING) so both
    // engines emit the identical key column; both sides are aggregates
    // (one row per customer) so the full-outer is a key-keyed shuffle
    // join of two pre-shrunk inputs — the scale-correct shape (never
    // full-outer raw fact tables when an aggregate precedes it).
    "q30_full_outer" -> ((s, d) => {
      def yearly(y: Int) = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
                col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .groupBy(col("o_custkey").as(s"k$y"))
        .agg(count(lit(1)).as(s"n$y"))
      val a = yearly(1996)
      val b = yearly(1997)
      a.join(b, col("k1996") === col("k1997"), "full_outer")
        .select(coalesce(col("k1996"), col("k1997")).as("custkey"),
          coalesce(col("n1996"), lit(0L)).as("n_1996"),
          coalesce(col("n1997"), lit(0L)).as("n_1997"))
    }),

    // SCD-2 interval build: turn a change-event stream into
    // validity-ranged dimension rows (`valid_from` .. `valid_to`,
    // open-ended for the current version) — the warehouse pattern every
    // as-of join (e04) consumes. One lead() window per entity;
    // timestamps surface as epoch-microsecond longs (the engines'
    // common precision).
    "q31_scd2_intervals" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("valid_from_us", unix_micros(col("ts")))
        .withColumn("valid_to_us", unix_micros(lead(col("ts"), 1).over(w)))
        .withColumn("is_current", col("valid_to_us").isNull)
        .select(col("user_id"), col("event_id"),
          col("valid_from_us"), col("valid_to_us"), col("is_current"))
    }),

    // RFM segmentation: recency/frequency/monetary quartiles per
    // customer, ranked WITHIN the customer's market segment — the
    // classic CRM scoring query, and deliberately not a global ntile
    // (one unsplittable frame, the q24 cliff): per-segment windows keep
    // every frame a task, and "rank against your peer segment" is the
    // business-correct comparison anyway. Three quartile axes share one
    // exchange (same partition key, three sort orders); decimal spend
    // keeps the monetary order exact; ties break on the key.
    "q32_rfm" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val maxDate = orders.agg(max(col("o_orderdate")).as("_maxd"))
      val perCust = orders.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("_last"),
          count(lit(1)).as("frequency"),
          sumDec(col("o_totalprice")).as("monetary"))
        .crossJoin(broadcast(maxDate))
        .withColumn("recency_days",
          datediff(col("_maxd"), col("_last")).cast("long"))
      def seg(order: org.apache.spark.sql.Column*) = Window
        .partitionBy(col("c_mktsegment")).orderBy(order: _*)
      perCust
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("r_q",
          ntile(4).over(seg(col("recency_days"), col("o_custkey"))).cast("long"))
        .withColumn("f_q",
          ntile(4).over(seg(col("frequency").desc, col("o_custkey"))).cast("long"))
        .withColumn("m_q",
          ntile(4).over(seg(col("monetary").desc, col("o_custkey"))).cast("long"))
        .select(col("o_custkey").as("custkey"), col("c_mktsegment"),
          col("recency_days"), col("frequency"), col("monetary"),
          concat(col("r_q"), col("f_q"), col("m_q")).as("rfm"))
    }),

    // §2.8 X7/X8 conditional-default family: CASE bucketing.
    "q11_case_bucket" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("tier",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy(col("tier"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumDec(col("o_totalprice")).as("total"))
    }),

    // §2.4 A1: distinct on a projection.
    "q12_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
    }),

    // §2.7 set ops (engine extension — none in reference): big-ticket
    // buyers who never placed an urgent order. EXCEPT-of-two-branches
    // would scan `orders` twice (Catalyst plans it aggregate +
    // left-anti but cannot merge the scans); a single
    // groupBy(custkey) + bool_or flags + filter is the same set with
    // ONE scan and one shuffle, partials map-side. The flags coalesce
    // to false so the rewrite holds on NULLABLE inputs too: EXCEPT
    // simply drops NULL-predicate rows from each branch, whereas
    // bool_or over all-NULL yields NULL and `_big && !NULL` would
    // silently drop a customer whose priorities are all NULL.
    "q13_except" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(coalesce(bool_or(col("o_totalprice") > 400000), lit(false)).as("_big"),
          coalesce(bool_or(col("o_orderpriority") === "1-URGENT"), lit(false)).as("_urgent"))
        .filter(col("_big") && !col("_urgent"))
        .select(col("custkey"))
    }),

    // BAG-semantics set ops (§2.7 completeness): EXCEPT ALL / INTERSECT
    // ALL preserve multiplicity (n_left − n_right / min(n_left,
    // n_right) copies per value) — the multiset algebra Spark plans as
    // a single hash aggregation over counts, never a distinct. Both run
    // on (custkey, priority) multisets where repeat orders make the
    // multiplicities meaningful.
    "q43_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("custkey"),
          col("o_orderpriority").as("priority"))
        .exceptAll(
          o.filter(col("o_orderstatus") === "F")
            .select(col("o_custkey").as("custkey"),
              col("o_orderpriority").as("priority")))
    }),
    "q44_intersect_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("custkey"),
          col("o_orderpriority").as("priority"))
        .intersectAll(
          o.filter(col("o_orderstatus") === "F")
            .select(col("o_custkey").as("custkey"),
              col("o_orderpriority").as("priority")))
    }),

    // §2.8 X3–X6 string normalization family on `documents`: trim,
    // regex squeeze, translate, case, substring — all codegen built-ins
    // (reference `data_preprocessing.py:37-53`).
    "q14_string_norm" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          upper(substring(col("text"), 1, 20)).as("head"),
          length(col("text")).cast("long").as("n_chars_actual"),
          trim(regexp_replace(col("text"), "\\s+", " ")).as("squeezed"),
          translate(col("lang"), "aeiou", "AEIOU").as("lang_t"))
    }),

    // CUBE — all grouping-set combinations in one Expand + agg pass.
    // CUBE via the two-level rewrite: aggregate on the FULL grouping
    // key first (≤ |segments|·|statuses| rows), then cube the collapsed
    // frame. Spark's Expand multiplies its input by the number of
    // grouping sets (4 here) BEFORE the aggregate — cubing the raw join
    // output would quadruple fact-table shuffle volume, while cubing
    // the pre-aggregate costs ~nothing at any fact size. Exactness is
    // preserved because both partial aggregates are associative:
    // count → sum of counts, and the DECIMAL partial sums re-add
    // exactly (the same property sumDec relies on), with the
    // decimal→double cast applied once at the end.
    "q16_cube" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val pre = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("_n"), sum(dec(col("o_totalprice"))).as("_t"))
      pre.cube(col("c_mktsegment"), col("o_orderstatus"))
        .agg(sum(col("_n")).as("n"), sum(col("_t")).cast("double").as("total"))
    }),

    // Window FRAME (running aggregate): cumulative event value per user,
    // ordered by time — decimal accumulation so partial order of the
    // frame never changes the result.
    "q17_running_sum" -> ((s, d) => {
      // ordered by event_id (globally unique): a ts order key would be
      // ns-vs-µs precision-sensitive between engines
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("running_value",
          sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("running_value"))
    }),

    // Range join: equi key + date-band predicate (the as-of/band-join
    // family) — lineitems shipped within 90 days of their order's date.
    // Planned as a broadcast/shuffle hash join on the EQUI key with the
    // band as a post-join filter: the scalable shape (never a cartesian).
    "q18_range_join" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") < o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sumDec(col("l_extendedprice")).as("value"))
    }),

    // SQL front door (spark.sql over a temp view) + correlated scalar
    // subquery — Catalyst de-correlates it into an aggregate + join, the
    // only scalable shape. Each customer's largest order(s).
    "q22_sql_correlated" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_v o
          |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders_v o2
          |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
    }),

    // §2.7 INTERSECT — customers with both an urgent and a big-ticket
    // order. Same single-scan shape as q13: INTERSECT-of-branches
    // (aggregate + left-semi) reads `orders` twice; bool_or flags over
    // one groupBy(custkey) read it once.
    "q23_intersect" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(bool_or(col("o_orderpriority") === "1-URGENT").as("_urgent"),
          bool_or(col("o_totalprice") > 300000).as("_big"))
        .filter(col("_urgent") && col("_big"))
        .select(col("custkey"))
    }),

    // §2.5 EXACT group quantiles by explicit rank arithmetic — NOT
    // percentile_approx (whose t-digest is engine-private and
    // non-portable): value at rank ⌈q·n⌉ in the group's value order.
    // One window exchange; the oracle repeats the identical window
    // math, so the doubles match bit-for-bit.
    // Scale caveat, deliberate: exact quantiles need a total sort per
    // group, and a window partition cannot split — with few distinct
    // groups (6 returnflags) each group is one unsplittable sort task
    // at corpus scale. The scale paths are a sketch (KLL/t-digest,
    // approximate) or two-phase exact selection (histogram count, then
    // a filtered second pass); this operator is the exact,
    // oracle-checkable baseline those would be validated against.
    "q24_quantiles" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("qty"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("qty"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
        .groupBy(col("l_returnflag"))
        .agg(
          max(when(col("rn") === ceil(col("n") * 0.5), col("qty"))).as("p50"),
          max(when(col("rn") === ceil(col("n") * 0.9), col("qty"))).as("p90"))
    }),

    // §2.5 EXACT group quantiles, SCALE PATH — same answer as q24 (it
    // shares q24's oracle text verbatim) via two-phase histogram-prune
    // selection instead of q24's one unsplittable per-group window sort:
    //   Pass 1 — per-(group, unit-bucket) counts by groupBy: fully
    //     splittable, map-side partials; the only windows in the plan run
    //     over this HISTOGRAM (≤ #buckets rows per group, never O(rows)).
    //   Locate — the bucket whose cumulative count spans each target rank
    //     r = ⌈q·n⌉, plus the count strictly below it: a handful of rows.
    //   Pass 2 — broadcast-join the bracket set back onto the fact (only
    //     bracket-bucket rows survive), histogram the DISTINCT values
    //     within the bracket, and take the smallest value whose
    //     below+within-cumulative crosses r.
    // Equivalence to q24: the value at rank r depends only on the value
    // order (q24's orderkey/linenumber tie-break never changes the VALUE
    // at a rank, only which physical row carries it), and
    //   value@r = min { v : count(qty ≤ v) ≥ r },
    // which is exactly what the bracket + within-bucket cumulative
    // computes. At 100 TB each group's quantile costs two splittable
    // aggregations + windows over bounded histograms — no single-task
    // sort anywhere (PlanAssertionsSpec pins this mechanically).
    "q25_quantiles_2p" -> ((s, d) => {
      val vals = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("double").as("qty"))
      // Pass 1: bucketed histogram. Unit-width floor buckets suit this
      // column; any monotone bucketizer preserves the math.
      val hist = vals.groupBy(col("g"), floor(col("qty")).as("bkt"))
        .agg(count(lit(1)).as("cnt"))
      val cum = hist
        .withColumn("cum",
          sum(col("cnt")).over(Window.partitionBy(col("g")).orderBy(col("bkt"))))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("g"))))
      val brackets = Seq(0.5 -> "p50", 0.9 -> "p90").map { case (q, label) =>
        cum.withColumn("r", ceil(col("n") * q))
          .filter(col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
          .select(col("g").as("bg"), lit(label).as("q"), col("bkt"),
            (col("cum") - col("cnt")).as("below"), col("r"))
      }.reduce(_ union _)
      // Pass 2: the bracket set is ≤ #groups × #quantiles rows → broadcast.
      val inBracket = vals.join(broadcast(brackets),
          vals("g") === col("bg") && floor(vals("qty")) === col("bkt"))
      val byVal = inBracket
        .groupBy(col("g"), col("q"), col("qty"), col("below"), col("r"))
        .agg(count(lit(1)).as("c"))
      byVal
        .withColumn("cum2", col("below") +
          sum(col("c")).over(Window.partitionBy(col("g"), col("q")).orderBy(col("qty"))))
        .filter(col("cum2") >= col("r"))
        .groupBy(col("g"), col("q")).agg(min(col("qty")).as("v"))
        .groupBy(col("g").as("l_returnflag"))
        .agg(max(when(col("q") === "p50", col("v"))).as("p50"),
          max(when(col("q") === "p90", col("v"))).as("p90"))
    }),

    // §2.2 F2 literal `isin` + §2.3 broadcast: orders from ASIA/EUROPE
    // customers per priority.
    "q15_isin_filter" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name").isin("ASIA", "EUROPE"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // §2.5 extension: 2-D SKYLINE (Pareto frontier) — parts no other
    // part dominates (lower-or-equal price AND larger-or-equal size,
    // strict in at least one): the "cheapest large parts" query of
    // Börzsönyi et al., ICDE'01. The naive form is an O(n²) NOT
    // EXISTS self-join (the oracle); the engine computes it with two
    // splittable collapses and ONE window over the collapsed frame:
    //   1. per-price collapse — at a given price only the max size can
    //      survive (same-price-larger-size dominates): groupBy(price)
    //      → ≤ #distinct prices candidate points, map-side partials;
    //   2. frontier scan — order candidates by price asc; a candidate
    //      is dominated iff the running max of size over STRICTLY
    //      cheaper candidates reaches its size. One ordered window
    //      over the candidate set, not the fact table;
    //   3. semi-join the surviving (price, size) points back to the
    //      fact to list the rows carrying them (ties on both dims are
    //      all on the frontier, matching NOT EXISTS semantics).
    // Scale: the only ordered scan runs on the price-collapsed
    // candidates (bounded by #distinct prices — grid-coarsen the
    // price key if even that is too wide); the fact table sees one
    // groupBy and one broadcastable semi-join, never a self-join.
    "q47_skyline" -> ((s, d) => {
      val p = Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("long").as("p_size"))
      val cand = p.groupBy(col("p_retailprice").as("price"))
        .agg(max(col("p_size")).as("size"))
      val w = Window.orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val sky = cand
        .withColumn("mx", max(col("size")).over(w))
        .filter(col("mx").isNull || col("mx") < col("size"))
      p.join(broadcast(sky),
          p("p_retailprice") === sky("price") && p("p_size") === sky("size"),
          "left_semi")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    }),

    // §2.5 CONTINUOUS (interpolated) group quantiles — the
    // percentile_cont twin of q24's discrete value-at-rank: the
    // SQL-standard definition pos = (n−1)·q (0-based), answer =
    // v[⌊pos⌋] + (v[⌊pos⌋+1] − v[⌊pos⌋])·frac. Engine-native
    // percentile/quantile_cont functions are NOT used on either side —
    // their internal interpolation order is engine-private — both
    // engines instead evaluate this identical explicit op sequence on
    // the same ranked frame, so the doubles agree bit-for-bit. Same
    // deliberate scale caveat as q24 (one window sort per group;
    // q25's two-phase histogram prune is the scale path — locate the
    // two bracket ranks, interpolate after).
    "q48_quantile_cont" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("qty"), col("l_orderkey"), col("l_linenumber"))
      val ranked = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("qty"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("l_returnflag"))))
      def lo(q: Double) = floor((col("n") - 1) * lit(q)) + 1L
      val agg = ranked.groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n"),
          max(when(col("rn") === lo(0.5), col("qty"))).as("lo50"),
          max(when(col("rn") === lo(0.5) + 1L, col("qty"))).as("hi50"),
          max(when(col("rn") === lo(0.9), col("qty"))).as("lo90"),
          max(when(col("rn") === lo(0.9) + 1L, col("qty"))).as("hi90"))
      def frac(q: Double) =
        (col("n") - 1) * lit(q) - floor((col("n") - 1) * lit(q)).cast("double")
      agg.select(col("l_returnflag"),
        (col("lo50") + (coalesce(col("hi50"), col("lo50")) - col("lo50"))
          * frac(0.5)).as("p50c"),
        (col("lo90") + (coalesce(col("hi90"), col("lo90")) - col("lo90"))
          * frac(0.9)).as("p90c"))
    }),

    // §2.5 CONTINUOUS group quantiles, SCALE PATH (the q25 move
    // applied to q48, sharing q48's oracle verbatim): percentile_cont
    // needs the values at the TWO bracketing ranks
    // r_lo = ⌊(n−1)q⌋+1 and r_hi = r_lo+1 (1-based in value order),
    // then interpolates with frac = (n−1)q − ⌊(n−1)q⌋. Each rank is a
    // two-phase histogram-prune selection — value@r = min{v :
    // count(qty ≤ v) ≥ r}, located through a bounded per-(group,
    // unit-bucket) histogram, verified by a within-bracket cumulative
    // over DISTINCT values — so no per-group window ever touches
    // O(rows): both passes are splittable aggregations, the only
    // windows run over histograms. Interpolation is the identical
    // double expression q48 evaluates (same lo + (hi−lo)·frac fold on
    // the same doubles), so the answers agree bit-for-bit. For q < 1,
    // r_hi ≤ n always holds when the group has ≥ 2 rows; the coalesce
    // mirrors q48's single-row-group guard. At 100 TB this is the
    // plan to run; q48 stays as the exact windowed baseline it is
    // validated against (its sf1 probe ratio motivated this twin).
    "q49_quantile_cont_2p" -> ((s, d) => {
      val vals = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("double").as("qty"))
      val hist = vals.groupBy(col("g"), floor(col("qty")).as("bkt"))
        .agg(count(lit(1)).as("cnt"))
      val cum = hist
        .withColumn("cum",
          sum(col("cnt")).over(Window.partitionBy(col("g")).orderBy(col("bkt"))))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("g"))))
      // four rank targets: the lo/hi bracketing ranks per quantile
      val brackets = Seq(0.5 -> "p50", 0.9 -> "p90").flatMap {
        case (q, label) => Seq((q, s"${label}_lo", 1L), (q, s"${label}_hi", 2L))
      }.map { case (q, lbl, off) =>
        cum.withColumn("r", floor((col("n") - 1) * lit(q)) + lit(off))
          .filter(col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
          .select(col("g").as("bg"), lit(lbl).as("q"), col("bkt"),
            (col("cum") - col("cnt")).as("below"), col("r"), col("n"))
      }.reduce(_ union _)
      // bracket set ≤ #groups × 4 rows → broadcast; only bracket-bucket
      // fact rows survive the join
      val inBracket = vals.join(broadcast(brackets),
        vals("g") === col("bg") && floor(vals("qty")) === col("bkt"))
      val byVal = inBracket
        .groupBy(col("g"), col("q"), col("qty"), col("below"), col("r"),
          col("n"))
        .agg(count(lit(1)).as("c"))
      val at = byVal
        .withColumn("cum2", col("below") + sum(col("c")).over(
          Window.partitionBy(col("g"), col("q")).orderBy(col("qty"))))
        .filter(col("cum2") >= col("r"))
        .groupBy(col("g"), col("q"))
        .agg(min(col("qty")).as("v"), max(col("n")).as("n"))
      def frac(q: Double) =
        (col("n") - 1) * lit(q) - floor((col("n") - 1) * lit(q)).cast("double")
      at.groupBy(col("g"))
        .agg(max(col("n")).as("n"),
          max(when(col("q") === "p50_lo", col("v"))).as("lo50"),
          max(when(col("q") === "p50_hi", col("v"))).as("hi50"),
          max(when(col("q") === "p90_lo", col("v"))).as("lo90"),
          max(when(col("q") === "p90_hi", col("v"))).as("hi90"))
        .select(col("g").as("l_returnflag"),
          (col("lo50") + (coalesce(col("hi50"), col("lo50")) - col("lo50"))
            * frac(0.5)).as("p50c"),
          (col("lo90") + (coalesce(col("hi90"), col("lo90")) - col("lo90"))
            * frac(0.9)).as("p90c"))
    }))

  def oracle: Map[String, String] = {
    val m = oracleBase
    // q49 computes q48's answer through the two-phase plan, so the two
    // share one oracle text (the q25/s06 shared-oracle move)
    m + ("q49_quantile_cont_2p" -> m("q48_quantile_cont"))
  }

  private def oracleBase: Map[String, String] = Map(
    // q48 — identical explicit rank/floor/frac sequence; neither
    // engine's native percentile function appears on either side
    "q48_quantile_cont" ->
      """WITH v AS (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |    l_quantity::DOUBLE AS qty
        |  FROM lineitem),
        |r AS (
        |  SELECT l_returnflag, qty,
        |    CAST(row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY qty, l_orderkey, l_linenumber) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM v),
        |a AS (
        |  SELECT l_returnflag, max(n) AS n,
        |    max(CASE WHEN rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1 THEN qty END) AS lo50,
        |    max(CASE WHEN rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 2 THEN qty END) AS hi50,
        |    max(CASE WHEN rn = CAST(floor((n - 1) * 0.9) AS BIGINT) + 1 THEN qty END) AS lo90,
        |    max(CASE WHEN rn = CAST(floor((n - 1) * 0.9) AS BIGINT) + 2 THEN qty END) AS hi90
        |  FROM r GROUP BY 1)
        |SELECT l_returnflag,
        |  lo50 + (coalesce(hi50, lo50) - lo50) * ((n - 1) * 0.5 - floor((n - 1) * 0.5)) AS p50c,
        |  lo90 + (coalesce(hi90, lo90) - lo90) * ((n - 1) * 0.9 - floor((n - 1) * 0.9)) AS p90c
        |FROM a""".stripMargin,
    // q47 — the textbook NOT EXISTS dominance form; the engine's
    // collapse-then-frontier plan is an algebraic rewrite of it
    "q47_skyline" ->
      """SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin,
    // q46 — same magnitude-division CASE so // only sees non-negatives
    "q46_mom_delta" ->
      """WITH m AS (
        |  SELECT epoch(date_trunc('month', o_orderdate::TIMESTAMP))::BIGINT AS month_start,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |l AS (SELECT month_start, rev_c,
        |        lag(rev_c) OVER (ORDER BY month_start) AS prev_c FROM m)
        |SELECT month_start, rev_c,
        |  CASE WHEN prev_c IS NOT NULL AND prev_c > 0 THEN
        |    CASE WHEN rev_c >= prev_c
        |      THEN ((rev_c - prev_c) * 10000) // prev_c
        |      ELSE -(((prev_c - rev_c) * 10000) // prev_c) END
        |  END AS delta_q4
        |FROM l""".stripMargin,
    // q45 — correlated count(DISTINCT) over the same (date, key) prefix
    "q45_running_distinct" ->
      """SELECT o1.o_orderkey, o1.o_custkey,
        |  (SELECT count(DISTINCT o2.o_orderpriority) FROM orders o2
        |   WHERE o2.o_custkey = o1.o_custkey
        |     AND (o2.o_orderdate < o1.o_orderdate
        |          OR (o2.o_orderdate = o1.o_orderdate
        |              AND o2.o_orderkey <= o1.o_orderkey))) AS n_distinct_prio
        |FROM orders o1""".stripMargin,
    "q41_mode" ->
      """SELECT o_orderstatus, mode_priority, n FROM (
        |  SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |    count(*) AS n,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY count(*) DESC, o_orderpriority) AS rk
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority) m
        |WHERE rk = 1""".stripMargin,
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_revenue,
        |  count(*) AS count_order,
        |  max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 30""".stripMargin,
    "q03_star_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q04_left_join_counts" ->
      """SELECT p_partkey, p_brand,
        |  coalesce(cnt, 0) AS n_lines,
        |  coalesce(qty, 0.0) AS total_qty
        |FROM part LEFT JOIN (
        |  SELECT l_partkey, count(*) AS cnt,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY l_partkey
        |) agg ON p_partkey = l_partkey""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q07_window_topk" ->
      """SELECT c_mktsegment, rnk, c_custkey, c_name, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) ranked WHERE rnk <= 3""".stripMargin,
    "q08_dedup_keepfirst" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
        |  FROM lineitem) numbered WHERE rn = 1""".stripMargin,
    "q09_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q10_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q27_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin,
    // NULL = x is NULL → ELSE 1, exactly Spark's when().otherwise on the
    // first row of each user; event_id is globally unique so the ROWS
    // frame is well-defined on both engines
    "q28_gaps_islands" ->
      """WITH chg AS (
        |  SELECT user_id, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) = event_type
        |         THEN 0 ELSE 1 END AS c
        |  FROM events),
        |isl AS (
        |  SELECT user_id, event_id, event_type,
        |    sum(c) OVER (PARTITION BY user_id ORDER BY event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM chg)
        |SELECT user_id, event_type, min(event_id) AS start_event,
        |  max(event_id) AS end_event, count(*) AS n_events
        |FROM isl GROUP BY user_id, island, event_type
        |HAVING count(*) >= 2""".stripMargin,
    // the NOT EXISTS form — DuckDB states the universal quantifier
    // directly, proving the aggregate decomposition computes division
    "q35_division" ->
      """SELECT o_custkey, count(*) AS n_orders
        |FROM orders o
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders x
        |  WHERE x.o_custkey = o.o_custkey
        |    AND x.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
        |GROUP BY o_custkey""".stripMargin,
    "q34_listagg" ->
      """SELECT o_custkey, string_agg(o_orderpriority, ',' ORDER BY o_orderkey) AS priorities,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey""".stripMargin,
    // UNION ALL is the relational definition of unpivot
    "q36_unpivot" ->
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, count(*) AS n FROM supplier GROUP BY 1)
        |SELECT n_name, 'customers' AS entity, coalesce(c.n, 0)::BIGINT AS n
        |FROM nation LEFT JOIN c ON n_nationkey = c.nk
        |UNION ALL
        |SELECT n_name, 'suppliers' AS entity, coalesce(s.n, 0)::BIGINT AS n
        |FROM nation LEFT JOIN s ON n_nationkey = s.nk""".stripMargin,
    "q37_pct_windows" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin,
    "q38_running_distinct" ->
      """WITH f AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |    CASE WHEN row_number() OVER (PARTITION BY o_custkey, o_orderpriority
        |                                 ORDER BY o_orderdate, o_orderkey) = 1
        |         THEN 1 ELSE 0 END AS first_seen
        |  FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  CAST(sum(first_seen) OVER (PARTITION BY o_custkey
        |                             ORDER BY o_orderdate, o_orderkey
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_distinct_prio
        |FROM f""".stripMargin,
    "q33_moving_avg" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / (count(*) OVER w)::DOUBLE AS avg5
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q32_rfm" ->
      """WITH maxd AS (SELECT max(o_orderdate) AS d FROM orders),
        |pc AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_o, count(*) AS frequency,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |base AS (
        |  SELECT o_custkey AS custkey, c_mktsegment,
        |    CAST(date_diff('day', last_o::TIMESTAMP, maxd.d::TIMESTAMP) AS BIGINT) AS recency_days,
        |    frequency, monetary
        |  FROM pc CROSS JOIN maxd JOIN customer ON o_custkey = c_custkey)
        |SELECT custkey, c_mktsegment, recency_days, frequency, monetary,
        |  CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY recency_days, custkey) AS VARCHAR)
        |  || CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY frequency DESC, custkey) AS VARCHAR)
        |  || CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY monetary DESC, custkey) AS VARCHAR) AS rfm
        |FROM base""".stripMargin,
    "q31_scd2_intervals" ->
      """SELECT user_id, event_id,
        |  epoch_us(ts::TIMESTAMP) AS valid_from_us,
        |  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)::TIMESTAMP) AS valid_to_us,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM events""".stripMargin,
    "q30_full_outer" ->
      """WITH a AS (
        |  SELECT o_custkey AS k, count(*) AS n FROM orders
        |  WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
        |  GROUP BY 1),
        |b AS (
        |  SELECT o_custkey AS k, count(*) AS n FROM orders
        |  WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
        |  GROUP BY 1)
        |SELECT coalesce(a.k, b.k) AS custkey,
        |  coalesce(a.n, 0) AS n_1996, coalesce(b.n, 0) AS n_1997
        |FROM a FULL OUTER JOIN b ON a.k = b.k""".stripMargin,
    "q29_ntile_buckets" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS bucket,
        |  CAST(round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
        |             * 1000000.0) AS BIGINT) AS pct_q6
        |FROM documents""".stripMargin,
    "q11_case_bucket" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            ELSE 'large' END AS tier,
        |  o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q12_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q13_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q43_except_all" ->
      """SELECT o_custkey AS custkey, o_orderpriority AS priority
        |FROM orders WHERE o_totalprice > 200000
        |EXCEPT ALL
        |SELECT o_custkey AS custkey, o_orderpriority AS priority
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q44_intersect_all" ->
      """SELECT o_custkey AS custkey, o_orderpriority AS priority
        |FROM orders WHERE o_totalprice > 200000
        |INTERSECT ALL
        |SELECT o_custkey AS custkey, o_orderpriority AS priority
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q14_string_norm" ->
      """SELECT doc_id,
        |  upper(substring(text, 1, 20)) AS head,
        |  length(text) AS n_chars_actual,
        |  trim(regexp_replace(text, '\s+', ' ', 'g')) AS squeezed,
        |  translate(lang, 'aeiou', 'AEIOU') AS lang_t
        |FROM documents""".stripMargin,
    "q16_cube" ->
      """SELECT c_mktsegment, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderstatus)""".stripMargin,
    "q17_running_sum" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,
    "q18_range_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderpriority""".stripMargin,
    "q22_sql_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin,
    "q23_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000""".stripMargin,
    "q15_isin_filter" ->
      """SELECT r_name, o_orderpriority, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |GROUP BY r_name, o_orderpriority""".stripMargin,
    "q24_quantiles" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity::DOUBLE AS qty,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_quantity::DOUBLE, l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  max(CASE WHEN rn = ceil(n * 0.5) THEN qty END) AS p50,
        |  max(CASE WHEN rn = ceil(n * 0.9) THEN qty END) AS p90
        |FROM r GROUP BY l_returnflag""".stripMargin,
    // q25 computes the SAME answer as q24 through the two-phase plan, so
    // it reuses q24's oracle text verbatim: one ground truth, two plans.
    "q25_quantiles_2p" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity::DOUBLE AS qty,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_quantity::DOUBLE, l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  max(CASE WHEN rn = ceil(n * 0.5) THEN qty END) AS p50,
        |  max(CASE WHEN rn = ceil(n * 0.9) THEN qty END) AS p90
        |FROM r GROUP BY l_returnflag""".stripMargin)
}
