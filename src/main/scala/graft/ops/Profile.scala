package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-validation operators (SURVEY.md §7.5 extensions): column
  * profiling and declarative constraint checking — the pre-training
  * health gate every large pipeline runs before a corpus ships
  * (the Deequ/Great-Expectations family re-expressed as plain
  * aggregates).
  *
  * Scale shapes:
  *  - [[profileColumns]] is one aggregate PER COLUMN, unioned: each
  *    branch scans exactly one column (columnar pruning makes this
  *    nearly free in parquet), and every statistic is an ordinary
  *    map-side-partial aggregate. Deliberately NOT one multi-distinct
  *    aggregate over all columns: Spark plans k distinct aggregates as
  *    one Expand that replicates every row k times — a 5-column profile
  *    would scan-equivalent 5× the table THROUGH one shuffle instead of
  *    5 independent slim ones.
  *  - [[checkConstraints]] evaluates each rule as a violation COUNT
  *    (never materializing violating rows), so the report is one tiny
  *    row per rule; referential rules are anti-join counts that
  *    broadcast their (aggregated) key side when small.
  */
object Profile {
  /** One profile row per column: null count, exact distinct count, and
    * min/max rendered as strings (engine-portable for integer and
    * ASCII string columns — profile floats with a histogram sketch
    * instead, x05). Output: `(column, n_rows, n_nulls, n_distinct,
    * min_str, max_str)`. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_str"),
          max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _)
  }

  /** A declarative data-quality rule: a name plus a violation-count
    * frame (one row, one long). */
  final case class Rule(name: String, violations: DataFrame)

  /** Aggregate-count rule over one frame: violations = rows failing
    * `predicate`. `count`, not `sum`, so an EMPTY frame reports 0
    * violations / passed=true like the other rule builders (a sum over
    * zero rows is NULL, which would silently drop the rule row from a
    * `filter(passed)` gate). */
  def rule(name: String, df: DataFrame, predicate: Column): Rule =
    Rule(name, df.agg(
      count(when(!coalesce(predicate, lit(false)), lit(1)))
        .cast("long").as("violations")))

  /** Uniqueness rule: violations = rows beyond one per key value. */
  def uniqueRule(name: String, df: DataFrame, key: String): Rule =
    Rule(name, df.agg(
      (count(col(key)) - countDistinct(col(key))).as("violations")))

  /** Referential rule: violations = child rows whose `fk` has no match
    * in `parent.pk` (NULL fks count as violations — use a predicate
    * rule to allow them). */
  def refRule(name: String, child: DataFrame, fk: String,
              parent: DataFrame, pk: String): Rule =
    Rule(name, child.select(col(fk))
      .join(parent.select(col(pk)).distinct(),
        col(fk) === col(pk), "left_anti")
      .agg(count(lit(1)).cast("long").as("violations")))

  /** Evaluate rules into one report frame:
    * `(rule, violations, passed)`. */
  def checkConstraints(rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    rules.map { r =>
      r.violations.select(lit(r.name).as("rule"),
        col("violations"),
        (col("violations") === 0L).as("passed"))
    }.reduce(_ unionAll _)
  }

  /** The harness constraint set over the star schema + corpus. */
  def harnessRules(s: SparkSession, d: String): Seq[Rule] = Seq(
    uniqueRule("documents.doc_id unique", Tables.documents(s, d), "doc_id"),
    rule("documents.n_chars >= 0", Tables.documents(s, d),
      col("n_chars") >= 0),
    rule("documents.lang non-null", Tables.documents(s, d),
      col("lang").isNotNull),
    refRule("orders.o_custkey -> customer", Tables.orders(s, d), "o_custkey",
      Tables.customer(s, d), "c_custkey"),
    rule("lineitem.l_quantity in [1, 50]", Tables.lineitem(s, d),
      col("l_quantity").between(1.0, 50.0)),
    rule("events.ts non-null", Tables.events(s, d), col("ts").isNotNull))

  /** Distribution-DRIFT report (v03): per-stratum total-variation
    * distance between the stratum's length histogram and the corpus
    * histogram — the "did source X start shipping different data"
    * monitor that catches what v02's row-level constraints can't (each
    * row individually valid, the DISTRIBUTION shifted).
    *
    * Arithmetic is exact integers end-to-end: per-bucket shares in
    * micro-units via long division, TVD = Σ|share_s − share_g| div 2 —
    * long sums are associative, so the report is partition-invariant
    * and engine-portable with no float fold anywhere.
    *
    * Scale shape: the corpus pays ONE aggregation (stratum × bucket
    * counts); everything after operates on that tiny cube — stratum and
    * global marginals re-aggregate it, the stratum×bucket densification
    * (absent buckets MUST count toward drift) is a cross join of two
    * marginals, all broadcast-sized. Output: `(stratum, n_docs,
    * drift_q6)`. */
  def lengthDrift(docs: DataFrame, strata: String, value: String,
                  width: Long, nBuckets: Int): DataFrame = {
    val cube = docs
      .withColumn("_b", least(expr(s"$value div ${width}L"),
        lit(nBuckets - 1L)))
      .groupBy(col(strata), col("_b")).agg(count(lit(1)).as("cnt"))
    val tot = cube.groupBy(col(strata)).agg(sum(col("cnt")).as("tot"))
    val glob = cube.groupBy(col("_b")).agg(sum(col("cnt")).as("gcnt"))
    val gtot = docs.agg(count(lit(1)).as("gtot"))
    tot.crossJoin(broadcast(glob))
      .join(cube, Seq(strata, "_b"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(gtot))
      .withColumn("_s_q6", expr("(cnt * 1000000L) div tot"))
      .withColumn("_g_q6", expr("(gcnt * 1000000L) div gtot"))
      .groupBy(col(strata))
      .agg(max(col("tot")).as("n_docs"),
        expr("sum(abs(_s_q6 - _g_q6)) div 2").as("drift_q6"))
  }

  /** Robust per-stratum OUTLIER report (v04): median + MAD (median
    * absolute deviation) with the 3-MAD rule — the outlier monitor that
    * survives the outliers themselves (mean/stddev get dragged by the
    * very rows being hunted; the median does not).
    *
    * Exact integer arithmetic throughout: lower median = the
    * `(cnt+1) div 2`-th order statistic (row_number ties on equal
    * values pick different ROWS but the same VALUE, so the median is
    * well-defined on both engines), deviations and the 3·MAD gate are
    * long compares — no float anywhere.
    *
    * Scale note: the two per-stratum rank windows sort each stratum —
    * exact and fine while strata are plentiful; for few huge strata the
    * bounded-histogram quantile path (x05/x06) is the scale twin, the
    * same exact-baseline / scale-path pairing as d05/d07.
    * Output: `(stratum, med, mad, n_outliers, n_rows)`. */
  def madOutliers(df: DataFrame, strata: String, value: String): DataFrame = {
    val base = df.select(col(strata), col(value).cast("long").as("x"))
    def med(in: DataFrame, c: String, out: String) = {
      val w = Window.partitionBy(col(strata)).orderBy(col(c))
      val cw = Window.partitionBy(col(strata))
      in.withColumn("_rn", row_number().over(w))
        .withColumn("_cnt", count(lit(1)).over(cw))
        .filter(col("_rn") === expr("(_cnt + 1) div 2"))
        .select(col(strata), col(c).as(out))
    }
    val m1 = med(base, "x", "med")
    val dev = base.join(broadcast(m1), strata)
      .withColumn("ad", abs(col("x") - col("med")))
    val m2 = med(dev.select(col(strata), col("ad")), "ad", "mad")
    dev.join(broadcast(m2), strata)
      .groupBy(col(strata))
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("ad") > col("mad") * 3L, 1L).otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_rows"))
  }

  /** Candidate-KEY check (v05): does `keys` identify rows? One row:
    * group count, number of groups with >1 row, verdict. The groupBy
    * shuffles on the key columns with map-side partials, then collapses
    * to a single row — nothing group-sized ever reaches the driver. */
  def keyCheck(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("_c") > 1L, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("chk"), col("n_groups"), col("n_violations"),
        (col("n_violations") === 0L).as("holds"))

  /** Functional-dependency check (v05): does `det → dep` hold? A group
    * violates when it maps to >1 distinct dependent value (null-only
    * groups don't — count(DISTINCT) ignores nulls on both engines).
    * A key check is the FD `keys → rowid`; an FD through a unique
    * determinant holds trivially — both facts a schema-discovery pass
    * exploits. Same collapsed-to-one-row scale shape as [[keyCheck]];
    * the single distinct aggregate plans as a two-phase agg, not an
    * Expand. */
  def fdCheck(df: DataFrame, name: String, det: Seq[String],
              dep: String): DataFrame =
    df.groupBy(det.map(col): _*).agg(countDistinct(col(dep)).as("_nd"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("_nd") > 1L, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("chk"), col("n_groups"), col("n_violations"),
        (col("n_violations") === 0L).as("holds"))

  /** Per-source corpus datasheet (v06) — the "datasheets for datasets"
    * summary a corpus release ships: volume (docs/tokens/chars),
    * language spread, and exact-duplicate exposure, one row per source.
    * Composes the d01 signature (md5) with a corpus-wide occurrence
    * count via a window over the signature — one shuffle on the
    * (uniform) hash key, no join — then rolls up per source. Every
    * statistic is a map-side-combinable aggregate; `avg_chars` is one
    * exact-long division (IEEE divide is correctly rounded, so it
    * oracles exactly). */
  def sourceDatasheet(docs: DataFrame): DataFrame = {
    val sig = docs.select(col("source"), col("lang"), col("n_chars"),
      md5(col("text")).as("sig"),
      expr("size(filter(split(text, ' '), x -> x <> ''))").cast("long").as("nw"))
    sig
      .withColumn("sig_n", count(lit(1)).over(Window.partitionBy(col("sig"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("sig_n") >= 2, lit(1L)).otherwise(lit(0L))).as("n_dup_docs"),
        sum(col("n_chars")).as("n_chars_total"))
      .withColumn("avg_chars",
        col("n_chars_total").cast("double") / col("n_docs").cast("double"))
  }

  /** Corpus snapshot diff (v07) — what changed between two releases of
    * the same dataset: every id is classified `added` (new only),
    * `removed` (old only), or `changed` (both sides, different payload
    * hash); unchanged rows are dropped, so the output is sized by the
    * CHURN, not the corpus. The payload comparison is an md5 over the
    * content column (the d01 signature), computed map-side on each
    * side — the full-outer join then carries ids + 32-char digests
    * only, never the documents themselves.
    *
    * Scale shape: one key-keyed shuffle per side into the full-outer
    * join (the canonical diff plan); with both snapshots bucketed on
    * the id (q42's layout contract) even that exchange disappears.
    * This is the release-gate observability twin of v06: run it before
    * publishing a corpus version and the diff IS the changelog.
    * Output: `(id, status)`, status ∈ {added, removed, changed}. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, id: String,
                   payload: String): DataFrame = {
    val o = oldSnap.select(col(id).as("_oid"), md5(col(payload).cast("binary")).as("_oh"))
    val n = newSnap.select(col(id).as("_nid"), md5(col(payload).cast("binary")).as("_nh"))
    o.join(n, o("_oid") === n("_nid"), "full_outer")
      .withColumn("status",
        when(col("_oid").isNull, lit("added"))
          .when(col("_nid").isNull, lit("removed"))
          .when(col("_oh") =!= col("_nh"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(coalesce(col("_oid"), col("_nid")).as(id), col("status"))
  }

  /** Embedding-space drift monitor (v08) — per-stratum centroid cosine
    * against the whole-corpus centroid: a stratum whose mean embedding
    * points away from the corpus mean (cos ≪ 1) signals a source/batch
    * whose content distribution shifted — the embedding-space
    * counterpart of v03's length-histogram drift, and the check run on
    * every new crawl snapshot before it joins the training mix.
    *
    * Exactness discipline (k11's): elements quantize to q6 longs at the
    * scan, per-(stratum, dim) sums are exact integers, and both
    * centroids quantize back to q6 longs BEFORE the cosine — the dot
    * and norms are then exact int64 folds (≤ dims·10¹² ≪ 2⁶³), and the
    * final cosine is correctly-rounded double ops (/, ·, √) on
    * bit-identical inputs. No double is ever summed.
    *
    * Scale shape: ONE corpus-sized aggregation to (stratum × dims)
    * rows; the global centroid is a window over that tiny frame; the
    * readout aggregation is stratum-sized. The corpus never shuffles —
    * partial aggregation collapses the posexplode map-side.
    * Output: `(stratum, n_vecs, cos_q6)`. */
  def embeddingDrift(vectors: DataFrame, vec: String,
                     strata: String): DataFrame = {
    val q = vectors.select(col(strata).cast("long").as("g"),
      posexplode(expr(
        s"transform($vec, x -> cast(round(cast(x as double) * 1000000.0) as long))"))
        .as(Seq("dim", "q")))
    val wd = Window.partitionBy(col("dim"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cent = q.groupBy(col("g"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
      .withColumn("mg",
        round(col("sq").cast("double") / col("n").cast("double")).cast("long"))
      .withColumn("mall",
        round(sum(col("sq")).over(wd).cast("double")
          / sum(col("n")).over(wd).cast("double")).cast("long"))
    cent.groupBy(col("g"))
      .agg(max(col("n")).as("n_vecs"),
        sum(col("mg") * col("mall")).as("_dot"),
        sum(col("mg") * col("mg")).as("_na"),
        sum(col("mall") * col("mall")).as("_nb"))
      .select(col("g").as(strata), col("n_vecs"),
        round(col("_dot").cast("double")
          / (sqrt(col("_na").cast("double")) * sqrt(col("_nb").cast("double")))
          * lit(1e6)).cast("long").as("cos_q6"))
  }

  /** Row-level rule QUARANTINE (v09) — the routing twin of v02: v02
    * reports per-RULE violation counts, v09 emits the violating ROWS
    * with every failed rule named, the frame a pipeline writes to its
    * quarantine table while the clean remainder flows on (anti-join on
    * the output). Two of the three rules are LEARNED bounds (the row's
    * price against its priority group's mean), not static predicates —
    * the data-validation pattern where thresholds come from the data
    * itself, so nothing is hand-tuned per corpus.
    *
    * Determinism: the mean comparisons stay in integer cents cross-
    * multiplied (`pc·n·2 > Σpc·3` ⟺ price > 1.5·mean) — no division,
    * no doubles, so both engines decide identically. `concat_ws` skips
    * the null (unfired) slots and the rule order is fixed, so the
    * reason string is total-order stable.
    *
    * Scale shape: group stats are a priority-cardinality aggregate
    * broadcast back; every rule is then map-side — one aggregation
    * pass plus one broadcast join, no matter how many rules. Output:
    * `(o_orderkey, reasons, n_rules)`, quarantined rows only. */
  def quarantineOrders(orders: DataFrame): DataFrame = {
    val pc = round(col("o_totalprice") * lit(100)).cast("long")
    val stats = orders.groupBy(col("o_orderpriority"))
      .agg(sum(pc).as("sumc"), count(lit(1)).as("n"))
    orders.withColumn("pc", pc)
      .join(broadcast(stats), Seq("o_orderpriority"))
      .withColumn("r1", col("pc") * col("n") * lit(2L) > col("sumc") * lit(3L))
      .withColumn("r2", col("o_orderstatus") === "O" &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .withColumn("r3", col("o_orderpriority") === "1-URGENT" &&
        col("pc") * col("n") * lit(2L) < col("sumc"))
      .filter(col("r1") || col("r2") || col("r3"))
      .select(col("o_orderkey"),
        concat_ws(",",
          when(col("r1"), lit("price_above_1p5x_mean")),
          when(col("r2"), lit("stale_open")),
          when(col("r3"), lit("urgent_low_value"))).as("reasons"),
        (col("r1").cast("long") + col("r2").cast("long")
          + col("r3").cast("long")).as("n_rules"))
  }

  /** Cross-TABLE consistency checks (v10) — the referential dimension
    * v02's single-table rules can't see: foreign keys that resolve
    * (lineitem→orders, orders→customer) and a cross-table temporal
    * invariant (no lineitem ships before its order is placed). One
    * `(rule, violations, passed)` row per check, v02's readout shape.
    *
    * Scale shape: FK checks are LEFT ANTI joins that shuffle on the
    * key and reduce to one count each — the join IS the check, no row
    * survives except violations; the temporal rule is an equi-join
    * with a map-side predicate count. All three checks run as
    * independent branches and union at one row apiece. */
  def referentialChecks(orders: DataFrame, customer: DataFrame,
                        lineitem: DataFrame): DataFrame = {
    def row(rule: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("violations"))
        .select(lit(rule).as("rule"), col("violations"))
    row("lineitem.l_orderkey resolves in orders",
        lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"),
          "left_anti"))
      .unionByName(row("orders.o_custkey resolves in customer",
        orders.join(customer, orders("o_custkey") === customer("c_custkey"),
          "left_anti")))
      .unionByName(row("lineitem ships on/after order date",
        lineitem.join(orders,
            lineitem("l_orderkey") === orders("o_orderkey"))
          .filter(col("l_shipdate") < col("o_orderdate"))))
      .withColumn("passed", col("violations") === 0L)
  }

  /** v11 staleness threshold: a type whose newest event lags the
    * table's frontier by more than this is flagged (6 hours — generous
    * against the synthetic stream's per-type arrival cadence, so the
    * flag means a genuinely silent source, not jitter). */
  val FreshnessSlaUs: Long = 6L * 3600L * 1000000L

  /** FRESHNESS / STALENESS check (v11) — per event type, how far its
    * newest event lags the table's global frontier: the "did a source
    * silently stop publishing?" monitor every ingestion pipeline runs
    * against its landing tables. An outage that drops one upstream
    * feed leaves total row counts looking healthy (v01/v06 miss it);
    * the per-type frontier lag is the signal that isolates it.
    *
    * Scale shape: one pass collapses the table to (type → max ts) —
    * map-side combinable, #types rows — and the global frontier is the
    * max over THAT frame, so the fact table is scanned exactly once
    * and everything downstream is type-cardinality sized. Integer
    * microseconds end-to-end. Output: `(event_type, newest_us,
    * lag_us, stale)`. */
  def freshnessByType(events: DataFrame, typeCol: String, ts: String,
                      slaUs: Long = FreshnessSlaUs): DataFrame = {
    val perType = events
      .groupBy(col(typeCol).as("event_type"))
      .agg(max(unix_micros(col(ts))).as("newest_us"))
    val frontier = perType.agg(max(col("newest_us")).as("_frontier"))
    perType.crossJoin(broadcast(frontier))
      .withColumn("lag_us", col("_frontier") - col("newest_us"))
      .withColumn("stale", col("lag_us") > slaUs)
      .select(col("event_type"), col("newest_us"), col("lag_us"),
        col("stale"))
  }

  /** Expected Benford first-digit shares log₁₀(1 + 1/d), pre-rounded
    * to micro-units in the JVM and embedded as LITERALS in both the
    * Spark plan and the oracle — the cross-engine-exact way to carry
    * a transcendental constant (neither engine evaluates a log). */
  val BenfordQ6: Map[Int, Long] = (1 to 9).map(d =>
    d -> math.round(math.log10(1.0 + 1.0 / d) * 1000000.0)).toMap

  /** Benford first-digit conformance audit (v12) — the observed
    * leading-digit distribution of a positive numeric column against
    * Benford's law, the classic forensic-accounting screen: organic
    * multiplicative quantities (prices, populations, transaction
    * amounts) follow log₁₀(1+1/d), while fabricated or synthetically
    * generated numbers usually don't. For a training-data pipeline
    * this is a cheap tripwire on numeric table dumps: machine-written
    * tables with uniform or template-generated figures jump straight
    * out of the per-digit deviations. (The harness lineitem prices
    * are uniform-ish by construction — the audit REPORTING that
    * deviation is the demonstration.)
    *
    * Scale shape: leading-digit extraction is map-side string-head
    * arithmetic on the integer part; the table collapses to ≤ 9 rows
    * in one count aggregation, and shares are integer micro-unit
    * divisions over those 9 rows (window over the collapsed frame).
    * Output: `(digit, n_obs, obs_q6, exp_q6, dev_q6)` with signed
    * deviation, digits ascending by the caller's sort. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val expCase = (1 to 9).map { d =>
      s"WHEN digit = $d THEN ${BenfordQ6(d)}L"
    }.mkString("CASE ", " ", " ELSE 0L END")
    val digits = df
      .filter(col(valueCol) >= 1)
      .select(expr(s"cast(substring(cast(cast(floor($valueCol) as bigint) " +
        "as string), 1, 1) as bigint)").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    digits
      .withColumn("_total", sum(col("n_obs")).over(w))
      .select(col("digit"), col("n_obs"),
        expr("(n_obs * 1000000) div _total").as("obs_q6"),
        expr(expCase).as("exp_q6"))
      .withColumn("dev_q6", col("obs_q6") - col("exp_q6"))
  }

  /** Fixed-width PSI bin count and bin width for v13, inlined verbatim
    * in the oracle. Width 25 over the harness `value` column puts the
    * bulk of the distribution in bins 0–9 with the tail clamped into
    * the last bin. */
  val PsiBins: Int = 10
  val PsiWidth: Double = 25.0

  /** v13's clamped fixed-width bin index — ONE definition shared by
    * the one-pass batch readout, the standalone count pass, and the
    * streaming monitor, so the three can never bin differently. */
  def psiBin(value: Column, width: Double = PsiWidth,
             nBins: Int = PsiBins): Column =
    least(greatest(floor(value / lit(width)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")

  /** One population's bin counts `(bin, n)` — the artifact a drift
    * monitor PUBLISHES for its accepted reference distribution (10
    * rows, not data) and accumulates in streaming state for the
    * current one. */
  def psiBinCounts(df: DataFrame, value: String, width: Double = PsiWidth,
                   nBins: Int = PsiBins): DataFrame =
    df.withColumn("bin", psiBin(col(value), width, nBins))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))

  /** The PSI readout over two MATERIALIZED count tables `(bin, n)` —
    * how the deployed monitor actually reads: reference counts frozen
    * at publish time, current counts arriving from the stream's state
    * snapshot. Identical arithmetic to [[driftPsi]] (pinned by spec:
    * from-counts ≡ one-pass on any split), just fed from tables
    * instead of a single scan. */
  def driftPsiFrom(refCounts: DataFrame, curCounts: DataFrame,
                   nBins: Int = PsiBins): DataFrame = {
    val spark = refCounts.sparkSession
    val spine = spark.range(nBins.toLong).select(col("id").as("bin"))
    val joined = spine
      .join(refCounts.select(col("bin"), col("n").as("n_ref")),
        Seq("bin"), "left")
      .join(curCounts.select(col("bin"), col("n").as("n_cur")),
        Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("tot_ref"),
      sum(col("n_cur")).as("tot_cur"))
    joined.crossJoin(broadcast(tot))
      .withColumn("p", (col("n_ref") + lit(1)).cast("double")
        / (col("tot_ref") + lit(nBins)).cast("double"))
      .withColumn("q", (col("n_cur") + lit(1)).cast("double")
        / (col("tot_cur") + lit(nBins)).cast("double"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((col("p") - col("q")) * log(col("p") / col("q")) * lit(1e6))
          .cast("long").as("psi_q6"))
  }

  /** POPULATION STABILITY INDEX drift readout (v13) — the standard
    * model-monitoring statistic (Siddiqi 2006, credit-scorecard
    * practice): bin a numeric feature identically in a REFERENCE and a
    * CURRENT population, then PSI = Σ_b (p_b − q_b)·ln(p_b/q_b). The
    * industry rules of thumb (<0.1 stable, 0.1–0.25 shifting, >0.25
    * drifted) read directly off the summed micro-units. Complements
    * v03 (per-group histogram of one population) and v08 (centroid
    * drift in embedding space) with the two-sample readout a feature
    * monitor actually alerts on.
    *
    * Design for exactness and scale in one move: bins are FIXED-WIDTH
    * with the tail clamped into the edge bins (not reference
    * quantiles, which would cost a sort and make bin edges
    * data-dependent), so the whole readout is one map-side-combined
    * ≤`nBins`-key count aggregation over a single scan — scan-bound at
    * any scale, no window, no sort. Bin probabilities take Laplace
    * smoothing `(n_b+1)/(N+nBins)` so empty bins contribute finite
    * terms (the standard zero-count fix), keeping every term exact
    * integer arithmetic until one final double expression per bin.
    * Emits one row PER BIN (empty bins included via a generated spine,
    * so the readout's shape is constant): `(bin, n_ref, n_cur,
    * psi_q6)`; the consumer sums `psi_q6` for the headline number. */
  def driftPsi(df: DataFrame, value: String, isRef: Column,
               width: Double = PsiWidth, nBins: Int = PsiBins): DataFrame = {
    val spark = df.sparkSession
    val counts = df
      .withColumn("bin", psiBin(col(value), width, nBins))
      .withColumn("_ref", isRef)
      .groupBy(col("bin"))
      .agg(sum(when(col("_ref"), lit(1L)).otherwise(lit(0L))).as("n_ref"),
        sum(when(col("_ref"), lit(0L)).otherwise(lit(1L))).as("n_cur"))
    val spine = spark.range(nBins.toLong).select(col("id").as("bin"))
    val tot = counts.agg(sum(col("n_ref")).as("tot_ref"),
      sum(col("n_cur")).as("tot_cur"))
    spine.join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(tot))
      .withColumn("p", (col("n_ref") + lit(1)).cast("double")
        / (col("tot_ref") + lit(nBins)).cast("double"))
      .withColumn("q", (col("n_cur") + lit(1)).cast("double")
        / (col("tot_cur") + lit(nBins)).cast("double"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((col("p") - col("q")) * log(col("p") / col("q")) * lit(1e6))
          .cast("long").as("psi_q6"))
  }

  /** v14's alert bands — the industry PSI rules of thumb (<0.1 stable,
    * 0.1–0.25 shifting, >0.25 drifted), micro-unit quantized so the
    * verdict is an exact integer compare on both engines. */
  val PsiStableQ6: Long = 100000L
  val PsiDriftedQ6: Long = 250000L

  private def psiBandCol(total: Column): Column =
    when(total < lit(PsiStableQ6), lit("stable"))
      .when(total <= lit(PsiDriftedQ6), lit("shifting"))
      .otherwise(lit("drifted"))

  /** HEADLINE DRIFT VERDICT (v14) — the one-row readout a deployed
    * monitor actually alerts on: Σ psi_q6 over [[driftPsi]]'s per-bin
    * rows plus its band under the standard 0.1/0.25 thresholds. v13
    * publishes the per-bin diagnostic (WHERE the mass moved); v14 is
    * the alert row, so the banding logic lives in the engine once
    * instead of in every consumer. Summing the already-quantized
    * per-bin longs keeps the verdict exactly reproducible from v13's
    * oracled rows (the oracle literally sums the v13 text); the band
    * compare is integer-only. One extra single-row aggregate over the
    * ≤`nBins`-row readout — free at any scale.
    * Output: one row `(psi_total_q6, band)`. */
  def driftPsiVerdict(df: DataFrame, value: String, isRef: Column,
                      width: Double = PsiWidth,
                      nBins: Int = PsiBins): DataFrame =
    driftPsi(df, value, isRef, width, nBins)
      .agg(sum(col("psi_q6")).as("psi_total_q6"))
      .select(col("psi_total_q6"), psiBandCol(col("psi_total_q6")).as("band"))

  /** v14 over MATERIALIZED count tables — the stream edge's verdict:
    * frozen reference counts vs the state snapshot, one row out.
    * Identical arithmetic to [[driftPsiVerdict]] by the from-counts ≡
    * one-pass identity [[driftPsiFrom]] pins. */
  def driftPsiVerdictFrom(refCounts: DataFrame, curCounts: DataFrame,
                          nBins: Int = PsiBins): DataFrame =
    driftPsiFrom(refCounts, curCounts, nBins)
      .agg(sum(col("psi_q6")).as("psi_total_q6"))
      .select(col("psi_total_q6"), psiBandCol(col("psi_total_q6")).as("band"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benford screen on the price column — the fabricated-numbers
    // tripwire, here documenting the synthetic harness' own deviation
    "v12_benford" -> ((s, d) =>
      benfordAudit(Tables.lineitem(s, d), "l_extendedprice")),
    // v14 harness: the same even/odd split as v13 — the alert row over
    // v13's per-bin diagnostic
    "v14_drift_verdict" -> ((s, d) =>
      driftPsiVerdict(Tables.events(s, d), "value",
        col("user_id") % 2 === 0)),
    // v13 harness: even-user events are the accepted reference
    // distribution, odd-user events the arriving current one
    "v13_drift_psi" -> ((s, d) =>
      driftPsi(Tables.events(s, d), "value", col("user_id") % 2 === 0)),
    "v11_freshness" -> ((s, d) =>
      freshnessByType(Tables.events(s, d), "event_type", "ts")),
    "v10_referential" -> ((s, d) =>
      referentialChecks(Tables.orders(s, d), Tables.customer(s, d),
        Tables.lineitem(s, d))),
    "v09_quarantine" -> ((s, d) => quarantineOrders(Tables.orders(s, d))),
    "v06_source_datasheet" -> ((s, d) =>
      sourceDatasheet(Tables.documents(s, d))),
    "v08_embedding_drift" -> ((s, d) =>
      embeddingDrift(Tables.embeddings(s, d), "embedding", "label")),
    // v07 harness: the "old" release is missing ids ≡ 3 (mod 10), the
    // "new" one dropped ids ≡ 7 and re-edited ids ≡ 0 — every status
    // path exercised from one table
    "v07_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      snapshotDiff(
        docs.filter(col("doc_id") % 10 =!= 3),
        docs.filter(col("doc_id") % 10 =!= 7)
          .withColumn("text", when(col("doc_id") % 10 === 0,
            concat(col("text"), lit(" [rev2]"))).otherwise(col("text"))),
        "doc_id", "text")
    }),
    "v01_profile_columns" -> ((s, d) =>
      profileColumns(Tables.documents(s, d),
        Seq("doc_id", "lang", "source", "n_chars"))),
    "v02_constraints" -> ((s, d) =>
      checkConstraints(harnessRules(s, d))),
    "v03_drift" -> ((s, d) =>
      lengthDrift(Tables.documents(s, d), "source", "n_chars",
        width = 64L, nBuckets = 10)),
    "v04_outliers" -> ((s, d) =>
      madOutliers(Tables.documents(s, d), "source", "n_chars")),

    // schema discovery over real and deliberately-false hypotheses: a
    // held key (doc_id), the lineitem PK pair (which the SYNTHETIC
    // data violates — the profiler catching a broken assumption is the
    // point), a violated key (l_orderkey alone), an FD through a
    // unique determinant (holds by construction), and two
    // data-dependent FDs
    "v05_fd_keys" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val li = Tables.lineitem(s, d)
      keyCheck(docs, "key: documents.doc_id", Seq("doc_id"))
        .unionByName(keyCheck(li, "key: lineitem(l_orderkey, l_linenumber)",
          Seq("l_orderkey", "l_linenumber")))
        .unionByName(keyCheck(li, "key: lineitem.l_orderkey",
          Seq("l_orderkey")))
        .unionByName(fdCheck(Tables.nation(s, d),
          "fd: n_nationkey -> n_regionkey", Seq("n_nationkey"), "n_regionkey"))
        .unionByName(fdCheck(Tables.orders(s, d),
          "fd: o_custkey -> o_orderpriority", Seq("o_custkey"), "o_orderpriority"))
        .unionByName(fdCheck(docs, "fd: source -> lang", Seq("source"), "lang"))
    }))

  // v13 — identical clamped fixed-width binning, integer counts, and
  // ONE final double expression per bin evaluated in the same op
  // order (p and q inlined verbatim on both sides of − and ln).
  // A val because v14's oracle SUMS this exact text — one definition,
  // the same coordination rule as componentsCte.
  private val psiOracleSql: String =
    s"""WITH b AS (
         |  SELECT CAST(least(greatest(floor(value / $PsiWidth), 0), ${PsiBins - 1}) AS BIGINT) AS bin,
         |    user_id % 2 = 0 AS is_ref
         |  FROM events),
         |c AS (
         |  SELECT bin,
         |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
         |  FROM b GROUP BY bin),
         |s AS (SELECT unnest(range(0, $PsiBins)) AS bin),
         |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tot_ref,
         |             CAST(sum(n_cur) AS BIGINT) AS tot_cur FROM c),
         |j AS (
         |  SELECT s.bin, COALESCE(c.n_ref, 0) AS n_ref,
         |    COALESCE(c.n_cur, 0) AS n_cur
         |  FROM s LEFT JOIN c USING (bin))
         |SELECT bin, n_ref, n_cur,
         |  CAST(round(((n_ref + 1)::DOUBLE / (t.tot_ref + $PsiBins)::DOUBLE
         |      - (n_cur + 1)::DOUBLE / (t.tot_cur + $PsiBins)::DOUBLE)
         |    * ln(((n_ref + 1)::DOUBLE / (t.tot_ref + $PsiBins)::DOUBLE)
         |       / ((n_cur + 1)::DOUBLE / (t.tot_cur + $PsiBins)::DOUBLE))
         |    * 1000000.0) AS BIGINT) AS psi_q6
         |FROM j, t""".stripMargin

  def oracle: Map[String, String] = Map(
    "v13_drift_psi" -> psiOracleSql,
    // v14 — the sum of v13's already-quantized per-bin longs plus the
    // integer band compare: exact given v13's exactness
    "v14_drift_verdict" ->
      s"""WITH v13 AS ($psiOracleSql)
         |SELECT CAST(sum(psi_q6) AS BIGINT) AS psi_total_q6,
         |  CASE WHEN sum(psi_q6) < $PsiStableQ6 THEN 'stable'
         |       WHEN sum(psi_q6) <= $PsiDriftedQ6 THEN 'shifting'
         |       ELSE 'drifted' END AS band
         |FROM v13""".stripMargin,
    // v12 — same string-head digit, counts, q6 share division (both
    // operands non-negative, `//` ≡ `div`) and the same embedded
    // micro-unit Benford constants
    "v12_benford" -> {
      val expCase = (1 to 9).map { d =>
        s"WHEN digit = $d THEN ${BenfordQ6(d)}"
      }.mkString("CASE ", " ", " ELSE 0 END")
      s"""WITH d AS (
         |  SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT)
         |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM lineitem WHERE l_extendedprice >= 1),
         |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
         |t AS (SELECT digit, n_obs, CAST(sum(n_obs) OVER () AS BIGINT) AS total FROM c)
         |SELECT digit, n_obs,
         |  (n_obs * 1000000) // total AS obs_q6,
         |  CAST($expCase AS BIGINT) AS exp_q6,
         |  (n_obs * 1000000) // total - CAST($expCase AS BIGINT) AS dev_q6
         |FROM t""".stripMargin
    },
    // v11 — identical integer-microsecond frontier math
    "v11_freshness" ->
      s"""WITH t AS (
         |  SELECT event_type, max(epoch_us(ts::TIMESTAMP)) AS newest_us
         |  FROM events GROUP BY event_type),
         |f AS (SELECT max(newest_us) AS frontier FROM t)
         |SELECT event_type, newest_us, f.frontier - newest_us AS lag_us,
         |  f.frontier - newest_us > $FreshnessSlaUs AS stale
         |FROM t, f""".stripMargin,
    // v10 — anti joins as NOT IN / NOT EXISTS counts, same rule labels
    "v10_referential" ->
      """SELECT rule, violations, violations = 0 AS passed FROM (
        |  SELECT 'lineitem.l_orderkey resolves in orders' AS rule,
        |    CAST(count(*) AS BIGINT) AS violations
        |  FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'orders.o_custkey resolves in customer',
        |    CAST(count(*) AS BIGINT)
        |  FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'lineitem ships on/after order date',
        |    CAST(count(*) AS BIGINT)
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE l.l_shipdate < o.o_orderdate) t""".stripMargin,
    // v09 — identical integer cross-multiplied bounds and fixed rule
    // order; concat_ws(null-skip) ≡ concat_ws over list_filter
    "v09_quarantine" ->
      """WITH s AS (
        |  SELECT o_orderpriority,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sumc,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY o_orderpriority),
        |f AS (
        |  SELECT o.o_orderkey,
        |    CAST(round(o.o_totalprice * 100) AS BIGINT) * s.n * 2 > s.sumc * 3 AS r1,
        |    o.o_orderstatus = 'O' AND o.o_orderdate < TIMESTAMP '1996-01-01' AS r2,
        |    o.o_orderpriority = '1-URGENT'
        |      AND CAST(round(o.o_totalprice * 100) AS BIGINT) * s.n * 2 < s.sumc AS r3
        |  FROM orders o JOIN s USING (o_orderpriority))
        |SELECT o_orderkey,
        |  array_to_string(list_filter(
        |    [CASE WHEN r1 THEN 'price_above_1p5x_mean' END,
        |     CASE WHEN r2 THEN 'stale_open' END,
        |     CASE WHEN r3 THEN 'urgent_low_value' END], x -> x IS NOT NULL), ',') AS reasons,
        |  CAST(r1 AS BIGINT) + CAST(r2 AS BIGINT) + CAST(r3 AS BIGINT) AS n_rules
        |FROM f WHERE r1 OR r2 OR r3""".stripMargin,
    // v08 — k11's q6 element quantization, exact integer centroid sums,
    // centroids re-quantized to q6 longs before an exact integer
    // dot/norm fold; only correctly-rounded double ops after
    "v08_embedding_drift" ->
      """WITH u AS (
        |  SELECT CAST(label AS BIGINT) AS g, unnest(list_transform(embedding, (x, i) ->
        |    {'dim': CAST(i - 1 AS BIGINT),
        |     'q': CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)})) AS s
        |  FROM embeddings),
        |q AS (SELECT g, s.dim AS dim, s.q AS q FROM u),
        |per AS (
        |  SELECT g, dim, count(*) AS n, CAST(sum(q) AS BIGINT) AS sq
        |  FROM q GROUP BY g, dim),
        |cent AS (
        |  SELECT g, dim, n,
        |    CAST(round(sq::DOUBLE / n::DOUBLE) AS BIGINT) AS mg,
        |    CAST(round((sum(sq) OVER (PARTITION BY dim))::DOUBLE
        |      / (sum(n) OVER (PARTITION BY dim))::DOUBLE) AS BIGINT) AS mall
        |  FROM per)
        |SELECT g AS label, max(n) AS n_vecs,
        |  CAST(round(CAST(sum(mg * mall) AS BIGINT)::DOUBLE
        |    / (sqrt(CAST(sum(mg * mg) AS BIGINT)::DOUBLE)
        |       * sqrt(CAST(sum(mall * mall) AS BIGINT)::DOUBLE))
        |    * 1000000.0) AS BIGINT) AS cos_q6
        |FROM cent GROUP BY g""".stripMargin,
    // v07 — the same synthetic old/new releases, full-outer on the id
    // with md5 payload compare; unchanged rows filtered on both engines
    "v07_snapshot_diff" ->
      """WITH o AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 <> 3),
        |n AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 10 = 0 THEN text || ' [rev2]' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 10 <> 7)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h <> n.h""".stripMargin,
    "v06_source_datasheet" ->
      """WITH sig AS (
        |  SELECT source, lang, n_chars, md5(text) AS sig,
        |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS nw
        |  FROM documents),
        |c AS (SELECT sig, count(*) AS sig_n FROM sig GROUP BY sig)
        |SELECT source, count(*)::BIGINT AS n_docs, sum(nw)::BIGINT AS n_tokens,
        |  count(DISTINCT lang)::BIGINT AS n_langs,
        |  sum(CASE WHEN sig_n >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
        |  sum(n_chars)::BIGINT AS n_chars_total,
        |  sum(n_chars)::DOUBLE / count(*)::DOUBLE AS avg_chars
        |FROM sig JOIN c USING (sig) GROUP BY source""".stripMargin,
    "v01_profile_columns" -> {
      val branches = Seq("doc_id", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS column, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_str,
           |  CAST(max($c) AS VARCHAR) AS max_str
           |FROM documents""".stripMargin
      }
      branches.mkString("\nUNION ALL\n")
    },
    "v02_constraints" ->
      """SELECT rule, violations, violations = 0 AS passed FROM (
        |  SELECT 'documents.doc_id unique' AS rule,
        |    count(doc_id) - count(DISTINCT doc_id) AS violations FROM documents
        |  UNION ALL
        |  SELECT 'documents.n_chars >= 0',
        |    count(CASE WHEN NOT coalesce(n_chars >= 0, FALSE) THEN 1 END)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'documents.lang non-null',
        |    count(CASE WHEN lang IS NULL THEN 1 END) FROM documents
        |  UNION ALL
        |  SELECT 'orders.o_custkey -> customer', count(*)
        |  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o_custkey = c_custkey
        |  WHERE c_custkey IS NULL
        |  UNION ALL
        |  SELECT 'lineitem.l_quantity in [1, 50]',
        |    count(CASE WHEN NOT coalesce(l_quantity BETWEEN 1.0 AND 50.0, FALSE) THEN 1 END)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'events.ts non-null',
        |    count(CASE WHEN ts IS NULL THEN 1 END) FROM events) rules""".stripMargin,
    // v03 — the same integer-share TVD over the (source × bucket) cube;
    // `//` ≡ Spark's `div` on the non-negative longs involved
    "v03_drift" ->
      """WITH cube_sb AS (
        |  SELECT source, least(n_chars // 64, 9) AS b, count(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot FROM cube_sb GROUP BY 1),
        |gl AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS gcnt FROM cube_sb GROUP BY 1),
        |gt AS (SELECT count(*) AS gtot FROM documents),
        |dense AS (
        |  SELECT t.source, g.b, t.tot, coalesce(s.cnt, 0) AS cnt, g.gcnt
        |  FROM tot t CROSS JOIN gl g
        |  LEFT JOIN cube_sb s ON s.source = t.source AND s.b = g.b)
        |SELECT source, max(tot) AS n_docs,
        |  CAST(sum(abs((cnt * 1000000) // tot
        |             - (gcnt * 1000000) // (SELECT gtot FROM gt))) // 2 AS BIGINT)
        |    AS drift_q6
        |FROM dense GROUP BY source""".stripMargin,
    // v04 — identical two-pass lower-median + 3·MAD gate, all longs
    "v04_outliers" ->
      """WITH b AS (SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
        |m1 AS (
        |  SELECT source, x AS med FROM (
        |    SELECT source, x, row_number() OVER (PARTITION BY source ORDER BY x) AS rn,
        |      count(*) OVER (PARTITION BY source) AS cnt FROM b) t
        |  WHERE rn = (cnt + 1) // 2),
        |dev AS (
        |  SELECT b.source, b.x, m1.med, abs(b.x - m1.med) AS ad
        |  FROM b JOIN m1 USING (source)),
        |m2 AS (
        |  SELECT source, ad AS mad FROM (
        |    SELECT source, ad, row_number() OVER (PARTITION BY source ORDER BY ad) AS rn,
        |      count(*) OVER (PARTITION BY source) AS cnt FROM dev) t
        |  WHERE rn = (cnt + 1) // 2)
        |SELECT dev.source, max(dev.med) AS med, max(m2.mad) AS mad,
        |  CAST(sum(CASE WHEN dev.ad > 3 * m2.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  count(*) AS n_rows
        |FROM dev JOIN m2 USING (source) GROUP BY dev.source""".stripMargin,

    // v05 — each check collapses its grouped counts the same way; CHECK
    // is reserved in SQL, hence `chk`
    "v05_fd_keys" -> {
      def key(name: String, table: String, keys: String) =
        s"""SELECT '$name' AS chk, count(*) AS n_groups,
           |  CAST(count(CASE WHEN c > 1 THEN 1 END) AS BIGINT) AS n_violations,
           |  count(CASE WHEN c > 1 THEN 1 END) = 0 AS holds
           |FROM (SELECT count(*) AS c FROM $table GROUP BY $keys) g""".stripMargin
      def fd(name: String, table: String, det: String, dep: String) =
        s"""SELECT '$name' AS chk, count(*) AS n_groups,
           |  CAST(count(CASE WHEN nd > 1 THEN 1 END) AS BIGINT) AS n_violations,
           |  count(CASE WHEN nd > 1 THEN 1 END) = 0 AS holds
           |FROM (SELECT count(DISTINCT $dep) AS nd FROM $table GROUP BY $det) g""".stripMargin
      Seq(
        key("key: documents.doc_id", "documents", "doc_id"),
        key("key: lineitem(l_orderkey, l_linenumber)", "lineitem",
          "l_orderkey, l_linenumber"),
        key("key: lineitem.l_orderkey", "lineitem", "l_orderkey"),
        fd("fd: n_nationkey -> n_regionkey", "nation", "n_nationkey", "n_regionkey"),
        fd("fd: o_custkey -> o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
        fd("fd: source -> lang", "documents", "source", "lang")
      ).mkString("\nUNION ALL\n")
    })
}
