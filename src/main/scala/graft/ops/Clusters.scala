package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution — the step AFTER pair generation that a
  * production dedup pipeline actually acts on (SURVEY.md §7.5
  * extensions): near-dup pairs from [[Dedup]] are edges of an
  * undirected graph; each connected component is one duplicate cluster;
  * the canonical keeper is the minimum doc id in the component.
  *
  * Spark shape: iterative MIN-LABEL PROPAGATION. Every node starts
  * labeled with itself; each round every node takes the min of its own
  * and its neighbors' labels; at fixpoint every node carries its
  * component's minimum id. Each round is one shuffle join
  * (edges ⋈ labels) plus a groupBy min — fully distributed, and the
  * round count is the graph DIAMETER, not the graph size. Near-dup
  * graphs are unions of small dense cliques (that is what "duplicates"
  * means), so the diameter is tiny and 2–3 rounds converge; for
  * adversarial long-chain graphs the known fix is star-contraction
  * (large-star/small-star, Kiveris et al.), which contracts paths in
  * O(log n) rounds — noted here as the documented boundary, same
  * pattern as the k03 centroid-broadcast note.
  *
  * The driver loop holds only the convergence COUNTER (one long per
  * round) — labels never leave the executors; each round's frame is
  * cached and the previous round unpersisted, so peak storage is two
  * label tables.
  *
  * Determinism: min is associative/commutative and the iteration is a
  * monotone fixpoint — the result is independent of execution order,
  * partitioning, and round batching, which is what lets a DuckDB
  * recursive CTE reproduce it exactly.
  */
object Clusters {

  /** Connected components over an undirected pair list.
    *
    * The RETURNED frame is cached (already materialized by the final
    * convergence check) and stays so: its lineage encodes every
    * propagation round, so dropping the cache would make any downstream
    * action replay the whole iteration. Long-lived sessions should
    * `unpersist()` it when done — same ownership contract as a
    * checkpointed GraphX result.
    *
    * @param pairs frame with two id columns (`a`, `b`), each row an edge
    * @return `(doc_id, cluster_id)` — one row per node that appears in
    *         at least one edge, labeled with its component's min id */
  def connectedComponents(pairs: DataFrame, a: String, b: String): DataFrame = {
    val edges = pairs.select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
      .union(pairs.select(col(b).cast("long").as("src"), col(a).cast("long").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id"), col("src").as("label"))
      .distinct()
      .cache()
    // Convergence check rides the SAME aggregation that materializes the
    // round: labels are monotone non-increasing, so the label-sum
    // strictly decreases on every non-converged round and the fixpoint
    // is exactly "sum unchanged" — no join against the previous labels,
    // one job per round. Decimal sum: no overflow at any id range.
    // sum over an EMPTY label table is SQL NULL — coalesce to 0 so a
    // pair-free input (a corpus with no duplicates) converges instead
    // of NPE-ing on the comparison
    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")))
        .collect().head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      // each node's next label: min over (its label, its neighbors' labels)
      val next = edges
        .join(labels.withColumnRenamed("id", "src")
          .withColumnRenamed("label", "src_label"), Seq("src"))
        .select(col("dst").as("id"), col("src_label").as("label"))
        .union(labels)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .cache()
      val nextSum = labelSum(next)
      labels.unpersist()
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Cluster summary: keeper (= cluster id = min doc id) and member
    * count per duplicate cluster. Output: `(cluster_id, n_members)`. */
  def clusterSummary(components: DataFrame): DataFrame =
    components.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))

  /** The end of the dedup pipeline: the corpus with every non-keeper
    * removed — each duplicate cluster keeps exactly its min-id doc,
    * unpaired docs pass through untouched. One anti-join against the
    * (tiny) non-keeper set: `|components| − |clusters|` rows, which
    * broadcast at any realistic dup rate. */
  def dedupCorpus(docs: DataFrame, id: String,
                  pairs: DataFrame, a: String, b: String): DataFrame = {
    val nonKeepers = connectedComponents(pairs, a, b)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(id))
    docs.join(nonKeepers, Seq(id), "left_anti")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // clusters over the d02 near-dup pairs: every doc that has at least
    // one near-dup, labeled with its cluster's canonical keeper
    "c01_dup_clusters" -> ((s, d) =>
      connectedComponents(
        Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text", threshold = 0.6),
        "doc_a", "doc_b")),
    // the deduplicated corpus: near-dup clusters keep their min-id doc
    "c02_dedup_corpus" -> ((s, d) =>
      dedupCorpus(Tables.documents(s, d), "doc_id",
        Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text", threshold = 0.6),
        "doc_a", "doc_b")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))))

  def oracle: Map[String, String] = Map(
    // the same fixpoint as a recursive CTE: comp enumerates
    // (node, label-of-any-node-that-reaches-it); min per node = the
    // component minimum — identical to min-label propagation's fixpoint
    "c01_dup_clusters" -> {
      val pairsSql = Dedup.oracle("d02_ngram_jaccard")
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |comp(id, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, c.label FROM comp c JOIN edges e ON e.src = c.id)
         |SELECT id AS doc_id, min(label) AS cluster_id FROM comp GROUP BY id""".stripMargin
    },
    "c02_dedup_corpus" -> {
      val pairsSql = Dedup.oracle("d02_ngram_jaccard")
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |comp(id, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, c.label FROM comp c JOIN edges e ON e.src = c.id),
         |lab AS (SELECT id, min(label) AS cluster FROM comp GROUP BY id)
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM lab WHERE cluster < id)""".stripMargin
    })
}
