package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for training-data assembly (SURVEY.md §7.5
  * extensions): assign each document a position in a stream of
  * fixed-capacity chunks (context windows), the step every LLM
  * pre-training pipeline runs between curation and tokenized shards.
  *
  * Concat-packing semantics: documents are laid head-to-tail in id
  * order and the stream is sliced every `capacity` units, so
  * `chunk_id = ⌊prefix_sum / capacity⌋` and `chunk_off` is the
  * document's offset inside its first chunk (documents longer than the
  * remaining room straddle a boundary — the train-time reader slices
  * them, attention masks handle the seam).
  *
  * The interesting part at 100 TB is the GLOBAL prefix sum. A plain
  * `sum(...) OVER (ORDER BY id)` window has one unpartitioned frame —
  * Spark executes it as a single-task sort, the classic scale cliff.
  * [[packChunks]] instead runs the canonical two-pass distributed scan:
  *
  *  1. range-exchange + in-partition sort on the id (Spark's normal
  *     distributed-sort machinery — every partition splittable);
  *  2. job 1: one `O(#partitions)` pass collecting each partition's
  *     weight SUM (one long per partition to the driver — KBs at any
  *     corpus size);
  *  3. job 2: re-reads the SAME shuffle output (same RDD lineage, so
  *     the DAG scheduler skips the map stage) and streams each
  *     partition once, seeded with its broadcast prefix offset.
  *
  * This is the one operator family where `mapPartitions` genuinely
  * beats any declarative form — a scan is per-partition imperative by
  * nature — and the RDD surface is confined to the two passes.
  * Determinism: for a deterministic input the range boundaries,
  * per-partition sums, and offsets are all functions of the data
  * (RangePartitioner's sketch is seeded by partition index), so re-runs
  * and task retries reproduce identical assignments.
  *
  * [[packChunksBySource]] is the window-native twin for the common
  * "never mix sources in a chunk" policy: the frame partitions by
  * source, so every window partition is one source — splittable across
  * sources, and the right tool whenever the per-source row volume fits
  * a task. The a01/a02 pair mirrors q24/q25 and d05/d07: same math,
  * exact baseline vs scale shape.
  */
object Pack {
  /** Default chunk capacity used by the harness queries (characters —
    * the synthetic corpus carries `n_chars`; a tokenized corpus would
    * pass its token-count column). */
  val DefaultCapacity: Long = 2048L

  /** Global concat-packing via the two-pass distributed prefix scan.
    * Output: `(doc_id, chunk_id, chunk_off)`, one row per input row.
    * `id` must be unique (it is the total order); NULL weights count
    * as 0. */
  def packChunks(docs: DataFrame, id: String, weight: String,
                 capacity: Long = DefaultCapacity): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = docs.sparkSession
    val base = docs
      .select(col(id).cast("long").as("doc_id"),
        coalesce(col(weight).cast("long"), lit(0L)).as("w"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
    // ONE RDD object for both jobs: job 2 reuses job 1's range-shuffle
    // output (identical shuffle dependency → map stage skipped).
    val rdd = base.rdd
    // Pass 1: per-partition totals — O(#partitions) longs on the driver.
    val partSums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(1)); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _).dropRight(1)
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    // Pass 2: stream each partition once, seeded with its offset.
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bcOffsets.value(i)
      it.map { r =>
        val start = acc
        acc += r.getLong(1)
        Row(r.getLong(0), start / capacity, start % capacity)
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("chunk_id", LongType, nullable = false),
      StructField("chunk_off", LongType, nullable = false))))
  }

  /** Per-stratum concat-packing: chunks never span a `strata` value, so
    * the prefix sum partitions by source and a plain window computes it
    * — splittable across sources, single exchange. Output:
    * `(strata, doc_id, chunk_id, chunk_off)`. */
  def packChunksBySource(docs: DataFrame, id: String, weight: String,
                         strata: String,
                         capacity: Long = DefaultCapacity): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(col(strata)).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(strata), col(id).cast("long").as("doc_id"),
        coalesce(col(weight).cast("long"), lit(0L)).as("w"))
      .withColumn("excl", coalesce(sum(col("w")).over(w), lit(0L)))
      // `div`, not `/`: integral floor division stays exact at any
      // corpus size (a double quotient loses ulps past 2^53)
      .select(col(strata), col("doc_id"),
        expr(s"excl div ${capacity}L").as("chunk_id"),
        expr(s"excl % ${capacity}L").as("chunk_off"))
  }

  /** Sliding-window document chunking (a03) — the OTHER packing policy:
    * instead of concatenating docs into a stream ([[packChunks]]), split
    * each long document into fixed-size overlapping token windows
    * (`chunkSize` tokens every `stride`; `chunkSize − stride` tokens of
    * overlap carry context across the seam) — the
    * `return_overflowing_tokens` convention of tokenizer pipelines.
    * Chunk starts run `0, stride, 2·stride, …` up to the first chunk
    * that reaches the document's end, so every token is covered and no
    * trailing chunk is a redundant suffix of its predecessor.
    *
    * Pure map-side — one generator over the scan, no shuffle, no state;
    * the per-doc chunk count is bounded by the context-window-bounded
    * doc length. Output: `(doc_id, chunk_idx, start_tok,
    * n_chunk_tokens, chunk_text)`. */
  def slidingChunks(docs: DataFrame, id: String, text: String,
                    chunkSize: Int = 24, stride: Int = 16): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    docs
      .select(col(id).as("doc_id"),
        expr(s"filter(split($text, ' '), x -> x <> '')").as("_w"))
      .filter(size(col("_w")) > 0)
      .select(col("doc_id"),
        explode(expr(
          s"""transform(
             |  sequence(0, IF(size(_w) <= $chunkSize, 0,
             |    (size(_w) - $chunkSize + $stride - 1) div $stride)),
             |  i -> named_struct(
             |    'chunk_idx', cast(i AS BIGINT),
             |    'start_tok', cast(i * $stride AS BIGINT),
             |    'n_chunk_tokens',
             |      cast(size(slice(_w, i * $stride + 1, $chunkSize)) AS BIGINT),
             |    'chunk_text',
             |      array_join(slice(_w, i * $stride + 1, $chunkSize), ' ')))""".stripMargin))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.start_tok").as("start_tok"),
        col("c.n_chunk_tokens").as("n_chunk_tokens"),
        col("c.chunk_text").as("chunk_text"))
  }

  /** Shard count for the a04 harness query (production: pick ≫ executor
    * count so every shard is one comfortable task). */
  val ShuffleShards = 8L
  private val ShufA = Hashing.MinHashA(1)
  private val ShufB = Hashing.MinHashB(1)
  private val HashP = Hashing.P

  /** a04 — deterministic GLOBAL SHUFFLE into balanced training shards:
    * the export step between packing and the trainer, which must (a)
    * decorrelate example order from ingest order (hash permutation, not
    * rand() — task retries and re-runs reproduce the same epoch), and
    * (b) emit shards a loader can stream independently (`pos` dense
    * 0..n−1 within each shard).
    *
    * Scale shape: the coin is map-side; the only exchange hashes on
    * `shard`, and each shard sorts independently — shard volume =
    * corpus/nShards by the law of large numbers, so the sort is one
    * bounded task per shard and the whole export is embarrassingly
    * parallel across shards. No global sort, no single-frame window.
    * Output: `(id, shard, pos)`. */
  def shuffleShards(df: DataFrame, id: String, nShards: Long): DataFrame = {
    val h = expr(s"(((($id % ${HashP}L + ${HashP}L) % ${HashP}L) * ${ShufA}L" +
      s" + ${ShufB}L) % ${HashP}L)")
    df.select(col(id), h.as("_h"))
      .withColumn("shard", (col("_h") % nShards).cast("long"))
      .withColumn("pos", (row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_h"), col(id))) - 1)
        .cast("long"))
      .select(col(id), col("shard"), col("pos"))
  }

  /** Curriculum stage count (a05). */
  val CurriculumStages = 4L
  private val CurA = Hashing.MinHashA(2)
  private val CurB = Hashing.MinHashB(2)

  /** a05 — curriculum staging: assign every document to one of
    * `stages` difficulty tiers by EXACT word-count quartile, shortest
    * first (length-ordered curriculum — train on easy/short docs
    * before long ones), plus a deterministic within-stage shuffle key.
    * The trainer consumes shards ordered by `(stage, sort_key)`.
    *
    * Scale shape — the q25 two-pass idea applied to staging: a global
    * `ntile(4)` window would be one all-corpus sort on a single
    * reducer, so instead pass 1 aggregates the corpus to a WORD-COUNT
    * HISTOGRAM (bounded: distinct document lengths, thousands of rows
    * at any corpus size) and computes each length's quartile from the
    * histogram's running sum — the only unpartitioned window runs on
    * histogram-cardinality rows. Pass 2 maps stages back over the
    * corpus through a broadcast join. No corpus-sized sort or window
    * anywhere; ties (equal n_words) land in one stage by construction,
    * which keeps the assignment value-determined and engine-portable.
    *
    * `stage = ceil(stages·cum/N) = (stages·cum + N − 1) div N` on
    * longs — exact on both engines. The shuffle key reuses the a04
    * affine-permutation idiom (member 2 of the hash family, so stage
    * order and shard order stay uncorrelated). Output: `(id, n_words,
    * stage, sort_key)`. */
  def curriculumStages(docs: DataFrame, id: String, text: String,
                       stages: Long = CurriculumStages): DataFrame = {
    val words = docs.select(col(id),
      expr(s"cast(size(filter(split($text, ' '), x -> x <> '')) as bigint)")
        .as("n_words"))
    val byW = Window.orderBy(col("n_words"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val staged = words.groupBy(col("n_words")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byW))
      .withColumn("tot", sum(col("cnt")).over(all))
      .withColumn("stage", expr(s"(${stages}L * cum + tot - 1) div tot"))
      .select(col("n_words"), col("stage"))
    val h = expr(s"(((($id % ${HashP}L + ${HashP}L) % ${HashP}L) * ${CurA}L" +
      s" + ${CurB}L) % ${HashP}L)")
    words.join(broadcast(staged), Seq("n_words"))
      .select(col(id), col("n_words"), col("stage"), h.as("sort_key"))
  }

  /** a06 defaults: batch size within a (bucket, shard) stream, and the
    * shard fan-out that keeps window partitions splittable. */
  val BucketBatch = 32L
  val BucketShards = 8L

  /** LENGTH-BUCKETED BATCHING (a06) — sequence bucketing: group
    * same-magnitude documents into fixed-size batches so train-time
    * padding waste is bounded by the bucket's width (the
    * bucketed-batching trick every seq2seq/pretraining loader ships;
    * contrast a01, which packs heterogeneous docs head-to-tail and
    * relies on attention masks instead of padding).
    *
    * Bucket = number of binary digits of the weight (power-of-2 width
    * classes) via `length(bin(w))` — an exact integer both engines
    * compute identically, no float log2. Within a bucket, documents
    * are dealt deterministically across [[BucketShards]] shards
    * (`doc_id mod shards`) and batch ids are assigned per (bucket,
    * shard) in id order — the window partitions by (bucket, shard), so
    * no partition exceeds ~corpus/(buckets·shards) rows and widening
    * the shard count splits the sort further (the a01 two-pass scan is
    * the fallback if even that is too coarse; same trade as q24/q25).
    * Output: `(doc_id, w, bucket, shard, batch_id)`. */
  def lengthBucketBatches(docs: DataFrame, id: String, weight: String,
                          batchSize: Long = BucketBatch,
                          nShards: Long = BucketShards): DataFrame = {
    require(batchSize > 0 && nShards > 0, "batchSize and nShards must be positive")
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("doc_id"))
    docs
      .select(col(id).cast("long").as("doc_id"),
        coalesce(col(weight).cast("long"), lit(0L)).as("w"))
      .withColumn("bucket",
        length(bin(greatest(col("w"), lit(1L)))).cast("long"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards)))
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("batch_id", expr(s"(_rn - 1L) div ${batchSize}L"))
      .select(col("doc_id"), col("w"), col("bucket"), col("shard"),
        col("batch_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a06_length_buckets" -> ((s, d) =>
      lengthBucketBatches(Tables.documents(s, d), "doc_id", "n_chars")),
    "a05_curriculum" -> ((s, d) =>
      curriculumStages(Tables.documents(s, d), "doc_id", "text")),
    "a04_shuffle_shards" -> ((s, d) =>
      shuffleShards(Tables.documents(s, d), "doc_id", ShuffleShards)),
    "a01_pack_chunks" -> ((s, d) =>
      packChunks(Tables.documents(s, d), "doc_id", "n_chars")),
    "a02_pack_by_source" -> ((s, d) =>
      packChunksBySource(Tables.documents(s, d), "doc_id", "n_chars", "source")),
    "a03_sliding_chunks" -> ((s, d) =>
      slidingChunks(Tables.documents(s, d), "doc_id", "text")))

  def oracle: Map[String, String] = Map(
    // a06 — identical integer bucket (binary digit count), shard mod,
    // and per-(bucket, shard) rank → floor-div batch
    "a06_length_buckets" ->
      s"""WITH b AS (
         |  SELECT doc_id, n_chars AS w,
         |    CAST(length(bin(greatest(n_chars, 1))) AS BIGINT) AS bucket,
         |    doc_id % $BucketShards AS shard
         |  FROM documents)
         |SELECT doc_id, w, bucket, shard,
         |  CAST((row_number() OVER (PARTITION BY bucket, shard ORDER BY doc_id) - 1)
         |    // $BucketBatch AS BIGINT) AS batch_id
         |FROM b""".stripMargin,
    // a05 — same histogram → running-sum quartile → integer-ceil stage,
    // same affine shuffle key
    "a05_curriculum" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_words
         |  FROM documents),
         |h AS (SELECT n_words, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY n_words),
         |st AS (
         |  SELECT n_words,
         |    ($CurriculumStages * sum(cnt) OVER (ORDER BY n_words
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      + sum(cnt) OVER () - 1) // sum(cnt) OVER () AS stage
         |  FROM h)
         |SELECT w.doc_id, w.n_words, CAST(st.stage AS BIGINT) AS stage,
         |  CAST((((w.doc_id % $HashP + $HashP) % $HashP) * $CurA + $CurB) % $HashP AS BIGINT) AS sort_key
         |FROM w JOIN st USING (n_words)""".stripMargin,
    // a04 — the identical affine permutation and windowed dense rank
    "a04_shuffle_shards" ->
      s"""SELECT doc_id, CAST(h % $ShuffleShards AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % $ShuffleShards
         |    ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
         |FROM (SELECT doc_id,
         |  ((((doc_id % $HashP + $HashP) % $HashP) * $ShufA + $ShufB) % $HashP) AS h
         |  FROM documents) t""".stripMargin,
    "a01_pack_chunks" ->
      s"""SELECT doc_id,
         |  CAST(excl // $DefaultCapacity AS BIGINT) AS chunk_id,
         |  CAST(excl % $DefaultCapacity AS BIGINT) AS chunk_off
         |FROM (
         |  SELECT doc_id,
         |    coalesce(sum(n_chars) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
         |  FROM documents) t""".stripMargin,
    "a02_pack_by_source" ->
      s"""SELECT source, doc_id,
         |  CAST(excl // $DefaultCapacity AS BIGINT) AS chunk_id,
         |  CAST(excl % $DefaultCapacity AS BIGINT) AS chunk_off
         |FROM (
         |  SELECT source, doc_id,
         |    coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
         |  FROM documents) t""".stripMargin,
    // a03 — same start rule: 0, stride, …, first start whose chunk
    // reaches the end; DuckDB list_slice is 1-based inclusive-end
    "a03_sliding_chunks" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |nz AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
        |ch AS (
        |  SELECT doc_id, ws,
        |    unnest(range(0, 1 + CASE WHEN n <= 24 THEN 0
        |                             ELSE (n - 24 + 16 - 1) // 16 END)) AS i
        |  FROM nz)
        |SELECT doc_id,
        |  CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(i * 16 AS BIGINT) AS start_tok,
        |  CAST(len(list_slice(ws, i * 16 + 1, i * 16 + 24)) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(list_slice(ws, i * 16 + 1, i * 16 + 24), ' ') AS chunk_text
        |FROM ch""".stripMargin)
}
