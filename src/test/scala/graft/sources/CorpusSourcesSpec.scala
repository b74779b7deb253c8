package graft.sources

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Every corpus format must be a drop-in source: the same documents
  * written as JSONL / CSV / ORC read back row-identical to the parquet
  * original, and a downstream operator (exact dedup) produces identical
  * results from each. */
class CorpusSourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSet

  test("jsonl, csv, and orc round-trip the parquet corpus row-identically") {
    val docs = graft.ops.Tables.documents(spark, sf)
    val base = rows(docs)
    val dir = Files.createTempDirectory("corpus_src_").toString

    docs.write.json(s"$dir/jsonl")
    docs.write.option("header", "true").csv(s"$dir/csv")
    docs.write.orc(s"$dir/orc")

    assert(rows(CorpusSources.readJsonl(spark, s"$dir/jsonl")) == base)
    assert(rows(CorpusSources.readCsv(spark, s"$dir/csv")) == base)
    assert(rows(CorpusSources.readOrc(spark, s"$dir/orc")) == base)

    // and a real operator is source-agnostic over them
    val viaParquet = graft.ops.Dedup.exactDedup(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaJsonl = graft.ops.Dedup.exactDedup(
        CorpusSources.readJsonl(spark, s"$dir/jsonl"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaJsonl == viaParquet)
  }

  test("binaryFile ingest: bytes round-trip, glob prunes, decode seam composes") {
    val dir = Files.createTempDirectory("corpus_bin_").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/nested"))
    val blobs = Map(
      "a.jpg" -> Array[Byte](1, 2, 3, 4, 5),
      "nested/b.jpg" -> "media payload".getBytes("UTF-8"),
      "skip.txt" -> Array[Byte](9, 9))
    blobs.foreach { case (name, bytes) =>
      Files.write(java.nio.file.Paths.get(s"$dir/$name"), bytes) }

    val read = CorpusSources.readBinaryDir(spark, dir, glob = "*.jpg")
      .collect().map(r => (
        r.getString(0).split('/').last,
        r.getAs[Array[Byte]]("content")))
    // the txt file never enters the scan; bytes come back exact
    assert(read.map(_._1).toSet == Set("a.jpg", "b.jpg"))
    read.foreach { case (name, content) =>
      val want = blobs.collectFirst {
        case (k, v) if k.endsWith(name) => v }.get
      assert(java.util.Arrays.equals(content, want)) }

    // the content column feeds the multimodal codec seam unchanged:
    // decode over (id, binary) exactly as over the harness blobs
    import spark.implicits._
    val asBlobs = CorpusSources.readBinaryDir(spark, dir, glob = "*.jpg")
      .select(org.apache.spark.sql.functions
          .xxhash64(org.apache.spark.sql.functions.col("path")).as("doc_id"),
        org.apache.spark.sql.functions.col("content").as("media"))
    val meta = graft.ops.Multimodal.decode(asBlobs).collect()
    assert(meta.length == 2)
    meta.foreach(m => assert(m.n_bytes > 0 && m.width >= 16 && m.height >= 16))
  }

  test("sharded writer bounds records per file and partitions by column") {
    val docs = graft.ops.Tables.documents(spark, sf).coalesce(1)
    val dir = Files.createTempDirectory("corpus_shard_").toString
    CorpusSources.writeSharded(docs, s"$dir/out", "parquet",
      maxRecordsPerFile = 20, partitionBy = Seq("lang"))
    val files = Files.walk(java.nio.file.Paths.get(s"$dir/out")).iterator()
    val parquets = Iterator.continually(files)
      .takeWhile(_.hasNext).map(_.next().toString)
      .filter(_.endsWith(".parquet")).toVector
    // 50 docs, <= 20 rows/file, >= 2 langs => strictly more files than langs
    assert(parquets.size > 2, s"expected sharding, got ${parquets.size} files")
    assert(parquets.exists(_.contains("lang=")), "expected lang= partition dirs")
    val back = spark.read.schema(CorpusSources.documentsSchema).parquet(s"$dir/out")
    assert(back.count() == docs.count())
  }

  test("malformed jsonl lines degrade to null rows, not job failure") {
    val dir = Files.createTempDirectory("corpus_bad_").toString
    Files.write(java.nio.file.Paths.get(s"$dir/part.jsonl"),
      ("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""" + "\n" +
       """{not json at all""" + "\n" +
       """{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = CorpusSources.readJsonl(spark, dir).collect()
    assert(out.length == 3)
    assert(out.count(_.isNullAt(1)) == 1, "the broken line must surface as a null row")
    assert(out.filter(!_.isNullAt(0)).map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}
