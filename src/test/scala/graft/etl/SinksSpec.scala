package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.time.LocalDateTime

/** S7/S8/X13 sink parity (`text_processing.py:60,157-174`). */
class SinksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  test("timestamped name matches the reference strftime format") {
    val now = LocalDateTime.of(2026, 8, 12, 6, 30)
    assert(Sinks.timestampedName("df_preprocessed_", ".csv", now) ==
      "df_preprocessed_260812_0630.csv")
  }

  test("csv sink round-trips with header; singleFile yields one part") {
    import spark.implicits._
    val df = Seq(("R1", "report a"), ("R2", "report b")).toDF("record_id", "report")
    val dir = Files.createTempDirectory("graft_csv").toString + "/out"
    Sinks.writeCsv(df, dir, singleFile = true)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1, "singleFile must produce exactly one csv part")
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("R1", "report a"), ("R2", "report b")))
  }

  test("runAndPersist writes both CSV intermediates and returns the report") {
    val dir = Files.createTempDirectory("graft_ep1").toString
    val out = Pipeline.runAndPersist(spark, Pipeline.SampleRequest, dir)
    assert(out.count() == 1)
    val written = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(written.exists(_.startsWith("df_preprocessed_")), written.mkString(","))
    assert(written.exists(_.startsWith("df_result_")), written.mkString(","))
    val cleanedBack = spark.read.option("header", "true")
      .csv(s"$dir/${written.find(_.startsWith("df_preprocessed_")).get}")
    assert(cleanedBack.count() == 2) // two findings in the sample request
  }

  test("sharded JSONL report sink bounds shard size and round-trips") {
    import spark.implicits._
    val df = (1 to 10)
      .map(i => (s"R$i", s"report line\nwith 縮排 $i", s"""{"RECORD_ID": "R$i"}"""))
      .toDF("record_id", "report", "request")
      .repartition(1) // single task → file rolling is purely maxRecordsPerFile
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/reports"
    Sinks.writeReportJsonl(df, dir, maxRecordsPerFile = 3L)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
    assert(parts.length >= 4, s"10 rows at 3/file must roll ≥4 shards, got ${parts.length}")
    val back = Sinks.readReportJsonl(spark, dir)
    assert(back.schema === Sinks.reportSchema)
    // Sorted-sequence compare, not Set: a file-rolling sink's failure
    // mode is duplicating or dropping rows with identical content.
    assert(back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq ==
      df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq)
    assert(back.count() == df.count())
  }

  test("runDistributed output round-trips through the JSONL sink") {
    import spark.implicits._
    val out = Pipeline.runDistributed(
      Ingest.parseBodies(spark.createDataset(Seq(Pipeline.SampleRequest))))
    val dir = Files.createTempDirectory("graft_jsonl_ep1").toString + "/reports"
    Sinks.writeReportJsonl(out, dir)
    val back = Sinks.readReportJsonl(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    val direct = out.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(back == direct && back.nonEmpty)
  }

  test("json response matches the reference's [{\"report\": ...}] shape") {
    import spark.implicits._
    val df = Seq(("R1", "line1\nline2")).toDF("record_id", "report")
    assert(Sinks.jsonResponse(df) == """[{"report":"line1\nline2"}]""")
  }
}
