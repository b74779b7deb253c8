package graft.streaming

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming exact-dedup ≡ batch dropDuplicates on a deliberately
  * double-delivered input: the same events file landed twice in the
  * watched directory (the at-least-once failure mode the operator
  * exists for) must yield each event exactly once. */
class DedupStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("double-delivered stream dedups to the batch distinct set") {
    val dir = Files.createTempDirectory("dedup_stream_").toString
    val src = Paths.get(s"$sf/events.parquet")
    Files.copy(src, Paths.get(s"$dir/events_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, Paths.get(s"$dir/events_b.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val streamed = DedupStream.runAvailableNow(spark, dir, "dedup_spec_sink")
      .select("event_id")
      .collect().map(_.getLong(0))

    val expected = spark.read
      .schema(EventStream.rawSchema)
      .parquet(s"$sf/events.parquet")
      .select("event_id")
      .collect().map(_.getLong(0)).toSet

    assert(streamed.length == streamed.distinct.length,
      "stream must emit each event id at most once")
    assert(streamed.toSet == expected,
      "stream must emit exactly the batch-distinct id set")
  }
}
