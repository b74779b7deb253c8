package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: comma-separated query-name filter for fast
    // local iteration (the driver always calls with two args = run all).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = Conf.Env.cpus(default = 4)
    val spark = Conf.localSession(cpus)
    new java.io.File(outDir).mkdirs()
    // Loud orphan report (the r08 lesson): an entry without an oracle
    // or an allowlist row is half-landed — VerifyContractSpec fails the
    // build on it; this print catches a stale-classes dump too.
    val orphans = SparkEntry.orphanKeys()
    if (orphans.nonEmpty)
      System.err.println(s"[verify] UNORACLED catalog keys (add oracleSql " +
        s"or RowsOnlyAllowlist + golden spec): ${orphans.toSeq.sorted.mkString(", ")}")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, ALL control chars (<0x20) —
    // a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness
    // — and ALL non-ASCII (>0x7E) as \uXXXX, so the CJK literals in the
    // d20/t24 oracles survive any file-encoding mismatch between this
    // writer and the driver's reader (pure-ASCII JSON decodes the same
    // bytes under every encoding).
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
