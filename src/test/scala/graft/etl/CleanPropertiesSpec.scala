package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests (SURVEY.md §5.3): normalization idempotence, dedup
  * soundness, partition-count invariance — the proofs that the
  * pandas→Spark order-sensitivity translation holds for arbitrary data,
  * not just the golden fixtures. */
class CleanPropertiesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private def checkProp(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  /** Strings biased toward the interesting cases: full-width chars,
    * newlines, parens with whitespace, CJK. */
  private val messyString: Gen[String] = {
    val atoms = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf(Clean.FULLWIDTH_SRC.toSeq).map(_.toString),
      Gen.oneOf("\n", "\r", " ( ", " ) ", "（ｘ）", "範例", "　", "。", ""))
    Gen.listOf(atoms).map(_.mkString)
  }

  test("cleanComment is idempotent on arbitrary messy strings") {
    import spark.implicits._
    // property evaluated through the actual Spark expression chain
    val gen = Gen.listOfN(40, messyString)
    checkProp(Prop.forAll(gen) { ss =>
      val df = ss.toDF("COMMENT")
      val once = Clean.cleanComment(df).collect().map(_.getString(0)).toSeq
      val twice = Clean.cleanComment(Clean.cleanComment(df))
        .collect().map(_.getString(0)).toSeq
      once == twice
    })
  }

  test("cleanComment strips newlines and translates all 22 full-width chars") {
    import spark.implicits._
    val df = Seq("a\r\nb" + Clean.FULLWIDTH_SRC).toDF("COMMENT")
    val out = Clean.cleanComment(df).collect().head.getString(0)
    assert(!out.exists(c => c == '\r' || c == '\n'))
    assert(!out.exists(Clean.FULLWIDTH_SRC.contains(_)))
  }

  /** Synthetic enriched-ish frame: SUBSET columns + _rid, with a SMALL key
    * alphabet so duplicate dedup keys are guaranteed. */
  private def syntheticEnriched(n: Int, seed: Long) = {
    import org.apache.spark.sql.types._
    val rnd = new Random(seed)
    def pick(vs: String*) = vs(rnd.nextInt(vs.length))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      new java.util.ArrayList[org.apache.spark.sql.Row](n)
    (0 until n).foreach { i =>
      val vals: Seq[Any] = Schemas.SUBSET.map {
        case "RECORD_ID" => pick("R1", "R2")
        case "ORG_ID" => pick("O1", "O2")
        case "LANG_NO" => pick("1", "2", "3", "4")
        case "DIAG_CODE" => pick("D1", "D2", "D3")
        case "GROUPNO" => if (rnd.nextBoolean()) null else Integer.valueOf(rnd.nextInt(3))
        case "ITEM_CODE" => pick("I1", "I2", "I3")
        case c if c.endsWith("_GROUP") => pick("G甲", "GB", "")
        case c if c.endsWith("_ITEM") => pick("項A", "項B", "ItA")
        case "COMMENT" => pick("c one", "c（ x ）two", "")
        case c if c.endsWith("_COMMENT") => pick("ce", "cj", "")
        case c if c.endsWith("_SUMMARY") => pick("S甲", "SA", "")
        case _ => ""
      } :+ java.lang.Long.valueOf(i.toLong)
      rows.add(org.apache.spark.sql.Row(vals: _*))
    }
    val schema = StructType(Schemas.SUBSET.map { c =>
      if (c == "GROUPNO") StructField(c, IntegerType) else StructField(c, StringType)
    } :+ StructField("_ord", LongType))
    spark.createDataFrame(rows, schema)
      .withColumn("_rid", struct(col("_ord"), lit(0).as("i"), lit(0).as("f")))
      .drop("_ord")
  }

  test("keepFirst: unique keys, subset of input, partition-invariant") {
    val df = syntheticEnriched(300, seed = 7)
    val out = Clean.keepFirst(df)
    val keyCols = Schemas.SUBSET_2_KEEP.map(col)

    val total = out.count()
    val distinctKeys = out.select(keyCols: _*).distinct().count()
    assert(total == distinctKeys, "dedup key must be unique after keepFirst")

    val inputKeys = df.na.fill("").select(keyCols: _*).distinct().count()
    assert(distinctKeys == inputKeys, "every input key must survive")

    val base = out.collect().map(_.toString).sorted.toSeq
    Seq(1, 13).foreach { n =>
      val rep = Clean.keepFirst(df.repartition(n)).collect().map(_.toString).sorted.toSeq
      assert(rep == base, s"keepFirst changed under repartition($n)")
    }
  }

  test("renumberGroupNo: no zero/null groups remain; positives unchanged") {
    val df = syntheticEnriched(200, seed = 11)
    val out = Clean.renumberGroupNo(df)
    assert(out.filter(col("GROUPNO").isNull || col("GROUPNO") === 0).count() == 0)
    val maxIn = df.agg(max(col("GROUPNO"))).collect().head.getInt(0)
    // positive groups keep their number; 0/null became maxIn + 1
    assert(out.filter(col("GROUPNO") > maxIn + 1).count() == 0)
  }

  test("full clean is partition-count invariant end to end") {
    val df = syntheticEnriched(150, seed = 23)
    val base = Clean.clean(df).drop("_rid").collect().map(_.toString).toSeq
    Seq(2, 9).foreach { n =>
      val rep = Clean.clean(df.repartition(n)).drop("_rid").collect().map(_.toString).toSeq
      assert(rep == base, s"clean changed under repartition($n)")
    }
  }
}
