package graft.ops

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Library-surface robustness of the deterministic sampling family:
  * the affine coin must behave for ARBITRARY caller ids — negative,
  * zero, huge — not just the harness's small positive doc_ids, and
  * every operator must be invariant to physical layout. */
class SamplingPropertiesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private def idFrame(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("id").withColumn("grp", pmod(col("id"), lit(3L)).cast("string"))
  }

  private val idGen: Gen[List[Long]] = Gen.listOfN(200, Gen.oneOf(
    Gen.chooseNum(Long.MinValue + 1000, Long.MaxValue - 1000),
    Gen.chooseNum(-1000L, 1000L)))

  test("splitAssign: total, deterministic, repartition-invariant for arbitrary ids") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    Seq(1L, 2L, 3L).foreach { seed =>
      val ids = idGen(Gen.Parameters.default.withSize(100),
        org.scalacheck.rng.Seed(seed)).get.distinct
      val df = idFrame(ids)
      val base = Sampling.splitAssign(df, "id", splits)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(base.size == ids.size, "every id must be assigned exactly once")
      assert(base.values.toSet.subsetOf(Set("train", "val", "test")))
      val rep = Sampling.splitAssign(df.repartition(7), "id", splits)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(rep == base, s"seed $seed: assignment changed under repartition")
    }
  }

  test("sampleByRate / sampleByWeight: kept sets repartition-invariant, negative ids fair") {
    Seq(5L, 11L).foreach { seed =>
      val ids = idGen(Gen.Parameters.default.withSize(100),
        org.scalacheck.rng.Seed(seed)).get.distinct
      val df = idFrame(ids)
      val kept = Sampling.sampleByRate(df, "id", "grp", Map("0" -> 0.5), 0.3)
        .collect().map(_.getLong(0)).toSet
      val keptRep = Sampling
        .sampleByRate(df.repartition(5), "id", "grp", Map("0" -> 0.5), 0.3)
        .collect().map(_.getLong(0)).toSet
      assert(keptRep == kept)
      // a negative-id population must not be all-kept or all-dropped at
      // an interior rate (the unsigned-coin guarantee pmod provides)
      val negs = idFrame((1 to 400).map(i => -i * 7919L))
      val negKept = Sampling.sampleByWeight(negs, "id", "0.5").count()
      assert(negKept > 400 * 0.3 && negKept < 400 * 0.7,
        s"negative ids kept $negKept of 400 at weight 0.5 — coin is biased")
    }
  }

  test("sampleFixedPerStratum caps every stratum for arbitrary ids") {
    val ids = idGen(Gen.Parameters.default.withSize(100),
      org.scalacheck.rng.Seed(17L)).get.distinct
    val got = Sampling.sampleFixedPerStratum(idFrame(ids), "id", "grp", k = 5)
    val perGrp = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(perGrp.forall(_._2 <= 5), s"stratum over cap: ${perGrp.toSeq}")
    assert(got.count() == math.min(ids.size.toLong,
      got.select("grp").distinct().count() * 5) ||
      perGrp.forall(_._2 <= 5))
  }

  test("weightedReservoir: exact k, repartition-invariant, weight-monotone for arbitrary ids") {
    import spark.implicits._
    Seq(23L, 42L).foreach { seed =>
      val ids = idGen(Gen.Parameters.default.withSize(100),
        org.scalacheck.rng.Seed(seed)).get.distinct
      // weight grows with |id| so the monotonicity check has signal
      val df = ids.toDF("id")
        .withColumn("w", (abs(col("id")) % 1000L) + 1L)
      val kept = Sampling.weightedReservoir(df, "id", col("w"), k = 30)
        .collect().map(_.getLong(0)).toSet
      assert(kept.size == math.min(30, ids.size), "exactly k rows kept")
      val keptRep = Sampling
        .weightedReservoir(df.repartition(7), "id", col("w"), k = 30)
        .collect().map(_.getLong(0)).toSet
      assert(keptRep == kept, s"seed $seed: sample changed under repartition")
    }
    // statistical monotonicity: across a population where half the rows
    // carry 20x the weight, the heavy half must dominate the sample
    val pop = (1L to 2000L).toDF("id")
      .withColumn("w", when(col("id") % 2 === 0, 200L).otherwise(10L))
    val heavy = Sampling.weightedReservoir(pop, "id", col("w"), k = 100)
      .filter(col("id") % 2 === 0).count()
    assert(heavy > 60, s"heavy-weight rows won only $heavy of 100 slots")
  }
}
