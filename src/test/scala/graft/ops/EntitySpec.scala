package graft.ops

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-dictionary contract for the entity-resolution family:
  * pair verification, transitive canonicalization (a~b, b~c chains
  * land in ONE cluster even when lev(a,c) exceeds the threshold),
  * identity for singletons, and the non-discriminating-block guard. */
class EntitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  // "acme corp" ~ "acmee corp" (lev 1) ~ "acmee corpse" (lev 2 from
  // acmee corp, 3 from acme corp — transitivity matters); "zenith corp"
  // shares the block but matches nothing; "solo ltd" is a singleton.
  private def dict = {
    import spark.implicits._
    Seq("acme corp", "acmee corp", "acmee corpse", "zenith corp",
      "solo ltd")
      .toDF("name")
  }

  test("er01: verified pairs are exactly the lev<=2 in-block pairs") {
    val got = Entity.fuzzyPairs(dict, "name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // "acmee corpse" blocks on "corpse", not "corp" — head-noun
    // blocking misses it, so only the corp-block pair survives. That
    // miss is the documented blocking trade-off, covered below by the
    // multi-key note; the pair set must still be exactly right.
    assert(got == Set(("acme corp", "acmee corp", 1L)))
  }

  test("er02: chained variants canonicalize transitively; singletons map to themselves") {
    import spark.implicits._
    // chain within one block: "aaaa x" ~ "aaab x" (1) ~ "aabb x" (2,
    // but lev(aaaa x, aabb x) = 2 <= 2 here — craft a real >threshold
    // chain instead: step edits far apart)
    val chain = Seq("aaaaaa x", "aaaabb x", "aabbbb x", "bbbbbb x",
      "zz y").toDF("name")
    val m = Entity.canonicalMap(chain, "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // consecutive lev = 2, ends lev = 6 > MaxEdit: one component via CC
    assert(m("aaaaaa x") == "aaaaaa x")
    assert(m("aaaabb x") == "aaaaaa x")
    assert(m("aabbbb x") == "aaaaaa x")
    assert(m("bbbbbb x") == "aaaaaa x")
    assert(m("zz y") == "zz y")
  }

  test("er02 on the crafted dictionary keeps unmatched names identity") {
    val m = Entity.canonicalMap(dict, "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(m == Map(
      "acme corp" -> "acme corp", "acmee corp" -> "acme corp",
      "acmee corpse" -> "acmee corpse", "zenith corp" -> "zenith corp",
      "solo ltd" -> "solo ltd"))
  }

  test("er03: facts roll up to canonical entities through the map") {
    import spark.implicits._
    val facts = Seq("acme corp", "acme corp", "acmee corp", "solo ltd")
      .toDF("vendor")
    val got = Entity.entityRollup(facts, "vendor")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(("acme corp", 3L, 2L), ("solo ltd", 1L, 1L)))
  }

  test("er05: survivorship elects the modal value per field, ties to the minimum") {
    import spark.implicits._
    // "acme corp"/"acmee corp" cluster: brand B1 wins 2-1 (majority),
    // ptype t2 wins 2-1, sizes are a 3-way tie → the minimum survives
    val facts = Seq(
      ("acme corp", "B1", "t1", 40),
      ("acme corp", "B1", "t2", 50),
      ("acmee corp", "B2", "t2", 60),
      ("solo ltd", "B9", "t9", 9)
    ).toDF("vendor", "brand", "ptype", "size")
    val got = Entity.survivorship(facts, "vendor", Seq("brand", "ptype", "size"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getInt(4))).toSet
    assert(got == Set(
      ("acme corp", 3L, "B1", "t2", 40),
      ("solo ltd", 1L, "B9", "t9", 9)))
  }

  test("oversized blocks are dropped deterministically") {
    import spark.implicits._
    // 4 names share block "x" — with maxBlock = 3 the whole block is
    // non-discriminating and contributes no pairs; block "y" survives
    val df = Seq("aa x", "ab x", "ba x", "bb x", "cc y", "cd y")
      .toDF("name")
    val pairs = Entity.fuzzyPairs(df, "name", maxEdit = 2, maxBlock = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("cc y", "cd y")))
  }
}
