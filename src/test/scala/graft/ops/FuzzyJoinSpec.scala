package graft.ops

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("finds pairs within distance that share a token, ordered canonically") {
    val df = Seq("cold bolt", "old bolt", "red widget", "red midget",
      "blue gear").toDF("nm")
    val got = FuzzyJoin.selfMatch(df, "nm", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("cold bolt", "old bolt", 1),
      ("red midget", "red widget", 1)))
  }

  test("a pair with no shared token escapes the blocker even if close") {
    // "abc xyz" vs "abd xyw": distance 2 but no identical token
    val df = Seq("abc xyz", "abd xyw").toDF("nm")
    assert(FuzzyJoin.selfMatch(df, "nm", maxDist = 2).count() == 0)
  }

  test("duplicate input names collapse before pairing") {
    val df = Seq("same name", "same name", "same namr").toDF("nm")
    val got = FuzzyJoin.selfMatch(df, "nm", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("same name", "same namr", 1)))
  }
}
