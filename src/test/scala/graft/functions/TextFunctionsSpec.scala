package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column) =
    Seq(1).toDF("x").select(c.as("v")).head()

  test("token counts: whitespace and bpe-ish") {
    val r = Seq("the cat sat, on 2 mats!").toDF("text").select(
      TextFunctions.tokenCountWs($"text").as("ws"),
      TextFunctions.tokenCountBpe($"text").as("bpe")).head()
    assert(r.getLong(0) == 6)
    // [the][cat][sat][,][on][2][mats][!] = 8
    assert(r.getLong(1) == 8)
  }

  test("wordShingles: distinct trigrams, short text → empty") {
    val r = Seq("a b c d").toDF("text").select(
      TextFunctions.wordShingles($"text", 3).as("sh")).head().getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text").select(
      TextFunctions.wordShingles($"text", 3).as("sh")).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("wordBigrams keeps multiplicity; short text → empty") {
    val r = Seq("a b a b").toDF("text").select(
      TextFunctions.wordBigrams($"text").as("bg")).head().getSeq[String](0)
    assert(r == Seq("a b", "b a", "a b"))
    val short = Seq("solo").toDF("text").select(
      TextFunctions.wordBigrams($"text").as("bg")).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("langId picks the marker-dominant language, ties to list order") {
    val r = Seq(
      "the cat is of the house",  // en
      "der hund und die katze ist", // de
      "le chat et les chiens est")  // fr
      .toDF("text").select(TextFunctions.langId($"text").as("l"))
      .as[String].collect().toSeq
    assert(r == Seq("en", "de", "fr"))
  }

  test("quality score bounded and monotone-ish in stopword presence") {
    val q = Seq(
      "the a of to in is stopword rich text here",
      "xqz kjw ppt zzz")
      .toDF("text").select(TextFunctions.qualityScore($"text").as("q"))
      .as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("normalizeText lowercases, collapses whitespace, trims") {
    val r = Seq("  Hello\t\tWORLD  \n again ").toDF("text")
      .select(TextFunctions.normalizeText($"text")).head().getString(0)
    assert(r == "hello world again")
  }

  test("redactPii replaces emails and urls") {
    val r = Seq("mail a.b+c@ex-ample.org or see https://x.io/p?q=1 now").toDF("text")
      .select(TextFunctions.redactPii($"text")).head().getString(0)
    assert(r == "mail <EMAIL> or see <URL> now")
  }

  test("md5Long is deterministic and non-negative") {
    val r = one(TextFunctions.md5Long(lit("hello"))).getLong(0)
    val r2 = one(TextFunctions.md5Long(lit("hello"))).getLong(0)
    assert(r == r2 && r >= 0)
  }
}
