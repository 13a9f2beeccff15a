package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("bpeish tokens split letters, digits and symbols") {
    val out = one("hello,world 42x!")
      .select(TextAnalysis.bpeishTokens($"text")).as[Seq[String]].head()
    assert(out === Seq("hello", ",", "world", "42", "x", "!"))
  }

  test("langId picks the language with most marker hits, en on ties") {
    val es = one("el la de y que algo mas").select(TextAnalysis.langId($"text")).as[String].head()
    val fr = one("le et les choses de la vie").select(TextAnalysis.langId($"text")).as[String].head()
    val tie = one("nothing matches here").select(TextAnalysis.langId($"text")).as[String].head()
    assert(es === "es")
    assert(fr === "fr")
    assert(tie === "en") // all-zero scores → first in marker order
  }

  test("md5 fingerprint is case/whitespace-normalized") {
    val df = Seq("Hello   World", "hello world", "different").toDF("text")
      .select(TextAnalysis.fingerprintMd5($"text").as("fp"))
    val fps = df.as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("rolling fingerprint is order-sensitive, md5-of-set is not the same") {
    val df = Seq("a b c", "c b a").toDF("text")
      .select(TextAnalysis.fingerprintRolling($"text").as("fp"))
    val fps = df.as[Long].collect()
    assert(fps(0) !== fps(1))
    assert(fps.forall(f => f >= 0 && f < 2147483647L))
  }

  test("quality score stays in [0,1] on the corpus") {
    val q = TextAnalysis.qualityScore(Tables.documents(spark, sfDir))
    assert(q.filter($"quality" < 0 || $"quality" > 1).count() === 0)
  }

  test("stats: n_tokens and distinct ratio on a known doc") {
    val out = TextAnalysis.stats(
        Seq((1L, "a b b c")).toDF("doc_id", "text"))
      .select("n_tokens", "n_distinct_tokens", "distinct_ratio")
      .as[(Int, Int, Double)].head()
    assert(out === ((4, 3, 0.75)))
  }
}
