package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("merge order follows weighted pair counts with lexicographic ties") {
    // aa:2 ab:1 → pair (a,a) cnt 2 beats (a,b) cnt 1; round 2 merges (a,b)
    val scope = new CacheScope
    try {
      val m = Bpe.trainMerges(corpus("aa ab aa"), nMerges = 2, scope)
      assert(m.map(x => (x.rank, x.left, x.right, x.cnt)) ===
        Seq((1, "a", "a", 2L), (2, "a", "b", 1L)))
    } finally scope.release()
  }

  test("pair counting overlaps, merge application does not") {
    // "aaaa": 3 adjacent (a,a) pairs counted, but one greedy left-to-right
    // pass merges exactly twice → ~aa~~aa~, then (aa,aa) next round
    val scope = new CacheScope
    try {
      val m = Bpe.trainMerges(corpus("aaaa"), nMerges = 2, scope)
      assert(m.map(x => (x.left, x.right, x.cnt)) ===
        Seq(("a", "a", 3L), ("aa", "aa", 1L)))
      val seg = corpus("aaaa")
        .select(Bpe.segment(lit("aaaa"), m.take(1)).as("s")).as[String].head()
      assert(seg === "~aa~~aa~")
    } finally scope.release()
  }

  test("segmentation partitions the word (round-trip) on the corpus vocab") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.trainMergesCached(sfDir, docs)
    val vocab = Bpe.wordFreqs(docs)
      .withColumn("syms", Bpe.segment(col("word"), merges))
    val broken = vocab.filter(
      replace(col("syms"), lit(Bpe.Sep), lit("")) =!= col("word") ||
        Bpe.symCount(col("syms")) < 1 ||
        Bpe.symCount(col("syms")) > length(col("word")))
    assert(broken.count() === 0)
    // training bites: at least one vocab word is segmented coarser than chars
    assert(vocab.filter(Bpe.symCount(col("syms")) < length(col("word")))
      .count() > 0)
  }

  test("merge table round-trips through parquet in application order") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.trainMergesCached(sfDir, docs)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe").toString + "/merges"
    Bpe.saveMerges(spark, merges, path)
    val back = Bpe.loadMerges(spark, path)
    assert(back === merges)
    // a loaded table segments identically to the freshly trained one
    val a = docs.select(Bpe.segment(col("text"), merges).as("s"))
      .as[String].collect().toSeq
    val b = docs.select(Bpe.segment(col("text"), back).as("s"))
      .as[String].collect().toSeq
    assert(a === b)
  }

  test("training is deterministic across fresh runs") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = new CacheScope
    val s2 = new CacheScope
    try {
      val a = Bpe.trainMerges(docs, nMerges = 4, s1)
      val b = Bpe.trainMerges(docs, nMerges = 4, s2)
      assert(a === b)
    } finally { s1.release(); s2.release() }
  }
}
