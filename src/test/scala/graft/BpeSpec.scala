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

  test("batched ≡ sequential where batch merges don't interact") {
    // four disjoint 2-char words with separated counts: no symbol overlap,
    // no created pairs — one batched round of 4 must equal 4 sequential
    // rounds, rule for rule
    val text = (Seq.fill(5)("ab") ++ Seq.fill(4)("cd") ++
      Seq.fill(3)("ef") ++ Seq.fill(2)("gh")).mkString(" ")
    val scope = new CacheScope
    try {
      val seq = Bpe.trainMerges(corpus(text), nMerges = 4, scope)
      val bat = Bpe.trainMergesBatched(corpus(text), nMerges = 4,
        batchSize = 4, scope)
      assert(bat === seq)
    } finally scope.release()
  }

  test("batched defers overlapping candidates to the next round's fresh counts") {
    // round 1's runner-up (a,b) overlaps the winner (a,a), so it must WAIT
    // even with batchSize=8 — a batch never ranks a pair whose counts an
    // earlier accepted merge could have changed; the final table still
    // equals the sequential one rule for rule
    val scope = new CacheScope
    try {
      val seq = Bpe.trainMerges(corpus("aaaa aaaa ab"), nMerges = 3, scope)
      val bat = Bpe.trainMergesBatched(corpus("aaaa aaaa ab"), nMerges = 3,
        batchSize = 8, scope)
      assert(bat === seq)
    } finally scope.release()
  }

  test("batched at batchSize=1 is exactly the sequential trainer on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val scope = new CacheScope
    try {
      val seq = Bpe.trainMergesCached(sfDir, docs)
      val bat = Bpe.trainMergesBatched(docs, nMerges = 8, batchSize = 1, scope)
      assert(bat === seq)
    } finally scope.release()
  }

  test("buildVocab in small chunks equals the segment-expression fold") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.trainMergesCached(sfDir, docs)
    val viaVocab = Bpe.buildVocab(docs, merges, chunk = 3)
      .select("word", "syms").as[(String, String)].collect().toMap
    val viaFold = Bpe.wordFreqs(docs)
      .select(col("word"), Bpe.segment(col("word"), merges).as("syms"))
      .as[(String, String)].collect().toMap
    assert(viaVocab === viaFold)
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
