package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("split is exhaustive, disjoint, and key-stable") {
    val s = Curation.trainValTest(docs, col("doc_id"))
    assert(s.count() === docs.count())
    assert(s.filter(!col("split").isin("train", "val", "test")).count() === 0)
    // stability: same key ⇒ same split on re-computation
    val a = s.select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Curation.trainValTest(docs, col("doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
    // rough proportions (md5 is uniform; 500 docs → generous bounds)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("selectUnderBudget equals the naive single-window formulation") {
    // deterministic but scrambled ranks/costs; several duplicate ranks so
    // the (rank desc, key asc) tie-break is exercised across bucket math
    val rows = (1L to 200L).map(i => (i, (i * 37 % 50).toDouble, i % 13 + 1))
    val df = rows.toDF("k", "r", "c")
    def naive(budget: Long): Set[Long] = {
      val sorted = rows.sortBy { case (k, r, _) => (-r, k) }
      val sel = scala.collection.mutable.Set.empty[Long]
      var run = 0L
      sorted.foreach { case (k, _, c) => run += c; if (run <= budget) sel += k }
      sel.toSet
    }
    for (budget <- Seq(0L, 5L, 100L, 700L, 100000L)) {
      val got = Curation.selectUnderBudget(df, col("r"), col("k"), col("c"), budget)
        .select("k").as[Long].collect().toSet
      assert(got === naive(budget), s"budget=$budget")
    }
  }

  test("selectUnderBudget edge cases: empty input, zero-cost rows at cutoff") {
    val empty = Seq.empty[(Long, Double, Long)].toDF("k", "r", "c")
    assert(Curation.selectUnderBudget(empty, col("r"), col("k"), col("c"), 10L)
      .count() === 0)
    // zero-cost rows never exceed the budget, even when the running total
    // sits exactly at it
    val z = Seq((1L, 9.0, 10L), (2L, 8.0, 0L), (3L, 7.0, 0L), (4L, 6.0, 1L))
      .toDF("k", "r", "c")
    val got = Curation.selectUnderBudget(z, col("r"), col("k"), col("c"), 10L)
      .select("k").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L))
  }

  test("packSequences invariants: total assignment, in-shard bin contiguity") {
    val chunks = Curation.chunk(docs, 64, 8)
    val packed = Curation.packSequences(chunks, 256, 8)
    // every chunk gets exactly one (shard, bin); no rows lost or duplicated
    assert(packed.count() === chunks.count())
    // bins are contiguous prefixes within a shard: bin ids per shard form
    // 0..maxBin with no gaps
    val gaps = packed.groupBy("shard")
      .agg(countDistinct("bin").as("n_bins"), max("bin").as("max_bin"))
      .filter(col("n_bins") =!= col("max_bin") + 1)
    assert(gaps.count() === 0)
    // a bin never holds more than binTokens of STARTED tokens, i.e. every
    // row's in-bin offset is < binTokens
    assert(packed.filter(col("bin_tokens_before") >= 256).count() === 0)
  }

  test("hash sample is a subset and matches the split buckets") {
    val sample = Curation.hashSample(docs, col("doc_id"), 10)
      .select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(sample.subsetOf(all))
    assert(sample.size < all.size / 5) // ≈10%, generous upper bound
  }

  test("redactPii replaces emails, cards, and phones, leaves clean text") {
    val out = Seq(
      "mail me at a.b+c@example.co.uk today",
      "card 4111 1111 1111 1111 ok",
      "call +1 555-0199 now",
      "clean text with no pii at all")
      .toDF("text")
      .select(Curation.redactPii($"text").as("r")).as[String].collect()
    assert(out(0) === "mail me at <EMAIL> today")
    assert(out(1) === "card <CARD> ok")
    assert(out(2) === "call <PHONE> now")
    assert(out(3) === "clean text with no pii at all")
  }

  test("chunking covers every token with the declared stride and overlap") {
    val df = Seq((1L, (1 to 150).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Curation.chunk(df, 64, 8)
      .orderBy("chunk_no")
      .select("chunk_no", "n_chunk_tokens", "chunk_text")
      .as[(Int, Int, String)].collect()
    // 150 tokens, stride 56: chunks at 0, 56, 112 → sizes 64, 64, 38
    assert(chunks.map(_._1).toSeq === Seq(0, 1, 2))
    assert(chunks.map(_._2).toSeq === Seq(64, 64, 38))
    assert(chunks(0)._3.startsWith("t1 ") && chunks(1)._3.startsWith("t57 ") &&
      chunks(2)._3.startsWith("t113 "))
    // overlap: last 8 tokens of chunk 0 are the first 8 of chunk 1
    val c0 = chunks(0)._3.split(" ").takeRight(8).toSeq
    val c1 = chunks(1)._3.split(" ").take(8).toSeq
    assert(c0 === c1)
  }

  test("short docs yield exactly one chunk equal to the document") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Curation.chunk(df, 64, 8).select("chunk_no", "chunk_text")
      .as[(Int, String)].collect()
    assert(out.toSeq === Seq((0, "a b c")))
  }

  test("mixtureSample fills each source to its budget, drops the rest") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val budgets = Map("src0" -> 800L, "src1" -> 1000L, "src2" -> 600L,
      "src3" -> 100000L)
    val out = Curation.mixtureSample(docs, "source", col("doc_id"),
      col("n_tokens"), budgets)
    val bySource = out.groupBy("source")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // budgets respected, recipe-absent sources dropped
    assert(bySource.keySet === budgets.keySet)
    budgets.foreach { case (s, b) => assert(bySource(s)._1 <= b, s"$s over budget") }
    // an oversized budget passes the whole source through
    val src3All = docs.filter(col("source") === "src3")
      .agg(sum("n_tokens"), count(lit(1))).as[(Long, Long)].head()
    assert(bySource("src3") === src3All)
    // tight budgets actually truncate
    assert(bySource("src2")._2 <
      docs.filter(col("source") === "src2").count())
    // adding budget only GROWS a source's selection (prefix property of
    // the hash order: a bigger cut keeps every previously kept doc)
    val grown = Curation.mixtureSample(docs, "source", col("doc_id"),
      col("n_tokens"), Map("src2" -> 1200L))
      .select("doc_id").as[Long].collect().toSet
    val small = out.filter(col("source") === "src2")
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(grown))
  }

  test("weightedSample: weight 1 keeps all, weight 0 keeps none, rate tracks weight") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    assert(Curation.weightedSample(docs, col("doc_id"), lit(1.0)).count() === n)
    assert(Curation.weightedSample(docs, col("doc_id"), lit(0.0)).count() === 0L)
    val half = Curation.weightedSample(docs, col("doc_id"), lit(0.5)).count()
    assert(half > n / 5 && half < n * 4 / 5,
      s"0.5-weight sample kept $half of $n")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cur = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Curation.snapshotDiff(prev, cur, "doc_id", md5(col("text")))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("topFractionPerGroup keeps ceil(frac·n) best rows per group") {
    val d = Seq(
      ("g1", 1L, 0.9), ("g1", 2L, 0.5), ("g1", 3L, 0.7), ("g1", 4L, 0.1),
      ("g2", 5L, 0.2), ("g2", 6L, 0.8), ("g2", 7L, 0.6), ("g2", 8L, 0.4),
      ("g2", 9L, 0.3)).toDF("source", "doc_id", "q")
    val got = Curation.topFractionPerGroup(d, "source", col("q"), "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    // g1: ceil(4·0.25)=1 → best is doc 1; g2: ceil(5·0.25)=2 → docs 6, 7
    assert(got === Set(1L, 6L, 7L))
  }

  test("dsirWeights: target ≡ corpus → every weight is exactly zero") {
    // p_target(b) == p_raw(b) for every bucket, so each bucket weight —
    // and hence every document sum — must be the exact integer 0
    val w = Curation.dsirWeights(docs, lit(true))
    assert(w.count() === docs.count())
    assert(w.filter(col("dsir_weight") =!= 0.0).count() === 0)
  }

  test("dsirWeights ranks target-like text above off-domain text") {
    val d = Seq(
      (1L, "alpha beta gamma alpha beta gamma", true),
      (2L, "alpha beta gamma beta alpha gamma", true),
      (10L, "alpha gamma beta alpha gamma beta", false), // target vocab
      (20L, "zeta eta theta zeta eta theta", false)      // off-domain
    ).toDF("doc_id", "text", "tgt")
    val w = Curation.dsirWeights(d, col("tgt"))
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    assert(w(10L) > w(20L),
      s"target-vocab doc ${w(10L)} should outrank off-domain ${w(20L)}")
  }

  test("dsirSample: k deterministic rows drawn from the corpus") {
    val s1 = Curation.dsirSample(docs, col("source") === "src1", k = 20)
      .as[(Long, Double)].collect()
    assert(s1.length === 20)
    val ids = docs.select("doc_id").as[Long].collect().toSet
    assert(s1.map(_._1).forall(ids.contains))
    val s2 = Curation.dsirSample(docs, col("source") === "src1", k = 20)
      .as[(Long, Double)].collect()
    assert(s1.toSeq === s2.toSeq)
  }

  test("leakageSafeSplit: no near-dup pair straddles splits; the naive split does") {
    val clones = Tables.documentsWithClones(spark, sfDir)
    val pairs = graft.operators.Dedup.minhashPairs(clones, 0.5)
    val safe = Curation.leakageSafeSplit(clones, pairs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val ps = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(ps.nonEmpty)
    assert(ps.forall { case (a, b) => safe(a) === safe(b) })
    // non-vacuity: the per-document split DOES separate some pair (clones
    // are re-keyed +150000, so their buckets are independent of the parent)
    val naive = Curation.trainValTest(clones, col("doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(ps.exists { case (a, b) => naive(a) !== naive(b) })
  }

  test("sampleKPerGroup: exact quota per group, deterministic, subset rows") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
    val k = 7
    val s1 = Curation.sampleKPerGroup(docs, col("doc_id"), "lang", k)
    val sizes = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val groupSizes = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    groupSizes.foreach { case (g, n) =>
      assert(sizes(g) === math.min(k.toLong, n), s"lang=$g")
    }
    // deterministic + sampled rows are real rows of their group
    val rows1 = s1.as[(Long, String)].collect().toSet
    val rows2 = Curation.sampleKPerGroup(docs, col("doc_id"), "lang", k)
      .as[(Long, String)].collect().toSet
    assert(rows1 === rows2)
    assert(rows1.subsetOf(docs.as[(Long, String)].collect().toSet))
  }

  test("temperedBudgets: sqrt flattening upsamples the small source") {
    // big holds 4x the tokens of small -> at alpha=0.5 its budget ratio
    // must be sqrt(4) = 2x, not 4x
    val docs = ((1 to 80).map(i => (i.toLong, "big", 100L)) ++
      (1 to 20).map(i => (i.toLong + 1000, "small", 100L)))
      .toDF("doc_id", "src", "n_tokens")
    val b = Curation.temperedBudgets(docs, "src", col("n_tokens"), 3000L)
    assert(b.keySet === Set("big", "small"))
    val ratio = b("big").toDouble / b("small")
    assert(math.abs(ratio - 2.0) < 0.01, s"ratio=$ratio budgets=$b")
    // floor split never exceeds the total
    assert(b.values.sum <= 3000L && b.values.sum > 2990L)
    // alpha = 1 degenerates to proportional
    val prop = Curation.temperedBudgets(docs, "src", col("n_tokens"), 3000L,
      alpha = 1.0)
    assert(math.abs(prop("big").toDouble / prop("small") - 4.0) < 0.01)
    // deterministic across invocations
    assert(b === Curation.temperedBudgets(docs, "src", col("n_tokens"), 3000L))
  }
}
