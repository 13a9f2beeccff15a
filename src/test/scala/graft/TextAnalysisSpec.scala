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

  test("gopherRules: hand-checked flags on constructed line tables") {
    // doc 1: clean prose, 56 words >= 50, all alpha, stopwords present →
    // every rule passes. doc 2: 8 words (fails word count), no stopwords,
    // every line bulleted + ellipsis-ended, half symbols → fails 5 rules.
    val clean = (0 until 7).map(i =>
      (1L, i, Seq("the", "quick", "brown", "fox", "and", "a", "dog", "ran")))
    val junk = Seq(
      (2L, 0, Seq("-", "#", "xx", "...")),
      (2L, 1, Seq("-", "#", "yy", "...")))
    val out = TextAnalysis.gopherRules(
        (clean ++ junk).toDF("doc_id", "line_no", "ws"))
      .orderBy("doc_id")
      .select("doc_id", "n_words", "r_wordcount", "r_meanlen", "r_symbols",
        "r_bullets", "r_ellipsis", "r_alpha", "r_stopwords", "keep")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(out(0) === ((1L, 56L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L)))
    // doc 2: 8 words; mean len (1+1+2+3+1+1+2+3)/8 = 1.75 < 3 fails;
    // symbols 2/8 = 0.25 > 0.1 fails; bullets 2/2 = 1.0 > 0.9 fails;
    // ellipsis 2/2 > 0.3 fails; alpha 2/8 = 0.25 < 0.8 fails; stop 0 < 2
    assert(out(1) === ((2L, 8L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("gopherRules ratios sit on the 1e-4 grid with exact boundary behavior") {
    // 10 words, exactly 1 symbol → sym_ratio = 0.1 exactly → rule PASSES
    // (<= is inclusive); 3 of 10 lines... single-line docs: bullet_frac 0/1
    val rows = Seq(
      (1L, 0, Seq("#", "two", "three", "four", "five",
        "six", "seven", "eight", "nine", "ten")))
    val r = TextAnalysis.gopherRules(rows.toDF("doc_id", "line_no", "ws"))
      .select("sym_ratio", "r_symbols").as[(Double, Long)].head()
    assert(r === ((0.1, 1L)))
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

  test("boilerplate: planted repeated span is covered and stripped") {
    // "x y z" appears in docs 1-4 (df = 4 = minDocs); each doc's other
    // tokens are unique, so exactly those 3 positions are covered.
    val docs = Seq(
      (1L, "u1 x y z v1"), (2L, "x y z v2 w2"), (3L, "u3 v3 x y z"),
      (4L, "x y z u4 v4 w4"), (5L, "clean doc five entirely")
    ).toDF("doc_id", "text")
    val scope = new CacheScope
    try {
      val cov = TextAnalysis.boilerplateCoverage(docs, minDocs = 4, scope = scope)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Double)].collect()
      assert(cov.map(c => (c._1, c._3)).toSeq ===
        Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 0L)))
      assert(cov(0)._4 === 0.6) // 3 of 5 tokens

      val stripped = TextAnalysis.stripBoilerplate(docs, minDocs = 4, scope = scope)
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
      assert(stripped === Seq(
        (1L, "u1 v1"), (2L, "v2 w2"), (3L, "u3 v3"),
        (4L, "u4 v4 w4"), (5L, "clean doc five entirely")))
    } finally scope.release()
  }

  test("boilerplate: coverage and strip agree on kept-token counts") {
    val docs = Tables.documents(spark, sfDir)
    val scope = new CacheScope
    try {
      val cov = TextAnalysis.boilerplateCoverage(docs, scope = scope)
      val stripped = TextAnalysis.stripBoilerplate(docs, scope = scope)
        .withColumn("n_kept",
          when($"clean_text" === "", 0L)
            .otherwise(size(split($"clean_text", " ")).cast("long")))
      val mismatch = cov.join(stripped, "doc_id")
        .filter($"n_tokens" - $"covered" =!= $"n_kept")
      assert(mismatch.count() === 0)
      // overlapping boilerplate spans must not double-count coverage
      assert(cov.filter($"covered" > $"n_tokens").count() === 0)
      assert(cov.filter($"covered" > 0).count() > 0) // non-vacuous on corpus
    } finally scope.release()
  }

  test("lmScoreCross trained on the corpus itself equals lmScore exactly") {
    val docs = Tables.documents(spark, sfDir)
    val self = TextAnalysis.lmScore(docs)
      .as[(Long, Long, Double)].collect().toSet
    val cross = TextAnalysis.lmScoreCross(docs, docs)
      .as[(Long, Long, Double)].collect().toSet
    assert(cross === self) // left joins hit on every key when train ≡ score
  }

  test("lmScoreCross: fully unseen vocabulary scores the smoothing floor") {
    val train = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val score = Seq((9L, "zq xv qj zq")).toDF("doc_id", "text") // all unseen
    val got = TextAnalysis.lmScoreCross(score, train)
      .as[(Long, Long, Double)].collect()
    // every bigram backs off to P = 1/V with V = 5 distinct train tokens
    val floorScore =
      math.floor(math.floor(math.log(1.0 / 5.0) * 1e9 + 0.5) / 1e9
        * 1e4 + 0.5) / 1e4
    assert(got.toSeq === Seq((9L, 3L, floorScore)))
  }

  test("textrank: central tokens outrank peripheral ones; ties break by token") {
    // "a b c d" with window 2: edges a-b a-c b-c b-d c-d; deg a=d=2, b=c=3.
    // b and c are central -> higher rank; (b,c) and (a,d) are exact
    // symmetric ties, broken by token order.
    val d = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = TextAnalysis.textrankKeywords(d, k = 4)
      .as[(Long, String, Double, Int)].collect().toSeq.sortBy(_._4)
    assert(out.map(_._2) === Seq("b", "c", "a", "d"))
    assert(out(0)._3 === out(1)._3) // b and c tie exactly
    assert(out(2)._3 === out(3)._3) // a and d tie exactly
    assert(out(0)._3 > out(2)._3)
  }

  test("textrank kernel equals the iterative reference on every corpus doc") {
    // driver reference replaying the pre-kernel DataFrame formulation's
    // exact arithmetic: undirected window-2 co-occurrence counts, 3 damped
    // rounds of contrib = floor(rq·wt/deg + 0.5) then
    // rq = round(0.15e9) + floor(0.85·Σ + 0.5), top-3 by (rq desc, token)
    def ref(text: String, k: Int = 3, window: Int = 2, iters: Int = 3,
            damping: Double = 0.85): Seq[(String, Double)] = {
      val toks = text.split(" ", -1)
      val wt = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for (p <- toks.indices; o <- 1 to window if p + o < toks.length
           if toks(p) != toks(p + o)) {
        wt((toks(p), toks(p + o))) += 1L
        wt((toks(p + o), toks(p))) += 1L
      }
      if (wt.isEmpty) return Seq.empty
      val deg = wt.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
      var rq = deg.keys.map(_ -> 1000000000L).toMap
      val base = math.round((1 - damping) * 1e9)
      for (_ <- 1 to iters) {
        val acc = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        for (((s, d), w) <- wt)
          acc(d) += math.floor(rq(s).toDouble * w.toDouble / deg(s).toDouble + 0.5).toLong
        rq = acc.map { case (n, a) =>
          n -> (base + math.floor(damping * a.toDouble + 0.5).toLong) }.toMap
      }
      rq.toSeq.sortBy { case (n, r) => (-r, n) }.take(k)
        .map { case (n, r) =>
          n -> math.floor(r.toDouble / 100000.0 + 0.5) / 10000.0 }
    }
    val docs = Tables.documents(spark, sfDir)
    val got = TextAnalysis.textrankKeywords(docs)
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => r._2 -> r._3).toSeq)
      .toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.nonEmpty)
    for ((id, text) <- texts) {
      assert(got.getOrElse(id, Seq.empty) === ref(text), s"doc $id")
    }
  }

  test("textrank: a regular (complete) graph keeps every rank at 1.0") {
    // every token neighbors every other with equal weights -> the damped
    // update is a fixed point at exactly 1.0 on the grid
    val d = Seq((1L, "x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.textrankKeywords(d, k = 3)
      .as[(Long, String, Double, Int)].collect().toSeq
    assert(out.map(_._3).toSet === Set(1.0))
    assert(out.sortBy(_._4).map(_._2) === Seq("x", "y", "z"))
  }

  test("nbConfusion: disjoint-vocabulary classes classify perfectly") {
    // two classes with disjoint vocab: every held-out doc must land on the
    // diagonal no matter how the md5 bucket splits train/test
    val d = (0 until 60).map { i =>
      if (i % 2 == 0) (i.toLong, s"alpha beta gamma w$i alpha", "aa")
      else (i.toLong, s"delta epsilon zeta w$i delta", "bb")
    }.toDF("doc_id", "text", "lang")
    // w$i tokens are shared noise across classes; class words dominate.
    // Make the noise truly shared so it carries no signal:
    val d2 = d.withColumn("text",
      regexp_replace(col("text"), "w[0-9]+", "shared"))
    val confPairs = TextAnalysis.nbConfusion(d2)
      .as[(String, String, Long)].collect().toSeq
    assert(confPairs.forall { case (actual, predicted, _) => actual === predicted },
      s"off-diagonal predictions: $confPairs")
    val nTest = d2.filter(
      graft.operators.Curation.hashBucket(col("doc_id"), 100) >= 80).count()
    assert(confPairs.map(_._3).sum === nTest)
  }

  test("nbConfusion: prior dominates an uninformative document") {
    // class "maj" has 3x the training docs of "min"; a doc of only shared
    // tokens must be assigned to the majority class by the prior term
    val train = (0 until 80).map { i =>
      val lang = if (i % 4 == 0) "min" else "maj"
      (i.toLong, "shared tokens only here", lang)
    }
    // held-out bucket membership varies; just assert every predicted label
    // is "maj" (all docs are uninformative, priors decide)
    val d = train.toDF("doc_id", "text", "lang")
    val conf = TextAnalysis.nbConfusion(d).as[(String, String, Long)].collect()
    assert(conf.nonEmpty)
    assert(conf.forall(_._2 === "maj"), s"expected all-maj predictions: ${conf.toSeq}")
  }

  test("topKRm3All restricted to one query equals the single-query topKRm3") {
    import graft.operators.Bm25
    val docs = Tables.documents(spark, sfDir)
    val all = Bm25.topKRm3All(docs, Seq(0L, 5L).toDF("query_id"), 10)
      .as[(Long, Long, Long, Int)].collect().groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(r => (r._2, r._3, r._4)).toSeq.sortBy(_._3) }
    for (qid <- Seq(0L, 5L)) {
      val single = Bm25.topKRm3(docs, qid, 10)
        .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
      assert(all.getOrElse(qid, Seq.empty) === single, s"query $qid diverged")
    }
  }

  test("topKRm3Text with zero expansion terms reduces to topKText exactly") {
    import graft.operators.Bm25
    val docs = Tables.documents(spark, sfDir)
    val qt = "fast vector scan query"
    val rm3 = Bm25.topKRm3Text(docs, qt, 10, fbTerms = 0)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    val plain = Bm25.topKText(docs, qt, 10)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(rm3 === plain)
  }

  test("maxSimRerankAll restricted to one query equals the single-query form") {
    import graft.operators.Bm25
    val docs = Tables.documents(spark, sfDir)
    val all = Bm25.maxSimRerankAll(docs, Seq(0L, 5L).toDF("query_id"), 5)
      .as[(Long, Long, Long, Int)].collect().groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(r => (r._2, r._3, r._4)).toSeq.sortBy(_._3) }
    for (qid <- Seq(0L, 5L)) {
      val single = Bm25.maxSimRerank(docs, qid, 5)
        .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
      assert(all.getOrElse(qid, Seq.empty) === single, s"query $qid diverged")
    }
  }
}
