package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), docSchema)

  test("identicalVectorPairs finds exactly the equal-vector pairs") {
    // 1,2,5 share a vector; 3,4 share another; 6 unique; 7 shares 6's
    // hash-relevant prefix but differs — equality verify must reject noise
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f)), (5L, Seq(1.0f, 2.0f)),
      (3L, Seq(9.0f, 0.0f)), (4L, Seq(9.0f, 0.0f)),
      (6L, Seq(7.0f, 7.0f)), (7L, Seq(7.0f, 7.1f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.identicalVectorPairs(vecs)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (1L, 5L), (2L, 5L), (3L, 4L)))
    // agrees with the brute-force near-1 threshold on identical vectors
    val brute = Dedup.embeddingPairs(vecs.filter($"vec_id" =!= 7), 0.999999)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got === brute)
  }

  test("ccStars equals min-label propagation on the corpus pair table") {
    val pairs = Dedup.minhashPairs(Tables.documents(spark, sfDir), 0.5)
      .persist()
    val star = Dedup.ccStars(pairs).as[(Long, Long)].collect().toMap
    val prop = Dedup.nearDupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(star === prop)
    pairs.unpersist()
  }

  test("ccStars converges on a long chain where per-hop propagation cannot") {
    // path 0-1-2-…-80: component diameter 80. Min-label propagation moves
    // labels ONE hop per round, so maxIter=15 must fail loudly; star
    // contraction halves path lengths per round and finishes comfortably.
    val chain = (0L until 80L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Dedup.nearDupClusters(chain, maxIter = 15)
    }
    val star = Dedup.ccStars(chain, maxIter = 15).as[(Long, Long)].collect()
    assert(star.length === 81)
    assert(star.forall(_._2 === 0L), "every chain node labels to the min")
  }

  test("ccAuto: bit-parity with both parents on bushy graphs (converges pre-cutover)") {
    val pairs = Dedup.minhashPairs(Tables.documents(spark, sfDir), 0.5)
      .persist()
    val auto = Dedup.ccAuto(pairs).as[(Long, Long)].collect().toMap
    val star = Dedup.ccStars(pairs).as[(Long, Long)].collect().toMap
    assert(auto === star)
    pairs.unpersist()
  }

  test("ccAuto: long chain crosses the cutover into stars with unchanged labels") {
    // diameter 256 ≫ cutover 3: propagation alone would need 256 rounds;
    // ccAuto must contract by the 3-round labels and let stars finish —
    // every node still labels to the component min
    val chain = (0L until 256L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val auto = Dedup.ccAuto(chain, maxIter = 15).as[(Long, Long)].collect()
    assert(auto.length === 257)
    assert(auto.forall(_._2 === 0L), "every chain node labels to the min")
    // a chain short enough to converge inside the cutover takes the pure
    // propagation path — same labels
    val short = Seq((5L, 6L), (6L, 7L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.ccAuto(short).as[(Long, Long)].collect().toMap
    assert(got === Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 10L -> 10L, 11L -> 10L))
  }

  test("ccAuto on random graphs matches brute-force components at cutover boundaries") {
    val rnd = new scala.util.Random(13)
    for (cutover <- Seq(1, 2, 3)) {
      val n = 40
      val es = (1 to 45).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = es.flatMap(e => Seq(e._1, e._2)).toSet
      val expected = inGraph.map(v => v -> {
        val r = find(v.toInt)
        inGraph.filter(u => find(u.toInt) == r).min
      }).toMap
      val got = Dedup.ccAuto(es.toDF("doc_a", "doc_b"), cutover = cutover)
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"cutover $cutover")
    }
  }

  test("ccStars on random graphs matches brute-force components (property)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 40
      val es = (1 to 50).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // brute force: union-find on the driver
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = es.flatMap(e => Seq(e._1, e._2)).toSet
      val expected = inGraph.map(v => v -> {
        // component min = min over members sharing the root
        val r = find(v.toInt)
        inGraph.filter(u => find(u.toInt) == r).min
      }).toMap
      val got = Dedup.ccStars(es.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("dedupLines keeps the first occurrence corpus-wide and reaches a fixed point") {
    // docs 1-3 share a boilerplate line; doc 2 also repeats one of ITS OWN
    // lines (intra-doc dup — CCNet cuts those too); doc 4 is untouched
    val lines = Seq(
      (1L, 0, Seq("subscribe", "now")), (1L, 1, Seq("real", "content", "one")),
      (2L, 0, Seq("subscribe", "now")), (2L, 1, Seq("real", "content", "two")),
      (2L, 2, Seq("real", "content", "two")),
      (3L, 0, Seq("unique", "lead")), (3L, 1, Seq("subscribe", "now")),
      (4L, 0, Seq("all", "original", "here"))
    ).toDF("doc_id", "line_no", "ws")
    val out = Dedup.dedupLines(lines)
      .select("doc_id", "n_lines", "n_kept", "n_dropped", "kept_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2L, 2L, 0L, "subscribe now real content one")))
    assert(out(2L) === ((2L, 3L, 1L, 2L, "real content two")))
    assert(out(3L) === ((3L, 2L, 1L, 1L, "unique lead")))
    assert(out(4L) === ((4L, 1L, 1L, 0L, "all original here")))
    // fixed point: dedup of the surviving lines drops nothing
    val again = Dedup.dedupLines(
      Dedup.dedupLines(lines).filter($"n_kept" > 0)
        .select($"doc_id", lit(0).as("line_no"),
          split($"kept_text", " ").as("ws")))
    assert(again.agg(sum("n_dropped")).as[Long].head() === 0L)
  }

  test("shingles: 3-grams, distinct, empty for short docs") {
    val out = docs((1L, "a b c d"), (2L, "a b"), (3L, "x y z x y z x y z"))
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) === Seq("a b c", "b c d"))
    assert(out(2L) === Seq.empty)
    assert(out(3L).toSet === Set("x y z", "y z x", "z x y")) // distinct-ed
  }

  test("jaccardPairs: identical docs → 1.0, disjoint docs → absent") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words in this one here now"))
    val pairs = Dedup.jaccardPairs(d, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("minhashPairs equals exact jaccardPairs on the corpus (recall check)") {
    val d = Tables.documents(spark, sfDir)
    val exact = Dedup.jaccardPairs(d, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(d, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty) // the corpus plants near-dups; a vacuous pass hides bugs
    assert(lsh === exact)
  }

  test("simhash banding finds exactly the brute-force hamming<=3 pairs") {
    val d = Tables.documents(spark, sfDir)
    val sh = Dedup.withSimhash(d).select("doc_id", "simhash")
    val a = sh.select($"doc_id".as("doc_a"), $"simhash".as("h_a"))
    val b = sh.select($"doc_id".as("doc_b"), $"simhash".as("h_b"))
    val brute = a.crossJoin(b).filter($"doc_a" < $"doc_b")
      .withColumn("hamming", bit_count(expr("h_a ^ h_b")))
      .filter($"hamming" <= 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val banded = Dedup.simhashPairs(d, 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(banded === brute) // pigeonhole guarantee: banding loses nothing at dist<=3
  }

  test("simhash: identical texts collide, near-identical texts are close") {
    val d = docs(
      (1L, "spark is a unified analytics engine for large scale data"),
      (2L, "spark is a unified analytics engine for large scale data"),
      (3L, "spark is a unified analytics engine for large scale work"))
    val h = Dedup.withSimhash(d).select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    assert(h(1L) === h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 16) // one-token change
  }

  test("exactByKey keeps min id and counts copies") {
    val d = docs((5L, "same text"), (9L, "same text"), (7L, "other text"))
    val out = Dedup.exactByKey(d,
        graft.operators.TextAnalysis.fingerprintMd5($"text"), "doc_id")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out === Map(5L -> 2L, 7L -> 1L))
  }

  test("nearDupClusters: transitive closure with min-id labels") {
    // chain 1-2, 2-3 (one component, closure needed: 1 and 3 never pair
    // directly) + isolated pair 10-11; labels = component minimum
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("embeddingPairs is symmetric-free and thresholded") {
    val emb = Tables.embeddings(spark, sfDir)
    val pairs = Dedup.embeddingPairs(emb, 0.4)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, c) => a < b && c >= 0.4 && c <= 1.0 })
  }

  test("misconfiguration fails loudly: bands must divide k, maxDist <= 3") {
    val d = docs((1L, "a b c d"))
    val sigs = d.select($"doc_id",
      Dedup.minhashSignature(Dedup.shingles($"text")).as("sig"))
    // 128 % 24 != 0 → trailing signature rows would be silently dropped
    intercept[IllegalArgumentException] {
      Dedup.lshBuckets(sigs, "doc_id", "sig", bands = 24)
    }
    // pigeonhole banding is only complete through Hamming distance 3
    intercept[IllegalArgumentException] { Dedup.simhashPairs(d, maxDist = 4) }
  }

  test("bottom-k sketch containment equals exact containment (planted excerpts)") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val excerpts = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 40)).as("text"))
    val corpus = docs.unionByName(excerpts)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = pairs(Dedup.containmentPairs(corpus, 0.9))
    val sketch = pairs(Dedup.containmentPairsSketch(corpus, 0.9))
    assert(sketch === exact)
    assert(exact.nonEmpty) // the planted excerpt-parent pairs
  }

  test("minhashPairsAgainst: every new clone rediscovers its original") {
    val d = Tables.documents(spark, sfDir)
    val newBatch = d.filter($"doc_id" % 50 === 0)
      .withColumn("doc_id", $"doc_id" + 150000L)
    val pairs = Dedup.minhashPairsAgainst(newBatch, d, 0.5)
      .as[(Long, Long, Double)].collect()
    val originals = d.filter($"doc_id" % 50 === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(originals.nonEmpty)
    originals.foreach { o =>
      assert(pairs.exists(p => p._1 == o + 150000L && p._2 == o && p._3 == 1.0),
        s"clone of $o did not rediscover its original")
    }
    // cross-set only: new ids on the left, corpus ids on the right
    assert(pairs.forall(p => p._1 >= 150000L && p._2 < 150000L))
  }

  test("semanticDupPairs = embeddingPairs restricted to co-clustered pairs") {
    val emb = Tables.embeddings(spark, sfDir)
    val brute = Dedup.embeddingPairs(emb, 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val sem = Dedup.semanticDupPairs(emb, 0.4, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(brute)) // within-cluster pairs are true pairs
    assert(sem.nonEmpty)        // near-identical vectors co-cluster
    // one cluster = no pruning: identical to the brute-force ground truth
    val all = Dedup.semanticDupPairs(emb, 0.4, sfDir, nlist = 1)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(all === brute)
  }

  test("bloomNovel equals the plain anti-join (prefilter changes nothing)") {
    val corpus = Tables.documents(spark, sfDir)
    val newBatch = corpus.filter($"doc_id" % 7 === 0)
      .withColumn("doc_id", $"doc_id" + 500000L)
      .unionByName(corpus.filter($"doc_id" % 7 === 1)
        .withColumn("doc_id", $"doc_id" + 600000L)
        .withColumn("text", concat($"text", lit(" qqfresh"))))
    val got = Dedup.bloomNovel(newBatch, corpus, "text", s"spec-bloom-$sfDir",
        expectedItems = 100000L)
      .select("doc_id").as[Long].collect().toSet
    val want = newBatch.join(corpus.select("text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got === want)
    // every planted dup dropped, every altered doc kept
    assert(got === corpus.filter($"doc_id" % 7 === 1)
      .select($"doc_id" + 600000L).as[Long].collect().toSet)
  }

  test("bloom filter: no false negatives; novel keys mostly prefiltered") {
    val corpus = Tables.documents(spark, sfDir)
    val filter = Dedup.bloomIndex(s"spec-bloom-fn-$sfDir", corpus, $"text",
      expectedItems = 100000L, fpp = 0.01)
    // no false negatives: every corpus key must test positive
    val misses = corpus
      .filter(!Dedup.bloomMightContain(filter, $"text")).count()
    assert(misses === 0L)
    // effectiveness: ≥ 90% of genuinely novel keys skip the verify join
    // (fpp 0.01 — even 10× degradation would still pass; guards against
    // a put/probe hash mismatch that silently degrades to might=always)
    val novel = corpus.withColumn("text", concat($"text", lit(" qqfresh2")))
    val prefiltered = novel
      .filter(!Dedup.bloomMightContain(filter, $"text")).count()
    assert(prefiltered >= (novel.count() * 9) / 10)
  }

  test("broadcast bloom probe agrees with the codegen literal probe") {
    val corpus = Tables.documents(spark, sfDir)
    val filter = Dedup.bloomIndex(s"spec-bloom-fn-$sfDir", corpus, $"text",
      expectedItems = 100000L, fpp = 0.01)
    // probe corpus keys AND novel variants through both paths
    val keys = corpus.select($"doc_id", $"text")
      .unionByName(corpus.select(($"doc_id" + 1000000L).as("doc_id"),
        concat($"text", lit(" qqbc")).as("text")))
    val viaLit = keys
      .withColumn("m", Dedup.bloomMightContain(filter, $"text"))
      .select("doc_id", "m").as[(Long, Boolean)].collect().toMap
    val viaBc = keys
      .withColumn("m", Dedup.bloomMightContainBroadcast(filter, $"text"))
      .select("doc_id", "m").as[(Long, Boolean)].collect().toMap
    assert(viaLit === viaBc)
  }

  test("exactSubstrSpans: planted mid-document span found below any jaccard radar") {
    // doc 2 embeds tokens 30..59 of doc 1 (0-based) at its position 20,
    // inside otherwise-disjoint text — the pair jaccardPairs cannot see
    val a = (0 until 100).map(i => s"a$i").mkString(" ")
    val bToks = (0 until 20).map(i => s"b$i") ++
      (30 until 60).map(i => s"a$i") ++ (20 until 40).map(i => s"c$i")
    val d = docs((1L, a), (2L, bToks.mkString(" ")))
    val spans = Dedup.exactSubstrSpans(d, minLen = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans === Seq((1L, 2L, 30L, 20L, 30L)))
    // the same pair is invisible to set-based near-dup at any usual threshold
    assert(Dedup.jaccardPairs(d, 0.5).count() === 0)
  }

  test("exactSubstrSpans: two disjoint shared runs yield two islands") {
    val a = ((0 until 15).map(i => s"x$i") ++ (0 until 10).map(i => s"q$i") ++
      (0 until 12).map(i => s"y$i")).mkString(" ")
    val b = ((0 until 15).map(i => s"x$i") ++ (0 until 10).map(i => s"r$i") ++
      (0 until 12).map(i => s"y$i")).mkString(" ")
    val spans = Dedup.exactSubstrSpans(docs((1L, a), (2L, b)), minLen = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // run 1: positions 0..14 both sides; run 2: positions 25..36 both sides
    assert(spans === Set((1L, 2L, 0L, 0L, 15L), (1L, 2L, 25L, 25L, 12L)))
  }

  test("exactSubstrSpans: hot grams (df > maxDf) are excluded from matching") {
    val boiler = (0 until 10).map(i => s"h$i").mkString(" ")
    val d = docs((1L to 5L).map(i => (i, s"$boiler tail$i only")): _*)
    // the shared 10-gram occurs in 5 docs; maxDf=4 drops it -> no spans
    assert(Dedup.exactSubstrSpans(d, minLen = 10, maxDf = 4).count() === 0)
    // maxDf=10 keeps it: all C(5,2)=10 pairs share the 10-token span
    assert(Dedup.exactSubstrSpans(d, minLen = 10, maxDf = 10).count() === 10)
  }

  test("cutSubstrSpans keeps the first copy, cuts the rest, reaches a fixed point") {
    // three-way share: the span lives in docs 1 < 2 < 3; keep-first must
    // leave exactly doc 1's copy without any cluster step
    val shared = (0 until 20).map(i => s"s$i")
    val t1 = ((0 until 12).map(i => s"a$i") ++ shared).mkString(" ")
    val t2 = (shared ++ (0 until 12).map(i => s"b$i")).mkString(" ")
    val t3 = ((0 until 6).map(i => s"c$i") ++ shared ++
      (0 until 6).map(i => s"d$i")).mkString(" ")
    val d = docs((1L, t1), (2L, t2), (3L, t3))
    val out = Dedup.cutSubstrSpans(d, minLen = 10)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === t1, "lowest-id copy must survive verbatim")
    assert(out(2L) === (0 until 12).map(i => s"b$i").mkString(" "))
    assert(out(3L) === ((0 until 6).map(i => s"c$i") ++
      (0 until 6).map(i => s"d$i")).mkString(" "))
    // fixed point: span detection over the stripped corpus finds nothing
    val stripped = Dedup.cutSubstrSpans(d, minLen = 10)
      .withColumnRenamed("clean_text", "text")
    assert(Dedup.exactSubstrSpans(stripped, minLen = 10).count() === 0)
  }

  test("cutSubstrSpans fixed point holds on the planted-clone corpus") {
    val d = Tables.documentsWithClones(spark, sfDir)
    val stripped = Dedup.cutSubstrSpans(d)
      .withColumnRenamed("clean_text", "text")
    assert(Dedup.exactSubstrSpans(stripped).count() === 0,
      "re-detection after removal should find no span >= minLen")
    // clones collapse to '' (full-document spans), originals keep text
    val emptied = stripped.filter(length($"text") === 0).count()
    assert(emptied > 0, "planted full clones should have been fully cut")
  }

  test("exactSubstrReport aggregates the span table per pair") {
    val a = (0 until 40).map(i => s"a$i").mkString(" ")
    val d = docs((1L, a), (2L, a))
    val rep = Dedup.exactSubstrReport(d, minLen = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rep === Seq((1L, 2L, 1L, 40L, 40L)))
  }

  test("CacheScope releases exactly the operator's persisted intermediates") {
    // earlier tests in this suite cached via the global scope; start clean
    graft.CacheScope.global.release()
    spark.catalog.clearCache()
    val scope = new graft.CacheScope
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"))
    Dedup.minhashPairs(d, 0.5, scope = scope).collect()
    assert(scope.size === 1) // the signature table
    assert(!spark.sharedState.cacheManager.isEmpty)
    scope.release()
    assert(scope.size === 0)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("materializedMinhashPairs equals the compute form, row for row") {
    val d = Tables.documents(spark, sfDir)
    val compute = graft.operators.Dedup.minhashPairs(d, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val stored = graft.operators.Dedup.materializedMinhashPairs(
        sfDir + "#pairspec", d, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(stored === compute)
    // second read serves the store (same values, no recompute asserted by
    // the memo contract)
    val again = graft.operators.Dedup.materializedMinhashPairs(
        sfDir + "#pairspec", d, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(again === compute)
  }
}
