package graft

import org.apache.spark.sql.functions._
import graft.plans.NativeKernels
import graft.operators.Dedup

class NativeKernelsSpec extends SparkSpec {
  import spark.implicits._

  test("VecDot matches the HOF fold bit-for-bit on the corpus") {
    val emb = Tables.embeddings(spark, sfDir).limit(100)
    val hof = aggregate(
      zip_with(transform($"embedding", _.cast("double")),
        transform($"embedding", _.cast("double")), _ * _),
      lit(0.0), _ + _)
    val diff = emb.select(
        (NativeKernels.vecDot($"embedding", $"embedding") - hof).as("d"))
      .filter($"d" =!= 0.0)
    assert(diff.count() === 0) // identical fold order ⇒ identical bits
  }

  test("VecDot handles mixed float/double arrays and nulls") {
    val out = spark.sql(
      """SELECT CAST(array(1.0, 2.0) AS ARRAY<FLOAT>) AS f,
        |       array(3.0D, 4.0D) AS d""".stripMargin)
      .select(NativeKernels.vecDot($"f", $"d").as("x"),
        NativeKernels.vecDot(lit(null).cast("array<float>"), $"f").as("n"))
      .as[(Option[Double], Option[Double])].head()
    assert(out._1 === Some(11.0))
    assert(out._2 === None)
  }

  test("Md5Hash64 kernel matches the two-half HOF form bit-for-bit") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val toks = split($"text", " ")
    val hof = transform(toks, t => Dedup.md5Hash64(t))
    val diff = docs.select(
        NativeKernels.md5Hash64(toks).as("k"), hof.as("h"))
      .filter(not($"k" <=> $"h"))
    assert(diff.count() === 0)
    // empty token and unicode both hash like their UTF-8 bytes
    val edge = Seq(Seq("", "héllo", "a")).toDF("toks")
      .select(NativeKernels.md5Hash64($"toks").as("k"),
        transform($"toks", t => Dedup.md5Hash64(t)).as("h"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(edge._1 === edge._2)
  }

  test("MinHashSig: interpreted eval equals codegen path") {
    val (a, b) = Dedup.hashParams(16)
    val df = Seq(Seq(1L, 2L, 3L), Seq.empty[Long], Seq(-5L))
      .toDF("hs")
    val fromCodegen = df.select(
      NativeKernels.minhashSig($"hs", a, b).as("sig"))
      .as[Seq[Long]].collect()
    // reference reimplementation in Scala
    def ref(hs: Seq[Long]): Seq[Long] = {
      val p = NativeKernels.P31
      (0 until 16).map { i =>
        if (hs.isEmpty) p
        else hs.map { h0 =>
          val h = ((h0 % p) + p) % p
          (a(i) * h + b(i)) % p
        }.min
      }
    }
    assert(fromCodegen(0) === ref(Seq(1L, 2L, 3L)))
    assert(fromCodegen(1) === ref(Seq.empty))
    assert(fromCodegen(2) === ref(Seq(-5L)))
  }

  test("HashedShingles equals the HOF xxhash64-over-string-shingles chain") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val hof = array_distinct(transform(
      Dedup.shingles($"text", 3), s => xxhash64(s)))
    val diff = docs.select(
        NativeKernels.hashedShingles(split($"text", " "), 3).as("a"),
        hof.as("b"))
      .filter($"a" =!= $"b")
    assert(diff.count() === 0)
    // short doc (< n tokens) → empty, not reversed-range garbage
    val short = Seq("one two").toDF("text")
      .select(NativeKernels.hashedShingles(split($"text", " "), 3).as("a"))
      .as[Seq[Long]].head()
    assert(short === Seq.empty)
  }

  test("GramHashes equals the positioned HOF chain, all positions kept") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val toks = split($"text", " ")
    // the pre-kernel spelling of Dedup.gramHashes, verbatim
    val hof = when(size(toks) < 10, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 10),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(10))))))
    val diff = docs.select(
        NativeKernels.gramHashes(split($"text", " "), 10).as("a"),
        hof.as("b"))
      .filter($"a" =!= $"b")
    assert(diff.count() === 0)
    // repeated grams keep EVERY position (no distinct filter)
    val rep = Seq("a b a b a b").toDF("text")
      .select(NativeKernels.gramHashes(split($"text", " "), 2).as("a"))
      .as[Seq[Long]].head()
    assert(rep.length === 5)
    assert(rep.distinct.length === 2)
    val short = Seq("one two").toDF("text")
      .select(NativeKernels.gramHashes(split($"text", " "), 3).as("a"))
      .as[Seq[Long]].head()
    assert(short === Seq.empty)
  }

  test("AllSubstrings equals the nested-HOF substring chain") {
    val words = Tables.documents(spark, sfDir).limit(50)
      .select(explode(split($"text", " ")).as("w")).distinct()
    val hof = flatten(transform(sequence(lit(0), length($"w") - 1),
      i => transform(sequence(lit(1), least(lit(4), length($"w") - i)),
        n => $"w".substr(i + 1, n))))
    val diff = words.select(
        NativeKernels.allSubstrings($"w", 4).as("a"), hof.as("b"))
      .filter($"a" =!= $"b")
    assert(diff.count() === 0)
    val edge = Seq("", "é↑x").toDF("w")
      .select(NativeKernels.allSubstrings($"w", 2).as("a"))
      .as[Seq[String]].collect()
    assert(edge(0) === Seq.empty)
    // code-point indexing: multi-byte chars slice whole
    assert(edge(1) === Seq("é", "é↑", "↑", "↑x", "x"))
  }

  test("AHash64 kernel matches the HOF reference bit-for-bit") {
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, sfDir)
      .select(Multimodal.blobCodes($"text").as("codes"))
      // persist: the HOF reference references `codes` ~130 times — without
      // the cache boundary it re-evaluates the split per reference
      .cache()
    try {
      val diff = docs.select(
          NativeKernels.aHash64($"codes").as("a"),
          Multimodal.aHash64Reference($"codes").as("b"))
        .filter($"a" =!= $"b")
      assert(diff.count() === 0)
    } finally docs.unpersist()
    // edge cases: empty and shorter-than-64 arrays
    val edge = Seq(Seq.empty[Long], Seq(5L), Seq(1L, 9L, 1L)).toDF("codes")
      .select(NativeKernels.aHash64($"codes").as("a"),
        graft.operators.Multimodal.aHash64Reference($"codes").as("b"))
      .as[(Long, Long)].collect()
    edge.foreach { case (a, b) => assert(a === b) }
    assert(edge(0)._1 === 0L) // empty blob → zero hash
  }

  test("QuantArgmin matches the array_min(struct(QuantDot…)) form bit-for-bit") {
    // the struct-array formulation QuantArgmin replaced (verbatim
    // semantics: negscore = −dot/√norm2, Double.compare ordering, ties →
    // lower cid) — kept here as the executable spec of those semantics
    def structForm(v: org.apache.spark.sql.Column,
                   cents: Array[(Int, Array[Long])]): org.apache.spark.sql.Column = {
      val entries = cents.map { case (cid, cq) =>
        val norm2q = cq.map(c => c * c).sum
        struct(
          (lit(0.0) - NativeKernels.quantDot(v, cq, 1000.0).cast("double")
            / sqrt(lit(norm2q.toDouble))).as("negscore"),
          lit(cid).as("cid"))
      }
      array_min(array(entries.toIndexedSeq: _*)).getField("cid")
    }
    def kernelForm(v: org.apache.spark.sql.Column,
                   cents: Array[(Int, Array[Long])]): org.apache.spark.sql.Column =
      NativeKernels.quantArgmin(v, cents.map(_._1), cents.map(_._2),
        cents.map { case (_, cq) => math.sqrt(cq.map(c => c * c).sum.toDouble) },
        1000.0)

    val emb = Tables.embeddings(spark, sfDir)
    // deterministic pseudo-centroids of assorted ids, including a
    // duplicated one (tie → lower cid). No zero-norm centroid: ANSI mode
    // makes the struct form's division THROW on one (so production
    // quantizers provably never fed it one), while the kernel's Java
    // division yields NaN, which Double.compare ranks last — strictly
    // more lenient on an input the old form rejected.
    val dim = 64
    def cent(seed: Int): Array[Long] =
      Array.tabulate(dim)(i => ((seed * 2654435761L + i * 40503L) % 2000L) - 1000L)
    val dup = cent(7)
    val cents: Array[(Int, Array[Long])] =
      Array(3 -> cent(1), 11 -> cent(7), 4 -> cent(6),
        9 -> dup, 25 -> cent(2), 31 -> cent(3), 12 -> cent(4)).sortBy(_._1)
    val diff = emb.select(
        structForm($"embedding", cents).as("a"),
        kernelForm($"embedding", cents).as("b"))
      .filter($"a" =!= $"b")
    assert(diff.count() === 0)
    // wide-centroid regression: 98 centroids — the width where the struct
    // form dropped to interpreted eval — must still agree exactly
    val wide: Array[(Int, Array[Long])] =
      Array.tabulate(98)(c => c -> cent(c + 100))
    val diffW = emb.limit(200).select(
        structForm($"embedding", wide).as("a"),
        kernelForm($"embedding", wide).as("b"))
      .filter($"a" =!= $"b")
    assert(diffW.count() === 0)
  }

  test("QuantTopLists matches the slice(array_sort(struct…)) form bit-for-bit") {
    // the probe-side formulation QuantTopLists replaced, kept as the
    // executable spec: ascending (negscore, cid) sort, top-nprobe slice,
    // exact integer q·c carried as baseq
    def sortForm(v: org.apache.spark.sql.Column,
                 cents: Array[(Int, Array[Long])],
                 nprobe: Int): org.apache.spark.sql.Column = {
      val entries = cents.map { case (cid, cq) =>
        val norm2q = cq.map(c => c * c).sum
        val sq = NativeKernels.quantDot(v, cq, 1000.0)
        struct(
          (lit(0.0) - sq.cast("double") / sqrt(lit(norm2q.toDouble)))
            .as("negscore"),
          lit(cid).as("cid"),
          sq.as("baseq"))
      }
      transform(slice(array_sort(array(entries.toIndexedSeq: _*)), 1, nprobe),
        e => struct(e.getField("cid").as("cid"), e.getField("baseq").as("baseq")))
    }
    def kernelForm(v: org.apache.spark.sql.Column,
                   cents: Array[(Int, Array[Long])],
                   nprobe: Int): org.apache.spark.sql.Column =
      NativeKernels.quantTopLists(v, cents.map(_._1), cents.map(_._2),
        cents.map { case (_, cq) => math.sqrt(cq.map(c => c * c).sum.toDouble) },
        1000.0, nprobe)

    val emb = Tables.embeddings(spark, sfDir)
    val dim = 64
    def cent(seed: Int): Array[Long] =
      Array.tabulate(dim)(i => ((seed * 2654435761L + i * 40503L) % 2000L) - 1000L)
    val dup = cent(5)
    val cents: Array[(Int, Array[Long])] =
      Array(2 -> cent(1), 17 -> dup, 5 -> dup, 8 -> cent(2), 23 -> cent(3),
        40 -> cent(4), 41 -> cent(8)).sortBy(_._1)
    // nprobe interior, == nlist, and > nlist (slice caps at array length)
    for (np <- Seq(3, cents.length, cents.length + 5)) {
      val diff = emb.select(
          sortForm($"embedding", cents, np).as("a"),
          kernelForm($"embedding", cents, np).as("b"))
        .filter(not($"a" <=> $"b"))
      assert(diff.count() === 0, s"mismatch at nprobe=$np")
    }
    // wide-quantizer regression: 98 centroids, where the sort form's
    // generated code fell off codegen
    val wide: Array[(Int, Array[Long])] =
      Array.tabulate(98)(c => c -> cent(c + 200))
    val diffW = emb.limit(200).select(
        sortForm($"embedding", wide, 4).as("a"),
        kernelForm($"embedding", wide, 4).as("b"))
      .filter(not($"a" <=> $"b"))
    assert(diffW.count() === 0)
  }

  test("SQL registration via GraftExtensions works") {
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(dot === 11.0)
    val sh = spark.sql(
      "SELECT simhash64(array(xxhash64('a'), xxhash64('b'))) AS s")
      .as[Long].head()
    val shApi = Seq("a b").toDF("text")
    val expected = Dedup.withSimhash(shApi).select("simhash").as[Long].head()
    assert(sh === expected)
    val sig = spark.sql(
      "SELECT minhash_sig(array(xxhash64('x')), 8) AS s")
      .as[Seq[Long]].head()
    assert(sig.length === 8)
    val hs = spark.sql(
      "SELECT hashed_shingles(array('a','b','c','d'), 3) AS h")
      .as[Seq[Long]].head()
    assert(hs === Seq(xxhash64OfString("a b c"), xxhash64OfString("b c d")))
    val m5 = spark.sql("SELECT md5_hash64(array('a')) AS h").as[Seq[Long]].head()
    val m5Api = Seq(Seq("a")).toDF("t")
      .select(graft.plans.NativeKernels.md5Hash64($"t")).as[Seq[Long]].head()
    assert(m5 === m5Api)
  }

  private def xxhash64OfString(s: String): Long =
    Seq(s).toDF("t").select(xxhash64($"t")).as[Long].head()
}
