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
