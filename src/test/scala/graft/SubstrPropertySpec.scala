package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Dedup

/** Randomized property for exact-substring dedup: on arbitrary small-alphabet
  * corpora (tiny alphabet forces dense accidental overlaps — the interesting
  * cases), the distributed positioned-gram/islands formulation must emit
  * exactly the maximal shared token runs ≥ minLen that a brute-force
  * run-walker finds. Seeds are fixed → reproducible.
  */
class SubstrPropertySpec extends SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def corpusGen(nDocs: Int): Gen[List[List[String]]] =
    Gen.listOfN(nDocs, for {
      len <- Gen.choose(0, 25)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield toks)

  /** Brute force: every maximal aligned equal-token run of length ≥ minLen,
    * per ordered doc pair and alignment offset.
    */
  private def refSpans(docs: Seq[(Long, Array[String])],
                       minLen: Int): Set[(Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
    for ((ia, ta) <- docs; (ib, tb) <- docs if ia < ib) {
      for (d <- -(tb.length - 1) to (ta.length - 1)) {
        val lo = math.max(0, d)
        val hi = math.min(ta.length - 1, tb.length - 1 + d)
        var runStart = -1
        var pa = lo
        while (pa <= hi + 1) {
          val eq = pa <= hi && ta(pa) == tb(pa - d)
          if (eq && runStart < 0) runStart = pa
          if (!eq && runStart >= 0) {
            val len = pa - runStart
            if (len >= minLen)
              out += ((ia, ib, runStart.toLong, (runStart - d).toLong, len.toLong))
            runStart = -1
          }
          pa += 1
        }
      }
    }
    out.toSet
  }

  test("exactSubstrSpans equals the brute-force maximal-run walker, any corpus") {
    for (seed <- 1L to 5L) {
      val toks = draw(corpusGen(5), seed).zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.toArray) }
      val df = toks.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      // maxDf = corpus size disables the hot-gram cap: the reference has
      // no cap, and no gram's doc-frequency can exceed the doc count
      val got = Dedup.exactSubstrSpans(df, minLen = 3, maxDf = toks.size)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // empty-ish docs tokenize to [""] on split(" "), which the reference
      // models as a real token — mirror that
      val ref = refSpans(
        toks.map { case (id, ts) =>
          (id, if (ts.isEmpty) Array("") else ts) }, 3)
      assert(got === ref, s"seed=$seed")
    }
  }
}
