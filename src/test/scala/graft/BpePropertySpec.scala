package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Bpe

/** Property test: the distributed BPE trainer equals a direct sequential
  * reference implementation (pair counting over word frequencies, argmax
  * with (count desc, left, right) ties, non-overlapping left-to-right
  * merge application) on random corpora. Gen driven with fixed seeds so
  * failures reproduce exactly (the scalacheck-bridge artifact isn't in
  * the offline cache).
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // small alphabet → dense pair counts and plenty of ties
  private val corpusGen: Gen[List[String]] = for {
    nDocs <- Gen.choose(1, 12)
    docs <- Gen.listOfN(nDocs, for {
      nWords <- Gen.choose(1, 30)
      ws <- Gen.listOfN(nWords, for {
        len <- Gen.choose(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield ws.mkString(" "))
  } yield docs

  /** Sequential reference: classic Sennrich get_stats/merge loop. */
  private def referenceTrain(texts: Seq[String], nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[List[String], Long] = texts.flatMap(_.split(" "))
      .groupBy(identity).map { case (w, ws) =>
        w.toList.map(_.toString) -> ws.size.toLong
      }
    val out = Seq.newBuilder[(String, String, Long)]
    var exhausted = false
    for (_ <- 1 to nMerges if !exhausted) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = vocab.map { case (syms, f) =>
          // non-overlapping left-to-right merge pass
          val merged = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toList -> f
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    out.result()
  }

  test("trainMerges equals the sequential reference on random corpora") {
    for (seed <- 1L to 10L) {
      val texts = sample(corpusGen, seed)
      val expected = referenceTrain(texts, 6)
      val scope = new CacheScope
      try {
        // the engine throws when pairs run out; train only as far as the
        // reference got and compare the full prefix
        if (expected.nonEmpty) {
          val got = Bpe.trainMerges(
              texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
                .toDF("doc_id", "text"),
              expected.length, scope)
            .map(m => (m.left, m.right, m.cnt))
          assert(got === expected, s"seed=$seed corpus=$texts")
        }
      } finally scope.release()
      CacheScope.global.release()
    }
  }
}
