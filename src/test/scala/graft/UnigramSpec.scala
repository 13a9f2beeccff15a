package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("trainVocab: hand-checked counts and scores on a 3-word corpus") {
    // words: "ab"×2, "b"×1 → pieces a:2, ab:2, b:3; total = 7
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val got = Unigram.trainVocab(docs, topMulti = 60)
      .select("piece", "cnt", "score_q")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    def sq(c: Long) = math.floor(math.log(c.toDouble / 7) * 1e9 + 0.5).toLong
    assert(got === Seq(("a", 2L, sq(2)), ("ab", 2L, sq(2)), ("b", 3L, sq(3))))
  }

  test("segmentation prefers the higher-likelihood decomposition") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(docs, topMulti = 60)
    val seg = Unigram.segmentWords(Seq("ab", "b").toDF("word"), vocab)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    // ln(2/7) > ln(2/7)+ln(3/7): the single piece "ab" wins over a+b
    assert(seg("ab") === 1L)
    assert(seg("b") === 1L)
  }

  test("chars-only vocabulary segments every word into its characters") {
    val docs = Tables.documents(spark, sfDir)
    val vocab = Unigram.trainVocab(docs, topMulti = 0)
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
    val seg = Unigram.segmentWords(words, vocab)
    assert(seg.filter(col("n_pieces") =!= length(col("word"))).count() === 0)
  }

  test("Viterbi equals brute-force enumeration with the same tie law") {
    val docs = Tables.documents(spark, sfDir)
    val vocab = Unigram.trainVocab(docs, topMulti = 60)
    val scores = vocab.select("piece", "score_q")
      .as[(String, Long)].collect().toMap
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .distinct().as[String].collect()
    def decomps(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(Unigram.MaxPiece, w.length)).flatMap { n =>
        val head = w.take(n)
        if (scores.contains(head)) decomps(w.drop(n)).map(head +: _)
        else Seq.empty
      }
    // brute-force argmax: total score desc, then longer FINAL piece wins at
    // every suffix boundary — realized by comparing the reversed piece-
    // length sequence descending (the DP's (sq desc, i asc) at each step)
    val got = Unigram.segmentWords(words.toSeq.toDF("word"), vocab)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    for (w <- words) {
      val all = decomps(w)
      assert(all.nonEmpty, s"word $w not segmentable")
      val best = all.maxBy(d =>
        (d.map(scores).sum, d.reverse.map(_.length).toVector)
      )(Ordering.Tuple2(Ordering.Long, Ordering.Implicits.seqOrdering[Vector, Int]))
      val (np, sq) = got(w)
      assert(sq === best.map(scores).sum, s"score mismatch for $w")
      assert(np === best.length.toLong, s"piece count mismatch for $w: got $np, best $best")
    }
  }

  test("tokenCounts: per-doc sums tie out against the word segmentation") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    val vocab = Unigram.trainVocab(Tables.documents(spark, sfDir), topMulti = 60)
    val got = Unigram.tokenCounts(docs, vocab)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val seg = Unigram.segmentWords(
        docs.select(explode(split(col("text"), " ")).as("word")), vocab)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    for ((id, text) <- rows) {
      val ws = text.split(" ").toSeq
      val (_, nw, np, sq) = got(id)
      assert(nw === ws.length.toLong)
      assert(np === ws.map(w => seg(w)._1).sum)
      assert(sq === ws.map(w => seg(w)._2).sum)
    }
  }

  test("segmentPieces replays the exact Viterbi path (brute-force parity)") {
    val docs = Tables.documents(spark, sfDir)
    val vocab = Unigram.trainVocab(docs, topMulti = 60)
    val scores = vocab.select("piece", "score_q")
      .as[(String, Long)].collect().toMap
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .distinct().as[String].collect()
    // driver-side reference DP with the identical tie law: best(j) over
    // split points i = max (sq, then smallest i); backtrace yields pieces
    def refPieces(w: String): Seq[String] = {
      val best = Array.fill(w.length + 1)((Long.MinValue, -1))
      best(0) = (0L, -1)
      for (j <- 1 to w.length) {
        var bs = Long.MinValue; var bi = -1
        for (i <- math.max(0, j - Unigram.MaxPiece) until j) {
          val p = w.substring(i, j)
          if (best(i)._1 != Long.MinValue && scores.contains(p)) {
            val s = best(i)._1 + scores(p)
            if (s > bs) { bs = s; bi = i } // strict: ties keep SMALLEST i
          }
        }
        best(j) = (bs, bi)
      }
      var j = w.length
      val out = Vector.newBuilder[String]
      while (j > 0) { val bi = best(j)._2; out += w.substring(bi, j); j = bi }
      out.result()
    }
    val got = Unigram.segmentPieces(words.toSeq.toDF("word"), vocab)
      .groupBy("word", "piece").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    for (w <- words) {
      val want = refPieces(w).groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got(w) === want, s"path mismatch for '$w'")
    }
  }

  test("emRound: usage counts, prune, and re-score tie out by hand") {
    // corpus: "ab"×2, "b"×1 under seed vocab {a, ab, b} (see trainVocab
    // test). Viterbi: "ab" → [ab] (ln(2/7) beats ln(2/7)+ln(3/7)),
    // "b" → [b]. Usage: ab=2, b=1, a=0. keepMulti=40 keeps ab.
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(docs, topMulti = 60)
    val got = Unigram.emRound(docs, vocab, keepMulti = 40)
      .select("piece", "use_cnt", "score_q")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // total = Σ(use+1) over kept {a:0, b:1, ab:2} = 1 + 2 + 3 = 6
    def sq(use: Long) = math.floor(math.log((use + 1).toDouble / 6) * 1e9 + 0.5).toLong
    assert(got === Seq(("a", 0L, sq(0)), ("ab", 2L, sq(2)), ("b", 1L, sq(1))))
  }

  test("emRound prunes multi pieces the best segmentations never use") {
    val docs = Tables.documents(spark, sfDir)
    val seed = Unigram.trainVocab(docs, topMulti = 60)
    val refined = Unigram.emRound(docs, seed, keepMulti = 40)
    val multis = refined.filter(length(col("piece")) > 1)
    // every surviving multi was actually used (> 0 by construction)
    assert(multis.filter(col("use_cnt") <= 0).count() === 0)
    assert(multis.count() <= 40)
    // singles all survive — the refined vocab still segments everything
    val seedSingles = seed.filter(length(col("piece")) === 1).count()
    assert(refined.filter(length(col("piece")) === 1).count() === seedSingles)
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
    assert(Unigram.segmentWords(words, refined).count() > 0)
  }

  /** Driver-side reference of emRoundSoft's E-step: enumerate every
    * segmentation path, replay the exact grid math (integer log-weights,
    * quantized softmax, 1e-5-grid integer-div expectations). Returns
    * expected usage per piece on the ×10⁵ grid.
    */
  private def refSoftUsage(wordFreqs: Map[String, Long],
                           vocab: Map[String, Long]): Map[String, Long] = {
    def paths(w: String): Seq[(Long, List[String])] =
      if (w.isEmpty) Seq((0L, Nil))
      else (1 to math.min(4, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        vocab.get(p).toSeq.flatMap(sq =>
          paths(w.substring(l)).map { case (lw, ps) => (lw + sq, p :: ps) })
      }
    val usage = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- wordFreqs) {
      val ps = paths(w)
      assert(ps.nonEmpty, s"'$w' unsegmentable under the test vocab")
      val m = ps.map(_._1).max
      val rs = ps.map { case (lw, pieces) =>
        (math.floor(math.exp((lw - m).toDouble / 1e9) * 1e9 + 0.5).toLong, pieces)
      }
      val z = rs.map(_._1).sum
      val n = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      rs.foreach { case (r, pieces) => pieces.foreach(p => n(p) += r) }
      n.foreach { case (p, np) => usage(p) += f * ((np * 100000L + z / 2) / z) }
    }
    usage.toMap
  }

  test("emRoundSoft: expectations tie out against the reference DP by hand") {
    // corpus "ab"×2, "b"×1, vocab {a, ab, b}: word "ab" has paths [ab]
    // (the Viterbi best) and [a b] at relative weight ≈ 3/7, so soft usage
    // splits where hard-EM gave everything to [ab]
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(docs, topMulti = 60)
    val vmap = vocab.select("piece", "score_q").as[(String, Long)].collect().toMap
    val ref = refSoftUsage(Map("ab" -> 2L, "b" -> 1L), vmap)
    val got = Unigram.emRoundSoft(docs, vocab, keepMulti = 40)
      .select("piece", "use_q").as[(String, Long)].collect().toMap
    assert(got === Map("a" -> ref("a"), "ab" -> ref("ab"), "b" -> ref("b")))
    // qualitative: the non-Viterbi path carries real mass...
    assert(got("a") > 0L && got("a") < got("ab"))
    // ...and per-word expectations are conserved: for "ab", e(ab)+e(a) ≈ 1e5
    // (±1 from the two independent roundings)
    assert(math.abs(got("ab") / 2 + got("a") / 2 - 100000L) <= 1L)
  }

  test("emRoundSoft equals the reference DP on the fixture corpus") {
    val docs = Tables.documents(spark, sfDir)
    val vocab = Unigram.trainVocab(docs, topMulti = 60)
    val vmap = vocab.select("piece", "score_q").as[(String, Long)].collect().toMap
    val wf = graft.operators.Bpe.wordFreqs(docs)
      .as[(String, Long)].collect().toMap
    val ref = refSoftUsage(wf, vmap)
    val got = Unigram.emRoundSoft(docs, vocab, keepMulti = 40)
      .select("piece", "use_q").as[(String, Long)].collect().toMap
    // every kept piece's expectation matches the reference exactly
    got.foreach { case (p, u) =>
      assert(u === ref.getOrElse(p, 0L), s"usage mismatch for '$p'")
    }
    // prune contract: ≤ 40 multis, all with positive expected usage;
    // singles all survive
    val multis = got.keys.filter(_.length > 1)
    assert(multis.size <= 40 && multis.forall(got(_) > 0L))
    val singles = vmap.keys.filter(_.length == 1).toSet
    assert(singles.subsetOf(got.keySet))
  }

  test("two soft-EM rounds equal the reference DP iterated twice") {
    // the convergence composition: round 2 re-segments under round 1's
    // re-scored vocabulary; reference = the driver DP + a driver replay of
    // the M-step (singles kept, top-40 multis by (use desc, piece),
    // add-one-on-the-1e5-grid smoothed ln re-score)
    def mstep(usage: Map[String, Long], vocabPieces: Set[String],
              keepMulti: Int): Map[String, (Long, Long)] = {
      val singles = vocabPieces.filter(_.length == 1).toSeq
        .map(p => p -> usage.getOrElse(p, 0L))
      val multis = usage.filter { case (p, _) => p.length > 1 }
        .toSeq.sortBy { case (p, u) => (-u, p) }.take(keepMulti)
      val kept = singles ++ multis
      val total = kept.map(_._2).sum + kept.size * 100000L
      kept.map { case (p, u) =>
        p -> (u, math.floor(
          math.log((u + 100000L).toDouble / total) * 1e9 + 0.5).toLong)
      }.toMap
    }
    val docs = Tables.documents(spark, sfDir)
    val vocab = Unigram.trainVocab(docs, topMulti = 60)
    val wf = graft.operators.Bpe.wordFreqs(docs)
      .as[(String, Long)].collect().toMap
    val v1 = vocab.select("piece", "score_q").as[(String, Long)].collect().toMap
    val ref1 = mstep(refSoftUsage(wf, v1), v1.keySet, 40)
    val ref2 = mstep(
      refSoftUsage(wf, ref1.map { case (p, (_, s)) => p -> s }),
      ref1.keySet, 40)
    val r1 = Unigram.emRoundSoft(docs, vocab, keepMulti = 40)
    val got = Unigram.emRoundSoft(docs, r1, keepMulti = 40)
      .select("piece", "use_q", "score_q").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === ref2)
  }

  test("segmentWords rejects words with characters missing from the vocab") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(docs, topMulti = 60)
    intercept[IllegalArgumentException] {
      Unigram.segmentWords(Seq("abc").toDF("word"), vocab)
    }
  }

  test("overlong words are rejected loudly") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(docs, topMulti = 0)
    intercept[IllegalArgumentException] {
      Unigram.segmentWords(Seq("a" * 13).toDF("word"), vocab, maxWordLen = 12)
    }
  }
}
