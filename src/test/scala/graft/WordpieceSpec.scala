package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Wordpiece}

/** WordPiece tokenizer: greedy longest-match-first segmentation against a
  * position-aware vocabulary — parity with a driver-side reference
  * implementation plus hand-checked vocab/greedy laws.
  */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy WordPiece (BERT's WordpieceTokenizer loop). */
  private def refGreedy(word: String, initial: Set[String],
                        cont: Set[String]): Seq[String] = {
    var pos = 0
    val out = Seq.newBuilder[String]
    while (pos < word.length) {
      val inSet = if (pos == 0) initial else cont
      val bl = (math.min(Wordpiece.MaxPiece, word.length - pos) to 1 by -1)
        .find(l => inSet.contains(word.substring(pos, pos + l)))
        .getOrElse(sys.error(s"unsegmentable: $word at $pos"))
      out += (if (pos == 0) "" else "##") + word.substring(pos, pos + bl)
      pos += bl
    }
    out.result()
  }

  test("segmentWords equals the reference greedy on every corpus word") {
    val docs = Tables.documents(spark, sfDir)
    val vocab = Wordpiece.trainVocab(docs)
    val vrows = vocab.select("core", "is_cont").as[(String, Boolean)].collect()
    val initial = vrows.filter(!_._2).map(_._1).toSet
    val cont = vrows.filter(_._2).map(_._1).toSet
    val got = Wordpiece.segmentWords(Bpe.wordFreqs(docs).select("word"), vocab)
      .as[(String, Long, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (w, np, seg) =>
      val ref = refGreedy(w, initial, cont)
      assert(seg === ref.mkString(" "), s"word '$w'")
      assert(np === ref.length.toLong, s"word '$w' piece count")
    }
  }

  test("greedy takes the longest match even when a coarser split exists") {
    // word 'abcde' (> MaxPiece, so never a single piece): greedy grabs the
    // 4-char 'abcd' then '##e' — NOT a coarser 'ab ##cde'-style split an
    // ML segmenter could prefer; this pins the longest-match-first law
    val docs = Seq((1L, "abcde ab cd e")).toDF("doc_id", "text")
    val vocab = Wordpiece.trainVocab(docs, topMulti = 60)
    val seg = Wordpiece.segmentWords(docs.select(explode(split($"text", " "))
        .as("word")), vocab)
      .as[(String, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(seg("abcde") === "abcd ##e")
    assert(seg("ab") === "ab")
  }

  test("trainVocab counts are position-aware and freq-weighted") {
    val docs = Seq((1L, "ab ab ba")).toDF("doc_id", "text")
    val v = Wordpiece.trainVocab(docs)
      .select("piece", "cnt").as[(String, Long)].collect().toMap
    // 'a' initial in 'ab'×2; '##a' continuation in 'ba'×1
    assert(v("a") === 2L)
    assert(v("##a") === 1L)
    assert(v("b") === 1L)
    assert(v("##b") === 2L)
    assert(v("ab") === 2L)
    assert(v("ba") === 1L)
  }

  test("segmentWords rejects words longer than maxWordLen loudly") {
    val docs = Seq((1L, "short")).toDF("doc_id", "text")
    val vocab = Wordpiece.trainVocab(docs)
    val long = Seq("thisiswaytoolongforthelimit").toDF("word")
    val e = intercept[IllegalArgumentException] {
      Wordpiece.segmentWords(long, vocab, maxWordLen = 12)
    }
    assert(e.getMessage.contains("maxWordLen"))
  }

  test("segmentWords rejects vocab/corpus character mismatch loudly") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val vocab = Wordpiece.trainVocab(docs)
    val alien = Seq("xyz").toDF("word")
    val e = intercept[IllegalArgumentException] {
      Wordpiece.segmentWords(alien, vocab)
    }
    assert(e.getMessage.contains("missing from the vocabulary"))
  }
}
