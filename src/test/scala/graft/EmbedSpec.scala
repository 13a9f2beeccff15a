package graft

import org.apache.spark.sql.functions._
import graft.operators.{Embed, Ivf, Similarity}

class EmbedSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("hashedTf: one row per document, dim-length float vectors") {
    val emb = Embed.hashedTf(docs, dim = 64)
    assert(emb.count() === docs.count())
    assert(emb.schema("embedding").dataType.simpleString === "array<float>")
    val lens = emb.select(size($"embedding")).distinct().as[Int].collect()
    assert(lens.toSeq === Seq(64))
  }

  test("hashedTf: deterministic across partitionings") {
    val a = Embed.hashedTf(docs.repartition(7), dim = 32)
      .select($"vec_id", $"embedding".cast("string"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = Embed.hashedTf(docs.coalesce(1), dim = 32)
      .select($"vec_id", $"embedding".cast("string"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("hashedTf: values are the signed bucket counts (hand replay)") {
    // one doc, known features: unigrams [x, y, x] + bigrams [x y, y x]
    val one = Seq((1L, "x y x")).toDF("doc_id", "text")
    val vec = Embed.hashedTf(one, dim = 8)
      .select($"embedding").as[Seq[Float]].head()
    // driver-side replay of the same md5 bucket + sign law
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = new Array[Float](8)
    Seq("x", "y", "x", "x y", "y x").foreach { f =>
      val h = md5hex(f)
      val b = (java.lang.Long.parseLong(h.take(8), 16) % 8).toInt
      val sgn = if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1 else -1
      expected(b) += sgn
    }
    assert(vec === expected.toSeq)
  }

  test("hashedTf: empty-text document still embeds (single empty token)") {
    val one = Seq((1L, "")).toDF("doc_id", "text")
    val rows = Embed.hashedTf(one, dim = 8).count()
    assert(rows === 1L)
  }

  test("generated vectors drive the IVF index end-to-end (self-fed ANN)") {
    val emb = Embed.hashedTf(docs)
    val model = Ivf.buildIndex(sfDir + "#embed", emb, nlist = 8)
    // exhaustive probe (nprobe = all lists) must equal brute force exactly
    val probed = Ivf.probe(model, emb, 0L, 10, nprobe = model.centroids.length)
      .as[(Long, Double)].collect().toSeq
    val exact = Similarity.topK(emb, 0L, 10).as[(Long, Double)].collect().toSeq
    assert(probed === exact)
  }
}
