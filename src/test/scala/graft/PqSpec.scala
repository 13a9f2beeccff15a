package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("codebook training is deterministic across partitionings") {
    // the integer-grid Lloyd contract, per subspace: no float mean anywhere,
    // so two trainings over different partitionings are byte-identical
    val a = Pq.trainCodebooks(emb, 8, 16)
    val b = Pq.trainCodebooks(emb.repartition(7), 8, 16)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.map(_._1).toSeq === y.map(_._1).toSeq)
      assert(x.zip(y).forall { case ((_, p), (_, q)) => p.toSeq == q.toSeq })
    }
  }

  test("codes table is m small ints per vector (the compressed index)") {
    val model = Pq.buildIndex(sfDir + "#spec", emb)
    val codes = spark.read.parquet(model.codesPath)
    assert(codes.count() === emb.count())
    val rows = codes.select("codes").as[Seq[Int]].collect()
    assert(rows.forall(_.length === 8))
    assert(rows.forall(_.forall(c => c >= 0 && c < 16)))
  }

  test("ADC + exact rerank keeps useful recall vs exact top-k") {
    val exact = Similarity.topK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val pq = Pq.topKPq(emb, 0L, 10, indexKey = sfDir + "#spec")
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall@10 was $recall")
  }
}
