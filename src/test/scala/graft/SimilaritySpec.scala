package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorOps

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = spark.sql(
      """SELECT CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>) AS a,
        |       CAST(array(0.0, 0.0, 0.0) AS ARRAY<FLOAT>) AS z,
        |       CAST(array(-2.0, 1.0, 0.0) AS ARRAY<FLOAT>) AS o""".stripMargin)
    val (self, zero, orth) = df.select(
      VectorOps.cosine($"a", $"a"), VectorOps.cosine($"a", $"z"),
      VectorOps.cosine($"a", $"o"))
      .as[(Option[Double], Option[Double], Option[Double])].head()
    assert(math.abs(self.get - 1.0) < 1e-12)
    assert(zero.isEmpty) // zero-norm guarded to null
    assert(math.abs(orth.get) < 1e-12)
  }

  test("topK agrees with knnJoin's ranking for the same query") {
    val emb = Tables.embeddings(spark, sfDir)
    val top = Similarity.topK(emb, 0L, 5)
      .as[(Long, Double)].collect().toSeq
    val knn = Similarity.knnJoin(emb, emb.filter($"vec_id" === 0), 5)
      .orderBy("rn").select("neighbor_id", "cosine")
      .as[(Long, Double)].collect().toSeq
    assert(top === knn)
  }

  test("LSH ANN: results are true cosines, recall vs exact is reported") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.topK(emb, 0L, 10).as[(Long, Double)].collect()
    val approx = Similarity.annTopKLsh(emb, 0L, 10).as[(Long, Double)].collect()
    // every LSH result must carry its true cosine (exact re-rank)
    val exactAll = Similarity.topK(emb, 0L, 499).as[(Long, Double)].collect().toMap
    approx.foreach { case (id, c) => assert(math.abs(exactAll(id) - c) < 1e-12) }
    val recall = approx.map(_._1).toSet.intersect(exact.map(_._1).toSet).size / 10.0
    info(s"LSH recall@10 = $recall (tables=8, bits=4)")
    assert(recall >= 0.2) // random-vector corpus: a conservative floor
  }

  test("LSH index is deterministic across invocations") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = Similarity.lshIndex(emb).select("vec_id", "table", "bucket")
      .as[(Long, Int, Long)].collect().toSet
    val b = Similarity.lshIndex(emb).select("vec_id", "table", "bucket")
      .as[(Long, Int, Long)].collect().toSet
    assert(a === b)
  }
}
