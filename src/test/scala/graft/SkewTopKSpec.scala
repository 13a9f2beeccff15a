package graft

import org.apache.spark.sql.functions._
import graft.functions.TopK
import graft.operators.{Similarity, Skew}

class SkewTopKSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase agg equals the plain aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val salted = Skew.saltedAgg(li, col("l_returnflag"), col("l_quantity"),
        col("l_orderkey") * 10 + col("l_linenumber"), salts = 16)
      .orderBy("key")
      .as[(String, Long, Double)].collect().toSeq
    val plain = li.groupBy(col("l_returnflag").as("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("key")
      .as[(String, Long, Double)].collect().toSeq
    assert(salted === plain)
  }

  test("salted join equals the plain inner join on a skewed dataset") {
    // 90% of fact rows share one hot key
    val fact = spark.range(2000)
      .select($"id".as("fid"), when($"id" % 10 === 0, $"id" % 5 + 1)
        .otherwise(lit(0L)).as("k"))
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "label")
    val salted = Skew.saltedJoin(fact, dim, "k", col("fid"), salts = 8)
      .select("fid", "k", "label")
      .as[(Long, Long, String)].collect().toSet
    val plain = fact.join(dim, "k").select("fid", "k", "label")
      .as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
    // reserved-name collision fails loudly
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact.withColumn("_salt", lit(1)), dim, "k", col("fid"))
    }
  }

  test("salted agg plan has two aggregation exchanges (salt then key)") {
    val p = Skew.saltedAgg(Tables.lineitem(spark, sfDir),
        col("l_returnflag"), col("l_quantity"), col("l_orderkey"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
  }

  test("TopK aggregator: insert/merge keep a sorted k-bounded buffer") {
    val agg = new TopK.TopKAggregator(3)
    val xs = Seq(1L -> 0.5, 2L -> 0.9, 3L -> 0.9, 4L -> 0.1, 5L -> 0.7)
      .map { case (i, s) => TopK.Scored(i, s) }
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    assert(buf.map(_.id) === Seq(2L, 3L, 5L)) // 0.9(id2), 0.9(id3), 0.7
    // merge from two halves gives the same result
    val (a, b) = xs.splitAt(2)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    assert(merged === buf)
  }

  test("knnJoinAgg equals the window knnJoin on the corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 5)
    val viaWindow = Similarity.knnJoin(emb, q, 3)
      .orderBy("query_id", "rn")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val viaAgg = Similarity.knnJoinAgg(emb, q, 3)
      .orderBy("query_id", "rn")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(viaAgg === viaWindow)
  }
}
