package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Curation

/** Property tests for the two curation operators with nontrivial internal
  * math: the two-phase budget selection (bucket boundaries, frontier
  * window, offset arithmetic) and sequence packing (per-shard prefix
  * sums). Gen is driven directly with fixed seeds (the scalatest bridge
  * artifact isn't in the offline cache), so failures reproduce exactly.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // (key, rank, cost) rows: duplicate ranks likely (narrow rank range),
  // zero costs possible, cluster-scale sizes
  private val rowsGen: Gen[List[(Long, Double, Long)]] = for {
    n <- Gen.choose(0, 300)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 100000L)
      r <- Gen.choose(0, 40).map(_ / 4.0)
      c <- Gen.frequency(5 -> Gen.choose(1L, 50L), 1 -> Gen.const(0L))
    } yield (k, r, c))
  } yield rows.distinctBy(_._1)

  test("selectUnderBudget equals the sequential reference for random inputs") {
    for (seed <- 1L to 8L) {
      val rows = sample(rowsGen, seed)
      val budget = sample(Gen.choose(0L, 3000L), seed * 31)
      val df = rows.toDF("k", "r", "c")
      val got = Curation.selectUnderBudget(df, col("r"), col("k"), col("c"), budget)
        .select("k").as[Long].collect().toSet
      val expected = {
        var run = 0L
        rows.sortBy { case (k, r, _) => (-r, k) }
          .flatMap { case (k, _, c) =>
            run += c; if (run <= budget) Some(k) else None
          }.toSet
      }
      assert(got === expected, s"seed=$seed budget=$budget n=${rows.size}")
      CacheScope.global.release()
    }
  }

  // JVM twin of Curation.hashUnit: first 4 md5 bytes as an unsigned int
  // scaled by 2^-32 — exact, like the SQL twin
  private def hashUnit(key: Long): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v.toDouble / 4294967296.0
  }

  test("mixtureSample equals the per-source sequential reference on random inputs") {
    val srcGen = Gen.oneOf("s0", "s1", "s2", "s3")
    val mixRowsGen: Gen[List[(Long, String, Long)]] = for {
      n <- Gen.choose(0, 300)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1L, 100000L)
        s <- srcGen
        c <- Gen.frequency(5 -> Gen.choose(1L, 50L), 1 -> Gen.const(0L))
      } yield (k, s, c))
    } yield rows.distinctBy(_._1)
    for (seed <- 1L to 6L) {
      val rows = sample(mixRowsGen, seed)
      val budgets = sample(Gen.someOf(Seq("s0", "s1", "s2", "s3")), seed * 17)
        .map(s => s -> sample(Gen.choose(0L, 1500L), seed * 31 + s.hashCode))
        .toMap
      if (budgets.nonEmpty) {
        val df = rows.toDF("k", "src", "c")
        val got = Curation.mixtureSample(df, "src", col("k"), col("c"), budgets)
          .select("k").as[Long].collect().toSet
        val expected = budgets.keySet.flatMap { s =>
          var run = 0L
          rows.filter(_._2 == s)
            .sortBy { case (k, _, _) => (hashUnit(k), k) }
            .flatMap { case (k, _, c) =>
              run += c; if (run <= budgets(s)) Some(k) else None
            }
        }
        assert(got === expected, s"seed=$seed budgets=$budgets n=${rows.size}")
        CacheScope.global.release()
      }
    }
  }

  test("packSequences matches a sequential per-shard packer for random chunks") {
    for (seed <- 1L to 5L) {
      val chunks = sample(Gen.listOfN(200, for {
        d <- Gen.choose(1L, 40L)
        c <- Gen.choose(0, 9)
        t <- Gen.choose(1, 80)
      } yield (d, c, t)), seed).distinctBy(x => (x._1, x._2))
      val df = chunks.toDF("doc_id", "chunk_no", "n_chunk_tokens")
      val got = Curation.packSequences(df, 128, 4)
        .select("doc_id", "chunk_no", "shard", "bin", "bin_tokens_before")
        .as[(Long, Int, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      // sequential reference: same md5 shard law, per-shard (doc, chunk)
      // order, running prefix
      val shardOf = df.select(col("doc_id"),
          Curation.hashBucket(col("doc_id"), 4).as("s"))
        .as[(Long, Long)].collect().toMap
      val expected = chunks.groupBy(x => shardOf(x._1)).flatMap {
        case (shard, rows) =>
          var prefix = 0L
          rows.sortBy(x => (x._1, x._2)).map { case (d, c, t) =>
            val r = (d, c) -> ((shard, prefix / 128, prefix % 128))
            prefix += t
            r
          }
      }
      assert(got === expected, s"seed=$seed")
    }
  }
}
