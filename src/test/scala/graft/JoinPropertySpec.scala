package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{AsofJoin, RangeJoin}

/** Randomized properties for the custom joins: on arbitrary generated
  * event sets, the distributed formulations must equal brute-force
  * references computed in plain Scala. Seeds are fixed → reproducible.
  */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  // (user 0-4, offset seconds 0..7200 — tight ranges force key and ts
  // collisions, the interesting cases)
  private def evGen(n: Int): Gen[List[(Long, Long)]] =
    Gen.listOfN(n, for {
      u <- Gen.choose(0L, 4L)
      s <- Gen.choose(0L, 7200L)
    } yield (u, s))

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("asof join equals the brute-force latest-at-or-before, any data") {
    for (seed <- 1L to 6L) {
      val ls = draw(evGen(40), seed).zipWithIndex
        .map { case ((u, s), i) => (u, new Timestamp(base + s * 1000), i.toLong) }
      // distinct (user, ts) on the right — the operator's documented precondition
      val rs = draw(evGen(40), seed + 100).distinctBy(x => (x._1, x._2)).zipWithIndex
        .map { case ((u, s), i) => (u, new Timestamp(base + s * 1000), 1000L + i) }

      val out = AsofJoin.asofJoin(
          ls.toDF("user_id", "ts", "left_id"),
          rs.toDF("user_id", "ts", "right_id"),
          "user_id", "ts", Seq("right_id"))
        .select("left_id", "right_id")
        .as[(Long, Option[Long])].collect().toMap

      val expected = ls.map { case (u, ts, lid) =>
        val cands = rs.filter(r => r._1 == u && !r._2.after(ts))
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(r => (r._2.getTime, r._3))._3))
      }.toMap
      assert(out === expected, s"seed=$seed")
    }
  }

  test("bucketed range join equals brute-force BETWEEN, any data and width") {
    for ((seed, width) <- Seq((1L, 60L), (2L, 3600L), (3L, 7201L))) {
      val pts = draw(evGen(50), seed)
        .zipWithIndex.map { case ((u, s), i) =>
          (u, new Timestamp(base + s * 1000), i.toLong) }
      val ivs = draw(evGen(20), seed + 200)
        .zipWithIndex.map { case ((u, s), i) =>
          (u, new Timestamp(base + s * 1000),
            new Timestamp(base + (s + 1800) * 1000), 1000L + i) }

      val out = RangeJoin.pointInInterval(
          pts.toDF("user_id", "ts", "pid"),
          ivs.toDF("user_id", "w_start", "w_end", "iid"),
          "user_id", "ts", "w_start", "w_end", Seq("iid"), width)
        .select("pid", "iid").as[(Long, Long)].collect().toSet

      val expected = (for {
        (u, ts, pid) <- pts
        (u2, s, e, iid) <- ivs
        if u == u2 && !ts.before(s) && !ts.after(e)
      } yield (pid, iid)).toSet
      assert(out === expected, s"seed=$seed width=$width")
    }
  }
}
