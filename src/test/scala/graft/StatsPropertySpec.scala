package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Stats

/** Property tests for the two-phase grid quantile: on any cent-grid data it
  * must reproduce Spark's buffering `percentile()` exactly — duplicates,
  * skewed groups, single-element groups, negative values, rank positions
  * landing exactly on and between grid points. Gen is driven directly with
  * fixed seeds (the scalatest bridge artifact isn't in the offline cache),
  * so failures reproduce exactly.
  */
class StatsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // (group, value) rows: few groups (forces big + size-1 groups), values on
  // the cent grid incl. negatives, heavy duplication (narrow value range)
  private val rowsGen: Gen[List[(String, Double)]] = for {
    n <- Gen.choose(1, 400)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      cents <- Gen.choose(-5000L, 5000L)
    } yield (g, cents / 100.0))
  } yield rows

  test("grid quantiles == percentile() on random cent-grid data (property)") {
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99)
    for (seed <- 1L to 6L) {
      val rows = sample(rowsGen, seed)
      val df = rows.toDF("g", "v")
      val got = Stats.exactQuantilesByGrid(df, "g", "v", qs)
        .select("g", "qi", "quantile")
        .as[(String, Int, Double)].collect()
        .map { case (g, qi, v) => (g, qi) -> v }.toMap
      val expected = df.groupBy("g")
        .agg(expr(s"percentile(v, array(${qs.mkString("D,")}D))").as("p"))
        .select(col("g"), posexplode(col("p")).as(Seq("qi", "v")))
        .as[(String, Int, Double)].collect()
        .map { case (g, qi, v) => (g, qi) -> v }.toMap
      assert(got.keySet === expected.keySet, s"seed=$seed key sets differ")
      got.foreach { case (k, v) =>
        val e = expected(k)
        assert(math.abs(v - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"seed=$seed $k: grid=$v percentile=$e")
      }
    }
  }

  // keyed integer series with deliberate level shifts (so CUSUM actually
  // fires) plus pure-noise groups and constant groups (σ=0 must emit nothing)
  private val seriesGen: Gen[List[(String, Int, Int)]] = for {
    n <- Gen.choose(20, 250)
    shiftAt <- Gen.choose(5, 15)
    lift <- Gen.choose(8, 25)
    rows <- Gen.listOfN(n, Gen.choose(0, 12))
  } yield {
    val noisy = rows.zipWithIndex.map { case (v, i) =>
      ("drift", i, if (i >= shiftAt) v + lift else v)
    }
    val flat = rows.zipWithIndex.map { case (v, i) => ("noise", i, v) }
    val const = (0 until 30).map(i => ("const", i, 7)).toList
    noisy ++ flat ++ const
  }

  test("closed-form CUSUM == sequential recursion (property)") {
    val (slack, h) = (0.5, 4.0)
    for (seed <- 1L to 6L) {
      val rows = sample(seriesGen, seed)
      val df = rows.toDF("g", "ord", "v")
      val got = Stats.cusumChangepoints(df, "g", "ord", "v", slack, h)
        .select("g", "ord", "cusum_up_4dp", "cusum_dn_4dp")
        .as[(String, Int, Double, Double)].collect()
        .map { case (g, o, up, dn) => (g, o) -> ((up, dn)) }.toMap

      // textbook sequential recursion, per group in ord order
      val expected = rows.groupBy(_._1).flatMap { case (g, grp) =>
        val xs = grp.sortBy(_._2).map(r => (r._2, r._3.toDouble))
        val n = xs.size.toDouble
        val mu = xs.map(_._2).sum / n
        val ex2 = xs.map(x => x._2 * x._2).sum / n
        val varp = ex2 - mu * mu
        if (varp <= 0.0) Nil
        else {
          val sigma = math.sqrt(varp)
          val (kUp, kDn) = (mu + slack * sigma, mu - slack * sigma)
          var (sUp, sDn) = (0.0, 0.0)
          xs.flatMap { case (ord, x) =>
            sUp = math.max(0.0, sUp + x - kUp)
            sDn = math.max(0.0, sDn + kDn - x)
            // guard band: skip rows within 1e-6 of the h·σ boundary where
            // float-summation order could legitimately flip the flag
            val margin = math.max(sUp, sDn) - h * sigma
            if (margin > 1e-6) Some((g, ord) -> ((sUp, sDn)))
            else if (margin > -1e-6) Some((g, ord) -> ((-1.0, -1.0))) // either ok
            else None
          }
        }
      }

      val boundary = expected.collect { case (k, (-1.0, -1.0)) => k }.toSet
      val expFirm = expected.filter { case (k, _) => !boundary(k) }
      assert((got.keySet -- boundary) === expFirm.keySet,
        s"seed=$seed flagged sets differ")
      expFirm.foreach { case (k, (eUp, eDn)) =>
        val (gUp, gDn) = got(k)
        assert(math.abs(gUp - eUp) <= 2e-4 && math.abs(gDn - eDn) <= 2e-4,
          s"seed=$seed $k: got=($gUp,$gDn) seq=($eUp,$eDn)")
      }
      assert(!got.keySet.exists(_._1 == "const"),
        s"seed=$seed constant group must emit nothing")
    }
  }
}
