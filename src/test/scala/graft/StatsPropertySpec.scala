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
}
