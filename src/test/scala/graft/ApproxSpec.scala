package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.TopK

/** Approximate/sketch aggregates (HLL distinct, approx quantiles) — no SQL
  * oracle possible (engine-specific sketches), so these are tolerance-bound
  * against the exact answers; plus randomized TopK-vs-sort properties.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries sketch keeps every true heavy hitter with bounded undercount") {
    val k = 64
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val exact = toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    val sk = toks.agg(graft.functions.HeavyHitters.sketch(k)(col("token")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("token"), col("e._2").as("est"))
      .as[(String, Long)].collect().toMap
    val bound = n / (k + 1)
    // est <= true, undercount <= n/(k+1)
    sk.foreach { case (t, est) =>
      assert(exact.contains(t) && est <= exact(t), s"$t overcounted")
      assert(exact(t) - est <= bound, s"$t undercount ${exact(t) - est} > $bound")
    }
    // nothing above the threshold is lost (here: every token — small vocab)
    val mustKeep = exact.filter(_._2 > bound).keySet
    assert(mustKeep.nonEmpty && mustKeep.subsetOf(sk.keySet))
    info(s"n=$n bound=$bound kept=${sk.size} mustKeep=${mustKeep.size}")
  }

  test("Count-Min sketch never undercounts and merges losslessly") {
    import graft.operators.Sketches
    val ev = Tables.events(spark, sfDir)
    // every (type, user) pair: est >= exact (each of the key's d counters
    // holds at least its true count), overcount bounded by collisions
    val exact = ev.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n_exact"))
    val sketch = Sketches.cmsSketch(ev, "event_type", col("user_id"))
    val report = Sketches.cmsLookup(sketch, exact, "event_type", col("user_id"))
      .withColumnRenamed("cms_key", "user_id")
      .join(exact, Seq("event_type", "user_id"))
      .select(col("n_exact"), col("est"))
      .as[(Long, Long)].collect()
    assert(report.nonEmpty)
    report.foreach { case (n, est) =>
      assert(est >= n, s"CMS undercounted: est=$est < exact=$n")
    }
    val n = ev.count()
    val worst = report.map { case (tr, est) => est - tr }.max
    // e·N/w per-key bound holds w.p. 1−e^−4 each; N/16 is far outside it
    assert(worst <= n / 16, s"overcount $worst implausibly large for N=$n")
    info(s"pairs=${report.length} worstOvercount=$worst N=$n")

    // merge losslessness: per-day sketches summed == the direct sketch,
    // REGISTER-exact (counts are linear) — not just estimate-equal
    val daily = Sketches.cmsSketch(
      ev.withColumn("event_type", concat_ws("|", col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd"))),
      "event_type", col("user_id"))
    val merged = Sketches.cmsMerge(
      Seq(daily.withColumn("event_type",
        substring_index(col("event_type"), "|", 1))), "event_type")
    val direct = sketch
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "merged per-day sketch differs from the direct sketch")
  }

  test("approx_count_distinct within 5% of exact on the corpus") {
    val li = Tables.lineitem(spark, sfDir)
    val (approx, exact) = li.agg(
        approx_count_distinct("l_partkey", 0.02).as("a"),
        countDistinct("l_partkey").as("e"))
      .as[(Long, Long)].head()
    val err = math.abs(approx - exact).toDouble / exact
    info(s"HLL err = $err (approx=$approx exact=$exact)")
    assert(err <= 0.05)
  }

  test("hll sketches are MERGEABLE: unioned partials equal the whole sketch") {
    // the property that makes sketches work at 100 TB: per-partition (or
    // per-day, per-source) sketches pre-aggregate and union WITHOUT rescan —
    // the Datasketches HLL union of partials must estimate identically to
    // one sketch over the whole corpus, and land within tolerance of exact
    val li = Tables.lineitem(spark, sfDir)
    val parts = li.withColumn("part", pmod(col("l_orderkey"), lit(4)))
      .groupBy("part").agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    val merged = parts
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .as[Long].head()
    val whole = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("e"))
      .as[Long].head()
    assert(merged === whole, s"union of partials $merged != whole $whole")
    val exact = li.select("l_partkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact <= 0.05)
  }

  test("approx_percentile brackets the exact percentile") {
    val li = Tables.lineitem(spark, sfDir)
    val (approx, lo, hi) = li.agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a"),
        expr("percentile(l_extendedprice, 0.45)").as("lo"),
        expr("percentile(l_extendedprice, 0.55)").as("hi"))
      .as[(Double, Double, Double)].head()
    assert(approx >= lo && approx <= hi,
      s"approx p50 $approx outside [$lo, $hi]")
  }

  test("TopK aggregator equals sort-take on random inputs (property)") {
    val gen = Gen.listOfN(200, for {
      id <- Gen.choose(0L, 50L) // small id space forces score ties
      s <- Gen.choose(0, 20).map(_ / 10.0) // coarse grid forces ties too
    } yield TopK.Scored(id, s))
    for (seed <- 1L to 8L) {
      val xs = gen.apply(Gen.Parameters.default, Seed(seed)).get
      val agg = new TopK.TopKAggregator(5)
      // random split points exercise merge associativity
      val cut1 = (seed * 37 % 200).toInt
      val (a, rest) = xs.splitAt(cut1)
      val (b, c) = rest.splitAt(rest.length / 2)
      def fold(part: Seq[TopK.Scored]) = part.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(agg.merge(fold(a), fold(b)), fold(c))
      // duplicates count separately, exactly as window row_number would
      val reference = xs.sortBy(x => (-x.score, x.id)).take(5)
      assert(merged === reference, s"seed=$seed")
    }
  }

  test("md5 HLL estimate within 2 standard errors of exact distinct") {
    import graft.operators.Sketches
    val li = Tables.lineitem(spark, sfDir).withColumn("g", lit("all"))
    val est = Sketches.hllDistinct(li, "g", col("l_partkey"))
      .select("est_2dp").as[Double].head()
    val exact = li.select(countDistinct("l_partkey")).as[Long].head()
    // m=256 registers -> se ~ 1.04/sqrt(256) = 6.5%; assert 2*se = 13%
    assert(math.abs(est - exact) / exact < 0.13,
      s"est=$est exact=$exact err=${math.abs(est - exact) / exact}")
    info(s"est=$est exact=$exact")
  }

  test("HLL sketch merge of disjoint halves equals whole-corpus estimate") {
    import graft.operators.Sketches
    val li = Tables.lineitem(spark, sfDir).withColumn("g", lit("all"))
    val lo = li.filter(col("l_orderkey") % 2 === 0)
    val hi = li.filter(col("l_orderkey") % 2 === 1)
    val whole = Sketches.hllDistinct(li, "g", col("l_partkey"))
      .select("est_2dp").as[Double].head()
    val merged = Sketches.hllEstimate(
        Sketches.hllMerge(Seq(
          Sketches.hllSketch(lo, "g", col("l_partkey")),
          Sketches.hllSketch(hi, "g", col("l_partkey"))), "g"), "g")
      .select("est_2dp").as[Double].head()
    assert(merged === whole) // register-max merge is lossless, not approximate
  }

  test("HLL ignores NULL keys (count-distinct semantics)") {
    import graft.operators.Sketches
    val withNulls = spark.range(0, 40)
      .select(lit("g").as("g"),
        when(col("id") % 2 === 0, col("id")).as("k")) // 20 non-null, 20 null
    val clean = spark.range(0, 40).filter(col("id") % 2 === 0)
      .select(lit("g").as("g"), col("id").as("k"))
    val a = Sketches.hllDistinct(withNulls, "g", col("k"))
      .select("est_2dp").as[Double].head()
    val b = Sketches.hllDistinct(clean, "g", col("k"))
      .select("est_2dp").as[Double].head()
    assert(a === b)
  }

  test("HLL small-range branch: tiny cardinalities stay near-exact") {
    import graft.operators.Sketches
    val small = spark.range(0, 40).select(lit("g").as("g"), col("id"))
    val est = Sketches.hllDistinct(small, "g", col("id"))
      .select("est_2dp").as[Double].head()
    // linear counting at V > 0 empty registers: tight for n << m
    assert(math.abs(est - 40.0) < 6.0, s"est=$est")
  }
}
