package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.SalesClean

/** Property tests mirroring the reference simulator's null-injection law
  * (/root/reference/sales_data_simulator.py:43-68): for ANY dirty batch
  * drawn from that law, the clean pipeline restores the invariants.
  * Gen is driven directly with fixed seeds (the scalatest-scalacheck bridge
  * artifact isn't in the offline cache), which also makes failures
  * perfectly reproducible.
  */
class SalesPropertySpec extends SparkSpec {

  private def batches(n: Int, size: Int, g: Gen[(Int, String, Int, Int)]): Seq[List[(Int, String, Int, Int)]] =
    (1 to n).map { i =>
      Gen.listOfN(size, g).apply(Gen.Parameters.default, Seed(i.toLong)).get
    }

  private val products =
    Seq("Mobile Phones", "Laptops", "Tablets", "Smart Watches", "Headphones")

  /** One simulator row: (i, product, price, qty) → dirty row per the law:
    * i%5==0 → all-null measures; odd i → null qty, total = price·rand-ish
    * (here price·qty so imputation is exactly recoverable).
    */
  private val rowGen: Gen[(Int, String, Int, Int)] = for {
    i <- Gen.choose(0, 10000)
    p <- Gen.oneOf(products)
    price <- Gen.choose(500, 150000)
    qty <- Gen.choose(1, 10)
  } yield (i, p, price, qty)

  private def dirtyDf(rows: List[(Int, String, Int, Int)]): DataFrame = {
    val ts = Timestamp.valueOf("2023-06-01 10:00:00")
    val data = rows.map { case (i, p, price, qty) =>
      if (i % 5 == 0) Row(p, null, null, null, ts, ts)
      else if (i % 2 == 1)
        Row(p, price.toDouble, null, price.toDouble * qty, ts, ts)
      else Row(p, price.toDouble, qty: Integer, price.toDouble * qty, ts, ts)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), SalesClean.schema)
  }

  test("clean restores the invariants for any simulator-law batch") {
    for (rows <- batches(5, 60, rowGen)) {
      val in = dirtyDf(rows)
      val out = SalesClean.clean(in)
      val nAllNull = rows.count(_._1 % 5 == 0)
      // row count = input − all-null rows
      assert(out.count() === rows.length - nAllNull)
      // no null measures survive
      assert(out.filter(col("price").isNull || col("quantity").isNull ||
        col("total").isNull).count() === 0)
      // imputed quantity is exact: floor(price·qty / price) == qty
      val mismatched = out.filter(col("quantity") =!=
        floor(col("total") / col("price")).cast("int"))
      assert(mismatched.count() === 0)
    }
  }

  test("pipeline is idempotent on clean data") {
    for (rows <- batches(3, 40, rowGen)) {
      val once = SalesClean.cleanDeterministic(dirtyDf(rows))
      // feeding cleaned data back through F1→P2 changes nothing
      val twice = SalesClean.imputeTotal(SalesClean.imputeQuantity(
        SalesClean.dropAllNullMeasures(
          once.select(col("product"), col("price").cast("double"),
            col("quantity").cast("int"), col("total").cast("double"),
            col("ordered_at"), col("delivery_at")))))
      assert(once.count() === twice.count())
      assert(twice.filter(col("quantity").isNull || col("total").isNull)
        .count() === 0)
    }
  }
}
