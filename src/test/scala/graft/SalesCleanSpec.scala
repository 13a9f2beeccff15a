package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.SalesClean
import graft.sources.SalesFixture

class SalesCleanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Hand-built dirty rows covering every null class of the contract. */
  private def fixture: DataFrame = {
    val rows = Seq(
      // (product, price, quantity, total, ordered_at, delivery_at)
      Row("Laptops", 50000.0, 2: Integer, 100000.0, ts("2023-01-01 00:00:00"), ts("2023-01-03 00:00:00")),
      Row("Tablets", null, null, null, ts("2023-02-01 00:00:00"), ts("2023-02-05 00:00:00")), // all-null → dropped
      Row("Headphones", 2000.0, null, 6500.5, ts("2023-03-01 00:00:00"), ts("2023-03-02 00:00:00")), // qty → floor(6500.5/2000)=3
      Row("Mobile Phones", 10000.0, 3: Integer, null, ts("2023-04-01 00:00:00"), ts("2023-04-08 00:00:00")), // total → 30000.00
      Row("Smart Watches", 1234.567, 2: Integer, null, ts("2023-05-01 00:00:00"), ts("2023-05-04 00:00:00"))) // total → 2469.13 (HALF_UP)
    spark.createDataFrame(spark.sparkContext.parallelize(rows), SalesClean.schema)
  }

  test("F1 drops only all-null-measure rows") {
    val out = SalesClean.dropAllNullMeasures(fixture)
    assert(out.count() === 4)
    assert(out.filter($"product" === "Tablets").count() === 0)
  }

  test("P1 imputes quantity as floor(total/price), keeps non-null values") {
    val out = SalesClean.imputeQuantity(SalesClean.dropAllNullMeasures(fixture))
      .select($"product", $"quantity".cast("int"))
      .as[(String, Int)].collect().toMap
    assert(out("Headphones") === 3)
    assert(out("Laptops") === 2)
  }

  test("P2 imputes total as round(price*quantity, 2) with HALF_UP") {
    val out = SalesClean.imputeTotal(SalesClean.imputeQuantity(
        SalesClean.dropAllNullMeasures(fixture)))
      .select($"product", $"total").as[(String, Double)].collect().toMap
    assert(out("Mobile Phones") === 30000.0)
    assert(out("Smart Watches") === 2469.13) // 2469.134 → 2469.13
    assert(out("Headphones") === 6500.5) // untouched
  }

  test("round is HALF_UP at the .005 boundary") {
    val r = spark.sql("SELECT round(CAST(2.005 AS DECIMAL(10,3)), 2) AS r")
      .as[java.math.BigDecimal].head()
    assert(r.doubleValue() === 2.01)
  }

  test("P4 narrows to the BigQuery-shaped 7-column schema") {
    val out = SalesClean.clean(fixture)
    val fields = out.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(out.columns.toSeq === Seq("product", "price", "quantity", "total",
      "ordered_at", "delivery_at", "processed_at"))
    assert(fields("price") === "float")
    assert(fields("total") === "float")
    assert(fields("quantity") === "integer")
    assert(fields("processed_at") === "timestamp")
    assert(out.count() === 4)
    assert(out.filter($"processed_at".isNull).count() === 0)
  }

  test("P1 null propagation: total/price with null price stays null") {
    val rows = Seq(Row("X", null, null, 100.0,
      ts("2023-01-01 00:00:00"), ts("2023-01-02 00:00:00")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), SalesClean.schema)
    val out = SalesClean.imputeQuantity(SalesClean.dropAllNullMeasures(df))
    assert(out.count() === 1) // partial-null row passes F1
    assert(out.filter($"quantity".isNull).count() === 1) // NULL/NULL → NULL
  }

  test("fixture null-injection law holds on testdata") {
    val s = SalesFixture.fromLineitem(spark, sfDir)
    val k = col("sales_id")
    // k%5==0 → all three measures null
    assert(s.filter(k % 5 === 0 &&
      !($"price".isNull && $"quantity".isNull && $"total".isNull)).count() === 0)
    // non-dropped, even k, k%7!=3 → fully populated
    assert(s.filter(k % 5 =!= 0 && k % 2 === 0 && k % 7 =!= 3 &&
      ($"price".isNull || $"quantity".isNull || $"total".isNull)).count() === 0)
    // imputation is exact on the fixture: floor(total/price) == original qty
    val cleaned = SalesClean.imputeQuantity(SalesClean.dropAllNullMeasures(s))
    val bad = cleaned.filter($"total".isNotNull && $"price".isNotNull &&
      $"quantity" =!= floor($"total" / $"price"))
    assert(bad.count() === 0)
  }

  test("end-to-end clean row count = input minus all-null rows") {
    val s = SalesFixture.fromLineitem(spark, sfDir)
    val allNull = s.filter($"price".isNull && $"quantity".isNull && $"total".isNull).count()
    assert(SalesClean.clean(s).count() === s.count() - allNull)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("typed Dataset view: Options carry the null-injection law") {
    val ds = SalesClean.typed(
      graft.sources.SalesFixture.fromLineitem(spark, sfDir)
        .drop("sales_id"))
    val rows = ds.collect()
    assert(rows.nonEmpty)
    // all-null-measure rows surface as all-None; partial rows as Some
    assert(rows.exists(r =>
      r.price.isEmpty && r.quantity.isEmpty && r.total.isEmpty))
    assert(rows.exists(r => r.price.isDefined && r.quantity.isEmpty))
    rows.foreach { r =>
      assert(r.product != null && r.ordered_at != null)
      // fixture law: fully-present rows satisfy total = price * quantity
      for (p <- r.price; q <- r.quantity; t <- r.total)
        assert(t === p * q, s"$r")
    }
  }
}
