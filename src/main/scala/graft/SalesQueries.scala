package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.SalesFixture
import graft.operators.SalesClean

/** Sales-parity queries: one per SURVEY.md §2 operator row (S1/F1/P1/P2/P4),
  * each with a DuckDB oracle twin over the same lineitem-derived fixture.
  */
object SalesQueries {
  import SalesFixture.oracleCte

  private def sales(s: SparkSession, dir: String): DataFrame =
    SalesFixture.fromLineitem(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1-analog: the dirty source itself (scan + derive projection).
    "sales_source" -> ((s, dir) => sales(s, dir).orderBy("sales_id")),

    // F1: null-triple drop filter.
    "sales_filter_nulls" -> ((s, dir) =>
      SalesClean.dropAllNullMeasures(sales(s, dir)).orderBy("sales_id")),

    // P1: quantity imputation (cast long→int to pin a cross-engine type).
    "sales_impute_quantity" -> ((s, dir) =>
      SalesClean.imputeQuantity(SalesClean.dropAllNullMeasures(sales(s, dir)))
        .select(col("sales_id"), col("product"), col("price"),
          col("quantity").cast("int").as("quantity"), col("total"))
        .orderBy("sales_id")),

    // P2: total imputation (runs after P1, uses the imputed quantity).
    "sales_impute_total" -> ((s, dir) =>
      SalesClean.imputeTotal(SalesClean.imputeQuantity(
          SalesClean.dropAllNullMeasures(sales(s, dir))))
        .select(col("sales_id"), col("product"), col("price"),
          col("quantity").cast("int").as("quantity"), col("total"))
        .orderBy("sales_id")),

    // F1→P1→P2→P4 (full clean minus the wall-clock processed_at).
    "sales_clean" -> ((s, dir) => {
      val d = SalesClean.imputeTotal(SalesClean.imputeQuantity(
        SalesClean.dropAllNullMeasures(sales(s, dir))))
      d.select(col("sales_id"), col("product"),
          col("price").cast("float").as("price"),
          col("quantity").cast("int").as("quantity"),
          col("total").cast("float").as("total"),
          col("ordered_at"), col("delivery_at"))
        .orderBy("sales_id")
    }),

    // P3+P4 full pipeline incl. processed_at — no oracle (wall-clock column),
    // driver records a rows-only check.
    "sales_clean_full" -> ((s, dir) => SalesClean.clean(sales(s, dir))),

    // S1 end-to-end through the ACTUAL CSV entry point (header + explicit
    // schema + PERMISSIVE empty-cell nulls) over a committed fixture, then
    // F1→P1→P2→P4 — the reference job's true front door, oracle-checked
    // via DuckDB read_csv on the same file. ordered_at is unique per row
    // by construction, so it is the deterministic sort key.
    "sales_clean_csv" -> ((s, _) =>
      SalesClean.cleanDeterministic(
        SalesClean.readCsv(s, "/root/repo/fixtures/sales_dirty.csv"))
        .orderBy("ordered_at")),

    // Per-product rollup of the cleaned table: exercises groupBy over the
    // cleaned output (decimal-sum for cross-engine determinism).
    "sales_by_product" -> ((s, dir) => {
      val d = SalesClean.imputeTotal(SalesClean.imputeQuantity(
        SalesClean.dropAllNullMeasures(sales(s, dir))))
      d.groupBy("product").agg(
          count(lit(1)).as("n_sales"),
          sum(col("quantity").cast("long")).as("sum_quantity"),
          sum(col("total").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("product")
    })
  )

  val oracle: Map[String, String] = Map(
    "sales_source" ->
      s"""$oracleCte
         |SELECT product, price, quantity, total, ordered_at, delivery_at, sales_id
         |FROM sales ORDER BY sales_id""".stripMargin,

    "sales_filter_nulls" ->
      s"""$oracleCte
         |SELECT product, price, quantity, total, ordered_at, delivery_at, sales_id
         |FROM sales
         |WHERE NOT (quantity IS NULL AND price IS NULL AND total IS NULL)
         |ORDER BY sales_id""".stripMargin,

    "sales_impute_quantity" ->
      s"""$oracleCte
         |SELECT sales_id, product, price,
         |  CAST(CASE WHEN quantity IS NULL THEN FLOOR(total / price)
         |            ELSE quantity END AS INT) AS quantity,
         |  total
         |FROM sales
         |WHERE NOT (quantity IS NULL AND price IS NULL AND total IS NULL)
         |ORDER BY sales_id""".stripMargin,

    "sales_impute_total" ->
      s"""$oracleCte,
         |p1 AS (
         |  SELECT sales_id, product, price,
         |    CAST(CASE WHEN quantity IS NULL THEN FLOOR(total / price)
         |              ELSE quantity END AS INT) AS quantity,
         |    total
         |  FROM sales
         |  WHERE NOT (quantity IS NULL AND price IS NULL AND total IS NULL))
         |SELECT sales_id, product, price, quantity,
         |  CASE WHEN total IS NULL THEN ROUND(price * quantity, 2)
         |       ELSE total END AS total
         |FROM p1 ORDER BY sales_id""".stripMargin,

    "sales_clean" ->
      s"""$oracleCte,
         |p1 AS (
         |  SELECT sales_id, product, price,
         |    CAST(CASE WHEN quantity IS NULL THEN FLOOR(total / price)
         |              ELSE quantity END AS INT) AS quantity,
         |    total, ordered_at, delivery_at
         |  FROM sales
         |  WHERE NOT (quantity IS NULL AND price IS NULL AND total IS NULL))
         |SELECT sales_id, product,
         |  CAST(price AS REAL) AS price, quantity,
         |  CAST(CASE WHEN total IS NULL THEN ROUND(price * quantity, 2)
         |            ELSE total END AS REAL) AS total,
         |  ordered_at, delivery_at
         |FROM p1 ORDER BY sales_id""".stripMargin,

    "sales_clean_csv" ->
      """WITH src AS (
        |  SELECT * FROM read_csv('/root/repo/fixtures/sales_dirty.csv',
        |    header=true,
        |    columns={'product':'VARCHAR','price':'DOUBLE','quantity':'INTEGER',
        |             'total':'DOUBLE','ordered_at':'TIMESTAMP','delivery_at':'TIMESTAMP'})),
        |p1 AS (
        |  SELECT product, price,
        |    CAST(CASE WHEN quantity IS NULL THEN FLOOR(total / price)
        |              ELSE quantity END AS INT) AS quantity,
        |    total, ordered_at, delivery_at
        |  FROM src
        |  WHERE NOT (quantity IS NULL AND price IS NULL AND total IS NULL))
        |SELECT product, CAST(price AS REAL) AS price, quantity,
        |  CAST(CASE WHEN total IS NULL THEN ROUND(price * quantity, 2)
        |            ELSE total END AS REAL) AS total,
        |  ordered_at, delivery_at
        |FROM p1 ORDER BY ordered_at""".stripMargin,

    "sales_by_product" ->
      s"""$oracleCte,
         |p1 AS (
         |  SELECT product, price,
         |    CAST(CASE WHEN quantity IS NULL THEN FLOOR(total / price)
         |              ELSE quantity END AS INT) AS quantity,
         |    total
         |  FROM sales
         |  WHERE NOT (quantity IS NULL AND price IS NULL AND total IS NULL)),
         |p2 AS (
         |  SELECT product, quantity,
         |    CASE WHEN total IS NULL THEN ROUND(price * quantity, 2)
         |         ELSE total END AS total
         |  FROM p1)
         |SELECT product, COUNT(*) AS n_sales,
         |  CAST(SUM(CAST(quantity AS BIGINT)) AS BIGINT) AS sum_quantity,
         |  CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM p2 GROUP BY product ORDER BY product""".stripMargin
  )
}
