package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sales-fact fixture derived from `lineitem`, mirroring the
  * reference's source contract (schema: /root/reference/scripts/process_sales.py:25-32;
  * value + null-injection law: /root/reference/sales_data_simulator.py:43-68).
  *
  * Why derived instead of generated: the DuckDB oracle must see the exact
  * same input, so the derivation is expressed twice — once as a DataFrame
  * transform here, once as the SQL CTE in [[oracleCte]] — and both are pure
  * functions of `lineitem`.
  *
  * Null-injection law (FIXTURES.md §A, keyed on k = l_orderkey*10 + l_linenumber):
  *   - k % 5 == 0            → price, quantity, total ALL NULL  (dropped by F1)
  *   - else k % 2 == 1       → quantity NULL                    (imputed by P1)
  *   - else k % 7 == 3       → total NULL                       (imputed by P2)
  *
  * All arithmetic is integer-valued doubles (price = floor(l_extendedprice),
  * total = price * quantity) so Spark and DuckDB agree bit-for-bit.
  */
object SalesFixture {

  private val products =
    Seq("Mobile Phones", "Laptops", "Tablets", "Smart Watches", "Headphones")

  /** The dirty sales table, schema (product STRING, price DOUBLE,
    * quantity INT, total DOUBLE, ordered_at TIMESTAMP, delivery_at TIMESTAMP).
    */
  def fromLineitem(spark: SparkSession, dir: String): DataFrame =
    dirty(Tables.lineitem(spark, dir))

  def dirty(lineitem: DataFrame): DataFrame = {
    val k = col("l_orderkey") * 10 + col("l_linenumber")
    val allNull = k % 5 === 0
    val qtyNull = k % 2 === 1
    val totNull = k % 7 === 3
    val price = floor(col("l_extendedprice")).cast("double")
    val qty = floor(col("l_quantity")).cast("int")
    val product = element_at(
      array(products.map(lit): _*), (col("l_partkey") % 5).cast("int") + 1)
    lineitem.select(
      product.as("product"),
      when(allNull, lit(null)).otherwise(price).as("price"),
      when(allNull || qtyNull, lit(null)).otherwise(qty).as("quantity"),
      when(allNull || (!qtyNull && totNull), lit(null))
        .otherwise(price * qty).as("total"),
      col("l_shipdate").as("ordered_at"),
      expr("timestampadd(DAY, CAST((l_orderkey*10 + l_linenumber) % 11 AS INT), l_shipdate)")
        .as("delivery_at"),
      k.as("sales_id") // stable row id, used only for deterministic ordering
    )
  }

  /** DuckDB twin of [[dirty]]; prepend to any sales oracle query. */
  val oracleCte: String =
    """WITH sales AS (
      |  SELECT
      |    CASE l_partkey % 5
      |      WHEN 0 THEN 'Mobile Phones' WHEN 1 THEN 'Laptops'
      |      WHEN 2 THEN 'Tablets' WHEN 3 THEN 'Smart Watches'
      |      ELSE 'Headphones' END AS product,
      |    CASE WHEN (l_orderkey*10 + l_linenumber) % 5 = 0 THEN NULL
      |         ELSE CAST(FLOOR(l_extendedprice) AS DOUBLE) END AS price,
      |    CASE WHEN (l_orderkey*10 + l_linenumber) % 5 = 0 THEN NULL
      |         WHEN (l_orderkey*10 + l_linenumber) % 2 = 1 THEN NULL
      |         ELSE CAST(FLOOR(l_quantity) AS INT) END AS quantity,
      |    CASE WHEN (l_orderkey*10 + l_linenumber) % 5 = 0 THEN NULL
      |         WHEN (l_orderkey*10 + l_linenumber) % 2 <> 1
      |              AND (l_orderkey*10 + l_linenumber) % 7 = 3 THEN NULL
      |         ELSE CAST(FLOOR(l_extendedprice) AS DOUBLE)
      |              * CAST(FLOOR(l_quantity) AS INT) END AS total,
      |    l_shipdate AS ordered_at,
      |    l_shipdate + INTERVAL 1 DAY * CAST((l_orderkey*10 + l_linenumber) % 11 AS INT) AS delivery_at,
      |    l_orderkey*10 + l_linenumber AS sales_id
      |  FROM lineitem
      |)""".stripMargin
}
