package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md §B). All loads are plain parquet scans so Catalyst gets
  * pushdown + pruning for free; no caching here — callers decide.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `documents` plus deterministic exact clones: every 50th doc re-keyed to
    * doc_id + 150000. The fixture corpus has no exact duplicates, so the
    * collapse behavior of exact-dedup operators would pass vacuously on it;
    * this derivation gives them positive cases. 150000 ≡ 0 (mod 3, 4, 8,
    * 50), so every doc_id-mod-derived attribute (e.g. the multimodal asset
    * kind/width/height) is identical between clone and original, and the
    * offset is far above any fixture doc_id. SQL twin:
    * [[DedupQueries.clonedDocsCte]].
    */
  def documentsWithClones(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
    d.unionByName(d.filter(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + 150000L))
  }

  /** events.parquet carries TIMESTAMP(NANOS); normalized here so downstream
    * operators always see a micros TimestampType `ts` column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // session read nanos as long (spark.sql.legacy.parquet.nanosAsLong);
        // integer `div`, not `/` — double division loses ulps at 1e18 nanos
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
