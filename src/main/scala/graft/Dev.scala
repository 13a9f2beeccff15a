package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for local exploration; not part of the library contract. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.nonEmpty) {
      // dev loop: show named queries at sf0.01 (e.g. `runMain graft.Dev q1_agg`)
      args.foreach { name =>
        println(s"=== $name ===")
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
          .show(30, truncate = false)
      }
    } else {
      val entry = SparkEntry.entry(spark)
      println(s"ENTRY rows=${entry.count()}")
      entry.show(3, truncate = false)
      println(s"QUERIES n=${SparkEntry.queries.size} ORACLE n=${SparkEntry.oracleSql.size}")
    }
    spark.stop()
  }
}
