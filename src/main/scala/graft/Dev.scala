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
      // dev loop: show named queries (e.g. `runMain graft.Dev q1_agg`) at
      // the Bench-convention dir, overridable via SPARK_GRAFT_SF_DIR
      val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
      args.foreach { name =>
        val q = SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query '$name'; valid names:\n  " +
            SparkEntry.queries.keys.toSeq.sorted.mkString("\n  ")))
        println(s"=== $name ===")
        q(spark, dir).show(30, truncate = false)
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
