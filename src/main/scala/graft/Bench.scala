package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":"total","value":sec,...,"queries":{name:sec}}.
  *
  * Each query is materialized with a noop-format write — unlike count(),
  * that defeats Catalyst's column pruning, so derived columns (imputations,
  * signatures, scores) are actually computed, like a real sink would.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: pay one-time session costs (codegen compiler, noop sink
    // registration, parquet footer reads) before the clock starts, so the
    // alphabetically-first query isn't charged ~5s of constant overhead.
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // a failed query must NOT masquerade as a fast success — record it
        // in the JSON "errors" list so regressions surface in bench history
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      // queries persist() intermediates (signature tables, inverted
      // indexes); drop them so one query's cache doesn't GC-tax the next
      CacheScope.global.release()
      spark.catalog.clearCache()
      t
    }
    // two passes, min per query: absorbs JIT warmup and host-level noise —
    // the metric is steady-state throughput, not first-run latency
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1 = ordered.map { case (n, fn) => n -> timeOnce(n, fn) }
    val results = ordered.map { case (n, fn) =>
      n -> math.min(pass1.toMap.apply(n), timeOnce(n, fn))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
