package graft

import org.apache.spark.sql.SparkSession

/** Pure-SQL surface for the operator registry — the bootstrap that makes
  * the engine drivable from a SQL-only session (spark-sql, a JDBC
  * notebook, `spark.sql(...)` scripts) instead of only the Scala API:
  *
  *   graft.GraftSql.register(spark, "/data/sf0.1")
  *   spark.sql("SELECT * FROM graft_dedup_minhash_lsh")
  *
  * Each fixture table registers under its own name and every registry
  * query under `graft_<name>` as a temp view over the query's logical
  * plan — views are LAZY (nothing executes until selected), so
  * registration costs only plan construction. The exceptions are the
  * index-backed `ann_*` queries, whose CONSTRUCTION already trains/
  * materializes the memoized index (and for the delete queries, applies
  * the tombstone batch) — registering those pays the build once, exactly
  * as the Scala API does. Pair with [[GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`) to also get the native
  * kernels (`vec_dot`, `simhash64`, `minhash_sig`, …) as SQL functions.
  */
object GraftSql {

  /** Register fixture tables + the chosen registry queries (default: all)
    * as temp views; returns the created view names.
    */
  def register(spark: SparkSession, dir: String,
               queries: Seq[String] = SparkEntry.queries.keys.toSeq): Seq[String] = {
    Tables.names.foreach { t =>
      try Tables.load(spark, dir, t).createOrReplaceTempView(t)
      catch { case _: Throwable => () } // missing optional fixture table
    }
    queries.sorted.map { name =>
      require(SparkEntry.queries.contains(name), s"unknown query: $name")
      val view = s"graft_$name"
      SparkEntry.queries(name)(spark, dir).createOrReplaceTempView(view)
      view
    }
  }
}
