package graft

class GraftSqlSpec extends SparkSpec {

  test("registry queries round-trip through the pure-SQL surface") {
    // four flagship ops across families: relational agg, exact dedup,
    // text scoring, mixture curation — a SQL-only session must see
    // byte-identical results to the Scala API
    val names = Seq("q1_agg", "dedup_exact", "text_quality", "cur_mixture")
    val views = GraftSql.register(spark, sfDir, names)
    assert(views === names.sorted.map("graft_" + _))
    names.foreach { n =>
      val viaSql = spark.sql(s"SELECT * FROM graft_$n")
      val viaApi = SparkEntry.queries(n)(spark, sfDir)
      assert(viaSql.columns.toSeq === viaApi.columns.toSeq, s"$n schema")
      assert(viaSql.exceptAll(viaApi).isEmpty &&
        viaApi.exceptAll(viaSql).isEmpty, s"$n rows diverge via SQL")
    }
    // the fixture tables registered too: plain SQL over them works and
    // can use the injected native kernels (GraftExtensions is on in specs)
    val cnt = spark.sql(
      "SELECT COUNT(*) FROM documents WHERE simhash64(transform(" +
        "split(text, ' '), t -> xxhash64(t))) IS NOT NULL").collect()(0).getLong(0)
    assert(cnt === spark.table("documents").count())
  }

  test("register rejects unknown query names loudly") {
    val e = intercept[IllegalArgumentException] {
      GraftSql.register(spark, sfDir, Seq("no_such_query"))
    }
    assert(e.getMessage.contains("no_such_query"))
  }
}
