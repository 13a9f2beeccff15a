package graft

import org.apache.spark.sql.functions._
import graft.sources.Sinks

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned layout enables partition pruning (no data read)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Sinks.partitionedParquet(
      Tables.orders(spark, sfDir), dir, Seq("o_orderstatus"))
    // hive-style directories exist
    val sub = new java.io.File(dir).listFiles().map(_.getName).filter(_.contains("="))
    assert(sub.exists(_.startsWith("o_orderstatus=")))
    // a predicate on the partition column becomes a PartitionFilter
    val p = spark.read.parquet(dir)
      .filter($"o_orderstatus" === "F")
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"partition pruning missing:\n$p")
    // and the data still round-trips
    val n = spark.read.parquet(dir).filter($"o_orderstatus" === "F").count()
    val expected = Tables.orders(spark, sfDir).filter($"o_orderstatus" === "F").count()
    assert(n === expected)
  }

  test("jsonl and orc round-trip the documents table exactly") {
    val docs = Tables.documents(spark, sfDir)
    val jd = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    Sinks.writeJsonl(docs, jd)
    val backJ = Sinks.readJsonl(spark, jd, docs.schema)
    assert(backJ.schema === docs.schema)
    assert(backJ.exceptAll(docs).count() === 0 && docs.exceptAll(backJ).count() === 0)

    val od = java.nio.file.Files.createTempDirectory("graft-orc").toString
    Sinks.writeOrc(docs, od)
    val backO = Sinks.readOrc(spark, od)
    assert(backO.exceptAll(docs).count() === 0 && docs.exceptAll(backO).count() === 0)
    // ORC scans get predicate pushdown like parquet
    val p = backO.filter($"doc_id" === 42L).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("doc_id"), p)
  }

  test("jsonl audited read quarantines broken lines, keeps good ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.jsonl"),
      """{"doc_id": 1, "text": "good one"}
        |{"doc_id": 2, "text": "also good"}
        |{"doc_id": 3, "text": "truncated
        |not json at all
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val df = Sinks.readJsonlAudited(spark, dir, schema).cache()
    try {
      val good = df.filter($"_corrupt_record".isNull)
        .select("doc_id", "text").as[(Long, String)].collect().toSet
      val bad = df.filter($"_corrupt_record".isNotNull)
        .select("_corrupt_record").as[String].collect().toSet
      assert(good === Set((1L, "good one"), (2L, "also good")))
      assert(bad === Set("{\"doc_id\": 3, \"text\": \"truncated",
        "not json at all"))
    } finally df.unpersist()
  }

  test("z-ordered layout bounds per-file ranges on BOTH columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // uniform 64×64 grid: a single-column sort would give every file the
    // FULL range of the other column; z-order must bound both
    val grid = spark.range(4096)
      .select(($"id" % 64).cast("long").as("a"), ($"id" / 64).cast("long").as("b"))
    Sinks.zOrderedParquet(grid, dir, "a", "b", files = 8)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
      .select("ra", "rb").as[(Long, Long)].collect()
    assert(ranges.length >= 4)
    // a single-column sort pins one dim and leaves the other at the full
    // 0..63 range in EVERY file; z-order must bound both dims on average
    // (a file straddling a z-prefix boundary may span one dim — but then
    // it is tight in the other, so per-file min(ra, rb) stays small)
    val avgA = ranges.map(_._1).sum.toDouble / ranges.length
    val avgB = ranges.map(_._2).sum.toDouble / ranges.length
    assert(avgA <= 44 && avgB <= 44,
      s"average per-file range too wide: avgA=$avgA avgB=$avgB ${ranges.mkString(", ")}")
    assert(ranges.forall { case (ra, rb) => math.min(ra, rb) <= 40 },
      s"a file is wide in BOTH dims: ${ranges.mkString(", ")}")
    // and the data round-trips
    assert(spark.read.parquet(dir).count() === 4096)

    // degenerate inputs degrade to a plain write instead of failing
    val empty = java.nio.file.Files.createTempDirectory("graft-zorder-e").toString
    Sinks.zOrderedParquet(grid.filter(lit(false)), empty, "a", "b")
    assert(spark.read.parquet(empty).count() === 0)
    val nulls = java.nio.file.Files.createTempDirectory("graft-zorder-n").toString
    Sinks.zOrderedParquet(
      grid.withColumn("a", lit(null).cast("long")), nulls, "a", "b")
    assert(spark.read.parquet(nulls).count() === 4096)
  }

  test("range-sorted layout gives files disjoint min/max ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    Sinks.sortedParquet(Tables.orders(spark, sfDir), dir, "o_orderdate", 4)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"))
      .select("lo", "hi")
      .as[(java.sql.Timestamp, java.sql.Timestamp)].collect()
      .sortBy(_._1.getTime)
    assert(ranges.length >= 2)
    // each file's min is at or after the previous file's max → a predicate
    // on o_orderdate overlaps at most ceil(selectivity·files)+1 files
    ranges.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(!loB.before(hiA), s"overlapping file ranges: $hiA vs $loB")
    }
    assert(spark.read.parquet(dir).count() === Tables.orders(spark, sfDir).count())
  }

  test("co-bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // a killed earlier run can orphan the managed locations without catalog
    // entries — saveAsTable then refuses LOCATION_ALREADY_EXISTS
    for (t <- Seq("b_orders", "b_customer")) {
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Sinks.bucketedTable(Tables.orders(spark, sfDir), "b_orders", "o_custkey", 8)
    Sinks.bucketedTable(
      Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", "o_custkey", 8)
    // force the sort-merge path: broadcast would bypass the bucketed scan
    // on these tiny test tables (at warehouse scale both sides are huge —
    // the shuffle-free SMJ is exactly the case bucketing exists for)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(joined.count() ===
        Tables.orders(spark, sfDir).join(
          Tables.customer(spark, sfDir),
          col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
  }

  test("schema evolution: appended batches with a new column merge on read") {
    // append logs evolve — a reader must see the union schema with nulls
    // for pre-evolution rows, without rewriting history
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "payload")
      .write.mode("append").parquet(dir)
    Seq((2L, "b", 7.5)).toDF("id", "payload", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet === Set("id", "payload", "score"))
    val rows = merged.select("id", "score")
      .as[(Long, Option[Double])].collect().toMap
    assert(rows === Map(1L -> None, 2L -> Some(7.5)))
  }

  test("compact collapses a many-small-files table, content-preserving") {
    val src = java.nio.file.Files.createTempDirectory("graft-frag").toString
    val stage = src + "-compacted"
    // fragment the orders table into many tiny files (the append-heavy shape)
    val orders = Tables.orders(spark, sfDir)
    orders.repartition(64).write.mode("overwrite").parquet(src)
    def partFiles(d: String) =
      new java.io.File(d).listFiles().count(_.getName.startsWith("part-"))
    assert(partFiles(src) === 64)

    val n = Sinks.compact(spark, src, stage, targetRowsPerFile = orders.count())
    assert(n === orders.count())
    Sinks.swapDirs(spark, stage, src)
    assert(partFiles(src) <= 2, s"still ${partFiles(src)} files after compact")
    val back = spark.read.parquet(src)
    assert(back.exceptAll(orders).count() === 0 &&
      orders.exceptAll(back).count() === 0)
  }

  test("fileReport counts small files before compaction, none after") {
    val src = java.nio.file.Files.createTempDirectory("graft-rep").toString
    val orders = Tables.orders(spark, sfDir)
    orders.repartition(16).write.mode("overwrite").parquet(src)
    val before = Sinks.fileReport(spark, src).collect()(0)
    assert(before.getLong(0) === 16) // n_files
    assert(before.getLong(1) === orders.count()) // n_rows
    assert(before.getLong(6) === 16) // every file under the default 32 MB
    assert(before.getLong(3) <= before.getLong(5) &&
      before.getLong(5) <= before.getLong(4)) // min <= mean <= max
    val stage = src + "-c"
    Sinks.compact(spark, src, stage, targetRowsPerFile = orders.count())
    Sinks.swapDirs(spark, stage, src)
    val after = Sinks.fileReport(spark, src, smallBytes = 1024).collect()(0)
    assert(after.getLong(0) === 1 && after.getLong(6) === 0)
    assert(after.getLong(1) === orders.count())
  }

  test("appendBatchFileIdempotent delivers once under replay, twice for distinct batches") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-idem").toString + "/res"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.appendBatchFileIdempotent(b0, out, "probe-0.parquet")
    val snap = FileSnapshots.snapshot(out)
    // crash-replayed micro-batch: same deterministic file name → no-op
    Sinks.appendBatchFileIdempotent(b0, out, "probe-0.parquet")
    assert(FileSnapshots.snapshot(out) === snap, "replay duplicated the batch")
    assert(spark.read.parquet(out).count() === 2)
    // a distinct batch lands alongside
    Sinks.appendBatchFileIdempotent(Seq((3L, "c")).toDF("id", "v"),
      out, "probe-1.parquet")
    assert(spark.read.parquet(out).count() === 3)
    // no staging litter
    assert(!new java.io.File(out + "__staging_probe-0.parquet").exists())
  }

  test("upsertPartitions rewrites only touched partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pupsert").toString
    val base = Seq(
      (1L, "p0", 10, 0L), (2L, "p0", 20, 0L),
      (3L, "p1", 30, 0L), (4L, "p1", 40, 0L),
      (5L, "p2", 50, 0L)
    ).toDF("id", "part", "v", "version")
    Sinks.partitionedParquet(base, dir, Seq("part"))

    def listing(p: String): Set[String] = {
      val d = new java.io.File(p)
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.startsWith("part-"))
        .map(f => f.getName + ":" + f.lastModified()).toSet
    }
    val p0Before = listing(s"$dir/part=p0")
    val p2Before = listing(s"$dir/part=p2")

    // update one row in p1, insert a new key into p1, open new partition p3
    val updates = Seq(
      (3L, "p1", 31, 1L), (6L, "p1", 60, 1L), (7L, "p3", 70, 1L)
    ).toDF("id", "part", "v", "version")
    val touched = Sinks.upsertPartitions(spark, dir, updates, "part",
      keyCols = Seq("id"), versionCol = "version")
    assert(touched === Seq("p1", "p3"))

    // untouched partition directories: byte-identical file listings
    assert(listing(s"$dir/part=p0") === p0Before)
    assert(listing(s"$dir/part=p2") === p2Before)
    assert(!new java.io.File(dir + "__upsert_staging").exists())

    // full-table state equals the global merge
    val got = spark.read.parquet(dir)
      .select($"id", $"part", $"v", $"version").as[(Long, String, Int, Long)]
      .collect().toSet
    val want = graft.operators.Upsert.keepLatest(
        base.unionByName(updates), Seq("id"), "version")
      .as[(Long, String, Int, Long)].collect().toSet
    assert(got === want)
    assert(got.contains((3L, "p1", 31, 1L)) && got.contains((7L, "p3", 70, 1L)))
  }

  test("withDirLease: second writer fails fast; lease releases on exit and on error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease").toString + "/idx"
    var ran = 0
    Sinks.withDirLease(spark, dir, "writer-a") {
      ran += 1
      // the loser FAILS SAFE: loud exception, no partial mutation
      val e = intercept[Sinks.ConcurrentWriterException] {
        Sinks.withDirLease(spark, dir, "writer-b") { ran += 100 }
      }
      assert(e.getMessage.contains("writer-a"))
    }
    assert(ran === 1)
    // released on normal exit: a later writer acquires freely
    Sinks.withDirLease(spark, dir, "writer-c") { ran += 10 }
    assert(ran === 11)
    // released on exception too
    intercept[RuntimeException] {
      Sinks.withDirLease(spark, dir, "writer-d") { throw new RuntimeException("boom") }
    }
    Sinks.withDirLease(spark, dir, "writer-e") { ran += 10 }
    assert(ran === 21)
  }

  test("withDirLease: a stale lease from a dead writer is broken, a live one is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease2").toString + "/idx"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val lockDir = new org.apache.hadoop.fs.Path(dir + "__lock")
    fs.mkdirs(lockDir)
    val lease = new org.apache.hadoop.fs.Path(lockDir, Sinks.LeaseName)
    def plant(ageMs: Long): Unit = {
      fs.delete(lease, false)
      val out = fs.create(lease, false)
      out.write(s"dead-writer ${System.currentTimeMillis() - ageMs}\n".getBytes("UTF-8"))
      out.close()
    }
    // stale (older than staleMs): broken, body runs
    plant(ageMs = 60000)
    var ran = false
    Sinks.withDirLease(spark, dir, "writer-a", staleMs = 1000) { ran = true }
    assert(ran)
    // fresh (a LIVE peer): fail fast
    plant(ageMs = 0)
    intercept[Sinks.ConcurrentWriterException] {
      Sinks.withDirLease(spark, dir, "writer-b", staleMs = 60000) { fail("must not run") }
    }
  }
}
