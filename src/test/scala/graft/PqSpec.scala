package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("codebook training is deterministic across partitionings") {
    // the integer-grid Lloyd contract, per subspace: no float mean anywhere,
    // so two trainings over different partitionings are byte-identical
    val a = Pq.trainCodebooks(emb, 8, 16)
    val b = Pq.trainCodebooks(emb.repartition(7), 8, 16)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.map(_._1).toSeq === y.map(_._1).toSeq)
      assert(x.zip(y).forall { case ((_, p), (_, q)) => p.toSeq == q.toSeq })
    }
  }

  test("codes table is m small ints per vector (the compressed index)") {
    val model = Pq.buildIndex(sfDir + "#spec", emb)
    val codes = spark.read.parquet(model.codesPath)
    assert(codes.count() === emb.count())
    val rows = codes.select("codes").as[Seq[Int]].collect()
    assert(rows.forall(_.length === 8))
    assert(rows.forall(_.forall(c => c >= 0 && c < 16)))
  }

  test("code append keeps existing files byte-identical and equals a frozen re-encode") {
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val batch = emb.filter($"vec_id" % 5 === 0)
    val model = Pq.buildIndex(sfDir + "#appendspec", base)
    val before = FileSnapshots.snapshot(model.codesPath)
    Pq.appendToIndex(model, batch)
    val after = FileSnapshots.snapshot(model.codesPath)
    before.foreach { case (p, sig) =>
      assert(after.get(p).contains(sig), s"pre-existing file changed: $p")
    }
    assert((after.keySet -- before.keySet).nonEmpty)
    // stored codes == encoding the union with the frozen codebooks
    val stored = spark.read.parquet(model.codesPath)
    val expected = Pq.encode(model, emb)
    assert(stored.exceptAll(expected).isEmpty, "stored has codes a fresh encode lacks")
    assert(expected.exceptAll(stored).isEmpty, "fresh encode has codes the stored table lacks")
  }

  test("full-rerank probe over an incrementally-built codes table equals brute force") {
    // rerank ≥ corpus size makes the ADC pass a pure candidate enumerator:
    // the exact re-rank then equals brute force IFF the appended table is
    // complete and correct
    val model = Pq.buildIncremental(sfDir + "#appendspec2",
      emb.filter($"vec_id" % 5 =!= 0), emb.filter($"vec_id" % 5 === 0))
    val exact = Similarity.topK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSeq
    val got = Pq.probe(model, emb, 0L, 10, rerank = emb.count().toInt + 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === exact)
  }

  test("idempotent code append: replaying a batch is a no-op, new batches land") {
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val model = Pq.buildIndex(sfDir + "#idemspec", base)
    val b1 = emb.filter($"vec_id" % 5 === 0 && $"vec_id" % 2 === 0)
    val b2 = emb.filter($"vec_id" % 5 === 0 && $"vec_id" % 2 =!= 0)
    Pq.appendToIndexIdempotent(model, b1, batchId = 0L)
    val afterOnce = FileSnapshots.snapshot(model.codesPath)
    Pq.appendToIndexIdempotent(model, b1, batchId = 0L)
    assert(FileSnapshots.snapshot(model.codesPath) === afterOnce)
    Pq.appendToIndexIdempotent(model, b2, batchId = 1L)
    val stored = spark.read.parquet(model.codesPath)
    val expected = Pq.encode(model, emb)
    assert(stored.exceptAll(expected).isEmpty)
    assert(expected.exceptAll(stored).isEmpty)
  }

  test("compactCodes folds ingest files; replayed batch stays a no-op via manifest") {
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val model = Pq.buildIndex(sfDir + "#compactspec", base)
    val b1 = emb.filter($"vec_id" % 5 === 0)
    Pq.appendToIndexIdempotent(model, b1, batchId = 7L)
    val nBefore = spark.read.parquet(model.codesPath).count()
    Pq.compactCodes(spark, model, targetRowsPerFile = 1000000L)
    val snap = FileSnapshots.snapshot(model.codesPath)
    assert(snap.keys.forall(!_.contains("codes-ingest-7")),
      "marker file should be folded away")
    Pq.appendToIndexIdempotent(model, b1, batchId = 7L) // crash replay
    assert(FileSnapshots.snapshot(model.codesPath) === snap,
      "replayed batch re-appended after compactCodes")
    assert(spark.read.parquet(model.codesPath).count() === nBefore)
  }

  test("probeAll equals the single-query probe for every query") {
    val model = Pq.buildIndex(sfDir, emb)
    val all = Pq.probeAll(model, emb, emb.filter($"vec_id" < 5), 10)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    (0L until 5L).foreach { qid =>
      val single = Pq.probe(model, emb, qid, 10)
        .as[(Long, Double)].collect().toSet
      assert(all(qid) === single, s"query $qid diverged")
    }
  }

  test("deleteFromIndex masks the ADC ranking; compactCodes drops physically") {
    val model = Pq.buildIndex(sfDir + "#delspec", emb)
    val before = FileSnapshots.snapshot(model.codesPath)
    Pq.deleteFromIndex(model,
      emb.filter($"vec_id" % 7 === 3).select("vec_id"), batchId = 0L)
    assert(FileSnapshots.snapshot(model.codesPath) === before,
      "delete must not touch the codes table")
    val got = Pq.probe(model, emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(got.forall(_ % 7 != 3), "deleted ids still probed")
    val pBefore = Pq.probe(model, emb, 0L, 10).as[(Long, Double)].collect().toSeq
    Pq.compactCodes(spark, model)
    assert(!new java.io.File(model.codesPath + "__tombstones").exists())
    assert(spark.read.parquet(model.codesPath)
      .filter($"vec_id" % 7 === 3).count() === 0)
    assert(Pq.probe(model, emb, 0L, 10)
      .as[(Long, Double)].collect().toSeq === pBefore)
  }

  test("persisted codebooks round-trip exactly and survive compaction") {
    val model = Pq.buildIndex(sfDir + "#persist", emb)
    val loaded = Pq.loadModel(spark, model.codesPath).get
    assert(loaded.m === model.m && loaded.ksub === model.ksub &&
      loaded.subDim === model.subDim)
    assert(loaded.codebooks.length === model.codebooks.length)
    loaded.codebooks.zip(model.codebooks).foreach { case (a, b) =>
      assert(a.map(_._1).toSeq === b.map(_._1).toSeq)
      assert(a.zip(b).forall { case ((_, x), (_, y)) => x.toSeq == y.toSeq })
    }
    val p = Pq.probe(model, emb, 0L, 10).as[(Long, Double)].collect().toSeq
    assert(Pq.probe(loaded, emb, 0L, 10)
      .as[(Long, Double)].collect().toSeq === p)
    // compactCodes swaps the whole dir — the codebooks must come back
    Pq.compactCodes(spark, model)
    assert(Pq.loadModel(spark, model.codesPath).nonEmpty,
      "codebooks lost across compaction swap")
  }

  test("ADC + exact rerank keeps useful recall vs exact top-k") {
    val exact = Similarity.topK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val pq = Pq.topKPq(emb, 0L, 10, indexKey = sfDir + "#spec")
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall@10 was $recall")
  }
}
