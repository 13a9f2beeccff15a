package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** IVF (inverted-file) approximate nearest neighbor over `embeddings` —
  * the centroid-bucketed scale path, complementing the hyperplane LSH in
  * [[Similarity]]:
  *
  *  1. BUILD ([[buildIndex]]): train a coarse quantizer — `nlist` centroids,
  *     hash-seeded deterministically, refined with Lloyd iterations run as
  *     DataFrame aggregations (each iteration: one argmin projection + one
  *     shuffle of (centroid, dim, value) triples — linear in corpus size);
  *  2. assign every vector to its nearest centroid (pure per-row argmin,
  *     no shuffle — the "inverted lists");
  *  3. PROBE ([[probe]]): rank centroids by cosine to the query, scan only
  *     the top `nprobe` lists, exact re-rank of the candidates.
  *
  * Build and probe are split, as in a real IVF deployment: training runs
  * once per corpus and the resulting [[IvfModel]] (nlist × dim doubles —
  * centroid-sized, NOT corpus-sized) is reused across queries via
  * [[buildIndex]]'s memo. Collecting the quantizer to the driver is the IVF
  * contract: the coarse index must be broadcast-small; the corpus itself
  * never leaves executors (at warehouse scale the list assignment would
  * additionally be written out as a `list`-partitioned table so probes scan
  * only the probed files). At nprobe = nlist the search is exhaustive and
  * equals the brute-force result exactly (asserted in IvfSpec).
  */
object Ivf {

  /** Trained coarse quantizer: (centroidId, unit-normalized centroid). */
  final case class IvfModel(nlist: Int, iters: Int,
                            centroids: Array[(Int, Array[Double])])

  /** L2-normalized copy of an embedding column (cosine ⇒ dot on these). */
  private def normalized(v: Column): Column =
    transform(v, x => x.cast("double") / VectorOps.norm(v))

  /** Deterministic centroid training. Seeds are the per-bucket min-vec_id
    * vectors (bucket = xxhash64(vec_id) mod nlist), then `iters` Lloyd
    * steps. Returns (centroidId, unit-normalized centroid), driver-side.
    */
  def trainCentroids(embeddings: DataFrame, nlist: Int, iters: Int = 2): Array[(Int, Array[Double])] = {
    // persist: seeds + each Lloyd iteration re-scan this — without it the
    // parquet scan and the per-row normalization run iters+1 times
    val emb = embeddings.select(col("vec_id"), normalized(col("embedding")).as("e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // min_by keeps the min-vec_id vector per bucket in ONE aggregation —
    // no second scan + join to fetch the seed vectors back
    var cents: Array[(Int, Array[Double])] = emb
      .groupBy(pmod(xxhash64(col("vec_id")), lit(nlist)).cast("int").as("bucket"))
      .agg(min_by(col("e"), col("vec_id")).as("e"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

    for (_ <- 1 to iters) {
      // assign + per-dimension mean: one shuffle of (cid, dim, v) triples,
      // collected directly as nlist × dim rows (driver-side reassembly
      // avoids a second shuffle into per-cid maps)
      val sums = emb.withColumn("cid", assignUdfFree(col("e"), cents))
        .select(col("cid"), posexplode(col("e")).as(Seq("dim", "v")))
        .groupBy("cid", "dim").agg(avg("v").as("m"))
        .collect()
      cents = sums.groupBy(_.getInt(0)).toArray.map { case (cid, rows) =>
        val arr = new Array[Double](rows.map(_.getInt(1)).max + 1)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        val nrm = math.sqrt(arr.map(x => x * x).sum)
        (cid, if (nrm == 0.0) arr else arr.map(_ / nrm))
      }.sortBy(_._1)
    }
    emb.unpersist()
    cents
  }

  /** Per-row argmin centroid id as a pure expression: array of
    * (−cosine, cid) structs → array_min → cid. Each dot is the codegen
    * [[graft.plans.VecDot]] kernel; nlist dots per row, no shuffle.
    */
  private def assignUdfFree(unitVec: Column, cents: Array[(Int, Array[Double])]): Column = {
    val entries = cents.map { case (cid, c) =>
      struct((lit(0.0) - graft.plans.NativeKernels.vecDot(
        unitVec, array(c.toIndexedSeq.map(lit(_)): _*))).as("negdot"),
        lit(cid).as("cid"))
    }
    array_min(array(entries.toIndexedSeq: _*)).getField("cid")
  }

  /** (vec_id, embedding, list) — the inverted-list assignment, one narrow
    * pass. Persist/write this in practice; queries only filter it.
    */
  def index(embeddings: DataFrame, cents: Array[(Int, Array[Double])]): DataFrame =
    embeddings.withColumn("list",
      assignUdfFree(normalized(col("embedding")), cents))

  private val models =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), IvfModel]()

  /** Index BUILD, memoized per (indexKey, nlist, iters): training runs once
    * per corpus key and the model is reused by every subsequent probe — the
    * build/probe split of a real vector index. Training is deterministic
    * (hash-seeded, fixed iteration count), so memoization changes cost only,
    * never results. `indexKey` should identify the corpus (e.g. its path);
    * the cached value is nlist × dim doubles — bounded, driver-side.
    */
  def buildIndex(indexKey: String, embeddings: DataFrame,
                 nlist: Int = 16, iters: Int = 2): IvfModel =
    models.computeIfAbsent((indexKey, nlist, iters),
      _ => IvfModel(nlist, iters, trainCentroids(embeddings, nlist, iters)))

  /** PROBE: approximate top-k cosine neighbors of a stored vector against a
    * prebuilt [[IvfModel]]. Probe selection is driver-side math on the
    * (tiny) quantizer — the corpus scan stays a filter on the assigned
    * list + exact re-rank of the candidates.
    */
  def probe(model: IvfModel, embeddings: DataFrame, queryVecId: Long,
            k: Int, nprobe: Int = 4): DataFrame = {
    val cents = model.centroids
    val qVec = embeddings.filter(col("vec_id") === queryVecId)
      .select(normalized(col("embedding")).as("e"))
      .collect()(0).getSeq[Double](0).toArray
    val probes = cents
      .map { case (cid, c) => (cid, c.zip(qVec).map { case (x, y) => x * y }.sum) }
      .sortBy { case (cid, d) => (-d, cid) }
      .take(nprobe).map(_._1).toSet

    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    index(embeddings, cents)
      .filter(col("list").isin(probes.toSeq: _*) && col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("cosine", VectorOps.cosine(col("embedding"), col("q_emb")))
      .orderBy(desc("cosine"), col("vec_id"))
      .select("vec_id", "cosine")
      .limit(k)
  }

  /** One-shot convenience: fresh (un-memoized) build + probe. Prefer
    * [[buildIndex]] + [[probe]] when issuing more than one query.
    */
  def topKIvf(embeddings: DataFrame, queryVecId: Long, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame =
    probe(IvfModel(nlist, iters, trainCentroids(embeddings, nlist, iters)),
      embeddings, queryVecId, k, nprobe)
}
