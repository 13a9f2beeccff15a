package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** IVF (inverted-file) approximate nearest neighbor over `embeddings` —
  * the centroid-bucketed scale path, complementing the hyperplane LSH in
  * [[Similarity]]:
  *
  *  1. train a coarse quantizer: `nlist` centroids, hash-seeded
  *     deterministically, refined with Lloyd iterations run as DataFrame
  *     aggregations (each iteration: one argmin projection + one shuffle
  *     of (centroid, dim, value) triples — linear in corpus size);
  *  2. assign every vector to its nearest centroid (pure per-row argmin,
  *     no shuffle — the "inverted lists");
  *  3. query: rank centroids by cosine to the query, scan only the top
  *     `nprobe` lists, exact re-rank of the candidates.
  *
  * The quantizer (nlist × dim doubles) is collected to the driver — that is
  * the IVF contract: the coarse index must be broadcast-small; the corpus
  * itself never leaves executors. At nprobe = nlist the search is exhaustive
  * and equals the brute-force result exactly (asserted in IvfSpec).
  */
object Ivf {

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

    val seedIds = emb.select(col("vec_id"),
        pmod(xxhash64(col("vec_id")), lit(nlist)).as("bucket"))
      .groupBy("bucket").agg(min("vec_id").as("vec_id"))
    var cents: Array[(Int, Array[Double])] = emb
      .join(seedIds, "vec_id")
      .select(col("bucket").cast("int"), col("e"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

    for (_ <- 1 to iters) {
      // assign + per-dimension mean, one shuffle of (cid, dim, v) triples
      val assigned = emb.withColumn("cid", assignUdfFree(col("e"), cents))
      val next = assigned
        .select(col("cid"), posexplode(col("e")).as(Seq("dim", "v")))
        .groupBy("cid", "dim").agg(avg("v").as("m"))
        .groupBy("cid").agg(map_from_arrays(
          collect_list(col("dim")), collect_list(col("m"))).as("dims"))
        .collect()
        .map { r =>
          val cid = r.getInt(0)
          val m = r.getMap[Int, Double](1)
          val arr = Array.tabulate(m.size)(m(_))
          val nrm = math.sqrt(arr.map(x => x * x).sum)
          (cid, if (nrm == 0.0) arr else arr.map(_ / nrm))
        }
        .sortBy(_._1)
      cents = next
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
        unitVec, array(c.map(lit(_)): _*))).as("negdot"),
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

  /** Approximate top-k cosine neighbors of a stored vector: probe the
    * `nprobe` centroid lists nearest to the query, exact re-rank inside.
    * Probe selection is driver-side math on the (tiny) quantizer — the
    * corpus scan stays a partition-pruned filter + re-rank.
    */
  def topKIvf(embeddings: DataFrame, queryVecId: Long, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val cents = trainCentroids(embeddings, nlist, iters)
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
}
