package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * splits, hash sampling, PII redaction, and context-window chunking.
  *
  * Determinism rule: anything that "samples" does so by content/key hash,
  * never by `rand()` — the same row lands in the same split/sample on any
  * cluster, any partitioning, any run. The hash here is `md5` (not
  * xxhash64) so the DuckDB oracle can reproduce it bit-for-bit.
  *
  * Scale notes: all operators are narrow per-row transforms (no shuffle);
  * chunking explodes rows but its downstream aggregations combine map-side.
  */
object Curation {

  /** Uniform bucket in [0, buckets) from the md5 of a key column — the
    * deterministic replacement for rand(): first 8 hex chars as a long,
    * mod buckets. Engine-portable (md5 is standardized; DuckDB twin in
    * CurationQueries).
    */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets))

  /** Uniform variate in [0, 1) from the md5 of a key column: the first 8
    * digest hex chars as a 32-bit integer scaled by 2⁻³². Exactly
    * representable both as the integer and after the division, so the
    * variate — and any comparison against it — is engine-portable.
    */
  def hashUnit(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

  /** Deterministic importance sampling: keeps a row iff
    * hashUnit(key) < weight, i.e. with probability `weight` (clamp it to
    * [0, 1] yourself) — the weighted generalization of [[hashBucket]]
    * sampling. Key-stable like every sampler here: the same row gets the
    * same verdict on any cluster, any partitioning, any run, and the
    * decision is a pure narrow filter (no shuffle, no state).
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column): DataFrame =
    df.filter(hashUnit(key) < weight)

  /** Adds `split`: train/val/test by hash bucket with the given percentage
    * cut points (e.g. 80/10/10). Key-stable: re-running on a grown corpus
    * never moves an existing row between splits.
    */
  def trainValTest(df: DataFrame, key: Column,
                   trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(key, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Leakage-safe [[trainValTest]]: near-duplicate CLUSTERS, not documents,
    * are the split unit, so no near-dup pair ever straddles train and test
    * — the benchmark-hygiene failure where the model "memorizes" eval rows
    * from their training-set near-copies. `pairs` is any near-dup pair
    * table (minhash/simhash/semantic); members of a connected component
    * all inherit the component's min-id label as their bucketing key,
    * unpaired documents bucket by their own id (identical to the naive
    * split for them — the clustered rows are the only difference).
    *
    * Scale: one cluster pass ([[graft.operators.Dedup.ccStars]] —
    * diameter-robust star contraction over the pair graph) + one keyed
    * left join + the stateless hash-bucket filter. Emits (doc_id,
    * split_unit, split).
    */
  def leakageSafeSplit(documents: DataFrame, pairs: DataFrame,
                       trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val clusters = graft.operators.Dedup.ccAuto(pairs)
    val withUnit = documents.select("doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("split_unit"))
    trainValTest(withUnit, col("split_unit"), trainPct, valPct)
  }

  /** Deterministic pct% sample by key hash — the scalable, reproducible
    * `TABLESAMPLE`: no shuffle, no seed state, stable under re-partitioning.
    */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key, 100) < pct)

  /** Stratified deterministic sampling: per-stratum percentage rates
    * (e.g. downsample dominant languages, keep all of rare ones) — the
    * domain-mixing primitive of training-data pipelines. Strata absent
    * from `rates` are dropped. Same md5-bucket law as [[hashSample]].
    */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       rates: Map[String, Int]): DataFrame = {
    val rate = rates.foldLeft(lit(0)) { case (acc, (s, pct)) =>
      when(strata === s, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(key, 100) < rate)
  }

  /** EXACT-k per-group sample: the k rows with the smallest md5 variate in
    * each group (ties impossible modulo md5 collisions on distinct keys) —
    * the quota form of [[stratifiedSample]], for when the contract is
    * "exactly 100 eval docs per language", not a rate. Key-stable like
    * every sampler here, and uniformly distributed because the variate is.
    *
    * Scale: one keyed window whose `row_number ≤ k` filter Spark 4 plans
    * as WindowGroupLimit — ≤ k rows per group per partition survive the
    * shuffle (the [[graft.functions.TopK]] bound, natively). Groups
    * smaller than k pass through whole.
    */
  def sampleKPerGroup(df: DataFrame, key: Column, groupCol: String,
                      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains("_rn"),
      "input already has a _rn column (internal name)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(hashUnit(key), key)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** PII redaction: emails, then phone-shaped digit runs, then 16-digit
    * card-shaped runs, replaced with typed placeholder tags. Order matters
    * (emails contain digit runs); each pass is one codegen'd
    * regexp_replace.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val card = regexp_replace(email,
      "\\b(?:\\d[ -]?){13,16}\\d\\b", "<CARD>")
    // no leading \b: "+" is a non-word char so a boundary can't precede it;
    // RE2-compatible (no lookbehind) because the DuckDB oracle mirrors this
    regexp_replace(card,
      "(?:\\+\\d{1,3}[ -])?(?:\\(\\d{2,4}\\)[ -]?)?\\b\\d{3}[ -]\\d{3,4}(?:[ -]\\d{3,4})?\\b",
      "<PHONE>")
  }

  /** Budget-capped selection: rank rows by `rank` (desc, ties by `key`
    * asc) and keep the prefix whose running `cost` total stays within
    * `budget` — "give me the best documents up to N tokens", the data-
    * selection primitive of training-set construction.
    *
    * Scale-safe two-phase prefix sum (a global `Window.orderBy` would move
    * the whole corpus to ONE partition for the sort):
    *
    *   1. range-bucket every row by its rank value into `buckets` width
    *     buckets (monotone in rank, so bucket order = rank order and ties
    *     never straddle a boundary);
    *   2. per-bucket cost totals, collected to the driver (≤ `buckets`
    *     longs — bounded like an IVF quantizer) and prefix-summed into
    *     cumulative offsets;
    *   3. classify: buckets whose offset + total ≤ budget pass whole (no
    *     sort at all); buckets whose offset > budget are dropped by a
    *     filter; that leaves AT MOST ONE frontier bucket (offsets are
    *     nondecreasing), which gets the running-sum window — partitioned
    *     by bucket, so the sort covers ~1/buckets of the corpus, not all
    *     of it.
    *
    * Costs are summed as longs (token/byte counts — the operator's
    * contract); rank is bucketed via its double cast, which is monotone,
    * while the in-bucket ordering uses the exact rank expression. The
    * result set is identical to the single-window formulation (same
    * oracle).
    */
  def selectUnderBudget(df: DataFrame, rank: Column, key: Column,
                        cost: Column, budget: Long, buckets: Int = 64,
                        scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    val outCols = df.columns.toSeq.map(col)
    // persist: phases 1-3 each rescan the bucketed projection
    val base = scope.persist(df
      .withColumn("_rank_d", rank.cast("double"))
      .withColumn("_cost_l", cost.cast("long")))
    val mm = base.agg(min("_rank_d"), max("_rank_d")).collect()(0)
    if (mm.isNullAt(0)) return df.filter(lit(false))
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    // best rank → bucket 0, monotone non-increasing in rank
    val bucketCol =
      if (hi == lo) lit(0)
      else least(lit(buckets - 1),
        floor((lit(hi) - col("_rank_d")) / ((hi - lo) / buckets)).cast("int"))
    val bucketed = base.withColumn("_bucket", bucketCol)
    val totals = bucketed.groupBy("_bucket").agg(sum("_cost_l").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // offsets(b) = total cost of all better-ranked buckets (< b)
    val offsets = (0 until buckets)
      .scanLeft(0L)((acc, b) => acc + totals.getOrElse(b, 0L))
    val lastAllPass = (0 until buckets)
      .filter(b => offsets(b) + totals.getOrElse(b, 0L) <= budget)
      .lastOption.getOrElse(-1)
    val frontier = (0 until buckets)
      .find(b => offsets(b) <= budget && offsets(b) + totals.getOrElse(b, 0L) > budget)
    val whole = bucketed.filter(col("_bucket") <= lastAllPass)
    val out = frontier match {
      case None => whole
      case Some(fb) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("_bucket")
          .orderBy(rank.desc, key.asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val edge = bucketed.filter(col("_bucket") === fb)
          .withColumn("_running", sum(col("_cost_l")).over(w) + offsets(fb))
          .filter(col("_running") <= budget)
          .drop("_running")
        whole.unionByName(edge)
    }
    out.select(outCols: _*)
  }

  /** [[selectUnderBudget]] for MANY groups in one pass: fills each group's
    * budget with its best-ranked prefix, exactly as running the
    * single-group form once per budget entry — but the per-group driver
    * loop collapses into two bounded driver actions (rank ranges, bucket
    * totals — both ≤ groups × `buckets` rows, recipe-sized) and ONE
    * whole/edge plan, instead of 2 jobs + 3 sub-plans per group (the
    * previous [[mixtureSample]] shape: measured ~3 s of driver planning in
    * `cur_pretrain`'s 629-row mixture stage). Groups absent from `budgets`
    * are dropped; a group whose ranks are all null contributes nothing —
    * both the single-group contracts. Bit-identical output set: the
    * bucket/offset/frontier arithmetic runs per group on the same numbers.
    */
  def selectUnderBudgetAll(df: DataFrame, groupCol: String, rank: Column,
                           key: Column, cost: Column,
                           budgets: Map[String, Long], buckets: Int = 64,
                           scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    require(budgets.nonEmpty, "selectUnderBudgetAll needs at least one budget")
    val outCols = df.columns.toSeq.map(col)
    val srcs = budgets.keys.toSeq.sorted
    // persist: feeds the two bounded collects AND the whole/edge filters
    val base = scope.persist(df
      .filter(col(groupCol).isin(srcs: _*))
      .withColumn("_rank_d", rank.cast("double"))
      .withColumn("_cost_l", cost.cast("long")))
    // per-group rank ranges in ONE pass (min(null-only group) → null →
    // group skipped, the single-group mm.isNullAt contract)
    val mm = base.groupBy(col(groupCol).as("_g"))
      .agg(min("_rank_d").as("_lo"), max("_rank_d").as("_hi"))
      .collect()
      .filterNot(_.isNullAt(1))
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val live = srcs.filter(mm.contains)
    if (live.isEmpty) return df.filter(lit(false))
    // best rank → bucket 0, per group's own (lo, hi) — a recipe-sized
    // when-chain (the driver loop the per-group form ran, as an expression)
    val bucketCol = live.foldLeft(lit(null).cast("int")) { (acc, s) =>
      val (lo, hi) = mm(s)
      val e =
        if (hi == lo) lit(0)
        else least(lit(buckets - 1),
          floor((lit(hi) - col("_rank_d")) / ((hi - lo) / buckets)).cast("int"))
      when(col(groupCol) === s, e).otherwise(acc)
    }
    val bucketed = base.withColumn("_bucket", bucketCol)
    val totals = bucketed.groupBy(col(groupCol).as("_g"), col("_bucket"))
      .agg(sum("_cost_l").as("t"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // per group: offsets(b) = total cost of better-ranked buckets, the
    // last fully-passing bucket, and the frontier bucket (if any)
    val plan = live.map { s =>
      val budget = budgets(s)
      val offsets = (0 until buckets)
        .scanLeft(0L)((acc, b) => acc + totals.getOrElse((s, b), 0L))
      val lastAllPass = (0 until buckets)
        .filter(b => offsets(b) + totals.getOrElse((s, b), 0L) <= budget)
        .lastOption.getOrElse(-1)
      val frontier = (0 until buckets).find(b =>
        offsets(b) <= budget && offsets(b) + totals.getOrElse((s, b), 0L) > budget)
      (s, lastAllPass, frontier, offsets)
    }
    val wholeCond = plan.foldLeft(lit(false)) { case (acc, (s, lap, _, _)) =>
      when(col(groupCol) === s, col("_bucket") <= lap).otherwise(acc)
    }
    val whole = bucketed.filter(wholeCond)
    val fr = plan.collect { case (s, _, Some(fb), offsets) =>
      (s, fb, offsets(fb), budgets(s)) }
    val out =
      if (fr.isEmpty) whole
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol), col("_bucket"))
          .orderBy(col("_rank_d").desc, key.asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val edgeCond = fr.foldLeft(lit(false)) { case (acc, (s, fb, _, _)) =>
          when(col(groupCol) === s, col("_bucket") === fb).otherwise(acc)
        }
        val offsetCol = fr.foldLeft(lit(null).cast("long")) {
          case (acc, (s, _, off, _)) =>
            when(col(groupCol) === s, lit(off)).otherwise(acc)
        }
        val budgetCol = fr.foldLeft(lit(null).cast("long")) {
          case (acc, (s, _, _, b)) =>
            when(col(groupCol) === s, lit(b)).otherwise(acc)
        }
        val edge = bucketed.filter(edgeCond)
          .withColumn("_running", sum(col("_cost_l")).over(w) + offsetCol)
          .filter(col("_running") <= budgetCol)
          .drop("_running")
        whole.unionByName(edge)
      }
    out.select(outCols: _*)
  }

  /** Data-mixture construction: per-source token budgets ("40% web, 20%
    * code, …" × total token count) filled by the hash-ordered prefix of
    * each source — [[hashUnit]] ordering is a deterministic uniform
    * shuffle, so each source contributes a uniform sample of itself, cut
    * off exactly when its budget fills. THE step that turns per-source
    * corpora plus a mixing recipe into a training set.
    *
    * Sources absent from `budgets` are dropped (the [[stratifiedSample]]
    * contract). Each source runs through the scale-safe two-phase
    * [[selectUnderBudget]] (rank = −hashUnit, so best-rank = smallest
    * variate), so no global or per-source whole-partition sort happens —
    * the driver loop is bounded by the recipe size, which is metadata
    * (a mixing recipe with a million entries is not a recipe). To
    * rank by quality instead of uniformly, compose: pass a quality score
    * as `rank` via [[selectUnderBudget]] per source.
    */
  def mixtureSample(df: DataFrame, sourceCol: String, key: Column,
                    cost: Column, budgets: Map[String, Long],
                    buckets: Int = 64,
                    scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    require(budgets.nonEmpty, "mixtureSample needs at least one source budget")
    // one multi-group pass (see [[selectUnderBudgetAll]]) — the per-source
    // loop of two-phase walks produced the same set with 2 driver jobs + 3
    // sub-plans per source
    selectUnderBudgetAll(df, sourceCol, lit(0.0) - hashUnit(key), key, cost,
      budgets, buckets, scope)
  }

  /** Temperature-scaled mixture budgets (the multilingual/source-balancing
    * practice: sample source s with probability ∝ tokensₛ^α, α < 1
    * flattening the head so low-resource sources are upsampled relative to
    * their share — α = 0.5 ≈ temperature 2). Returns the per-source token
    * budget map to feed [[mixtureSample]]:
    * budgetₛ = ⌊totalBudget · wₛ / Σw⌋ with wₛ = ⌊exp(α·ln tokensₛ)·10⁶+0.5⌋.
    *
    * Determinism: wₛ is the 1e-6-quantized power (same recipe as the LM
    * ln-score grid — both engines compute exp/ln of identical doubles and
    * round on a grid far coarser than their ulp disagreement), and the
    * budget split is EXACT integer arithmetic (BigInt here, HUGEINT
    * floor-division in the twin) — no float sums whose order could drift.
    *
    * Scale: one partial-agg shuffle for the per-source totals; the collect
    * is recipe-sized (#sources rows — metadata, like [[mixtureSample]]'s
    * driver loop).
    */
  def temperedBudgets(df: DataFrame, sourceCol: String, cost: Column,
                      totalBudget: Long, alpha: Double = 0.5): Map[String, Long] = {
    require(totalBudget > 0 && alpha > 0.0 && alpha <= 1.0,
      "need totalBudget > 0 and 0 < alpha <= 1")
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(cost.cast("long")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 > 0).sortBy(_._1)
    require(totals.nonEmpty, "no source has positive cost")
    val wq = totals.map { case (s, t) =>
      (s, math.floor(math.exp(alpha * math.log(t.toDouble)) * 1e6 + 0.5).toLong)
    }
    val sumWq = wq.map(w => BigInt(w._2)).sum
    wq.map { case (s, w) =>
      (s, (BigInt(totalBudget) * BigInt(w) / sumWq).toLong)
    }.toMap
  }

  /** Sequence packing: assign chunk rows to fixed-capacity token bins —
    * the step after [[chunk]] that builds training sequences ("pack these
    * chunks into 4k-token windows"). Rows are first sharded by key hash
    * (`shards` ≈ parallelism), then packed greedily in (doc_id, chunk_no)
    * order within their shard: bin = floor(prefix_tokens / binTokens),
    * where prefix_tokens is the running total EXCLUDING the current row —
    * so a row that straddles a boundary starts the next bin's count but is
    * assigned to the bin its first token lands in (fixed-boundary packing;
    * bins can overhang by < one chunk, the standard concat-then-split
    * layout).
    *
    * Scale design: the only window is partitioned BY SHARD — the global
    * packing order is (shard, doc, chunk), so no global sort ever happens
    * and shard packing is embarrassingly parallel, which is exactly how a
    * distributed trainer shards its data anyway. Deterministic: md5-hash
    * sharding ([[hashBucket]]), no rand().
    *
    * Emits (…input columns…, shard, bin, bin_tokens_before).
    */
  def packSequences(chunks: DataFrame, binTokens: Int, shards: Int,
                    tokenCol: String = "n_chunk_tokens"): DataFrame = {
    require(binTokens > 0 && shards > 0, "binTokens and shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard")
      .orderBy(col("doc_id").asc, col("chunk_no").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    chunks
      .withColumn("shard", hashBucket(col("doc_id"), shards))
      .withColumn("_prefix",
        sum(col(tokenCol).cast("long")).over(w) - col(tokenCol).cast("long"))
      .withColumn("bin", (col("_prefix") / binTokens).cast("long"))
      .withColumn("bin_tokens_before", pmod(col("_prefix"), lit(binTokens.toLong)))
      .drop("_prefix")
  }

  /** Corpus snapshot diff: classify every key across two corpus versions
    * as added / removed / changed / unchanged by comparing a content
    * fingerprint — the "what happened between crawls" audit (and the input
    * to incremental downstream recomputation: only non-unchanged keys need
    * reprocessing). One full-outer join co-partitioned on the key; presence
    * is tracked by literal flags, not fingerprint nullability, so null
    * content never misclassifies a present row as absent.
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, keyCol: String,
                   fp: Column): DataFrame = {
    val pa = prev.select(col(keyCol), fp.as("fp_prev"), lit(true).as("in_prev"))
    val cb = cur.select(col(keyCol), fp.as("fp_cur"), lit(true).as("in_cur"))
    pa.join(cb, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("in_prev").isNull, "added")
          .when(col("in_cur").isNull, "removed")
          .when(!(col("fp_prev") <=> col("fp_cur")), "changed")
          .otherwise("unchanged"))
      .select(col(keyCol), col("status"))
  }

  /** Keep the top `frac` fraction of rows PER GROUP, ranked by `rank`
    * descending with `idCol` ties — the adaptive-threshold quality gate
    * ("top 25% by quality within each source") where a single global
    * cutoff would over-prune weak sources and under-prune strong ones.
    * row_number ≤ ceil(frac × group size); both the window and the count
    * aggregate are keyed by the group — no global sort anywhere.
    */
  def topFractionPerGroup(df: DataFrame, groupCol: String, rank: Column,
                          idCol: String, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac=$frac must be in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(rank.desc, col(idCol).asc)
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("_gn"))
    df.join(counts, groupCol)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= ceil(col("_gn") * frac))
      .drop("_gn", "_rn")
  }

  // ---- DSIR-style importance resampling ----

  /** Per-document score on the 1e-9 integer grid plus the feature count —
    * the shared core of [[dsirWeights]] / [[dsirSample]]. Emits
    * (doc_id, n_feats, wq: long).
    */
  private def dsirWeightsQ(documents: DataFrame, isTarget: Column,
                           buckets: Int,
                           scope: graft.CacheScope): DataFrame = {
    // fused unigram+bigram feature pass (graft.plans.TokenBigramFeats —
    // the Embed.hashedTf spelling, same values)
    val feats = graft.plans.TokenizerKernels.tokenBigramFeats(col("text"))
    // persist: the occurrence table feeds the bucket-count aggregation AND
    // the per-doc scoring join. (A (doc_id, tgt, b, tf) pre-aggregation —
    // the hashedTfIdf discipline — was MEASURED NEGATIVE here and
    // reverted: both downstream aggregations already combine map-side off
    // the narrow persisted explode, so the pre-agg only added a
    // (doc, b)-keyed shuffle: 3.05 → 3.69 s / 2.72 → 3.57 s at sf0.1.)
    val occ = scope.persist(documents
      .select(col("doc_id"), isTarget.as("tgt"), explode(feats).as("f"))
      .select(col("doc_id"), col("tgt"), hashBucket(col("f"), buckets).as("b")))
    val bt = occ.groupBy("b").agg(
      count(lit(1)).as("raw"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("tgt_n"))
    val tot = bt.agg(sum("raw").as("raw_tot"), sum("tgt_n").as("tgt_tot"))
    // each ln quantized to a 1e-9-scaled long BEFORE any distributed sum
    // (the lmScore determinism trick); the bucket weight is a long diff
    val lnq = (c: Column, t: Column) => floor(
      log((c.cast("double") + 1.0) / (t.cast("double") + buckets))
        * 1000000000.0 + 0.5).cast("long")
    val bw = bt.crossJoin(broadcast(tot))
      .select(col("b"),
        (lnq(col("tgt_n"), col("tgt_tot"))
          - lnq(col("raw"), col("raw_tot"))).as("lnwq"))
    occ.join(broadcast(bw), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("lnwq").as("wq"))
  }

  /** Hashed n-gram importance weights — the DSIR recipe (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * features are unigrams + bigrams hashed into `buckets` buckets; a
    * bucket's weight is ln p_target(b) − ln p_raw(b) under add-one
    * smoothing (target = the rows where `isTarget`, raw = the whole
    * corpus); a document's log-importance weight is the sum over its
    * feature OCCURRENCES of its buckets' weights. Documents that look
    * like the target subset score high; gibberish and off-domain text
    * score low. Emits (doc_id, n_feats, dsir_weight 4-dp).
    *
    * Scale: one linear explode (persisted — two consumers), one
    * `buckets`-sized count table broadcast back onto the occurrences, one
    * partial-agg'd keyed sum — the tfidfTopTerms shape. The model is the
    * bucket table: `buckets` rows (paper uses 10⁴) regardless of corpus
    * size. Determinism: integer-grid lns, no distributed double sums.
    */
  def dsirWeights(documents: DataFrame, isTarget: Column,
                  buckets: Int = 1024,
                  scope: graft.CacheScope = graft.CacheScope.global): DataFrame =
    dsirWeightsQ(documents, isTarget, buckets, scope)
      .select(col("doc_id"), col("n_feats"),
        (floor(col("wq").cast("double") / 1000000000.0 * 10000.0 + 0.5)
          / 10000.0).as("dsir_weight"))

  /** DSIR selection: sample `k` documents without replacement with
    * probability ∝ exp(importance weight) via the Gumbel top-k trick —
    * score = wq + Gumbel(0,1), take the k largest. The Gumbel variate is
    * −ln(−ln(u)) with u the md5-hash uniform of doc_id shifted half a
    * step into the open interval ((h+0.5)/2³², never 0 or 1 — ln(0) is a
    * pole), so selection is deterministic and engine-portable like every
    * sampler here. Top-k is a TakeOrderedAndProject (k rows per
    * partition through the shuffle), never a global sort. Emits the
    * selected (doc_id, score 4-dp) ordered by doc_id.
    */
  def dsirSample(documents: DataFrame, isTarget: Column, k: Int,
                 buckets: Int = 1024,
                 scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") + 0.5) / 4294967296.0
    val gq = floor(-log(-log(u)) * 1000000000.0 + 0.5).cast("long")
    dsirWeightsQ(documents, isTarget, buckets, scope)
      .withColumn("score_q", col("wq") + gq)
      .orderBy(desc("score_q"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"),
        (floor(col("score_q").cast("double") / 1000000000.0 * 10000.0 + 0.5)
          / 10000.0).as("score"))
  }

  /** Context-window chunking: whitespace tokens packed into windows of
    * `chunkTokens` with `overlap` tokens carried between consecutive
    * chunks. Emits (…, chunk_no, chunk_text, n_chunk_tokens). Stride =
    * chunkTokens − overlap; the final partial window is kept iff it
    * contributes new tokens.
    */
  def chunk(documents: DataFrame, chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(overlap < chunkTokens, "overlap must be smaller than the chunk")
    val stride = chunkTokens - overlap
    // nChunks reads the MATERIALIZED toks column — spelling it over the
    // split(text) expression re-evaluated the split per reference in the
    // generator (the TokenBigramFeats lesson)
    val toks = col("toks")
    val nChunks = when(size(toks) <= chunkTokens, lit(1))
      .otherwise(ceil((size(toks) - lit(chunkTokens)).cast("double") / stride)
        .cast("int") + 1)
    documents
      .withColumn("toks", split(col("text"), " "))
      .select(col("*"), posexplode(transform(sequence(lit(0), nChunks - 1),
        i => slice(col("toks"), i * stride + 1, lit(chunkTokens))))
        .as(Seq("chunk_no", "chunk_toks")))
      .select(col("doc_id"), col("chunk_no"),
        concat_ws(" ", col("chunk_toks")).as("chunk_text"),
        size(col("chunk_toks")).as("n_chunk_tokens"))
  }
}
