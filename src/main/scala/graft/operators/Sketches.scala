package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct-count sketches (Flajolet et al. 2007).
  *
  * Spark ships `approx_count_distinct` (HLL++), but its xxhash64-based
  * sketch is opaque: no other engine can reproduce the estimate, so it can
  * only ever be tolerance-checked. This implementation builds the sketch
  * from the SAME engine-portable md5 primitive as every sampler in
  * [[Curation]], with every register decision exact integer/string math —
  * so the DuckDB oracle replays the estimate bit-for-bit, and a sketch
  * written by this engine can be merged or re-estimated by ANY system that
  * can compute md5.
  *
  * Register layout (m = 256 registers, b = 8 bucket bits):
  *  - md5 hex chars 1-2  → register index (8 bits);
  *  - md5 hex chars 3-16 → a 56-bit tail; rho = 1 + number of leading zero
  *    BITS of the tail (all-zero tail → rho = 57). Leading zeros are counted
  *    over the hex string — `z` whole zero hex chars via regexp, plus 0–3
  *    bits from the first nonzero digit's value class — never via float
  *    log2, whose rounding at exact powers of two is engine-dependent.
  *
  * The sketch TABLE (group, bkt, r) is the mergeable artifact: union two
  * sketches and take per-register max ([[hllMerge]]) — the classic
  * "count distinct users per hour, roll up to days for free" property.
  * [[hllEstimate]] folds registers into the standard bias-corrected
  * estimate: E = α·m²/Σ2^(−r), with the small-range linear-counting
  * correction E ≤ 2.5m ∧ V>0 → m·ln(m/V). The Σ2^(−r) sum is kept EXACT by
  * summing 2^(57−r) as decimal(38,0) (max term 2^56, no float-order drift);
  * the only doubles are correctly-rounded functions of those integers,
  * rounded to the 1e-2 grid on output.
  *
  * Scale: one (group, bkt) partial-agg shuffle — ≤ 256 rows per group out
  * of the map side regardless of input size — then a group-sized fold.
  * Standard error ≈ 1.04/√256 = 6.5%.
  */
object Sketches {

  private val B = 2 // bucket hex chars
  private val M = 256 // registers = 16^B
  private val RhoMax = 57 // 56-bit tail all zeros → 57

  /** Per-row (register, rho) columns from the md5 of `key` — exposed for
    * the streaming twin, which needs them inside its own watermarked agg.
    */
  def hllCols(key: Column): (Column, Column) = {
    val hex = md5(key.cast("string"))
    val bkt = conv(substring(hex, 1, B), 16, 10).cast("int")
    val tail = substring(hex, B + 1, 16 - B)
    val z = length(regexp_extract(tail, "^(0*)", 1))
    val d = conv(tail.substr(z + lit(1), lit(1)), 16, 10).cast("int")
    val lzBits = when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).otherwise(3)
    val rho = when(z === (16 - B), lit(RhoMax))
      .otherwise(z * 4 + lzBits + 1)
    (bkt, rho)
  }

  /** The mergeable sketch: one row per (group, occupied register) with the
    * register's max rho. ≤ [[M]] rows per group; this table IS the stored
    * artifact — write it, union it across days/sources, re-estimate later.
    * NULL keys are dropped first (COUNT DISTINCT semantics — and a null
    * md5 would otherwise land a null-register row that inflates the
    * estimate's occupied-register count).
    */
  def hllSketch(df: DataFrame, groupCol: String, key: Column): DataFrame = {
    val (bkt, rho) = hllCols(key)
    df.filter(key.isNotNull)
      .select(col(groupCol), bkt.as("bkt"), rho.as("rho"))
      .groupBy(groupCol, "bkt")
      .agg(max("rho").as("r"))
  }

  /** Merge sketches over the same register layout: union + per-register
    * max. Associative/commutative/idempotent — rollups compose freely.
    */
  def hllMerge(sketches: Seq[DataFrame], groupCol: String): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(groupCol, "bkt")
      .agg(max("r").as("r"))

  /** Fold a sketch into (group, est_2dp): the bias-corrected HLL estimate
    * on the 1e-2 grid. Empty registers contribute 2^0 = 2^57/2^57 to the
    * exact integer sum; V = their count drives the linear-counting branch.
    */
  def hllEstimate(sketch: DataFrame, groupCol: String): DataFrame = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble))
    val pow57 = 144115188075855872L // 2^57
    val agg = sketch.groupBy(groupCol)
      .agg(count(lit(1)).as("nb"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoMax - r)")
          .cast("decimal(38,0)")).as("s_obs"))
    val sTot = col("s_obs") +
      (lit(M) - col("nb")).cast("decimal(38,0)") * lit(pow57)
    val v = (lit(M) - col("nb")).cast("double")
    val eRaw = alpha * lit(M.toDouble) * lit(M.toDouble) *
      lit(pow57.toDouble) / sTot.cast("double")
    val est = when(eRaw <= lit(2.5 * M) && v > 0.0,
      lit(M.toDouble) * log(lit(M.toDouble) / v)).otherwise(eRaw)
    agg.select(col(groupCol),
      (floor(est * 100.0 + 0.5) / 100.0).as("est_2dp"))
  }

  /** One-shot per-group approximate distinct count of `key`. */
  def hllDistinct(df: DataFrame, groupCol: String, key: Column): DataFrame =
    hllEstimate(hllSketch(df, groupCol, key), groupCol)

  // ——— Count-Min sketch (Cormode & Muthukrishnan 2005) ———
  //
  // The frequency-estimation member of the sketch trio (HLL = distinct,
  // Misra-Gries = heavy hitters, CMS = point frequencies): d independent
  // hash rows of w counters; an item increments one counter per row, a
  // point query reads the MINIMUM of its d counters. Estimates never
  // undercount (every counter the item touched holds at least its true
  // count), and overcount is bounded by collisions: P(est > true + e·N/w)
  // ≤ e^−d. Counters are plain integer sums, so sketches MERGE by adding
  // registers — per-day sketches roll up to any range losslessly, the same
  // stored-artifact contract as [[hllSketch]]. Like the HLL, every hash is
  // the engine-portable md5, so the ESTIMATE itself hash-compares against
  // DuckDB (Spark's own CountMinSketchAgg binary sketch can only ever be
  // tolerance-checked).
  //
  // Scale: the explode is ×depth before a map-side-combined partial agg;
  // ≤ depth·[[CmsWidth]] rows per group survive the shuffle regardless of
  // input size. Lookups are probe-sized joins against that bounded table.

  /** Hash rows (independent md5 salts) and counters per row. Width shares
    * the HLL's 2-hex-char register index; error bound e·N/512 per row at
    * depth 4 ⇒ overestimate beyond N/64 has probability < e⁻⁴ ≈ 2%.
    */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Row-h counter index of `key`: 2 hex chars of md5("cms<h>|<key>"). */
  def cmsCol(key: Column, h: Int): Column =
    conv(substring(md5(concat_ws("|", lit(s"cms$h"), key.cast("string"))),
      1, B), 16, 10).cast("int")

  private[graft] def cmsEntries(key: Column, depth: Int = CmsDepth): Column =
    array((0 until depth).map(h =>
      struct(lit(h).as("h"), cmsCol(key, h).as("c"))): _*)

  /** The mergeable sketch: one row per (group, hash row, occupied counter)
    * with the exact occurrence count. ≤ depth·[[CmsWidth]] rows per group —
    * write it daily, [[cmsMerge]] any range later, point-query for free.
    */
  def cmsSketch(df: DataFrame, groupCol: String, key: Column,
      depth: Int = CmsDepth): DataFrame =
    df.filter(key.isNotNull)
      .select(col(groupCol), explode(cmsEntries(key, depth)).as("hc"))
      .select(col(groupCol), col("hc.h").as("h"), col("hc.c").as("c"))
      .groupBy(groupCol, "h", "c")
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches over the same layout: union + per-counter SUM (counts
    * are linear, so the merge is exactly the sketch of the union — unlike
    * HLL's max-merge this is lossless by construction, not just for
    * estimates).
    */
  def cmsMerge(sketches: Seq[DataFrame], groupCol: String): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(groupCol, "h", "c")
      .agg(sum("cnt").as("cnt"))

  /** Point-query `key` of each probe row against the sketch: est = min of
    * the key's depth counters (an untouched counter row is absent from the
    * sparse sketch table ⇒ count 0 ⇒ the key was never seen). One
    * probe-keyed left join against the bounded sketch — never a scan of
    * the sketched corpus.
    */
  def cmsLookup(sketch: DataFrame, probes: DataFrame, groupCol: String,
      key: Column, depth: Int = CmsDepth): DataFrame = {
    val keyed = probes.select(col(groupCol), key.as("cms_key"),
        explode(cmsEntries(key, depth)).as("hc"))
      .select(col(groupCol), col("cms_key"),
        col("hc.h").as("h"), col("hc.c").as("c"))
    keyed.join(sketch, Seq(groupCol, "h", "c"), "left")
      .groupBy(col(groupCol), col("cms_key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
