package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage over the star schema: scan, filter, project,
  * hash-aggregate, shuffle/broadcast joins (inner/semi/anti), window
  * functions, sort/limit (top-k), set ops, rollup.
  *
  * Determinism rules for the DuckDB oracle:
  *   - every double SUM goes through DECIMAL (order-independent, exact) and
  *     is cast back to double, so Spark's 32-partition partial aggregation
  *     and DuckDB's sequential sum agree bit-for-bit;
  *   - every output is ORDER BY'd on a unique key (ties broken explicitly);
  *   - AVG is expressed as decimal-SUM / COUNT.
  *
  * Scale notes (100 TB design): all joins here are either broadcast-able
  * dims (nation/region/supplier — Spark AQE broadcasts them automatically)
  * or key-partitioned shuffles on the join key; aggregations are partial
  * (map-side combine) by construction since they're plain `groupBy.agg`.
  */
object RelationalQueries {

  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 flavor: single-pass hash aggregate with derived measures.
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(24,8)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3 flavor: 3-way join + agg + top-k by revenue.
    "q3_join_topk" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(24,8)")).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 flavor: 5-way join through the dimension chain; the dims are
    // broadcast by AQE, lineitem⋈orders is the only real shuffle.
    "q5_join5" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(24,8)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // Window functions: top-3 orders per customer by totalprice.
    "window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // Frame-based windows: per-customer running spend (unbounded-preceding
    // frame) and 3-order moving average (sliding frame). Both sums routed
    // through DECIMAL so the frame accumulation is exact and order-free;
    // the moving average divides the exact frame sum by the frame COUNT.
    // Keyed windows only — the shuffle is one hash exchange on o_custkey.
    "window_running" -> ((s, dir) => {
      val ord = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val last3 = ord.rowsBetween(-2, 0)
      Tables.orders(s, dir)
        .withColumn("running_spend",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(run)
            .cast("double"))
        .withColumn("avg3_spend",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(last3)
            .cast("double") / count(lit(1)).over(last3))
        .select("o_custkey", "o_orderkey", "o_totalprice",
          "running_spend", "avg3_spend")
        .orderBy("o_orderkey")
    }),

    // Analytic-function breadth over the same keyed per-customer ordering:
    // lag/lead (neighbor keys), ntile quartiles, percent_rank and
    // cume_dist. All are exact rational functions of the row's position in
    // a totally-ordered partition (unique (date, key) tie-break), so both
    // engines agree bit-for-bit; the two ratio columns are 4-dp-floored
    // identically anyway.
    "window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("prev_ok", lag("o_orderkey", 1).over(w))
        .withColumn("next_ok", lead("o_orderkey", 1).over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr_4dp",
          floor(percent_rank().over(w) * 10000.0 + 0.5) / 10000.0)
        .withColumn("cd_4dp",
          floor(cume_dist().over(w) * 10000.0 + 0.5) / 10000.0)
        .select("o_custkey", "o_orderkey", "prev_ok", "next_ok",
          "quartile", "pr_4dp", "cd_4dp")
        .orderBy("o_orderkey")
    }),

    // Per-group Pearson correlation from EXACT integer sums: both measures
    // are quantized to the cent grid (their native resolution), the five
    // sufficient statistics (Σx, Σy, Σxy, Σx², Σy², n) are exact
    // decimal-routed integer sums — order-free under any partitioning —
    // and the final correlation is a correctly-rounded double function of
    // identical integers on both engines. Spark's built-in corr() is a
    // float accumulation whose result depends on partition order; this is
    // the deterministic distributed formulation (one partial-agg shuffle).
    "stats_corr" -> ((s, dir) => {
      val xq = floor(col("l_quantity") * 100.0 + 0.5).cast("long")
      val yq = floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")
      val d38 = "decimal(38,0)"
      def dbl(c: String) = col(c).cast("double")
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), xq.as("xq"), yq.as("yq"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          sum(col("xq").cast(d38)).as("sx"),
          sum(col("yq").cast(d38)).as("sy"),
          sum((col("xq") * col("yq")).cast(d38)).as("sxy"),
          sum((col("xq") * col("xq")).cast(d38)).as("sxx"),
          sum((col("yq") * col("yq")).cast(d38)).as("syy"))
        .select(col("l_returnflag"), col("n_items"),
          (floor(
            (dbl("n_items") * dbl("sxy") - dbl("sx") * dbl("sy"))
              / (sqrt(dbl("n_items") * dbl("sxx") - dbl("sx") * dbl("sx"))
                * sqrt(dbl("n_items") * dbl("syy") - dbl("sy") * dbl("sy")))
              * 1000000.0 + 0.5) / 1000000.0).as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // Per-group least-squares fit price ~ quantity from the SAME exact
    // integer sufficient statistics as stats_corr — deterministic
    // distributed regression: slope = (nΣxy − ΣxΣy)/(nΣxx − Σx²),
    // intercept = (Σy − slope·Σx)/n, both correctly-rounded functions of
    // identical integers in either engine. One partial-agg shuffle.
    "stats_ols" -> ((s, dir) => {
      val xq = floor(col("l_quantity") * 100.0 + 0.5).cast("long")
      val yq = floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")
      val d38 = "decimal(38,0)"
      def dbl(c: String) = col(c).cast("double")
      val slope = (dbl("n_items") * dbl("sxy") - dbl("sx") * dbl("sy")) /
        (dbl("n_items") * dbl("sxx") - dbl("sx") * dbl("sx"))
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), xq.as("xq"), yq.as("yq"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          sum(col("xq").cast(d38)).as("sx"),
          sum(col("yq").cast(d38)).as("sy"),
          sum((col("xq") * col("yq")).cast(d38)).as("sxy"),
          sum((col("xq") * col("xq")).cast(d38)).as("sxx"))
        .select(col("l_returnflag"), col("n_items"),
          (floor(slope * 1000000.0 + 0.5) / 1000000.0).as("slope_6dp"),
          (floor((dbl("sy") - slope * dbl("sx")) / dbl("n_items") * 100.0
            + 0.5) / 100.0).as("intercept_2dp"))
        .orderBy("l_returnflag")
    }),

    // Global sort + limit (distributed top-k via TakeOrderedAndProject).
    "orders_topk" -> ((s, dir) =>
      Tables.orders(s, dir)
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20)),

    // Anti join: customers with no high-value order, counted per nation.
    "join_anti" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_nationkey")
    }),

    // Semi join: nations having at least one high-value open order.
    "join_semi" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000)
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    }),

    // Set ops: INTERSECT and EXCEPT over projected key sets.
    // Full outer join with genuine orphans on BOTH sides (customers
    // filtered to even keys; odd-key order groups lose their parent).
    // Null sort order pinned explicitly — Spark defaults NULLS FIRST,
    // DuckDB NULLS LAST.
    "join_outer" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"))
      val ords = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      cust.join(ords, cust("c_custkey") === ords("o_custkey"), "full_outer")
        .select(col("c_custkey"), col("c_name"), col("o_custkey"), col("n_orders"))
        .orderBy(col("c_custkey").asc_nulls_last, col("o_custkey").asc_nulls_last)
    }),

    "set_ops" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
      val f = ord.filter(col("o_orderstatus") === "F").select("o_custkey")
      val o = ord.filter(col("o_orderstatus") === "O").select("o_custkey")
      f.intersect(o).withColumn("op", lit("both"))
        .unionByName(f.except(o).withColumn("op", lit("f_only")))
        .orderBy("op", "o_custkey")
    }),

    // Exact distinct aggregation (expands to two-phase agg in Spark).
    "distinct_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_suppkey").as("n_suppliers"),
          countDistinct("l_partkey").as("n_parts"))
        .orderBy("l_returnflag")),

    // Rollup (grouping sets): order counts by status × priority.
    "rollup_agg" -> ((s, dir) =>
      Tables.orders(s, dir)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          dsum("o_totalprice").as("total_price"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))),

    // Full cube over the same pair — all four grouping sets.
    "cube_agg" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))),

    // Exact quantiles (sort-based interpolated percentile): Spark's
    // percentile == DuckDB's quantile_cont, both (n-1)p linear interp.
    // Array form: ONE sort buffer per group serves all four points —
    // four scalar percentile aggs would each buffer the whole column.
    // Upsert compaction: orders is the base snapshot (version 0), every
    // 10th key gets an update batch row (version 1, doubled price, status
    // U); keep-latest must surface exactly the updates for those keys and
    // the base rows elsewhere. ×2 is exponent-exact in IEEE, so the oracle
    // hash-matches without decimal routing.
    // Pivot: status columns per priority (fixed pivot values ⇒ stable
    // schema; the oracle states them as conditional counts).
    "pivot_agg" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .orderBy("o_orderpriority")),

    // Explicit GROUPING SETS ((flag, status), (flag), ()) — the general
    // form rollup/cube specialize; null ordering pinned for the oracle.
    "grouping_sets_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_last,
          col("l_linestatus").asc_nulls_last)),

    "orders_upsert" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val base = o.withColumn("version", lit(0L))
      val upd = o.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("version", lit(1L))
      operators.Upsert.keepLatest(
          base.unionByName(upd), Seq("o_orderkey"), "version")
        .orderBy("o_orderkey")
    }),

    // SCD2 history reconstruction — the HISTORY read of the same append
    // log orders_upsert compacts: two update waves over the base snapshot
    // become per-key validity intervals (valid_from/valid_to/is_current),
    // ready for point-in-time joins. One keyed lead() window.
    "orders_scd2" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val base = o.withColumn("version", lit(0L))
      val u1 = o.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("version", lit(1L))
      val u2 = o.filter(col("o_orderkey") % 20 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 3)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("version", lit(2L))
      operators.Upsert.scd2History(
          base.unionByName(u1).unionByName(u2), Seq("o_orderkey"), "version")
        .orderBy("o_orderkey", "version")
    }),

    "quantiles" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.99D))")
          .as("qs"))
        .select(col("l_returnflag"),
          element_at(col("qs"), 1).as("p25"),
          element_at(col("qs"), 2).as("p50"),
          element_at(col("qs"), 3).as("p75"),
          element_at(col("qs"), 4).as("p99"))
        .orderBy("l_returnflag")),

    // Same quantiles through the SCALE-SAFE two-phase grid walk — Spark's
    // percentile() buffers every group value in one aggregation buffer (the
    // `quantiles` query above is the small-group form); this one's state is
    // value-cardinality-bounded and survives any group size. Purpose-written
    // oracle (the grid walk replayed in SQL), and StatsSpec asserts it
    // agrees with percentile() on the corpus.
    "quantiles_scalable" -> ((s, dir) => {
      val qvals = Seq(0.25, 0.5, 0.75, 0.99)
      operators.Stats.exactQuantilesByGrid(
          Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice", qvals)
        .groupBy("l_returnflag")
        .agg(
          max(when(col("qi") === 0, col("quantile"))).as("p25"),
          max(when(col("qi") === 1, col("quantile"))).as("p50"),
          max(when(col("qi") === 2, col("quantile"))).as("p75"),
          max(when(col("qi") === 3, col("quantile"))).as("p99"))
        .orderBy("l_returnflag")
    }),

    // Robust outlier summary: modified z-score over exact grid median and
    // MAD — the outlier detector extreme values can't mask (unlike
    // events_outliers' mean/stddev z).
    "stats_mad_outliers" -> ((s, dir) =>
      operators.Stats.madOutlierSummary(
          Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice")
        .select("l_returnflag", "n", "med", "mad", "n_outliers")
        .orderBy("l_returnflag")),

    // Winsorized per-group price summary: rows clipped at the exact
    // p05/p95 grid quantiles; counts and the clipped mean come from exact
    // integer sums of the re-gridded values.
    "stats_winsorized" -> ((s, dir) =>
      operators.Stats.winsorize(
          Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("clip") === "lo", 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("clip") === "hi", 1L).otherwise(0L)).as("n_hi"),
          sum(floor(col("v_wins") * 100.0 + 0.5).cast("long")).as("sc"))
        .select(col("l_returnflag"), col("n"), col("n_lo"), col("n_hi"),
          (floor(col("sc").cast("double") / col("n") / 100.0 * 10000.0 + 0.5)
            / 10000.0).as("mean_wins"))
        .orderBy("l_returnflag")),

    // Deequ-style column profile of the DIRTY sales feed (the table the
    // reference pipeline ingests blind): row/null/completeness/distinct
    // plus typed min/max/mean — one column-pruned single-column pass per
    // profiled column. Profiling the dirty input is the point: this is the
    // report that would have told the reference author which columns need
    // F1/P1/P2 before writing them.
    "stats_profile" -> ((s, dir) =>
      operators.Profile.profile(
          sources.SalesFixture.fromLineitem(s, dir),
          numericCols = Seq("price", "quantity", "total"),
          stringCols = Seq("product"))
        .orderBy("col_name")),

    // Expectation suite over the star schema + dirty feed: key uniqueness,
    // FK containment, domain and range checks, each one bounded-output
    // aggregation. Deliberately mixed pass/fail (the dirty feed's nulls and
    // the >450k tail are real violations) so the report is non-vacuous.
    "stats_expectations" -> ((s, dir) => {
      import operators.Profile._
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val dirty = sources.SalesFixture.fromLineitem(s, dir)
      expectations(Seq(
        expectNotNull(ord, "o_custkey"),
        expectUnique(ord, Seq("o_orderkey")),
        expectInRange(ord, "o_totalprice", 0.0, 450000.0),
        expectInSet(ord, "o_orderstatus", Seq("O", "F", "P")),
        expectReferential(ord, "o_custkey", cust, "c_custkey"),
        expectNotNull(dirty, "quantity"),
        expectUnique(dirty, Seq("product"))))
    }),

    // Log2 histogram sketch: bounded-size (≤ 64 rows/group) distribution
    // summary via exact bit-length bucketing — the mergeable histogram for
    // unbounded value ranges, next to quantiles_scalable's exact grid walk.
    "stats_histogram" -> ((s, dir) =>
      operators.Stats.log2Histogram(
          Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag", "bucket")),

    // Profile drift between the dirty feed and its cleaned output
    // (F1→P1→P2): the day-over-day report a pipeline runs to catch schema
    // or distribution shifts — here it quantifies exactly what cleaning
    // bought (completeness → 1.0, the F1 row drop, the imputation's pull
    // on mean).
    "stats_profile_drift" -> ((s, dir) => {
      val dirty = sources.SalesFixture.fromLineitem(s, dir)
      val cleaned = operators.SalesClean.imputeTotal(
        operators.SalesClean.imputeQuantity(
          operators.SalesClean.dropAllNullMeasures(dirty)))
      val nums = Seq("price", "quantity", "total")
      operators.Profile.profileDiff(
          operators.Profile.profile(dirty, nums, Seq("product")),
          operators.Profile.profile(cleaned, nums, Seq("product")))
        .orderBy("col_name")
    })
  )

  /** DuckDB twin of [[operators.Profile.profile]] over relation `rel` with
    * the fixed column set (price, quantity, total numeric; product string)
    * — the UNION-ALL-per-column spelling shared by the stats_profile and
    * stats_profile_drift oracles.
    */
  private def profileUnionSql(rel: String): String = {
    def num(c: String) =
      s"""SELECT '$c' AS col_name, COUNT(*) AS n,
         |  COUNT(*) - COUNT(c) AS n_null,
         |  FLOOR(CAST(COUNT(c) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5)
         |    / 1000000.0 AS completeness_6dp,
         |  COUNT(DISTINCT c) AS n_distinct,
         |  CAST(MIN(vq) AS DOUBLE) / 100.0 AS min_num,
         |  CAST(MAX(vq) AS DOUBLE) / 100.0 AS max_num,
         |  FLOOR(CAST(SUM(vq) AS DOUBLE) / COUNT(c) + 0.5) / 100.0 AS mean_2dp,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM (SELECT $c AS c,
         |        CAST(FLOOR($c * 100.0 + 0.5) AS BIGINT) AS vq FROM $rel)""".stripMargin
    def str(c: String) =
      s"""SELECT '$c', COUNT(*), COUNT(*) - COUNT(c),
         |  FLOOR(CAST(COUNT(c) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5)
         |    / 1000000.0,
         |  COUNT(DISTINCT c),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  MIN(c), MAX(c)
         |FROM (SELECT $c AS c FROM $rel)""".stripMargin
    (Seq("price", "quantity", "total").map(num) :+ str("product"))
      .mkString("\nUNION ALL\n")
  }

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join_topk" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_join5" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "window_running" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / COUNT(*) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg3_spend
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_ok,
        |  lead(o_orderkey, 1) OVER w AS next_ok,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  FLOOR(percent_rank() OVER w * 10000.0 + 0.5) / 10000.0 AS pr_4dp,
        |  FLOOR(cume_dist() OVER w * 10000.0 + 0.5) / 10000.0 AS cd_4dp
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "stats_ols" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS xq,
        |    CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS yq
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, COUNT(*) AS n_items,
        |    SUM(xq) AS sx, SUM(yq) AS sy, SUM(xq * yq) AS sxy,
        |    SUM(xq * xq) AS sxx
        |  FROM q GROUP BY 1),
        |f AS (
        |  SELECT l_returnflag, n_items,
        |    (CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n_items AS DOUBLE) * CAST(sxx AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM s)
        |SELECT l_returnflag, n_items,
        |  FLOOR(slope * 1000000.0 + 0.5) / 1000000.0 AS slope_6dp,
        |  FLOOR((syd - slope * sxd) / CAST(n_items AS DOUBLE) * 100.0 + 0.5)
        |    / 100.0 AS intercept_2dp
        |FROM f ORDER BY l_returnflag""".stripMargin,

    "stats_corr" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS xq,
        |    CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS yq
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, COUNT(*) AS n_items,
        |    SUM(xq) AS sx, SUM(yq) AS sy, SUM(xq * yq) AS sxy,
        |    SUM(xq * xq) AS sxx, SUM(yq * yq) AS syy
        |  FROM q GROUP BY 1)
        |SELECT l_returnflag, n_items,
        |  FLOOR(
        |    (CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n_items AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |       * sqrt(CAST(n_items AS DOUBLE) * CAST(syy AS DOUBLE)
        |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "orders_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "join_anti" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name, c_nationkey
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O' AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,

    "join_outer" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0),
        |ords AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
        |SELECT c_custkey, c_name, o_custkey, n_orders
        |FROM cust FULL OUTER JOIN ords ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS LAST, o_custkey NULLS LAST""".stripMargin,

    "set_ops" ->
      """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_custkey, 'both' AS op FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
        |UNION ALL
        |SELECT o_custkey, 'f_only' AS op FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
        |ORDER BY op, o_custkey""".stripMargin,

    "distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |  COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "rollup_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "pivot_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "grouping_sets_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin,

    "orders_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus,
        |    CAST(0 AS BIGINT) AS version
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
        |    'U' AS o_orderstatus, CAST(1 AS BIGINT) AS version
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC) AS rn
        |  FROM u)
        |SELECT o_orderkey, o_totalprice, o_orderstatus, version
        |FROM r WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,

    "orders_scd2" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus,
        |    CAST(0 AS BIGINT) AS version
        |  FROM orders),
        |u1 AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
        |    'U' AS o_orderstatus, CAST(1 AS BIGINT) AS version
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |u2 AS (
        |  SELECT o_orderkey, o_totalprice * 3 AS o_totalprice,
        |    'X' AS o_orderstatus, CAST(2 AS BIGINT) AS version
        |  FROM orders WHERE o_orderkey % 20 = 0),
        |lg AS (SELECT * FROM base UNION ALL SELECT * FROM u1
        |       UNION ALL SELECT * FROM u2)
        |SELECT o_orderkey, o_totalprice, o_orderstatus, version,
        |  version AS valid_from,
        |  LEAD(version) OVER (PARTITION BY o_orderkey ORDER BY version)
        |    AS valid_to,
        |  (LEAD(version) OVER (PARTITION BY o_orderkey ORDER BY version)
        |    IS NULL) AS is_current
        |FROM lg ORDER BY o_orderkey, version""".stripMargin,

    "quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS p25,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.75) AS p75,
        |  quantile_cont(l_extendedprice, 0.99) AS p99
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // The grid walk replayed: exact integer rank brackets + the pinned
    // interpolation spelling (no quantile_cont — the twin reproduces the
    // operator's own math, engine internals don't enter).
    // MAD twin: the grid walk run twice — once over the raw cent values
    // for the median, once over the re-gridded absolute deviations for the
    // MAD — then the count-weighted modified-z flag over the distinct-value
    // table (sums are exact, so values equal the Spark side's per-row agg).
    "stats_mad_outliers" -> {
      def walk(src: String, sfx: String): String =
        s"""cum$sfx AS (
           |  SELECT g, vq, cnt,
           |    CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY vq) AS BIGINT) AS hi
           |  FROM $src),
           |cum2$sfx AS (SELECT g, vq, hi - cnt AS lo, hi FROM cum$sfx),
           |n$sfx AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM $src GROUP BY 1),
           |t2$sfx AS (
           |  SELECT g, CAST(FLOOR(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) AS k,
           |    CAST(n - 1 AS DOUBLE) * 0.5
           |      - FLOOR(CAST(n - 1 AS DOUBLE) * 0.5) AS frac
           |  FROM n$sfx),
           |vk$sfx AS (
           |  SELECT t2$sfx.g, t2$sfx.frac, cum2$sfx.vq AS vqk
           |  FROM t2$sfx JOIN cum2$sfx ON cum2$sfx.g = t2$sfx.g
           |    AND cum2$sfx.lo <= t2$sfx.k AND t2$sfx.k < cum2$sfx.hi),
           |vk1$sfx AS (
           |  SELECT t2$sfx.g, cum2$sfx.vq AS vqk1
           |  FROM t2$sfx JOIN cum2$sfx ON cum2$sfx.g = t2$sfx.g
           |    AND cum2$sfx.lo <= t2$sfx.k + 1 AND t2$sfx.k + 1 < cum2$sfx.hi),
           |r$sfx AS (
           |  SELECT vk$sfx.g,
           |    CAST(vqk AS DOUBLE) / 100.0
           |      + ((CAST(COALESCE(vqk1, vqk) AS DOUBLE) / 100.0
           |          - CAST(vqk AS DOUBLE) / 100.0) * frac) AS v
           |  FROM vk$sfx LEFT JOIN vk1$sfx ON vk1$sfx.g = vk$sfx.g)""".stripMargin
      s"""WITH c AS (
         |  SELECT l_returnflag AS g,
         |    CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS vq,
         |    COUNT(*) AS cnt
         |  FROM lineitem GROUP BY 1, 2),
         |${walk("c", "m")},
         |meds AS (SELECT g, MAX(v) AS med FROM rm GROUP BY g),
         |cd AS (
         |  SELECT c.g,
         |    CAST(FLOOR(ABS(CAST(c.vq AS DOUBLE) / 100.0 - m.med)
         |      * 100.0 + 0.5) AS BIGINT) AS vq,
         |    CAST(SUM(c.cnt) AS BIGINT) AS cnt
         |  FROM c JOIN meds m ON m.g = c.g GROUP BY 1, 2),
         |${walk("cd", "d")},
         |mads AS (SELECT g, MAX(v) AS mad FROM rd GROUP BY g),
         |base AS (
         |  SELECT c.g, CAST(c.vq AS DOUBLE) / 100.0 AS v, c.cnt, m.med, d.mad
         |  FROM c JOIN meds m ON m.g = c.g JOIN mads d ON d.g = c.g)
         |SELECT g AS l_returnflag, CAST(SUM(cnt) AS BIGINT) AS n,
         |  MAX(med) AS med, MAX(mad) AS mad,
         |  CAST(SUM(CASE WHEN mad > 0.0
         |    AND ABS(0.6745 * (v - med) / mad) > 3.5
         |    THEN cnt ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM base GROUP BY g ORDER BY l_returnflag""".stripMargin
    },

    // Winsorize twin: the quantiles_scalable grid walk at (0.05, 0.95),
    // then clip the distinct-value table against the cuts and aggregate
    // with count-weighted exact integer sums (values equal the Spark
    // side's per-row sums because the sums are exact).
    "stats_winsorized" ->
      """WITH c AS (
        |  SELECT l_returnflag AS g,
        |    CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS vq,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, vq, cnt,
        |    CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY vq) AS BIGINT) AS hi
        |  FROM c),
        |cum2 AS (SELECT g, vq, hi - cnt AS lo, hi FROM cum),
        |n AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
        |t AS (
        |  SELECT g, qi, CAST(n - 1 AS DOUBLE) * q AS tpos
        |  FROM n CROSS JOIN (VALUES (0, 0.05), (1, 0.95)) AS qs(qi, q)),
        |t2 AS (
        |  SELECT g, qi, CAST(FLOOR(tpos) AS BIGINT) AS k,
        |    tpos - FLOOR(tpos) AS frac
        |  FROM t),
        |vk AS (
        |  SELECT t2.g, t2.qi, t2.frac, cum2.vq AS vqk
        |  FROM t2 JOIN cum2 ON cum2.g = t2.g
        |    AND cum2.lo <= t2.k AND t2.k < cum2.hi),
        |vk1 AS (
        |  SELECT t2.g, t2.qi, cum2.vq AS vqk1
        |  FROM t2 JOIN cum2 ON cum2.g = t2.g
        |    AND cum2.lo <= t2.k + 1 AND t2.k + 1 < cum2.hi),
        |r AS (
        |  SELECT vk.g, vk.qi,
        |    CAST(vqk AS DOUBLE) / 100.0
        |      + ((CAST(COALESCE(vqk1, vqk) AS DOUBLE) / 100.0
        |          - CAST(vqk AS DOUBLE) / 100.0) * frac) AS v
        |  FROM vk LEFT JOIN vk1 ON vk1.g = vk.g AND vk1.qi = vk.qi),
        |cuts AS (
        |  SELECT g, MAX(CASE WHEN qi = 0 THEN v END) AS cut_lo,
        |    MAX(CASE WHEN qi = 1 THEN v END) AS cut_hi
        |  FROM r GROUP BY g),
        |cl AS (
        |  SELECT c.g, c.cnt,
        |    CAST(c.vq AS DOUBLE) / 100.0 AS v,
        |    CAST(FLOOR(LEAST(GREATEST(CAST(c.vq AS DOUBLE) / 100.0, cut_lo),
        |      cut_hi) * 100.0 + 0.5) AS BIGINT) AS wq,
        |    cut_lo, cut_hi
        |  FROM c JOIN cuts USING (g))
        |SELECT g AS l_returnflag, CAST(SUM(cnt) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN v < cut_lo THEN cnt ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(SUM(CASE WHEN v > cut_hi THEN cnt ELSE 0 END) AS BIGINT) AS n_hi,
        |  FLOOR(CAST(CAST(SUM(wq * cnt) AS BIGINT) AS DOUBLE)
        |    / CAST(SUM(cnt) AS BIGINT) / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean_wins
        |FROM cl GROUP BY g ORDER BY l_returnflag""".stripMargin,

    "quantiles_scalable" ->
      """WITH c AS (
        |  SELECT l_returnflag AS g,
        |    CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS vq,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, vq, cnt,
        |    CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY vq) AS BIGINT) AS hi
        |  FROM c),
        |cum2 AS (SELECT g, vq, hi - cnt AS lo, hi FROM cum),
        |n AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
        |t AS (
        |  SELECT g, qi, CAST(n - 1 AS DOUBLE) * q AS tpos
        |  FROM n CROSS JOIN (VALUES (0, 0.25), (1, 0.5), (2, 0.75),
        |    (3, 0.99)) AS qs(qi, q)),
        |t2 AS (
        |  SELECT g, qi, CAST(FLOOR(tpos) AS BIGINT) AS k,
        |    tpos - FLOOR(tpos) AS frac
        |  FROM t),
        |vk AS (
        |  SELECT t2.g, t2.qi, t2.frac, cum2.vq AS vqk
        |  FROM t2 JOIN cum2 ON cum2.g = t2.g
        |    AND cum2.lo <= t2.k AND t2.k < cum2.hi),
        |vk1 AS (
        |  SELECT t2.g, t2.qi, cum2.vq AS vqk1
        |  FROM t2 JOIN cum2 ON cum2.g = t2.g
        |    AND cum2.lo <= t2.k + 1 AND t2.k + 1 < cum2.hi),
        |r AS (
        |  SELECT vk.g, vk.qi,
        |    CAST(vqk AS DOUBLE) / 100.0
        |      + ((CAST(COALESCE(vqk1, vqk) AS DOUBLE) / 100.0
        |          - CAST(vqk AS DOUBLE) / 100.0) * frac) AS v
        |  FROM vk LEFT JOIN vk1 ON vk1.g = vk.g AND vk1.qi = vk.qi)
        |SELECT g AS l_returnflag,
        |  MAX(CASE WHEN qi = 0 THEN v END) AS p25,
        |  MAX(CASE WHEN qi = 1 THEN v END) AS p50,
        |  MAX(CASE WHEN qi = 2 THEN v END) AS p75,
        |  MAX(CASE WHEN qi = 3 THEN v END) AS p99
        |FROM r GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "stats_profile" -> (sources.SalesFixture.oracleCte + "\n" +
      s"SELECT * FROM (${profileUnionSql("sales")}) ORDER BY col_name"),

    "stats_histogram" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS vq
        |  FROM lineitem),
        |b AS (
        |  SELECT l_returnflag,
        |    CASE WHEN vq <= 0 THEN 0 ELSE length(to_base(vq, 2)) END AS bucket
        |  FROM q),
        |g AS (
        |  SELECT l_returnflag, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2)
        |SELECT l_returnflag, bucket, n,
        |  CASE WHEN bucket = 0 THEN NULL
        |       ELSE power(2.0, bucket - 1) / 100.0 END AS lo,
        |  CASE WHEN bucket = 0 THEN 0.0
        |       ELSE (power(2.0, bucket) - 1.0) / 100.0 END AS hi
        |FROM g ORDER BY l_returnflag, bucket""".stripMargin,

    "stats_profile_drift" -> (sources.SalesFixture.oracleCte + "\n" +
      s""", p1 AS (
         |  SELECT sales_id, product, price,
         |    CASE WHEN quantity IS NULL THEN FLOOR(total / price)
         |         ELSE quantity END AS quantity,
         |    total, ordered_at, delivery_at
         |  FROM sales
         |  WHERE NOT (quantity IS NULL AND price IS NULL AND total IS NULL)),
         |cleaned AS (
         |  SELECT sales_id, product, price, quantity,
         |    CASE WHEN total IS NULL THEN ROUND(price * quantity, 2)
         |         ELSE total END AS total,
         |    ordered_at, delivery_at
         |  FROM p1),
         |pb AS (SELECT TRUE AS _inb, * FROM (${profileUnionSql("sales")})),
         |pa AS (SELECT TRUE AS _ina, * FROM (${profileUnionSql("cleaned")}))
         |SELECT COALESCE(pb.col_name, pa.col_name) AS col_name,
         |  CASE WHEN _inb IS NULL THEN 'added'
         |       WHEN _ina IS NULL THEN 'removed'
         |       WHEN pb.n IS NOT DISTINCT FROM pa.n
         |        AND pb.n_null IS NOT DISTINCT FROM pa.n_null
         |        AND pb.completeness_6dp IS NOT DISTINCT FROM pa.completeness_6dp
         |        AND pb.n_distinct IS NOT DISTINCT FROM pa.n_distinct
         |        AND pb.mean_2dp IS NOT DISTINCT FROM pa.mean_2dp
         |       THEN 'stable' ELSE 'changed' END AS status,
         |  pa.n - pb.n AS d_n,
         |  pa.n_null - pb.n_null AS d_null,
         |  pa.completeness_6dp - pb.completeness_6dp AS d_completeness,
         |  pa.n_distinct - pb.n_distinct AS d_distinct,
         |  pa.mean_2dp - pb.mean_2dp AS d_mean
         |FROM pb FULL OUTER JOIN pa ON pb.col_name = pa.col_name
         |ORDER BY col_name""".stripMargin),

    "stats_expectations" -> (sources.SalesFixture.oracleCte +
      """
        |SELECT "check", violations,
        |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM (
        |  SELECT 'not_null(o_custkey)' AS "check",
        |    CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique(o_orderkey)',
        |    CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)
        |  UNION ALL
        |  SELECT 'in_range(o_totalprice)',
        |    CAST(COALESCE(SUM(CASE WHEN o_totalprice < 0.0
        |      OR o_totalprice > 450000.0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'in_set(o_orderstatus)',
        |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F', 'P')
        |      THEN 1 ELSE 0 END), 0) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'referential(o_custkey->c_custkey)', CAST(COUNT(*) AS BIGINT)
        |  FROM orders WHERE o_custkey IS NOT NULL
        |    AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'not_null(quantity)',
        |    CAST(COUNT(*) - COUNT(quantity) AS BIGINT)
        |  FROM sales
        |  UNION ALL
        |  SELECT 'unique(product)', CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS cnt FROM sales GROUP BY product)
        |) ORDER BY "check"""".stripMargin)
  )
}
