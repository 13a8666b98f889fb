package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{dec, t}

/** SURVEY.md §2-E — aggregation surface. Spark plans every groupBy as
  * partial (map-side) + final HashAggregate around a single shuffle on
  * the group keys; all money math is decimal-exact (see Tables.dec) so
  * results are aggregation-order-independent and oracle-comparable.
  * Averages are expressed as cast(sum_decimal as double)/count because
  * DuckDB's avg(decimal) yields double while Spark's stays decimal.
  */
object Aggregates {

  /** TPC-H-Q1-style grouped aggregate: sum/avg/min/max/count. */
  private def aggGroupBy(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Global (no-key) aggregate. */
  private def aggGlobal(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_revenue"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"))

  /** DISTINCT projection. */
  private def aggDistinct(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** COUNT(DISTINCT) per group — Catalyst's RewriteDistinctAggregates
    * turns this into a two-phase expand+agg, no driver collection. */
  private def aggCountDistinct(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  /** Approximate COUNT(DISTINCT) via HyperLogLog++ — graduated from
    * spec-only to ORACLE-BOUNDED: the sketch estimate is
    * engine-specific (DuckDB cannot reproduce Spark's HLL++ registers)
    * but its BOUND is oracle-able. The query emits the exact distinct
    * count next to a within_bound flag asserting |estimate − exact| ≤
    * 10% of exact (5σ at the configured rsd = 0.02), in exact integer
    * arithmetic; the oracle emits DuckDB's independently-computed
    * exact count with within_bound = TRUE — so a sketch drifting out
    * of bound now FAILS the driver hash gate instead of being invisible
    * to it. PropertySpec keeps asserting the raw-estimate bound. */
  private def aggApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .selectExpr("l_returnflag", "exact_orders",
        "abs(approx - exact_orders) * 10 <= exact_orders AS within_bound")
      .orderBy("l_returnflag")

  /** E. Mergeable HLL sketches (DataSketches `hll_sketch_agg` /
    * `hll_union_agg` / `hll_sketch_estimate`) — the two-level rollup
    * pattern for APPROXIMATE distinct at 100 TB: each shard (think
    * daily partition) pre-aggregates to a fixed-size binary sketch,
    * stored once; any later query unions sketches instead of re-reading
    * raw data. Register merge at equal lgK is lossless once both
    * sketches are in dense (HLL-register) mode; across the
    * sparse→dense promotion the union's estimator can diverge slightly
    * from the single-pass sketch (measured ~0.8% at sf0.01 — the union
    * target promotes to HLL mode while the single-pass sketch still
    * answers from its exact coupon set). Graduated to ORACLE-BOUNDED:
    * the output carries the exact distinct count (DuckDB-checkable)
    * plus two flags — merge_consistent (|two-level − single-pass| ≤ 2%
    * of single-pass, the mergeability property stated mode-honestly)
    * and within_bound (|estimate − exact| ≤ 5% of exact, generous vs
    * lgK=14's ~0.8% rse) — both exact integer compares; the oracle
    * emits the exact count with both flags TRUE, so either property
    * breaking now fails the driver hash gate. PropertySpec keeps the
    * raw-estimate view. */
  private def aggHllSketchMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val merged = li
      .selectExpr("l_returnflag", "l_orderkey",
        "pmod(hash(l_orderkey), 16) AS shard")
      .groupBy("l_returnflag", "shard")
      .agg(expr("hll_sketch_agg(l_orderkey, 14)").as("sk"))
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")
        .as("approx_orders"))
    val single = li
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 14))")
        .as("single_est"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
    merged.join(single, Seq("l_returnflag"))
      .selectExpr("l_returnflag", "exact_orders",
        "abs(approx_orders - single_est) * 50 <= single_est" +
          " AS merge_consistent",
        "abs(approx_orders - exact_orders) * 20 <= exact_orders" +
          " AS within_bound")
      .orderBy("l_returnflag")
  }

  /** ROLLUP with grouping flags; group keys coalesced to a sentinel so
    * ordering needs no null rules. */
  private def aggRollup(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("sum_qty"), col("n_rows"), col("g_flag"), col("g_status"))
      .orderBy("flag", "status", "g_flag", "g_status")

  /** CUBE over two dimensions. */
  private def aggCube(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy("status", "priority")

  /** Conditional / filtered aggregation. */
  private def aggConditional(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", dec(col("o_totalprice"))))
          .cast("double").as("urgent_revenue"),
        count(when(col("o_orderpriority") === "1-URGENT", lit(1))).as("n_urgent"),
        count(lit(1)).as("n_total"))
      .orderBy("o_orderstatus")

  /** collect_list canonicalized with sort_array (set-style result),
    * then serialized to a CSV string: the driver's pandas harness
    * cannot sort/hash array-typed result columns, so no top-level
    * array may reach it. The list semantics are unchanged — only the
    * final projection renders it as text. */
  private def aggCollect(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .where(col("o_totalprice") > 450000)
      .groupBy("o_custkey")
      .agg(sort_array(collect_list(col("o_orderkey"))).as("raw_orders"),
        count(lit(1)).as("n_big"))
      .select(col("o_custkey"),
        expr("concat_ws(',', transform(raw_orders, x -> cast(x as string)))")
          .as("big_orders"),
        col("n_big"))
      .orderBy("o_custkey")

  /** PIVOT with an explicit (deterministic) value list — wide-format
    * reporting over the same partial+final aggregate machinery. */
  private def aggPivot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .na.fill(0)
      .withColumnsRenamed(Map("1-URGENT" -> "p1", "2-HIGH" -> "p2",
        "3-MEDIUM" -> "p3", "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
      .orderBy("o_orderstatus")

  /** UNPIVOT (melt): the wide pivot result back to long form via
    * stack() — wide→long reshaping runs inside the projection (one
    * Generate per row, no shuffle beyond the source aggregation). */
  private def aggUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    aggPivot(spark, sfDir)
      .selectExpr("o_orderstatus",
        // coalesce is belt-and-braces: aggPivot's na.fill(0) already
        // zeroes empty cells, but an empty (status, priority) combo
        // must serialize as 0 — never NULL — to match the oracle's
        // `count(*) FILTER` semantics at any scale factor.
        """stack(5, 'p1', coalesce(p1, 0L), 'p2', coalesce(p2, 0L),
                 'p3', coalesce(p3, 0L), 'p4', coalesce(p4, 0L),
                 'p5', coalesce(p5, 0L))
           AS (priority, n)""")
      .orderBy("o_orderstatus", "priority")

  /** Exact interpolated percentiles (quantile_cont semantics). The
    * probed quantiles are dyadic rationals (.25/.5/.75) over
    * integer-valued quantities, so `lower + (upper-lower)*frac` is
    * binary-exact in every engine — no rounding tolerance needed. */
  private def aggPercentile(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("median"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        min(col("l_quantity")).as("q_min"),
        max(col("l_quantity")).as("q_max"))
      .orderBy("l_returnflag")

  /** Explicit GROUPING SETS through the SQL entry point (`spark.sql`
    * over a registered view) — same expand+aggregate machinery as
    * rollup/cube, exercised via the SQL-string surface users of the
    * reference's Athena layer would migrate to. */
  private def aggGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "orders").createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
                coalesce(o_orderpriority, '(all)') AS priority,
                count(*) AS n_orders
         FROM orders_gs
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY status, priority""")
  }

  /** Approximate percentiles (Greenwald-Khanna sketch) — the
    * mergeable-sketch path for quantiles at 100 TB, where the exact
    * interpolated form (agg_percentile) would need a full sort per
    * group. Graduated to ORACLE-BOUNDED: sketch internals differ
    * across engines, but the tolerance is oracle-able — the query
    * emits the exact interpolated quantiles (the agg_percentile
    * parity surface, Spark percentile == DuckDB quantile_cont) plus
    * in-tolerance flags |approx − exact| ≤ 2.0 (accuracy=1000 ⇒ rank
    * error ≤ 1/1000 over quantities spanning [1, 50]); the oracle
    * emits the exact quantiles with both flags TRUE. A sketch outside
    * tolerance now fails the driver hash gate. */
  private def aggApproxPercentile(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("am"),
        expr("approx_percentile(l_quantity, 0.9, 1000)").as("a90"),
        expr("percentile(l_quantity, 0.5)").as("exact_median"),
        expr("percentile(l_quantity, 0.9)").as("exact_p90"))
      .selectExpr("l_returnflag", "exact_median", "exact_p90",
        "abs(am - exact_median) <= 2.0d AS median_in_tol",
        "abs(a90 - exact_p90) <= 2.0d AS p90_in_tol")
      .orderBy("l_returnflag")

  /** Statistical aggregates: stddev/variance/correlation/covariance.
    * Both engines use numerically-stable streaming merges whose
    * low-order bits depend on merge order, so results are rounded to
    * 4 decimals on BOTH sides. The gate is probabilistic by nature: it
    * fails only if the cross-engine merge error (~1e-10 relative)
    * straddles an x.xxxx5 boundary — ~1e-6 odds per value at this
    * granule, vs ~1e-4 at 6 decimals. */
  private def aggStats(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_pop(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qty_disc"))
      .orderBy("l_returnflag")

  /** E. Exact higher moments — per-flag skewness and excess kurtosis
    * of cent-unit prices from EXACT raw power sums: x, x², x³, x⁴
    * accumulate as DECIMAL(38,0) (x_e2 ≤ 1e7, so Σx⁴ ≤ ~6e32 ≪ 1e38 —
    * exact; the DuckDB twin uses HUGEINT, its INT128 equivalent), and
    * the shuffle carries five order-independent integer accumulators
    * per group — Spark's own skewness()/kurtosis() stream float
    * moments whose summation order varies run-to-run. The final
    * skew/kurt formulas are a fixed chain of IEEE +,−,×,÷,sqrt on
    * doubles cast from identical exact integers, so both engines
    * produce bit-identical statistics (pow(x, 1.5) is deliberately
    * m2·sqrt(m2): pow is not correctly-rounded, sqrt is). */
  private def aggMoments(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .selectExpr("l_returnflag",
        "cast(cast(round(l_extendedprice * 100) as bigint) as decimal(38,0)) AS x")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      .selectExpr("l_returnflag", "n_rows",
        """cast(((cast(s3 as double) / n_rows)
                 - 3.0 * (cast(s1 as double) / n_rows)
                       * (cast(s2 as double) / n_rows)
                 + 2.0 * (cast(s1 as double) / n_rows)
                       * (cast(s1 as double) / n_rows)
                       * (cast(s1 as double) / n_rows))
                / (((cast(s2 as double) / n_rows)
                    - (cast(s1 as double) / n_rows)
                      * (cast(s1 as double) / n_rows))
                   * sqrt((cast(s2 as double) / n_rows)
                          - (cast(s1 as double) / n_rows)
                            * (cast(s1 as double) / n_rows)))
               as double) AS skewness""",
        """cast(((cast(s4 as double) / n_rows)
                 - 4.0 * (cast(s1 as double) / n_rows)
                       * (cast(s3 as double) / n_rows)
                 + 6.0 * (cast(s1 as double) / n_rows)
                       * (cast(s1 as double) / n_rows)
                       * (cast(s2 as double) / n_rows)
                 - 3.0 * (cast(s1 as double) / n_rows)
                       * (cast(s1 as double) / n_rows)
                       * (cast(s1 as double) / n_rows)
                       * (cast(s1 as double) / n_rows))
                / (((cast(s2 as double) / n_rows)
                    - (cast(s1 as double) / n_rows)
                      * (cast(s1 as double) / n_rows))
                   * ((cast(s2 as double) / n_rows)
                      - (cast(s1 as double) / n_rows)
                        * (cast(s1 as double) / n_rows)))
               - 3.0 as double) AS kurtosis""")
      .orderBy("l_returnflag")

  /** Two-phase salted aggregation — the manual skew defense for keys
    * too hot for one reducer: fan each key out over 16 salts
    * (deterministic hash of the row's own id, not rand(), so re-runs
    * agree), partially aggregate per (key, salt), then combine partials
    * per key. Values are decimal, so the two-phase regrouping cannot
    * change results. AQE's skew-join splitting handles the join case;
    * this is the groupBy-side equivalent. */
  private def aggSalted(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(16)))
      .groupBy("l_returnflag", "salt")
      .agg(sum(dec(col("l_quantity"))).as("pq"), count(lit(1)).as("pc"))
      .groupBy("l_returnflag")
      .agg(sum(col("pq")).cast("double").as("sum_qty"),
        sum(col("pc")).as("n_rows"))
      .orderBy("l_returnflag")

  /** Per-group statistical MODE with an explicit deterministic
    * tie-break (max count, then smallest value) — engines' built-in
    * mode() functions break ties differently, so the count+row_number
    * formulation is both portable AND scale-shaped: the heavy lifting
    * is a map-side-combined count aggregation; the ranking window runs
    * over DISTINCT (group, value) pairs, not rows. */
  private def aggMode(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus")
      .orderBy(col("n").desc, col("o_orderpriority"))
    t(spark, sfDir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("n").as("mode_count"))
      .orderBy("o_orderstatus")
  }

  /** E. Exact distinct counting via bitmaps (`bitmap_bucket_number` /
    * `bitmap_bit_position` / `bitmap_construct_agg` / `bitmap_count`) —
    * the mergeable-EXACT alternative to both naive count(distinct)
    * (whose expand-shuffle carries every (group, value) pair) and HLL
    * (approximate). Values hash into 32k-bit bucket bitmaps; each
    * (group, bucket) partial is a ≤4 KB binary that merges by OR — so
    * at 100 TB the shuffle carries fixed-size bitmaps instead of raw
    * values, pre-aggregated shards stay re-mergeable (the rollup-table
    * pattern), and the final count is exact, not a sketch. */
  private def aggBitmapDistinct(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .selectExpr("l_returnflag",
        "bitmap_bucket_number(l_orderkey) AS bkt",
        "bitmap_bit_position(l_orderkey) AS pos")
      .groupBy("l_returnflag", "bkt")
      .agg(expr("bitmap_count(bitmap_construct_agg(pos))").as("cnt"))
      .groupBy("l_returnflag")
      .agg(sum("cnt").as("n_distinct"))
      .orderBy("l_returnflag")

  /** E. Heavy hitters via `approx_top_k` (Spark 4) — frequency-sketch
    * top-k. The sketch is EXACT while its tracked-item capacity
    * (default 10k) exceeds the column's distinct count, which holds for
    * event_type here — so the key stays oracle-able while exercising
    * the sketch code path; past capacity the same query degrades
    * gracefully to approximate counts instead of blowing memory, which
    * is the point at 100 TB. k = all 5 types (no tie-boundary cut) and
    * the exploded rows re-sort on (count, item) so output order never
    * depends on sketch internals. */
  private def aggApproxTopK(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .selectExpr("approx_top_k(event_type, 5) AS tk")
      .select(explode(col("tk")).as("s"))
      .selectExpr("s.item AS item", "s.count AS cnt")
      .orderBy(col("cnt").desc, col("item"))

  /** E. Two-level mergeable top-k rollup (`approx_top_k_accumulate` /
    * `_combine` / `_estimate`) — the same shard-then-union shape as
    * `agg_hll_sketch_merge` but for heavy hitters: each shard
    * accumulates a fixed-size frequency sketch, shards union by
    * combine, and the estimate is read once at the end. Within
    * capacity the rollup is exact, so it hash-matches the plain
    * aggregation — proving shard-merge losslessness through the oracle
    * itself (no property spec needed). */
  private def aggApproxTopKMerge(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(pmod(col("user_id"), lit(8)).as("shard"))
      .agg(expr("approx_top_k_accumulate(event_type)").as("acc"))
      .agg(expr("approx_top_k_estimate(approx_top_k_combine(acc), 5)").as("tk"))
      .select(explode(col("tk")).as("s"))
      .selectExpr("s.item AS item", "s.count AS cnt")
      .orderBy(col("cnt").desc, col("item"))

  /** E. listagg / string_agg (Spark 4) — ordered string concatenation
    * per group, the report-friendly cousin of collect_list. WITHIN
    * GROUP (ORDER BY …) makes the concatenation order part of the
    * query, not an accident of shuffle arrival — without it the result
    * is nondeterministic by definition. Bounded per group here (top
    * clerks per priority via a pre-filter) because an unbounded
    * listagg at 100 TB is a memory bug, not a query. */
  private def aggStringAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .where(col("o_totalprice") > 450000)
      .selectExpr("o_orderpriority", "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(expr("listagg(o_orderkey, ',') WITHIN GROUP (ORDER BY o_orderkey)")
        .as("keys_csv"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** E. Boolean aggregates — every / some / count_if: the data-quality
    * assertion surface ("did EVERY row pass", "did ANY row trip the
    * alarm") as map-side-combinable aggregates instead of count
    * comparisons. */
  private def aggBool(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderstatus")
      .agg(expr("every(o_totalprice > 1000)").as("all_over_1k"),
        expr("some(o_totalprice > 550000)").as("any_jumbo"),
        expr("count_if(o_orderpriority = '1-URGENT')").as("n_urgent"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** E. median() (Spark 4 exact median) — grouped medians over the
    * 2-decimal money column; even-sized groups interpolate with one
    * IEEE add+divide, identical in both engines, so the result stays
    * hash-exact. Exact median sorts within groups — the approx
    * percentile twin (`agg_approx_percentile`) is the 100 TB path;
    * this one is for the sizes where exactness is cheap. */
  private def aggMedian(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderstatus")
      .agg(expr("median(o_totalprice)").as("median_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** Robust per-group outlier flags via median absolute deviation:
    * flag x when |x − median| > 3·MAD, MAD = median(|x − median|).
    *
    * Exactness: everything stays in INTEGER space. Values quantize to
    * cents (x_e2); an exact interpolated median of bigints is a
    * half-integer, so it is carried as med2 = lo + hi (2× the median,
    * integer), deviations as dev_x2 = |2x − med2| (2× the deviation),
    * the MAD as mad4 (4× it), and the flag dev > 3·MAD compares
    * 2·dev_x2 > 3·mad4 — no float appears anywhere, so the decision
    * boundary is bit-identical across engines.
    *
    * Scale: medians come from a VALUE HISTOGRAM, not Spark's
    * buffering median() (which materializes every group member in the
    * aggregation buffer — unusable when one group spans TBs). The
    * cents quantization bounds the histogram at the value DOMAIN size,
    * independent of row count, so the per-group cumulative window runs
    * over ≤|domain| rows at any corpus scale; the group-median tables
    * are group-cardinality-sized and broadcast back. */
  private def aggOutlierMad(spark: SparkSession, sfDir: String): DataFrame = {
    // exact 2×median per event_type from a value histogram: lo/hi are
    // the lower/upper middle order statistics read off cumulative
    // counts; med2 = lo + hi
    def median2(df: DataFrame, valCol: String): DataFrame = {
      val wcum = Window.partitionBy("event_type").orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.groupBy("event_type", valCol).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wcum))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
        .selectExpr("event_type", valCol, "cum",
          "(n + 1) div 2 AS p_lo", "n div 2 + 1 AS p_hi")
        .groupBy("event_type")
        .agg((min(when(col("cum") >= col("p_lo"), col(valCol))) +
          min(when(col("cum") >= col("p_hi"), col(valCol)))).as("m2"))
    }
    val x = t(spark, sfDir, "events")
      .where(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("x_e2"))
    val med = median2(x, "x_e2").withColumnRenamed("m2", "med2")
    val dev = x.join(broadcast(med), Seq("event_type"))
      .withColumn("dev_x2", abs(col("x_e2") * 2 - col("med2")))
    val mad = median2(dev, "dev_x2").withColumnRenamed("m2", "mad4")
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("x_e2"),
        col("med2"), col("dev_x2"), col("mad4"),
        (col("dev_x2") * 2 > col("mad4") * 3).as("is_outlier"))
      .orderBy("event_id")
  }

  /** E. Weighted median per group — the order statistic under a weight
    * column (median revenue-dollar weighted by shipped quantity, the
    * "what price point moves half the volume" question percentile()
    * can't answer). Same value-HISTOGRAM discipline as the MAD key:
    * prices quantize to whole dollars, so the histogram is bounded by
    * the price DOMAIN (~100k buckets) independent of row count; the
    * cumulative-weight window runs over the histogram, never the rows,
    * and the median is the first bucket where 2·cum ≥ total — all
    * exact bigint comparisons, no interpolation, engine-identical. The
    * data-sized work is one map-side-combined (flag, dollar) count
    * shuffle; dollar quantization is the knob that keeps the domain
    * bounded at any corpus scale. */
  private def aggWeightedPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = t(spark, sfDir, "lineitem")
      .selectExpr("l_returnflag",
        "cast(round(l_extendedprice) as bigint) AS p_usd",
        "cast(l_quantity as bigint) AS w")
      .groupBy("l_returnflag", "p_usd").agg(sum(col("w")).as("w"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("p_usd")
    val wAll = Window.partitionBy("l_returnflag")
    hist
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("total", sum(col("w")).over(wAll))
      .where(col("cum") * 2 >= col("total"))
      .withColumn("rk", row_number().over(wCum))
      .where(col("rk") === 1)
      .selectExpr("l_returnflag", "p_usd AS w_median_usd",
        "total AS total_weight")
      .orderBy("l_returnflag")
  }

  /** E. Equi-depth histogram boundaries — the ANALYZE-style decile
    * fence table per return flag: boundary d (1..9) is the FIRST
    * whole-dollar price bucket where 10·cum ≥ d·total. Same bounded
    * value-HISTOGRAM discipline as [[aggWeightedPercentile]]: the
    * data-sized work is one map-side-combined (flag, dollar) count
    * shuffle; the cumulative window and the 9-way fence explode run
    * over the bounded price DOMAIN (~100k buckets), never the rows;
    * every comparison is exact bigint — no interpolation, engine-
    * identical. This is the distribution shape a CBO consumes for
    * selectivity estimation (catalog_analyze_stats collects the
    * counts; this key builds the histogram those estimates need). */
  private def aggEquidepthHist(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = t(spark, sfDir, "lineitem")
      .selectExpr("l_returnflag",
        "cast(round(l_extendedprice) as bigint) AS p_usd")
      .groupBy("l_returnflag", "p_usd").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("p_usd")
    val wAll = Window.partitionBy("l_returnflag")
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("total", sum(col("c")).over(wAll))
      .withColumn("decile", explode(typedLit(List(1, 2, 3, 4, 5, 6, 7, 8, 9))))
      .where(col("cum") * 10 >= col("decile") * col("total"))
      .groupBy("l_returnflag", "decile")
      .agg(min(col("p_usd")).as("boundary_usd"),
        max(col("total")).as("total_rows"))
      .selectExpr("l_returnflag", "CAST(decile AS INT) AS decile",
        "boundary_usd", "total_rows")
      .orderBy("l_returnflag", "decile")
  }

  /** E. Gini concentration coefficient of order value per priority
    * class — the inequality statistic a corpus-curation dashboard
    * wants per domain/source ("is 1% of customers 90% of the
    * revenue" = "is 1% of domains 90% of the tokens"). Exact rank
    * statistic WITHOUT a row-level sort: on the bounded whole-dollar
    * histogram, the tied-rank identity 2·Σᵢ i·x₍ᵢ₎ =
    * Σ_buckets v·c·(2·F_prev + c + 1) turns the sorted-rank sum into
    * one cumulative-count window over the value DOMAIN (same
    * discipline as [[aggEquidepthHist]]). All three aggregates are
    * exact int64 (v·c·2F ≤ dollars·n² ≈ 7e16 at the ×8 corpus —
    * far inside int64; the dollar quantization is the knob that keeps
    * it there at larger scale); the single final ratio is evaluated
    * in DOUBLES with identical operand order in both engines
    * (operand-identical casts of exact integers — deterministic even
    * past 2^53, where the cast rounds the same way in every IEEE
    * engine), rounded once to e6. */
  private def aggGini(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = t(spark, sfDir, "orders")
      .selectExpr("o_orderpriority",
        "cast(round(o_totalprice) as bigint) AS v")
      .groupBy("o_orderpriority", "v").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("o_orderpriority").orderBy("v")
    hist
      .withColumn("fprev", sum(col("c")).over(wCum) - col("c"))
      .groupBy("o_orderpriority")
      .agg(sum(expr("v * c * (2 * fprev + c + 1)")).as("s2ix"),
        sum(expr("v * c")).as("sx"),
        sum(col("c")).as("n"))
      // greatest(sx, 1): an all-zero-value group would make the Gini
      // denominator n*sx = 0 — Spark rounds the resulting NaN to NULL
      // while DuckDB's CAST(NaN) raises. Same degenerate-data guard
      // convention as win_seasonal_profile / agg_ab_ttest; unreachable
      // on current fixtures (prices are positive) but engine-equivalent
      // on any input.
      .selectExpr("o_orderpriority", "n", "sx AS total_usd",
        """CAST(round(1000000.0 *
             (CAST(s2ix AS DOUBLE) -
              (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(greatest(sx, 1) AS DOUBLE)))
           AS BIGINT) AS gini_e6""")
      .orderBy("o_orderpriority")
  }

  /** E. Theil inequality index — Gini's information-theoretic sibling
    * (T = (1/n)·Σ (x/μ)·ln(x/μ)): decomposable across subgroups where
    * Gini is not, which is why DQ/economics dashboards report both.
    * Same scale shape as agg_gini: the statistic runs on the bounded
    * (group, dollar-value) HISTOGRAM, never the rows — one grouped
    * count, one totals join, arithmetic on histogram-sized relations.
    * Engine parity by the e6-ln device (agg_entropy): each distinct
    * value's ln(v·n/S) is computed from exact integers and rounded
    * ONCE to a scaled BIGINT, Σ c·v·l_e6 accumulates exactly
    * (order-independent), and one rounded double division by the
    * exact total ends it. Zero-value rows are excluded on both sides
    * (their x·ln x contribution is 0 by limit); prices are positive
    * on the fixture so the filter is a no-op guard. */
  private def aggTheil(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = t(spark, sfDir, "orders")
      .selectExpr("o_orderpriority",
        "cast(round(o_totalprice) as bigint) AS v")
      .where(col("v") > 0)
      .groupBy("o_orderpriority", "v").agg(count(lit(1)).as("c"))
    val tot = hist.groupBy("o_orderpriority")
      .agg(sum(expr("v * c")).as("s"), sum(col("c")).as("n"))
    hist.join(tot, Seq("o_orderpriority"))
      .selectExpr("o_orderpriority", "c", "v", "s", "n",
        """cast(round(ln(cast(v as double) * cast(n as double)
                         / cast(s as double)) * 1000000.0) as bigint)
           AS l_e6""")
      .groupBy("o_orderpriority")
      .agg(max(col("n")).as("n"), max(col("s")).as("total_usd"),
        sum(expr("c * v * l_e6")).as("num"))
      .selectExpr("o_orderpriority", "n", "total_usd",
        """CAST(round(CAST(num AS DOUBLE) / CAST(total_usd AS DOUBLE))
           AS BIGINT) AS theil_e6""")
      .orderBy("o_orderpriority")
  }

  /** First-digit Benford expectation log10(1+1/d), d = 1..9, as FIXED
    * e6 integers — interpolated into BOTH engines (the libm-free
    * parity device shared with the NDCG discount table; PropertySpec
    * re-derives each constant from log10). CASE keys on `digit`. */
  private val BenfordE6: String =
    """(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
         WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
         WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
         ELSE 45757 END)"""

  /** E. Benford first-digit conformance per priority class — the
    * data-quality screen for fabricated or truncated numeric columns
    * (a synthetic or clipped price column shows up as a first-digit
    * distribution far from log10(1+1/d)). One map-side-combined
    * (group, digit) count shuffle; the 9-row-per-group deviation
    * table is exact integer ppm against the fixed expectation
    * constants — no log in either engine. */
  private def aggBenford(spark: SparkSession, sfDir: String): DataFrame = {
    val cnt = t(spark, sfDir, "orders")
      .selectExpr("o_orderpriority",
        """CAST(substring(CAST(CAST(round(o_totalprice) AS BIGINT)
           AS STRING), 1, 1) AS INT) AS digit""")
      .groupBy("o_orderpriority", "digit").agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("o_orderpriority").agg(sum(col("n")).as("total"))
    cnt.join(broadcast(tot), Seq("o_orderpriority"))
      .selectExpr("o_orderpriority", "digit", "n",
        "CAST(n * 1000000 DIV total AS BIGINT) AS share_ppm",
        s"CAST($BenfordE6 AS BIGINT) AS expected_ppm",
        s"""CAST(CAST(n * 1000000 DIV total AS BIGINT)
            - $BenfordE6 AS BIGINT) AS dev_ppm""")
      .orderBy("o_orderpriority", "digit")
  }

  /** E. One-vs-rest two-sample z-test on mean event value per event
    * type — the A/B significance primitive ("does this event class
    * monetize differently from the rest of the stream"). Each group's
    * n/Σx/Σx² accumulate as exact int64 in ONE corpus pass (whole-
    * dollar quantization keeps Σx² ≤ dollars²·rows ≈ 1e15 at the ×8
    * corpus); the rest-side moments are the broadcast 1-row totals
    * minus the group's own — no second pass, no self-join. The z²
    * statistic is a single fixed double expression over those exact
    * integers (identical operand order in both engines, the
    * Mann-Kendall convention), emitted e6-rounded next to the α=0.05
    * verdict (z² vs 1.96² = 3.8416 exactly). Sample variances use the
    * n/(n−1) correction; BOTH degenerate shapes are guarded to
    * 'insufficient': a one-group rest side (n < 2) and a zero pooled
    * variance (constant whole-dollar values on both sides — se2 ≤ 0,
    * where an unguarded divide-by-zero is exactly where engines
    * diverge: Spark yields ±Inf/NaN while DuckDB defines x/0.0 as
    * NULL). The se2 guard is the same fixed double expression in both
    * engines, so the guard itself cannot diverge either. */
  private def aggAbTtest(spark: SparkSession, sfDir: String): DataFrame = {
    val g = t(spark, sfDir, "events")
      .selectExpr("event_type", "cast(round(value) as bigint) AS v")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(expr("v * v")).as("ss"))
    val tot = g.agg(sum(col("n")).as("tn"), sum(col("s")).as("ts"),
      sum(col("ss")).as("tss"))
    g.crossJoin(broadcast(tot))
      .selectExpr("event_type", "n",
        "CAST(tn - n AS BIGINT) AS n2",
        "s", "ss", "CAST(ts - s AS BIGINT) AS s2",
        "CAST(tss - ss AS BIGINT) AS ss2")
      .selectExpr("event_type", "n", "n2",
        """CASE WHEN n < 2 OR n2 < 2 THEN CAST(NULL AS DOUBLE) ELSE
           (CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) -
            (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) *
            (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) /
           (CAST(n AS DOUBLE) - 1.0) +
           (CAST(ss2 AS DOUBLE) / CAST(n2 AS DOUBLE) -
            (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) *
            (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))) /
           (CAST(n2 AS DOUBLE) - 1.0) END AS se2""",
        """CAST(s AS DOUBLE) / CAST(n AS DOUBLE) -
           CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS d""")
      .selectExpr("event_type", "n", "n2",
        """CASE WHEN se2 IS NULL OR se2 <= 0.0 THEN CAST(NULL AS BIGINT)
           ELSE CAST(round(1000000.0 * d * d / se2) AS BIGINT)
           END AS z2_e6""")
      .selectExpr("event_type", "n", "n2", "z2_e6",
        """CASE WHEN z2_e6 IS NULL THEN 'insufficient'
                WHEN z2_e6 > 3841600 THEN 'significant'
                ELSE 'not_significant' END AS verdict""")
      .orderBy("event_type")
  }

  /** Per-segment Shannon entropy of the event-type mix — the diversity
    * metric a corpus-quality dashboard wants per source/domain. Engine
    * parity for a log-based aggregate follows the repo's e6 trick
    * (llm_unigram_logprob / llm_dsir_weight): each category's ln(p) is
    * rounded once to a scaled BIGINT, the Σ cnt·lp_e6 accumulates in
    * exact integer arithmetic (order-independent — a raw double sum
    * would be partition-order rounding), and ONE double division at the
    * end produces the result. Two group-by shuffles, both on
    * group-count-sized relations after the first map-side combine. */
  private def aggEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val cnts = t(spark, sfDir, "events")
      .selectExpr("user_id % 10 AS segment", "event_type")
      .groupBy("segment", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val tot = cnts.groupBy("segment")
      .agg(sum(col("cnt")).as("n_events"), count(lit(1)).as("n_types"))
    cnts.join(tot, "segment")
      .selectExpr("segment", "n_events", "n_types", "cnt",
        """cast(round(ln(cast(cnt as double) / cast(n_events as double))
                      * 1000000.0) as bigint) AS lp_e6""")
      .groupBy("segment", "n_events", "n_types")
      .agg(sum(col("cnt") * col("lp_e6")).as("s"))
      .selectExpr("segment", "n_events", "n_types",
        """-(cast(s as double) / cast(n_events as double) / 1000000.0)
           AS entropy_nats""")
      .orderBy("segment")
  }

  /** Grouped OLS regression (regr_slope/regr_intercept/regr_r2) the
    * engine-exact way: Spark's native regr_* aggregates accumulate
    * doubles in partition order (non-deterministic across engines and
    * runs), so instead the five moment sums n, Σx, Σy, Σxy, Σx², Σy²
    * accumulate as EXACT decimals (the corpus' money doubles are
    * 2-decimal, products are decimal(38,4) — order-independent), each
    * sum casts to double once, and the closed-form slope/intercept/r²
    * are identical double arithmetic on identical inputs in both
    * engines. One group-by shuffle, partials map-side. Degenerate
    * groups (zero x-variance) are excluded by a predicate on the same
    * doubles, so no NaN/Inf can surface. */
  private def aggRegression(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("c_acctbal"))).cast("double").as("sx"),
        sum(dec(col("o_totalprice"))).cast("double").as("sy"),
        sum(dec(col("c_acctbal")) * dec(col("o_totalprice")))
          .cast("double").as("sxy"),
        sum(dec(col("c_acctbal")) * dec(col("c_acctbal")))
          .cast("double").as("sxx"),
        sum(dec(col("o_totalprice")) * dec(col("o_totalprice")))
          .cast("double").as("syy"))
      .where(col("n") >= 2 &&
        col("n") * col("sxx") - col("sx") * col("sx") =!= 0.0 &&
        // zero y-variance would make r2 = 0/0 = NaN; exclude in BOTH
        // engines (same predicate in the oracle)
        col("n") * col("syy") - col("sy") * col("sy") =!= 0.0)
      .selectExpr("nationkey", "n",
        // Outputs are rounded to a fixed decimal granularity on BOTH
        // sides: the moment sums are exact decimals, but their
        // decimal->double casts are not bit-identical across engines
        // (DuckDB's scaled-int cast vs the JVM's correctly-rounded
        // BigDecimal cast can differ in the last ULP — observed on r2
        // at sf0.01). round() quantizes both engines to the same
        // rational p/10^k, whose double conversion IS correctly
        // rounded in both, so a last-ULP input wobble cannot flip the
        // emitted value unless it sits within ULPs of a rounding
        // boundary (audited at all 3 SFs: min boundary distance is
        // ~0.005 granularity ≈ 180× the worst per-value ULP noise).
        """round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope""",
        """round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept""",
        """round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS r2""")
      .orderBy("nationkey")
  }

  /** E. Count-Min sketch — the mergeable sub-linear frequency summary
    * (Cormode–Muthukrishnan) behind heavy-hitter monitoring at stream
    * scale: depth d=3 independent hash rows × width w=4096 cells;
    * point estimate = min over rows of the probed cell (always an
    * OVER-estimate, never under). Cells are STRING buckets (first 3
    * hex chars of md5(key '#' row)) so both engines derive slots with
    * zero numeric-parsing divergence — the same device as the LSH
    * band hashes. The sketch builds from the PER-KEY exact counts
    * (one key-grouped shuffle with map-side combine), then explodes
    * only the DISTINCT keys ×3 into (row, cell) sums — arithmetic-
    * identical to hashing every raw occurrence (CMS cells are sums,
    * and addition associates through the pre-agg) but the explode and
    * second shuffle carry key-cardinality rows, not corpus rows
    * (measured 2.2 s → 0.6 s at sf0.1). The cell table is bounded by
    * d·w = 12,288 rows at ANY corpus size — the whole sketch
    * broadcasts, which is exactly why production pipelines ship CMS
    * instead of exact counts. Probes are part keys 1–5 (a pushed-down
    * scan filter, no second corpus pass), joined map-side against the
    * broadcast sketch next to their exact counts so the emitted row
    * shows estimate ≥ exact and by how much. Deterministic end to end
    * — the md5 cells make even the collision pattern
    * engine-identical. */
  private def aggCountMin(spark: SparkSession, sfDir: String): DataFrame = {
    val cellsOf = "transform(sequence(0, 2), r -> struct(r AS row, " +
      "substring(md5(concat(cast(l_partkey as string), '#', " +
      "cast(r as string))), 1, 3) AS cell))"
    val keyCounts = t(spark, sfDir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val sketch = keyCounts
      .selectExpr(s"explode($cellsOf) AS rc", "cnt")
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(sum(col("cnt")).as("cnt"))
    val probes = keyCounts.where(col("l_partkey") <= 5)
      .selectExpr("l_partkey", "cnt AS exact_cnt", s"explode($cellsOf) AS rc")
      .select(col("l_partkey"), col("exact_cnt"),
        col("rc.row").as("row"), col("rc.cell").as("cell"))
    probes
      .join(broadcast(sketch), Seq("row", "cell"))
      .groupBy("l_partkey", "exact_cnt")
      .agg(min(col("cnt")).as("est_cnt"))
      .orderBy("l_partkey")
  }

  /** E. Chi-square test of independence (event_type × day-of-week) +
    * Cramér's V — the categorical-association screen every
    * experimentation/DQ dashboard runs ("is traffic mix independent of
    * weekday, or did a segment shift"). One map-side-combined
    * (type, dow) count shuffle builds the contingency table; margins
    * come from re-aggregating the BOUNDED cell table (≤ types×7 rows at
    * ANY corpus size), never from a second corpus pass. Engine parity:
    * each cell's deviation d = n·o − rt·ct stays an exact int64
    * (n·o ≤ ~5e12 even on the ×64 corpus), the per-cell term
    * 1e6·d²/(n·rt·ct) is ONE fixed double expression over those exact
    * integers rounded ONCE to e6 (the denominator is a double product
    * — n·rt·ct would brush int64 at the ×8 corpus), and the statistic
    * is the exact integer sum of the 35 cell terms — aggregation-order-
    * independent. Cramér's V ends it with one IEEE-exact sqrt (sqrt is
    * correctly-rounded by the standard, so bit-identical across
    * engines on the identical quotient). */
  private def aggChiSquare(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = t(spark, sfDir, "events")
      .selectExpr("event_type", "dayofweek(ts) AS dow")
      .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("event_type").agg(sum(col("o")).as("rt"))
    val colTot = cells.groupBy("dow").agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("event_type")).as("r_levels"),
      countDistinct(col("dow")).as("c_levels"))
    cells
      .join(broadcast(rowTot), Seq("event_type"))
      .join(broadcast(colTot), Seq("dow"))
      .crossJoin(broadcast(n))
      .selectExpr("n", "r_levels", "c_levels",
        "n * o - rt * ct AS d", "rt", "ct")
      .selectExpr("n", "r_levels", "c_levels",
        """CAST(round(1000000.0 * CAST(d AS DOUBLE) * CAST(d AS DOUBLE) /
             (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)))
           AS BIGINT) AS term_e6""")
      .groupBy("n", "r_levels", "c_levels")
      .agg(count(lit(1)).as("n_cells"), sum(col("term_e6")).as("chi2_e6"))
      .selectExpr("n", "n_cells",
        "(r_levels - 1) * (c_levels - 1) AS dof", "chi2_e6",
        // V = sqrt(chi2 / (n·min(r−1,c−1))); both engines evaluate the
        // identical double quotient, then IEEE-754's correctly-rounded
        // sqrt — no libm dependence beyond the standard's guarantee.
        """CAST(round(1000000.0 * sqrt(CAST(chi2_e6 AS DOUBLE) / 1000000.0 /
             (CAST(n AS DOUBLE) *
              CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE))))
           AS BIGINT) AS cramers_v_e6""")
  }

  /** E. Mann–Whitney U (rank-sum) test between two event classes'
    * purchase values — the nonparametric sibling of [[aggAbTtest]]:
    * compares DISTRIBUTIONS, not means, so it survives the heavy-tailed
    * value columns where a t-test's normality assumption is fiction.
    * The textbook formulation globally ranks every row (a full sort);
    * this one never ranks rows at all: values quantize to cents, so U
    * is computed from the bounded VALUE HISTOGRAM — U = Σ_v nA(v)·
    * (cumB(<v) + tiesB(v)/2), evaluated as exact integer 2U to dodge
    * the half — the same vocab-bound device as agg_gini/agg_theil (the
    * histogram is ≤ distinct-cents-values rows at ANY corpus size; one
    * data-sized count shuffle builds it). The running cumB is a window
    * over the histogram, not the data. Tie-corrected normal
    * approximation: σ² = n1n2/12·[(n+1) − Σ(t³−t)/(n(n−1))] with
    * Σ(t³−t) an exact integer histogram sum; z is ONE fixed double
    * expression over exact integers rounded once to e6 (guarded for
    * the all-tied σ=0 degenerate case, the agg_ab_ttest convention).
    * Rank-biserial effect size r = 1 − 2U/(n1n2) rides the same exact
    * integers. */
  private def aggMannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    // value IS NOT NULL: a NULL value would mint a v=NULL histogram
    // bucket, and the cumulative window's ORDER BY v places NULLs
    // FIRST in Spark but LAST in DuckDB, shifting every cum count —
    // the stated-assumption-made-executable convention (win_attr).
    val hist = t(spark, sfDir, "events")
      .where(col("event_type").isin("purchase", "click") &&
        col("value").isNotNull)
      .selectExpr("cast(round(value * 100) as bigint) AS v",
        "event_type = 'purchase' AS is_a")
      .groupBy("v")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("a_c"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("b_c"))
    // running B-count strictly below v: a window over the bounded
    // cents histogram (vocab-sized, the benign single-partition class)
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum_b_le", sum(col("b_c")).over(wCum))
      .selectExpr("a_c", "b_c", "cum_b_le - b_c AS cum_b_lt")
      .agg(sum(col("a_c")).as("n1"), sum(col("b_c")).as("n2"),
        sum(expr("a_c * (2 * cum_b_lt + b_c)")).as("u2x"),
        sum(expr("(a_c + b_c) * (a_c + b_c) * (a_c + b_c) - (a_c + b_c)"))
          .as("tie3"))
      .selectExpr("n1", "n2", "u2x", "tie3",
        """CASE WHEN n1 * n2 = 0 OR
                CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
                  (CAST(n1 + n2 + 1 AS DOUBLE) -
                   CAST(tie3 AS DOUBLE) /
                   (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))
                  <= 0.0
           THEN NULL
           ELSE CAST(round(1000000.0 *
             (CAST(u2x AS DOUBLE) / 2.0 -
              CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) /
             sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
                  (CAST(n1 + n2 + 1 AS DOUBLE) -
                   CAST(tie3 AS DOUBLE) /
                   (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))))
             AS BIGINT) END AS z_e6""",
        """CAST(round(1000000.0 * (1.0 - CAST(u2x AS DOUBLE) /
             (CAST(greatest(n1, 1) AS DOUBLE) *
              CAST(greatest(n2, 1) AS DOUBLE))))
           AS BIGINT) AS rank_biserial_e6""")
  }

  /** E. Two-sample Kolmogorov–Smirnov test between the purchase and
    * click value distributions — the distribution-shift screen that
    * completes the nonparametric toolkit ([[aggMannWhitney]] detects
    * location shift; KS detects ANY shape difference). Same
    * never-rank-rows device: both empirical CDFs live on the bounded
    * cents histogram, D = sup|F1 − F2| is evaluated at each distinct
    * value as the exact integer max of |cumA·n2 − cumB·n1| (CDFs
    * cross-multiplied so no fraction exists until the final e6
    * division), and the α=0.05 decision compares against the
    * asymptotic critical value 1.358·√((n1+n2)/(n1·n2)) — one fixed
    * double expression over exact integers, rounded once. One
    * data-sized count shuffle; everything else histogram-sized. */
  private def aggKsTest(spark: SparkSession, sfDir: String): DataFrame = {
    // value IS NOT NULL: same NULL-bucket window-order guard as
    // [[aggMannWhitney]] — Spark orders NULLs first, DuckDB last.
    val hist = t(spark, sfDir, "events")
      .where(col("event_type").isin("purchase", "click") &&
        col("value").isNotNull)
      .selectExpr("cast(round(value * 100) as bigint) AS v",
        "event_type = 'purchase' AS is_a")
      .groupBy("v")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("a_c"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("b_c"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("a_c")).as("n1"), sum(col("b_c")).as("n2"))
    hist
      .withColumn("cum_a", sum(col("a_c")).over(wCum))
      .withColumn("cum_b", sum(col("b_c")).over(wCum))
      .crossJoin(broadcast(tot))
      .groupBy("n1", "n2")
      .agg(max(expr("abs(cum_a * n2 - cum_b * n1)")).as("d_num"))
      .selectExpr("n1", "n2", "d_num",
        "CAST(d_num * 1000000 DIV (n1 * n2) AS BIGINT) AS ks_e6",
        """CAST(round(1358000.0 *
             sqrt(CAST(n1 + n2 AS DOUBLE) /
                  (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))))
           AS BIGINT) AS crit_e6""")
      .selectExpr("n1", "n2", "d_num", "ks_e6", "crit_e6",
        "ks_e6 > crit_e6 AS reject_h0")
  }

  /** Poisson(1) CDF thresholds scaled to 16⁶ (the 6-hex-digit md5
    * prefix domain) as FIXED integer constants — the libm-free parity
    * device shared with the Benford table; PropertySpec re-derives
    * each from exp(−1)/k!. A uniform draw u ∈ [0, 16⁷⁷⁷²¹⁶) maps to
    * the bootstrap weight w = #{thresholds ≤ u}. */
  private val PoissonCdf16: Seq[Long] =
    Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L)

  /** E. Bootstrap confidence interval for the mean purchase value by
    * DETERMINISTIC POISSON BOOTSTRAP — the resampling scheme that
    * actually distributes (Chamandy et al., "Estimating Uncertainty
    * for Massive Data Streams"): classic bootstrap needs n draws WITH
    * replacement per replica (a global operation), Poisson bootstrap
    * gives each row an independent Poisson(1) multiplicity per
    * replica, so 40 replicas are one map-side pass amplifying each row
    * into 40 weighted contributions that partial-aggregate into 40
    * (Σw, Σwx) pairs — no shuffle bigger than 40 groups, no
    * randomness: the weight is the md5-prefix uniform of
    * (event_id, replica) cut by the fixed Poisson CDF thresholds, so
    * both engines replay the identical resample. Replica means round
    * ONCE to e2 cents; the 95% CI is the [2nd smallest, 2nd largest]
    * of the 40 ordered replica means (the ~2.5/97.5 percentile rule,
    * stated exactly so the oracle replays it on the 40-row table). */
  private def aggBootstrapCi(spark: SparkSession, sfDir: String): DataFrame = {
    val Seq(c0, c1, c2, c3, c4) = PoissonCdf16
    val w =
      s"""CASE WHEN u < ${c0}L THEN 0 WHEN u < ${c1}L THEN 1
              WHEN u < ${c2}L THEN 2 WHEN u < ${c3}L THEN 3
              WHEN u < ${c4}L THEN 4 ELSE 5 END"""
    val reps = t(spark, sfDir, "events")
      .where(col("event_type") === "purchase")
      .selectExpr("event_id", "cast(round(value * 100) as bigint) AS x",
        "explode(sequence(0, 39)) AS b")
      .selectExpr("b", "x",
        """CAST(conv(substring(md5(concat(CAST(event_id AS STRING),
           '#boot#', CAST(b AS STRING))), 1, 6), 16, 10) AS BIGINT)
           AS u""")
      .selectExpr("b", "x", s"$w AS w")
      .groupBy("b")
      .agg(sum(col("w")).as("n_b"), sum(expr("w * x")).as("s_b"))
      .selectExpr("b",
        """CAST(round(100.0 * CAST(s_b AS DOUBLE) /
           CAST(greatest(n_b, 1) AS DOUBLE)) AS BIGINT) AS mean_ce2""")
    val ranked = reps.withColumn("rk", row_number().over(
      Window.orderBy(col("mean_ce2"), col("b"))))
    val point = t(spark, sfDir, "events")
      .where(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("s"))
      .selectExpr("n",
        """CAST(round(100.0 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           AS BIGINT) AS mean_ce2""")
    ranked.where(col("rk").isin(2, 39))
      .groupBy(lit(1).as("one"))
      .agg(min(col("mean_ce2")).as("ci_lo_ce2"),
        max(col("mean_ce2")).as("ci_hi_ce2"))
      .crossJoin(broadcast(point))
      .selectExpr("n", "mean_ce2", "ci_lo_ce2", "ci_hi_ce2",
        "ci_hi_ce2 - ci_lo_ce2 AS ci_width_ce2",
        "CAST(40 AS INT) AS n_replicas")
  }

  /** Pearson corr_e6 from exact integer moments — ONE double
    * expression with fixed operand order, shared verbatim by the Spark
    * plan and the DuckDB oracle (string-interpolated into both, so the
    * two engines cannot drift). greatest(·, 1.0) guards the
    * zero-variance constant column (div-by-zero is where engines
    * diverge). The n·Σxy products would brush int64 at the ×8 corpus,
    * so every moment casts to double FIRST — deterministic, since the
    * int64 moments themselves are exact. */
  private def corrE6(sx: String, sy: String, sxx: String, syy: String,
                     sxy: String): String =
    s"""CAST(round(1000000.0 *
         (CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE) -
          CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE)) /
         (sqrt(greatest(CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE) -
            CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE), 1.0)) *
          sqrt(greatest(CAST(n AS DOUBLE) * CAST($syy AS DOUBLE) -
            CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE), 1.0))))
       AS BIGINT)"""

  private val CorrPairs: Seq[(String, String, String)] = Seq(
    ("quantity~price", "q", "p"), ("quantity~discount", "q", "d"),
    ("quantity~tax", "q", "x"), ("price~discount", "p", "d"),
    ("price~tax", "p", "x"), ("discount~tax", "d", "x"))

  /** E. Pairwise correlation matrix over lineitem's numeric columns —
    * the data-profiling staple every feature store publishes (which
    * columns co-move; which are redundant before a model sees them).
    * ALL six pairwise correlations come from ONE corpus pass: the 15
    * moments (n, 4 sums, 4 sum-of-squares, 6 cross-sums) accumulate as
    * exact int64 partials (columns quantized to dollars / whole units
    * / percent so Σx² stays ≤ ~5e16 even at the ×8 corpus) and the
    * matrix itself is arithmetic on the single moments row — never a
    * per-pair pass, never a shuffle beyond the global partial agg.
    * Each corr is the shared [[corrE6]] expression. */
  private def aggCorrMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val m = t(spark, sfDir, "lineitem")
      .selectExpr("CAST(round(l_quantity) AS BIGINT) AS q",
        "CAST(round(l_extendedprice) AS BIGINT) AS p",
        "CAST(round(l_discount * 100) AS BIGINT) AS d",
        "CAST(round(l_tax * 100) AS BIGINT) AS x")
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("p")).as("sp"),
        sum(col("d")).as("sd"), sum(col("x")).as("sx"),
        sum(expr("q * q")).as("sqq"), sum(expr("p * p")).as("spp"),
        sum(expr("d * d")).as("sdd"), sum(expr("x * x")).as("sxx"),
        sum(expr("q * p")).as("sqp"), sum(expr("q * d")).as("sqd"),
        sum(expr("q * x")).as("sqx"), sum(expr("p * d")).as("spd"),
        sum(expr("p * x")).as("spx"), sum(expr("d * x")).as("sdx"))
    val rows = CorrPairs.map { case (name, a, b) =>
      s"'$name', ${corrE6(s"s$a", s"s$b", s"s$a$a", s"s$b$b", s"s$a$b")}"
    }
    m.selectExpr("n",
      s"stack(${CorrPairs.size}, ${rows.mkString(", ")}) AS (pair, corr_e6)")
      .select("pair", "corr_e6", "n")
      .orderBy("pair")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_corr_matrix" -> (aggCorrMatrix _),
    "agg_bootstrap_ci" -> (aggBootstrapCi _),
    "agg_ks_test" -> (aggKsTest _),
    "agg_chi_square" -> (aggChiSquare _),
    "agg_mann_whitney" -> (aggMannWhitney _),
    "agg_countmin" -> (aggCountMin _),
    "agg_entropy" -> (aggEntropy _),
    "agg_regression" -> (aggRegression _),
    "agg_weighted_percentile" -> (aggWeightedPercentile _),
    "agg_equidepth_hist" -> (aggEquidepthHist _),
    "agg_gini" -> (aggGini _),
    "agg_theil_index" -> (aggTheil _),
    "agg_benford" -> (aggBenford _),
    "agg_ab_ttest" -> (aggAbTtest _),
    "agg_median" -> (aggMedian _),
    "agg_outlier_mad" -> (aggOutlierMad _),
    "agg_bool" -> (aggBool _),
    "agg_string_agg" -> (aggStringAgg _),
    "agg_approx_topk" -> (aggApproxTopK _),
    "agg_approx_topk_merge" -> (aggApproxTopKMerge _),
    "agg_bitmap_distinct" -> (aggBitmapDistinct _),
    "agg_hll_sketch_merge" -> (aggHllSketchMerge _),
    "agg_mode" -> (aggMode _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_unpivot" -> (aggUnpivot _),
    "agg_percentile" -> (aggPercentile _),
    "agg_approx_percentile" -> (aggApproxPercentile _),
    "agg_stats" -> (aggStats _),
    "agg_moments" -> (aggMoments _),
    "agg_salted" -> (aggSalted _),
    "agg_pivot" -> (aggPivot _),
    "agg_groupby" -> (aggGroupBy _),
    "agg_global" -> (aggGlobal _),
    "agg_distinct" -> (aggDistinct _),
    "agg_count_distinct" -> (aggCountDistinct _),
    "agg_approx_distinct" -> (aggApproxDistinct _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_conditional" -> (aggConditional _),
    "agg_collect" -> (aggCollect _))

  val oracle: Map[String, String] = Map(
    // Built from the SAME corrE6 expression string and pair list as the
    // Spark plan — the engines share the arithmetic by construction.
    "agg_corr_matrix" -> {
      val selects = CorrPairs.map { case (name, a, b) =>
        s"""SELECT '$name' AS pair,
              ${corrE6(s"s$a", s"s$b", s"s$a$a", s"s$b$b", s"s$a$b")}
              AS corr_e6, n FROM m"""
      }.mkString(" UNION ALL ")
      s"""WITH src AS (
            SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                   CAST(round(l_extendedprice) AS BIGINT) AS p,
                   CAST(round(l_discount * 100) AS BIGINT) AS d,
                   CAST(round(l_tax * 100) AS BIGINT) AS x
            FROM lineitem),
          m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(q) AS BIGINT) AS sq,
                   CAST(sum(p) AS BIGINT) AS sp,
                   CAST(sum(d) AS BIGINT) AS sd,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(q * q) AS BIGINT) AS sqq,
                   CAST(sum(p * p) AS BIGINT) AS spp,
                   CAST(sum(d * d) AS BIGINT) AS sdd,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(q * p) AS BIGINT) AS sqp,
                   CAST(sum(q * d) AS BIGINT) AS sqd,
                   CAST(sum(q * x) AS BIGINT) AS sqx,
                   CAST(sum(p * d) AS BIGINT) AS spd,
                   CAST(sum(p * x) AS BIGINT) AS spx,
                   CAST(sum(d * x) AS BIGINT) AS sdx
            FROM src)
          SELECT pair, corr_e6, n FROM ($selects) ORDER BY pair"""
    },
    "agg_bootstrap_ci" ->
      """WITH px AS (
           SELECT event_id, CAST(round(value * 100) AS BIGINT) AS x
           FROM events WHERE event_type = 'purchase'),
         reps AS (
           SELECT b.b, x,
                  CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)
                    || '#boot#' || CAST(b.b AS VARCHAR)), 1, 6))
                    AS BIGINT) AS u
           FROM px CROSS JOIN (SELECT unnest(range(0, 40)) AS b) b),
         wtd AS (
           SELECT b, x,
                  CASE WHEN u < 6171992 THEN 0
                       WHEN u < 12343985 THEN 1
                       WHEN u < 15429982 THEN 2
                       WHEN u < 16458647 THEN 3
                       WHEN u < 16715813 THEN 4 ELSE 5 END AS w
           FROM reps),
         means AS (
           SELECT b,
                  CAST(round(100.0 * CAST(sum(w * x) AS DOUBLE) /
                    CAST(greatest(sum(w), 1) AS DOUBLE)) AS BIGINT)
                    AS mean_ce2
           FROM wtd GROUP BY b),
         ranked AS (
           SELECT mean_ce2,
                  row_number() OVER (ORDER BY mean_ce2, b) AS rk
           FROM means),
         ci AS (SELECT CAST(min(mean_ce2) AS BIGINT) AS ci_lo_ce2,
                       CAST(max(mean_ce2) AS BIGINT) AS ci_hi_ce2
                FROM ranked WHERE rk IN (2, 39)),
         pt AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(round(100.0 * CAST(sum(x) AS DOUBLE) /
                         CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_ce2
                FROM px)
         SELECT n, mean_ce2, ci_lo_ce2, ci_hi_ce2,
                ci_hi_ce2 - ci_lo_ce2 AS ci_width_ce2,
                CAST(40 AS INTEGER) AS n_replicas
         FROM ci CROSS JOIN pt""",
    "agg_ks_test" ->
      """WITH hist AS (
           SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS a_c,
                  CAST(sum(CASE WHEN event_type <> 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS b_c
           FROM events WHERE event_type IN ('purchase', 'click')
             AND value IS NOT NULL
           GROUP BY 1),
         tot AS (SELECT CAST(sum(a_c) AS BIGINT) AS n1,
                        CAST(sum(b_c) AS BIGINT) AS n2 FROM hist),
         cum AS (
           SELECT CAST(sum(a_c) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
                  CAST(sum(b_c) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b
           FROM hist),
         s AS (SELECT n1, n2,
                      CAST(max(abs(cum_a * n2 - cum_b * n1)) AS BIGINT)
                        AS d_num
               FROM cum CROSS JOIN tot GROUP BY n1, n2)
         SELECT n1, n2, d_num,
                CAST(d_num * 1000000 // (n1 * n2) AS BIGINT) AS ks_e6,
                CAST(round(1358000.0 *
                  sqrt(CAST(n1 + n2 AS DOUBLE) /
                       (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))))
                  AS BIGINT) AS crit_e6,
                CAST(d_num * 1000000 // (n1 * n2) AS BIGINT) >
                  CAST(round(1358000.0 *
                    sqrt(CAST(n1 + n2 AS DOUBLE) /
                         (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))))
                    AS BIGINT) AS reject_h0
         FROM s""",
    // DuckDB dayofweek is 0-based (Sun=0); Spark's is 1-based (Sun=1).
    // The oracle shifts +1 so the group key matches exactly.
    "agg_chi_square" ->
      """WITH cells AS (
           SELECT event_type, dayofweek(ts) + 1 AS dow,
                  CAST(count(*) AS BIGINT) AS o
           FROM events GROUP BY 1, 2),
         rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
                FROM cells GROUP BY 1),
         ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct
                FROM cells GROUP BY 1),
         nn AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                       CAST(count(DISTINCT event_type) AS BIGINT)
                         AS r_levels,
                       CAST(count(DISTINCT dow) AS BIGINT) AS c_levels
                FROM cells),
         terms AS (
           SELECT n, r_levels, c_levels,
                  CAST(round(1000000.0 *
                    CAST(n * o - rt.rt * ct.ct AS DOUBLE) *
                    CAST(n * o - rt.rt * ct.ct AS DOUBLE) /
                    (CAST(n AS DOUBLE) * CAST(rt.rt AS DOUBLE) *
                     CAST(ct.ct AS DOUBLE))) AS BIGINT) AS term_e6
           FROM cells
           JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN nn)
         SELECT n, CAST(count(*) AS BIGINT) AS n_cells,
                (r_levels - 1) * (c_levels - 1) AS dof,
                CAST(sum(term_e6) AS BIGINT) AS chi2_e6,
                CAST(round(1000000.0 *
                  sqrt(CAST(sum(term_e6) AS DOUBLE) / 1000000.0 /
                       (CAST(n AS DOUBLE) *
                        CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE))))
                  AS BIGINT) AS cramers_v_e6
         FROM terms GROUP BY n, r_levels, c_levels""",
    "agg_mann_whitney" ->
      """WITH hist AS (
           SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS a_c,
                  CAST(sum(CASE WHEN event_type <> 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS b_c
           FROM events WHERE event_type IN ('purchase', 'click')
             AND value IS NOT NULL
           GROUP BY 1),
         cum AS (
           SELECT a_c, b_c,
                  CAST(sum(b_c) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - b_c AS BIGINT) AS cum_b_lt
           FROM hist),
         s AS (
           SELECT CAST(sum(a_c) AS BIGINT) AS n1,
                  CAST(sum(b_c) AS BIGINT) AS n2,
                  CAST(sum(a_c * (2 * cum_b_lt + b_c)) AS BIGINT) AS u2x,
                  CAST(sum((a_c + b_c) * (a_c + b_c) * (a_c + b_c)
                           - (a_c + b_c)) AS BIGINT) AS tie3
           FROM cum)
         SELECT n1, n2, u2x, tie3,
                CASE WHEN n1 * n2 = 0 OR
                     CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
                       (CAST(n1 + n2 + 1 AS DOUBLE) -
                        CAST(tie3 AS DOUBLE) /
                        (CAST(n1 + n2 AS DOUBLE) *
                         CAST(n1 + n2 - 1 AS DOUBLE))) <= 0.0
                THEN NULL
                ELSE CAST(round(1000000.0 *
                  (CAST(u2x AS DOUBLE) / 2.0 -
                   CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) /
                  sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
                       (CAST(n1 + n2 + 1 AS DOUBLE) -
                        CAST(tie3 AS DOUBLE) /
                        (CAST(n1 + n2 AS DOUBLE) *
                         CAST(n1 + n2 - 1 AS DOUBLE)))))
                  AS BIGINT) END AS z_e6,
                CAST(round(1000000.0 * (1.0 - CAST(u2x AS DOUBLE) /
                  (CAST(greatest(n1, 1) AS DOUBLE) *
                   CAST(greatest(n2, 1) AS DOUBLE))))
                  AS BIGINT) AS rank_biserial_e6
         FROM s""",
    // Approx-sketch keys (VERDICT r8 #2 graduation): DuckDB cannot
    // reproduce the sketch estimates, so each oracle independently
    // computes the EXACT value and asserts the bound flags TRUE — the
    // Spark side computes the flags from its own sketch, so an
    // out-of-bound estimate hash-mismatches.
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
                TRUE AS within_bound
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "agg_approx_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS exact_median,
                quantile_cont(l_quantity, 0.9) AS exact_p90,
                TRUE AS median_in_tol,
                TRUE AS p90_in_tol
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "agg_hll_sketch_merge" ->
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
                TRUE AS merge_consistent,
                TRUE AS within_bound
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "agg_countmin" ->
      """WITH rs AS (SELECT unnest(range(0, 3)) AS r),
         kc AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
                FROM lineitem GROUP BY 1),
         cells AS (
           SELECT r, substring(md5(CAST(l_partkey AS VARCHAR) || '#' ||
                       CAST(r AS VARCHAR)), 1, 3) AS cell, cnt
           FROM kc CROSS JOIN rs),
         sketch AS (SELECT r AS rw, cell, CAST(sum(cnt) AS BIGINT) AS cnt
                    FROM cells GROUP BY 1, 2),
         pc AS (SELECT k.l_partkey, k.cnt AS exact_cnt, r AS rw,
                       substring(md5(CAST(k.l_partkey AS VARCHAR) || '#' ||
                         CAST(r AS VARCHAR)), 1, 3) AS cell
                FROM kc k CROSS JOIN rs WHERE k.l_partkey <= 5)
         SELECT pc.l_partkey, pc.exact_cnt,
                CAST(min(s.cnt) AS BIGINT) AS est_cnt
         FROM pc JOIN sketch s ON pc.rw = s.rw AND pc.cell = s.cell
         GROUP BY 1, 2 ORDER BY 1""",
    "agg_regression" ->
      """WITH m AS (
           SELECT c_nationkey AS nationkey, count(*) AS n,
                  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                    AS sx,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS sy,
                  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))
                           * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS sxy,
                  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))
                           * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                    AS sxx,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))
                           * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS syy
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1)
         SELECT nationkey, n,
                round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
                round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                      / n, 6) AS intercept,
                round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                  / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS r2
         FROM m
         WHERE n >= 2 AND n * sxx - sx * sx <> 0
           AND n * syy - sy * sy <> 0
         ORDER BY nationkey""",
    "agg_entropy" ->
      """WITH cnts AS (
           SELECT user_id % 10 AS segment, event_type, count(*) AS cnt
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT segment, CAST(sum(cnt) AS BIGINT) AS n_events,
                  count(*) AS n_types
           FROM cnts GROUP BY 1),
         lp AS (
           SELECT segment, n_events, n_types, cnt,
                  CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(n_events AS DOUBLE))
                             * 1000000.0) AS BIGINT) AS lp_e6
           FROM cnts JOIN tot USING (segment)),
         s AS (
           SELECT segment, n_events, n_types,
                  CAST(sum(cnt * lp_e6) AS BIGINT) AS s
           FROM lp GROUP BY 1, 2, 3)
         SELECT segment, n_events, n_types,
                -(CAST(s AS DOUBLE) / CAST(n_events AS DOUBLE) / 1000000.0)
                  AS entropy_nats
         FROM s
         ORDER BY segment""",
    "agg_weighted_percentile" ->
      """WITH hist AS (
           SELECT l_returnflag,
                  CAST(round(l_extendedprice) AS BIGINT) AS p_usd,
                  sum(CAST(l_quantity AS BIGINT)) AS w
           FROM lineitem GROUP BY 1, 2),
         c AS (
           SELECT l_returnflag, p_usd,
                  sum(w) OVER (PARTITION BY l_returnflag
                               ORDER BY p_usd) AS cum,
                  sum(w) OVER (PARTITION BY l_returnflag) AS total
           FROM hist),
         q AS (
           SELECT l_returnflag, p_usd, total,
                  row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY p_usd) AS rk
           FROM c WHERE cum * 2 >= total)
         SELECT l_returnflag, p_usd AS w_median_usd,
                CAST(total AS BIGINT) AS total_weight
         FROM q WHERE rk = 1 ORDER BY l_returnflag""",
    "agg_equidepth_hist" ->
      """WITH hist AS (
           SELECT l_returnflag,
                  CAST(round(l_extendedprice) AS BIGINT) AS p_usd,
                  count(*) AS c
           FROM lineitem GROUP BY 1, 2),
         cum AS (
           SELECT l_returnflag, p_usd,
                  sum(c) OVER (PARTITION BY l_returnflag
                               ORDER BY p_usd) AS cum,
                  sum(c) OVER (PARTITION BY l_returnflag) AS total
           FROM hist),
         d AS (SELECT unnest(range(1, 10)) AS decile)
         SELECT l_returnflag, CAST(decile AS INTEGER) AS decile,
                CAST(min(p_usd) AS BIGINT) AS boundary_usd,
                CAST(max(total) AS BIGINT) AS total_rows
         FROM cum CROSS JOIN d
         WHERE cum * 10 >= decile * total
         GROUP BY 1, 2
         ORDER BY 1, 2""",
    "agg_gini" ->
      """WITH hist AS (
           SELECT o_orderpriority,
                  CAST(round(o_totalprice) AS BIGINT) AS v,
                  count(*) AS c
           FROM orders GROUP BY 1, 2),
         b AS (
           SELECT o_orderpriority, v, c,
                  sum(c) OVER (PARTITION BY o_orderpriority
                               ORDER BY v) - c AS fprev
           FROM hist),
         g AS (
           SELECT o_orderpriority,
                  CAST(sum(v * c * (2 * fprev + c + 1)) AS BIGINT) AS s2ix,
                  CAST(sum(v * c) AS BIGINT) AS sx,
                  CAST(sum(c) AS BIGINT) AS n
           FROM b GROUP BY 1)
         SELECT o_orderpriority, n, sx AS total_usd,
                CAST(round(1000000.0 *
                     (CAST(s2ix AS DOUBLE) -
                      (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE)) /
                     (CAST(n AS DOUBLE) * CAST(greatest(sx, 1) AS DOUBLE)))
                  AS BIGINT) AS gini_e6
         FROM g ORDER BY o_orderpriority""",
    "agg_theil_index" ->
      """WITH h AS (
           SELECT o_orderpriority, CAST(round(o_totalprice) AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS c
           FROM orders
           WHERE CAST(round(o_totalprice) AS BIGINT) > 0
           GROUP BY 1, 2),
         t2 AS (SELECT o_orderpriority, CAST(sum(v * c) AS BIGINT) AS s,
                       CAST(sum(c) AS BIGINT) AS n
                FROM h GROUP BY 1),
         l AS (SELECT h.o_orderpriority, c, v, s, n,
                      CAST(round(ln(CAST(v AS DOUBLE) * CAST(n AS DOUBLE)
                                    / CAST(s AS DOUBLE)) * 1000000.0)
                        AS BIGINT) AS l_e6
               FROM h JOIN t2 USING (o_orderpriority))
         SELECT o_orderpriority, max(n) AS n,
                CAST(max(s) AS BIGINT) AS total_usd,
                CAST(round(CAST(sum(c * v * l_e6) AS DOUBLE)
                           / CAST(max(s) AS DOUBLE)) AS BIGINT) AS theil_e6
         FROM l GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_benford" ->
      s"""WITH cnt AS (
           SELECT o_orderpriority,
                  CAST(substring(CAST(CAST(round(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INTEGER) AS digit,
                  count(*) AS n
           FROM orders GROUP BY 1, 2),
         tot AS (SELECT o_orderpriority, CAST(sum(n) AS BIGINT) AS total
                 FROM cnt GROUP BY 1)
         SELECT c.o_orderpriority, c.digit, CAST(c.n AS BIGINT) AS n,
                CAST(c.n * 1000000 // t.total AS BIGINT) AS share_ppm,
                CAST($BenfordE6 AS BIGINT) AS expected_ppm,
                CAST(CAST(c.n * 1000000 // t.total AS BIGINT)
                     - $BenfordE6 AS BIGINT) AS dev_ppm
         FROM cnt c JOIN tot t USING (o_orderpriority)
         ORDER BY o_orderpriority, digit""",
    "agg_ab_ttest" ->
      """WITH g AS (
           SELECT event_type, count(*) AS n,
                  CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS s,
                  CAST(sum(CAST(round(value) AS BIGINT)
                           * CAST(round(value) AS BIGINT)) AS BIGINT) AS ss
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                        CAST(sum(s) AS BIGINT) AS ts,
                        CAST(sum(ss) AS BIGINT) AS tss
                 FROM g),
         j AS (SELECT event_type, CAST(n AS BIGINT) AS n,
                      CAST(tn - n AS BIGINT) AS n2, s, ss,
                      CAST(ts - s AS BIGINT) AS s2,
                      CAST(tss - ss AS BIGINT) AS ss2
               FROM g CROSS JOIN tot),
         sed AS (SELECT event_type, n, n2,
                 CASE WHEN n < 2 OR n2 < 2 THEN CAST(NULL AS DOUBLE) ELSE
                   (CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) -
                    (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) *
                    (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) /
                   (CAST(n AS DOUBLE) - 1.0) +
                   (CAST(ss2 AS DOUBLE) / CAST(n2 AS DOUBLE) -
                    (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) *
                    (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))) /
                   (CAST(n2 AS DOUBLE) - 1.0) END AS se2,
                 CAST(s AS DOUBLE) / CAST(n AS DOUBLE) -
                   CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS d
               FROM j),
         z AS (SELECT event_type, n, n2,
                 CASE WHEN se2 IS NULL OR se2 <= 0.0
                      THEN CAST(NULL AS BIGINT)
                      ELSE CAST(round(1000000.0 * d * d / se2) AS BIGINT)
                 END AS z2_e6
               FROM sed)
         SELECT event_type, n, n2, z2_e6,
                CASE WHEN z2_e6 IS NULL THEN 'insufficient'
                     WHEN z2_e6 > 3841600 THEN 'significant'
                     ELSE 'not_significant' END AS verdict
         FROM z ORDER BY event_type""",
    "agg_median" ->
      """SELECT o_orderstatus,
                median(o_totalprice) AS median_price,
                count(*) AS n
         FROM orders GROUP BY 1 ORDER BY o_orderstatus""",
    "agg_outlier_mad" ->
      """WITH x AS (
           SELECT event_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS x_e2
           FROM events WHERE value IS NOT NULL),
         c1 AS (
           SELECT event_type, x_e2 AS v,
                  sum(c) OVER (PARTITION BY event_type ORDER BY x_e2
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  sum(c) OVER (PARTITION BY event_type) AS n
           FROM (SELECT event_type, x_e2, count(*) AS c
                 FROM x GROUP BY 1, 2)),
         m1 AS (
           SELECT event_type,
                  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                       + min(CASE WHEN cum >= n // 2 + 1 THEN v END)
                       AS BIGINT) AS med2
           FROM c1 GROUP BY 1),
         d AS (
           SELECT event_id, event_type, x_e2, med2,
                  abs(x_e2 * 2 - med2) AS dev_x2
           FROM x JOIN m1 USING (event_type)),
         c2 AS (
           SELECT event_type, dev_x2 AS v,
                  sum(c) OVER (PARTITION BY event_type ORDER BY dev_x2
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  sum(c) OVER (PARTITION BY event_type) AS n
           FROM (SELECT event_type, dev_x2, count(*) AS c
                 FROM d GROUP BY 1, 2)),
         m2 AS (
           SELECT event_type,
                  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                       + min(CASE WHEN cum >= n // 2 + 1 THEN v END)
                       AS BIGINT) AS mad4
           FROM c2 GROUP BY 1)
         SELECT event_id, event_type, x_e2, med2, dev_x2, mad4,
                dev_x2 * 2 > mad4 * 3 AS is_outlier
         FROM d JOIN m2 USING (event_type)
         ORDER BY event_id""",
    "agg_bool" ->
      """SELECT o_orderstatus,
                bool_and(o_totalprice > 1000) AS all_over_1k,
                bool_or(o_totalprice > 550000) AS any_jumbo,
                count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                  AS n_urgent,
                count(*) AS n
         FROM orders GROUP BY 1 ORDER BY o_orderstatus""",
    "agg_string_agg" ->
      """SELECT o_orderpriority,
                string_agg(CAST(o_orderkey AS VARCHAR), ','
                           ORDER BY o_orderkey) AS keys_csv,
                count(*) AS n
         FROM orders WHERE o_totalprice > 450000
         GROUP BY 1 ORDER BY o_orderpriority""",
    "agg_approx_topk" ->
      """SELECT event_type AS item, count(*) AS cnt
         FROM events GROUP BY event_type
         ORDER BY cnt DESC, item""",
    "agg_approx_topk_merge" ->
      """SELECT event_type AS item, count(*) AS cnt
         FROM events GROUP BY event_type
         ORDER BY cnt DESC, item""",
    "agg_bitmap_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_distinct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_mode" ->
      """SELECT o_orderstatus, mode_priority, mode_count
         FROM (
           SELECT o_orderstatus, o_orderpriority AS mode_priority,
                  count(*) AS mode_count,
                  row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY count(*) DESC, o_orderpriority) AS rn
           FROM orders GROUP BY o_orderstatus, o_orderpriority)
         WHERE rn = 1
         ORDER BY o_orderstatus""",
    "agg_stats" ->
      """SELECT l_returnflag,
                round(stddev_samp(l_quantity), 4) AS sd_qty,
                round(var_pop(l_quantity), 4) AS var_qty,
                round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
                round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "agg_moments" ->
      """WITH s AS (
           SELECT l_returnflag,
                  CAST(count(*) AS BIGINT) AS n_rows,
                  sum(x) AS s1, sum(x * x) AS s2,
                  sum(x * x * x) AS s3, sum(x * x * x * x) AS s4
           FROM (SELECT l_returnflag,
                        CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                             AS HUGEINT) AS x
                 FROM lineitem)
           GROUP BY 1)
         SELECT l_returnflag, n_rows,
                CAST(((CAST(s3 AS DOUBLE) / n_rows)
                      - 3.0 * (CAST(s1 AS DOUBLE) / n_rows)
                            * (CAST(s2 AS DOUBLE) / n_rows)
                      + 2.0 * (CAST(s1 AS DOUBLE) / n_rows)
                            * (CAST(s1 AS DOUBLE) / n_rows)
                            * (CAST(s1 AS DOUBLE) / n_rows))
                     / (((CAST(s2 AS DOUBLE) / n_rows)
                         - (CAST(s1 AS DOUBLE) / n_rows)
                           * (CAST(s1 AS DOUBLE) / n_rows))
                        * sqrt((CAST(s2 AS DOUBLE) / n_rows)
                               - (CAST(s1 AS DOUBLE) / n_rows)
                                 * (CAST(s1 AS DOUBLE) / n_rows)))
                     AS DOUBLE) AS skewness,
                CAST(((CAST(s4 AS DOUBLE) / n_rows)
                      - 4.0 * (CAST(s1 AS DOUBLE) / n_rows)
                            * (CAST(s3 AS DOUBLE) / n_rows)
                      + 6.0 * (CAST(s1 AS DOUBLE) / n_rows)
                            * (CAST(s1 AS DOUBLE) / n_rows)
                            * (CAST(s2 AS DOUBLE) / n_rows)
                      - 3.0 * (CAST(s1 AS DOUBLE) / n_rows)
                            * (CAST(s1 AS DOUBLE) / n_rows)
                            * (CAST(s1 AS DOUBLE) / n_rows)
                            * (CAST(s1 AS DOUBLE) / n_rows))
                     / (((CAST(s2 AS DOUBLE) / n_rows)
                         - (CAST(s1 AS DOUBLE) / n_rows)
                           * (CAST(s1 AS DOUBLE) / n_rows))
                        * ((CAST(s2 AS DOUBLE) / n_rows)
                           - (CAST(s1 AS DOUBLE) / n_rows)
                             * (CAST(s1 AS DOUBLE) / n_rows)))
                     - 3.0 AS DOUBLE) AS kurtosis
         FROM s ORDER BY l_returnflag""",
    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
                coalesce(o_orderpriority, '(all)') AS priority,
                count(*) AS n_orders
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY status, priority""",
    "agg_unpivot" ->
      """SELECT o_orderstatus, p.priority,
                count(*) FILTER (WHERE o_orderpriority = p.full_name) AS n
         FROM orders CROSS JOIN (
           SELECT * FROM (VALUES ('p1', '1-URGENT'), ('p2', '2-HIGH'),
                                 ('p3', '3-MEDIUM'), ('p4', '4-NOT SPECIFIED'),
                                 ('p5', '5-LOW')) v(priority, full_name)) p
         GROUP BY 1, 2 ORDER BY o_orderstatus, p.priority""",
    "agg_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.25) AS q25,
                quantile_cont(l_quantity, 0.5) AS median,
                quantile_cont(l_quantity, 0.75) AS q75,
                min(l_quantity) AS q_min,
                max(l_quantity) AS q_max
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "agg_salted" ->
      """SELECT l_returnflag,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "agg_pivot" ->
      """SELECT o_orderstatus,
                count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
                count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2,
                count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3,
                count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
                count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5
         FROM orders GROUP BY 1 ORDER BY o_orderstatus""",
    "agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                min(l_quantity) AS min_qty,
                max(l_quantity) AS max_qty,
                count(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""",
    "agg_global" ->
      """SELECT count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
                min(o_orderdate) AS first_order,
                max(o_orderdate) AS last_order
         FROM orders""",
    "agg_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "agg_count_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
                count(*) AS n_orders
         FROM orders GROUP BY 1 ORDER BY o_orderstatus""",
    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS flag,
                coalesce(l_linestatus, '(all)') AS status,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(*) AS n_rows,
                CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
                CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY flag, status, g_flag, g_status""",
    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
                coalesce(o_orderpriority, '(all)') AS priority,
                count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "agg_conditional" ->
      """SELECT o_orderstatus,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_revenue,
                count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
                count(*) AS n_total
         FROM orders GROUP BY 1 ORDER BY o_orderstatus""",
    "agg_collect" ->
      """SELECT o_custkey,
                array_to_string(list_transform(
                  list(o_orderkey ORDER BY o_orderkey),
                  x -> CAST(x AS VARCHAR)), ',') AS big_orders,
                count(*) AS n_big
         FROM orders WHERE o_totalprice > 450000
         GROUP BY 1 ORDER BY o_custkey""")
}
