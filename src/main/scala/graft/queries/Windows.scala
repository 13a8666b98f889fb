package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{dec, t}

/** SURVEY.md §2-F — window functions. A window spec costs one shuffle
  * on its partition keys + a partition-local sort; specs are shared
  * across functions in the same query so each query is a single
  * exchange. row_number/ntile always get a total ORDER in their spec
  * (ties would otherwise make results nondeterministic); rank and
  * dense_rank deliberately run over the tied ordering to exercise tie
  * semantics.
  */
object Windows {

  /** Ranking family: row_number, rank, dense_rank, ntile, percent_rank. */
  private def winRank(spark: SparkSession, sfDir: String): DataFrame = {
    val total = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val tied = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc)
    t(spark, sfDir, "orders")
      .where(col("o_totalprice") > 400000)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(total).as("rn"),
        rank().over(tied).as("rk"),
        dense_rank().over(tied).as("drk"),
        ntile(4).over(total).as("quartile"),
        percent_rank().over(tied).as("pct_rk"))
      .orderBy("o_orderstatus", "rn")
  }

  /** Analytic family: lag / lead / first / last per user timeline. */
  private def winLagLead(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        first(col("event_type")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_type"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Running (cumulative) sum — decimal-exact, per-row deterministic
    * because the frame order is total. */
  private def winRunningSum(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        sum(dec(col("value"))).over(w).cast("double").as("running_value"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Value-based RANGE frame: sum of order totals over orders whose key
    * is within 100 behind the current key. */
  private def winRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_orderkey"))
      .rangeBetween(-100, Window.currentRow)
    t(spark, sfDir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("nearby_revenue"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  /** Top-k per group: row_number over a total order, then filter — the
    * pattern that replaces a per-group sort+limit at scale. */
  private def winTopKPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_orderstatus", "rn")
  }

  /** Batch session windows — the same `session_window` function the
    * streaming key uses, in a plain groupBy: per-user 30-minute-gap
    * sessions without any stream machinery. The oracle is the classic
    * lag + running-sum gap sessionization, which is exactly Spark's
    * session-window semantics (end = last event + gap). */
  private def winSessionBatch(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"))
      .orderBy("user_id", "s_start")

  /** Top-k per group through the custom whole-operator plan node
    * (graft.plans.TopKPerGroup — LogicalPlan + Strategy + SparkPlan):
    * map-side bounded heaps, one k-rows-per-group-per-partition
    * exchange, no per-partition full sort. Same result as
    * win_topk_per_group (and the same oracle shape) — WindowsSpec
    * asserts both the equivalence and the partial→exchange→final
    * physical shape. */
  private def winTopKCustom(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.GraftOps.topKPerGroup(
        t(spark, sfDir, "orders")
          .select("o_orderstatus", "o_orderkey", "o_totalprice"),
        keyCols = Seq("o_orderstatus"),
        order = Seq(("o_totalprice", false), ("o_orderkey", true)),
        k = 3)
      .orderBy("o_orderstatus", "o_orderkey")

  /** Distribution analytics: cume_dist, quartile buckets, and
    * nth_value over a fully tie-broken ordering (unique sort keys keep
    * the default RANGE frame's peer handling engine-agnostic). */
  private def winDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(spark, sfDir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).as("quartile"),
        nth_value(col("o_orderkey"), 3).over(w).as("third_key"))
      .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
  }

  /** F. Time-series resample — 5-minute OHLC downsampling per event
    * type (the market-data / metrics-rollup staple). Open and close
    * are picked by min/max over a lexicographically-ordered
    * struct(ts, event_id, value) — deterministic under ties AND a
    * plain aggregate, so the WHOLE query is one map-side-combinable
    * groupBy with no window, no sort: partial OHLC states combine
    * associatively, which is what lets a 100 TB tick table collapse
    * to bars in a single shuffle of (type, bucket) partials. (The
    * row_number formulation computes the same bars but forces a full
    * sort of every tick; min-of-struct is the scale-correct shape.)
    * Buckets stay in the date_trunc timestamp domain — no epoch
    * round-trip, no timezone re-interpretation between engines. */
  private def winResampleOhlc(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .where(col("value").isNotNull)
      .selectExpr("event_type", "ts", "event_id", "value",
        """timestampadd(MINUTE, CAST(5 * (minute(ts) DIV 5) AS INT),
             date_trunc('hour', ts)) AS bucket_start""")
      .groupBy("event_type", "bucket_start")
      .agg(
        min(struct(col("ts").as("a"), col("event_id").as("b"),
          col("value").as("v"))).getField("v").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts").as("a"), col("event_id").as("b"),
          col("value").as("v"))).getField("v").as("close"),
        count(lit(1)).as("n_ticks"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy("event_type", "bucket_start")

  /** F. Calendar-spine gap fill — the reporting/time-series staple: a
    * sparse daily aggregate re-expressed over the COMPLETE day×type
    * grid, missing cells zero-filled (counts) and forward-filled
    * (last observed value). Build-side rule for scale: aggregate the
    * fact FIRST (the result is days×types — tiny), then LEFT JOIN the
    * generated spine against it — the preserved spine side can never
    * be the broadcast build side, but the aggregate side can. The fact
    * table is scanned exactly once. */
  private def winGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    // sparse slice so the grid actually has holes to fill
    val byDay = t(spark, sfDir, "events")
      .where(col("user_id") % 97 === 0)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("day_value"))
    val days = byDay.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    val spine = days.crossJoin(byDay.select("event_type").distinct())
    val fill = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(byDay, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("day_value"), ignoreNulls = true).over(fill)
          .as("filled_value"))
      .orderBy("day", "event_type")
  }

  /** F. Funnel analysis — the ordered-step conversion query every
    * event warehouse runs: of the users who VIEWED, how many CLICKED
    * after the view, and PURCHASED after the click? Each step's
    * earliest qualifying timestamp is a conditional min that must land
    * strictly after the previous step and inside a 1-day conversion
    * window (unbounded windows saturate: at corpus density every
    * viewer eventually clicks), so steps chain as three aggregate
    * passes joined on user_id (3 shuffles on the same key at
    * 100 TB — co-partitioned, and each pass is map-side partial
    * aggregated). NOT a window-over-all-events per user: conditional
    * min aggregation keeps state O(1) per user regardless of event
    * count. Output is the per-stage user count funnel. */
  private def winFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = t(spark, sfDir, "events").select("user_id", "event_type", "ts")
    val s1 = e.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
      .where(col("t_view").isNotNull)
    val s2 = e.join(s1, Seq("user_id"))
      .groupBy("user_id", "t_view")
      .agg(min(when(col("event_type") === "click" && col("ts") > col("t_view")
        && col("ts") <= col("t_view") + expr("INTERVAL 1 DAY"),
        col("ts"))).as("t_click"))
    val s3 = e.join(s2, Seq("user_id"))
      .groupBy("user_id", "t_view", "t_click")
      .agg(min(when(col("event_type") === "purchase" &&
        col("ts") > col("t_click")
        && col("ts") <= col("t_click") + expr("INTERVAL 1 DAY"),
        col("ts"))).as("t_purchase"))
    s3.select(col("user_id"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .otherwise(1).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  /** F. Cohort retention — the other canonical event-warehouse panel:
    * users cohorted by first-active week, retention = distinct actives
    * per (cohort, week-offset). Two aggregations over the same
    * user-keyed shuffle (first-touch, then the cohort×offset rollup) —
    * no per-user window scan, state O(1) per user per week. Offsets
    * capped at 4 so the panel is bounded however long the corpus. */
  private def winRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val act = t(spark, sfDir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val firsts = act.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    act.join(firsts, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .where(col("week_offset") <= 4)
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  /** F. Kaplan–Meier user-survival curve — the retention matrix's
    * principled sibling: discrete weekly survival S(w) = Π_{w'≤w}
    * (1 − d_w'/n_w') over user lifetimes, with users still active in
    * the final two observed days treated as CENSORED (they haven't
    * churned; counting them as deaths is the classic retention-curve
    * mistake). Each user reduces to one (duration, censored) row —
    * one user-keyed aggregation — and everything after runs on the
    * BOUNDED day series (n_at_risk is a reverse running sum over
    * ≤ span-days rows; the survival product is an O(W²) array fold
    * over the same rows, W ≤ hundreds at any corpus size). Engine parity: the
    * KM product stays in e6-scaled INTEGER arithmetic — each step
    * multiplies by (n−d) then integer-DIVs by n, positives only, so
    * Spark's truncation and DuckDB's floor agree; the oracle replays
    * the identical ascending-day recurrence as a recursive CTE. */
  private def winKaplanMeier(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(col("user_id"), col("ts").cast("date").as("d"))
    val horizon = ev.agg(max(col("d")).as("hmax"))
    val users = ev.groupBy("user_id")
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
      .crossJoin(broadcast(horizon))
      .selectExpr("user_id",
        "CAST(datediff(last_d, first_d) AS INT) AS dur_d",
        "last_d >= date_sub(hmax, 1) AS censored")
    val byDay = users.groupBy("dur_d")
      .agg(sum(when(!col("censored"), 1L).otherwise(0L)).as("n_deaths"),
        count(lit(1)).as("ending"))
    // reverse running sum over the bounded week series (≤ span/7 rows
    // — the benign single-partition window class)
    val wk = byDay
      .withColumn("n_at_risk", sum(col("ending")).over(
        Window.orderBy(col("dur_d").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("dur_d").as("day"), col("n_deaths"), col("n_at_risk"))
    val arr = wk.agg(array_sort(collect_list(
      struct(col("day"), col("n_deaths"), col("n_at_risk")))).as("ds"))
    wk.crossJoin(broadcast(arr))
      .selectExpr("day", "n_at_risk", "n_deaths",
        """aggregate(filter(ds, x -> x.day <= day),
             CAST(1000000 AS BIGINT),
             (acc, x) -> acc * (x.n_at_risk - x.n_deaths)
                         DIV x.n_at_risk) AS survival_ppm""")
      .orderBy("day")
  }

  /** F. Longest activity streak per user — gaps-and-islands: group
    * consecutive active DAYS by the classic `date - row_number`
    * constant-per-island trick (two window passes over one user-keyed
    * shuffle, no self-join), then keep each user's longest island.
    * Integer date arithmetic end to end. */
  private def winStreak(spark: SparkSession, sfDir: String): DataFrame = {
    val days = t(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val wUser = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("island",
        datediff(col("day"), lit("1990-01-01").cast("date"))
          - row_number().over(wUser))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("streak_days"), min(col("day")).as("streak_start"))
      .withColumn("rk", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("streak_days").desc, col("streak_start"))))
      .where(col("rk") === 1)
      .select("user_id", "streak_days", "streak_start")
      .orderBy("user_id")
  }

  /** F. Truncated-horizon EWMA per user timeline — the pandas
    * `ewm(alpha=0.5, adjust=True)` recurrence restricted to the last 8
    * events: num = Σ_{k=0..7} x_{i-k}·2^(7-k), den = Σ of the weights
    * whose lag actually exists, ewma = num/den. With alpha = 1/2 the
    * weights are exact powers of two, so the whole state is scaled
    * bigint arithmetic — no float accumulation order, engine-neutral —
    * and only the final num/den quotient is a (deterministic, two-op)
    * double. All 8 lags share ONE window spec: a single shuffle on
    * user_id + one partition-local sort, regardless of horizon. Horizon
    * truncation is what makes this scale: the untruncated recurrence is
    * a sequential scan per user, while a fixed window is a stock
    * codegen'd frame. */
  private def winEwma(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val x = t(spark, sfDir, "events")
      .where(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("cast(round(value * 100) as bigint)").as("x_e2"))
    // Materialize each lag ONCE (k = 0 is the row itself, never null
    // after the filter; k >= 1 are absent at each timeline's head),
    // then derive num/den/ewma from the materialized columns — so the
    // Window node carries exactly 7 lag expressions instead of one
    // copy per consuming output column.
    val lagged = x.select(
      (Seq(col("user_id"), col("event_id"), col("ts"), col("x_e2")) ++
        (1 to 7).map(k => lag(col("x_e2"), k).over(w).as(s"l$k"))): _*)
    val lags: Seq[org.apache.spark.sql.Column] =
      col("x_e2") +: (1 to 7).map(k => col(s"l$k"))
    val num = lags.zipWithIndex.map { case (c, k) =>
      coalesce(c * lit(1L << (7 - k)), lit(0L))
    }.reduce(_ + _)
    val den = lags.zipWithIndex.map { case (c, k) =>
      when(c.isNotNull, lit(1L << (7 - k))).otherwise(lit(0L))
    }.reduce(_ + _)
    lagged.select(col("user_id"), col("event_id"), col("ts"),
        num.as("ewma_num_e2"), den.as("ewma_den"))
      .withColumn("ewma",
        col("ewma_num_e2").cast("double") / col("ewma_den").cast("double")
          / lit(100.0))
      .orderBy("user_id", "ts", "event_id")
  }

  /** F. Rolling z-score anomaly detection — flag events whose value
    * deviates > 3 sample standard deviations from the trailing 20
    * events of the SAME type (the self-calibrating threshold a metrics
    * pipeline uses instead of fixed bounds). The window carries three
    * EXACT integer accumulators (count, Σx, Σx² in cent units), so the
    * anomaly predicate runs entirely in bigint arithmetic —
    * (x·n − Σx)²·(n−1) > 9·n·(n·Σx² − (Σx)²) is |z| > 3 with both
    * sides multiplied out — and no float-rounding edge case can flip a
    * flag between engines. The reported z itself is one fixed
    * expression over those exact integers (deterministic double ops).
    * One shuffle on event_type + a partition-local sort; the trailing
    * frame is a stock codegen'd rolling aggregate, O(1) state per row.
    * A warm-up floor (n ≥ 10) suppresses the unstable early variance. */
  private def winAnomalyZscore(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    t(spark, sfDir, "events")
      .where(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"),
        expr("cast(round(value * 100) as bigint)").as("x_e2"))
      .select(col("event_id"), col("event_type"), col("ts"), col("value"),
        col("x_e2"),
        count(col("x_e2")).over(w).as("n"),
        sum(col("x_e2")).over(w).as("s1"),
        sum(col("x_e2") * col("x_e2")).over(w).as("s2"))
      .where(col("n") >= 10 &&
        (col("x_e2") * col("n") - col("s1")) *
          (col("x_e2") * col("n") - col("s1")) * (col("n") - 1) >
          lit(9L) * col("n") *
            (col("n") * col("s2") - col("s1") * col("s1")))
      .selectExpr("event_id", "event_type", "ts", "value", "n",
        """CAST(x_e2 * n - s1 AS DOUBLE) /
           sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) * CAST(n AS DOUBLE)
                / CAST(n - 1 AS DOUBLE)) AS z""")
      .orderBy("event_type", "ts", "event_id")
  }

  /** F. Rolling 24-hour Pearson correlation between the hourly click
    * and view revenue series — the "did these two metrics decouple"
    * monitor. Two stages with very different scale profiles, kept
    * deliberately separate: (1) the hourly aggregation is the
    * data-sized work — one shuffle keyed by hour bucket, map-side
    * combined, cents-exact conditional sums; (2) the rolling window
    * runs over the RESULTING hourly series, whose cardinality is
    * bounded by the time span (720 rows/month), not the corpus — so
    * its single-task global order is fine at any data scale (the same
    * argument as gap-fill's date spine). All five accumulators
    * (Σx, Σy, Σx², Σy², Σxy) are exact bigints; r is one fixed IEEE
    * expression over them, and the degenerate zero-variance windows
    * are excluded by EXACT integer predicates — no NaN can reach the
    * output. */
  private def winRollingCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = t(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(
        coalesce(sum(when(col("event_type") === "click",
          expr("cast(round(value * 100) as bigint)"))), lit(0L)).as("x"),
        coalesce(sum(when(col("event_type") === "view",
          expr("cast(round(value * 100) as bigint)"))), lit(0L)).as("y"))
    val w = Window.orderBy("bucket").rowsBetween(-23, 0)
    hourly.select(col("bucket"),
        count(lit(1)).over(w).as("n"),
        sum(col("x")).over(w).as("sx"), sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("x")).over(w).as("sxx"),
        sum(col("y") * col("y")).over(w).as("syy"),
        sum(col("x") * col("y")).over(w).as("sxy"))
      .where(col("n") === 24 &&
        (col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
        (col("n") * col("syy") - col("sy") * col("sy")) > 0)
      .selectExpr("bucket", "n",
        """CAST(n * sxy - sx * sy AS DOUBLE) /
           (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
            sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r""")
      .orderBy("bucket")
  }

  /** Running DISTINCT count — an operator no engine has as a native
    * window function (COUNT(DISTINCT) OVER is unsupported in both Spark
    * and DuckDB): "how many distinct event types has this user seen as
    * of each event?" The scalable rewrite: mark each type's earliest
    * event with a first-occurrence flag (lag over a type-major sort —
    * no per-type state), then a running SUM of flags in time order.
    * Both windows partition by user_id ONLY, so Catalyst plans ONE
    * exchange and two partition-local sorts — the naive per-(user,type)
    * first-occurrence window would shuffle twice. At 100 TB the state
    * per task is one lag value and one running sum — constant memory,
    * any user-history length. */
  private def winCumulativeDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val byType = Window.partitionBy("user_id")
      .orderBy(col("event_type"), col("ts"), col("event_id"))
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        when(lag(col("event_type"), 1).over(byType).isNull ||
          lag(col("event_type"), 1).over(byType) =!= col("event_type"), 1L)
          .otherwise(0L).as("first_seen"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        sum(col("first_seen")).over(byTime).as("cum_distinct_types"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** F. Event-sequence pattern match — MATCH_RECOGNIZE semantics
    * (contiguous regex over each user's time-ordered event stream),
    * which the funnel key deliberately does NOT cover: win_funnel is
    * time-bounded step-mins, this is order-contiguity ("a view, at
    * most two clicks, then a purchase — with nothing else between").
    * Each user's events collapse to a character sequence (one
    * user-keyed shuffle, the tokenization shape) and the pattern runs
    * as an anchored-free regex per user — work O(sequence length). At
    * 100 TB the sequence is bounded by the retention window the
    * pipeline already enforces; the regex is engine-portable (simple
    * concatenation/quantifiers evaluate identically under Java regex
    * and RE2). Ties on ts break by event_id so the sequence — and
    * therefore the match set — is bit-deterministic. */
  private def winPatternMatch(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .selectExpr("user_id", "event_id", "ts",
        "substring(event_type, 1, 1) AS ch")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        expr("concat_ws('', transform(" +
          "array_sort(collect_list(struct(ts, event_id, ch)))," +
          " s -> s.ch))").as("seq"))
      .selectExpr("user_id", "n_events",
        "CAST(regexp_count(seq, 'vc{0,2}p') AS INT) AS n_matches",
        "regexp_extract(seq, 'vc{0,2}p', 0) AS first_match")
      .where(col("n_matches") >= 1)
      .orderBy("user_id")

  /** F. Maximum drawdown per event type — the largest peak-to-current
    * decline of the hourly revenue LEVEL series (max over t of
    * max_{t'≤t} S_{t'} − S_t): the "how far has this metric fallen
    * from its historical peak" monitor. (The textbook cumulative-PnL
    * form is degenerate on an all-positive revenue stream — the
    * cumulative sum is monotone, drawdown identically 0 — so the
    * level-series form is the one that carries information here, and
    * it is the form metric monitoring actually alerts on.) Same
    * two-stage split as [[winRollingCorr]], because the stages have
    * opposite scale profiles: (1) the hourly aggregation is the
    * data-sized work — one shuffle keyed by (type, hour), map-side
    * combined, cents-exact bigint sums; (2) the running-peak and
    * drawdown windows run over the RESULTING hourly series, whose row
    * count is bounded by types × hours-in-span (≤ a few thousand for
    * any retention window), not by the corpus — the documented
    * bounded-input exception, constant work at any data scale. Both
    * windows share one partitioning (event_type) ⇒ a single exchange.
    * The trough hour ties break to the EARLIEST hour achieving the
    * max drawdown (min over an exact integer equality), so the answer
    * is bit-deterministic in both engines. */
  private def winDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = t(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("rev_c"))
    val run = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = hourly
      .select(col("event_type"), col("bucket"), col("rev_c"),
        (max(col("rev_c")).over(run) - col("rev_c")).as("drawdown"))
    dd.select(col("event_type"), col("bucket"), col("drawdown"),
        max(col("drawdown")).over(Window.partitionBy("event_type"))
          .as("mdd"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        max(col("drawdown")).as("max_drawdown_c"),
        min(when(col("drawdown") === col("mdd"), col("bucket")))
          .as("trough_hour"))
      .orderBy("event_type")
  }

  /** F. Mann–Kendall trend test per event type — the standard
    * non-parametric "is this metric trending" monitor: S = Σ_{i<j}
    * sign(x_j − x_i) over the hourly revenue series, significance at
    * α=0.05 via S² against the null variance n(n−1)(2n+5)/18. Same
    * bounded-series two-stage shape as [[winDrawdown]]: the hourly
    * aggregation is the data-sized pass; the pairwise S runs as a
    * self-join on the RESULTING series (≤ hours-in-span rows per type,
    * O(n²) on a time-bounded n — a few hundred thousand comparisons,
    * constant in corpus size). S itself is exact integer arithmetic
    * (cents-exact x, sign() in {−1,0,1}); the significance decision
    * 10000·18·S² vs 38416·n(n−1)(2n+5) (1.96² = 3.8416 exactly) is
    * evaluated in DOUBLES with identical operand order in both
    * engines: |S| can reach n(n−1)/2, so the int64 form overflows
    * once a series exceeds ~3,800 buckets (~5 months of hours) — and
    * the engines diverge in failure MODE (Spark non-ANSI wraps
    * silently, DuckDB raises). Both sides are single fixed float
    * expressions, so the double form is engine-deterministic at every
    * retention length. (Tie correction for the variance is omitted;
    * cents-exact hourly sums make exact ties measure-zero rare, and
    * omitting it is CONSERVATIVE-neutral the same way in both
    * engines.) */
  private def winTrendMannKendall(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = t(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("x"))
    val a = hourly.select(col("event_type"), col("bucket").as("ba"),
      col("x").as("xa"))
    val b = hourly.select(col("event_type"), col("bucket").as("bb"),
      col("x").as("xb"))
    a.join(b, Seq("event_type"))
      .where(col("ba") < col("bb"))
      .groupBy("event_type")
      .agg(expr("cast(sum(sign(xb - xa)) as bigint)").as("s_stat"))
      .join(hourly.groupBy("event_type").agg(count(lit(1)).as("n")),
        Seq("event_type"))
      .selectExpr("event_type", "n", "s_stat",
        """CASE WHEN 180000.0 * CAST(s_stat AS DOUBLE) * CAST(s_stat AS DOUBLE) >
                  38416.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) *
                  (2.0 * CAST(n AS DOUBLE) + 5.0)
                THEN IF(s_stat > 0, 'increasing', 'decreasing')
                ELSE 'no_trend' END AS verdict""")
      .orderBy("event_type")
  }

  /** F. Autocorrelation of the hourly revenue series at the standard
    * monitoring lags (1, 2, 3, 6, 12, 24 h) per event type — the
    * seasonality detector that tells a pipeline WHICH period its
    * metric repeats on (win_seasonal_profile assumes hour-of-day;
    * ACF measures whether that, or a shorter cycle, is actually
    * there). Same bounded-series two-stage shape as [[winDrawdown]]:
    * the hourly aggregation is the data-sized pass; the per-lag
    * self-equi-join on (type, bucket+lag) runs over the RESULTING
    * series (≤ hours-in-span rows per type — the documented
    * bounded-input exception). Engine parity: residuals are exact
    * integers (whole-DOLLAR quantization applied to the non-negative
    * cents sums BEFORE the mean subtraction — trunc and floor
    * division only agree on non-negatives, so neither engine ever
    * floor-divides a negative), num and den are exact bigint sums
    * bounded by dollars²·hours ≈ 1e16 ≪ 2^53 — so the final CAST to
    * DOUBLE is value-exact and the one rounded division is a single
    * IEEE op, identical in both engines. The dollar quantization is
    * the same domain-bounding knob as the weighted-percentile key's.
    */
  private def winAutocorr(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = t(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(expr(
        """CAST(sum(cast(round(value * 100) as bigint)) DIV 100
           AS BIGINT)""").as("x_usd"))
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x_usd")).as("s"))
      .selectExpr("event_type", "CAST(s DIV n AS BIGINT) AS m_usd")
    val r = hourly.join(broadcast(stats), Seq("event_type"))
      .selectExpr("event_type", "bucket",
        "CAST(x_usd - m_usd AS BIGINT) AS r")
      .localCheckpoint(true) // reused: den + both sides of the lag join
    val den = r.groupBy("event_type").agg(sum(expr("r * r")).as("den"))
    val num = r
      .withColumn("lag_h", explode(typedLit(Seq(1, 2, 3, 6, 12, 24))))
      .withColumn("b2", expr("bucket + make_interval(0, 0, 0, 0, lag_h, 0, 0)"))
      .join(r.select(col("event_type"), col("bucket").as("b2"),
        col("r").as("r2")), Seq("event_type", "b2"))
      .groupBy("event_type", "lag_h")
      .agg(count(lit(1)).as("n_pairs"), sum(expr("r * r2")).as("num"))
    num.join(broadcast(den), Seq("event_type"))
      .selectExpr("event_type", "CAST(lag_h AS INT) AS lag_h", "n_pairs",
        """CAST(round(1000000.0 * CAST(num AS DOUBLE) /
             CAST(greatest(den, CAST(1 AS BIGINT)) AS DOUBLE)) AS BIGINT)
           AS acf_e6""")
      .orderBy("event_type", "lag_h")
  }

  /** F. Seasonal-naive forecast backtest — the baseline every real
    * forecaster is judged against: predict each hour's revenue as the
    * SAME HOUR YESTERDAY (x̂(t) = x(t−24 h)) and report the per-type
    * MAE over the overlap. Publishing this number next to win_ewma /
    * win_autocorr closes the monitoring loop: a model that can't beat
    * seasonal-naive on this table isn't earning its complexity. Same
    * bounded-series shape as [[winAutocorr]]: the hourly aggregation
    * is the data-sized pass; the lag join is one (type, bucket+24h)
    * equi-join over the bounded series. Errors are exact cents
    * integers end to end (|x−x̂| sums in int64; MAE floor-divides
    * non-negatives, where trunc and floor agree in both engines). */
  private def winForecastNaive(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = t(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("x"))
    val prev = hourly.selectExpr("event_type",
      "bucket + make_interval(0, 0, 0, 0, 24, 0, 0) AS bucket",
      "x AS x_hat")
    hourly.join(prev, Seq("event_type", "bucket"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(expr("abs(x - x_hat)")).as("sum_abs_err_c"),
        sum(col("x")).as("sum_actual_c"))
      .selectExpr("event_type", "n_hours", "sum_abs_err_c",
        "CAST(sum_abs_err_c DIV n_hours AS BIGINT) AS mae_c",
        """CAST(sum_abs_err_c * 1000000 DIV greatest(sum_actual_c,
           CAST(1 AS BIGINT)) AS BIGINT) AS wape_ppm""")
      .orderBy("event_type")
  }

  /** F. Multi-touch attribution — the conversion-credit operator a
    * marketing/traffic pipeline runs after sessionization: every
    * purchase credits the SAME USER's clicks in the preceding 24 h,
    * linear split with the integer remainder going to the LAST touch
    * (row_number over (ts, click_id) — deterministic under ties), so
    * the credited cents sum EXACTLY to the purchase amount — exact
    * integer conservation, no float leakage, spec-asserted. The join
    * is user-keyed equi + time-range predicate (the join_range
    * pattern: one shuffle on user_id, range as post-filter); the
    * per-purchase windows run over each purchase's ≤24 h touch set —
    * bounded by per-user daily activity, never the corpus. At 100 TB
    * the same plan holds: user-keyed co-partitioning, AQE skew-split
    * for bot-grade users. */
  private def winAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    // value >= 0: attribution splits cents with integer division, and
    // a negative amount (refund) would diverge between engines (Spark
    // DIV truncates toward zero, DuckDB // floors) AND break the
    // remainder-to-last-touch conservation. Refund rows are excluded
    // from attribution in BOTH engines — the same stated-assumption
    // convention as winAutocorr's non-negativity note, made executable.
    val purch = ev.where(col("event_type") === "purchase" &&
        col("value") >= 0)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("pts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy("purchase_id")
    purch.join(clicks, Seq("user_id"))
      .where(col("cts") <= col("pts") &&
        col("cts") > col("pts") - expr("INTERVAL 24 HOURS"))
      .withColumn("n_touch", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(
        Window.partitionBy("purchase_id")
          .orderBy(col("cts").desc, col("click_id").desc)))
      .selectExpr("purchase_id", "click_id", "n_touch",
        "rn = 1 AS is_last",
        """CAST(cents DIV n_touch +
             IF(rn = 1, cents - cents DIV n_touch * n_touch, 0)
           AS BIGINT) AS credit_c""")
      .orderBy("purchase_id", "click_id")
  }

  /** F. One-sided CUSUM change-point detector per event type — the
    * classic "has this metric drifted upward" page: S_t = max(0,
    * S_{t−1} + (x_t − mean)) with an alarm when S crosses h. The
    * recursion LOOKS inherently sequential, but has the exact closed
    * form S_t = P_t − min(0, min_{j≤t} P_j) over the prefix sums P of
    * the centered series — so it runs as two stacked window functions
    * (running sum, then running min) on ONE (event_type, bucket)
    * partitioning, no recursion, no UDAF. Everything is exact integer
    * arithmetic: centering multiplies through by n (y_t = n·x_t − T,
    * avoiding a fractional mean), so S is in n·cents and the alarm
    * threshold h = T (one average hour's revenue, scaled by the same
    * n) compares BIGINT to BIGINT — bit-deterministic in both
    * engines. Same bounded-hourly-series two-stage shape as
    * [[winDrawdown]]: the aggregation pass is data-sized; the windows
    * run on ≤ hours-in-span rows per type, constant in corpus size. */
  private def winCusumChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = t(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("x"))
    val stats = Window.partitionBy("event_type")
    val run = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = hourly
      .select(col("event_type"), col("bucket"), col("x"),
        count(lit(1)).over(stats).as("n"),
        sum(col("x")).over(stats).as("tot"))
      .select(col("event_type"), col("bucket"), col("n"), col("tot"),
        sum(col("n") * col("x") - col("tot")).over(run).as("p"))
      .select(col("event_type"), col("bucket"), col("n"), col("tot"),
        (col("p") - least(lit(0L), min(col("p")).over(run))).as("s"))
    cusum
      .groupBy("event_type")
      .agg(max(col("n")).cast("long").as("n_hours"),
        max(col("s")).as("max_cusum"),
        sum(when(col("s") > col("tot"), 1L).otherwise(0L)).as("n_alarm_hours"),
        min(when(col("s") > col("tot"), col("bucket"))).as("first_alarm_hour"))
      .orderBy("event_type")
  }

  /** F. Hour-of-day seasonal profile per event type — the 24-bucket
    * seasonality fingerprint a forecasting/anomaly pipeline computes
    * before any model sees the series: mean revenue and traffic share
    * per (type, hour-of-day). One data-sized aggregation keyed by
    * (type, hod) — 24 × |types| output rows at ANY corpus size — plus
    * a type-partitioned window to attach the share denominator
    * without a second corpus pass. Ratios round through ONE double
    * multiply+divide (negative-safe: refund-heavy hours can drive
    * rev_c below zero, where integer DIV truncates in one engine and
    * floors in the other), so rows are bit-deterministic;
    * the peak flag is a rank-1 test over the exact integer ordering
    * (rev_c DESC, hod ASC), ties broken to the earliest hour the same
    * way in both engines. */
  private def winSeasonalProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val byHod = t(spark, sfDir, "events")
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("rev_c"))
    val wt = Window.partitionBy("event_type")
    val peak = Window.partitionBy("event_type")
      .orderBy(col("rev_c").desc, col("hod"))
    byHod
      .select(col("event_type"), col("hod"), col("n_events"), col("rev_c"),
        sum(col("rev_c")).over(wt).as("type_rev"),
        row_number().over(peak).as("peak_rk"))
      // greatest(type_rev, 1): an all-zero-revenue type would make the
      // share denominator 0 — Spark DIV 0 yields NULL while DuckDB //0
      // raises, the degenerate-data parity class win_forecast_naive /
      // win_autocorr already guard. Unreachable on current fixtures but
      // the guard keeps the two engines equivalent on ANY input.
      // Ratios go round-through-double (the agg_gini negative-safe
      // convention): a refund-heavy hour can make rev_c NEGATIVE, where
      // integer DIV truncates in Spark but floors in DuckDB; one IEEE
      // multiply + divide + half-away round is identical in both.
      .selectExpr("event_type", "hod", "n_events",
        "CAST(round(rev_c * 1000000.0 / n_events) AS BIGINT) AS mean_rev_e6",
        "CAST(round(rev_c * 1000000.0 / greatest(type_rev, 1)) AS BIGINT) AS share_ppm",
        "peak_rk = 1 AS is_peak_hour")
      .orderBy("event_type", "hod")
  }

  /** F. Theil–Sen robust slope per event type — the estimator that
    * pairs with [[winTrendMannKendall]] in every nonparametric trend
    * monitor: MK answers "is there a trend", Theil–Sen answers "how
    * steep", and both ignore outliers a least-squares fit would chase.
    * Slope = the MEDIAN of all pairwise slopes (x_j − x_i)/(h_j − h_i)
    * over the hourly series (hours as exact epoch-hour integers, so
    * denominators are integers and every slope is one double division
    * with identical operand order in both engines). Median = the
    * lower median, selected by row_number over the deterministic
    * (slope, ha, hb) order — an exact element pick, not an average,
    * so no float arithmetic beyond the division itself. Same bounded-
    * series shape as MK: data-sized hourly aggregation, O(n²) pairs
    * on a time-bounded n. */
  private def winTheilSen(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = t(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("x"))
      .selectExpr("event_type",
        "CAST(unix_timestamp(bucket) DIV 3600 AS BIGINT) AS h", "x")
    val a = hourly.select(col("event_type"), col("h").as("ha"),
      col("x").as("xa"))
    val b = hourly.select(col("event_type"), col("h").as("hb"),
      col("x").as("xb"))
    val slopes = a.join(b, Seq("event_type"))
      .where(col("ha") < col("hb"))
      .selectExpr("event_type", "ha", "hb",
        "CAST(xb - xa AS DOUBLE) / CAST(hb - ha AS DOUBLE) AS slope")
    // Pair count in CLOSED FORM (r16): every (ha < hb) pair of the n_h
    // hourly buckets is a slope row, so cnt = n_h·(n_h−1)/2 exactly —
    // the former count() window was a SECOND full WindowExec pass
    // buffering all O(n_h²) slope rows per type just to recount them.
    // One row_number pass remains (the median pick needs the order);
    // the hourly-count join the key already paid now also carries cnt,
    // broadcast. Identical output (same rk target, same n_pairs).
    val nh = hourly.groupBy("event_type").agg(count(lit(1)).as("n_hours"))
      .withColumn("cnt", expr("n_hours * (n_hours - 1) DIV 2"))
    val ranked = slopes
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("slope"), col("ha"), col("hb"))))
    ranked.join(broadcast(nh), Seq("event_type"))
      .where(expr("rk = (cnt + 1) DIV 2"))
      .selectExpr("event_type", "n_hours", "cnt AS n_pairs",
        "CAST(round(slope * 1000000.0) AS BIGINT) AS slope_e6_per_hour")
      .orderBy("event_type")
  }

  /** F. LTTB (largest-triangle-three-buckets) downsampling of the
    * hourly revenue series to 24 points — the telemetry/dashboard
    * decimation every monitoring stack runs before plotting a long
    * series: per target bucket, keep the point forming the largest
    * triangle with the NEIGHBOR-BUCKET AVERAGES (the parallel-friendly
    * LTTB variant — classic LTTB anchors on the previously SELECTED
    * point, a sequential dependency; anchoring on the previous bucket's
    * average is the standard parallelization and both engines replay
    * it identically). Shape: one data-sized hourly aggregation, then
    * ALL selection work on the ≤ span-hours bounded series (the benign
    * single-partition window class) — bucket stats are a 24-row
    * broadcast, and the triangle area is exact integer arithmetic:
    * hours rebase to small offsets and the area comparison is scaled
    * by the (constant-within-bucket) anchor counts cl²·cr, so argmax
    * needs no division — ties break to the earliest hour. First/last
    * points are always kept (area NULL), per the algorithm. */
  private def winLttbDownsample(spark: SparkSession,
                                sfDir: String): DataFrame = {
    val m = 24
    val hourly = t(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("bucket_ts"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
    val bounds = hourly.agg(min(col("bucket_ts")).as("t0"),
      count(lit(1)).as("n"))
    val pts = hourly.crossJoin(broadcast(bounds))
      .selectExpr(
        """CAST((unix_timestamp(bucket_ts) - unix_timestamp(t0)) DIV 3600
           AS BIGINT) AS x""", "y", "n")
      .withColumn("rn", row_number().over(Window.orderBy("x")))
      .selectExpr("x", "y", "n", "rn",
        s"""CASE WHEN rn = 1 THEN 0
                 WHEN rn = n THEN ${m - 1}
                 ELSE CAST(1 + (rn - 2) * ${m - 2} DIV (n - 2) AS INT)
            END AS b""")
    val stats = pts.groupBy("b")
      .agg(count(lit(1)).as("c"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"))
    val mids = pts.where(col("b").between(1, m - 2))
      .join(broadcast(stats.selectExpr("b + 1 AS b", "c AS cl",
        "sx AS sxl", "sy AS syl")), Seq("b"))
      .join(broadcast(stats.selectExpr("b - 1 AS b", "c AS cr",
        "sx AS sxr", "sy AS syr")), Seq("b"))
      // area × 2·cl²·cr (constant within a bucket): |(ax−bx)(y−ay) −
      // (ax−x)(ay−by)| with a = left-bucket mean, b = right-bucket
      // mean, fractions cleared — exact int64 (x rebased ≤ span-hours,
      // y cents)
      .withColumn("area", expr(
        """abs((sxl * cr - sxr * cl) * (y * cl - syl) -
               (sxl - x * cl) * (syl * cr - syr * cl))"""))
      .withColumn("rk", row_number().over(
        Window.partitionBy("b").orderBy(col("area").desc, col("x"))))
      .where(col("rk") === 1)
      .selectExpr("b AS bucket", "x AS hour_offset", "y AS y_cents",
        "area AS tri_area_scaled")
    val ends = pts.where(col("b") === 0 || col("b") === m - 1)
      .selectExpr("b AS bucket", "x AS hour_offset", "y AS y_cents",
        "CAST(NULL AS BIGINT) AS tri_area_scaled")
    mids.unionByName(ends).orderBy("bucket")
  }

  /** F. Holt linear-trend (double exponential) smoothing per event
    * type, α = β = ½ — the level+trend upgrade of [[winEwma]] and the
    * model-based sibling of the seasonal-naive backtest: one smoothed
    * LEVEL and one smoothed TREND per series, folded left-to-right
    * over the hourly revenue, plus 1/2/3-hour-ahead linear forecasts
    * and the in-sample one-step absolute-error total. The fold runs
    * via `aggregate` over the per-type SORTED bounded series (≤
    * span-hours elements — the Kaplan-Meier collect-fold device), so
    * the data-sized work is exactly one (type, hour) aggregation.
    * Engine parity: the accumulator is DOUBLES on purpose — the fold
    * order is FIXED by the sorted array in both engines, so IEEE
    * arithmetic is bit-identical (the float hazard this repo avoids is
    * ORDER-nondeterministic distributed sums, which a sequential fold
    * never has), and α = β = ½ keeps every update a power-of-two
    * division. The coupled update is inlined to closed forms — l' =
    * (x+l+b)/2, b' = (x−l+b)/4 + b/2 — so no intermediate needs
    * rebinding inside the lambda; results round ONCE to integer
    * cents. */
  private def winHoltLinear(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = t(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("x"))
    hourly.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("bucket"),
        col("x").cast("double").as("x")))).as("s"),
        count(lit(1)).as("n_hours"))
      .where(col("n_hours") >= 2)
      .selectExpr("event_type", "n_hours",
        // brackets are 0-BASED in Spark SQL (slice is 1-based): s[0] /
        // s[1] are the first two points seeding level and trend
        """aggregate(slice(s, 3, CAST(size(s) - 2 AS INT)),
             named_struct('l', s[0].x, 'b', s[1].x - s[0].x,
                          'sae', CAST(0.0 AS DOUBLE)),
             (acc, p) -> named_struct(
               'l', (p.x + acc.l + acc.b) / 2.0,
               'b', (p.x - acc.l + acc.b) / 4.0 + acc.b / 2.0,
               'sae', acc.sae + abs(p.x - (acc.l + acc.b)))) AS st""")
      .selectExpr("event_type", "n_hours",
        "CAST(round(st.l) AS BIGINT) AS level_c",
        "CAST(round(st.b * 100.0) AS BIGINT) AS trend_ce2_per_hour",
        "CAST(round(st.sae) AS BIGINT) AS sae_c",
        "CAST(round(st.l + st.b) AS BIGINT) AS forecast_1h_c",
        "CAST(round(st.l + 2.0 * st.b) AS BIGINT) AS forecast_2h_c",
        "CAST(round(st.l + 3.0 * st.b) AS BIGINT) AS forecast_3h_c")
      .orderBy("event_type")
  }

  /** F. First-order Markov transition matrix of user journeys — the
    * behavioral-model primitive every funnel/recommendation dashboard
    * computes before any sequence model: P(next event type | current),
    * estimated from each user's time-ordered event stream. One
    * user-keyed shuffle carries the lead() window (per-user state only
    * — the scalable sequence-op shape), transitions reduce to a
    * (prev, next) count table bounded by types² at ANY corpus size,
    * and probabilities are exact ppm integer divisions against a
    * broadcast row-total. Ordering ties break on event_id so both
    * engines see the identical sequence; the modal next step per state
    * is a row_number over the bounded matrix. */
  private def winMarkovTransitions(spark: SparkSession,
                                   sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = t(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val tot = trans.groupBy("prev_type").agg(sum(col("n")).as("row_tot"))
    trans.join(broadcast(tot), Seq("prev_type"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("prev_type")
          .orderBy(col("n").desc, col("next_type"))))
      .selectExpr("prev_type", "next_type", "n",
        "CAST(n * 1000000 DIV row_tot AS BIGINT) AS p_ppm",
        "rk = 1 AS is_modal_next")
      .orderBy("prev_type", "next_type")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_markov_transitions" -> (winMarkovTransitions _),
    "win_lttb_downsample" -> (winLttbDownsample _),
    "win_holt_linear" -> (winHoltLinear _),
    "win_theil_sen" -> (winTheilSen _),
    "win_cusum_changepoint" -> (winCusumChangepoint _),
    "win_seasonal_profile" -> (winSeasonalProfile _),
    "win_trend_mann_kendall" -> (winTrendMannKendall _),
    "win_autocorr" -> (winAutocorr _),
    "win_attribution" -> (winAttribution _),
    "win_forecast_naive" -> (winForecastNaive _),
    "win_drawdown" -> (winDrawdown _),
    "win_pattern_match" -> (winPatternMatch _),
    "win_cumulative_distinct" -> (winCumulativeDistinct _),
    "win_rolling_corr" -> (winRollingCorr _),
    "win_anomaly_zscore" -> (winAnomalyZscore _),
    "win_ewma" -> (winEwma _),
    "win_streak" -> (winStreak _),
    "win_retention" -> (winRetention _),
    "win_kaplan_meier" -> (winKaplanMeier _),
    "win_funnel" -> (winFunnel _),
    "win_gap_fill" -> (winGapFill _),
    "win_resample_ohlc" -> (winResampleOhlc _),
    "win_distribution" -> (winDistribution _),
    "win_rank" -> (winRank _),
    "win_lag_lead" -> (winLagLead _),
    "win_running_sum" -> (winRunningSum _),
    "win_range_frame" -> (winRangeFrame _),
    "win_topk_per_group" -> (winTopKPerGroup _),
    "win_topk_custom" -> (winTopKCustom _),
    "win_session_batch" -> (winSessionBatch _))

  val oracle: Map[String, String] = Map(
    "win_theil_sen" ->
      """WITH hourly AS (
           SELECT event_type,
                  date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                            date_trunc('hour', ts)) AS h,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS x
           FROM events GROUP BY 1, 2),
         slopes AS (
           SELECT a.event_type, a.h AS ha, b.h AS hb,
                  CAST(b.x - a.x AS DOUBLE) / CAST(b.h - a.h AS DOUBLE)
                    AS slope
           FROM hourly a JOIN hourly b
             ON a.event_type = b.event_type AND a.h < b.h),
         ranked AS (
           SELECT event_type, slope,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY slope, ha, hb) AS rk,
                  count(*) OVER (PARTITION BY event_type) AS cnt
           FROM slopes),
         nh AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
                FROM hourly GROUP BY 1)
         SELECT r.event_type, nh.n_hours, CAST(r.cnt AS BIGINT) AS n_pairs,
                CAST(round(r.slope * 1000000.0) AS BIGINT)
                  AS slope_e6_per_hour
         FROM ranked r JOIN nh USING (event_type)
         WHERE r.rk = (r.cnt + 1) // 2
         ORDER BY r.event_type""",
    "win_cusum_changepoint" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS bucket,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS x
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT event_type, bucket, x,
                  count(*) OVER (PARTITION BY event_type) AS n,
                  sum(x) OVER (PARTITION BY event_type) AS tot
           FROM hourly),
         pre AS (
           SELECT event_type, bucket, n, tot,
                  sum(n * x - tot) OVER (PARTITION BY event_type
                    ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
           FROM st),
         cu AS (
           SELECT event_type, bucket, n, tot,
                  p - least(0, min(p) OVER (PARTITION BY event_type
                    ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
           FROM pre)
         SELECT event_type,
                CAST(max(n) AS BIGINT) AS n_hours,
                CAST(max(s) AS BIGINT) AS max_cusum,
                CAST(sum(CASE WHEN s > tot THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_alarm_hours,
                min(CASE WHEN s > tot THEN bucket END) AS first_alarm_hour
         FROM cu GROUP BY 1 ORDER BY 1""",
    "win_seasonal_profile" ->
      """WITH byhod AS (
           SELECT event_type, CAST(hour(ts) AS INT) AS hod,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS rev_c
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT event_type, hod, n_events, rev_c,
                  sum(rev_c) OVER (PARTITION BY event_type) AS type_rev,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY rev_c DESC, hod ASC) AS peak_rk
           FROM byhod)
         SELECT event_type, hod, n_events,
                CAST(round(rev_c * 1000000.0 / n_events) AS BIGINT)
                  AS mean_rev_e6,
                CAST(round(rev_c * 1000000.0 / greatest(type_rev, 1))
                     AS BIGINT) AS share_ppm,
                peak_rk = 1 AS is_peak_hour
         FROM w ORDER BY event_type, hod""",
    "win_trend_mann_kendall" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS bucket,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS x
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT a.event_type,
                  CAST(sum(sign(b.x - a.x)) AS BIGINT) AS s_stat
           FROM hourly a JOIN hourly b
             ON a.event_type = b.event_type AND a.bucket < b.bucket
           GROUP BY 1),
         n AS (SELECT event_type, count(*) AS n FROM hourly GROUP BY 1)
         SELECT event_type, n, s_stat,
                CASE WHEN 180000.0 * CAST(s_stat AS DOUBLE)
                              * CAST(s_stat AS DOUBLE) >
                          38416.0 * CAST(n AS DOUBLE)
                              * (CAST(n AS DOUBLE) - 1.0)
                              * (2.0 * CAST(n AS DOUBLE) + 5.0)
                     THEN CASE WHEN s_stat > 0 THEN 'increasing'
                               ELSE 'decreasing' END
                     ELSE 'no_trend' END AS verdict
         FROM s JOIN n USING (event_type)
         ORDER BY event_type""",
    "win_autocorr" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS bucket,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100
                    AS BIGINT) AS x_usd
           FROM events GROUP BY 1, 2),
         stats AS (SELECT event_type,
                     CAST(sum(x_usd) // count(*) AS BIGINT) AS m_usd
                   FROM hourly GROUP BY 1),
         r AS (SELECT h.event_type, h.bucket,
                 CAST(h.x_usd - s.m_usd AS BIGINT) AS r
               FROM hourly h JOIN stats s USING (event_type)),
         den AS (SELECT event_type, CAST(sum(r * r) AS BIGINT) AS den
                 FROM r GROUP BY 1),
         lags AS (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag_h),
         num AS (SELECT a.event_type, l.lag_h, count(*) AS n_pairs,
                   CAST(sum(a.r * b.r) AS BIGINT) AS num
                 FROM r a CROSS JOIN lags l
                 JOIN r b ON b.event_type = a.event_type
                   AND b.bucket = a.bucket
                     + to_hours(CAST(l.lag_h AS BIGINT))
                 GROUP BY 1, 2)
         SELECT n.event_type, CAST(n.lag_h AS INTEGER) AS lag_h,
                CAST(n.n_pairs AS BIGINT) AS n_pairs,
                CAST(round(1000000.0 * CAST(n.num AS DOUBLE) /
                     CAST(greatest(d.den, CAST(1 AS BIGINT)) AS DOUBLE))
                  AS BIGINT) AS acf_e6
         FROM num n JOIN den d USING (event_type)
         ORDER BY event_type, lag_h""",
    "win_attribution" ->
      """WITH clicks AS (
           SELECT user_id, event_id AS click_id, ts AS cts
           FROM events WHERE event_type = 'click'),
         purch AS (
           SELECT user_id, event_id AS purchase_id, ts AS pts,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase' AND value >= 0),
         touches AS (
           SELECT p.purchase_id, c.click_id, p.cents, c.cts
           FROM purch p JOIN clicks c ON p.user_id = c.user_id
           WHERE c.cts <= p.pts
             AND c.cts > p.pts - INTERVAL 24 HOURS),
         ranked AS (
           SELECT purchase_id, click_id, cents,
                  count(*) OVER (PARTITION BY purchase_id) AS n_touch,
                  row_number() OVER (PARTITION BY purchase_id
                    ORDER BY cts DESC, click_id DESC) AS rn
           FROM touches)
         SELECT purchase_id, click_id, CAST(n_touch AS BIGINT) AS n_touch,
                rn = 1 AS is_last,
                CAST(cents // n_touch +
                     CASE WHEN rn = 1
                          THEN cents - cents // n_touch * n_touch
                          ELSE 0 END AS BIGINT) AS credit_c
         FROM ranked
         ORDER BY purchase_id, click_id""",
    "win_forecast_naive" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS bucket,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS x
           FROM events GROUP BY 1, 2),
         prev AS (
           SELECT event_type, bucket + to_hours(24) AS bucket,
                  x AS x_hat
           FROM hourly)
         SELECT h.event_type, count(*) AS n_hours,
                CAST(sum(abs(h.x - p.x_hat)) AS BIGINT) AS sum_abs_err_c,
                CAST(sum(abs(h.x - p.x_hat)) // count(*) AS BIGINT)
                  AS mae_c,
                CAST(sum(abs(h.x - p.x_hat)) * 1000000
                     // greatest(sum(h.x), CAST(1 AS BIGINT)) AS BIGINT)
                  AS wape_ppm
         FROM hourly h JOIN prev p USING (event_type, bucket)
         GROUP BY 1 ORDER BY h.event_type""",
    "win_drawdown" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS bucket,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS rev_c
           FROM events GROUP BY 1, 2),
         dd AS (
           SELECT event_type, bucket,
                  max(rev_c) OVER (PARTITION BY event_type
                                   ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING) - rev_c
                    AS drawdown
           FROM hourly),
         dd2 AS (
           SELECT *, max(drawdown) OVER (PARTITION BY event_type) AS mdd
           FROM dd)
         SELECT event_type, count(*) AS n_hours,
                max(drawdown) AS max_drawdown_c,
                min(CASE WHEN drawdown = mdd THEN bucket END) AS trough_hour
         FROM dd2 GROUP BY event_type ORDER BY event_type""",
    "win_pattern_match" ->
      """WITH seqs AS (
           SELECT user_id, count(*) AS n_events,
                  string_agg(substring(event_type, 1, 1), ''
                             ORDER BY ts, event_id) AS seq
           FROM events GROUP BY 1)
         SELECT user_id, n_events,
                CAST(len(regexp_extract_all(seq, 'vc{0,2}p')) AS INTEGER)
                  AS n_matches,
                regexp_extract(seq, 'vc{0,2}p') AS first_match
         FROM seqs
         WHERE len(regexp_extract_all(seq, 'vc{0,2}p')) >= 1
         ORDER BY user_id""",
    "win_cumulative_distinct" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts, event_type,
                  CASE WHEN lag(event_type) OVER
                         (PARTITION BY user_id
                          ORDER BY event_type, ts, event_id)
                       IS DISTINCT FROM event_type
                       THEN 1 ELSE 0 END AS first_seen
           FROM events)
         SELECT user_id, event_id, ts, event_type,
                CAST(sum(first_seen) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_distinct_types
         FROM flagged
         ORDER BY user_id, ts, event_id""",
    "win_rolling_corr" ->
      """WITH h AS (
           SELECT date_trunc('hour', ts) AS bucket,
                  coalesce(sum(CASE WHEN event_type = 'click'
                               THEN CAST(round(value * 100) AS BIGINT) END),
                           0) AS x,
                  coalesce(sum(CASE WHEN event_type = 'view'
                               THEN CAST(round(value * 100) AS BIGINT) END),
                           0) AS y
           FROM events GROUP BY 1),
         w AS (
           SELECT bucket,
                  count(*) OVER fr AS n,
                  sum(x) OVER fr AS sx, sum(y) OVER fr AS sy,
                  sum(x * x) OVER fr AS sxx, sum(y * y) OVER fr AS syy,
                  sum(x * y) OVER fr AS sxy
           FROM h
           WINDOW fr AS (ORDER BY bucket
                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
         SELECT bucket, n,
                CAST(n * sxy - sx * sy AS DOUBLE) /
                (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                 sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
         FROM w
         WHERE n = 24
           AND (n * sxx - sx * sx) > 0
           AND (n * syy - sy * sy) > 0
         ORDER BY bucket""",
    "win_anomaly_zscore" ->
      """WITH x AS (
           SELECT event_id, event_type, ts, value,
                  CAST(round(value * 100) AS BIGINT) AS x_e2
           FROM events WHERE value IS NOT NULL),
         w AS (
           SELECT event_id, event_type, ts, value, x_e2,
                  count(x_e2) OVER fr AS n,
                  sum(x_e2) OVER fr AS s1,
                  sum(x_e2 * x_e2) OVER fr AS s2
           FROM x
           WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
         SELECT event_id, event_type, ts, value, n,
                CAST(x_e2 * n - s1 AS DOUBLE) /
                sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) * CAST(n AS DOUBLE)
                     / CAST(n - 1 AS DOUBLE)) AS z
         FROM w
         WHERE n >= 10
           AND (x_e2 * n - s1) * (x_e2 * n - s1) * (n - 1)
               > 9 * n * (n * s2 - s1 * s1)
         ORDER BY event_type, ts, event_id""",
    "win_resample_ohlc" ->
      """SELECT event_type,
                date_trunc('hour', ts)
                  + INTERVAL 1 MINUTE * (5 * (minute(ts) // 5))
                  AS bucket_start,
                (min(struct_pack(a := ts, b := event_id, v := value))).v
                  AS open,
                max(value) AS high,
                min(value) AS low,
                (max(struct_pack(a := ts, b := event_id, v := value))).v
                  AS close,
                CAST(count(*) AS BIGINT) AS n_ticks,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events
         WHERE value IS NOT NULL
         GROUP BY 1, 2
         ORDER BY event_type, bucket_start""",
    "win_ewma" ->
      """WITH x AS (
           SELECT user_id, event_id, ts,
                  CAST(round(value * 100) AS BIGINT) AS x_e2
           FROM events WHERE value IS NOT NULL),
         l AS (
           SELECT user_id, event_id, ts, x_e2,
                  lag(x_e2, 1) OVER w AS l1, lag(x_e2, 2) OVER w AS l2,
                  lag(x_e2, 3) OVER w AS l3, lag(x_e2, 4) OVER w AS l4,
                  lag(x_e2, 5) OVER w AS l5, lag(x_e2, 6) OVER w AS l6,
                  lag(x_e2, 7) OVER w AS l7
           FROM x
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         e AS (
           SELECT user_id, event_id, ts,
                  CAST(x_e2 * 128
                       + coalesce(l1 * 64, 0) + coalesce(l2 * 32, 0)
                       + coalesce(l3 * 16, 0) + coalesce(l4 * 8, 0)
                       + coalesce(l5 * 4, 0) + coalesce(l6 * 2, 0)
                       + coalesce(l7, 0) AS BIGINT) AS ewma_num_e2,
                  CAST(128
                       + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END
                       + CASE WHEN l2 IS NULL THEN 0 ELSE 32 END
                       + CASE WHEN l3 IS NULL THEN 0 ELSE 16 END
                       + CASE WHEN l4 IS NULL THEN 0 ELSE 8 END
                       + CASE WHEN l5 IS NULL THEN 0 ELSE 4 END
                       + CASE WHEN l6 IS NULL THEN 0 ELSE 2 END
                       + CASE WHEN l7 IS NULL THEN 0 ELSE 1 END
                       AS BIGINT) AS ewma_den
           FROM l)
         SELECT user_id, event_id, ts, ewma_num_e2, ewma_den,
                CAST(ewma_num_e2 AS DOUBLE) / CAST(ewma_den AS DOUBLE)
                  / 100.0 AS ewma
         FROM e ORDER BY user_id, ts, event_id""",
    "win_streak" ->
      """WITH days AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         islands AS (
           SELECT user_id, day,
                  date_diff('day', DATE '1990-01-01', day)
                    - row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS island
           FROM days),
         streaks AS (
           SELECT user_id, island, count(*) AS streak_days,
                  min(day) AS streak_start
           FROM islands GROUP BY 1, 2)
         SELECT user_id, streak_days, streak_start
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY streak_days DESC, streak_start) AS rk
               FROM streaks)
         WHERE rk = 1 ORDER BY user_id""",
    "win_markov_transitions" ->
      """WITH seq AS (
           SELECT event_type,
                  lead(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_type
           FROM events),
         trans AS (
           SELECT event_type AS prev_type, next_type,
                  CAST(count(*) AS BIGINT) AS n
           FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_tot
                 FROM trans GROUP BY 1),
         rk AS (
           SELECT t.prev_type, t.next_type, t.n, o.row_tot,
                  row_number() OVER (PARTITION BY t.prev_type
                    ORDER BY t.n DESC, t.next_type) AS rk
           FROM trans t JOIN tot o USING (prev_type))
         SELECT prev_type, next_type, n,
                CAST(n * 1000000 // row_tot AS BIGINT) AS p_ppm,
                rk = 1 AS is_modal_next
         FROM rk ORDER BY prev_type, next_type""",
    "win_lttb_downsample" ->
      """WITH hourly AS (
           SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_ts,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS y
           FROM events GROUP BY 1),
         bounds AS (SELECT min(bucket_ts) AS t0,
                           CAST(count(*) AS BIGINT) AS n FROM hourly),
         pts AS (
           SELECT CAST(date_diff('hour', t0, bucket_ts) AS BIGINT) AS x,
                  y, n, row_number() OVER (ORDER BY bucket_ts) AS rn
           FROM hourly CROSS JOIN bounds),
         bpts AS (
           SELECT x, y, n, rn,
                  CASE WHEN rn = 1 THEN 0 WHEN rn = n THEN 23
                       ELSE CAST(1 + (rn - 2) * 22 // (n - 2) AS INTEGER)
                  END AS b
           FROM pts),
         stats AS (SELECT b, CAST(count(*) AS BIGINT) AS c,
                          CAST(sum(x) AS BIGINT) AS sx,
                          CAST(sum(y) AS BIGINT) AS sy
                   FROM bpts GROUP BY b),
         mids AS (
           SELECT p.b, p.x, p.y,
                  abs((l.sx * r.c - r.sx * l.c) * (p.y * l.c - l.sy) -
                      (l.sx - p.x * l.c) * (l.sy * r.c - r.sy * l.c))
                    AS area
           FROM bpts p JOIN stats l ON l.b = p.b - 1
                       JOIN stats r ON r.b = p.b + 1
           WHERE p.b BETWEEN 1 AND 22),
         sel AS (
           SELECT b AS bucket, x AS hour_offset, y AS y_cents,
                  area AS tri_area_scaled,
                  row_number() OVER (PARTITION BY b
                    ORDER BY area DESC, x) AS rk
           FROM mids)
         SELECT bucket, hour_offset, y_cents, tri_area_scaled
         FROM sel WHERE rk = 1
         UNION ALL
         SELECT b, x, y, CAST(NULL AS BIGINT) FROM bpts WHERE b IN (0, 23)
         ORDER BY bucket""",
    "win_holt_linear" ->
      """WITH RECURSIVE hourly AS MATERIALIZED (
           SELECT event_type,
                  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                    AS x
           FROM events GROUP BY 1, 2),
         srt AS MATERIALIZED (
           SELECT event_type, x,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY bucket) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM hourly),
         fold AS (
           SELECT a.event_type, 2 AS rn, a.n,
                  a.x AS l, b.x - a.x AS b, CAST(0.0 AS DOUBLE) AS sae
           FROM (SELECT event_type, x, n FROM srt WHERE rn = 1) a
           JOIN (SELECT event_type, x FROM srt WHERE rn = 2) b
             USING (event_type)
           UNION ALL
           SELECT f.event_type, f.rn + 1, f.n,
                  (s.x + f.l + f.b) / 2.0,
                  (s.x - f.l + f.b) / 4.0 + f.b / 2.0,
                  f.sae + abs(s.x - (f.l + f.b))
           FROM fold f JOIN srt s ON s.event_type = f.event_type
                                 AND s.rn = f.rn + 1)
         SELECT event_type, CAST(n AS BIGINT) AS n_hours,
                CAST(round(l) AS BIGINT) AS level_c,
                CAST(round(b * 100.0) AS BIGINT) AS trend_ce2_per_hour,
                CAST(round(sae) AS BIGINT) AS sae_c,
                CAST(round(l + b) AS BIGINT) AS forecast_1h_c,
                CAST(round(l + 2.0 * b) AS BIGINT) AS forecast_2h_c,
                CAST(round(l + 3.0 * b) AS BIGINT) AS forecast_3h_c
         FROM fold WHERE rn = n ORDER BY event_type""",
    "win_kaplan_meier" ->
      """WITH RECURSIVE ev AS (
           SELECT user_id, CAST(ts AS DATE) AS d FROM events),
         hz AS (SELECT max(d) AS hmax FROM ev),
         users AS (
           SELECT user_id,
                  CAST(date_diff('day', min(d), max(d)) AS INTEGER)
                    AS dur_d,
                  max(d) >= (SELECT hmax FROM hz) - 1 AS censored
           FROM ev GROUP BY user_id),
         byday AS (
           SELECT dur_d,
                  CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_deaths,
                  CAST(count(*) AS BIGINT) AS ending
           FROM users GROUP BY dur_d),
         wk AS (
           SELECT dur_d AS day, n_deaths,
                  CAST(sum(ending) OVER (ORDER BY dur_d DESC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk,
                  row_number() OVER (ORDER BY dur_d) AS rn
           FROM byday),
         km AS (
           SELECT rn, day, n_deaths, n_at_risk,
                  CAST(1000000 AS BIGINT) * (n_at_risk - n_deaths)
                    // n_at_risk AS survival_ppm
           FROM wk WHERE rn = 1
           UNION ALL
           SELECT w.rn, w.day, w.n_deaths, w.n_at_risk,
                  km.survival_ppm * (w.n_at_risk - w.n_deaths)
                    // w.n_at_risk
           FROM km JOIN wk w ON w.rn = km.rn + 1)
         SELECT day, n_at_risk, n_deaths, survival_ppm
         FROM km ORDER BY day""",
    "win_retention" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
                  CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
           FROM events),
         firsts AS (
           SELECT user_id, min(week) AS cohort_week FROM act GROUP BY 1)
         SELECT cohort_week,
                CAST(date_diff('day', cohort_week, week) // 7 AS INTEGER)
                  AS week_offset,
                count(DISTINCT a.user_id) AS n_active
         FROM act a JOIN firsts f ON a.user_id = f.user_id
         WHERE date_diff('day', cohort_week, week) // 7 <= 4
         GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",
    "win_funnel" ->
      """WITH s1 AS (
           SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END)
                    AS t_view
           FROM events GROUP BY user_id
           HAVING t_view IS NOT NULL),
         s2 AS (
           SELECT e.user_id, s1.t_view,
                  min(CASE WHEN event_type = 'click' AND e.ts > s1.t_view
                            AND e.ts <= s1.t_view + INTERVAL 1 DAY
                           THEN e.ts END) AS t_click
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           GROUP BY e.user_id, s1.t_view),
         s3 AS (
           SELECT e.user_id, s2.t_view, s2.t_click,
                  min(CASE WHEN event_type = 'purchase' AND e.ts > s2.t_click
                            AND e.ts <= s2.t_click + INTERVAL 1 DAY
                           THEN e.ts END) AS t_purchase
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           GROUP BY e.user_id, s2.t_view, s2.t_click)
         SELECT stage, count(*) AS n_users
         FROM (SELECT CASE WHEN t_purchase IS NOT NULL THEN 3
                           WHEN t_click IS NOT NULL THEN 2
                           ELSE 1 END AS stage
               FROM s3)
         GROUP BY stage ORDER BY stage""",
    "win_gap_fill" ->
      """WITH by_day AS (
           SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  event_type, count(*) AS n,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                    AS day_value
           FROM events WHERE user_id % 97 = 0
           GROUP BY 1, 2),
         days AS (
           SELECT unnest(generate_series(
             (SELECT min(day) FROM by_day),
             (SELECT max(day) FROM by_day),
             INTERVAL 1 DAY)) AS day),
         spine AS (
           SELECT d.day, t.event_type
           FROM days d CROSS JOIN (SELECT DISTINCT event_type FROM by_day) t)
         SELECT s.day, s.event_type,
                coalesce(b.n, 0) AS n_events,
                last_value(b.day_value IGNORE NULLS) OVER (
                  PARTITION BY s.event_type ORDER BY s.day
                  ROWS UNBOUNDED PRECEDING) AS filled_value
         FROM spine s LEFT JOIN by_day b USING (day, event_type)
         ORDER BY s.day, s.event_type""",
    "win_session_batch" ->
      """WITH marked AS (
           SELECT user_id, ts,
                  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
           FROM events),
         sess AS (
           SELECT user_id, ts,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
           FROM marked)
         SELECT min(ts) AS s_start,
                max(ts) + INTERVAL 30 MINUTE AS s_end,
                user_id,
                count(*) AS n_events
         FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start""",
    "win_topk_custom" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
           SELECT o_orderstatus, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_orderstatus, o_orderkey""",
    "win_distribution" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
                cume_dist() OVER w AS cd,
                ntile(4) OVER w AS quartile,
                nth_value(o_orderkey, 3) OVER w AS third_key
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderstatus, o_totalprice, o_orderkey""",
    "win_rank" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rk,
                dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS drk,
                ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
                percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS pct_rk
         FROM orders WHERE o_totalprice > 400000
         ORDER BY o_orderstatus, rn""",
    "win_lag_lead" ->
      """SELECT user_id, event_id, ts, event_type,
                lag(event_type, 1) OVER w AS prev_type,
                lead(event_type, 1) OVER w AS next_type,
                first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, ts, event_id""",
    "win_running_sum" ->
      """SELECT user_id, event_id, ts,
                CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
         FROM events ORDER BY user_id, ts, event_id""",
    "win_range_frame" ->
      """SELECT o_orderstatus, o_orderkey,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
                  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE) AS nearby_revenue
         FROM orders ORDER BY o_orderstatus, o_orderkey""",
    "win_topk_per_group" ->
      """SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
           SELECT o_orderstatus, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_orderstatus, rn""")
}
