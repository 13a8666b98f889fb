package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables.t
import graft.queries.Joins

/** Plan-shape assertions for the join surface — properties the value
  * oracle can't see (which physical strategy actually ran). */
class JoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed join plan has no shuffle exchange on either side") {
    Joins.dropManaged(spark, "spec_li_b")
    Joins.dropManaged(spark, "spec_o_b")
    t(spark, sfDir, "lineitem").select("l_orderkey", "l_extendedprice")
      .repartition(8, org.apache.spark.sql.functions.col("l_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("spec_li_b")
    t(spark, sfDir, "orders").select("o_orderkey", "o_orderstatus")
      .repartition(8, org.apache.spark.sql.functions.col("o_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("spec_o_b")
    val joined = Joins.bucketedJoinPlan(spark, "spec_li_b", "spec_o_b")
    joined.count() // force planning through AQE
    val plan = joined.queryExecution.executedPlan.toString
    // a real shuffle renders as "Exchange hashpartitioning(...)" (the
    // node name is "Exchange", never the substring "ShuffleExchange")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must be exchange-free:\n$plan")
    assert(!plan.contains("ShuffleQueryStage"),
      s"bucketed join must not create shuffle stages:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge:\n$plan")
    // BOTH scans must use the bucketed layout
    assert("Bucketed: true".r.findAllIn(plan).size === 2,
      s"both scans must be bucketed:\n$plan")
  }

  test("flagship broadcasts the small dimensions") {
    val df = SparkEntry.queries("q_flagship")(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("as-of nearest matches the brute-force nearest view per purchase") {
    val events = t(spark, sfDir, "events")
      .where(col("event_type").isin("purchase", "view"))
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getString(3)))
    val viewsByUser = events.filter(_._4 == "view")
      .groupBy(_._2).map { case (u, vs) => u -> vs.map(_._3) }
    val expected = events.filter(_._4 == "purchase").map { case (id, u, ts, _) =>
      val nearest = viewsByUser.getOrElse(u, Array.empty[java.sql.Timestamp])
        .sortBy(v => (math.abs(v.getTime - ts.getTime), v.getTime))
        .headOption.orNull
      id -> nearest
    }.toMap
    val got = SparkEntry.queries("join_asof_nearest")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(3)).toMap
    assert(got.keySet === expected.keySet)
    val bad = got.filter { case (id, v) => expected(id) != v }
    assert(bad.isEmpty, s"mismatched purchases: ${bad.take(5)}")
  }

  test("spatial grid join equals O(n²) brute-force haversine at test scale") {
    // Recompute coordinates + all-pairs haversine driver-side from the
    // same md5 derivation; the 3×5-cell (wrapped-longitude) blocking
    // must be invisible in the answer.
    val pts = t(spark, sfDir, "customer")
      .selectExpr("c_custkey",
        "md5(concat(cast(c_custkey as string), '#geo-lat')) AS hla",
        "md5(concat(cast(c_custkey as string), '#geo-lon')) AS hlo")
      .collect().map { r =>
        def hex6(h: String): Long =
          h.take(6).foldLeft(0L)((a, c) => a * 16 + Integer.parseInt(c.toString, 16))
        (r.getLong(0), hex6(r.getString(1)) % 1000001 - 500000,
          hex6(r.getString(2)) % 3600001 - 1800000)
      }
    val thr = math.pow(math.sin(300.0 / 12742.0), 2)
    val expected = (for {
      (a, la, qa) <- pts; (b, lb, qb) <- pts if a < b
      phiA = math.toRadians(la / 10000.0); phiB = math.toRadians(lb / 10000.0)
      h = math.pow(math.sin((phiB - phiA) / 2), 2) +
        math.cos(phiA) * math.cos(phiB) *
          math.pow(math.sin((math.toRadians(qb / 10000.0) -
            math.toRadians(qa / 10000.0)) / 2), 2)
      if h <= thr
    } yield (a, b)).toSet
    val gotRows = SparkEntry.queries("join_spatial_grid")(spark, sfDir)
      .select("cust_a", "cust_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = gotRows.toSet
    assert(expected.nonEmpty, "test corpus should contain in-radius pairs")
    assert(got === expected)
    // pin exactly-once emission: the one-cell-per-build-point invariant
    // means no pair may be emitted twice — a Set compare alone would
    // mask duplicates introduced by a future blocking change
    assert(gotRows.length === expected.size,
      "each in-radius pair must be emitted exactly once")
  }
}
