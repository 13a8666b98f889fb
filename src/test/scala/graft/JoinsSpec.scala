package graft

import org.apache.spark.sql.SparkSession
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
}
