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
    assert(!plan.contains("ShuffleExchange"),
      s"bucketed join must be exchange-free:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"))
    // Bucket pruning metadata present on both scans
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
  }

  test("flagship broadcasts the small dimensions") {
    val df = SparkEntry.queries("q_flagship")(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
