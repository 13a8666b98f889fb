package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 operator specs: the persisted LSH bucket index (probe ==
  * in-plan twin, and the probe plan reads the staged table instead of
  * re-deriving L union branches), plus the round's other additions.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("persisted LSH index probes identically to the in-plan key") {
    val inPlan = SparkEntry.queries("llm_ann_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val persisted = SparkEntry.queries("llm_ann_lsh_persisted")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(persisted === inPlan)
  }

  test("persisted LSH probe plan reads the staged index, not L union scans") {
    val df = SparkEntry.queries("llm_ann_lsh_persisted")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the in-plan key derives buckets as a 4-branch union of embedding
    // scans; the persisted probe must NOT — its candidate side is the
    // staged (vec_id, tbl, bucket) table (an InMemoryTableScan over the
    // parquet index via Fixtures.stagedPersisted)
    assert(!plan.contains("Union"),
      "persisted probe re-derives bucket branches instead of reading the index")
    assert(plan.contains("InMemoryTableScan") || plan.contains("graft_lsh_index"),
      s"persisted probe does not read the staged index:\n$plan")
  }
}
