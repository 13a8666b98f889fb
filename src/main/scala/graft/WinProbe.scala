package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

/** Dev tool (r17): for every key owning an unpartitioned (global)
  * Window, count the rows actually flowing into each such WindowExec —
  * the evidence behind the "bounded value-domain frame" claim the
  * WindowExec warnings are waved through on (VERDICT r16 #3). Prints
  * per-key window-input row counts at the given sfDir so the spec pin
  * bounds are measured, not guessed.
  * Run: `sbt "runMain graft.WinProbe [sfDir]"`. */
object WinProbe {
  val GlobalWindowKeys: Seq[String] = Seq(
    "agg_bootstrap_ci", "agg_ks_test", "agg_mann_whitney",
    "join_dpp", "llm_dedup_auc", "llm_domain_mix", "llm_mmr_diversify",
    "llm_retrieval_rrf", "llm_triangle_count", "llm_vocab_build",
    "llm_zipf_slope", "sort_skyline", "win_kaplan_meier",
    "win_lttb_downsample", "win_rolling_corr", "stream_topk")

  def globalWindowInputs(spark: SparkSession, df: DataFrame): Seq[Long] = {
    val analyzed: LogicalPlan = GraftSqlBridge.analyzedPlan(df)
    analyzed.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        GraftSqlBridge.ofRows(spark, w.child).count()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GlobalWindowKeys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      val counts = globalWindowInputs(spark, df)
      println(s"[winprobe] $k: ${counts.mkString(", ")}")
    }
    spark.stop()
  }
}
