package graft.streaming

import org.apache.spark.sql.SparkSession

/** Steady-state profile of the streaming dedup intake loop
  * (VERDICT r10 #3): the `stream_incremental_dedup` key runs exactly
  * two micro-batches, so its ×64 bench row measures INTAKE (per-batch
  * signature building over arrivals that happen to be the whole
  * corpus), not the per-batch cost of a long-running loop. This main
  * runs the SAME intake ([[StreamingQ.incrementalDedupIntake]]) over
  * N micro-batches (default 16) of a corpus and prints one JSON line
  * per batch — wall seconds, arrivals, index rows before the batch,
  * live run-dir count, compaction merges — so the claim "per-batch
  * cost tracks batch size + bucket occupancy, not total index size"
  * is a measured table (BASELINE.md r11) instead of an argument.
  *
  * Usage: runMain graft.streaming.DedupIntakeProfile [sfDir] [parts]
  */
object DedupIntakeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale8_r8")
    // same up-front validation as the IntakeProfileRunner twins: a bad
    // parts arg fails with a usage line before any stream setup
    val parts = args.lift(1).map { a =>
      val p = try a.toInt catch {
        case _: NumberFormatException =>
          System.err.println(
            s"usage: DedupIntakeProfile [sfDir] [parts>=1] — parts '$a' is not an integer")
          sys.exit(2)
      }
      if (p < 1) {
        System.err.println(
          s"usage: DedupIntakeProfile [sfDir] [parts>=1] — got parts=$p")
        sys.exit(2)
      }
      p
    }.getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val srcDir = StreamingQ.stagedDocsParts(spark, sfDir, parts)
    val stats =
      scala.collection.mutable.ArrayBuffer.empty[StreamingQ.IntakeBatchStat]
    // one untimed warm-up pass over the FIRST batch's machinery is not
    // separable from the loop (the stream owns batch order), so batch 0
    // carries plan/codegen warm-up; the steady-state signal is batches
    // 1..N-1 and the summary reports both with and without batch 0.
    val verdictDirs =
      StreamingQ.incrementalDedupIntake(spark, srcDir, Some(stats))
    val verdicts = spark.read.parquet(verdictDirs: _*).count()
    def fmt(v: Double): String = f"$v%.3f"
    stats.foreach { s =>
      println(s"""GRAFT_INTAKE_BATCH:{"batch":${s.batchId},""" +
        s""""arrivals":${s.arrivals},"index_rows_before":${s.indexRowsBefore},""" +
        s""""runs_before":${s.runsBefore},"secs":${fmt(s.secs)},""" +
        s""""merges":${s.merges},"reclaimed_dirs":${s.reclaimedDirs},""" +
        s""""dead_files_before":${s.deadFilesBefore}}""")
    }
    val steady = stats.drop(1)
    // parts=1 leaves no steady-state batches — emit nulls instead of
    // NaN/throwing on the empty tail (ADVICE r11)
    def steadyStat(f: Seq[Double] => Double): String =
      if (steady.isEmpty) "null" else fmt(f(steady.map(_.secs).toSeq))
    val summary =
      s"""{"sf":"$sfDir","parts":$parts,"verdict_rows":$verdicts,""" +
        s""""total_secs":${fmt(stats.map(_.secs).sum)},""" +
        s""""batch0_secs":${fmt(stats.head.secs)},""" +
        s""""steady_mean_secs":${steadyStat(s => s.sum / s.length)},""" +
        s""""steady_min_secs":${steadyStat(_.min)},""" +
        s""""steady_max_secs":${steadyStat(_.max)},""" +
        s""""max_live_runs":${stats.map(_.runsBefore).max},""" +
        s""""total_merges":${stats.map(_.merges).sum},""" +
        s""""reclaimed_in_stream_dirs":${stats.map(_.reclaimedDirs).sum}}"""
    spark.stop()
    println(s"GRAFT_INTAKE_PROFILE:$summary")
  }
}
