package graft.streaming

import org.apache.spark.sql.SparkSession

/** Steady-state profile of the streaming IVF-index intake loop
  * (VERDICT r11 #5): the `stream_ann_index` key runs exactly two
  * micro-batches, so its bench row measures INTAKE over batches that
  * happen to be corpus halves, not the per-batch cost of a
  * long-running maintenance loop. This main runs the SAME intake
  * ([[StreamingQ.annIndexIntake]]) over N micro-batches (default 16)
  * and prints one JSON line per batch — wall seconds, arrivals, index
  * rows, live data-file count before the batch, and merges performed —
  * plus a timed partition-pruned probe over the final index, so three
  * claims become measured tables (BASELINE.md r12/r13): (1) per-batch
  * cost tracks batch size, not index size (level-0 runs never read
  * prior state); (2) the size-tiered compaction (VERDICT r12 #1, the
  * dedup chain's Bentley–Saxe layout) bounds LIVE file count by
  * runs · cells instead of batches · cells — max_live_files and
  * final_index_files in the summary are the evidence; (3) the probe
  * over the compacted chain stays partition-pruned and flat.
  *
  * Usage: runMain graft.streaming.AnnIndexIntakeProfile [sfDir] [parts]
  */
object AnnIndexIntakeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale8_r8")
    // validate up front (r12 ADVICE #4): parts <= 0 (or an unparsable
    // arg) would otherwise surface as stats.head throwing
    // NoSuchElementException only AFTER the full stream setup.
    val parts = args.lift(1).map { a =>
      val p = try a.toInt catch {
        case _: NumberFormatException =>
          System.err.println(
            s"usage: AnnIndexIntakeProfile [sfDir] [parts>=1] — parts '$a' is not an integer")
          sys.exit(2)
      }
      // same clean usage/exit path as the unparsable case (r13 ADVICE
      // #3) — a raw require stack trace is not a usage message
      if (p < 1) {
        System.err.println(
          s"usage: AnnIndexIntakeProfile [sfDir] [parts>=1] — got parts=$p")
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
    val srcDir = StreamingQ.stagedEmbParts(spark, sfDir, parts)
    val stats =
      scala.collection.mutable.ArrayBuffer.empty[StreamingQ.IntakeBatchStat]
    // batch 0 carries plan/codegen warm-up (the stream owns batch
    // order); the steady-state signal is batches 1..N-1 and the
    // summary reports both with and without batch 0.
    val res = StreamingQ.annIndexIntake(spark, sfDir, srcDir, Some(stats))
    val idx = res.liveDirs
    // a staging that yielded zero micro-batches (empty source dir) must
    // fail with a message, not a stats.head NoSuchElementException below
    if (stats.isEmpty) {
      System.err.println(
        s"AnnIndexIntakeProfile: no micro-batches arrived from $srcDir — " +
          "is the staged source empty?")
      spark.stop()
      sys.exit(2)
    }
    // probe: min of 3 timed runs (first pays codegen), identical
    // partition-pruned plan to llm_ann_ivf_persisted's read path
    val probeSecs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.queries.LlmVector.probeIvfIndex(spark, sfDir, idx).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    def fmt(v: Double): String = f"$v%.3f"
    stats.foreach { s =>
      println(s"""GRAFT_ANNIDX_BATCH:{"batch":${s.batchId},""" +
        s""""arrivals":${s.arrivals},"index_rows_before":${s.indexRowsBefore},""" +
        s""""index_files_before":${s.runsBefore},""" +
        s""""disk_files_before":${s.runsBefore + s.deadFilesBefore},""" +
        s""""secs":${fmt(s.secs)},"merges":${s.merges},""" +
        s""""reclaimed_dirs":${s.reclaimedDirs},""" +
        s""""reclaimed_files":${s.reclaimedFiles}}""")
    }
    val steady = stats.drop(1)
    // parts=1 leaves no steady-state batches — nulls, not NaN/throw
    def steadyStat(f: Seq[Double] => Double): String =
      if (steady.isEmpty) "null" else fmt(f(steady.map(_.secs).toSeq))
    val summary =
      s"""{"sf":"$sfDir","parts":$parts,""" +
        s""""total_secs":${fmt(stats.map(_.secs).sum)},""" +
        s""""batch0_secs":${fmt(stats.head.secs)},""" +
        s""""steady_mean_secs":${steadyStat(s => s.sum / s.length)},""" +
        s""""steady_min_secs":${steadyStat(_.min)},""" +
        s""""steady_max_secs":${steadyStat(_.max)},""" +
        s""""total_merges":${stats.map(_.merges).sum},""" +
        s""""max_live_files":${stats.map(_.runsBefore).max},""" +
        s""""max_disk_files":${stats.map(s => s.runsBefore + s.deadFilesBefore).max},""" +
        s""""reclaimed_run_dirs":${res.reclaimedDirs},""" +
        s""""reclaimed_in_stream_dirs":${res.reclaimedInStreamDirs},""" +
        s""""reclaimed_files":${res.reclaimedFiles},""" +
        s""""final_live_runs":${idx.length},""" +
        s""""final_index_files":${idx.map(countFiles).sum},""" +
        s""""probe_secs":${fmt(probeSecs)}}"""
    spark.stop()
    println(s"GRAFT_ANNIDX_PROFILE:$summary")
  }

  private def countFiles(dir: String): Int = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try s.filter((p: java.nio.file.Path) =>
      p.getFileName.toString.endsWith(".parquet")).count().toInt
    finally s.close()
  }
}
