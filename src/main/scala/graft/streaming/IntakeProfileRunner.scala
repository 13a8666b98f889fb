package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared body of the streaming-index intake profilers
  * ([[AnnIndexIntakeProfile]] / [[LshIndexIntakeProfile]]): stage the
  * embeddings as `parts` single-file micro-batches, run the given
  * intake loop with per-batch stats, time a min-of-3 probe over the
  * final chain, and print one JSON line per batch plus a summary —
  * so every chained index's flat-batch / bounded-file / reclamation
  * claims are measured by the same instrument instead of inherited
  * from a sibling (VERDICT r13 #3). */
private[streaming] object IntakeProfileRunner {
  def run(toolName: String, marker: String, args: Array[String],
      intake: (SparkSession, String, String,
        scala.collection.mutable.ArrayBuffer[StreamingQ.IntakeBatchStat])
        => StreamingQ.IntakeResult,
      probe: (SparkSession, String, StreamingQ.IntakeResult) => Long): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale8_r8")
    // validate up front: parts <= 0 (or an unparsable arg) would
    // otherwise surface as stats.head throwing only AFTER the full
    // stream setup; both bad shapes share the clean usage/exit path
    val parts = args.lift(1).map { a =>
      val p = try a.toInt catch {
        case _: NumberFormatException =>
          System.err.println(
            s"usage: $toolName [sfDir] [parts>=1] — parts '$a' is not an integer")
          sys.exit(2)
      }
      if (p < 1) {
        System.err.println(
          s"usage: $toolName [sfDir] [parts>=1] — got parts=$p")
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
    val res = intake(spark, sfDir, srcDir, stats)
    val idx = res.liveDirs
    // a staging that yielded zero micro-batches (empty source dir) must
    // fail with a message, not a stats.head NoSuchElementException below
    if (stats.isEmpty) {
      System.err.println(
        s"$toolName: no micro-batches arrived from $srcDir — " +
          "is the staged source empty?")
      spark.stop()
      sys.exit(2)
    }
    // probe: min of 3 timed runs (first pays codegen), identical plan
    // to the persisted-index read path of the corresponding batch key
    val probeSecs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      probe(spark, sfDir, res)
      (System.nanoTime() - t0) / 1e9
    }.min
    def fmt(v: Double): String = f"$v%.3f"
    stats.foreach { s =>
      println(s"""GRAFT_${marker}_BATCH:{"batch":${s.batchId},""" +
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
    println(s"GRAFT_${marker}_PROFILE:$summary")
  }

  private def countFiles(dir: String): Int = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try s.filter((p: java.nio.file.Path) =>
      p.getFileName.toString.endsWith(".parquet")).count().toInt
    finally s.close()
  }
}

/** Steady-state profile of the streaming LSH-index intake loop
  * (VERDICT r13 #3): `stream_lsh_index` runs the same `tieredIntake`
  * chain as the IVF twin, but until this main its flat-batch claim was
  * inherited from the shared loop + the 3-SF walls rather than
  * measured per batch. Runs the LSH intake (bucket rows hashed
  * map-side at index-build bits, level-0 runs partitioned by hash
  * table, 4-at-a-level merges, grace-TTL reclamation) over N
  * micro-batches and prints the per-batch table — wall, arrivals,
  * live/dead file counts, merges, reclaims — plus a timed ids-only
  * probe over the final chain (the `annLshFromIndex` read path).
  *
  * Usage: runMain graft.streaming.LshIndexIntakeProfile [sfDir] [parts]
  */
object LshIndexIntakeProfile {
  def main(args: Array[String]): Unit =
    IntakeProfileRunner.run("LshIndexIntakeProfile", "LSHIDX", args,
      (spark, sfDir, srcDir, stats) => {
        val nBits = graft.queries.LlmVector.lshBits(spark, sfDir)
        StreamingQ.tieredIntake(spark, sfDir, srcDir,
          "graft_stream_lsh_idx_", "tbl",
          b => graft.queries.LlmVector.lshBucketRows(b, nBits), Some(stats))
      },
      (spark, sfDir, res) =>
        graft.queries.LlmVector.annLshFromIndex(spark, sfDir, res.liveDirs)
          .count())
}

/** Steady-state profile of the streaming semantic-dedup intake
  * (`stream_semdedup`): the same LSH chain as [[LshIndexIntakeProfile]]
  * plus the per-batch verdict pass (arrivals' candidates against the
  * pre-batch chain, exact-cosine re-rank, verdict write) INSIDE the
  * timed window — so "verdict cost tracks batch size, not index size"
  * is measured per batch rather than inferred from the 2-batch key.
  * The probe reads the committed verdict union (the key's own
  * derivation shape).
  *
  * Usage: runMain graft.streaming.SemDedupIntakeProfile [sfDir] [parts]
  */
object SemDedupIntakeProfile {
  def main(args: Array[String]): Unit =
    IntakeProfileRunner.run("SemDedupIntakeProfile", "SEMDEDUP", args,
      (spark, sfDir, srcDir, stats) => {
        val nBits = graft.queries.LlmVector.lshBits(spark, sfDir)
        StreamingQ.tieredIntake(spark, sfDir, srcDir,
          "graft_stream_semded_", "tbl",
          b => graft.queries.LlmVector.lshBucketRows(b, nBits), Some(stats),
          verdictOf = Some((batch, preDirs, vdir) =>
            graft.queries.LlmVector
              .semDedupVerdicts(spark, sfDir, batch, preDirs, nBits)
              .write.mode("overwrite").parquet(vdir)))
      },
      (spark, _, res) => spark.read.parquet(res.verdictDirs: _*).count())
}
