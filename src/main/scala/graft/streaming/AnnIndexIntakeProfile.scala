package graft.streaming

/** Steady-state profile of the streaming IVF-index intake loop
  * (VERDICT r11 #5): the `stream_ann_index` key runs exactly two
  * micro-batches, so its bench row measures INTAKE over batches that
  * happen to be corpus halves, not the per-batch cost of a
  * long-running maintenance loop. This main runs the SAME intake
  * ([[StreamingQ.annIndexIntake]]) over N micro-batches (default 16)
  * via the shared [[IntakeProfileRunner]] and prints one JSON line per
  * batch — wall seconds, arrivals, index rows, live/dead data-file
  * counts before the batch, merges, and grace-TTL reclaims — plus a
  * timed partition-pruned probe over the final index, so four claims
  * become measured tables (BASELINE.md r12-r14): (1) per-batch cost
  * tracks batch size, not index size (level-0 runs never read prior
  * state); (2) the size-tiered compaction (VERDICT r12 #1) bounds LIVE
  * file count by runs · cells instead of batches · cells; (3) the
  * probe over the compacted chain stays partition-pruned and flat;
  * (4) the in-stream read-grace TTL (VERDICT r13 #2) bounds the disk
  * HIGH-WATER — live chain plus at most `graceBatches` of
  * not-yet-reclaimed runs — while the stream is still running.
  *
  * Usage: runMain graft.streaming.AnnIndexIntakeProfile [sfDir] [parts]
  */
object AnnIndexIntakeProfile {
  def main(args: Array[String]): Unit =
    IntakeProfileRunner.run("AnnIndexIntakeProfile", "ANNIDX", args,
      (spark, sfDir, srcDir, stats) =>
        StreamingQ.annIndexIntake(spark, sfDir, srcDir, Some(stats)),
      (spark, sfDir, res) =>
        graft.queries.LlmVector.probeIvfIndex(spark, sfDir, res.liveDirs)
          .count())
}
