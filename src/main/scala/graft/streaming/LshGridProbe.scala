package graft.streaming

import org.apache.spark.sql.SparkSession

/** Dev driver for the (bits, L) LSH grid device at ARBITRARY
  * configurations — the measurement tool behind the operating-curve
  * keys (`llm_ann_lsh_tune_bits` / `llm_ann_lsh_tune_wide`, which pin
  * their own (tableCounts, bitDeltas) constants so the oracle can
  * replay them). Use this to probe table counts past the keys' grids
  * (e.g. where the derived−2 arm crosses 50%@10 on a larger corpus)
  * without growing the benched suite: one JSON line per grid cell.
  *
  * Usage: runMain graft.streaming.LshGridProbe [sfDir] [L1,L2,...] [d1,d2,...]
  */
object LshGridProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale8_r8")
    def ints(s: String, what: String): Seq[Int] =
      try s.split(",").toSeq.map(_.trim.toInt)
      catch {
        case _: NumberFormatException =>
          System.err.println(
            s"usage: LshGridProbe [sfDir] [L1,L2,...] [d1,d2,...] — $what '$s' is not a comma-separated int list")
          sys.exit(2)
      }
    val tableCounts = args.lift(1).map(ints(_, "tableCounts"))
      .getOrElse(Seq(8, 16, 32, 64))
    val bitDeltas = args.lift(2).map(ints(_, "bitDeltas")).getOrElse(Seq(0, 2))
    if (tableCounts.exists(_ < 1) || bitDeltas.exists(_ < 0)) {
      System.err.println(
        s"usage: LshGridProbe [sfDir] [L1,L2,...] [d1,d2,...] — table counts must be >=1, deltas >=0")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val rows = graft.queries.LlmVector
      .annLshGrid(spark, sfDir, tableCounts, bitDeltas)
      .collect() // grid-sized: |bitDeltas| x |tableCounts| rows
    val secs = (System.nanoTime() - t0) / 1e9
    rows.foreach { r =>
      println(s"""GRAFT_LSHGRID_CELL:{"n_bits":${r.getLong(0)},""" +
        s""""n_tables":${r.getLong(1)},"n_candidates":${r.getLong(2)},""" +
        s""""n_hits":${r.getLong(3)},"n_truth":${r.getLong(4)},""" +
        s""""recall_bp":${r.getLong(5)}}""")
    }
    spark.stop()
    println(f"""GRAFT_LSHGRID_DONE:{"sf":"$sfDir","secs":$secs%.1f}""")
  }
}
