package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool (r16 optimization round): run selected keys once and dump
  * every micro-batch's StreamingQueryProgress duration breakdown
  * (addBatch / getBatch / walCommit / commitOffsets / queryPlanning /
  * triggerExecution, plus stateOperators rows & commit times) so the
  * streaming keys' fixed costs are attributable — the §7.1 "where does
  * the stage time go" question for micro-batches. Not part of any
  * declared query. Run: `sbt "runMain graft.StreamProf [sfDir] key..."`. */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args.drop(1).toSeq else Seq("stream_join")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"))
      .config("spark.sql.files.openCostInBytes", "256k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[prof] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} " +
          s"stateOps=${p.stateOperators.map(s =>
            s"(rows=${s.numRowsTotal}, commitMs=${s.commitTimeMs})").mkString(",")}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    keys.foreach { k =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(k)(spark, sfDir).count()
        println(f"[prof] $k run$i rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
