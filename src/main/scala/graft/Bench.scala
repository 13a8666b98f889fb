package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/JIT/file-listing paths so the first measured query
    // isn't charged session startup; run keys in sorted order so timings
    // are attributable run-to-run.
    (1 to 2).foreach { _ =>
      spark.read.parquet(s"$sfDir/region.parquet").count()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    }
    // Min of N runs (default 2): the first execution pays plan +
    // codegen compilation; the min reflects steady-state throughput,
    // which is what the 100 TB comparison cares about.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0 // a broken query must be visible, not a fake fast time
        }
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed keys report -1 individually but must not deflate the total
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver parses the LAST stdout line; sbt log noise buried it in
    // round 1 ("parsed": null). Belt-and-braces: also write the JSON to
    // bench.json in cwd, stop Spark BEFORE printing (its shutdown logs
    // otherwise land after the JSON), then emit the JSON as the final
    // line.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench.json"), json + "\n")
    catch { case e: java.io.IOException =>
      // the file is only the fallback — never let it kill the primary
      // stdout signal (read-only or full cwd)
      System.err.println(s"[bench] could not write bench.json: ${e.getMessage}")
    }
    spark.stop()
    System.out.flush()
    println(json)
    System.out.flush()
  }
}
