package graft.etl

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-input material for the CSV→Parquet path: the corpus is
  * parquet-only and read-only (TESTDATA.md), so CSV fixtures are
  * exported from it into a temp dir once per (sfDir, table) per JVM.
  */
object Fixtures {
  private val csvCache = new ConcurrentHashMap[String, String]()

  /** Export a corpus table to CSV (header, canonical timestamp format)
    * and return the directory path. Cached per JVM run. */
  def csvOf(spark: SparkSession, sfDir: String, table: String): String =
    csvCache.computeIfAbsent(s"$sfDir/$table", { _ =>
      val dir = Files.createTempDirectory(s"graft_csv_$table").toString
      graft.Tables.t(spark, sfDir, table)
        .write.mode("overwrite")
        .option("header", true)
        .option("timestampFormat", Ingest.TsFormat)
        // the CSV writer trims edge whitespace by default — disable so
        // the fixture round-trips losslessly even for values with
        // leading/trailing spaces (readers set the matching flags)
        .option("ignoreLeadingWhiteSpace", false)
        .option("ignoreTrailingWhiteSpace", false)
        .csv(dir)
      dir
    })

  /** Fresh unique temp dir for sink tests. */
  def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val stagedCache = new ConcurrentHashMap[String, String]()

  /** Stage read-only scan-fixture material once per (sfDir, tag) per
    * JVM. Scan keys measure the READ; re-staging on every invocation
    * charges the benchmark the fixture-write cost instead of the scan
    * cost. Sink keys must NOT use this — the write is what they
    * measure. `build` populates the directory exactly once. */
  def stagedDir(sfDir: String, tag: String)(build: String => Unit): String = {
    // check-then-build-then-publish instead of computeIfAbsent: a
    // staged artifact whose builder stages ANOTHER artifact (e.g.
    // embed_cluster_labels → embed_pairs) re-enters this method, and
    // a nested computeIfAbsent on one ConcurrentHashMap throws
    // "Recursive update". The non-atomic form is safe here: keys are
    // built single-threaded per query, and a lost race merely orphans
    // one duplicate temp staging — the published dir stays unique.
    val key = s"$sfDir/$tag"
    val cached = stagedCache.get(key)
    if (cached != null) cached
    else {
      val dir = Files.createTempDirectory(s"graft_$tag").toString
      build(dir)
      val prev = stagedCache.putIfAbsent(key, dir)
      if (prev != null) prev else dir
    }
  }

  private val persistedCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]()

  /** Staged parquet + a memoized PERSISTED read of it: the pattern for
    * an expensive derived table consumed more than once per query.
    * Durability and cache-safety compose: the parquet fixture is built
    * once per (JVM, sfDir, tag), and the persisted DataFrame's lineage
    * is just the parquet scan — so storage-pressure eviction costs a
    * re-READ of a small file, never a re-RUN of the producing pipeline
    * (the r6 driver-bench outlier mechanism: a persisted corpus-derived
    * stage evicted under suite memory pressure rebuilt its whole
    * lineage each run). Keyed weakly by session object, same shape as
    * the signature cache in LlmText — a restarted session must not see
    * a DataFrame bound to a stopped SparkContext. */
  def stagedPersisted(spark: SparkSession, sfDir: String, tag: String)(
      build: String => Unit): DataFrame =
    persistedCache.synchronized {
      persistedCache.computeIfAbsent(spark,
          _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate(s"$sfDir/$tag", {
          val dir = stagedDir(sfDir, tag)(build)
          spark.read.parquet(dir).persist()
        })
    }

  /** Write `df` to a fresh parquet dir and read it back — the
    * "as the next consumer sees it" view of a sink. */
  def roundTrip(spark: SparkSession, df: DataFrame, prefix: String,
                partitionBy: Seq[String] = Nil): DataFrame = {
    val dir = tempDir(prefix)
    Ingest.writeParquet(df, dir, partitionColumns = partitionBy)
    spark.read.parquet(dir)
  }
}
