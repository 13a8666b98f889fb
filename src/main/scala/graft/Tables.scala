package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Loaders + shared helpers for the driver-generated test corpus
  * (TESTDATA.md, FIXTURES.md). All query builders take `(spark, sfDir)`
  * and load via [[t]] so the same code runs at every scale factor.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts arrives in different parquet encodings depending on the
    * writer, so dispatch on the type Spark actually loaded:
    *  - driver corpus: TIMESTAMP(NANOS), which Spark 4 refuses to read
    *    as a timestamp. Read as raw nanos (legacy conf) and convert with
    *    integer division — the corpus' values are µs-aligned (verified:
    *    epoch_ns % 1000 == 0 for every row), and DuckDB likewise
    *    surfaces the column as a µs TIMESTAMP, so both engines see
    *    identical values. Integer `div` (not double /) because
    *    ns-since-epoch exceeds a double's 53-bit mantissa.
    *  - re-written corpora (e.g. DuckDB COPY for scale tests): plain µs
    *    TIMESTAMP_NTZ — cast to session-tz TIMESTAMP so every
    *    downstream window()/watermark sees one uniform type.
    *  - already-TIMESTAMP files pass through untouched. */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Exact-money arithmetic: the corpus' money columns are 2-decimal
    * doubles (verified in FIXTURES.md data), so casting to decimal is
    * lossless. Computing sums/products in decimal and casting the final
    * result to double makes Spark and the DuckDB oracle agree
    * bit-for-bit, which a raw double aggregation (order-dependent
    * rounding) would not. Same trick at 100 TB: decimal agg is exact,
    * deterministic, and still whole-stage-codegen'd.
    */
  def dec(c: Column): Column = c.cast("decimal(18,2)")
}
