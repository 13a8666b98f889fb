package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r16 optimization round): time named sub-plans of hot keys
  * through the noop sink (guide §1.4) so per-key wall decomposes into
  * attributable stages before anything is changed. Not part of any
  * declared query. Run: `sbt "runMain graft.Prof [sfDir] [group...]"`. */
object Prof {
  private var spark: SparkSession = _

  private def time(label: String)(df: => DataFrame): Unit = {
    // run twice, report both: run 1 carries codegen/plan, run 2 steady
    val walls = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[prof] $label%-40s ${walls.head}%6.2f s  ${walls(1)}%6.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val groups = if (args.length > 1) args.drop(1).toSet else Set("bootstrap")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "256k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.Tables.t

    if (groups("bootstrap")) {
      val purch = t(spark, sfDir, "events")
        .where(col("event_type") === "purchase")
        .selectExpr("event_id", "cast(round(value * 100) as bigint) AS x")
      time("bootstrap: scan+filter")(purch)
      time("bootstrap: +explode40")(
        purch.selectExpr("event_id", "x", "explode(sequence(0, 39)) AS b"))
      time("bootstrap: +md5 u")(
        purch.selectExpr("event_id", "x", "explode(sequence(0, 39)) AS b")
          .selectExpr("b", "x",
            """CAST(conv(substring(md5(concat(CAST(event_id AS STRING),
               '#boot#', CAST(b AS STRING))), 1, 6), 16, 10) AS BIGINT) AS u"""))
      time("bootstrap: full key")(
        SparkEntry.queries("agg_bootstrap_ci")(spark, sfDir))
    }

    if (groups("fuzzy")) {
      time("fuzzy: full key")(
        SparkEntry.queries("join_fuzzy_blocked")(spark, sfDir))
    }

    if (groups("theil")) {
      val hourly = t(spark, sfDir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("x"))
        .selectExpr("event_type",
          "CAST(unix_timestamp(bucket) DIV 3600 AS BIGINT) AS h", "x")
      time("theil: hourly agg")(hourly)
      val a = hourly.select(col("event_type"), col("h").as("ha"),
        col("x").as("xa"))
      val b = hourly.select(col("event_type"), col("h").as("hb"),
        col("x").as("xb"))
      val slopes = a.join(b, Seq("event_type"))
        .where(col("ha") < col("hb"))
        .selectExpr("event_type", "ha", "hb",
          "CAST(xb - xa AS DOUBLE) / CAST(hb - ha AS DOUBLE) AS slope")
      time("theil: +pairs+slope")(slopes)
      val nh = hourly.groupBy("event_type").agg(count(lit(1)).as("n_hours"))
        .withColumn("cnt", expr("n_hours * (n_hours - 1) DIV 2"))
      val ranked = slopes
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("event_type")
            .orderBy(col("slope"), col("ha"), col("hb"))))
      val noSort = ranked.join(broadcast(nh), Seq("event_type"))
        .where(expr("rk = (cnt + 1) DIV 2"))
        .selectExpr("event_type", "n_hours", "cnt AS n_pairs",
          "CAST(round(slope * 1000000.0) AS BIGINT) AS slope_e6_per_hour")
      time("theil: full minus orderBy")(noSort)
      time("theil: barrier+orderBy")(
        noSort.repartition(col("event_type")).orderBy("event_type"))
      time("theil: ranked window only")(ranked)
      time("theil: full key")(
        SparkEntry.queries("win_theil_sen")(spark, sfDir))
    }

    if (groups("wperc")) {
      val hist = t(spark, sfDir, "lineitem")
        .selectExpr("l_returnflag",
          "cast(round(l_extendedprice) as bigint) AS p_usd",
          "cast(l_quantity as bigint) AS w")
        .groupBy("l_returnflag", "p_usd").agg(sum(col("w")).as("w"))
      time("wperc: histogram")(hist)
      time("wperc: full key")(
        SparkEntry.queries("agg_weighted_percentile")(spark, sfDir))
      time("equidepth: full key")(
        SparkEntry.queries("agg_equidepth_hist")(spark, sfDir))
    }

    if (groups("simhashpairs")) {
      time("simhash_pairs: full key")(
        SparkEntry.queries("llm_dedup_simhash_pairs")(spark, sfDir))
      time("setsim: full key")(
        SparkEntry.queries("llm_setsim_join")(spark, sfDir))
    }

    if (groups("mmr")) {
      time("mmr: full key")(
        SparkEntry.queries("llm_mmr_diversify")(spark, sfDir))
      time("bpe_apply: full key")(
        SparkEntry.queries("llm_bpe_apply")(spark, sfDir))
      time("tokenizer_fertility: full key")(
        SparkEntry.queries("llm_tokenizer_fertility")(spark, sfDir))
      time("embedding_pca: full key")(
        SparkEntry.queries("llm_embedding_pca")(spark, sfDir))
    }

    spark.stop()
  }
}
