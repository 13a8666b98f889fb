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
      // candidate-volume A/B for the r17 depth-asymmetric SymDelete:
      // distinct (d_key, c_custkey) candidate pairs under depth-2/2
      // (r16) vs depth-1/2-minus-identity (r17) enumeration.
      val c = t(spark, sfDir, "customer")
      def vAll(s: String, len: Int) =
        s"""array_distinct(concat(array($s),
              transform(sequence(1, $len),
                i -> concat(substring($s, 1, i - 1), substring($s, i + 1))),
              flatten(transform(sequence(1, ${len - 1}),
                i -> transform(sequence(i + 1, $len),
                  j -> concat(substring($s, 1, i - 1),
                              substring($s, i + 1, j - i - 1),
                              substring($s, j + 1)))))))"""
      def v1(s: String, len: Int) =
        s"""array_distinct(concat(array($s),
              transform(sequence(1, $len),
                i -> concat(substring($s, 1, i - 1), substring($s, i + 1)))))"""
      val dirty = c.selectExpr("c_custkey AS d_key", "c_nationkey AS d_nat",
        "c_mktsegment AS d_seg",
        """substring(concat(substring(c_name, 1, CAST(9 + c_custkey % 9 AS INT)),
                  substring(c_name, CAST(11 + c_custkey % 9 AS INT))), 10)
           AS dsuf""")
      val clean = c.selectExpr("c_custkey", "c_nationkey", "c_mktsegment",
        "substring(c_name, 10, 9) AS csuf")
      def cands(dv: String, cv: String): Long =
        dirty.selectExpr("d_key", "d_nat", "d_seg", s"explode($dv) AS variant")
          .as("dv").join(
            clean.selectExpr("c_custkey", "c_nationkey", "c_mktsegment",
              s"explode($cv) AS variant").as("cv"),
            col("dv.variant") === col("cv.variant") &&
              col("dv.d_nat") === col("cv.c_nationkey") &&
              col("dv.d_seg") === col("cv.c_mktsegment"))
          .select("d_key", "c_custkey").distinct().count()
      println(s"[prof] fuzzy: cand pairs depth-2/2   = " +
        cands(vAll("dsuf", 8), vAll("csuf", 9)))
      println(s"[prof] fuzzy: cand pairs depth-1/2-id = " +
        cands(v1("dsuf", 8),
          vAll("csuf", 9).replaceFirst("array\\(csuf\\),\\s*", "")))
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

    if (groups("setsim")) {
      // candidate-volume decomposition of the PPJoin (r17 positional
      // filter): distinct pair count with length filter only vs with
      // the positional ubound, plus full-key walls.
      val docs = t(spark, sfDir, "documents")
      val shs = docs
        .selectExpr("doc_id", "text", "split(text, ' ') AS tk")
        .selectExpr("doc_id",
          """CASE WHEN size(tk) >= 3 THEN
               array_distinct(transform(sequence(1, size(tk) - 2),
                 i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1),
                      element_at(tk, i + 2))))
             ELSE array(text) END AS sh""")
      val tok = shs.selectExpr("doc_id", "explode(sh) AS s")
      val dfT = tok.groupBy("s").agg(count(lit(1)).as("df"))
      val sorted = tok.join(dfT, Seq("s")).groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("df"), col("s"))))
          .as("ordered"))
        .selectExpr("doc_id", "transform(ordered, x -> x.s) AS els",
          "size(ordered) AS sz")
        .selectExpr("doc_id", "els", "sz",
          "slice(els, 1, sz - CAST(ceil(0.5 * sz) AS INT) + 1) AS prefix")
        .persist()
      val pre = sorted.select(col("doc_id"), col("sz"),
        posexplode(col("prefix")).as(Seq("p", "s")))
      val lenOnly = pre.as("a")
        .join(pre.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .where(lit(2) * least(col("a.sz"), col("b.sz")) >=
          greatest(col("a.sz"), col("b.sz")))
      val posFiltered = lenOnly
        .where(lit(3) * (lit(1) + least(col("a.sz") - col("a.p") - lit(1),
          col("b.sz") - col("b.p") - lit(1))) >= col("a.sz") + col("b.sz"))
      println(s"[prof] setsim: prefix-match rows (len filter) = " +
        lenOnly.count())
      println(s"[prof] setsim: candidates len-only   = " +
        lenOnly.select(col("a.doc_id"), col("b.doc_id")).distinct().count())
      println(s"[prof] setsim: prefix-match rows (pos filter) = " +
        posFiltered.count())
      println(s"[prof] setsim: candidates positional = " +
        posFiltered.select(col("a.doc_id"), col("b.doc_id")).distinct().count())
      // Verify-stage A/B over the two candidate sets (same JVM): two
      // els re-attach joins + IntersectSize + threshold, noop-sunk.
      def verifyOver(c: DataFrame): DataFrame = c
        .join(sorted.select(col("doc_id").as("doc_a"), col("els").as("t_a"),
          col("sz").as("sz_a")), Seq("doc_a"))
        .join(sorted.select(col("doc_id").as("doc_b"), col("els").as("t_b"),
          col("sz").as("sz_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"),
          graft.functions.TextOps.intersectSize(col("t_a"), col("t_b"))
            .as("inter"))
        .where(expr("3 * inter >= sz_a + sz_b"))
        .selectExpr("doc_a", "doc_b",
          "inter / (sz_a + sz_b - inter) AS jaccard")
      val candLen = lenOnly.select(col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b")).distinct()
      val candPos = posFiltered.select(col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b")).distinct()
      time("setsim: cand+verify len-only")(verifyOver(candLen))
      time("setsim: cand+verify positional")(verifyOver(candPos))
      sorted.unpersist()
      time("setsim: full key")(
        SparkEntry.queries("llm_setsim_join")(spark, sfDir))
    }

    if (groups("hitsdecomp")) {
      // VERDICT r16 #6: decompose the graph family — shared kNN edge
      // derivation vs per-round iteration cost (checkpoint jobs + edge
      // joins) — so "scheduler floor vs join cost" is measured, not
      // asserted. llm_knn_graph IS the edge derivation every graph key
      // shares, so (full key − knn_graph) ≈ the iteration walls.
      time("knn_graph (edge derivation)")(
        SparkEntry.queries("llm_knn_graph")(spark, sfDir))
      time("hits: full key")(
        SparkEntry.queries("llm_graph_hits")(spark, sfDir))
      time("kcore: full key")(
        SparkEntry.queries("llm_graph_kcore")(spark, sfDir))
      time("linkpred: full key")(
        SparkEntry.queries("llm_graph_linkpred")(spark, sfDir))
      time("pagerank: full key")(
        SparkEntry.queries("llm_pagerank")(spark, sfDir))
      time("label_prop: full key")(
        SparkEntry.queries("llm_label_propagation")(spark, sfDir))
    }

    if (groups("spatial")) {
      // candidate-volume decomposition of the grid radius join: how
      // many (probe, build) rows share a cell, how many survive a<b,
      // and the full-key wall — drives the half-plane neighborhood A/B.
      val key = SparkEntry.queries("join_spatial_grid")
      time("spatial: full key")(key(spark, sfDir))
      import graft.Tables.t
      val pts = t(spark, sfDir, "customer").count()
      println(s"[prof] spatial: n customers = $pts")
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
