package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver for the PLANTED-MARGIN arm of the LSH recall
  * measurement (VERDICT r14 #3): on a corpus staged by
  * `tools/stage_planted.py` (fixed-count anchor/partner pairs at
  * exact cosine margins {0.95, 0.8, 0.6}, ids disjoint from the
  * background), measures per (margin, bits, L) the fraction of
  * planted pairs that collide in at least one of the first L tables —
  * i.e. recall on neighbors whose margin is a DATA CONSTANT across
  * corpus sizes, isolating the index effect (bits ∝ log N) from the
  * i.i.d. background's shrinking true-NN margins that LshGridProbe's
  * recall@10 conflates with it. Each cell also prints the analytic
  * expectation 1 − (1 − p(c)^bits)^L with p(c) = 1 − acos(c)/π (the
  * sign-LSH collision rate), so the measured planted curve can be
  * checked against theory at every scale.
  *
  * Cost is O(pairs · L · bits) + one corpus count (for the derived
  * bit width) — independent of N: only the involved ids are hashed.
  * The planted-pair count must keep the staged corpus under the next
  * bits ∝ log N boundary (stage_planted's pairsPerMargin knob), or
  * the planted arm runs at different bits than the background arm.
  *
  * Usage: runMain graft.streaming.PlantedGridProbe <plantedDir> [L1,L2,...] [d1,d2,...]
  */
object PlantedGridProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse {
      System.err.println(
        "usage: PlantedGridProbe <plantedDir> [L1,L2,...] [d1,d2,...]")
      sys.exit(2)
    }
    def ints(s: String, what: String): Seq[Int] =
      try s.split(",").toSeq.map(_.trim.toInt)
      catch {
        case _: NumberFormatException =>
          System.err.println(
            s"usage: PlantedGridProbe <plantedDir> [L1,L2,...] [d1,d2,...] — $what '$s' is not a comma-separated int list")
          sys.exit(2)
      }
    val tableCounts = args.lift(1).map(ints(_, "tableCounts"))
      .getOrElse(Seq(8, 16, 32, 64, 96, 128))
    val bitDeltas = args.lift(2).map(ints(_, "bitDeltas")).getOrElse(Seq(0, 2))
    if (tableCounts.exists(_ < 1) || bitDeltas.exists(_ < 0)) {
      System.err.println(
        s"usage: PlantedGridProbe <plantedDir> [L1,L2,...] [d1,d2,...] — table counts must be >=1, deltas >=0")
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
    val maxL = tableCounts.max
    val bitsFull = graft.queries.LlmVector.lshBits(spark, dir)
    val bitLevels = bitDeltas.map(d => math.max(2, bitsFull - d)).distinct
    val pairs = spark.read.parquet(s"$dir/planted_pairs.parquet")
    val ids = pairs.select(col("anchor_id").as("vec_id"))
      .unionByName(pairs.select(col("partner_id").as("vec_id"))).distinct()
    val inv = spark.read.parquet(s"$dir/embeddings.parquet")
      .join(broadcast(ids), Seq("vec_id"))
    val rows = graft.queries.LlmVector.lshBucketRows(inv, bitsFull, maxL)
    val a = rows.select(col("vec_id").as("anchor_id"), col("tbl"),
      col("bucket").as("ab"))
    val b = rows.select(col("vec_id").as("partner_id"), col("tbl"),
      col("bucket").as("pb"))
    val aggs = bitLevels.map(bl =>
      min(when(substring(col("ab"), 1, bl) ===
        substring(col("pb"), 1, bl), col("tbl"))).as(s"mt_$bl"))
    val firstHit = pairs.join(a, Seq("anchor_id")).join(b, Seq("partner_id", "tbl"))
      .groupBy("anchor_id", "partner_id", "margin")
      .agg(aggs.head, aggs.tail: _*)
    val perLevel = bitLevels.map { bl =>
      firstHit.select(col("margin"), lit(bl.toLong).as("n_bits"),
        col(s"mt_$bl").as("min_tbl"))
    }.reduce(_ unionByName _)
    import spark.implicits._
    val lspine = tableCounts.toDF("n_tables")
    val cells = perLevel.crossJoin(broadcast(lspine))
      .groupBy("margin", "n_bits", "n_tables")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("min_tbl") < col("n_tables"), 1L).otherwise(0L))
          .as("n_collide"))
      .orderBy("margin", "n_bits", "n_tables")
      .collect() // grid-sized: |margins| x |bitDeltas| x |tableCounts| rows
    val secs = (System.nanoTime() - t0) / 1e9
    cells.foreach { r =>
      val (margin, nBits, l) = (r.getDouble(0), r.getLong(1), r.getInt(2))
      val (nPairs, nCollide) = (r.getLong(3), r.getLong(4))
      val p = 1.0 - math.acos(margin) / math.Pi
      val expected = 1.0 - math.pow(1.0 - math.pow(p, nBits.toDouble), l.toDouble)
      println(s"""GRAFT_PLANTED_CELL:{"margin":$margin,"n_bits":$nBits,""" +
        s""""n_tables":$l,"n_pairs":$nPairs,"n_collide":$nCollide,""" +
        s""""recall_bp":${nCollide * 10000 / nPairs},""" +
        s""""expected_bp":${math.round(expected * 10000)}}""")
    }
    spark.stop()
    println(f"""GRAFT_PLANTED_DONE:{"dir":"$dir","bits":$bitsFull,"secs":$secs%.1f}""")
  }
}
