package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** SURVEY.md §2-K — vector side of the LLM-pipeline extensions:
  * pairwise cosine, brute-force top-k similarity (the exact baseline),
  * all-pairs near-duplicate detection, LSH-bucketed approximate NN (the
  * scale path), per-label vector means (both as a declarative plan and
  * as a custom typed Aggregator), and multimodal binary-column
  * plumbing.
  *
  * Numeric determinism: every dot product is a *sequential left fold*
  * in double precision (`aggregate(zip_with(...))`), which fixes the
  * floating-point summation order — the same fold in DuckDB
  * (`list_reduce`) produces bit-identical doubles, so cosine scores are
  * oracle-comparable with no tolerance. A parallel SUM over exploded
  * rows would NOT be (shuffle order changes rounding); per-element
  * decimal aggregation is used instead where rows must be summed
  * (vector mean).
  *
  * Scale notes (100 TB): top-k against a query vector is a map-side
  * score + TakeOrderedAndProject (no shuffle of the corpus); near-dup
  * all-pairs is the *exact baseline* kept for verification, while
  * `llm_ann_lsh` is the production path — deterministic
  * rotated-hyperplane buckets (exactly orthogonal integer planes from
  * the H·D2·H·D1 composition, r12) turn O(n²) into an equi-join on
  * bucket keys. Plane weights derive from md5-parity diagonals +
  * Hadamard popcount arithmetic, so buckets are reproducible across
  * engines and runs.
  */
object LlmVector {

  import graft.functions.VectorOps.{cosine, dot, l2norm}

  /** embeddings with a precomputed L2 norm (scanned once per use).
    * All dot products go through the codegen'd [[graft.functions.DotProduct]]
    * expression — identical left-fold semantics to the
    * `aggregate(zip_with(...))` formulation (and to the DuckDB
    * `list_reduce` oracle), ~50× faster on pair joins. */
  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))

  // ---------------------------------------------------------------------
  // llm_cosine_pair — cosine between consecutive vectors (vec_id,
  // vec_id+1): the minimal pairwise-similarity plan.
  // ---------------------------------------------------------------------
  private def cosinePair(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.join(b, col("vec_b") === col("vec_a") + 1)
      .select(col("vec_a"), col("vec_b"),
        cosine(col("ea"), col("eb"), col("na"), col("nb")).as("cosine"))
      .orderBy("vec_a")
  }

  // ---------------------------------------------------------------------
  // llm_topk_similarity — exact top-20 neighbors of the query vector
  // (vec_id = 0): broadcast the 1-row query side, score every corpus
  // vector map-side, TakeOrderedAndProject keeps only k rows per
  // partition — the corpus itself never shuffles.
  // ---------------------------------------------------------------------
  private def topkSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        cosine(col("embedding"), col("qe"), col("nrm"), col("qn")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(20)
  }

  // ---------------------------------------------------------------------
  // llm_embed_neardup — exact all-pairs cosine ≥ 0.4. This is the
  // verification baseline: correct by construction, O(n²) by
  // construction. At 100 TB the same semantics run through llm_ann_lsh
  // (bucketed candidates) — keep this one for recall measurement.
  // ---------------------------------------------------------------------
  private def embedNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosine(col("ea"), col("eb"), col("na"), col("nb")).as("cosine"))
      .where(col("cosine") >= 0.4)
      .orderBy("vec_a", "vec_b")
  }

  // ---------------------------------------------------------------------
  // llm_ann_lsh — approximate NN via ROTATED-hyperplane LSH: 4 hash
  // tables × `bits` sign bits. The hyperplanes of table t are rows of
  // the structured rotation M_t = H·D2_t·H·D1_t (H = 64×64
  // Walsh–Hadamard, D = md5-parity ±1 diagonals) — the classic
  // HD-composition decorrelation (Ailon–Chazelle FJLT / FALCONN-style
  // rotation LSH). M_t·M_tᵀ = 64²·I exactly, so within a table the
  // sign bits are projections onto ORTHOGONAL directions; the previous
  // independent md5-±1 planes carried mutual correlation that
  // concentrated bucket mass at ×64 (SCALE.md r11: max occupancy 199
  // vs design 8, max bit-pair correlation 0.225 — rotated planes
  // measure 0.05 with max occupancy ~3× the mean). M_t's entries are
  // even integers in [−64, 64] computed with EXACT integer arithmetic,
  // so the oracle recomputes the identical matrix in SQL (md5-parity
  // diagonals + the popcount identity H[p,k] = (−1)^popcount(p AND k))
  // and buckets stay engine-portable. Candidates come from an
  // equi-join on (table, bucket) — the O(n²) cross product never
  // materializes — then get re-ranked by exact cosine; top-50 returned.
  // ---------------------------------------------------------------------
  /** ±1 md5-parity rotation diagonal for table `t`: layer "a" is
    * applied at the input dimensions, layer "b" between the two
    * Hadamard passes. Tags ("r<t>_a_<d>" / "r<t>_b_<k>") are shared
    * verbatim with the oracle's SQL md5 replay. */
  private def rotDiag(t: Int, layer: String): Array[Int] =
    Array.tabulate(64)(d =>
      OracleFmt.mdParitySign(s"r${t}_${layer}_$d").toInt)

  /** (−1)^popcount(a AND b) — the 64×64 Walsh–Hadamard entry. */
  private def hadSign(a: Int, b: Int): Int =
    if (java.lang.Integer.bitCount(a & b) % 2 == 0) 1 else -1

  /** Row `p` of M_t = H·D2_t·H·D1_t: exact integer entries, computed
    * once on the driver (a 64×64 integer loop per row) and shipped as
    * array literals inside the serialized plan — a few KB, exactly
    * like the ±1 planes they replace. One Hadamard pass yields at most
    * 64 orthogonal rows, so bits ≤ 64 per table; past that the dial is
    * more TABLES (OR-amplification, measured by llm_ann_lsh_tune),
    * never more bits — occupancy is at its design point long before. */
  private[graft] def rotPlane(t: Int, p: Int): Seq[Double] = {
    val d1 = rotDiag(t, "a")
    val d2 = rotDiag(t, "b")
    Seq.tabulate(64) { d =>
      var s = 0
      var k = 0
      while (k < 64) { s += hadSign(p, k) * d2(k) * hadSign(k, d); k += 1 }
      (s * d1(d)).toDouble
    }
  }

  // bits ∝ log₂ N (VERDICT r10 #1, the LSH face of the k ∝ N rule):
  // sign-hash buckets halve in expected occupancy per added
  // bit, so holding occupancy at ~8/table means
  // bits = max(8, bitlength(n / 8)) — a PURE-INTEGER rule (length of
  // the binary representation) both engines compute exactly, with no
  // float log to disagree at power-of-two boundaries. The three test
  // SFs floor at 8 bits (results identical to the fixed-bits era);
  // ×8 derives 11 bits, ×64 14 bits, keeping the bucket join
  // O(N · occupancy) instead of N²/2^bits. Production pins bits at
  // index build from expected corpus size exactly this way (more
  // tables, not more bits, is the recall dial).
  private val LshBitsFloor = 8
  private val LshTargetOcc = 8
  private[graft] def lshBits(spark: SparkSession, sfDir: String): Int = {
    val n = math.max(1L,
      t(spark, sfDir, "embeddings").count() / LshTargetOcc)
    // cap at 64: one rotation yields 64 orthogonal rows; past that the
    // recall/occupancy dial is more tables (llm_ann_lsh_tune), not bits
    math.min(64, math.max(LshBitsFloor,
      java.lang.Long.toBinaryString(n).length))
  }

  /** Literal-plane reference formulation of one table's bucket string —
    * kept as the spec oracle for [[graft.functions.SignBuckets]]
    * (Round16Spec pins the fused kernel == this, cell-for-cell). */
  private[graft] def bucketCol(table: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { p =>
      val plane = typedLit(rotPlane(table, p))
      when(dot(col("embedding"), plane) >= 0, "1").otherwise("0")
    }
    concat(bits: _*).as(s"bucket_$table")
  }

  /** Memoized tables×bits×64 rotated-plane tensor for the fused
    * [[graft.functions.SignBuckets]] kernel — pure integer-derived
    * plane math (no data dependence), computed once per (L, bits)
    * per JVM instead of 64×64-looped per invocation. */
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int), Array[Array[Array[Double]]]]()
  private[graft] def planeTensor(nTables: Int,
      nBits: Int): Array[Array[Array[Double]]] =
    planeCache.computeIfAbsent((nTables, nBits),
      { case (nt, nb) =>
        Array.tabulate(nt, nb)((t, p) => rotPlane(t, p).toArray)
      })

  /** LSH candidate pairs with their exact cosine, shared by the two
    * keys below. Bucket table carries ONLY (vec_id, tbl, bucket): the
    * candidate join + dedup shuffle two longs and a short string per
    * row, never the 64-float payload. Embeddings re-attach by id
    * afterward — same shape as LlmText.candidates; at 100 TB the
    * dedup exchange is ids-only instead of O(candidates × embedding
    * bytes). */
  /** The (vec_id, tbl, bucket) long table for `nTables` rotated-plane
    * hash tables at the derived bit count — shared by the production
    * candidate pipeline, the tune sweep, and CellOccupancySpec's
    * bucket-occupancy pin.
    *
    * Shape note (r12, measured): one UNION branch per table — a plain
    * Project per branch — NOT `posexplode(array(bucketCol*))`. The
    * explode form routes the sign-bit expressions through
    * GenerateExec's interpreted input-evaluation path, and the
    * interpreted DotProduct over literal planes measured ~4 µs/dot vs
    * ~0.4 µs inside whole-stage codegen: 33 s vs 0.6 s for the ×64
    * bucket build (the dominant term of the r11 ann_lsh wall, hiding
    * under the occupancy skew). A projection barrier does NOT help —
    * CollapseProject folds it back into the Generate input — so the
    * union IS the fix: each branch re-scans the (cheap, pruned)
    * embedding column but every dot stays codegen'd. */
  private[graft] def lshBucketLong(spark: SparkSession, sfDir: String,
                                   nTables: Int = 4): DataFrame =
    lshBucketRows(t(spark, sfDir, "embeddings"),
      lshBits(spark, sfDir), nTables)

  /** Bucket rows for an ARBITRARY embeddings frame at a pinned bit
    * width — shared by the batch long table above and the streaming
    * intake (`stream_lsh_index`, which hashes each arriving micro-batch
    * map-side at the bits the index was built with).
    *
    * Shape note (r16, supersedes the r12 one-union-branch-per-table
    * form): ONE scan + `posexplode` of the fused
    * [[graft.functions.SignBuckets]] tensor kernel. The r12 union
    * existed because `posexplode(array(bucketCol*))` routed the
    * per-bit expression TREE through GenerateExec's interpreted path
    * (~4 µs/dot); the fused kernel is a single expression whose eval
    * IS the tight primitive loop, so it is generator-input-safe — and
    * it removes the L corpus re-scans and the L·bits 64-double plan
    * literals the union paid (measured r16, isolated A/B at sf0.1:
    * llm_ann_lsh_tune_xl 4.36 → 0.88 s, tune_wide 2.30 → 0.97 s,
    * planted 3.41 → 1.13 s; every bucket string bit-identical,
    * Round16Spec-pinned). posexplode's pos IS the table index — same
    * (vec_id, tbl, bucket) rows as the union.
    *
    * Null-embedding behavior (ADVICE r16, intentional): SignBuckets is
    * null-in/null-out and posexplode skips a null array, so a row with
    * a NULL embedding produces NO bucket rows — it can never be an ANN
    * candidate. (The pre-r16 union form bucketed such rows as the
    * all-zero string via when(...).otherwise("0"), silently colliding
    * them into one hot bucket.) The testdata embeddings column is
    * non-null end to end, so no declared result depends on the
    * difference; a production intake wanting nulls surfaced should
    * filter/flag them upstream of the index build. Same applies at the
    * hardNegatives partner-side union. */
  private[graft] def lshBucketRows(batch: DataFrame, nBits: Int,
                                   nTables: Int = 4): DataFrame =
    batch.select(col("vec_id"),
      posexplode(graft.functions.VectorOps.signBuckets(col("embedding"),
        planeTensor(nTables, nBits))).as(Seq("tbl", "bucket")))

  /** Per-batch semantic-dedup verdicts against a CHAINED LSH index
    * (the `stream_semdedup` intake hook): arrivals hash their bucket
    * rows map-side, candidates come from the (tbl, bucket) equi-join
    * against the PRE-batch chain only (ids-only — embeddings re-attach
    * by id for candidates that need scoring), and an arrival is a dup
    * iff some already-indexed vector scores cosine ≥ 0.4 (dup_of = the
    * smallest such id, the deterministic earliest-wins rule). The
    * first batch sees an empty chain — all kept — so the verdict set
    * is exactly the batch twin's even→odd half-split semantics. */
  private[graft] def semDedupVerdicts(spark: SparkSession, sfDir: String,
      batch: DataFrame, priorDirs: Seq[String], nBits: Int): DataFrame = {
    val ids = batch.select(col("vec_id"))
    if (priorDirs.isEmpty)
      ids.select(col("vec_id"), lit(true).as("is_kept"),
        lit(null).cast("bigint").as("dup_of"))
    else {
      val rows = lshBucketRows(batch, nBits)
        .select(col("vec_id"), col("tbl"), col("bucket"))
      val prior = readRuns(spark, priorDirs)
        .select(col("vec_id").as("ex_id"), col("tbl"), col("bucket"))
      val cand = rows.join(prior, Seq("tbl", "bucket"))
        // a re-delivered id that already exists in the prior chain
        // must not self-match at cosine 1.0 (r14 ADVICE: the even/odd
        // and profiler stagings keep batches disjoint, but the
        // invariant belongs here, not in the staging)
        .where(col("vec_id") =!= col("ex_id"))
        .select(col("vec_id"), col("ex_id")).distinct()
      val e = emb(spark, sfDir)
      val scored = cand
        .join(e.select(col("vec_id"), col("embedding").as("eb"),
          col("nrm").as("nb")), Seq("vec_id"))
        .join(e.select(col("vec_id").as("ex_id"), col("embedding").as("ea"),
          col("nrm").as("na")), Seq("ex_id"))
        .where(cosine(col("ea"), col("eb"), col("na"), col("nb")) >= 0.4)
        .groupBy("vec_id").agg(min(col("ex_id")).as("dup_of"))
      ids.join(scored, Seq("vec_id"), "left_outer")
        .select(col("vec_id"), col("dup_of").isNull.as("is_kept"),
          col("dup_of"))
    }
  }

  /** Top-50 LSH derivation over a CHAINED on-disk bucket index (the
    * streamed index's probe): identical candidate/re-rank semantics to
    * `llm_ann_lsh` by construction — run layout cannot change bucket
    * contents. */
  private[graft] def annLshFromIndex(spark: SparkSession, sfDir: String,
      dirs: Seq[String]): DataFrame =
    lshScoredCandidatesOf(spark, sfDir,
      readRuns(spark, dirs).select("vec_id", "tbl", "bucket"))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(50)

  private def lshScoredCandidates(spark: SparkSession, sfDir: String): DataFrame =
    lshScoredCandidatesOf(spark, sfDir, lshBucketLong(spark, sfDir))

  /** Candidate generation + exact re-rank over ANY (vec_id, tbl,
    * bucket) long table — the in-plan key derives it per query, the
    * persisted key reads it from the staged index; one body so the two
    * cannot drift. */
  private def lshScoredCandidatesOf(spark: SparkSession, sfDir: String,
      long: DataFrame): DataFrame = {
    val e = emb(spark, sfDir)
    val a = long.select(col("vec_id").as("vec_a"), col("tbl"), col("bucket"))
    val b = long.select(col("vec_id").as("vec_b"), col("tbl"), col("bucket"))
    val cand = a.join(b, Seq("tbl", "bucket"))
      .where(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
    val ea = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    cand.join(ea, "vec_a").join(eb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        cosine(col("ea"), col("eb"), col("na"), col("nb")).as("cosine"))
  }

  private def annLsh(spark: SparkSession, sfDir: String): DataFrame =
    lshScoredCandidates(spark, sfDir)
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(50)

  // ---------------------------------------------------------------------
  // llm_ann_lsh_persisted — the LSH bucket index AS A LAKE TABLE
  // (VERDICT r12 #2): lshBucketLong's (vec_id, tbl, bucket) rows are
  // WRITTEN once and probed forever — the build-once/probe-many
  // production path, the hyperplane twin of llm_ann_ivf_persisted. The
  // in-plan key re-derives all 4 tables of buckets per derivation (4
  // union branches = 4 pruned embeddings scans + 4·bits dot products
  // per vector — the cost that showed up as the r12 sf0.1 LSH
  // regression); at 100 TB nobody re-hashes the corpus per query: the
  // index builds once (the staged write, exactly where a production
  // pipeline pays it) and every probe's candidate join reads the
  // ids-only index — two longs + a short string per row, embeddings
  // re-attach by id only for candidates that need scoring. Shares
  // llm_ann_lsh's oracle verbatim: identical bucket semantics,
  // identical top-50 — staging cannot drift the results.
  // ---------------------------------------------------------------------
  private def lshIndexDF(spark: SparkSession, sfDir: String): DataFrame =
    graft.etl.Fixtures.stagedPersisted(spark, sfDir, "lsh_index") { d =>
      // cluster by hash table and lay rows out bucket-contiguous: the
      // probe's (tbl, bucket) self-join reads runs, not scattered rows
      lshBucketLong(spark, sfDir)
        .repartition(col("tbl"))
        .sortWithinPartitions("tbl", "bucket")
        .write.mode("overwrite").parquet(d)
    }

  private def annLshPersisted(spark: SparkSession, sfDir: String): DataFrame =
    lshScoredCandidatesOf(spark, sfDir, lshIndexDF(spark, sfDir))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(50)

  // ---------------------------------------------------------------------
  // llm_ann_lsh_tune — the multi-table OR-amplification operating
  // curve (the recall dial, measured): recall@10 and candidate volume
  // as a function of the number of hash tables L ∈ {1, 2, 4, 8}. A
  // pair that collides in ANY of L tables is a candidate
  // (P(candidate) = 1 − (1 − p^bits)^L), so more tables buy recall at
  // linear candidate cost while more bits would buy precision — this
  // key is the published curve a deployment picks its L from, the
  // vector-side twin of llm_minhash_lsh_tune's (bands, rows) sweep.
  // ONE bucket join serves every L: each (query, neighbor) collision
  // keeps the MINIMUM table index where it first collides, and each
  // L-row is a threshold on that column — sweeping L adds one
  // candidate-set-sized aggregation, never a re-join. Truth is the
  // exact top-10 per query over the fixed-SIZE hash query sample
  // ([[querySampleIds]], Q = 128 at every corpus size — r15, VERDICT
  // r14 #4): O(Q·N) map-side scoring + TopKPerGroup, the
  // llm_ann_recall class — the corpus never shuffles and the audit is
  // linear in N. At 100 TB: per-table candidates stay
  // occupancy-bounded (the rotation holds occupancy at the bits ∝
  // log N design point), so the curve's cost axis grows linearly in L
  // and the key itself is pair-set-bounded.
  // ---------------------------------------------------------------------
  private val LshTuneTableCounts = Seq(1, 2, 4, 8)

  // The recall keys' truth audit scores Q·N exact cosines. Through r14
  // the query sample was a modulus (vec_id % 97), so Q grew ∝ N and
  // the audit was O(N²/97) — the measured 164.5 s ×64 off-suite grid
  // wall. The sample is now a FIXED COUNT (VERDICT r14 #4): the
  // LshQuerySample ids with the smallest md5("q_" || vec_id), ties by
  // id — a deterministic, engine-portable pick (both engines md5 the
  // same tag; DuckDB replays it with one row_number window) that
  // Spark executes as TakeOrderedAndProject (distributed top-k, no
  // global sort) and broadcasts. The audit is linear in N at every
  // corpus size; candidates/query and recall@10 are unchanged in
  // meaning (a different but equally-random query set).
  private[graft] val LshQuerySample = 128

  /** The fixed-size audit query sample: ids only, broadcast by every
    * caller into the truth scan and the bucket-rows filter. */
  private def querySampleIds(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
        md5(concat(lit("q_"), col("vec_id").cast("string"))).as("qh"))
      .orderBy("qh", "vec_id")
      .limit(LshQuerySample)
      .select("vec_id")

  private def annLshTune(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val maxL = LshTuneTableCounts.max
    val e = emb(spark, sfDir)
    // one scan+join materializes the Q sampled rows (vec_id, embedding,
    // nrm) — localCheckpoint is the barrier that keeps every downstream
    // branch (truth broadcast, per-table query hashing) reading a
    // Q-row cached block instead of re-running the sample subtree per
    // union branch (measured: the un-checkpointed form re-ran the
    // TakeOrdered+md5 corpus scan once PER TABLE)
    val qe = e.join(broadcast(querySampleIds(e)), Seq("vec_id"))
      .localCheckpoint(true)
    val q = qe.select(col("vec_id").as("q_id"), col("embedding").as("qe"),
      col("nrm").as("qn"))
    val truth = graft.plans.GraftOps.topKPerGroup(
      e.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine(col("embedding"), col("qe"), col("nrm"), col("qn"))
            .as("cosine")),
      Seq("q_id"), Seq(("cosine", false), ("vec_id", true)), k = 10)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val long = lshBucketLong(spark, sfDir, maxL)
    // broadcast id-filter on the corpus union — the annLshGrid note:
    // re-hashing only the Q rows through their own per-table union
    // measured slower than filtering the codegen'd corpus build
    val qb = long.join(broadcast(qe.select("vec_id")), Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    val firstHit = qb.join(long, Seq("tbl", "bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(min(col("tbl")).as("min_tbl"))
    val joined = firstHit.join(truth, Seq("q_id", "vec_id"), "left")
    val spine = LshTuneTableCounts.toDF("n_tables")
    val agg = joined.crossJoin(broadcast(spine))
      .where(col("min_tbl") < col("n_tables"))
      .groupBy("n_tables")
      .agg(count(lit(1)).as("n_candidates"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
    val tn = truth.agg(count(lit(1)).as("n_truth"))
    spine.join(agg, Seq("n_tables"), "left")
      .crossJoin(broadcast(tn))
      .selectExpr("CAST(n_tables AS BIGINT) AS n_tables",
        "coalesce(n_candidates, CAST(0 AS BIGINT)) AS n_candidates",
        "coalesce(n_hits, CAST(0 AS BIGINT)) AS n_hits", "n_truth",
        "CAST(coalesce(n_hits, CAST(0 AS BIGINT)) * 10000 DIV n_truth AS BIGINT) AS recall_bp")
      .orderBy("n_tables")
  }

  // ---------------------------------------------------------------------
  // llm_ann_lsh_tune_bits — the FULL (bits, L) operating grid (VERDICT
  // r12 #3): the tune key sweeps tables at the derived bit width; this
  // key adds the bits dimension so a deployment can pick an operating
  // point at a stated recall target (the conventional dedup-gate floor
  // is recall@10 ≥ 50%). Fewer bits = coarser buckets = more candidates
  // = more recall — the precision dial opposite the L (recall) dial.
  // The whole grid comes from ONE bucket join, extending the tune key's
  // min-table device with the PREFIX property: plane p's sign bit does
  // not depend on the total bit count, so the bucket at b bits is
  // exactly the first b characters of the full-width bucket string.
  // Pairs join once on the COARSEST prefix (the superset candidate
  // set); per (query, neighbor) and bits level, min_tbl(b) = first
  // table whose buckets agree on b bits; each grid cell (b, L) is then
  // a threshold min_tbl(b) < L — never a re-join, never a re-hash.
  // Truth is the same exact top-10 device as the tune key. At 100 TB:
  // the join is occupancy-bounded at the coarsest level (occ(minBits) =
  // occ(derived)·2^6 — a measured-size superset run once, offline, on
  // the query SAMPLE only), and the published curve is how the (bits,
  // L) knobs get pinned before the production index builds.
  // ---------------------------------------------------------------------
  private val LshTuneBitDeltas = Seq(0, 2, 4, 6)

  private def annLshTuneBits(spark: SparkSession, sfDir: String): DataFrame =
    annLshGrid(spark, sfDir, LshTuneTableCounts, LshTuneBitDeltas)

  // ---------------------------------------------------------------------
  // llm_ann_lsh_tune_wide — the CANDIDATE-EFFICIENT arm of the grid
  // (VERDICT r13 #1): the r13 grid found its first ≥50%@10 point at
  // bits=derived−6, L=8, but that point spends ~3.5k candidates/query
  // ≈ 22% of the ×8 corpus — a near-scan, not an operating point. The
  // production trade runs the OTHER dial: hold bits at (or near) the
  // derived occupancy design point, where candidates stay
  // occupancy-bounded (~8/table/query), and buy recall with MORE
  // TABLES — candidates grow linearly in L while misses decay
  // geometrically (P(miss) = (1−p^bits)^L). This key extends the grid
  // to L ∈ {8, 16, 32, 64} at derived and derived−2 bits, reusing the
  // exact min-table/prefix device of `llm_ann_lsh_tune_bits` (one
  // coarsest-prefix join; every cell a threshold); the L=8 rows
  // overlap that key's grid cell-for-cell, spec-pinned, so the two
  // curves cannot drift. At 100 TB this is the half of the curve a
  // deployment actually operates on: with bits ∝ log N pinning
  // occupancy, candidates/query here is L · occupancy — an ABSOLUTE
  // number independent of corpus size — while the coarse-bits arm
  // multiplies occupancy by 2^Δ. Measured ×8 (BASELINE r14): at
  // derived−2, L=64 the per-candidate enrichment is ~6× the r13
  // derived−6 point's, reaching the ≥50%@10 floor at roughly half its
  // candidate budget; the ×64 floor crossing itself (derived−2,
  // L=128) is oracle-gated by `llm_ann_lsh_tune_xl` since r15 —
  // measured off-suite first (r14 LshGridProbe: 51.6%@10 at 3.0% of
  // the corpus, the same ~3.9k budget where the coarse arm read
  // 23.6%), now a suite grid row re-verified every round.
  // ---------------------------------------------------------------------
  private val LshWideTableCounts = Seq(8, 16, 32, 64)
  private val LshWideBitDeltas = Seq(0, 2)

  private def annLshTuneWide(spark: SparkSession, sfDir: String): DataFrame =
    annLshGrid(spark, sfDir, LshWideTableCounts, LshWideBitDeltas)

  // ---------------------------------------------------------------------
  // llm_ann_lsh_tune_xl — the ≥50%@10 CROSSING arm of the wide-L grid
  // (VERDICT r14 #1): r14 measured the ×64 recall floor being crossed
  // at derived−2 bits, L=128 — but only in an off-suite dev probe
  // (LshGridProbe), so the named production operating point was never
  // re-verified by the driver's gates. This key graduates it: the same
  // one-coarsest-prefix-join min-table device as the other two grids,
  // at L ∈ {64, 96, 128} × {derived, derived−2} bits, oracle-replayed
  // at all 3 SFs every round. Its L=64 column overlaps
  // `llm_ann_lsh_tune_wide` cell-for-cell (Round15Spec pins it — one
  // device, three keys, no drift). Wall is disclosed honestly in the
  // bench: the bucket build is 128 union branches (each a codegen'd
  // Project over the pruned embedding column) and the truth audit is
  // the fixed-128-query sample — both linear in N, so the key stays
  // benchable at every SF while measuring the exact config a 100 TB
  // deployment would pin (bits ∝ log N for occupancy, L for the
  // recall floor, candidates/query = L·occupancy an absolute budget).
  // ---------------------------------------------------------------------
  private val LshXlTableCounts = Seq(64, 96, 128)
  private val LshXlBitDeltas = Seq(0, 2)

  private def annLshTuneXl(spark: SparkSession, sfDir: String): DataFrame =
    annLshGrid(spark, sfDir, LshXlTableCounts, LshXlBitDeltas)

  // ---------------------------------------------------------------------
  // llm_ann_lsh_planted — PLANTED-MARGIN recall, oracle-gated (the
  // suite graduation of the r15 PlantedGridProbe/stage_planted dev
  // measurement, per the house graduate-every-no-oracle-result rule):
  // for each of the 128 sampled anchors, a partner vector is
  // constructed IN-PLAN at an exact fixed cosine c ∈ {0.95, 0.8, 0.6}
  // — p = c·ê + √(1−c²)·û, û the Gram–Schmidt-orthogonalized
  // md5-parity ±1/8 direction (tags "pr_<id>_<d>", shared with
  // tools/stage_planted.py) — and the key reports, per (margin, bits,
  // L) grid cell, how many pairs collide in at least one of the first
  // L tables. Because the partner arithmetic is the same strict
  // left-fold double sequence in both engines (aggregate/zip_with
  // here, list_reduce(list_prepend(0,…)) in the oracle), the computed
  // vectors, their sign bits, and the collision counts are
  // bit-identical and the DuckDB oracle replays the whole device.
  // What it measures: recall on neighbors whose margin is a DATA
  // CONSTANT — the analytic 1−(1−p(c)^bits)^L curve (Round15Spec pins
  // every cell within binomial tolerance of it), isolating the index
  // effect (bits ∝ log N) from the i.i.d. background's shrinking
  // true-NN margins that the recall@10 grids conflate with it. At
  // 100 TB: the whole key is O(Q·L·bits) past the sample scan — the
  // corpus is never re-hashed (anchor buckets ride the shared union;
  // partner buckets hash 3·Q constructed rows) — so the planted
  // retention audit costs the same at any corpus size.
  // ---------------------------------------------------------------------
  private[graft] val PlantedMargins = Seq(0.95, 0.8, 0.6)
  private val PlantedTableCounts = Seq(4, 8, 16, 32)
  private val PlantedBitDeltas = Seq(0, 2)

  private def annLshPlanted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val maxL = PlantedTableCounts.max
    val bitsFull = lshBits(spark, sfDir)
    val bitLevels = PlantedBitDeltas.map(d => math.max(2, bitsFull - d)).distinct
    val e = emb(spark, sfDir)
    val anchors = e.join(broadcast(querySampleIds(e)), Seq("vec_id"))
      .select("vec_id", "embedding").localCheckpoint(true)
    // partner construction — every arithmetic step is a strict
    // left-fold or element-wise lambda mirrored verbatim by the oracle
    val base = PlantedMargins.map(c =>
        anchors.withColumn("margin", lit(c))).reduce(_ unionByName _)
      .withColumn("ed", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("r", expr(
        """transform(sequence(0, 63), d -> IF(
             substring(md5(concat('pr_', CAST(vec_id AS STRING), '_',
                                  CAST(d AS STRING))), 1, 1)
               IN ('0','2','4','6','8','a','c','e'),
             CAST(0.125 AS DOUBLE), CAST(-0.125 AS DOUBLE)))"""))
    val gs = base
      .withColumn("en2", expr(
        "aggregate(ed, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"))
      .withColumn("er", expr(
        """aggregate(zip_with(ed, r, (x, y) -> x * y),
                     CAST(0 AS DOUBLE), (acc, x) -> acc + x)"""))
      .withColumn("rp", expr(
        "zip_with(r, ed, (y, x) -> y - (er / en2) * x)"))
      .withColumn("rpn2", expr(
        "aggregate(rp, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"))
    val partners = gs.select(col("vec_id"), col("margin"), expr(
        """zip_with(ed, rp, (x, y) ->
             margin * (x / sqrt(en2)) +
             sqrt(CAST(1 AS DOUBLE) - margin * margin) * (y / sqrt(rpn2)))""")
        .as("embedding"))
      .localCheckpoint(true)
    // buckets: anchors AND partners are Q-sized, so both sides hash
    // through small per-table projections — the corpus union is never
    // needed here (this key is O(Q) past the sample scan)
    val ab = lshBucketRows(anchors, bitsFull, maxL)
      .select(col("vec_id"), col("tbl"), col("bucket").as("abucket"))
    val pb = partners.select(col("vec_id"), col("margin"),
      posexplode(graft.functions.VectorOps.signBuckets(col("embedding"),
        planeTensor(maxL, bitsFull))).as(Seq("tbl", "pbucket")))
    val aggs = bitLevels.map(b =>
      min(when(substring(col("abucket"), 1, b) ===
        substring(col("pbucket"), 1, b), col("tbl"))).as(s"mt_$b"))
    val firstHit = pb.join(ab, Seq("vec_id", "tbl"))
      .groupBy(col("vec_id"), col("margin"))
      .agg(aggs.head, aggs.tail: _*)
    val perLevel = bitLevels.map { b =>
      firstHit.select(col("margin"), lit(b.toLong).as("n_bits"),
        col(s"mt_$b").as("min_tbl"))
    }.reduce(_ unionByName _)
    val lspine = PlantedTableCounts.toDF("n_tables")
    perLevel.crossJoin(broadcast(lspine))
      .groupBy("margin", "n_bits", "n_tables")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("min_tbl") < col("n_tables"), 1L).otherwise(0L))
          .as("n_collide"))
      .selectExpr("margin", "CAST(n_bits AS BIGINT) AS n_bits",
        "CAST(n_tables AS BIGINT) AS n_tables", "n_pairs", "n_collide",
        "CAST(n_collide * 10000 DIV n_pairs AS BIGINT) AS recall_bp")
      .orderBy("margin", "n_bits", "n_tables")
  }

  /** The shared (bits, L) grid device: ONE bucket join on the coarsest
    * prefix (the superset candidate set — the prefix property makes
    * bucket@b the first b chars of the full bucket), min_tbl per bits
    * level per (query, neighbor), every grid cell a threshold. Both
    * grid keys call this with their own (tableCounts, bitDeltas);
    * [[graft.streaming.LshGridProbe]] drives it at arbitrary
    * configurations for off-suite measurements. */
  private[graft] def annLshGrid(spark: SparkSession, sfDir: String,
      tableCounts: Seq[Int], bitDeltas: Seq[Int]): DataFrame = {
    import spark.implicits._
    val maxL = tableCounts.max
    val bitsFull = lshBits(spark, sfDir)
    val bitLevels = bitDeltas.map(d => math.max(2, bitsFull - d)).distinct
    val minBits = bitLevels.min
    val e = emb(spark, sfDir)
    // the annLshTune convention: materialize the Q sampled rows once
    // (localCheckpoint barrier) so no downstream branch re-runs the
    // sample subtree
    val qe = e.join(broadcast(querySampleIds(e)), Seq("vec_id"))
      .localCheckpoint(true)
    val q = qe.select(col("vec_id").as("q_id"), col("embedding").as("qe"),
      col("nrm").as("qn"))
    val truth = graft.plans.GraftOps.topKPerGroup(
      e.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine(col("embedding"), col("qe"), col("nrm"), col("qn"))
            .as("cosine")),
      Seq("q_id"), Seq(("cosine", false), ("vec_id", true)), k = 10)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val long = lshBucketLong(spark, sfDir, maxL)
    // query-side bucket rows come from a broadcast id-filter on the
    // SAME union the corpus side builds. The alternative — hashing
    // only the Q sampled rows via their own per-table union — measured
    // 1.8× SLOWER at ×64 (10.1 vs 5.6 s on the xl key, matched load):
    // 128 one-branch projections over a 128-row input each pay a
    // stage, while the corpus union is codegen'd and output-bounded,
    // so the filter probe costs one broadcast lookup per bucket row
    val qb = long.join(broadcast(qe.select("vec_id")), Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("tbl"),
        substring(col("bucket"), 1, minBits).as("pfx"),
        col("bucket").as("qbucket"))
    val nb = long.select(col("vec_id"), col("tbl"),
      substring(col("bucket"), 1, minBits).as("pfx"),
      col("bucket").as("nbucket"))
    val aggs = bitLevels.map(b =>
      min(when(substring(col("qbucket"), 1, b) ===
        substring(col("nbucket"), 1, b), col("tbl"))).as(s"mt_$b"))
    val firstHit = qb.join(nb, Seq("tbl", "pfx"))
      .where(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(aggs.head, aggs.tail: _*)
      .join(truth, Seq("q_id", "vec_id"), "left")
    // melt to (n_bits, min_tbl, hit): one plain Project per bits level
    val perLevel = bitLevels.map { b =>
      firstHit.select(lit(b.toLong).as("n_bits"),
          col(s"mt_$b").as("min_tbl"), col("hit"))
        .where(col("min_tbl").isNotNull)
    }.reduce(_ unionByName _)
    val lspine = tableCounts.toDF("n_tables")
    val agg = perLevel.crossJoin(broadcast(lspine))
      .where(col("min_tbl") < col("n_tables"))
      .groupBy("n_bits", "n_tables")
      .agg(count(lit(1)).as("n_candidates"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
    val grid = bitLevels.map(_.toLong).toDF("n_bits").crossJoin(lspine)
    val tn = truth.agg(count(lit(1)).as("n_truth"))
    grid.join(agg, Seq("n_bits", "n_tables"), "left")
      .crossJoin(broadcast(tn))
      .selectExpr("CAST(n_bits AS BIGINT) AS n_bits",
        "CAST(n_tables AS BIGINT) AS n_tables",
        "coalesce(n_candidates, CAST(0 AS BIGINT)) AS n_candidates",
        "coalesce(n_hits, CAST(0 AS BIGINT)) AS n_hits", "n_truth",
        "CAST(coalesce(n_hits, CAST(0 AS BIGINT)) * 10000 DIV n_truth AS BIGINT) AS recall_bp")
      .orderBy("n_bits", "n_tables")
  }

  // ---------------------------------------------------------------------
  // llm_hard_negatives — hard-negative mining for retrieval training:
  // per anchor vector, the top-2 SIMILAR-BUT-NOT-DUPLICATE neighbors
  // (0.25 ≤ cosine < 0.4 — close enough to be confusable, below the
  // dup threshold so they are genuinely different content). Candidates
  // come from the same LSH buckets as the dup path — hard negatives
  // are by definition bucket-mates, so the bucketed index gives
  // exactly the candidate set worth scoring and all-pairs never
  // materializes. One window shuffle on the anchor id.
  // ---------------------------------------------------------------------
  private def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = lshScoredCandidates(spark, sfDir)
      .where(col("cosine") >= 0.25 && col("cosine") < 0.4)
    val sym = scored.select(col("vec_a").as("anchor"),
        col("vec_b").as("negative"), col("cosine"))
      .unionByName(scored.select(col("vec_b").as("anchor"),
        col("vec_a").as("negative"), col("cosine")))
    sym.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("anchor")
          .orderBy(col("cosine").desc, col("negative"))))
      .where(col("rk") <= 2)
      .select("anchor", "rk", "negative", "cosine")
      .orderBy("anchor", "rk")
  }

  // ---------------------------------------------------------------------
  // llm_embed_neardup_lsh — the PRODUCTION near-dup path: the same
  // cosine ≥ 0.4 semantics as llm_embed_neardup, but candidates come
  // from the LSH bucket equi-join instead of the O(n²) cross product.
  // Because the buckets are md5-deterministic, the DuckDB oracle
  // replays the ENTIRE pipeline (planes → sign bits → bucket join →
  // exact cosine filter), so this key is hash-checked end-to-end —
  // recall vs the exact baseline is measured separately in LlmSpec.
  // ---------------------------------------------------------------------
  private def embedNeardupLsh(spark: SparkSession, sfDir: String): DataFrame =
    lshScoredCandidates(spark, sfDir)
      .where(col("cosine") >= 0.4)
      .orderBy("vec_a", "vec_b")

  /** Session-staged verified embedding near-dup pairs + cluster labels
    * — the same r7-adjudicated staged-artifact pattern LlmText.
    * verifiedPairs applies to the text pipeline, motivated by the r10
    * ×64 measurement: `llm_cluster_coherence` re-ran the whole LSH
    * bucket join + exact-cosine verify AND the label fixpoint per
    * invocation (94.9× at ×64 while the pair set grew exactly 64×).
    * A production pipeline stages exactly these two tables (the dedup
    * log and the cluster assignment) before any audit reads them.
    * Eviction costs a re-READ of pair-set-sized parquet, never an LSH
    * or fixpoint re-run. The public `llm_embed_neardup_lsh` and the
    * audit keys stay live where they ARE the measured operator. */
  private[graft] def embedPairs(spark: SparkSession, sfDir: String): DataFrame =
    graft.etl.Fixtures.stagedPersisted(spark, sfDir, "embed_pairs") { d =>
      embedNeardupLsh(spark, sfDir).write.mode("overwrite").parquet(d)
    }

  private def embedClusterLabels(spark: SparkSession,
                                 sfDir: String): DataFrame =
    graft.etl.Fixtures.stagedPersisted(spark, sfDir,
      "embed_cluster_labels") { d =>
      embedClusterUncached(spark, sfDir).write.mode("overwrite").parquet(d)
    }

  // ---------------------------------------------------------------------
  // llm_bitext_margin — margin-based bitext mining (the CCMatrix /
  // LASER selection rule, Artetxe & Schwenk 2019): a cross-lingual
  // pair is kept not when its raw cosine is high but when it is high
  // RELATIVE to each side's other nearest neighbors — margin(x,y) =
  // cos(x,y) / ((knn̄(x) + knn̄(y)) / 2) — which suppresses hubs that
  // are "close to everything". Embeddings carry no language column, so
  // even/odd vec_id stands in for the two sides. The scale shape:
  // candidates and BOTH k-nn means come from the LSH bucket space
  // (never all-pairs — the neighbors a bucketed index can see are
  // exactly what production margin miners use), one checkpoint of the
  // scored candidate pairs feeds the two top-4 aggregates and the
  // final scoring join, and the margin itself is computed from
  // e6-scaled integer cosines — cos·2·na·nb / (sa·nb + sb·na) as one
  // exact-integer ratio with a single rounded double division — so
  // ranking and the ≥1.05 keep-threshold are engine-exact. Per-source
  // argmax (margin DESC, tgt) emits at most one mined pair per source
  // vector.
  // ---------------------------------------------------------------------
  private def bitextMargin(spark: SparkSession, sfDir: String): DataFrame = {
    val base = lshScoredCandidates(spark, sfDir)
      .where(col("cosine") >= 0.1)
      .where((col("vec_a") % 2 === 0) =!= (col("vec_b") % 2 === 0))
      .select(
        when(col("vec_a") % 2 === 0, col("vec_a"))
          .otherwise(col("vec_b")).as("src_id"),
        when(col("vec_a") % 2 === 0, col("vec_b"))
          .otherwise(col("vec_a")).as("tgt_id"),
        expr("cast(round(cosine * 1000000) as bigint)").as("cos_e6"))
      .localCheckpoint(true)
    val wA = Window.partitionBy("src_id")
      .orderBy(col("cos_e6").desc, col("tgt_id"))
    val wB = Window.partitionBy("tgt_id")
      .orderBy(col("cos_e6").desc, col("src_id"))
    val ranked = base
      .withColumn("rka", row_number().over(wA))
      .withColumn("rkb", row_number().over(wB))
    val aStats = ranked.where(col("rka") <= 4).groupBy("src_id")
      .agg(sum(col("cos_e6")).as("sa_e6"), count(lit(1)).as("na"))
    val bStats = ranked.where(col("rkb") <= 4).groupBy("tgt_id")
      .agg(sum(col("cos_e6")).as("sb_e6"), count(lit(1)).as("nb"))
    val wBest = Window.partitionBy("src_id")
      .orderBy(col("margin_e6").desc, col("tgt_id"))
    base.join(aStats, Seq("src_id")).join(bStats, Seq("tgt_id"))
      .withColumn("margin_e6", expr(
        """cast(round(cast(cos_e6 * 2 * na * nb as double) * 1000000.0
                      / cast(sa_e6 * nb + sb_e6 * na as double)) as bigint)"""))
      .withColumn("rk", row_number().over(wBest))
      .where(col("rk") === 1 && col("margin_e6") >= 1050000L)
      .select("src_id", "tgt_id", "cos_e6", "margin_e6")
      .orderBy("src_id")
  }

  // ---------------------------------------------------------------------
  // llm_embed_cluster — connected components over the embedding
  // near-dup graph: the semantic-dedup twin of the text-side
  // `llm_dedup_clusters`, so transitive chains of cosine-similar
  // embeddings collapse to one cluster with one kept vector. Edges are
  // the PRODUCTION LSH path's verified pairs (bucketed candidates +
  // exact cosine ≥ 0.4 — never all-pairs), and the label propagation
  // reuses the shared fixpoint (min-label rounds escalating to pointer
  // doubling, lineage truncated per round).
  // ---------------------------------------------------------------------
  private def embedCluster(spark: SparkSession, sfDir: String): DataFrame =
    embedClusterLabels(spark, sfDir).orderBy("vec_id")

  private def embedClusterUncached(spark: SparkSession,
                                   sfDir: String): DataFrame = {
    val ids = t(spark, sfDir, "embeddings")
      .select(col("vec_id").as("doc_id"))
    val pairs = embedPairs(spark, sfDir).select("vec_a", "vec_b")
    val edges = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
      .unionByName(pairs.select(col("vec_b").as("src"),
        col("vec_a").as("dst")))
      .persist()
    val converged = LlmText.labelFixpoint(
      ids.select(col("doc_id"), col("doc_id").as("lbl")), edges)
    edges.unpersist()
    converged.select(col("doc_id").as("vec_id"), col("lbl").as("cluster_id"),
      (col("doc_id") === col("lbl")).as("is_kept"))
      .orderBy("vec_id")
  }

  // ---------------------------------------------------------------------
  // llm_cluster_coherence — per-cluster quality audit of the semantic
  // dedup clustering: connected components are only as trustworthy as
  // the edges that built them, and a TRANSITIVE chain can glue vectors
  // whose direct similarity is weak (A~B~C with A,C barely related —
  // the semantic twin of the text-side collapse llm_graph_modularity
  // watches for). Per non-singleton cluster: size, verified intra-
  // cluster edge count, mean edge cosine, and edge DENSITY vs the
  // complete graph — a large cluster with low density is chain-glued,
  // not a tight duplicate group, and a curation pipeline re-verifies
  // or splits it before dropping members. ALL-INTEGER arithmetic: the
  // e6 cosines come from the already-parity-pinned LSH edge scores,
  // mean/density are integer DIV on positives (every non-singleton CC
  // has ≥1 intra edge and n·(n−1) ≥ 2 BY CONSTRUCTION — the clusters
  // are built from these very edges). Cost: one labels join per edge
  // endpoint + a cluster-keyed aggregation — edge-set-sized, the
  // modularity class.
  // ---------------------------------------------------------------------
  private def clusterCoherence(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = embedPairs(spark, sfDir)
      .selectExpr("vec_a", "vec_b",
        "cast(round(cosine * 1000000) as bigint) AS cos_e6")
    val labels = embedClusterLabels(spark, sfDir)
      .select("vec_id", "cluster_id")
    val sizes = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_vecs"))
    val intra = edges
      .join(labels.select(col("vec_id").as("vec_a"),
        col("cluster_id").as("ca")), Seq("vec_a"))
      .join(labels.select(col("vec_id").as("vec_b"),
        col("cluster_id").as("cb")), Seq("vec_b"))
      .where(col("ca") === col("cb"))
      .groupBy(col("ca"))
      .agg(count(lit(1)).as("n_intra_edges"), sum(col("cos_e6")).as("s"))
      .withColumnRenamed("ca", "cluster_id")
    sizes.where(col("n_vecs") >= 2)
      .join(intra, Seq("cluster_id"))
      .selectExpr("cluster_id", "n_vecs", "n_intra_edges",
        "s DIV n_intra_edges AS mean_cos_e6",
        "n_intra_edges * 2000000 DIV (n_vecs * (n_vecs - 1)) AS density_ppm",
        "s DIV n_intra_edges >= 600000 AS coherent")
      .orderBy("cluster_id")
  }

  // ---------------------------------------------------------------------
  // llm_semdedup — SemDeDup-style semantic dedup (the cluster-then-
  // prune pattern from the SemDeDup paper): partition the embedding
  // space into IVF cells around the same 16 broadcast-literal parity
  // centroids as llm_ann_ivf, then prune WITHIN each cell only — a
  // vector is dropped when a better-ranked cell-mate (higher cosine to
  // the cell centroid, ties toward the smaller id) sits within
  // cosine ≥ SemTau of it. Candidate pairs come from the cell
  // equi-join IDS-ONLY (embeddings re-attach by id afterward), so the
  // pairwise stage is O(Σ cell²) bounded by cell occupancy — never
  // corpus² — WHICH HOLDS ONLY UNDER THE k ∝ N RULE: occupancy is
  // E[cell] ≈ N/k, so a fixed k makes Σ cell² grow as N²/k; production
  // SemDeDup scales the cluster count with the corpus (~100k clusters
  // at web scale) to keep N/k — and thus the per-cell pairwise work —
  // constant. The 16 compile-time centroids are the test-scale
  // instance of that rule (CellOccupancySpec pins the near-uniform
  // occupancy the bound relies on; SCALE.md rows name the rule).
  // The one-pass "exists a better-ranked near
  // neighbor" rule is deterministic and order-free (no greedy
  // sequential sweep), which is what makes it oracle-replayable and
  // shuffle-order-independent at any parallelism.
  // ---------------------------------------------------------------------
  private val SemTau = 0.4

  private def semDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val k = ivfK(spark, sfDir)
    val e = widenForAssign(spark, emb(spark, sfDir), k)
    val assigned = e
      .withColumn("best",
        bestCent(col("embedding"), col("nrm"), k))
      .select(col("vec_id"), (-col("best.nid")).cast("int").as("cell"),
        col("best.c").as("centrality"))
    val a = assigned.select(col("vec_id").as("vec_a"), col("cell"),
      col("centrality").as("cent_a"))
    val b = assigned.select(col("vec_id").as("vec_b"), col("cell"),
      col("centrality").as("cent_b"))
    val cand = a.join(b, "cell")
      .where(col("cent_a") > col("cent_b") ||
        (col("cent_a") === col("cent_b") && col("vec_a") < col("vec_b")))
      .select("vec_a", "vec_b")
    val ea = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    val dropped = cand.join(ea, "vec_a").join(eb, "vec_b")
      .where(cosine(col("ea"), col("eb"), col("na"), col("nb")) >= SemTau)
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("hit", lit(true))
    assigned.select("vec_id", "cell")
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("hit").isNull.as("is_kept"))
      .orderBy("vec_id")
  }

  // ---------------------------------------------------------------------
  // llm_ann_ivf — inverted-file ANN, the second scale path: partition
  // the corpus into cells around FIXED centroids, search only the
  // nprobe cells nearest the query. The 16 centroids are deterministic
  // ±1 direction vectors (md5-parity, like the LSH planes) standing in
  // for offline k-means output; crucially they are independent of
  // corpus size, so the broadcast stays a few KB at any scale.
  // Assignment is a map-side argmax over the centroid array — 16
  // codegen'd dot products + array_max per row, NO crossJoin explode,
  // NO window, NO Exchange anywhere before the final top-k. The only
  // cluster-wide operation in the whole query is TakeOrderedAndProject.
  // ---------------------------------------------------------------------
  // k ∝ N (VERDICT r10 #1 — the SemDeDup/IVF production rule made
  // live): nlist = max(16, n / 125). Fixed k makes the per-cell
  // pairwise/probe work grow as N²/k; scaling k with the corpus keeps
  // E[occupancy] ≈ 125 — and thus Σ cell² — linear in N. At the three
  // test SFs (n ≤ 2000) the max floors k at 16 (results identical to
  // the fixed-k era); the ×8 corpus derives k=128, ×64 k=1024. The
  // DuckDB oracles compute the SAME rule data-derived
  // (greatest(16, count(*) // 125) — [[IvfKSql]]), so k is semantics
  // both engines share, not a Spark-side tuning knob. The count() is
  // parquet-footer metadata (no data scan), memoized per corpus dir.
  private val IvfKFloor = 16
  private val IvfTargetOcc = 125
  private val ivfKCache = scala.collection.concurrent.TrieMap.empty[String, Int]
  private[graft] def ivfK(spark: SparkSession, sfDir: String): Int =
    ivfKCache.getOrElseUpdate(sfDir, math.max(IvfKFloor,
      (t(spark, sfDir, "embeddings").count() / IvfTargetOcc).toInt))

  /** Deterministic ±1 centroid c, dimension d — md5-parity of
    * "c_<c>_<d>" (shared [[OracleFmt.mdParitySign]]; the oracle
    * recomputes the identical value with SQL md5). Norm is exactly
    * sqrt(64) = 8.0. */
  private def centSign(c: Int, d: Int): Double =
    OracleFmt.mdParitySign(s"c_${c}_$d")

  /** Parity-centroid matrix for a given k — memoized so every plan
    * using the same k shares ONE Array instance (CentroidScores
    * compares reference-equal matrices for subexpression reuse). */
  private val parityCentsCache =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Array[Double]]]
  private def parityCents(k: Int): Array[Array[Double]] =
    parityCentsCache.getOrElseUpdate(k,
      Array.tabulate(k)(c => Array.tabulate(64)(d => centSign(c, d))))

  /** array of struct(ccos, -cent_id): array_max picks max cosine, ties
    * broken toward the SMALLEST centroid id (nid is negated). One
    * codegen loop over the k×64 matrix ([[graft.functions.CentroidScores]])
    * — generated code is k-independent, so the k ∝ N rule never grows
    * the expression tree. */
  private val parityNormsCache =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Double]]
  private def parityNorms(k: Int): Array[Double] =
    parityNormsCache.getOrElseUpdate(k, Array.fill(k)(8.0))
  private def centScores(embCol: Column, nrmCol: Column, k: Int): Column =
    graft.functions.VectorOps.centroidScores(embCol, nrmCol,
      parityCents(k), parityNorms(k))

  /** Corpus-side assignment: the fused argmax
    * ([[graft.functions.BestCentroid]] — no k-struct array per row);
    * query rows keep the full sorted scores array for top-nprobe. */
  private def bestCent(embCol: Column, nrmCol: Column, k: Int): Column =
    graft.functions.VectorOps.bestCentroid(embCol, nrmCol,
      parityCents(k), parityNorms(k))

  /** Repartition UP before the O(k·dim)-per-row assignment when the
    * scan offers fewer partitions than cores. The local scale corpora
    * are single coalesced parquet files (1–2 row groups), which would
    * run the k-heavy argmax nearly single-threaded — measured this
    * round: 20.7 s for the ×64 assignment on one task vs <1 s wide. A
    * real 100 TB corpus arrives as thousands of files, so this is a
    * no-op there, and a no-op at the k floor (test-SF plans stay
    * digest-pinned, no exchange added). */
  private def widenForAssign(spark: SparkSession, df: DataFrame,
                             k: Int): DataFrame =
    if (k <= IvfKFloor) df
    else {
      val want = spark.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
    }

  /** Shared IVF probe: cell-assign the corpus (map-side argmax over
    * the centroid array), derive the query row's top-nprobe(=2) probed
    * cells, and emit each in-probed-cell candidate with its exact
    * cosine. Both llm_ann_ivf (top-k tail) and llm_ann_range
    * (threshold tail) build on this ONE derivation, matching the
    * shared IvfCellsCte their oracles replay — the Spark side can no
    * longer drift between the two keys any more than the oracle can. */
  /** Map-side cell assignment over the fixed-centroid IVF index —
    * argmax over the centroid scores array, ties to the smallest
    * centroid id. The ONE Spark-side derivation of `cell`, shared by
    * the single-query probe and the batch-query key exactly as their
    * oracles share IvfBaseCte's `assigned` CTE. */
  private def ivfAssigned(e: DataFrame, k: Int): DataFrame = e
    .withColumn("best", bestCent(col("embedding"), col("nrm"), k))
    .select(col("vec_id"), col("embedding"), col("nrm"),
      (-col("best.nid")).cast("int").as("cell"))

  private def ivfProbedCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    val k = ivfK(spark, sfDir)
    val e = emb(spark, sfDir)
    val assigned = ivfAssigned(widenForAssign(spark, e, k), k)
    // query row: same scores array, sorted desc, top-nprobe(=2) cells
    val q = e.where(col("vec_id") === 7)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
      .withColumn("scored",
        sort_array(centScores(col("qe"), col("qn"), k), asc = false))
      .select(col("qe"), col("qn"),
        expr(s"transform(slice(scored, 1, 2), s -> cast(-s.nid as int))")
          .as("probed"))
    assigned.crossJoin(broadcast(q))
      .where(array_contains(col("probed"), col("cell")) &&
        col("vec_id") =!= 7)
      .select(col("vec_id"), col("cell"),
        cosine(col("embedding"), col("qe"), col("nrm"), col("qn")).as("cosine"))
  }

  private def annIvf(spark: SparkSession, sfDir: String): DataFrame =
    ivfProbedCandidates(spark, sfDir)
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)

  // ---------------------------------------------------------------------
  // llm_ann_range — RANGE search over the same IVF index: every vector
  // within cosine ≥ 0.1 of the query, not a fixed top-k. The two query
  // shapes are operationally different — top-k bounds the OUTPUT
  // (TakeOrderedAndProject), range search bounds the SIMILARITY and
  // must emit however many qualify, which is what dedup-by-radius and
  // "find all near-copies of this item" actually need. Shares the
  // ENTIRE cell-assignment/probe derivation with llm_ann_ivf
  // ([[ivfProbedCandidates]], mirroring the shared IvfCellsCte their
  // oracles replay, so cell semantics cannot drift between the two —
  // only the tails differ); the threshold filter runs
  // inside the scan-side projection, so the only rows that ever leave
  // the map side are the qualifying ones — at 100 TB the cost is the
  // probed cells' scan, and the emitted set is radius-selectivity-
  // sized, never cell-sized.
  // ---------------------------------------------------------------------
  private def annRange(spark: SparkSession, sfDir: String): DataFrame =
    ivfProbedCandidates(spark, sfDir)
      .where(col("cosine") >= 0.1)
      .orderBy("vec_id")

  // ---------------------------------------------------------------------
  // llm_embedding_stats — per-DIMENSION distribution audit of the
  // embedding column: n / mean / std / min / max per dim. This is the
  // embedding health check run before any index or quantizer is
  // built — dead dimensions (std ≈ 0), scale imbalance (one dim
  // dominating the L2 norm), and drift between snapshots all show up
  // here first, and PQ codebook training assumes roughly balanced
  // dims. Engine parity: each float is e6-integerized ONCE
  // (float→double cast is exact; round is the shared convention), so
  // n/Σ/Σ²/min/max accumulate as exact int64 — aggregation-order-
  // independent — and mean/std are fixed double expressions over
  // those integers (sqrt is IEEE correctly-rounded, so even it cannot
  // diverge). One posexplode + one dim-keyed shuffle of 64 groups —
  // map-side combined, output 64 rows at any corpus size.
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // llm_embedding_pca — top principal direction of the embedding cloud
  // by DISTRIBUTED POWER ITERATION: the whitening/diagnostic primitive every
  // embedding pipeline wants before PQ or IVF training ("is there one
  // dominant axis, and which dims load on it" — a rogue feature or an
  // unnormalized batch shows up as a single dominating component).
  // Three unrolled iterations of w ← normalize(Cᵀ(Cw)) where C is the
  // mean-centered quantized matrix: each iteration is exactly TWO
  // keyed aggregations — Cw is one vec_id-keyed sum (the dot products),
  // Cᵀ(·) one dim-keyed sum of 64 groups — with the 64-row weight
  // vector broadcast back, the logreg-GD communication pattern
  // (bandwidth-optimal at 100 TB: corpus passes into 64-integer
  // partials, never a gram matrix, never a collect). Engine-exact by
  // the fixed-point convention: floats e6-integerize once, the
  // centering mean rounds once per dim, per-row dot contributions are
  // exact int64, each dot then rounds ONCE through a double (negative-
  // safe, unlike DIV) before the second pass, and the normalization is
  // one rounded double division by max|g| per dim (max-abs, not L2, so
  // no sqrt enters the loop). Overflow headroom is by construction:
  // |c| ≤ 2e6, |w| ≤ 1e3 → |Σ_d c·w| ≤ 1.3e11; scaled dots ≤ 1.3e5
  // keep the dim sums ≤ ~6e17 even on the ×64 corpus. Sign is pinned
  // by the deterministic all-ones init.
  // ---------------------------------------------------------------------
  private def embeddingPca(spark: SparkSession, sfDir: String): DataFrame = {
    val quant = t(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "posexplode(embedding) AS (dim, valf)")
      .selectExpr("vec_id", "dim",
        "CAST(round(CAST(valf AS DOUBLE) * 1000000) AS BIGINT) AS v")
    val mu = quant.groupBy("dim")
      .agg(expr("""CAST(round(CAST(sum(v) AS DOUBLE) /
        CAST(count(1) AS DOUBLE)) AS BIGINT)""").as("mu"))
    val centered = quant.join(broadcast(mu), Seq("dim"))
      .selectExpr("vec_id", "dim", "v - mu AS c")
      .localCheckpoint(true) // read twice per iteration; lineage truncated
    var w = mu.selectExpr("dim", "CAST(1000 AS BIGINT) AS w")
    for (_ <- 1 to 3) {
      val dots = centered.join(broadcast(w), Seq("dim"))
        .groupBy("vec_id").agg(sum(expr("c * w")).as("dot"))
        .selectExpr("vec_id",
          "CAST(round(CAST(dot AS DOUBLE) / 1000000.0) AS BIGINT) AS ds")
      val g = centered.join(dots, Seq("vec_id"))
        .groupBy("dim").agg(sum(expr("ds * c")).as("g"))
      val mx = g.agg(max(expr("abs(g)")).as("mx"))
      w = g.crossJoin(broadcast(mx))
        .selectExpr("dim",
          """CAST(round(1000.0 * CAST(g AS DOUBLE) /
             CAST(greatest(mx, 1) AS DOUBLE)) AS BIGINT) AS w""")
    }
    val lam = centered.join(broadcast(w), Seq("dim"))
      .groupBy("vec_id").agg(sum(expr("c * w")).as("dot"))
      .agg(count(lit(1)).as("n_vecs"),
        // Rayleigh-proxy along the found axis: Σ of scaled squared
        // projections — exact integers after the shared per-dot
        // round-through-double
        sum(expr("""CAST(round(CAST(dot AS DOUBLE) / 1000000.0) AS BIGINT)
          * CAST(round(CAST(dot AS DOUBLE) / 1000000.0) AS BIGINT)"""))
          .as("proj_ss"))
    w.crossJoin(broadcast(lam))
      .selectExpr("CAST(dim AS INT) AS dim", "w AS loading_e3",
        "n_vecs", "proj_ss")
      .orderBy("dim")
  }

  // ---------------------------------------------------------------------
  // llm_cluster_outliers — member-vs-centroid audit of the labeled
  // embedding clusters: for each label, the centroid is the
  // e6-quantized per-dim mean, every member scores its cosine TO ITS
  // OWN centroid, and the audit reports members below the 0.5 band —
  // the mislabel/contamination detector that complements
  // llm_cluster_coherence (coherence grades EDGES of the discovered
  // clustering; this grades MEMBERS against the labeled one). Shapes:
  // one (label, dim) aggregation — key-cardinality-bounded — whose
  // result broadcasts; one member-scoring pass with exact int64
  // dot/norm sums; cosine is ONE double expression rounded once (IEEE
  // sqrt, the embedding_stats convention, with the dead-vector
  // greatest(·,1) guard); the worst member resolves by (min cos, min
  // vec_id) join — no window over data. Output is label-count rows.
  // ---------------------------------------------------------------------
  private def clusterOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val quant = t(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "label", "posexplode(embedding) AS (dim, valf)")
      .selectExpr("vec_id", "label", "dim",
        "CAST(round(CAST(valf AS DOUBLE) * 1000000) AS BIGINT) AS v")
    val cent = quant.groupBy("label", "dim")
      .agg(expr("""CAST(round(CAST(sum(v) AS DOUBLE) /
        CAST(count(1) AS DOUBLE)) AS BIGINT)""").as("mu"))
    val scored = quant.join(broadcast(cent), Seq("label", "dim"))
      .groupBy("vec_id", "label")
      .agg(sum(expr("v * mu")).as("dot"), sum(expr("v * v")).as("vv"),
        sum(expr("mu * mu")).as("mm"))
      .selectExpr("vec_id", "label",
        """CAST(round(1000000.0 * CAST(dot AS DOUBLE) /
           (sqrt(CAST(greatest(vv, 1) AS DOUBLE)) *
            sqrt(CAST(greatest(mm, 1) AS DOUBLE)))) AS BIGINT) AS cos_e6""")
    val perLabel = scored.groupBy("label")
      .agg(count(lit(1)).as("n_members"),
        // round-through-double, not DIV: a negative cosine sum would
        // hit the truncate-vs-floor divergence (Spark DIV vs DuckDB //)
        expr("""CAST(round(CAST(sum(cos_e6) AS DOUBLE) /
          CAST(count(1) AS DOUBLE)) AS BIGINT)""").as("mean_cos_e6"),
        sum(when(col("cos_e6") < 500000L, 1L).otherwise(0L))
          .as("n_outliers"),
        min(col("cos_e6")).as("worst_cos_e6"))
    perLabel
      .join(scored.selectExpr("label", "cos_e6 AS worst_cos_e6",
        "vec_id"), Seq("label", "worst_cos_e6"))
      .groupBy("label", "n_members", "mean_cos_e6", "n_outliers",
        "worst_cos_e6")
      .agg(min(col("vec_id")).as("worst_vec_id"))
      .orderBy("label")
  }

  private def embeddingStats(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .selectExpr("posexplode(embedding) AS (dim, val)")
      .selectExpr("dim",
        "CAST(round(CAST(val AS DOUBLE) * 1000000) AS BIGINT) AS v")
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(expr("v * v")).as("ss"),
        min(col("v")).as("min_e6"), max(col("v")).as("max_e6"))
      .selectExpr("CAST(dim AS INT) AS dim", "n", "min_e6", "max_e6",
        "CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_e6",
        // greatest(…, 0.0): for a dead dimension the double rounding
        // of ss − s²/n can land a hair below the exact-integer 0
        // (Cauchy–Schwarz floor) — Spark would return NaN but DuckDB
        // ERRORS on sqrt(negative), so the clamp is an engine-parity
        // requirement, not cosmetics. Identical clamp in the oracle.
        """sqrt(greatest((CAST(ss AS DOUBLE) -
             CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1.0), 0.0)) AS std_e6""")
      .orderBy("dim")

  // ---------------------------------------------------------------------
  // llm_ann_batch_queries — BATCHED multi-query IVF probe: 5 queries
  // answered in ONE pass over the index. This is the shape retrieval
  // actually runs at — queries arrive in batches, and the win is
  // amortization: the cell-assignment scan is paid once for the whole
  // batch (the query table is a broadcast — per-query probe arrays
  // travel WITH the queries, never through a shuffle), and candidates
  // are (vector, query) pairs only where the vector's cell is in that
  // query's probed set. The per-query top-3 cut runs on the custom
  // TopKPerGroup operator (map-side bounded heaps, partial → exchange
  // on qid → final; no per-partition sort, per-group state = k) — the
  // multi-key case TakeOrderedAndProject cannot express. At 100 TB:
  // batch of B queries = one probed-cells scan + one qid-keyed
  // k-bounded exchange, vs B full single-query plans.
  // ---------------------------------------------------------------------
  private def annBatchQueries(spark: SparkSession, sfDir: String): DataFrame = {
    val k = ivfK(spark, sfDir)
    val e = emb(spark, sfDir)
    val assigned = ivfAssigned(widenForAssign(spark, e, k), k)
    val qs = e.where(col("vec_id").isin(3, 7, 11, 19, 23))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
      .withColumn("scored",
        sort_array(centScores(col("qe"), col("qn"), k), asc = false))
      .select(col("qid"), col("qe"), col("qn"),
        expr(s"transform(slice(scored, 1, 2), s -> cast(-s.nid as int))")
          .as("probed"))
    val cand = assigned.crossJoin(broadcast(qs))
      .where(array_contains(col("probed"), col("cell")) &&
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("embedding"), col("qe"), col("nrm"), col("qn"))
          .as("cosine"))
    graft.plans.GraftOps.topKPerGroup(cand, Seq("qid"),
        Seq(("cosine", false), ("vec_id", true)), k = 3)
      .orderBy(col("qid"), col("cosine").desc, col("vec_id"))
  }

  // ---------------------------------------------------------------------
  // llm_ann_recall — recall@10 of the IVF probe against the exact
  // brute-force top-10: the ANN tier's accuracy audit, mirroring what
  // llm_dedup_eval does for the dedup tier. An approximate index
  // without a measured recall is an unvalidated index — production ANN
  // deployments publish exactly this number per (nlist, nprobe)
  // setting. The truth side is the map-side TakeOrderedAndProject
  // brute force (no corpus shuffle); the audit join is two 10-row
  // sets. At 100 TB the truth runs over a fixed query SAMPLE (the
  // same doc-sampling argument as llm_dedup_eval — recall is a corpus
  // statistic); here the corpus is the sample.
  // ---------------------------------------------------------------------
  private def annRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val q = e.where(col("vec_id") === 7)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val truth = e.where(col("vec_id") =!= 7)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosine(col("embedding"), col("qe"), col("nrm"), col("qn"))
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id")).withColumn("in_truth", lit(1))
    val pred = annIvf(spark, sfDir)
      .select(col("vec_id")).withColumn("in_pred", lit(1))
    truth.join(pred, Seq("vec_id"), "full_outer")
      .agg(
        count(col("in_truth")).as("k"),
        coalesce(sum(when(col("in_truth").isNotNull &&
          col("in_pred").isNotNull, 1L).otherwise(0L)), lit(0L)).as("n_hit"))
      .selectExpr("k", "n_hit",
        "CAST(n_hit * 1000000 DIV k AS BIGINT) AS recall_ppm")
  }

  // ---------------------------------------------------------------------
  // llm_matryoshka_rerank — two-stage retrieval over prefix
  // dimensions: stage 1 scores every vector on only the FIRST 16 of
  // 64 dims (the matryoshka property: nested-prefix embeddings keep
  // semantic order under truncation) and keeps the top-50 candidates
  // via TakeOrderedAndProject; stage 2 re-scores just those 50 with
  // the exact 64-dim cosine and emits the top-10. The scale story is
  // the read path: a column store laying out prefix dims separately
  // scans 4× fewer bytes for stage 1, and stage 2 touches a
  // candidate-sized set — the corpus never shuffles in either stage.
  // Emitting both scores makes the coarse→exact agreement auditable
  // row by row.
  // ---------------------------------------------------------------------
  private def matryoshkaRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
      .withColumn("pe", expr("slice(embedding, 1, 16)"))
      .withColumn("pn", l2norm(col("pe")))
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"),
        col("pe").as("qpe"), col("pn").as("qpn"))
    val cand = e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("qe"), col("qn"),
        cosine(col("pe"), col("qpe"), col("pn"), col("qpn"))
          .as("coarse_cosine"))
      .orderBy(col("coarse_cosine").desc, col("vec_id"))
      .limit(50)
    cand
      .select(col("vec_id"), col("coarse_cosine"),
        cosine(col("embedding"), col("qe"), col("nrm"), col("qn"))
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  // ---------------------------------------------------------------------
  // llm_ann_ivf_persisted — the IVF index AS A LAKE TABLE: cell
  // assignments are WRITTEN hive-partitioned by cell, so probing
  // becomes partition pruning — the nprobe cells are the only
  // directories the scan lists, the other 14/16 never produce IO.
  // This is how an ANN index actually lives at 100 TB: built once
  // (the partitioned write), probed forever by queries that touch
  // O(corpus/K · nprobe) bytes. The two probe-cell ids are computed
  // driver-side from the broadcast centroids (16 dot products — a
  // metadata-scale collect, same class as ANALYZE/zorder max) so they
  // reach the scan as literals Catalyst can prune on at planning
  // time. Identical assignment/probe semantics to `llm_ann_ivf` —
  // the two keys share one oracle by construction; PlanShapeSpec pins
  // the cell PartitionFilters.
  // ---------------------------------------------------------------------
  /** Map-side cell assignment for any (vec_id, embedding, …) frame —
    * shared by the batch index build and the streaming index
    * maintenance key (`stream_ann_index`): norm + argmax over the 16
    * broadcast-literal centroids, no shuffle. */
  private[graft] def assignCells(batch: DataFrame, k: Int): DataFrame =
    batch
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
      .withColumn("best", bestCent(col("embedding"), col("nrm"), k))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (-col("best.nid")).cast("int").as("cell"))

  /** Probe a hive-partitioned IVF index directory: the two probe-cell
    * ids are computed driver-side from the broadcast centroids with
    * the IDENTICAL sequential fold + (cos desc, cent_id asc)
    * tie-break as the in-plan probe, so every IVF key chooses the
    * same cells; they reach the scan as literals → partition pruning
    * (PlanShapeSpec pins it). */
  private[graft] def probeIvfIndex(spark: SparkSession, sfDir: String,
      dir: String): DataFrame =
    probeIvfIndex(spark, sfDir, Seq(dir))

  /** One DataFrame over a chain of hive-partitioned run dirs: each run
    * reads as its OWN base path and the branches union (a multi-path
    * read over sibling partitioned dirs trips Spark's
    * CONFLICTING_DIRECTORY_STRUCTURES base-path inference). Partition
    * filters push into every branch, so cell pruning holds per run. */
  private[graft] def readRuns(spark: SparkSession, dirs: Seq[String]): DataFrame =
    dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)

  /** Multi-dir form: a streamed index maintained as a CHAIN of run
    * directories (level-0 appends + size-tiered merges — the
    * Bentley–Saxe layout, r13) probes every live run; each run dir is
    * its own hive-partitioned base path, so the cell literals prune
    * partitions inside every run independently and the probe reads
    * O(live_runs · corpus/K · nprobe) bytes. Cell contents are a set —
    * which run a row lives in cannot affect the result, so the chained
    * index keeps sharing `llm_ann_ivf`'s oracle. */
  private[graft] def probeIvfIndex(spark: SparkSession, sfDir: String,
      dirs: Seq[String]): DataFrame = {
    val q = emb(spark, sfDir).where(col("vec_id") === 7)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val qRow = q.head()
    val (qe, qn) = (qRow.getSeq[Float](0), qRow.getDouble(1))
    val probed = (0 until ivfK(spark, sfDir))
      .map { c =>
        ((0 until 64).map(d => qe(d).toDouble * centSign(c, d)).sum
          / (qn * 8.0), c)
      }
      .sortBy { case (cos, c) => (-cos, c) }
      .take(2).map(_._2)
    readRuns(spark, dirs)
      .where(col("cell").isin(probed: _*) && col("vec_id") =!= 7)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        cosine(col("embedding"), col("qe"), col("nrm"), col("qn")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** The cell-partitioned on-disk IVF index, staged once per
    * (JVM, sfDir) — shared by `llm_ann_ivf_persisted` and
    * `llm_ann_ivfpq` (both probe it by partition pruning; the index
    * BUILD cost lives in the staging, exactly where a production
    * pipeline pays it). */
  private def ivfIndexDir(spark: SparkSession, sfDir: String): String =
    graft.etl.Fixtures.stagedDir(sfDir, "ivf_index") { d =>
      val k = ivfK(spark, sfDir)
      assignCells(
          widenForAssign(spark, t(spark, sfDir, "embeddings"), k), k)
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(d)
    }

  private def annIvfPersisted(spark: SparkSession, sfDir: String): DataFrame =
    probeIvfIndex(spark, sfDir, ivfIndexDir(spark, sfDir))

  // ---------------------------------------------------------------------
  // llm_ann_ivf_kmeans — IVF with DATA-DERIVED centroids: the real
  // index-build recipe (sample → k-means on the driver → broadcast),
  // demonstrating that the index BUILD scales, not just the probe. The
  // sample is a fixed deterministic subset (vec_id % 4 = 0); at 100 TB
  // the same shape samples ~10⁵ vectors — the collect is bounded by
  // the sample size, never the corpus, and the result ships to
  // executors as a few-KB broadcast literal. Every arithmetic step is
  // engine-portable so the DuckDB oracle REPLAYS the identical
  // iterations: dot products are sequential left folds, cluster means
  // are exact scaled-bigint sums (order-free), rounding is Spark's
  // HALF_UP via BigDecimal (= DuckDB round, proven across the suite),
  // and argmax ties break toward the smallest centroid id.
  //
  // Operating point: 16 cells, nprobe 8. This corpus is deliberately
  // near-isotropic (max pairwise cosine ~0.5, neighbors uncorrelated
  // with any cluster structure), so recall@k tracks the probed corpus
  // fraction for ANY centroids — nprobe is the recall/cost dial, which
  // is exactly how production IVF is tuned. LlmSpec pins recall@10
  // against both the exact top-10 and the parity-centroid twin.
  // ---------------------------------------------------------------------
  private val KmIters = 2
  // Index-build sample is a FIXED SIZE, not a fraction: at 100 TB a
  // fractional sample is a driver OOM by construction. 4096 × 64 doubles
  // ≈ 2 MB of driver memory regardless of corpus size.
  private val KmSampleN = 4096
  // Data-derived nlist under the same k ∝ N rule as [[ivfK]], capped at
  // KmSampleN/4 so the evenly-strided init always has ≥4 sample members
  // per centroid (a real pipeline growing k past that grows the sample
  // with it — the cap is the sample's honesty bound, not a tuning
  // choice). Oracle twin: greatest(16, least(count(*) // 125, 1024)).
  private def kmK(spark: SparkSession, sfDir: String): Int =
    math.min(ivfK(spark, sfDir), KmSampleN / 4)

  /** Sequential left fold dot product — the Scala twin of
    * [[graft.functions.DotProduct]] and DuckDB's list_reduce. */
  private def dfoldD(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** round(x * 1e8) exactly as Spark's Round expression computes it
    * (BigDecimal HALF_UP — half away from zero for either sign). */
  private def r8(x: Double): Long =
    BigDecimal.valueOf(x * 1.0e8)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  /** Deterministic sampled k-means: the sample is the KmSampleN vectors
    * with the smallest md5(vec_id) — a pseudo-random but fully
    * deterministic choice that both engines can replay, executed as
    * TakeOrderedAndProject (per-partition top-N, driver merges only N
    * rows — O(N·dim) driver memory at ANY corpus size). Init = KmK
    * evenly-strided sample members by vec_id rank, then KmIters Lloyd
    * rounds (cosine assignment, scaled-bigint means; an empty cell keeps
    * its previous centroid). Returns (centroid, its L2 norm) pairs. */
  /** The bounded index-build sample as a DataFrame — exposed so
    * PlanShapeSpec can pin that it plans as TakeOrderedAndProject
    * (per-partition top-N; a regression to a global sort + collect
    * would be the 100 TB driver-OOM shape this replaced). */
  private[graft] def kmSampleDF(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(KmSampleN)

  private[graft] def kmeansCentroids(spark: SparkSession, sfDir: String)
      : Array[(Array[Double], Double)] = {
    val k = kmK(spark, sfDir)
    val sample: Array[Array[Double]] =
      kmSampleDF(spark, sfDir)
        .collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    val stride = sample.length / k
    require(stride >= 1, s"sample too small for $k centroids")
    var cents: Array[Array[Double]] =
      Array.tabulate(k)(i => sample(i * stride))
    val sNrm = sample.map(v => math.sqrt(dfoldD(v, v)))
    (1 to KmIters).foreach { _ =>
      val cNrm = cents.map(c => math.sqrt(dfoldD(c, c)))
      val sums = Array.fill(k, 64)(0L)
      val counts = Array.fill(k)(0L)
      sample.zipWithIndex.foreach { case (v, si) =>
        var best = 0
        var bestCos = Double.NegativeInfinity
        var c = 0
        while (c < k) { // strict > = ties toward the smallest id
          val cos = dfoldD(v, cents(c)) / (sNrm(si) * cNrm(c))
          if (cos > bestCos) { bestCos = cos; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < 64) { sums(best)(d) += r8(v(d)); d += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0L) cents(c)
        else Array.tabulate(64)(d =>
          sums(c)(d).toDouble / 1.0e8 / counts(c).toDouble)
      }
    }
    cents.map(c => (c, math.sqrt(dfoldD(c, c))))
  }

  /** Scores array over data-derived centroids — same struct/argmax
    * semantics as [[centScores]] (ties toward the smallest id), same
    * k-independent codegen kernel ([[graft.functions.CentroidScores]]). */
  private def kmScores(cents: Array[(Array[Double], Double)],
                       embCol: Column, nrmCol: Column): Column =
    graft.functions.VectorOps.centroidScores(embCol, nrmCol,
      cents.map(_._1), cents.map(_._2))

  /** Fused-argmax twin of [[kmScores]] for the corpus-side assignment
    * — same rationale as [[bestCent]]. */
  private def kmBest(cents: Array[(Array[Double], Double)],
                     embCol: Column, nrmCol: Column): Column =
    graft.functions.VectorOps.bestCentroid(embCol, nrmCol,
      cents.map(_._1), cents.map(_._2))

  private def annIvfKmeans(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = kmeansCentroids(spark, sfDir)
    val e = emb(spark, sfDir)
    val assigned = widenForAssign(spark, e, cents.length)
      .withColumn("best", kmBest(cents, col("embedding"), col("nrm")))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (-col("best.nid")).cast("int").as("cell"))
    val q = e.where(col("vec_id") === 7)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
      .withColumn("scored",
        sort_array(kmScores(cents, col("qe"), col("qn")), asc = false))
      .select(col("qe"), col("qn"),
        expr(s"transform(slice(scored, 1, 8), s -> cast(-s.nid as int))")
          .as("probed"))
    assigned.crossJoin(broadcast(q))
      .where(array_contains(col("probed"), col("cell")) &&
        col("vec_id") =!= 7)
      .select(col("vec_id"), col("cell"),
        cosine(col("embedding"), col("qe"), col("nrm"), col("qn")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  // ---------------------------------------------------------------------
  // llm_vector_mean — per-label mean embedding as a declarative plan:
  // explode to (label, pos, value), aggregate each coordinate in
  // 1e-8-granule integers (order-independent ⇒ deterministic under any
  // shuffle), reassemble the ordered vector. This is the oracle-checked
  // twin of the Aggregator below. The final projection serializes the
  // vector to a CSV of re-scaled bigints (the driver's pandas harness
  // cannot hash raw array columns); both engines compute the identical
  // double m, so the re-scaling rounds identically.
  // ---------------------------------------------------------------------
  private val meanVecCsv = OracleFmt.csvScaled("raw_vec")

  private def vectorMean(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      // Scale each float to an exact 1e-8-granule integer FIRST (the
      // double multiply + half-away rounding is identical in every
      // engine), then sum integers: order-independent AND portable —
      // unlike float→decimal casts, whose rounding is engine-specific.
      .selectExpr("label", "pos",
        "cast(round(cast(v as double) * cast(100000000 as double)) as bigint) AS vs")
      .groupBy("label", "pos")
      .agg((sum(col("vs")).cast("double") / lit(100000000).cast("double") /
              count(lit(1))).as("m"),
        count(lit(1)).as("n"))
      .groupBy("label")
      .agg(max(col("n")).as("n_vecs"),
        expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
          .as("raw_vec"))
      .select(col("label"), col("n_vecs"), expr(meanVecCsv).as("mean_vec"))
      .orderBy("label")

  // ---------------------------------------------------------------------
  // agg_custom_vector_mean — the same semantics as a custom typed
  // Aggregator (the UDAF surface, SURVEY.md §2-J). The input is
  // pre-scaled to 1e-8-granule bigints by the SAME Catalyst round()
  // used by the declarative twin, so the Aggregator sums longs:
  // order-independent ⇒ deterministic under any shuffle ⇒ fully
  // oracle-checkable (identical doubles to llm_vector_mean). finish()
  // divides back in the same operation order as the declarative plan.
  // ---------------------------------------------------------------------
  case class VecBuf(sum: Array[Long], n: Long)

  object VectorMeanAgg extends Aggregator[Seq[Long], VecBuf, Seq[Double]] {
    def zero: VecBuf = VecBuf(Array.empty, 0L)
    def reduce(b: VecBuf, a: Seq[Long]): VecBuf = {
      val s = if (b.sum.isEmpty) new Array[Long](a.length) else b.sum
      var i = 0
      while (i < a.length) { s(i) += a(i); i += 1 }
      VecBuf(s, b.n + 1)
    }
    def merge(x: VecBuf, y: VecBuf): VecBuf =
      if (x.sum.isEmpty) y
      else if (y.sum.isEmpty) x
      else {
        val s = x.sum.clone()
        var i = 0
        while (i < s.length) { s(i) += y.sum(i); i += 1 }
        VecBuf(s, x.n + y.n)
      }
    // same op order as the declarative twin: (S → double) / 1e8 / n
    def finish(b: VecBuf): Seq[Double] =
      b.sum.map(s => s.toDouble / 1e8 / b.n).toSeq
    def bufferEncoder: Encoder[VecBuf] = ExpressionEncoder[VecBuf]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  private def customVectorMean(spark: SparkSession, sfDir: String): DataFrame = {
    val vecMean = udaf(VectorMeanAgg, ExpressionEncoder[Seq[Long]]())
    t(spark, sfDir, "embeddings")
      .selectExpr("label",
        """transform(embedding, v ->
             cast(round(cast(v as double) * cast(100000000 as double))
                  as bigint)) AS scaled""")
      .groupBy("label")
      .agg(vecMean(col("scaled")).as("raw_vec"),
        count(lit(1)).as("n_vecs"))
      .select(col("label"), expr(meanVecCsv).as("mean_vec"), col("n_vecs"))
      .orderBy("label")
  }

  // ---------------------------------------------------------------------
  // llm_embedding_quantize — per-vector symmetric int8 quantization
  // (the storage/serving compression step: 4× smaller than float32,
  // ~0.4% mean abs error at 64 dims): scale = max|v|, q = round(v /
  // scale * 127). Everything is array lambdas inside the scan
  // projection — zero shuffle — and every float op is order-fixed, so
  // quantized codes and reconstruction error are engine-portable. The
  // corpus has no all-zero vectors (scale > 0 guaranteed by the norm
  // used everywhere else in this module).
  // ---------------------------------------------------------------------
  private def embeddingQuantize(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "embedding",
        """aggregate(embedding, cast(0 as double),
             (acc, v) -> greatest(acc, abs(cast(v as double)))) AS scale""")
      .selectExpr("vec_id", "embedding", "scale",
        """transform(embedding,
             v -> cast(round(cast(v as double) / scale * cast(127 as double))
                       as int)) AS q""")
      .selectExpr("vec_id", "scale",
        "concat_ws(',', transform(q, x -> cast(x as string))) AS q_csv",
        """aggregate(zip_with(embedding, q,
             (v, x) -> abs(cast(v as double)
                           - cast(x as double) * scale / cast(127 as double))),
             cast(0 as double), (acc, e) -> acc + e)
           / cast(64 as double) AS mean_abs_err""")
      .orderBy("vec_id")

  // ---------------------------------------------------------------------
  // llm_embedding_pq — product quantization (the 100 TB ANN memory
  // story: int8 gives 4×, PQ gives 32× — 64 float32 dims become 4
  // byte-codes + a shared codebook). The 64-dim vector splits into
  // M=4 16-dim subvectors; each is assigned the argmax-dot centroid
  // from its subspace's K=16 codebook (centroids are deterministic
  // md5-parity signs scaled to unit norm — same construction the IVF
  // cells use — so the oracle replays assignment bit-for-bit; ties
  // break toward the smallest code). Reconstruction error comes free
  // from the dots already computed: ||v−c||² = ||v||² − 2·v·c + 1 per
  // subspace, chained in fixed m order so the double is engine-exact.
  // Everything is a map-side projection over the scan — zero shuffle,
  // 64 16-dim dots per vector (the same arithmetic as one IVF assign).
  // ---------------------------------------------------------------------
  private val PqM = 4
  private val PqK = 16
  private val PqSub = 16

  /** Deterministic PQ centroid component (subspace m, code k, dim d):
    * md5-parity sign × 0.25, so every centroid has norm exactly
    * sqrt(16)·0.25 = 1.0. */
  private def pqSign(m: Int, k: Int, d: Int): Double =
    OracleFmt.mdParitySign(s"pq_${m}_${k}_$d") * 0.25

  private def pqCentArr(m: Int, k: Int): Column =
    typedLit(Seq.tabulate(PqSub)(d => pqSign(m, k, d)))

  /** Per-subspace best (dot, code): array_max over struct(dot, -k)
    * picks the max dot, ties toward the SMALLEST code id. */
  private def pqBest(sub: Column, m: Int): Column =
    array_max(array((0 until PqK).map { k =>
      struct(dot(sub, pqCentArr(m, k)).as("d"), lit(-k).as("nid"))
    }: _*))

  /** Adds sub_m / best_m / code_m columns to any DataFrame carrying an
    * `embedding` column — shared by the PQ encoder, the ADC search,
    * and the IVF+PQ composition. */
  private def pqCodes(df: DataFrame): DataFrame = {
    val withSubs = (0 until PqM).foldLeft(df) { (d, m) =>
      d.withColumn(s"sub_$m", slice(col("embedding"), m * PqSub + 1, PqSub))
    }
    (0 until PqM).foldLeft(withSubs) { (d, m) =>
      d.withColumn(s"best_$m", pqBest(col(s"sub_$m"), m))
        .withColumn(s"code_$m", (-col(s"best_$m.nid")).cast("int"))
    }
  }

  private def pqCoded(spark: SparkSession, sfDir: String): DataFrame =
    pqCodes(t(spark, sfDir, "embeddings"))

  private def embeddingPq(spark: SparkSession, sfDir: String): DataFrame = {
    val errM = (0 until PqM).map { m =>
      dot(col(s"sub_$m"), col(s"sub_$m")) - lit(2.0) * col(s"best_$m.d") +
        lit(1.0)
    }
    pqCoded(spark, sfDir)
      .select(Seq(col("vec_id")) ++
        (0 until PqM).map(m => col(s"code_$m")) :+
        round(errM.reduceLeft(_ + _) * lit(1.0e8)).cast("bigint")
          .as("err_e8"): _*)
      .orderBy("vec_id")
  }

  // ---------------------------------------------------------------------
  // llm_ann_pq_adc — asymmetric-distance (ADC) search over the PQ
  // codes: the query stays full-precision, each subspace's 16
  // query-to-centroid dots are precomputed ONCE on the driver (4×16
  // doubles — the classic distance table) and shipped as a broadcast
  // literal; scoring a corpus vector is then 4 table lookups + 3 adds
  // instead of a 64-dim dot — the arithmetic shape that makes
  // billion-vector scans cheap. The plan is the ANN house style:
  // map-side code assignment + lookup, TakeOrderedAndProject top-10,
  // zero pre-top-k exchange. Lookup-table entries and the final sum
  // chain are fixed-order folds, so scores are engine-exact.
  // ---------------------------------------------------------------------
  /** Driver-computed ADC distance table for a query vector: 4×16
    * query-to-centroid dots, each a sequential fold over 16 dims —
    * the same fold order as [[graft.functions.DotProduct]] and the
    * oracle's list_reduce. */
  private def pqDistTable(qe: Seq[Float]): Seq[Seq[Double]] =
    (0 until PqM).map { m =>
      (0 until PqK).map { k =>
        var acc = 0.0
        var d = 0
        while (d < PqSub) { acc += qe(m * PqSub + d).toDouble * pqSign(m, k, d); d += 1 }
        acc
      }
    }

  /** ADC score column: 4 table lookups chained in fixed m order. */
  private def pqAdcScore(dist: Seq[Seq[Double]]): Column =
    (0 until PqM).map { m =>
      element_at(typedLit(dist(m)), col(s"code_$m") + 1)
    }.reduceLeft(_ + _)

  private def annPqAdc(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val qRow = e.where(col("vec_id") === 7).select(col("embedding")).head()
    val dist = pqDistTable(qRow.getSeq[Float](0))
    pqCoded(spark, sfDir)
      .where(col("vec_id") =!= 7)
      .select(col("vec_id"), pqAdcScore(dist).as("adc_score"))
      .orderBy(col("adc_score").desc, col("vec_id"))
      .limit(10)
  }

  // ---------------------------------------------------------------------
  // llm_ann_ivfpq — THE production billion-vector architecture: IVF
  // cell pruning composed with PQ/ADC scoring (what FAISS calls
  // IVFPQ). The query picks its top-2 cells against the 16 IVF
  // centroids (driver-side, metadata-sized — same probe rule as
  // llm_ann_ivf), only vectors assigned to those cells are scored,
  // and scoring is the 4-lookup ADC form, never a full-precision dot.
  // At 100 TB the two stages multiply: nprobe/K of the corpus is
  // READ (partition pruning when the index is persisted by cell, as
  // llm_ann_ivf_persisted stages it), and each read vector costs 4
  // adds — memory 32× down, compute ~16× down, recall set by nprobe.
  // Map-side assignment + filter + lookup, TakeOrderedAndProject
  // top-10: zero pre-top-k exchange, same pinned shape as the other
  // ANN probes.
  // ---------------------------------------------------------------------
  private def annIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    val k = ivfK(spark, sfDir)
    val e = emb(spark, sfDir)
    val qRow = e.where(col("vec_id") === 7)
      .select(col("embedding"), col("nrm")).head()
    val qe = qRow.getSeq[Float](0)
    val qn = qRow.getDouble(1)
    val probed = (0 until k)
      .map { c =>
        ((0 until 64).map(d => qe(d).toDouble * centSign(c, d)).sum
          / (qn * 8.0), c)
      }
      .sortBy { case (cos, c) => (-cos, c) }
      .take(2).map(_._2)
    val dist = pqDistTable(qe)
    // probe the STAGED cell-partitioned index (shared with
    // llm_ann_ivf_persisted) instead of re-deriving the assignment
    // in-plan: the doc above names partition pruning as the 100 TB
    // read path, and the in-plan form paid the O(k·dim) argmax on the
    // whole corpus per query — the cost that belongs to the index
    // BUILD, measured where it happens (the staging + llm_ann_ivf).
    pqCodes(spark.read.parquet(ivfIndexDir(spark, sfDir))
        .where(col("cell").isin(probed: _*) && col("vec_id") =!= 7))
      .select(col("vec_id"), col("cell"), pqAdcScore(dist).as("adc_score"))
      .orderBy(col("adc_score").desc, col("vec_id"))
      .limit(10)
  }

  // ---------------------------------------------------------------------
  // llm_multimodal_passthrough — opaque binary payloads with typed
  // metadata carried through filter/projection: the payload here is a
  // deterministic 16-byte fake (md5 of the text) standing in for image
  // bytes; what is being verified is that binary columns + struct
  // metadata survive the relational plumbing byte-exactly.
  // ---------------------------------------------------------------------
  private def multimodalPassthrough(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .selectExpr("doc_id", "lang", "source",
        "unhex(md5(text)) AS payload",
        "named_struct('width', cast(n_chars % 64 + 1 as int)," +
          " 'height', cast(n_chars DIV 64 + 1 as int)," +
          " 'fmt', 'fake/rgb8') AS meta")
      .where(col("lang") =!= "zh")
      .selectExpr("doc_id", "lang", "source",
        "length(payload) AS byte_len",
        "hex(payload) AS payload_hex",
        "meta.width AS width", "meta.height AS height", "meta.fmt AS fmt")
      .orderBy("doc_id")

  // ---------------------------------------------------------------------
  // llm_multimodal_features — the decode/feature-extract stage: a REAL
  // image decode over real image-format bytes. The fixture stages one
  // binary-format P6 PPM (netpbm) image per document — magic, optional
  // `#` comment line, ASCII dimensions, maxval, raw RGB payload — and
  // the query parses that format with a from-scratch decoder in a
  // per-partition pass (mapPartitions — the Scala analogue of
  // arrow-batched Python UDFs; at 100 TB this stage is the same shape
  // with a JPEG/PNG library in place of `decodePpm`). Pixel bytes
  // follow (s + i) mod 256 with s = (doc_id*131) mod 256, so the
  // DuckDB oracle checks the decode ANALYTICALLY: the pixel sum of a
  // cyclic ramp has a closed form, and the header length is integer
  // arithmetic on doc_id — any parser error (mis-read header, skipped
  // comment, wrong stride, truncation) breaks the hash match.
  // ---------------------------------------------------------------------
  case class MmFeat(doc_id: Long, width: Int, height: Int, n_bytes: Int,
                    pixel_sum: Long, brightness: Double)

  /** Synthesize a valid binary P6 PPM for a document: every fifth image
    * carries a comment line (the parser must skip it), width needs 1 or
    * 2 digits (the parser must tokenize, not fix offsets). */
  private[graft] def ppmBytes(docId: Long): Array[Byte] = {
    val w = (docId % 16 + 1).toInt
    val h = (docId % 8 + 1).toInt
    val comment = if (docId % 5 == 0) "# graft ppm fixture\n" else ""
    val header = s"P6\n$comment$w $h\n255\n".getBytes("US-ASCII")
    val s0 = ((docId * 131) % 256).toInt
    header ++ Array.tabulate(3 * w * h)(i => ((s0 + i) % 256).toByte)
  }

  /** Dependency-free P6 PPM header parse per the netpbm spec:
    * whitespace-separated ASCII header tokens, `#`-to-newline comments
    * legal anywhere in the header, exactly one whitespace byte between
    * the maxval and the binary pixel payload. Returns (width, height,
    * pixel-payload offset) and throws on malformed input — a decode
    * stage that silently passes garbage downstream poisons a training
    * corpus. Shared by the feature extractor and the perceptual-hash
    * key so the two can never parse the format differently. */
  private[graft] def ppmHeader(img: Array[Byte]): (Int, Int, Int) = {
    var pos = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\t' || b == '\r'
    def token(): String = {
      while (pos < img.length && (isWs(img(pos)) || img(pos) == '#')) {
        if (img(pos) == '#') while (pos < img.length && img(pos) != '\n') pos += 1
        else pos += 1
      }
      val st = pos
      while (pos < img.length && !isWs(img(pos))) pos += 1
      new String(img, st, pos - st, "US-ASCII")
    }
    require(token() == "P6", "not a binary PPM (P6) stream")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(maxval == 255, s"unsupported maxval $maxval (8-bit only)")
    pos += 1 // the single whitespace byte terminating the header
    require(img.length - pos == 3 * w * h,
      s"pixel payload ${img.length - pos} bytes, expected ${3 * w * h}")
    (w, h, pos)
  }

  private[graft] def decodePpm(img: Array[Byte]): (Int, Int, Long) = {
    val (w, h, off) = ppmHeader(img)
    var sum = 0L
    var pos = off
    while (pos < img.length) { sum += (img(pos) & 0xff); pos += 1 }
    (w, h, sum)
  }

  /** 64-bit perceptual difference-hash (dHash) of a decoded PPM,
    * packed as 4×16-bit band integers (the same layout every hamming
    * tier in this engine joins on): nearest-neighbor sample the image
    * on a 9×8 grid, compare horizontally adjacent sample brightnesses
    * (channel SUM — no division, so the hash is exact integer
    * arithmetic end to end), one bit per comparison, MSB-first within
    * each band. */
  private[graft] def dhashBands(img: Array[Byte]): Array[Long] = {
    val (w, h, off) = ppmHeader(img)
    def s(p: Int): Int =
      (img(off + 3 * p) & 0xff) + (img(off + 3 * p + 1) & 0xff) +
        (img(off + 3 * p + 2) & 0xff)
    val bands = new Array[Long](4)
    var k = 0
    while (k < 64) {
      val x = k % 8
      val gy = (k / 8) * h / 8
      val bit = if (s(gy * w + (x + 1) * w / 9) > s(gy * w + x * w / 9)) 1L
                else 0L
      bands(k / 16) = bands(k / 16) * 2 + bit
      k += 1
    }
    bands
  }

  private def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = graft.etl.Fixtures.stagedPersisted(spark, sfDir, "ppm_images") {
      dir =>
        t(spark, sfDir, "documents").select("doc_id").as[Long]
          .mapPartitions(it => it.map(id => (id, ppmBytes(id))))
          .toDF("doc_id", "img")
          .write.mode("overwrite").parquet(dir)
    }
    imgs.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, img) =>
        val (w, h, sum) = decodePpm(img)
        MmFeat(id, w, h, img.length, sum, sum.toDouble / (3.0 * w * h))
      }
    }.toDF().orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // llm_multimodal_phash — perceptual-hash IMAGE DEDUP over the real
  // decode path: the visual analogue of llm_dedup_exact, and the op
  // every multimodal curation pipeline runs before training (resized
  // re-encodes of one image must collapse to one kept exemplar). Each
  // staged P6 PPM is decoded by the shared [[ppmHeader]] parser and
  // reduced to a 64-bit dHash ([[dhashBands]] — 9×8 nearest-neighbor
  // sample grid, adjacent-brightness comparisons, exact integer
  // arithmetic), then images group by hash: one output row per
  // distinct perceptual hash with its multiplicity and the smallest
  // doc_id as the kept exemplar. Scale shape: decode+hash are pure
  // per-row map work (mapPartitions, the arrow-batch analogue); the
  // dedup is ONE groupBy keyed by the 4 band ints whose output is
  // bounded by distinct-hash cardinality, not corpus size. A
  // hamming ≤ k near-dup tier composes directly: the 4×16-bit bands
  // are the same pigeonhole layout the SimHash pair join buckets on.
  // The DuckDB oracle replays the hash ANALYTICALLY from the fixture
  // generator's closed form (pixel byte i = (s0+i) mod 256), so any
  // decode or sampling-grid error breaks the match.
  // ---------------------------------------------------------------------
  private def multimodalPhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = graft.etl.Fixtures.stagedPersisted(spark, sfDir, "ppm_images") {
      dir =>
        t(spark, sfDir, "documents").select("doc_id").as[Long]
          .mapPartitions(it => it.map(id => (id, ppmBytes(id))))
          .toDF("doc_id", "img")
          .write.mode("overwrite").parquet(dir)
    }
    imgs.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, img) =>
        val b = dhashBands(img)
        (id, b(0), b(1), b(2), b(3))
      }
    }.toDF("doc_id", "b0", "b1", "b2", "b3")
      .groupBy("b0", "b1", "b2", "b3")
      .agg(count(lit(1)).as("n_images"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy("keep_doc_id")
  }

  // ---------------------------------------------------------------------
  // llm_multimodal_consistency — CROSS-MODAL pair filtering
  // (VERDICT r10 #4b): the LAION-style "does this caption match this
  // image" gate that decides which (image, text) pairs survive into a
  // training set. Production scores pairs with a CLIP cosine and drops
  // below a threshold; here both encoders are the engine's
  // deterministic stand-ins — the image side is the REAL decode path
  // (staged P6 PPM → shared ppmHeader parse → 64-bit dHash, exactly
  // llm_multimodal_phash's pipeline), the text side is the REAL
  // caption fingerprint (TextExpr.SimHashBands over the doc's tokens,
  // exactly llm_dedup_simhash's) — and agreement is the bitwise
  // overlap of the two 64-bit signatures. The PLUMBING is the product
  // (per the multimodal stub convention): decode + two per-row
  // encoders + one id-keyed join + codegen'd bit_count(xor) hamming +
  // threshold verdict, with NO exchange wider than the id join and
  // one row out per pair at any corpus size. Swapping the stand-in
  // encoders for real CLIP towers changes the two map stages and
  // nothing else.
  //
  // Engine parity: image bits replay analytically from the fixture's
  // closed form (the phash oracle's device), caption bits from the
  // shared DSimhashFp fold; the oracle compares the two 64-char bit
  // strings position-wise — bit-identical to the integer band XOR
  // because both renderings are MSB-first 16-bit bands (the simhash
  // key's lpad(bin) equivalence, pinned by ExtensionsSpec).
  // ---------------------------------------------------------------------
  private def multimodalConsistency(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val imgs = graft.etl.Fixtures.stagedPersisted(spark, sfDir, "ppm_images") {
      dir =>
        t(spark, sfDir, "documents").select("doc_id").as[Long]
          .mapPartitions(it => it.map(id => (id, ppmBytes(id))))
          .toDF("doc_id", "img")
          .write.mode("overwrite").parquet(dir)
    }
    val ihash = imgs.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, img) =>
        val b = dhashBands(img)
        (id, b(0), b(1), b(2), b(3))
      }
    }.toDF("doc_id", "ib0", "ib1", "ib2", "ib3")
    val caps = graft.queries.LlmText.simhashFp(spark, sfDir)
      .select(col("doc_id"), col("bands"))
    ihash.join(caps, Seq("doc_id"))
      .selectExpr("doc_id",
        """CAST(bit_count(ib0 ^ element_at(bands, 1)) +
                bit_count(ib1 ^ element_at(bands, 2)) +
                bit_count(ib2 ^ element_at(bands, 3)) +
                bit_count(ib3 ^ element_at(bands, 4)) AS BIGINT) AS hamming""")
      .selectExpr("doc_id", "hamming",
        "64 - hamming AS agreement_bits",
        "hamming <= 26 AS consistent")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // llm_multimodal_framesample — the video-side plumbing: a "video" is
  // an array of opaque frame payloads (synthesized deterministically
  // here — a real pipeline gets them from a container demuxer); frame
  // sampling is pure array arithmetic (every 3rd frame), so it runs
  // inside the scan projection with no shuffle and no decode. The
  // sampled frames' fingerprint verifies byte-exact payload handling.
  // ---------------------------------------------------------------------
  private def multimodalFrameSample(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .selectExpr("doc_id", "cast(doc_id % 10 + 5 as int) AS n_frames")
      .selectExpr("doc_id", "n_frames",
        """transform(sequence(0, n_frames - 1),
             i -> unhex(md5(concat(cast(doc_id as string), '#f',
                                   cast(i as string))))) AS frames""")
      .selectExpr("doc_id", "n_frames",
        """transform(sequence(0, n_frames - 1, 3),
             i -> element_at(frames, i + 1)) AS sampled""")
      .selectExpr("doc_id", "n_frames",
        "size(sampled) AS n_sampled",
        """md5(concat_ws('', transform(sampled, f -> hex(f)))) AS sample_fp""")
      .orderBy("doc_id")

  // ---------------------------------------------------------------------
  // llm_multimodal_audio — audio-side feature extraction: a 64-sample
  // "waveform" per document (synthesized deterministically — a real
  // pipeline would decode PCM here), reduced to RMS energy and a
  // zero-crossing count. Both features are pure array arithmetic with
  // order-fixed folds, so they run inside the scan projection and are
  // engine-portable like every other fold in this module.
  // ---------------------------------------------------------------------
  private def multimodalAudio(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .selectExpr("doc_id",
        """transform(sequence(0, 63), i ->
             (instr('0123456789abcdef',
                    substring(md5(concat(cast(doc_id as string), '#a',
                                         cast(i as string))), 1, 1)) - 1)
             / cast(7.5 as double) - cast(1 as double)) AS wave""")
      .selectExpr("doc_id",
        "size(wave) AS n_samples",
        """sqrt(aggregate(wave, cast(0 as double),
                (acc, v) -> acc + v * v) / cast(64 as double)) AS rms""",
        """size(filter(zip_with(slice(wave, 1, 63), slice(wave, 2, 63),
                               (a, b) -> a * b < cast(0 as double)),
                       x -> x)) AS n_zero_crossings""")
      .orderBy("doc_id")

  // ---------------------------------------------------------------------
  // llm_ann_hamming — 1-bit (sign) quantized ANN: each 64-dim vector
  // compresses to TWO 32-bit sign words (16 bytes vs 256 — a 16×
  // smaller coarse index; two words rather than one 64-bit code because
  // bit 63 would need 1<<63, which strict-overflow engines reject).
  // The coarse pass scans only the code columns — a map-side projection
  // feeding TakeOrderedAndProject on (hamming, vec_id), so the float
  // payload never moves — then the 50 survivors re-attach their
  // embeddings for the exact-cosine rerank and final top-10. At 100 TB
  // the code table is the only full scan; hamming is two XOR+popcounts
  // inside whole-stage codegen.
  // ---------------------------------------------------------------------
  private def signWord(lowBit: Int): String =
    s"""aggregate(sequence(0, 31), cast(0 as bigint),
         (acc, d) -> acc + IF(element_at(embedding, d + ${lowBit + 1})
                              >= cast(0 as double),
                              shiftleft(cast(1 as bigint), d),
                              cast(0 as bigint)))"""

  private def annHamming(spark: SparkSession, sfDir: String): DataFrame = {
    val codes = t(spark, sfDir, "embeddings")
      .selectExpr("vec_id", s"${signWord(0)} AS code_lo",
        s"${signWord(32)} AS code_hi")
    val q = codes.where(col("vec_id") === 0)
      .select(col("code_lo").as("q_lo"), col("code_hi").as("q_hi"))
    val coarse = codes.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .selectExpr("vec_id",
        """cast(bit_count(code_lo ^ q_lo) + bit_count(code_hi ^ q_hi)
           as int) AS hamming""")
      .orderBy(col("hamming"), col("vec_id"))
      .limit(50)
    val e = emb(spark, sfDir)
    val qv = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    coarse.join(e, "vec_id").crossJoin(broadcast(qv))
      .select(col("vec_id"), col("hamming"),
        cosine(col("embedding"), col("qe"), col("nrm"), col("qn"))
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  // ---------------------------------------------------------------------
  // llm_retrieval_rrf — hybrid retrieval: reciprocal-rank fusion
  // (Cormack et al. 2009) of the BM25 text ranking (LlmText.bm25Score,
  // same 3-term query) and the dense cosine ranking against query
  // vector 0, joined on id (doc_id = vec_id in the corpus). Each side
  // reduces to its top-20 FIRST via TakeOrderedAndProject — the
  // distributed operator — and only then gets row_number'd (a 20-row
  // single-partition window, constant work at any corpus size). Fused
  // score = Σ 1/(60 + rank) over the sides that ranked the id; a doc
  // ranked by only one retriever still scores (the whole point of RRF
  // — evidence sources need not overlap).
  // ---------------------------------------------------------------------
  private def retrievalRrf(spark: SparkSession, sfDir: String): DataFrame = {
    val txt = LlmText.bm25Score(spark, sfDir)
      .orderBy(col("score").desc, col("doc_id")).limit(20)
      .withColumn("rank_text", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("bigint"))
      .select(col("doc_id").as("id"), col("rank_text"))
    val e = emb(spark, sfDir)
    val qv = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val vec = e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        cosine(col("embedding"), col("qe"), col("nrm"), col("qn"))
          .as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(20)
      .withColumn("rank_vec", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))).cast("bigint"))
      .select(col("vec_id").as("id"), col("rank_vec"))
    txt.join(vec, Seq("id"), "full_outer")
      .selectExpr("id", "rank_text", "rank_vec",
        """coalesce(cast(1 as double) / (cast(60 as double) + rank_text),
                    cast(0 as double)) +
           coalesce(cast(1 as double) / (cast(60 as double) + rank_vec),
                    cast(0 as double)) AS rrf_score""")
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(20)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_ann_hamming" -> (annHamming _),
    "llm_retrieval_rrf" -> (retrievalRrf _),
    "llm_multimodal_audio" -> (multimodalAudio _),
    "llm_multimodal_framesample" -> (multimodalFrameSample _),
    "llm_cosine_pair" -> (cosinePair _),
    "llm_topk_similarity" -> (topkSimilarity _),
    "llm_embed_neardup" -> (embedNeardup _),
    "llm_ann_lsh" -> (annLsh _),
    "llm_ann_lsh_persisted" -> (annLshPersisted _),
    "llm_ann_lsh_tune" -> (annLshTune _),
    "llm_ann_lsh_tune_bits" -> (annLshTuneBits _),
    "llm_ann_lsh_tune_wide" -> (annLshTuneWide _),
    "llm_ann_lsh_tune_xl" -> (annLshTuneXl _),
    "llm_ann_lsh_planted" -> (annLshPlanted _),
    "llm_hard_negatives" -> (hardNegatives _),
    "llm_embed_neardup_lsh" -> (embedNeardupLsh _),
    "llm_bitext_margin" -> (bitextMargin _),
    "llm_embed_cluster" -> (embedCluster _),
    "llm_cluster_coherence" -> (clusterCoherence _),
    "llm_ann_ivf" -> (annIvf _),
    "llm_ann_range" -> (annRange _),
    "llm_ann_batch_queries" -> (annBatchQueries _),
    "llm_embedding_stats" -> (embeddingStats _),
    "llm_embedding_pca" -> (embeddingPca _),
    "llm_cluster_outliers" -> (clusterOutliers _),
    "llm_ann_recall" -> (annRecall _),
    "llm_matryoshka_rerank" -> (matryoshkaRerank _),
    "llm_ann_ivf_persisted" -> (annIvfPersisted _),
    "llm_ann_ivf_kmeans" -> (annIvfKmeans _),
    "llm_semdedup" -> (semDedup _),
    "llm_embedding_pq" -> (embeddingPq _),
    "llm_ann_pq_adc" -> (annPqAdc _),
    "llm_ann_ivfpq" -> (annIvfPq _),
    "llm_embedding_quantize" -> (embeddingQuantize _),
    "llm_vector_mean" -> (vectorMean _),
    "agg_custom_vector_mean" -> (customVectorMean _),
    "llm_multimodal_passthrough" -> (multimodalPassthrough _),
    "llm_multimodal_features" -> (multimodalFeatures _),
    "llm_multimodal_phash" -> (multimodalPhash _),
    "llm_multimodal_consistency" -> (multimodalConsistency _))

  /** Power-iteration oracle — DuckDB re-runs the identical 3 unrolled
    * iterations over the identical integer-centered matrix (same
    * rounding points, same max-abs normalization). */
  private val PcaOracle: String = {
    def iter(i: Int, wPrev: String): String =
      s"""dots$i AS (
            SELECT vec_id,
                   CAST(round(CAST(sum(c * w) AS DOUBLE) / 1000000.0)
                     AS BIGINT) AS ds
            FROM centered JOIN $wPrev USING (dim) GROUP BY vec_id),
          g$i AS (SELECT dim, CAST(sum(ds * c) AS BIGINT) AS g
                  FROM centered JOIN dots$i USING (vec_id) GROUP BY dim),
          mx$i AS (SELECT CAST(max(abs(g)) AS BIGINT) AS mx FROM g$i),
          w$i AS (SELECT dim, CAST(round(1000.0 * CAST(g AS DOUBLE) /
                       CAST(greatest(mx, 1) AS DOUBLE)) AS BIGINT) AS w
                  FROM g$i CROSS JOIN mx$i)"""
    s"""WITH quant AS (
          SELECT vec_id, d.d AS dim,
                 CAST(round(CAST(embedding[d.d + 1] AS DOUBLE) * 1000000)
                   AS BIGINT) AS v
          FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS d) d),
        mu AS (SELECT dim, CAST(round(CAST(sum(v) AS DOUBLE) /
                      CAST(count(*) AS DOUBLE)) AS BIGINT) AS mu
               FROM quant GROUP BY dim),
        centered AS (SELECT vec_id, dim, v - mu AS c
                     FROM quant JOIN mu USING (dim)),
        w0 AS (SELECT dim, CAST(1000 AS BIGINT) AS w FROM mu),
        ${iter(1, "w0")},
        ${iter(2, "w1")},
        ${iter(3, "w2")},
        lamd AS (SELECT vec_id,
                        CAST(round(CAST(sum(c * w) AS DOUBLE) / 1000000.0)
                          AS BIGINT) AS ds
                 FROM centered JOIN w3 USING (dim) GROUP BY vec_id),
        lam AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs,
                       CAST(sum(ds * ds) AS BIGINT) AS proj_ss FROM lamd)
        SELECT CAST(dim AS INTEGER) AS dim, w AS loading_e3, n_vecs,
               proj_ss
        FROM w3 CROSS JOIN lam ORDER BY dim"""
  }

  /** DuckDB twins. Every fold mirrors Spark's sequential left fold
    * (list_reduce over a 0.0-prepended list) so doubles match exactly. */
  private val DNorm =
    """sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
         (x, y) -> x + y))"""
  private def dDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(list_zip($a, $b),
            z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),
          (x, y) -> x + y)"""

  /** Data-derived k ∝ N / bits ∝ log₂ N rules as SQL scalars — the
    * oracle computes the SAME corpus-size-derived index parameters as
    * the Spark side ([[ivfK]]/[[lshBits]]/[[kmK]]), so the rule is
    * shared semantics, not a Spark tuning knob. Pure integer
    * arithmetic in both engines (// floors non-negatives like Scala /,
    * bin-length = bitlength with no float log). */
  private val IvfKSql =
    "(SELECT greatest(16, count(*) // 125) FROM embeddings)"
  private val KmKSql =
    "(SELECT greatest(16, least(count(*) // 125, 1024)) FROM embeddings)"
  private val LshBitsSql =
    "(SELECT least(64, greatest(8, length(bin(greatest(count(*) // 8, 1))))) FROM embeddings)"

  /** DuckDB replay of the fixed-size audit query sample
    * ([[querySampleIds]]): the [[LshQuerySample]] ids with the
    * smallest md5("q_" || vec_id), ties by id — a constant-count pick
    * so the truth audit is O(Q·N), linear in corpus size (VERDICT
    * r14 #4). Assumes an `e` CTE is already in scope. */
  private def qSampleCte: String =
    s"""qids AS (SELECT vec_id FROM (
            SELECT vec_id, row_number() OVER (
              ORDER BY md5('q_' || vec_id), vec_id) AS qrk FROM e)
          WHERE qrk <= $LshQuerySample)"""

  /** Shared DuckDB replay of the LSH bucket pipeline (parameterized by
    * table count): rotated planes (rows of H·D2·H·D1 — md5-parity ±1
    * diagonals, Hadamard entries via the popcount identity, summed
    * with EXACT integer arithmetic so plane weights cannot drift
    * between engines) → sign bits → per-table buckets — identical by
    * construction to the Spark side (same md5 diagonal tags, same
    * data-derived plane count [[LshBitsSql]]). */
  private def lshBucketsCte(nTables: Int): String =
    s"""e AS (SELECT vec_id, embedding, $DNorm AS nrm FROM embeddings),
        tp AS (SELECT t.t, p.p
               FROM (SELECT unnest(range(0, $nTables)) AS t) t,
                    (SELECT unnest(range(0, $LshBitsSql)) AS p) p),
        planes AS (
          SELECT tp.t, tp.p,
                 list_transform(range(0, 64), d ->
                   CAST((CASE WHEN (strpos('0123456789abcdef',
                           substring(md5('r' || tp.t || '_a_' || d), 1, 1))
                           - 1) % 2 = 0 THEN 1 ELSE -1 END) *
                     list_reduce(list_transform(range(0, 64), k ->
                       (CASE WHEN bit_count(tp.p & k) % 2 = 0
                             THEN 1 ELSE -1 END) *
                       (CASE WHEN (strpos('0123456789abcdef',
                           substring(md5('r' || tp.t || '_b_' || k), 1, 1))
                           - 1) % 2 = 0 THEN 1 ELSE -1 END) *
                       (CASE WHEN bit_count(k & d) % 2 = 0
                             THEN 1 ELSE -1 END)),
                       (x, y) -> x + y) AS DOUBLE)) AS wl
          FROM tp),
        bits AS (
          SELECT e.vec_id, pl.t, pl.p,
                 CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(list_zip(e.embedding, pl.wl),
                     z -> CAST(z[1] AS DOUBLE) * z[2])),
                   (x, y) -> x + y) >= 0 THEN '1' ELSE '0' END AS bit
          FROM e CROSS JOIN planes pl),
        buckets AS (
          SELECT vec_id, t, string_agg(bit, '' ORDER BY p) AS bucket
          FROM bits GROUP BY vec_id, t)"""

  /** The production 4-table candidate CTE shared by every LSH oracle. */
  private val LshCandCte =
    s"""WITH ${lshBucketsCte(4)},
        cand AS (
          SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
          FROM buckets a JOIN buckets b
            ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)"""

  /** Top-50 LSH re-rank oracle — shared verbatim by `llm_ann_lsh`
    * (in-plan bucket derivation) and `llm_ann_lsh_persisted` (staged
    * on-disk index): identical bucket, candidate, and re-rank semantics
    * by construction. */
  private[graft] val AnnLshOracle =
    s"""$LshCandCte
        SELECT cand.va AS vec_a, cand.vb AS vec_b,
               ${dDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS cosine
        FROM cand JOIN e ea ON cand.va = ea.vec_id
                  JOIN e eb ON cand.vb = eb.vec_id
        ORDER BY cosine DESC, vec_a, vec_b
        LIMIT 50"""

  /** DuckDB replay of the `stream_semdedup` batch twin: the stream
    * stages even vec_ids as batch 0 and odd as batch 1 (embHalvesDir),
    * and verdicts derive from the pre-batch chain only — so batch-0
    * vectors are all kept and a batch-1 vector is dropped iff some
    * EVEN bucket-mate scores cosine ≥ 0.4. Same 4-table rotated-plane
    * bucket CTE as every LSH oracle; dup_of = the smallest qualifying
    * even id. */
  private[graft] val SemDedupStreamOracle =
    s"""WITH ${lshBucketsCte(4)},
        cand AS (
          SELECT DISTINCT b.vec_id AS v, a.vec_id AS u
          FROM buckets a JOIN buckets b
            ON a.t = b.t AND a.bucket = b.bucket
          WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
        dropped AS (
          SELECT c.v AS vec_id, min(c.u) AS dup_of
          FROM cand c JOIN e ea ON c.u = ea.vec_id
                      JOIN e eb ON c.v = eb.vec_id
          WHERE ${dDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm)
                  >= CAST(0.4 AS DOUBLE)
          GROUP BY c.v)
        SELECT e.vec_id, (d.vec_id IS NULL) AS is_kept, d.dup_of
        FROM e LEFT JOIN dropped d USING (vec_id)
        ORDER BY e.vec_id"""

  /** DuckDB replay of the (bits, L) grid device, parameterized exactly
    * like [[annLshGrid]] ((tableCounts, bitDeltas)) so the base grid
    * (`llm_ann_lsh_tune_bits`) and the candidate-efficient wide-L arm
    * (`llm_ann_lsh_tune_wide`) share one SQL body: buckets at
    * max(tableCounts) tables, ONE coarsest-prefix join, min_tbl per
    * bits level, every grid cell a threshold. */
  private def lshGridOracle(tableCounts: Seq[Int], bitDeltas: Seq[Int]): String = {
    val maxDelta = bitDeltas.max
    s"""WITH ${lshBucketsCte(tableCounts.max)},
          blevels AS (
            SELECT DISTINCT greatest(2, $LshBitsSql - d.d) AS n_bits
            FROM (SELECT unnest([${bitDeltas.mkString(", ")}]) AS d) d),
          $qSampleCte,
          q AS (SELECT vec_id AS q_id, embedding AS qe, nrm AS qn
                FROM e JOIN qids USING (vec_id)),
          truth AS (
            SELECT q_id, vec_id FROM (
              SELECT q.q_id, e.vec_id,
                     row_number() OVER (PARTITION BY q.q_id
                       ORDER BY ${dDot("e.embedding", "q.qe")}
                                  / (e.nrm * q.qn) DESC, e.vec_id) AS rk
              FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id)
            WHERE rk <= 10),
          hitb AS (
            SELECT qb.vec_id AS q_id, b.vec_id, bl.n_bits,
                   CAST(min(b.t) AS INTEGER) AS min_tbl
            FROM buckets qb
            JOIN qids qi ON qb.vec_id = qi.vec_id
            JOIN buckets b ON qb.t = b.t
              AND substring(qb.bucket, 1,
                    CAST(greatest(2, $LshBitsSql - $maxDelta) AS INTEGER))
                = substring(b.bucket, 1,
                    CAST(greatest(2, $LshBitsSql - $maxDelta) AS INTEGER))
            JOIN blevels bl
              ON substring(qb.bucket, 1, CAST(bl.n_bits AS INTEGER))
               = substring(b.bucket, 1, CAST(bl.n_bits AS INTEGER))
            WHERE b.vec_id <> qb.vec_id
            GROUP BY 1, 2, 3),
          joined AS (
            SELECT h.n_bits, h.min_tbl,
                   CASE WHEN t.vec_id IS NOT NULL
                        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
                     AS hit
            FROM hitb h LEFT JOIN truth t
              ON h.q_id = t.q_id AND h.vec_id = t.vec_id),
          lspine AS (SELECT unnest([${tableCounts.mkString(", ")}]) AS n_tables),
          agg AS (
            SELECT j.n_bits, s.n_tables,
                   CAST(count(*) AS BIGINT) AS n_candidates,
                   CAST(sum(hit) AS BIGINT) AS n_hits
            FROM lspine s JOIN joined j ON j.min_tbl < s.n_tables
            GROUP BY 1, 2),
          tn AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
          SELECT CAST(g.n_bits AS BIGINT) AS n_bits,
                 CAST(g.n_tables AS BIGINT) AS n_tables,
                 coalesce(a.n_candidates, CAST(0 AS BIGINT)) AS n_candidates,
                 coalesce(a.n_hits, CAST(0 AS BIGINT)) AS n_hits,
                 tn.n_truth,
                 CAST(coalesce(a.n_hits, CAST(0 AS BIGINT)) * 10000
                      // tn.n_truth AS BIGINT) AS recall_bp
          FROM (SELECT bl.n_bits, l.n_tables
                FROM blevels bl CROSS JOIN lspine l) g
          LEFT JOIN agg a
            ON g.n_bits = a.n_bits AND g.n_tables = a.n_tables
          CROSS JOIN tn
          ORDER BY n_bits, n_tables"""
  }

  /** Shared IVF index CTE block (centroids + per-vector cell
    * assignment) — the query-independent half of the index, shared by
    * the single-query block below and the batch-query oracle. */
  private val IvfBaseCte =
    s"""e AS (SELECT vec_id, embedding, $DNorm AS nrm FROM embeddings),
          cents AS (
            SELECT c.c AS cent_id,
                   list_transform(range(0, 64), d ->
                     CASE WHEN (strpos('0123456789abcdef',
                           substring(md5('c_' || c.c || '_' || d), 1, 1)) - 1)
                           % 2 = 0
                          THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
                     AS ce
            FROM (SELECT unnest(range(0, $IvfKSql)) AS c) c),
          assigned AS (
            SELECT vec_id, cell FROM (
              SELECT e.vec_id, c.cent_id AS cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY ${dDot("e.embedding", "c.ce")}
                                  / (e.nrm * CAST(8 AS DOUBLE))
                                DESC, c.cent_id) AS rk
              FROM e CROSS JOIN cents c)
            WHERE rk = 1)"""

  /** Shared IVF cell CTE block (centroids, per-vector cell assignment,
    * vec-7 query, top-2 probed cells) — used verbatim by the IVF probe
    * oracle and the IVF+PQ composition so cell semantics cannot
    * drift. */
  private val IvfCellsCte =
    s"""$IvfBaseCte,
          q AS (SELECT embedding AS qe, nrm AS qn FROM e WHERE vec_id = 7),
          probed AS (
            SELECT cent_id FROM (
              SELECT c.cent_id,
                     ${dDot("q.qe", "c.ce")} / (q.qn * CAST(8 AS DOUBLE)) AS qcos
              FROM cents c CROSS JOIN q)
            ORDER BY qcos DESC, cent_id LIMIT 2)"""

  /** IVF probe oracle — shared verbatim by `llm_ann_ivf` (in-plan
    * broadcast index) and `llm_ann_ivf_persisted` (hive-partitioned
    * on-disk index): identical assignment, probe, and top-10
    * semantics by construction. */
  private[graft] val AnnIvfOracle =
    s"""WITH $IvfCellsCte
          SELECT e.vec_id, CAST(a.cell AS INTEGER) AS cell,
                 ${dDot("e.embedding", "q.qe")} / (e.nrm * q.qn) AS cosine
          FROM e JOIN assigned a USING (vec_id)
                 JOIN probed p ON a.cell = p.cent_id
                 CROSS JOIN q
          WHERE e.vec_id <> 7
          ORDER BY cosine DESC, e.vec_id LIMIT 10"""

  /** Range-search twin: the same shared cell CTE, a threshold instead
    * of a top-k. */
  private[graft] val AnnRangeOracle =
    s"""WITH $IvfCellsCte
          SELECT * FROM (
            SELECT e.vec_id, CAST(a.cell AS INTEGER) AS cell,
                   ${dDot("e.embedding", "q.qe")} / (e.nrm * q.qn) AS cosine
            FROM e JOIN assigned a USING (vec_id)
                   JOIN probed p ON a.cell = p.cent_id
                   CROSS JOIN q
            WHERE e.vec_id <> 7)
          WHERE cosine >= 0.1
          ORDER BY vec_id"""

  private val SemDedupOracle =
    s"""WITH e AS (SELECT vec_id, embedding, $DNorm AS nrm FROM embeddings),
          cents AS (
            SELECT c.c AS cent_id,
                   list_transform(range(0, 64), d ->
                     CASE WHEN (strpos('0123456789abcdef',
                           substring(md5('c_' || c.c || '_' || d), 1, 1)) - 1)
                           % 2 = 0
                          THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
                     AS ce
            FROM (SELECT unnest(range(0, $IvfKSql)) AS c) c),
          assigned AS (
            SELECT vec_id, cell, centrality FROM (
              SELECT e.vec_id, c.cent_id AS cell,
                     ${dDot("e.embedding", "c.ce")}
                       / (e.nrm * CAST(8 AS DOUBLE)) AS centrality,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY ${dDot("e.embedding", "c.ce")}
                                  / (e.nrm * CAST(8 AS DOUBLE))
                                DESC, c.cent_id) AS rk
              FROM e CROSS JOIN cents c)
            WHERE rk = 1),
          cand AS (
            SELECT a.vec_id AS va, b.vec_id AS vb
            FROM assigned a JOIN assigned b ON a.cell = b.cell
            WHERE a.centrality > b.centrality
               OR (a.centrality = b.centrality AND a.vec_id < b.vec_id)),
          dropped AS (
            SELECT DISTINCT c.vb AS vec_id
            FROM cand c
            JOIN e ea ON c.va = ea.vec_id
            JOIN e eb ON c.vb = eb.vec_id
            WHERE ${dDot("ea.embedding", "eb.embedding")}
                    / (ea.nrm * eb.nrm) >= CAST(0.4 AS DOUBLE))
          SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell,
                 (d.vec_id IS NULL) AS is_kept
          FROM assigned a LEFT JOIN dropped d USING (vec_id)
          ORDER BY a.vec_id"""

  /** Shared DuckDB replay of the PQ codebook + per-subspace code
    * assignment (same md5-parity centroid construction as the Spark
    * side, same argmax-dot with ties toward the smallest code). */
  private val PqCodesCte =
    s"""pqc AS (
          SELECT m.m AS m, k.k AS k,
                 list_transform(range(0, 16), d ->
                   CASE WHEN (strpos('0123456789abcdef',
                         substring(md5('pq_' || m.m || '_' || k.k || '_' || d),
                                   1, 1)) - 1) % 2 = 0
                        THEN CAST(0.25 AS DOUBLE)
                        ELSE CAST(-0.25 AS DOUBLE) END) AS ce
          FROM (SELECT unnest(range(0, 4)) AS m) m,
               (SELECT unnest(range(0, 16)) AS k) k),
        subs AS (
          SELECT vec_id, m.m AS m,
                 embedding[m.m * 16 + 1 : m.m * 16 + 16] AS sub
          FROM embeddings, (SELECT unnest(range(0, 4)) AS m) m),
        pqscored AS (
          SELECT s.vec_id, s.m, c.k,
                 ${dDot("s.sub", "c.ce")} AS dt,
                 ${dDot("s.sub", "s.sub")} AS ss,
                 row_number() OVER (PARTITION BY s.vec_id, s.m
                   ORDER BY ${dDot("s.sub", "c.ce")} DESC, c.k) AS rk
          FROM subs s JOIN pqc c ON s.m = c.m),
        pqcodes AS (
          SELECT vec_id, m, k AS code, dt, ss FROM pqscored WHERE rk = 1)"""

  val oracle: Map[String, String] = Map(
    "llm_ann_hamming" ->
      s"""WITH codes AS (
            SELECT vec_id,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(0, 32), d ->
                       CASE WHEN embedding[d + 1] >= 0
                            THEN (CAST(1 AS BIGINT) << CAST(d AS INTEGER))
                            ELSE CAST(0 AS BIGINT) END)),
                     (a, b) -> a + b) AS code_lo,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(0, 32), d ->
                       CASE WHEN embedding[d + 33] >= 0
                            THEN (CAST(1 AS BIGINT) << CAST(d AS INTEGER))
                            ELSE CAST(0 AS BIGINT) END)),
                     (a, b) -> a + b) AS code_hi
            FROM embeddings),
          q AS (SELECT code_lo AS q_lo, code_hi AS q_hi
                FROM codes WHERE vec_id = 0),
          coarse AS (
            SELECT vec_id,
                   CAST(bit_count(xor(code_lo, q_lo)) +
                        bit_count(xor(code_hi, q_hi)) AS INTEGER) AS hamming
            FROM codes CROSS JOIN q
            WHERE vec_id <> 0
            ORDER BY hamming, vec_id
            LIMIT 50),
          e AS (SELECT vec_id, embedding, $DNorm AS nrm FROM embeddings),
          qv AS (SELECT embedding AS qe, nrm AS qn FROM e WHERE vec_id = 0)
          SELECT c.vec_id, c.hamming,
                 ${dDot("e.embedding", "qv.qe")} / (e.nrm * qv.qn) AS cosine
          FROM coarse c JOIN e ON c.vec_id = e.vec_id CROSS JOIN qv
          ORDER BY cosine DESC, c.vec_id
          LIMIT 10""",
    "llm_retrieval_rrf" ->
      s"""${LlmText.Bm25Cte},
          txt AS (
            SELECT doc_id AS id,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank_text
            FROM (SELECT doc_id, score FROM bm
                  ORDER BY score DESC, doc_id LIMIT 20)),
          e AS (SELECT vec_id, embedding, $DNorm AS nrm FROM embeddings),
          qv AS (SELECT embedding AS qe, nrm AS qn FROM e WHERE vec_id = 0),
          vtop AS (
            SELECT vec_id,
                   ${dDot("e.embedding", "qv.qe")} / (e.nrm * qv.qn) AS cos
            FROM e CROSS JOIN qv
            WHERE vec_id <> 0
            ORDER BY cos DESC, vec_id LIMIT 20),
          vec AS (
            SELECT vec_id AS id,
                   CAST(row_number() OVER (ORDER BY cos DESC, vec_id)
                        AS BIGINT) AS rank_vec
            FROM vtop)
          SELECT id, rank_text, rank_vec,
                 coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + rank_text),
                          CAST(0 AS DOUBLE)) +
                 coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + rank_vec),
                          CAST(0 AS DOUBLE)) AS rrf_score
          FROM txt FULL OUTER JOIN vec USING (id)
          ORDER BY rrf_score DESC, id
          LIMIT 20""",
    "llm_embedding_pq" ->
      s"""WITH $PqCodesCte
          SELECT vec_id,
                 CAST(max(CASE WHEN m = 0 THEN code END) AS INTEGER) AS code_0,
                 CAST(max(CASE WHEN m = 1 THEN code END) AS INTEGER) AS code_1,
                 CAST(max(CASE WHEN m = 2 THEN code END) AS INTEGER) AS code_2,
                 CAST(max(CASE WHEN m = 3 THEN code END) AS INTEGER) AS code_3,
                 CAST(round(
                   (((max(CASE WHEN m = 0 THEN ss - 2 * dt + 1.0 END)
                      + max(CASE WHEN m = 1 THEN ss - 2 * dt + 1.0 END))
                      + max(CASE WHEN m = 2 THEN ss - 2 * dt + 1.0 END))
                      + max(CASE WHEN m = 3 THEN ss - 2 * dt + 1.0 END))
                   * 1e8) AS BIGINT) AS err_e8
          FROM pqcodes
          GROUP BY vec_id
          ORDER BY vec_id""",
    "llm_ann_pq_adc" ->
      s"""WITH $PqCodesCte,
          q AS (
            SELECT m.m AS m, embedding[m.m * 16 + 1 : m.m * 16 + 16] AS qsub
            FROM embeddings, (SELECT unnest(range(0, 4)) AS m) m
            WHERE vec_id = 7),
          dist AS (
            SELECT q.m, c.k, ${dDot("q.qsub", "c.ce")} AS dv
            FROM q JOIN pqc c ON q.m = c.m),
          picked AS (
            SELECT pqcodes.vec_id, pqcodes.m, dist.dv
            FROM pqcodes JOIN dist
              ON pqcodes.m = dist.m AND pqcodes.code = dist.k
            WHERE pqcodes.vec_id <> 7),
          pivoted AS (
            SELECT vec_id,
                   max(CASE WHEN m = 0 THEN dv END) AS d0,
                   max(CASE WHEN m = 1 THEN dv END) AS d1,
                   max(CASE WHEN m = 2 THEN dv END) AS d2,
                   max(CASE WHEN m = 3 THEN dv END) AS d3
            FROM picked GROUP BY vec_id)
          SELECT vec_id, ((d0 + d1) + d2) + d3 AS adc_score
          FROM pivoted
          ORDER BY adc_score DESC, vec_id
          LIMIT 10""",
    "llm_ann_ivfpq" ->
      s"""WITH $IvfCellsCte,
          $PqCodesCte,
          qs AS (
            SELECT m.m AS m, q.qe[m.m * 16 + 1 : m.m * 16 + 16] AS qsub
            FROM q, (SELECT unnest(range(0, 4)) AS m) m),
          dist AS (
            SELECT qs.m, c.k, ${dDot("qs.qsub", "c.ce")} AS dv
            FROM qs JOIN pqc c ON qs.m = c.m),
          picked AS (
            SELECT pqcodes.vec_id, pqcodes.m, dist.dv
            FROM pqcodes JOIN dist
              ON pqcodes.m = dist.m AND pqcodes.code = dist.k
            WHERE pqcodes.vec_id <> 7),
          pivoted AS (
            SELECT vec_id,
                   max(CASE WHEN m = 0 THEN dv END) AS d0,
                   max(CASE WHEN m = 1 THEN dv END) AS d1,
                   max(CASE WHEN m = 2 THEN dv END) AS d2,
                   max(CASE WHEN m = 3 THEN dv END) AS d3
            FROM picked GROUP BY vec_id)
          SELECT pv.vec_id, CAST(a.cell AS INTEGER) AS cell,
                 ((d0 + d1) + d2) + d3 AS adc_score
          FROM pivoted pv JOIN assigned a USING (vec_id)
               JOIN probed p ON a.cell = p.cent_id
          ORDER BY adc_score DESC, vec_id LIMIT 10""",
    "llm_semdedup" -> SemDedupOracle,
    "llm_multimodal_audio" ->
      """SELECT doc_id,
                len(wave) AS n_samples,
                sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(wave, v -> v * v)),
                     (acc, v) -> acc + v) / CAST(64 AS DOUBLE)) AS rms,
                len(list_filter(list_zip(wave[1:63], wave[2:64]),
                    z -> z[1] * z[2] < CAST(0 AS DOUBLE))) AS n_zero_crossings
         FROM (
           SELECT doc_id,
                  list_transform(range(0, 64), i ->
                    (strpos('0123456789abcdef',
                            substring(md5(doc_id || '#a' || i), 1, 1)) - 1)
                    / CAST(7.5 AS DOUBLE) - CAST(1 AS DOUBLE)) AS wave
           FROM documents)
         ORDER BY doc_id""",
    "llm_multimodal_framesample" ->
      """SELECT doc_id, n_frames, len(sampled) AS n_sampled,
                md5(array_to_string(list_transform(sampled, f -> upper(f)), ''))
                  AS sample_fp
         FROM (
           SELECT doc_id, n_frames,
                  [frames[i + 1] FOR i IN range(0, n_frames, 3)] AS sampled
           FROM (
             SELECT doc_id, n_frames,
                    list_transform(range(0, n_frames),
                      i -> md5(doc_id || '#f' || i)) AS frames
             FROM (SELECT doc_id, CAST(doc_id % 10 + 5 AS INTEGER) AS n_frames
                   FROM documents)))
         ORDER BY doc_id""",
    "llm_cosine_pair" ->
      s"""WITH e AS (SELECT vec_id, embedding, $DNorm AS nrm FROM embeddings)
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 ${dDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
          FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
          ORDER BY vec_a""",
    "llm_topk_similarity" ->
      s"""WITH e AS (SELECT vec_id, label, embedding, $DNorm AS nrm FROM embeddings)
          SELECT e.vec_id, e.label,
                 ${dDot("e.embedding", "q.embedding")} / (e.nrm * q.nrm) AS cosine
          FROM e CROSS JOIN (SELECT embedding, nrm FROM e WHERE vec_id = 0) q
          WHERE e.vec_id <> 0
          ORDER BY cosine DESC, e.vec_id
          LIMIT 20""",
    "llm_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding, $DNorm AS nrm FROM embeddings)
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 ${dDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
          FROM e a JOIN e b ON a.vec_id < b.vec_id
          WHERE ${dDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4
          ORDER BY vec_a, vec_b""",
    "llm_ann_lsh" -> AnnLshOracle,
    // the persisted index is a staged copy of the same bucket table:
    // one oracle string, the llm_ann_ivf_persisted sharing precedent
    "llm_ann_lsh_persisted" -> AnnLshOracle,
    "llm_ann_lsh_tune" ->
      s"""WITH ${lshBucketsCte(8)},
          $qSampleCte,
          q AS (SELECT vec_id AS q_id, embedding AS qe, nrm AS qn
                FROM e JOIN qids USING (vec_id)),
          truth AS (
            SELECT q_id, vec_id FROM (
              SELECT q.q_id, e.vec_id,
                     row_number() OVER (PARTITION BY q.q_id
                       ORDER BY ${dDot("e.embedding", "q.qe")}
                                  / (e.nrm * q.qn) DESC, e.vec_id) AS rk
              FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id)
            WHERE rk <= 10),
          firsthit AS (
            SELECT qb.vec_id AS q_id, b.vec_id,
                   CAST(min(b.t) AS INTEGER) AS min_tbl
            FROM buckets qb JOIN qids qi ON qb.vec_id = qi.vec_id
            JOIN buckets b
              ON qb.t = b.t AND qb.bucket = b.bucket
            WHERE b.vec_id <> qb.vec_id
            GROUP BY 1, 2),
          joined AS (
            SELECT f.min_tbl,
                   CASE WHEN t.vec_id IS NOT NULL
                        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
                     AS hit
            FROM firsthit f LEFT JOIN truth t
              ON f.q_id = t.q_id AND f.vec_id = t.vec_id),
          spine AS (SELECT unnest([1, 2, 4, 8]) AS n_tables),
          agg AS (
            SELECT s.n_tables,
                   CAST(count(*) AS BIGINT) AS n_candidates,
                   CAST(sum(hit) AS BIGINT) AS n_hits
            FROM spine s JOIN joined j ON j.min_tbl < s.n_tables
            GROUP BY 1),
          tn AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
          SELECT CAST(s.n_tables AS BIGINT) AS n_tables,
                 coalesce(a.n_candidates, CAST(0 AS BIGINT)) AS n_candidates,
                 coalesce(a.n_hits, CAST(0 AS BIGINT)) AS n_hits,
                 tn.n_truth,
                 CAST(coalesce(a.n_hits, CAST(0 AS BIGINT)) * 10000
                      // tn.n_truth AS BIGINT) AS recall_bp
          FROM spine s LEFT JOIN agg a USING (n_tables) CROSS JOIN tn
          ORDER BY n_tables""",
    // both grids share the Spark side's (tableCounts, bitDeltas)
    // constants verbatim — one device, no drift by construction
    "llm_ann_lsh_tune_bits" ->
      lshGridOracle(LshTuneTableCounts, LshTuneBitDeltas),
    "llm_ann_lsh_tune_wide" ->
      lshGridOracle(LshWideTableCounts, LshWideBitDeltas),
    "llm_ann_lsh_tune_xl" ->
      lshGridOracle(LshXlTableCounts, LshXlBitDeltas),
    // planted-margin recall: partner vectors recomputed in SQL with
    // the IDENTICAL strict-left-fold double arithmetic as the Spark
    // side (list_prepend(0,...) mirrors aggregate's init; same md5
    // "pr_" tags; same op order inside every lambda), then bucketed
    // with the shared planes CTE — bit-identical collision counts
    "llm_ann_lsh_planted" ->
      s"""WITH ${lshBucketsCte(32)},
          $qSampleCte,
          anchors AS (
            SELECT vec_id, embedding FROM e JOIN qids USING (vec_id)),
          margins AS (
            SELECT unnest([CAST(0.95 AS DOUBLE), CAST(0.8 AS DOUBLE),
                           CAST(0.6 AS DOUBLE)]) AS margin),
          pbase AS (
            SELECT a.vec_id, m.margin,
                   list_transform(a.embedding,
                                  x -> CAST(x AS DOUBLE)) AS ed,
                   list_transform(range(0, 64), d ->
                     CASE WHEN substring(md5('pr_' || a.vec_id || '_' || d),
                                         1, 1)
                            IN ('0','2','4','6','8','a','c','e')
                          THEN CAST(0.125 AS DOUBLE)
                          ELSE CAST(-0.125 AS DOUBLE) END) AS r
            FROM anchors a CROSS JOIN margins m),
          gs AS (
            SELECT *,
                   list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(ed, x -> x * x)),
                     (acc, x) -> acc + x) AS en2,
                   list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(list_zip(ed, r), z -> z[1] * z[2])),
                     (acc, x) -> acc + x) AS er
            FROM pbase),
          orth AS (
            SELECT vec_id, margin, ed, en2,
                   list_transform(list_zip(r, ed),
                                  z -> z[1] - (er / en2) * z[2]) AS rp
            FROM gs),
          unitd AS (
            SELECT *,
                   list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(rp, x -> x * x)),
                     (acc, x) -> acc + x) AS rpn2
            FROM orth),
          planted AS (
            SELECT vec_id, margin,
                   list_transform(list_zip(ed, rp), z ->
                     margin * (z[1] / sqrt(en2)) +
                     sqrt(CAST(1 AS DOUBLE) - margin * margin)
                       * (z[2] / sqrt(rpn2))) AS pe
            FROM unitd),
          pbits AS (
            SELECT p.vec_id, p.margin, pl.t, pl.p AS bp,
                   CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(list_zip(p.pe, pl.wl),
                                    z -> z[1] * z[2])),
                     (x, y) -> x + y) >= 0 THEN '1' ELSE '0' END AS bit
            FROM planted p CROSS JOIN planes pl),
          pbuckets AS (
            SELECT vec_id, margin, t,
                   string_agg(bit, '' ORDER BY bp) AS pbucket
            FROM pbits GROUP BY 1, 2, 3),
          abuckets AS (
            SELECT b.vec_id, b.t, b.bucket AS abucket
            FROM buckets b JOIN qids q ON b.vec_id = q.vec_id),
          blevels AS (
            SELECT DISTINCT greatest(2, $LshBitsSql - d.d) AS n_bits
            FROM (SELECT unnest([0, 2]) AS d) d),
          hit AS (
            SELECT pb.vec_id, pb.margin, bl.n_bits,
                   CAST(min(CASE WHEN
                       substring(ab.abucket, 1, CAST(bl.n_bits AS INTEGER))
                     = substring(pb.pbucket, 1, CAST(bl.n_bits AS INTEGER))
                     THEN pb.t END) AS INTEGER) AS min_tbl
            FROM pbuckets pb
            JOIN abuckets ab ON pb.vec_id = ab.vec_id AND pb.t = ab.t
            CROSS JOIN blevels bl
            GROUP BY 1, 2, 3),
          lspine AS (SELECT unnest([4, 8, 16, 32]) AS n_tables)
          SELECT h.margin, CAST(h.n_bits AS BIGINT) AS n_bits,
                 CAST(s.n_tables AS BIGINT) AS n_tables,
                 CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(CASE WHEN h.min_tbl < s.n_tables
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_collide,
                 CAST(sum(CASE WHEN h.min_tbl < s.n_tables
                               THEN 1 ELSE 0 END) * 10000
                      // count(*) AS BIGINT) AS recall_bp
          FROM hit h CROSS JOIN lspine s
          GROUP BY 1, 2, 3
          ORDER BY margin, n_bits, n_tables""",
    "llm_hard_negatives" ->
      s"""$LshCandCte,
          scored AS (
            SELECT cand.va, cand.vb,
                   ${dDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm)
                     AS cosine
            FROM cand JOIN e ea ON cand.va = ea.vec_id
                      JOIN e eb ON cand.vb = eb.vec_id
            WHERE ${dDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm)
                    >= 0.25
              AND ${dDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm)
                    < 0.4),
          sym AS (SELECT va AS anchor, vb AS negative, cosine FROM scored
                  UNION ALL
                  SELECT vb AS anchor, va AS negative, cosine FROM scored),
          ranked AS (
            SELECT anchor, negative, cosine,
                   row_number() OVER (PARTITION BY anchor
                                      ORDER BY cosine DESC, negative) AS rk
            FROM sym)
          SELECT anchor, rk, negative, cosine FROM ranked
          WHERE rk <= 2 ORDER BY anchor, rk""",
    "llm_embed_neardup_lsh" ->
      s"""$LshCandCte
          SELECT cand.va AS vec_a, cand.vb AS vec_b,
                 ${dDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS cosine
          FROM cand JOIN e ea ON cand.va = ea.vec_id
                    JOIN e eb ON cand.vb = eb.vec_id
          WHERE ${dDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) >= 0.4
          ORDER BY vec_a, vec_b""",
    "llm_bitext_margin" ->
      s"""$LshCandCte,
          scored AS (
            SELECT cand.va, cand.vb,
                   ${dDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm)
                     AS cosine
            FROM cand JOIN e ea ON cand.va = ea.vec_id
                      JOIN e eb ON cand.vb = eb.vec_id),
          base AS (
            SELECT CASE WHEN va % 2 = 0 THEN va ELSE vb END AS src_id,
                   CASE WHEN va % 2 = 0 THEN vb ELSE va END AS tgt_id,
                   CAST(round(cosine * 1000000) AS BIGINT) AS cos_e6
            FROM scored
            WHERE cosine >= 0.1 AND (va % 2 = 0) <> (vb % 2 = 0)),
          ranked AS (
            SELECT src_id, tgt_id, cos_e6,
                   row_number() OVER (PARTITION BY src_id
                     ORDER BY cos_e6 DESC, tgt_id) AS rka,
                   row_number() OVER (PARTITION BY tgt_id
                     ORDER BY cos_e6 DESC, src_id) AS rkb
            FROM base),
          sa AS (SELECT src_id, CAST(sum(cos_e6) AS BIGINT) AS sa_e6,
                        CAST(count(*) AS BIGINT) AS na
                 FROM ranked WHERE rka <= 4 GROUP BY 1),
          sb AS (SELECT tgt_id, CAST(sum(cos_e6) AS BIGINT) AS sb_e6,
                        CAST(count(*) AS BIGINT) AS nb
                 FROM ranked WHERE rkb <= 4 GROUP BY 1),
          m AS (
            SELECT b.src_id, b.tgt_id, b.cos_e6,
                   CAST(round(CAST(b.cos_e6 * 2 * na * nb AS DOUBLE)
                              * 1000000.0
                              / CAST(sa_e6 * nb + sb_e6 * na AS DOUBLE))
                        AS BIGINT) AS margin_e6
            FROM base b JOIN sa USING (src_id) JOIN sb USING (tgt_id)),
          w AS (SELECT *, row_number() OVER (PARTITION BY src_id
                  ORDER BY margin_e6 DESC, tgt_id) AS rk FROM m)
          SELECT src_id, tgt_id, cos_e6, margin_e6 FROM w
          WHERE rk = 1 AND margin_e6 >= 1050000 ORDER BY src_id""",
    "llm_embed_cluster" ->
      s"""${LshCandCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
          pairs AS (
            SELECT cand.va, cand.vb
            FROM cand JOIN e ea ON cand.va = ea.vec_id
                      JOIN e eb ON cand.vb = eb.vec_id
            WHERE ${dDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm)
                  >= 0.4),
          lnk AS (SELECT va AS src, vb AS dst FROM pairs
                  UNION ALL SELECT vb AS src, va AS dst FROM pairs),
          reach AS (
            SELECT vec_id AS id, vec_id AS r FROM embeddings
            UNION
            SELECT reach.id, l.dst FROM reach JOIN lnk l ON reach.r = l.src),
          labels AS (
            SELECT id AS vec_id, min(r) AS cluster_id, (min(r) = id) AS is_kept
            FROM reach GROUP BY id)
          SELECT vec_id, cluster_id, is_kept FROM labels ORDER BY vec_id""",
    "llm_cluster_coherence" ->
      s"""${LshCandCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
          pairs AS (
            SELECT cand.va, cand.vb,
                   ${dDot("ea.embedding", "eb.embedding")}
                     / (ea.nrm * eb.nrm) AS cosine
            FROM cand JOIN e ea ON cand.va = ea.vec_id
                      JOIN e eb ON cand.vb = eb.vec_id
            WHERE ${dDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm)
                  >= 0.4),
          lnk AS (SELECT va AS src, vb AS dst FROM pairs
                  UNION ALL SELECT vb AS src, va AS dst FROM pairs),
          reach AS (
            SELECT vec_id AS id, vec_id AS r FROM embeddings
            UNION
            SELECT reach.id, l.dst FROM reach JOIN lnk l ON reach.r = l.src),
          labels AS (
            SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id),
          sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_vecs
                    FROM labels GROUP BY 1),
          ed AS (SELECT la.cluster_id,
                        CAST(round(p.cosine * 1000000) AS BIGINT) AS cos_e6
                 FROM pairs p
                 JOIN labels la ON p.va = la.vec_id
                 JOIN labels lb ON p.vb = lb.vec_id
                 WHERE la.cluster_id = lb.cluster_id),
          ag AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_intra_edges,
                        CAST(sum(cos_e6) AS BIGINT) AS s
                 FROM ed GROUP BY 1)
          SELECT sz.cluster_id, n_vecs, n_intra_edges,
                 CAST(s // n_intra_edges AS BIGINT) AS mean_cos_e6,
                 CAST(n_intra_edges * 2000000 // (n_vecs * (n_vecs - 1))
                   AS BIGINT) AS density_ppm,
                 s // n_intra_edges >= 600000 AS coherent
          FROM sizes sz JOIN ag USING (cluster_id)
          WHERE n_vecs >= 2 ORDER BY cluster_id""",
    "llm_ann_ivf" -> AnnIvfOracle,
    "llm_ann_range" -> AnnRangeOracle,
    "llm_embedding_pca" -> PcaOracle,
    "llm_cluster_outliers" ->
      """WITH quant AS (
           SELECT vec_id, label, d.d AS dim,
                  CAST(round(CAST(embedding[d.d + 1] AS DOUBLE) * 1000000)
                    AS BIGINT) AS v
           FROM embeddings
           CROSS JOIN (SELECT unnest(range(0, 64)) AS d) d),
         cent AS (SELECT label, dim,
                         CAST(round(CAST(sum(v) AS DOUBLE) /
                           CAST(count(*) AS DOUBLE)) AS BIGINT) AS mu
                  FROM quant GROUP BY 1, 2),
         scored AS (
           SELECT vec_id, q.label,
                  CAST(round(1000000.0 * CAST(sum(v * mu) AS DOUBLE) /
                    (sqrt(CAST(greatest(sum(v * v), 1) AS DOUBLE)) *
                     sqrt(CAST(greatest(sum(mu * mu), 1) AS DOUBLE))))
                    AS BIGINT) AS cos_e6
           FROM quant q JOIN cent c USING (label, dim)
           GROUP BY vec_id, q.label),
         per AS (
           SELECT label, CAST(count(*) AS BIGINT) AS n_members,
                  CAST(round(CAST(sum(cos_e6) AS DOUBLE) /
                    CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_cos_e6,
                  CAST(sum(CASE WHEN cos_e6 < 500000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
                  CAST(min(cos_e6) AS BIGINT) AS worst_cos_e6
           FROM scored GROUP BY label)
         SELECT p.label, n_members, mean_cos_e6, n_outliers,
                worst_cos_e6, CAST(min(s.vec_id) AS BIGINT) AS worst_vec_id
         FROM per p JOIN scored s
           ON s.label = p.label AND s.cos_e6 = p.worst_cos_e6
         GROUP BY p.label, n_members, mean_cos_e6, n_outliers,
                  worst_cos_e6
         ORDER BY p.label""",
    "llm_embedding_stats" ->
      """WITH v AS (
           SELECT d.d AS dim,
                  CAST(round(CAST(embedding[d.d + 1] AS DOUBLE) * 1000000)
                    AS BIGINT) AS v
           FROM embeddings
           CROSS JOIN (SELECT unnest(range(0, 64)) AS d) d),
         s AS (
           SELECT dim, count(*) AS n, CAST(sum(v) AS BIGINT) AS s,
                  CAST(sum(v * v) AS BIGINT) AS ss,
                  CAST(min(v) AS BIGINT) AS min_e6,
                  CAST(max(v) AS BIGINT) AS max_e6
           FROM v GROUP BY 1)
         SELECT CAST(dim AS INTEGER) AS dim, n, min_e6, max_e6,
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_e6,
                sqrt(greatest((CAST(ss AS DOUBLE) -
                      CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1.0), 0.0)) AS std_e6
         FROM s ORDER BY dim""",
    "llm_ann_batch_queries" ->
      s"""WITH $IvfBaseCte,
          qs AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
                 FROM e WHERE vec_id IN (3, 7, 11, 19, 23)),
          qprobe AS (
            SELECT qid, cent_id FROM (
              SELECT q.qid, c.cent_id,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY ${dDot("q.qe", "c.ce")}
                                  / (q.qn * CAST(8 AS DOUBLE))
                                DESC, c.cent_id) AS rk
              FROM qs q CROSS JOIN cents c)
            WHERE rk <= 2),
          candq AS (
            SELECT q.qid, e.vec_id,
                   ${dDot("e.embedding", "q.qe")} / (e.nrm * q.qn) AS cosine
            FROM e JOIN assigned a USING (vec_id)
                   JOIN qprobe p ON a.cell = p.cent_id
                   JOIN qs q ON q.qid = p.qid
            WHERE e.vec_id <> q.qid)
          SELECT qid, vec_id, cosine FROM (
            SELECT qid, vec_id, cosine,
                   row_number() OVER (PARTITION BY qid
                     ORDER BY cosine DESC, vec_id) AS rk
            FROM candq)
          WHERE rk <= 3
          ORDER BY qid, cosine DESC, vec_id""",
    // recall audit: exact top-10 (brute force) vs the IVF probe's
    // top-10, both replayed with the shared cells CTE
    "llm_ann_recall" ->
      s"""WITH $IvfCellsCte,
          truth AS (
            SELECT e.vec_id FROM e CROSS JOIN q
            WHERE e.vec_id <> 7
            ORDER BY ${dDot("e.embedding", "q.qe")} / (e.nrm * q.qn) DESC,
                     e.vec_id
            LIMIT 10),
          pred AS (
            SELECT e.vec_id
            FROM e JOIN assigned a USING (vec_id)
                   JOIN probed p ON a.cell = p.cent_id
                   CROSS JOIN q
            WHERE e.vec_id <> 7
            ORDER BY ${dDot("e.embedding", "q.qe")} / (e.nrm * q.qn) DESC,
                     e.vec_id
            LIMIT 10),
          m AS (
            SELECT t.vec_id IS NOT NULL AS it, p2.vec_id IS NOT NULL AS ip
            FROM truth t FULL OUTER JOIN pred p2 ON t.vec_id = p2.vec_id)
          SELECT CAST(coalesce(sum(CASE WHEN it THEN 1 ELSE 0 END), 0)
                      AS BIGINT) AS k,
                 CAST(coalesce(sum(CASE WHEN it AND ip THEN 1 ELSE 0 END), 0)
                      AS BIGINT) AS n_hit,
                 CAST(coalesce(sum(CASE WHEN it AND ip THEN 1 ELSE 0 END), 0)
                      * 1000000
                      // nullif(coalesce(sum(CASE WHEN it THEN 1 ELSE 0 END),
                               0), 0) AS BIGINT) AS recall_ppm
          FROM m""",
    // two-stage matryoshka retrieval: prefix-16 coarse top-50, exact
    // 64-dim rerank to top-10; folds mirror Spark's exactly on both
    // the sliced and full vectors
    "llm_matryoshka_rerank" ->
      s"""WITH e0 AS (SELECT vec_id, embedding, $DNorm AS nrm,
                             embedding[1:16] AS pe
                      FROM embeddings),
          e AS (SELECT vec_id, embedding, nrm, pe,
                       sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(pe,
                           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
                         (x, y) -> x + y)) AS pn
                FROM e0),
          q AS (SELECT embedding AS qe, nrm AS qn, pe AS qpe, pn AS qpn
                FROM e WHERE vec_id = 0),
          cand AS (
            SELECT e.vec_id, e.embedding, e.nrm,
                   ${dDot("e.pe", "q.qpe")} / (e.pn * q.qpn)
                     AS coarse_cosine
            FROM e CROSS JOIN q
            WHERE e.vec_id <> 0
            ORDER BY coarse_cosine DESC, e.vec_id LIMIT 50)
          SELECT c.vec_id, c.coarse_cosine,
                 ${dDot("c.embedding", "q.qe")} / (c.nrm * q.qn) AS cosine
          FROM cand c CROSS JOIN q
          ORDER BY cosine DESC, c.vec_id LIMIT 10""",
    // identical semantics probed through the PARTITIONED index layout —
    // same oracle by construction
    "llm_ann_ivf_persisted" -> AnnIvfOracle,

    // Replays the driver k-means VERBATIM: same sample (vec_id % 4),
    // same strided init, two Lloyd rounds with sequential-fold cosines
    // and scaled-bigint means, same tie-breaks — every intermediate
    // double is bit-identical to the Scala build, so the final top-10
    // hash-compares exactly.
    "llm_ann_ivf_kmeans" -> {
      def asgn(cents: String, alias: String): String =
        s"""SELECT vec_id, cell FROM (
              SELECT s.vec_id, $alias.cent_id AS cell,
                     row_number() OVER (PARTITION BY s.vec_id
                       ORDER BY ${dDot("s.embedding", s"$alias.ce")}
                                  / (s.nrm * sqrt(${dDot(s"$alias.ce", s"$alias.ce")}))
                                DESC, $alias.cent_id) AS rk
              FROM s CROSS JOIN $cents $alias)
            WHERE rk = 1"""
      def mean(assign: String): String =
        s"""SELECT a.cell, d.i AS pos,
                   CAST(sum(CAST(round(CAST(s.embedding[d.i] AS DOUBLE)
                         * CAST(100000000 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
                     / CAST(100000000 AS DOUBLE) / count(*) AS m
            FROM s JOIN $assign a USING (vec_id) CROSS JOIN dims d
            GROUP BY a.cell, d.i"""
      def next(prev: String, means: String): String =
        s"""SELECT $prev.cent_id, coalesce(mm.ce, $prev.ce) AS ce
            FROM $prev LEFT JOIN (SELECT cell, list(m ORDER BY pos) AS ce
                                  FROM $means GROUP BY cell) mm
              ON $prev.cent_id = mm.cell"""
      s"""WITH e AS (SELECT vec_id, embedding, $DNorm AS nrm FROM embeddings),
          s AS (SELECT vec_id, embedding, nrm,
                       row_number() OVER (ORDER BY vec_id) AS rn
                FROM (SELECT * FROM e
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                      LIMIT 4096)),
          prm AS (SELECT count(*) // $KmKSql AS stride FROM s),
          dims AS (SELECT unnest(range(1, 65)) AS i),
          c0 AS (SELECT CAST((rn - 1) // stride AS INTEGER) AS cent_id,
                        list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ce
                 FROM s, prm
                 WHERE (rn - 1) % stride = 0
                   AND (rn - 1) // stride < $KmKSql),
          a1 AS (${asgn("c0", "ka")}),
          m1 AS (${mean("a1")}),
          c1 AS (${next("c0", "m1")}),
          a2 AS (${asgn("c1", "kb")}),
          m2 AS (${mean("a2")}),
          c2 AS (${next("c1", "m2")}),
          assigned AS (
            SELECT vec_id, cell FROM (
              SELECT e.vec_id, kc.cent_id AS cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY ${dDot("e.embedding", "kc.ce")}
                                  / (e.nrm * sqrt(${dDot("kc.ce", "kc.ce")}))
                                DESC, kc.cent_id) AS rk
              FROM e CROSS JOIN c2 kc)
            WHERE rk = 1),
          q AS (SELECT embedding AS qe, nrm AS qn FROM e WHERE vec_id = 7),
          probed AS (
            SELECT cent_id FROM (
              SELECT kc.cent_id,
                     ${dDot("q.qe", "kc.ce")}
                       / (q.qn * sqrt(${dDot("kc.ce", "kc.ce")})) AS qcos
              FROM c2 kc CROSS JOIN q)
            ORDER BY qcos DESC, cent_id LIMIT 8)
          SELECT e.vec_id, CAST(a.cell AS INTEGER) AS cell,
                 ${dDot("e.embedding", "q.qe")} / (e.nrm * q.qn) AS cosine
          FROM e JOIN assigned a USING (vec_id)
                 JOIN probed p ON a.cell = p.cent_id
                 CROSS JOIN q
          WHERE e.vec_id <> 7
          ORDER BY cosine DESC, e.vec_id LIMIT 10"""
    },
    "llm_embedding_quantize" ->
      """SELECT vec_id, scale,
                array_to_string(list_transform(q, x -> CAST(x AS VARCHAR)), ',')
                  AS q_csv,
                list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(list_zip(embedding, q),
                    z -> abs(CAST(z[1] AS DOUBLE)
                             - CAST(z[2] AS DOUBLE) * scale
                               / CAST(127 AS DOUBLE)))),
                  (acc, e) -> acc + e) / CAST(64 AS DOUBLE) AS mean_abs_err
         FROM (
           SELECT vec_id, embedding, scale,
                  list_transform(embedding,
                    v -> CAST(round(CAST(v AS DOUBLE) / scale
                                    * CAST(127 AS DOUBLE)) AS INTEGER)) AS q
           FROM (
             SELECT vec_id, embedding,
                    list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))),
                      (acc, v) -> greatest(acc, v)) AS scale
             FROM embeddings))
         ORDER BY vec_id""",
    "llm_vector_mean" ->
      s"""SELECT label, max(n) AS n_vecs,
                ${OracleFmt.dCsvScaled("list(m ORDER BY pos)")} AS mean_vec
         FROM (
           SELECT label, i.i AS pos,
                  CAST(sum(CAST(round(CAST(embedding[i.i] AS DOUBLE)
                                      * CAST(100000000 AS DOUBLE)) AS BIGINT))
                       AS DOUBLE)
                    / CAST(100000000 AS DOUBLE) / count(*) AS m,
                  count(*) AS n
           FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
           GROUP BY label, i.i)
         GROUP BY label ORDER BY label""",
    "agg_custom_vector_mean" ->
      s"""SELECT label,
                ${OracleFmt.dCsvScaled("list(m ORDER BY pos)")} AS mean_vec,
                max(n) AS n_vecs
         FROM (
           SELECT label, i.i AS pos,
                  CAST(sum(CAST(round(CAST(embedding[i.i] AS DOUBLE)
                                      * CAST(100000000 AS DOUBLE)) AS BIGINT))
                       AS DOUBLE)
                    / CAST(100000000 AS DOUBLE) / count(*) AS m,
                  count(*) AS n
           FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
           GROUP BY label, i.i)
         GROUP BY label ORDER BY label""",
    "llm_multimodal_passthrough" ->
      """SELECT doc_id, lang, source,
                octet_length(from_hex(md5(text))) AS byte_len,
                upper(md5(text)) AS payload_hex,
                CAST(n_chars % 64 + 1 AS INTEGER) AS width,
                CAST(n_chars // 64 + 1 AS INTEGER) AS height,
                'fake/rgb8' AS fmt
         FROM documents WHERE lang <> 'zh'
         ORDER BY doc_id""",

    // Analytic replay of the PPM decode: the Spark side PARSES real
    // binary image bytes; the oracle never sees them — it derives the
    // same answers in closed form from the generator's arithmetic.
    // Header length = "P6\n"(3) + comment(0|20) + digits(w) + " "(1) +
    // digit(h)(1) + "\n"(1) + "255\n"(4); pixel sum of the cyclic ramp
    // (s+i) mod 256 over n bytes = fullCycles*32640 + ramp(rem at s)
    // with the wrapped tail subtracting 256 per wrapped term.
    "llm_multimodal_features" ->
      """WITH p AS (
           SELECT doc_id,
                  CAST(doc_id % 16 + 1 AS INTEGER) AS width,
                  CAST(doc_id % 8 + 1 AS INTEGER) AS height,
                  CAST((doc_id * 131) % 256 AS BIGINT) AS s,
                  CAST(3 * (doc_id % 16 + 1) * (doc_id % 8 + 1) AS BIGINT) AS n
           FROM documents),
         q AS (
           SELECT doc_id, width, height, n,
                  (n // 256) * 32640
                    + (n % 256) * s + (n % 256) * (n % 256 - 1) // 2
                    - 256 * GREATEST(CAST(0 AS BIGINT), s + n % 256 - 256)
                    AS pixel_sum,
                  3 + CASE WHEN doc_id % 5 = 0 THEN 20 ELSE 0 END
                    + CASE WHEN width >= 10 THEN 2 ELSE 1 END + 7
                    AS header_len
           FROM p)
         SELECT doc_id, width, height,
                CAST(header_len + n AS INTEGER) AS n_bytes,
                pixel_sum,
                CAST(pixel_sum AS DOUBLE) / CAST(n AS DOUBLE) AS brightness
         FROM q ORDER BY doc_id""",
    // Analytic replay of the dHash: channel sum at sample position p
    // is (s0+3p)%256 + (s0+3p+1)%256 + (s0+3p+2)%256 from the
    // generator's cyclic ramp; bit k compares the (x+1)-th vs x-th
    // 9-grid column sample on row k//8, bands fold 16 bits MSB-first
    // exactly as dhashBands does.
    "llm_multimodal_phash" -> PhashOracle,
    "llm_multimodal_consistency" -> MultimodalConsistencyOracle)

  /** Analytic dHash replay pieces, shared by the phash-dedup oracle
    * and the cross-modal consistency oracle: the fixture generator's
    * closed form (pixel byte i = (s0+i) mod 256) lets the oracle
    * compute the 9×8-grid difference bits without decoding bytes. */
  private def phashSAt(p: String): String =
    s"((s0 + 3 * ($p)) % 256 + (s0 + 3 * ($p) + 1) % 256 " +
      s"+ (s0 + 3 * ($p) + 2) % 256)"
  private lazy val phashBitSql: String = {
    val gy = "((k // 8) * h // 8)"
    s"""CASE WHEN ${phashSAt(s"$gy * w + (k % 8 + 1) * w // 9")} >
              ${phashSAt(s"$gy * w + (k % 8) * w // 9")}
        THEN 1 ELSE 0 END"""
  }
  // lazy: the strict `oracle` map above forces PhashOracle at object
  // init, before later-declared strict vals would be assigned
  private lazy val PhashParamsCte =
    """d AS (SELECT doc_id,
                CAST(doc_id % 16 + 1 AS BIGINT) AS w,
                CAST(doc_id % 8 + 1 AS BIGINT) AS h,
                CAST((doc_id * 131) % 256 AS BIGINT) AS s0
              FROM documents)"""

  private lazy val PhashOracle: String = {
    def band(b: Int): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(${16 * b}, ${16 * b + 16}), k -> $phashBitSql)),
            (acc, v) -> acc * 2 + v) AS b$b"""
    s"""WITH $PhashParamsCte,
        hs AS (SELECT doc_id, ${band(0)}, ${band(1)}, ${band(2)},
                      ${band(3)}
               FROM d)
        SELECT b0, b1, b2, b3, CAST(count(*) AS BIGINT) AS n_images,
               min(doc_id) AS keep_doc_id
        FROM hs GROUP BY 1, 2, 3, 4 ORDER BY keep_doc_id"""
  }

  private lazy val MultimodalConsistencyOracle: String =
    s"""WITH $PhashParamsCte,
        ihs AS (SELECT doc_id,
                       array_to_string(list_transform(range(0, 64),
                         k -> CAST($phashBitSql AS VARCHAR)), '') AS ih
                FROM d),
        ${graft.queries.LlmText.DSimhashFp}
        SELECT doc_id, hamming,
               64 - hamming AS agreement_bits,
               hamming <= 26 AS consistent
        FROM (
          SELECT i.doc_id,
                 CAST(list_reduce(list_prepend(0,
                   list_transform(range(1, 65),
                     p -> CASE WHEN i.ih[p:p] <> f.simhash[p:p]
                               THEN 1 ELSE 0 END)),
                   (acc, v) -> acc + v) AS BIGINT) AS hamming
          FROM ihs i JOIN fp f USING (doc_id))
        ORDER BY doc_id"""
}
