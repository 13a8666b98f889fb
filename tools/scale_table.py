#!/usr/bin/env python3
"""Generate SCALE.md — the per-key scale-evidence register — mechanically.

Usage: python3 tools/scale_table.py <plans_snapshot.json> > SCALE.md

Sibling of survey_table.py, same contract: the key list comes from the
committed plan snapshot (written by graft.PlanDigest from
SparkEntry.queries), and this script FAILS when any key lacks an
evidence entry here (or an entry names a key that no longer exists) —
so a new operator cannot land without a scale story, the same way it
cannot land without an oracle. ScaleEvidenceSpec enforces the committed
SCALE.md against SparkEntry.queries in `sbt test`.

Every key carries exactly one of:
  - measured: a wall-clock ratio on the tools/stage_scale.py keyed
    corpus (×8 = 8 disjoint-key copies of sf0.1; ×64 where spot-checked)
    as recorded in BASELINE.md's per-round sweep tables, with the round
    it was measured in. Sub-8× at ×8 data (fixed local[32] parallelism)
    = sublinear; ratios far below 1× are fixed-cost-dominated keys.
  - bounded: a named bounded-by-construction tag restating the scaling
    argument from the key's doc comment. Tags (closed vocabulary):
      linear-scan     one data-parallel pass / key-partitioned shuffle;
                      no state or candidate set that outgrows partials
      output-sized    cost driven by the result / candidate set itself
      metadata-sized  touches file-listing / version / catalog metadata
      vocab-bound     state bounded by a vocabulary or value domain,
                      not by row count
      bounded-series  computed over a fixed time-bucketed series
                      (e.g. 24 hourly buckets × event types)
      key-cardinality per-key window/state; bounded by distinct keys
      broadcast-dim   joins only against a fixed-size broadcast side
      fixed-cut       operates on a TakeOrdered-limited / fixed-size cut
      pair-set-bounded candidates only from a band/bucket/cell/prefix
                      equi-join — never all-pairs on data-sized inputs
      edge-rounds     fixed number of O(edges)-per-round iterations
      state-bounded   streaming state expired by watermark / bounded by
                      keys, open windows, or live sessions
Developer tooling only (driver-side python); the shipped library never
reads this.
"""
import json
import sys

M = "measured"
B = "bounded"
TAGS = {"linear-scan", "output-sized", "metadata-sized", "vocab-bound",
        "bounded-series", "key-cardinality", "broadcast-dim", "fixed-cut",
        "pair-set-bounded", "edge-rounds", "state-bounded"}

TIERS = [
    ("scan", "A. Scans / sources"),
    ("sink", "B1. Sinks"),
    ("catalog", "B2. Catalog"),
    ("etl", "B3. Table maintenance / ETL"),
    ("project", "C1. Projection"),
    ("filter", "C2. Filters"),
    ("dedup", "C3. Row dedup"),
    ("typed", "C4. Typed Dataset"),
    ("join", "D. Joins"),
    ("agg", "E. Aggregation"),
    ("win", "F. Windows"),
    ("sort", "G1. Sort / limit"),
    ("set", "G2. Set ops"),
    ("sql", "G3. SQL surface"),
    ("fn", "H. Scalar functions"),
    ("stream", "I. Structured Streaming"),
    ("tpch", "D+. TPC-H adaptations"),
    ("llm", "K. LLM-data-pipeline extensions"),
    ("q", "L. Flagship"),
]

FN_ARG = ("pure per-row expression family: map-side, whole-stage "
          "codegen, zero shuffle at any scale")

EVIDENCE = {
    # ----- A. scans: a scan IS the linear baseline; pruning keys cost
    # selected-partition/column-sized, never corpus-sized.
    "scan_csv": (B, "linear-scan", "splittable text scan, explicit schema — parallelism grows with input files/blocks"),
    "scan_csv_gzip": (B, "linear-scan", "gzip is non-splittable: one task per FILE (documented in-key); scale path is many files, which the file source parallelizes over"),
    "scan_csv_permissive": (B, "linear-scan", "PERMISSIVE parse is per-row map work; corrupt capture adds one column, no state"),
    "scan_csv_multiline": (B, "linear-scan", "multiLine forces per-file tasks (documented); scale path is file count"),
    "scan_csv_delim": (B, "linear-scan", "per-row decode with custom delimiter/charset, map-side"),
    "scan_csv_inferschema": (B, "linear-scan", "inference pass + read pass, both data-parallel; production path pins the schema to skip pass 1"),
    "scan_ignore_corrupt": (B, "linear-scan", "corrupt files skipped at task granularity; healthy-file work unchanged"),
    "scan_glob_filter": (B, "metadata-sized", "glob + pathGlobFilter select files at LISTING time — pruned files are never opened"),
    "scan_schema_evolution": (B, "linear-scan", "mergeSchema reconciles footers at planning; per-file read work unchanged"),
    "scan_parquet": (B, "linear-scan", "PushedFilters + ReadSchema plan-pinned: row-group skip + column prune make cost selected-data-sized"),
    "scan_partition_pruned": (B, "metadata-sized", "partition predicate resolved against the file index — unselected partitions never listed into the scan"),
    "scan_nested_pruned": (B, "linear-scan", "ReadSchema carries only touched struct leaves (plan-pinned); IO is pruned-leaf-sized"),
    "scan_orc": (B, "linear-scan", "ORC stripe-statistics pruning, same pushdown contract as parquet"),
    "scan_xml": (B, "linear-scan", "rowTag record split is per-file streaming parse; scale path is file count"),
    "scan_avro": (B, "linear-scan", "container block-splittable read via graft.sources.AvroIO"),
    "scan_json": (B, "linear-scan", "multiline JSON forces per-file tasks (documented); JSONL is the splittable path"),
    "scan_jsonl": (B, "linear-scan", "line-splittable JSON with explicit schema — no inference pass"),
    "scan_text": (B, "linear-scan", "raw line source, splittable; provenance via input_file_name is free metadata"),
    "scan_binaryfile": (B, "linear-scan", "one row per file with opaque content; parallelism = file count, no decode"),
    "scan_file_lineage": (B, "metadata-sized", "per-file min/max audit aggregates to file-count rows; the collect is file-list-sized, not data-sized"),
    # ----- B1. sinks: a write pass is linear by construction; the
    # interesting keys bound the REWRITE surface.
    "sink_parquet": (B, "linear-scan", "partition-parallel write; one task per output partition"),
    "sink_parquet_partitioned": (B, "linear-scan", "partitionBy(dt) write; driver r8 headline key (1.1-1.9 s band at sf0.1)"),
    "sink_overwrite_dynamic": (B, "output-sized", "dynamic overwrite replaces only TOUCHED partitions — rewrite surface is incoming-data-sized, never table-sized"),
    "sink_parquet_bloom": (B, "linear-scan", "bloom columns add per-row-group filter bytes at write; IN-probe read-back row-group-skips (spec-pinned)"),
    "sink_compaction": (B, "output-sized", "rewrite cost is the compacted partition's size; target file count fixed"),
    "sink_range_partitioned": (B, "linear-scan", "repartitionByRange = sample + one range shuffle + write; range files enable band pruning downstream"),
    "sink_zorder": (M, "x8 1.3x (r6)", "interleaved-bit keys are map-side; the z-sort is one range shuffle"),
    "sink_csv": (B, "linear-scan", "quoting/escape round trip is per-row encode"),
    "sink_json": (B, "linear-scan", "JSONL encode is per-row map work"),
    # ----- B2. catalog
    "catalog_register": (B, "linear-scan", "saveAsTable is one write pass + one catalog entry; read-back a plain scan"),
    "catalog_recover_partitions": (B, "metadata-sized", "MSCK walks the directory tree — partition-count-sized, zero data read"),
    "catalog_analyze_stats": (B, "linear-scan", "one stats pass (count/min/max partial aggs); output is per-column catalog metadata"),
    # ----- B3. ETL
    "etl_merge_upsert": (M, "x8 1.1x (r6)", "anti-join/union MERGE rewrite; shuffle keyed on the merge key"),
    "etl_delete_rewrite": (B, "output-sized", "file-level victim prune: only files CONTAINING victims are rewritten — cost is affected-file-sized"),
    "etl_vacuum": (M, "x8 1.1x (r7)", "retention scan is version-directory metadata; reclaimed-count read partition-pruned — corpus size never enters"),
    "etl_time_travel": (B, "metadata-sized", "version resolution is a manifest read; the chosen snapshot is then a plain pruned scan"),
    "etl_partition_backfill": (M, "x8 1.3x (r6)", "spine diff is partition-metadata-sized; rebuild partition-pruned to missing partitions (fixture staging dominates the bench number)"),
    "etl_schema_drift": (B, "linear-scan", "drift reconciliation is a schema-level computation + one pass over the incoming batch only"),
    "etl_k_anonymize": (B, "linear-scan", "generalization is map-side bucketing; the k-filter one grouped count"),
    "etl_pipeline": (B, "linear-scan", "bronze->silver->gold stages are each one pass; per-stage accounting via Observation, no second scan"),
    "etl_dq_report": (B, "linear-scan", "rule metrics are partial aggs off one pass; referential check joins broadcast dims"),
    "etl_scd2_diff": (B, "linear-scan", "key-partitioned diff join of current vs incoming; state per business key"),
    "etl_observe": (B, "linear-scan", "Observation metrics collected off the same pass — zero extra scan by construction"),
    "etl_orphan_audit": (M, "x8 0.6x (r8)", "manifest-less debris detection is file-listing metadata work; ratio inside fixed-cost noise"),
    # ----- C
    "project_select": (B, "linear-scan", "column-pruned scan (ReadSchema pinned); map-side only"),
    "project_rename": (B, "linear-scan", "alias-only projection, zero compute"),
    "project_cast": (B, "linear-scan", "per-row casts incl. the decimal(18,2) money convention, codegen'd"),
    "project_derive_partition": (B, "linear-scan", "derived partition column is one date_format per row"),
    "filter_predicate": (B, "linear-scan", "compound predicates pushed to the scan (PushedFilters plan-pinned)"),
    "filter_null_handling": (B, "linear-scan", "null-semantics expressions are map-side, codegen'd"),
    "dedup_exact": (B, "linear-scan", "one hash-partitioned shuffle keyed on the full-row hash; group partials only"),
    "typed_dataset": (B, "linear-scan", "Encoder round trip adds ser/de per row, no shuffle"),
    # ----- D. joins
    "join_inner": (B, "broadcast-dim", "dim side broadcast by stats; fact side never shuffles"),
    "join_broadcast": (B, "broadcast-dim", "explicit broadcast() of the small dimension — zero fact shuffle at any fact size"),
    "join_sortmerge": (B, "linear-scan", "the big-big shape: one key-partitioned shuffle + sort each side, SMJ streams — no state beyond sorted runs"),
    "join_shuffled_hash": (B, "linear-scan", "one shuffle each side; build-side hash map is partition-sized (AQE re-plans if it would not fit)"),
    "join_outer": (B, "linear-scan", "key-partitioned full outer; null completion is streamed, no extra state"),
    "join_semi": (B, "linear-scan", "LEFT SEMI carries keys only on the build side"),
    "join_anti": (B, "linear-scan", "LEFT ANTI, same key-only build as semi"),
    "join_null_safe": (B, "linear-scan", "<=> equi-join shuffles on the null-safe key like any equi-join"),
    "join_theta": (B, "pair-set-bounded", "value-band candidates from a bucket equi-join + exact residual — no cartesian at any scale"),
    "join_range": (B, "pair-set-bounded", "overlapping-bucket candidates + exact residual predicate; candidate volume is bucket-occupancy-sized"),
    "join_asof": (B, "key-cardinality", "union + per-key ordered window — one key-partitioned sort, no cartesian"),
    "join_asof_tolerance": (B, "key-cardinality", "as-of window with staleness filter; same union+window shape"),
    "join_asof_nearest": (B, "key-cardinality", "bidirectional as-of = two ordered passes per key"),
    "join_interval": (M, "x8 5.8x (r6)", "interval-bucketed candidate probe, linear in fact rows; output constant across scales"),
    "join_fuzzy_blocked": (M, "x8 7.3x (r6; redesigned from 59x)", "SymDelete deletion-variant equi-join candidates — the measured redesign that killed the quadratic blocking"),
    "join_spatial_grid": (M, "x8 28.7x (r7)", "sublinear in its own output: fixed-world 8x points = 64x pair density, output measured 63.9x; per-candidate work flat"),
    "join_lateral": (B, "output-sized", "correlated expansion per outer row — cost is the expanded result itself"),
    "join_subquery": (B, "broadcast-dim", "EXISTS/scalar subqueries rewrite to semi/broadcast joins; scalar side is 1-row"),
    "join_salted": (B, "linear-scan", "deterministic salt split bounds the hot key by the salt factor; result proven equal to unsalted"),
    "join_skew_aqe": (B, "linear-scan", "AQE OptimizeSkewedJoin splits oversized partitions at runtime (plan-pinned)"),
    "join_dpp": (B, "output-sized", "dynamic partition pruning: fact scan cost is selected-partition-sized at runtime"),
    "join_runtime_filter": (B, "linear-scan", "runtime bloom/semi filter drops fact rows BEFORE the shuffle; filter itself is dim-key-sized"),
    "join_bucketed": (M, "x8 1.4x (r5)", "bucketBy-staged co-located join, zero Exchange (plan-pinned)"),
    # ----- E. aggregation
    "agg_groupby": (B, "linear-scan", "canonical partial-agg map-side combine; 6 groups — driver headline key, flat across rounds"),
    "agg_global": (B, "linear-scan", "no-key aggregate: partials to one row"),
    "agg_distinct": (B, "key-cardinality", "two-phase distinct; shuffle sized by distinct composite keys"),
    "agg_count_distinct": (B, "key-cardinality", "expand + two-phase exact distinct; shuffle sized by distinct (group,value) pairs"),
    "agg_approx_distinct": (B, "linear-scan", "HLL++ partials are fixed-size registers per group; the exact-count audit column is a standard two-phase distinct"),
    "agg_approx_percentile": (B, "linear-scan", "GK sketch partials are accuracy-bounded per group; merge is sketch-sized"),
    "agg_hll_sketch_merge": (B, "linear-scan", "the 100 TB sketch pattern itself: per-shard fixed-size sketches, merge cost is shards x groups x sketch bytes"),
    "agg_bitmap_distinct": (B, "key-cardinality", "per-group distinct-set semantics; state bounded by the group's value domain"),
    "agg_approx_topk": (B, "key-cardinality", "heavy-hitter counts keyed by distinct values; top-k cut is k-bounded"),
    "agg_approx_topk_merge": (B, "key-cardinality", "per-shard partial summaries are k-bounded; merge input is shards x k rows"),
    "agg_rollup": (B, "vocab-bound", "expand by fixed grouping-set count; result bounded by the dim-domain product"),
    "agg_cube": (B, "vocab-bound", "expand x4 fixed; output bounded by dim domains"),
    "agg_grouping_sets": (B, "vocab-bound", "explicit sets = fixed expand factor; domain-bounded output"),
    "agg_conditional": (B, "linear-scan", "FILTER-clause aggregates are per-row guards on the same partials"),
    "agg_collect": (B, "output-sized", "collect_list/set carries group contents by definition — the result IS the data; per-group order made deterministic"),
    "agg_pivot": (B, "vocab-bound", "wide output = groups x pivot domain (status x priority)"),
    "agg_unpivot": (B, "linear-scan", "stack() melt is a fixed-factor map-side explode"),
    "agg_percentile": (B, "vocab-bound", "exact percentile state is the per-group value histogram — bounded by the quantity domain"),
    "agg_weighted_percentile": (M, "x8 0.8x (r6)", "histogram is price-cardinality-bound, not corpus-bound"),
    "agg_stats": (B, "linear-scan", "min/max/avg/stddev family: constant-size moment partials per group"),
    "agg_moments": (B, "linear-scan", "skewness/kurtosis via scaled central-moment partials, one pass"),
    "agg_regression": (B, "linear-scan", "regr_* family reduces to 6 moment partials per group"),
    "agg_entropy": (B, "key-cardinality", "per-(group,value) counts then one log pass; state is distinct-pair-sized"),
    "agg_salted": (B, "linear-scan", "two-stage salted agg: both stages map-side-combined; intermediate is groups x salt"),
    "agg_mode": (B, "key-cardinality", "mode over distinct (group,value) counts; tie-break window runs on the count table, not rows"),
    "agg_median": (B, "vocab-bound", "exact median via percentile state — value-histogram-sized per group"),
    "agg_outlier_mad": (B, "vocab-bound", "two median passes over the bounded value histogram"),
    "agg_bool": (B, "linear-scan", "bool_and/or/count_if are 1-bit partials"),
    "agg_string_agg": (B, "output-sized", "listagg carries group contents; deterministic order via in-group sort"),
    "agg_custom_vector_mean": (B, "linear-scan", "typed Aggregator partial = one 64-dim scaled-long sum per group"),
    "agg_countmin": (M, "x8 1.7x / x64 2.4x (r8)", "sketch built from per-key distinct counts (pre-agg rewrite measured 2.2->0.58 s); cell table d*w-bounded broadcast"),
    "agg_equidepth_hist": (M, "x8 0.8x (r8)", "cumulative window + fence explode over the bounded price-bucket domain"),
    "agg_gini": (M, "x8 1.1x (r8)", "tied-rank identity on the bounded dollar histogram — never sorts rows"),
    "agg_ab_ttest": (M, "x8 0.9x (r8)", "one corpus pass into three integer moments per type; rest is a 5-row broadcast"),
    "agg_benford": (M, "x8 1.0x (r8)", "one (group,digit) count shuffle; deviation table is 45 rows at any scale"),
    # ----- F. windows
    "win_rank": (B, "key-cardinality", "window partitioned by group key; per-partition sort only"),
    "win_distribution": (B, "key-cardinality", "ntile/percent_rank over key partitions"),
    "win_lag_lead": (B, "key-cardinality", "per-key ordered access, single pass"),
    "win_running_sum": (B, "key-cardinality", "running frame per key; no global window"),
    "win_range_frame": (B, "key-cardinality", "RANGE frame per key over the value band"),
    "win_topk_per_group": (B, "fixed-cut", "custom TopKPerGroup physical operator: per-partition k-bounded heaps, no full sort (plan-pinned)"),
    "win_topk_custom": (B, "key-cardinality", "window-function twin of the custom plan; rank filter k-bounded per key"),
    "win_session_batch": (B, "key-cardinality", "gap detection per user partition"),
    "win_funnel": (B, "key-cardinality", "ordered step matching per user"),
    "win_retention": (B, "bounded-series", "cohort matrix output is weeks x weeks regardless of corpus"),
    "win_streak": (B, "key-cardinality", "gaps-and-islands per user partition"),
    "win_gap_fill": (B, "bounded-series", "calendar spine bounded by the date span, not row count"),
    "win_resample_ohlc": (B, "bounded-series", "OHLC bars bounded by time buckets x types"),
    "win_ewma": (B, "bounded-series", "closed-form prefix scan over the bounded hourly series"),
    "win_anomaly_zscore": (B, "bounded-series", "rolling stats over the bounded series"),
    "win_rolling_corr": (B, "bounded-series", "two bounded series, fixed window"),
    "win_cumulative_distinct": (M, "x8 ~1x (r6)", "bounded hourly series — input growth never reaches the window"),
    "win_pattern_match": (M, "x8 1.6x (r6)", "per-user sequences bounded; growth is the user-keyed shuffle"),
    "win_drawdown": (M, "x8 1.0x (r7)", "time-bounded hourly series; agg pass amortized"),
    "win_trend_mann_kendall": (M, "x8 1.1x (r7)", "pairwise S on the bounded series — constant in corpus size"),
    "win_cusum_changepoint": (M, "x8 1.0x (r8)", "prefix-sum/prefix-min closed form on the bounded series"),
    "win_seasonal_profile": (M, "x8 1.0x (r8)", "24 x types output at any corpus size"),
    "win_theil_sen": (M, "x8 1.1x (r8)", "pairwise slopes on the bounded series"),
    "win_attribution": (M, "x8 1.3x (r8)", "user-keyed equi-join; per-purchase windows bounded by 24 h per-user activity"),
    "win_autocorr": (M, "x8 1.0x (r8)", "bounded hourly series; lag self-join span-sized at any corpus"),
    "win_forecast_naive": (M, "x8 1.1x (r8)", "bounded hourly series, the winAutocorr class"),
    # ----- G
    "sort_global": (B, "linear-scan", "range-partitioned total order: sample + one range shuffle, per-partition sorts"),
    "sort_topk": (B, "fixed-cut", "TakeOrderedAndProject (plan-pinned): per-partition k-heaps, no full sort"),
    "sort_skyline": (M, "x8 4.6x (r6; after measured grid-prune fix)", "strict-dominance grid prune bounds the pairwise verify"),
    "set_union": (B, "linear-scan", "UNION ALL is free; DISTINCT adds one row-hash shuffle"),
    "set_union_by_name": (B, "linear-scan", "column alignment is schema work; union is concat"),
    "set_intersect": (B, "key-cardinality", "two-phase distinct shuffle on row hash"),
    "set_intersect_all": (B, "key-cardinality", "bag semantics via per-row counts — distinct-row-sized state"),
    "set_except": (B, "key-cardinality", "anti-style distinct shuffle"),
    "set_except_all": (B, "key-cardinality", "count-difference bag semantics, distinct-row state"),
    "sql_recursive_cte": (B, "edge-rounds", "recursion is one equi-join per level, bounded by hierarchy depth"),
    "sql_pipe": (B, "linear-scan", "pipe syntax lowers to the same Catalyst plan as the method chain"),
    "sql_join_hint": (B, "broadcast-dim", "hint surface resolves to broadcast/SMJ/SHJ strategies — plan-pinned, no new shape"),
    # ----- H. scalar fns: one shared argument, map-side by construction
    "fn_string": (B, "linear-scan", FN_ARG),
    "fn_regex": (B, "linear-scan", FN_ARG),
    "fn_math": (B, "linear-scan", FN_ARG),
    "fn_bitwise": (B, "linear-scan", FN_ARG),
    "fn_misc": (B, "linear-scan", FN_ARG),
    "fn_fuzzy": (B, "linear-scan", FN_ARG),
    "fn_mask": (B, "linear-scan", FN_ARG),
    "fn_crypto": (B, "linear-scan", FN_ARG),
    "fn_collation": (B, "linear-scan", FN_ARG),
    "fn_datetime": (B, "linear-scan", FN_ARG),
    "fn_datetime2": (B, "linear-scan", FN_ARG),
    "fn_conditional": (B, "linear-scan", FN_ARG),
    "fn_array": (B, "linear-scan", FN_ARG),
    "fn_array_higher_order": (B, "linear-scan", FN_ARG),
    "fn_map": (B, "linear-scan", FN_ARG),
    "fn_map_higher_order": (B, "linear-scan", FN_ARG),
    "fn_json": (B, "linear-scan", FN_ARG),
    "fn_variant": (B, "linear-scan", FN_ARG),
    "fn_try": (B, "linear-scan", FN_ARG),
    "fn_url": (B, "linear-scan", FN_ARG),
    # ----- I. streaming
    "stream_ingest": (B, "linear-scan", "file-arrival source: per-batch work is batch-sized, exactly-once per file, zero state"),
    "stream_window_tumbling": (B, "state-bounded", "watermark expires closed windows; state = open windows x keys"),
    "stream_window_sliding": (B, "state-bounded", "overlap assignment is map-side; state = open sliding windows x keys"),
    "stream_window_session": (M, "x8 1.9x (r7)", "session merge state bounded by open windows x keys; steepest of the state tier because merge work grows with per-key density"),
    "stream_watermark": (B, "state-bounded", "late rows dropped at the watermark — state horizon-bounded by construction"),
    "stream_dedup": (B, "state-bounded", "dropDuplicates state lives within the watermark horizon only"),
    "stream_stateful_session": (M, "x8 1.4x (r7)", "mapGroupsWithState: live-session-bound — closed sessions emitted and dropped"),
    "stream_transform_with_state": (M, "x8 1.3x (r7)", "transformWithState per-key running state: key-cardinality-bound, per-batch work incoming-sized"),
    "stream_join": (B, "state-bounded", "stream-stream inner join state within watermark bounds on both sides"),
    "stream_join_outer": (M, "x8 3.8x (r7)", "join state data-sized within the watermark horizon — expected near-linear-in-state, sublinear in total"),
    "stream_join_right_outer": (B, "state-bounded", "same watermark-bounded state as the measured left-outer twin"),
    "stream_join_full_outer": (B, "state-bounded", "same watermark-bounded state as the measured left-outer twin"),
    "stream_static_join": (B, "broadcast-dim", "stateless enrich against a broadcast static dimension"),
    "stream_foreach_batch": (B, "linear-scan", "per-batch idempotent write; work batch-sized"),
    "stream_merge_upsert": (B, "linear-scan", "per-batch MERGE: cost per batch is batch + affected-file-sized"),
    "stream_dedup_minhash": (M, "x8 3.6x (r7)", "band-hash state grows with distinct docs; per-batch probe work incoming-sized"),
    "stream_incremental_dedup": (M, "x8 3.1x / x64 17.6x (r11); STEADY STATE MEASURED: 16 batches on x8, per-batch wall FLAT at 1.65-2.65 s (mean 1.98) while the index grows 0 -> 37.5k rows (BASELINE.md r11 profile)", "per-batch: signature build over ARRIVING docs (linear in arrivals — the 2-batch key's x64 row measures intake of the whole corpus, which is why the steady-state profile exists), then fp equi-join + 6-band probe of the maintained index (incoming x bucket occupancy). Index chain: append one level-0 run per batch + SIZE-TIERED COMPACTION (4 same-level runs merge one level up) — every row rewritten <= log4(batches) times, live dirs <= 3*log4(batches)+1 (measured: <= 7 dirs, 5 merges over 16 batches); batchId-keyed _SUCCESS-guarded idempotent dirs"),
    "stream_semdedup": (M, "x8 1.7x / x64 3.7x (r14: 2.55/4.44/9.48 s)", "streaming semantic dedup over the chained LSH index (the stream_incremental_dedup shape on vectors, completing the batch/stream dedup symmetry): each arriving batch gets its cosine>=0.4 verdict against the PRE-batch chain only — bucket rows hashed map-side, ids-only (tbl,bucket) equi-join for candidates, embeddings re-attached by id for scoring, dup_of = smallest earlier id — then appends its own bucket rows as a level-0 run. Per-batch verdict work is the occupancy-bounded candidate set of the arrivals; the corpus never rescans and merge/vacuum timing cannot change a verdict (pre-batch chain contents are a set). Verdicts equal the batch near-dup pair set exactly (Round14Spec pins vs llm_embed_neardup_lsh; the oracle replays the even/odd half-split)"),
    "stream_lsh_index": (M, "x8 1.5x / x64 3.2x (r13: 2.0/3.0/6.4 s)", "incremental LSH bucket-index maintenance — the hyperplane twin of stream_ann_index on the same tiered run chain: arriving batches hash bucket rows map-side at the bits pinned at index build (plan-literal rotated planes, O(arrivals * L * bits) dots per batch), commit level-0 runs partitioned by hash table, merge 4-at-a-level, vacuum retired runs. The post-ingest derivation probes the chained index ids-only and equals llm_ann_lsh's top-50 exactly (shared AnnLshOracle; bucket contents are a set, so batch boundaries and merge timing cannot change them)"),
    "stream_ann_index": (M, "STEADY STATE MEASURED (r13): 16 batches on x8, steady batch wall 1.67-2.8 s (merge batches to 6.5 s, 5 amortized merges) while the index grows 0 -> 15k rows; TIERED CHAIN bounds live files at 768 max / 128 final (was 1,919 append-only at r12), end-of-stream vacuum reclaims 20 run dirs / 2,559 files, probe 0.60 s partition-pruned per run. Key wall 2.3/4.2/13.2 s at sf0.1/x8/x64 — the 2-half x64 intake assigns 64k-vector batches 32-way (the input spread; single-writer form measured 47 s)", "incremental IVF maintenance on the Bentley-Saxe run chain (VERDICT r12 #1 delivered): each batch assigns cells map-side (fused BestCentroid argmax against broadcast centroids) and commits a level-0 run of ONLY its rows; 4 same-level runs merge into one run a level up repartitioned to one file per cell — every row rewritten <= log4(batches) times, live files bounded by runs*cells, merge timing cannot change cell contents (batch-twin spec pins it). End-of-stream vacuum unlinks retired runs (disk is live-chain-sized)"),
    "stream_incremental_agg": (M, "x8 1.4x (r7)", "per-key running aggregate: key-cardinality-bound state, checkpoint fixed cost dominates"),
    "stream_topk": (B, "state-bounded", "heavy-hitter state k-bounded per group per update"),
    "stream_window_distinct": (M, "x8 1.6x (r5)", "chained stateful aggs; checkpoint fixed cost amortizing"),
    "stream_resample_ohlc": (M, "x8 1.4x (r7)", "per-(bucket,type) OHLC state: time-span-bound, not data-bound"),
    "stream_countmin": (M, "x8 1.1x (r8)", "bounded-state class: per-batch work is batch + d*w cells; maintained sketch 12,288 rows at any stream length"),
    # ----- TPC-H: classic pushdown + broadcast-dim + partial-agg shapes;
    # q_flagship carries the measured row for the family.
    "tpch_q1": (B, "linear-scan", "pure scan-filter-agg with 4-group partials"),
    "tpch_q2": (B, "broadcast-dim", "min-cost supplier over broadcast region/nation/supplier dims"),
    "tpch_q3": (B, "linear-scan", "the flagship's shape: see q_flagship's measured row"),
    "tpch_q4": (B, "linear-scan", "EXISTS semi carries order keys only"),
    "tpch_q5": (B, "broadcast-dim", "local-supplier volume: dims broadcast, one fact shuffle"),
    "tpch_q6": (B, "linear-scan", "pure scan-filter-agg, fully pushed down"),
    "tpch_q7": (B, "broadcast-dim", "nation pair filter on broadcast dims, fact shuffles once"),
    "tpch_q8": (B, "broadcast-dim", "market-share: dims broadcast, year partials"),
    "tpch_q9": (B, "linear-scan", "profit measure: part filter prunes before the fact joins"),
    "tpch_q10": (B, "fixed-cut", "top-20 customers via TakeOrdered after grouped agg"),
    "tpch_q11": (B, "key-cardinality", "group share vs a 1-row global threshold (broadcast scalar)"),
    "tpch_q12": (B, "linear-scan", "shipmode split is a filtered partial agg"),
    "tpch_q13": (B, "key-cardinality", "outer join + order-count histogram, customer-keyed"),
    "tpch_q14": (B, "linear-scan", "promo share: one filtered pass"),
    "tpch_q15": (B, "key-cardinality", "top supplier vs max-revenue scalar subquery (1-row broadcast)"),
    "tpch_q16": (B, "key-cardinality", "relation counts with NOT IN exclusion on a broadcast list"),
    "tpch_q17": (B, "key-cardinality", "per-part avg subquery joined back part-keyed"),
    "tpch_q18": (B, "key-cardinality", "HAVING threshold on order-keyed partials"),
    "tpch_q19": (B, "linear-scan", "disjunctive predicate pushed to the scan"),
    "tpch_q20": (B, "key-cardinality", "nested semi with exact threshold, part/supplier-keyed"),
    "tpch_q21": (B, "key-cardinality", "multi-exists/anti per supplier-order"),
    "tpch_q22": (B, "linear-scan", "avg-balance scalar (1-row broadcast) + anti join"),
    # ----- K. LLM tier
    "llm_lang_id": (B, "linear-scan", "n-gram profile scoring is per-doc map work against broadcast profiles"),
    "llm_token_count": (B, "linear-scan", "per-doc regex token counting, zero shuffle"),
    "llm_quality_score": (B, "linear-scan", "length/punct/stopword ratios per doc"),
    "llm_quality_classifier": (B, "linear-scan", "rule gates + logistic-style score, map-side"),
    "llm_text_stats": (B, "linear-scan", "per-doc char/word/line stats"),
    "llm_fingerprint": (B, "linear-scan", "content/bag/rolling-hash fingerprints per doc"),
    "llm_pii_redact": (B, "linear-scan", "regex redaction with per-doc audit counts"),
    "llm_chunk_text": (B, "linear-scan", "fixed-token chunking: per-doc explode, output chunk-sized"),
    "llm_repetition_ratio": (B, "linear-scan", "intra-doc array lambdas, zero shuffle"),
    "llm_gopher_rules": (B, "linear-scan", "per-doc quality gates"),
    "llm_length_histogram": (B, "vocab-bound", "bounded length buckets"),
    "llm_ngram_freq": (M, "x8 1.2x / x64 2.4x (r12)", "map-side explode linear; count table observed-n-gram-vocab-sized; the generator input now carries only a cheap position sequence (hash/pair work in the codegen'd Project above the Generate — the r12 GenerateExec-interpreted-input fix)"),
    "llm_cooccurrence_pmi": (M, "x8 4.1x (r6)", "pair explode linear; count tables vocab-bound"),
    "llm_vocab_build": (M, "corpus x8 -> +60% cost (r5)", "vocab-bound by construction, measured holding"),
    "llm_tokenize_apply": (M, "x8 7.8x (r5)", "~linear: per-doc greedy segmentation against the broadcast vocab"),
    "llm_bpe_train": (M, "x8 1.6x (r5)", "merge-rule iteration is vocab-bound, measured holding"),
    "llm_unigram_lm_vocab": (M, "x8 1.1x / x64 1.3x (r13: 1.12/1.21/1.47 s)", "the prune loop PARAMETERIZED to a target vocab size (VERDICT r12 #4): 3 fixed unrolled EM+prune rounds (the pagerank/kcore convention — the oracle replays every round; round-boundary CTEs MATERIALIZED so DuckDB's inlining cannot expand the round tree exponentially), each cutting min(20% of multi pieces, excess over V) where V = |chars| + 16 is computed identically by both engines; chars are never pruned (the coverage floor), a round at/under target is a pure re-segment. Same scale shape as llm_unigram_lm_train: every E-step is one distinct-words-table pass, driver arithmetic seed-bounded (<= ~250-row collects)"),
    "llm_unigram_lm_train": (M, "x8 1.0x / x64 1.0x FLAT (r13: 1.10/1.06/1.13 s; r11 numbers predate the md5-mask corpus restaging)", "training never touches the corpus after the ONE word-frequency aggregation: seed substring counting, the Viterbi hard-EM DP, and usage re-estimation all run on the distinct-word table; seed vocab collect bounded by construction (192 multi-char pieces + alphabet, the kmeansCentroids collect class) and ships as one map literal"),
    "llm_bpe_apply": (B, "linear-scan", "per-word segmentation against broadcast merge rules"),
    "llm_tokenizer_fertility": (B, "key-cardinality", "tokens-per-word rollup per language"),
    "llm_pack_sequences": (B, "key-cardinality", "running token budget per language shard window"),
    "llm_span_corruption": (B, "linear-scan", "deterministic span masks per doc"),
    "llm_unigram_logprob": (B, "vocab-bound", "corpus-unigram table is vocab-sized; scoring joins on token"),
    "llm_bigram_lm_score": (M, "x8 3.4x / x64 4.5x (r12; r7: x8 5.6x)", "two corpus passes + (p,w)-keyed scoring join; bigram table grows with observed vocab; the generator input now carries only a cheap position sequence (hash/pair work in the codegen'd Project above the Generate — the r12 GenerateExec-interpreted-input fix)"),
    "llm_zipf_slope": (M, "x8 2.2x (r7)", "vocab-bound rank fit on top-1000 terms; corpus token pass dominates"),
    "llm_perplexity_bucket": (B, "key-cardinality", "per-language terciles, no global window"),
    "llm_dsir_weight": (M, "x8 4.1x / x64 10.2x (r5/r6)", "4096-cell hashed LM broadcast; corpus pass dominates"),
    "llm_domain_mix": (B, "key-cardinality", "per-source token totals + power-law weights on the source table"),
    "llm_domain_cap": (B, "key-cardinality", "rank window within domain partitions"),
    "llm_mix_resample": (B, "linear-scan", "deterministic hash draw per doc against broadcast target weights"),
    "llm_sample_split": (B, "linear-scan", "hash-based split, map-side"),
    "llm_sample_stratified": (B, "linear-scan", "per-language hash threshold, map-side"),
    "llm_sample_reservoir": (B, "fixed-cut", "deterministic fixed-size sample via TakeOrdered on a hash key"),
    "llm_shuffle_shards": (B, "linear-scan", "salted-hash shard assignment + in-shard position window (shard-keyed partitions)"),
    "llm_leakage_safe_split": (B, "linear-scan", "hash split joined with the cluster map (cluster-keyed equi-join)"),
    "llm_decontaminate": (B, "broadcast-dim", "benchmark n-grams are eval-set-sized and broadcast; candidates from exact-match equi-join"),
    "llm_decontaminate_bloom": (B, "broadcast-dim", "m-bounded Bloom broadcast pre-filter, exact confirm join on survivors only"),
    "llm_contamination_overlap": (B, "broadcast-dim", "train/eval overlap vs broadcast eval n-grams"),
    "llm_ngram_novelty": (B, "vocab-bound", "novelty join keyed on n-gram; reference table observed-vocab-sized"),
    "llm_dataset_card": (B, "key-cardinality", "per-source/lang rollup; card is domain-sized"),
    "llm_corpus_pipeline": (B, "linear-scan", "composition of linear gates + banded dedup + domain rollups — each stage individually classified here"),
    "llm_dedup_exact": (B, "linear-scan", "hash group on content digest, keep-min-id"),
    "llm_dedup_minhash": (M, "x8 2.6x (r5)", "band equi-join candidates only; signature table staged"),
    "llm_dedup_ngram_jaccard": (B, "pair-set-bounded", "exact Jaccard re-score of LSH candidates only"),
    "llm_dedup_simhash": (B, "linear-scan", "64-bit fingerprints via the SimHashBands codegen Expression, map-side"),
    "llm_dedup_simhash_pairs": (M, "x8 12.4x (r5)", "superlinear in data but bounded by its own pair output: hamming<=3 pair set grew 15.8x at x8 (r6 profile); candidates from 4x16 pigeonhole band equi-join only"),
    "llm_minhash_containment": (B, "pair-set-bounded", "asymmetric containment over banded candidates only"),
    "llm_setsim_join": (M, "x8 6.8x / x64 52.6x on 64x output (r6)", "PPJoin prefix postings; sublinear in input AND its own 64x-grown output"),
    "llm_dedup_eval": (M, "x8 1.2x / x64 5.5x (r12, staged truth + agreement logs; r6: x8 3.4x)", "75% stratum audit off the STAGED verified-truth and scored-candidate logs (r12 — the five truth consumers each re-ran the PPJoin verify per invocation, ~2.8 s at sf0.1 profiled; a production audit stack stages both logs once, the embedPairs precedent); the audit itself is one pair-set-sized full-outer join + a 5-integer agg. The LIVE PPJoin operator stays measured as llm_setsim_join"),
    "llm_simhash_eval": (M, "x64 19.9x (r12, truth staged; r8: 25.1x)", "audit bounded by its own predicted-pair output; the deliberately-bad unigram featurization grows the pair set superlinearly (that IS the key's finding), wall clock stays ~0.3x-of-linear; truth side now a staged-log read"),
    "llm_simhash_shingle_eval": (M, "x8 1.7x / x64 10.0x on its own pair set (r12, truth staged; sf0.1 wall 2.57 -> 0.26 s)", "post-stratum: truth and prediction pair-set-bounded on the 75% stratum; truth side a staged-log read since r12"),
    "llm_minhash_lsh_tune": (M, "x8 2.2x (r7)", "4 band joins over the shared persisted signature table"),
    "llm_dedup_clusters": (B, "edge-rounds", "connected components: min-label rounds, each one edge equi-join over the verified pair set"),
    "llm_dedup_cluster_stats": (B, "output-sized", "histogram over components — component-count-sized"),
    "llm_cluster_representative": (B, "key-cardinality", "quality argmax per cluster via cluster-keyed window"),
    "llm_paragraph_dedup": (M, "x8 2.7x (r6)", "paragraph-hash group + doc reconstruction"),
    "llm_substring_dedup": (M, "x8 1.5x / x64 4.3x (r13 re-measured; r12 close read 7.1x with ambient scatter in both endpoints; r6: 6.2x/12.0x)", "winnowing-anchor spans; exact span set grows with replicated families; the generator input carries only a cheap position sequence (hash/pair work in the codegen'd Project above the Generate — the r12 GenerateExec-interpreted-input fix). r13 chase (VERDICT r12 #5): min-of-3 idle re-measurement puts x64 at 4.7-5.5 s vs sf0.1 1.30 s = 3.6-4.3x — already below the family ~5x line; the residual super-linearity is the DATA's (the replicated x64 corpus makes ~every gram duplicated, so the post-semi-join window shuffle is corpus-sized at x64 vs a small fraction at sf0.1 — the simhash_eval output-growth class)"),
    "llm_dedup_source_matrix": (M, "x8 5.0x / x64 7.2x (r10)", "exact tier = fp groupBy rejoined to keeper; near tier rides the persisted LSH pipeline; matrix <= sources^2 rows; source lookups are 2-column joins"),
    "llm_span_quality_gate": (M, "x8 1.6x / x64 4.1x (r12)", "rides the attribution span table (O(grams) pipeline + dup-span-set-sized election); the gate adds one doc-keyed interval-union window over CUT spans only + a left join to per-doc token counts; one row per document"),
    "llm_span_attribution": (M, "x8 1.6x / x64 5.6x (r12; r10: 5.5x/12.2x)", "rides llm_substring_dedup O(grams) pipeline (the generator input now carries only a cheap position sequence (hash/pair work in the codegen'd Project above the Generate — the r12 GenerateExec-interpreted-input fix) — sf0.1 wall 2.31 -> 1.17 s); span fingerprint is island-sized ordered fold over DUPLICATED grams only; keeper election one span-fp-keyed agg (dup-span-set-sized) - content-hash grouping replaces any pair join"),
    "llm_winnow_fingerprint": (M, "x8 1.4x / x64 4.6x (r12; r6: 6.9x/21.1x)", "fingerprint windows track the corpus; the generator input now carries only a cheap position sequence (hash/pair work in the codegen'd Project above the Generate — the r12 GenerateExec-interpreted-input fix) — sf0.1 wall 2.42 -> 0.53 s, the suite's single largest r12 key-level win"),
    "llm_incremental_dedup": (M, "x8 0.8x (r6)", "new batch probes boundary-crossing candidates only"),
    "llm_semdedup": (M, "x8 2.5x / x64 2.1x (r12 on the fixed-mask corpus; r11: 2.0x/1.2x)", "embedding-cluster near-dups above the cosine cut; candidates within cells. The k PROP N rule is now DERIVED (nlist = max(16, n/125), same rule in the oracle) and measured: cell occupancy stays ~125 at any corpus so the within-cell pairwise stage is flat — 1.2x wall on 64x data. CellOccupancySpec demonstrates k=32/64 on 4x/8x scaled corpora with occupancy <= 3x mean"),
    "llm_url_canonicalize": (B, "linear-scan", "per-URL normalization + hash dedup group"),
    "llm_shingle_stream": (B, "linear-scan", "shingle explode shared upstream of the sketch tiers; output shingle-sized"),
    "llm_embed_neardup": (B, "fixed-cut", "explicitly the bounded-corpus brute-force BASELINE; the scale path is llm_embed_neardup_lsh"),
    "llm_embed_neardup_lsh": (M, "x8 1.7x / x64 4.5x (r12, rotated planes; was 41.1x at r11)", "rotated-hyperplane buckets; ids-only exchange, candidates from bucket equi-join; shares llm_ann_lsh's three r12 fixes (rotation, staging mask, codegen'd union bucket build) and its occupancy pin"),
    "llm_cosine_pair": (B, "fixed-cut", "fixed pair list broadcast; DotProduct codegen per pair"),
    "llm_topk_similarity": (B, "fixed-cut", "one query broadcast; linear scan + TakeOrdered top-k, zero shuffle"),
    "llm_ann_lsh": (M, "x8 1.4x / x64 3.6x (r12, rotated planes; was 35.8x at r11)", "ROTATED-hyperplane buckets (rows of H*D2*H*D1, exactly orthogonal integer planes — the HD-composition decorrelation the r11 verdict named), candidates from the bucket equi-join; cost IS the pair set. The r11 35.8x decomposed into THREE fixed defects: (1) the independent +-1 planes' bit correlation 0.225 -> 0.05 under rotation (x64 max occupancy 199 -> 21 vs mean 7.8, CellOccupancySpec-pinned at sf0.1); (2) the scale corpus's per-copy sign mask was degenerate (2 distinct masks over 64 copies — all copies ONE point cloud; stage_scale.py r12 uses md5-parity masks, pair set back to the 2.0M design point); (3) the DOMINANT wall term was posexplode(array(bucketCol*)) routing sign-bit dots through GenerateExec's interpreted path (~4 us/dot vs ~0.4 us codegen; 33 s -> 0.9 s at x64) — the long table is now a per-table UNION of codegen'd Projects. bits = max(8, bitlength(n/8)) capped at 64 (past that, tables are the dial — llm_ann_lsh_tune measures that curve)"),
    "llm_ann_lsh_persisted": (M, "x8 1.9x / x64 5.5x probe-only (r13: 0.30/0.57/1.66 s; the in-plan key measures 0.99/1.66/3.49 s — the probe is 2.1-3.3x cheaper at every scale)", "the LSH build-once/probe-many path (VERDICT r12 #2, the llm_ann_ivf_persisted precedent): lshBucketLong's (vec_id, tbl, bucket) rows staged once as parquet (clustered by table, bucket-sorted), every probe self-joins the ids-only index and re-attaches embeddings by id for candidates only — the per-derivation 4-union bucket build (the r12 sf0.1 LSH regression's cost) moves to the staging, where production pays it; probe cost is the occupancy-bounded pair set, same as llm_ann_lsh"),
    "llm_ann_lsh_tune": (M, "x8 1.06x / x64 1.28x (r15: 1.10/1.16/1.42 s; was 3.5x at r12)", "the multi-table OR-amplification operating curve (VERDICT r11 #2): recall@10 vs exact truth + candidate volume per table count L in {1,2,4,8}. ONE bucket join serves every L (min-first-colliding-table per pair, sweep = threshold). r15 (VERDICT r14 #4): the truth audit now scores a FIXED 128-query hash sample (smallest md5('q_'||vec_id), TakeOrderedAndProject + broadcast, oracle-replayed) instead of vec_id%97 whose Q grew PROP N — the audit is O(Q*N), linear in N, and the x64 ratio fell 3.5x -> 1.28x"),
    "llm_ann_lsh_tune_bits": (M, "x8 1.05x / x64 1.80x (r15: 1.19/1.24/2.14 s; was 3.5x at r13)", "the (bits, L) operating grid (VERDICT r12 #3): the bits dial added to the tune key's min-table device via the PREFIX property — plane p's sign bit is independent of total width, so bucket@b = first b chars of the full bucket; ONE join on the coarsest prefix (a measured-size superset over the QUERY SAMPLE only, never all-pairs) yields every grid cell as a threshold. Published x8 curve (BASELINE r13, N/97 sample): bits=derived-6, L=8 reached recall@10 57.9% at ~3.5k candidates/query; r15 re-based on the fixed-128-query sample (VERDICT r14 #4 — audit now linear in N, hence the ratio drop)"),
    "llm_ann_lsh_tune_wide": (M, "x8 1.10x / x64 1.36x (r15: 2.33/2.56/3.17 s; was 2.1x at r14)", "the candidate-EFFICIENT grid arm (VERDICT r13 #1): L in {8,16,32,64} at derived and derived-2 bits, same one-coarsest-prefix-join device as the bits grid (L=8 rows spec-pinned identical to the bits grid, L=64 rows to the xl grid). The 100 TB fact it measures: with bits PROP log N pinning occupancy, candidates/query = L*occupancy is an ABSOLUTE number independent of corpus size (~250/500/1k/2k per query at BOTH x8 and x64 for the same (delta,L) cells) — and at matched candidate budgets the high-bits/wide-L arm beats the coarse-bits arm 2.5-4.2x on recall. Named x8 operating point (r15 fixed-128-query sample): derived-2, L=64 -> 63.3%@10 at 1,817 cand/query (r14 N/97 sample read 61.8% at 1,820 — same curve, different sample). The >=50%@10 crossing configs are gated by llm_ann_lsh_tune_xl since r15"),
    "llm_ann_lsh_tune_xl": (M, "x8 1.26x / x64 1.45x (r15: 4.00/5.03/5.81 s)", "the CROSSING arm of the wide grid (VERDICT r14 #1): L in {64,96,128} at derived and derived-2 bits, same one-coarsest-prefix-join device, L=64 column spec-pinned cell-for-cell to llm_ann_lsh_tune_wide (Round15Spec). Gates the named >=50%@10 operating point through the driver's oracle every round: x64 derived-2/L=128 reads 48.6%@10 at 3,870 cand/query = 3.0% of the corpus on the r15 fixed-128-query sample (the r14 N/97 sample read 51.6% at 3,863 — same config within sampling noise, sitting AT the floor); x8 crosses at derived/L=128 with NO bits discount (53.5% at 941 cand/q) and reads 84.8% at derived-2/L=128. Wall is the L=128 bucket-union build (codegen'd, linear in N) + the fixed-128-query truth audit (linear in N) — the heaviest grid key by design, disclosed: 4.0 s at sf0.1"),
    "llm_ann_lsh_planted": (B, "fixed-cut", "planted-margin recall audit, oracle-gated (the suite graduation of the r15 stage_planted/PlantedGridProbe dev measurement): partners at exact cosines {0.95,0.8,0.6} constructed IN-PLAN from the 128-anchor hash sample with strict-left-fold double arithmetic mirrored verbatim by the DuckDB oracle (bit-identical vectors, sign bits, and collision counts); per-(margin,bits,L) recall spec-pinned within binomial tolerance of the analytic 1-(1-p(c)^bits)^L (Round15Spec). O(Q*L*bits) past the sample scan — anchors and partners are both Q-sized, the corpus is never re-hashed, so the planted retention audit costs the same at any corpus size; the wide x8/x64 planted sweep stays with the dev probes (BASELINE r15 tables)"),
    "llm_ann_ivf": (M, "x8 1.0x / x64 2.7x (r12 on the fixed-mask corpus; r11: 1.4x/3.0x)", "fused-argmax assignment (BestCentroid codegen, k-independent generated code) + 2 probed cells; probed-cell size = N/k held flat by the derived k PROP N rule. Assignment is the honest O(N*k*dim) flat-IVF cost — at web scale (k ~ 1e5) production swaps that one map stage for a coarse-quantizer tree/GEMM"),
    "llm_ann_ivf_persisted": (M, "x8 1.2x / x64 4.5x (r12; r11: 1.6x/5.4x)", "the index-reuse path: cell-partitioned parquet index staged once, probe = partition pruning (nprobe/k of the corpus read); same derived k PROP N rule as llm_ann_ivf"),
    "llm_ann_ivf_kmeans": (M, "x8 1.4x / x64 3.3x (r12, k derived, capped at sample/4)", "centroids from a 4096-row bounded sample (TakeOrdered plan-pinned against driver-collect regression); k = min(max(16, n/125), 1024) so the strided init keeps >= 4 members per centroid — the sample's honesty bound"),
    "llm_ann_hamming": (M, "x8 1.2x (r6)", "2x32-bit sign codes; hamming coarse pass bucketed, rerank on survivors"),
    "llm_embedding_quantize": (B, "linear-scan", "per-vector int8 quantize + reconstruction error, map-side"),
    "llm_embedding_pq": (B, "vocab-bound", "codebook trained on a bounded sample; encoding map-side against broadcast codebooks"),
    "llm_ann_pq_adc": (B, "linear-scan", "ADC table broadcast; one map-side scan over codes, TakeOrdered cut"),
    "llm_ann_ivfpq": (M, "x8 1.5x / x64 4.6x (r12; r11: 1.4x/4.8x)", "probes the STAGED cell-partitioned index (partition pruning, shared with llm_ann_ivf_persisted) then PQ ADC on probed rows only; the in-plan form re-paid the whole-corpus assignment per query (232 s at x64) — index-build cost now lives in the staging, where production pays it"),
    "llm_ann_recall": (M, "x8 1.3x / x64 3.2x (r12; r6: 4.3x)", "brute-force truth scan tracks corpus; audit join stays 10-row"),
    "llm_ann_range": (M, "x8 1.4x / x64 6.0x (r12; r11: 1.0x/5.1x)", "probed-cells scan + map-side threshold; emitted set radius-selectivity-sized; derived k holds the probed fraction at 2/k"),
    "llm_ann_batch_queries": (M, "x8 1.2x / x64 2.2x (r12; r11: 1.0x/1.9x)", "whole 5-query batch pays ONE assignment scan; per-query cut on TopKPerGroup"),
    "llm_matryoshka_rerank": (M, "x8 ~1x (r6)", "both stages TakeOrdered cuts"),
    "llm_vector_mean": (B, "linear-scan", "declarative element-wise mean: 64-dim partials per group"),
    "llm_embed_cluster": (M, "x8 0.7x / x64 0.9x (r12, staged artifacts)", "connected components (shared labelFixpoint) over the embedding near-dup pairs; since r10 both the pair set (embedPairs) and the labels table are session-staged parquet artifacts, so repeats re-read instead of re-running LSH + fixpoint; the LSH cell design rides the same k PROP N occupancy rule as llm_semdedup"),
    "llm_knn_graph": (M, "x8 2.5x (r6)", "per-node top-k over LSH candidates"),
    "llm_pagerank": (M, "x8 2.3x (r6) / x64 1.2x (r10)", "3 unrolled O(edges) rounds, localCheckpoint'd; since r10 edges read from the session-staged verifiedPairs parquet (the dedup-log artifact) instead of a per-invocation LSH re-run — x64 steady-state 0.84s"),
    "llm_contamination_reach": (M, "x8 3.0x on 8x edges (r7)", "3 BFS rounds, each one edge equi-join + min-depth re-agg; edges from staged verifiedPairs since r10"),
    "llm_contamination_direction": (M, "x8 2.4x / x64 2.7x (r10)", "same 3 BFS rounds as llm_contamination_reach with seed attribution packed into ONE min-aggregable int64 (c = depth*1e12 + seed, hop = c + 1e12) - zero extra frontier columns; final source-keyed agg broadcast-sized"),
    "llm_label_propagation": (M, "x8 2.9x (r6)", "iterative min-label rounds, O(edges) each; edges from staged verifiedPairs since r10"),
    "llm_triangle_count": (B, "pair-set-bounded", "oriented wedge join on the near-dup edge set, degree-bounded"),
    "llm_graph_hits": (M, "x8 1.9x (r8) / x64 2.6x (r10)", "3 rounds of one edge equi-join + integer sum; localCheckpoint per round; edges from staged verifiedPairs since r10 (x64: 7.3s steady on a 64x edge set)"),
    "llm_graph_kcore": (M, "x8 2.4x on 8x edges (r8)", "4 O(edges) peel rounds, the HITS/BFS class; edges from staged verifiedPairs since r10"),
    "llm_graph_linkpred": (M, "x8 2.1x / x64 3.9x (r8)", "wedge join O(sum deg^2) with kNN-bounded degrees"),
    "llm_inverted_index": (B, "output-sized", "token-keyed shuffle; serialized postings ARE the output"),
    "llm_tfidf": (B, "vocab-bound", "df table is vocab-sized; scoring joins on token"),
    "llm_bm25_score": (B, "linear-scan", "one corpus pass vs broadcast query terms; cut TakeOrdered"),
    "llm_tfidf_topterms": (M, "x8 4.1x (r8)", "doc x term tf table is the data-sized shuffle; WindowGroupLimit caps per-doc state at 3"),
    "llm_retrieval_rrf": (M, "x8 2.9x (r6)", "rank lists stay top-20; growth is the two retrieval scans"),
    "llm_retrieval_ndcg": (M, "x8 2.9x / x64 9.7x (r8)", "BM25 corpus pass dominates; both top-10 cuts TakeOrderedAndProject"),
    "llm_rag_context_pack": (M, "x8 3.2x (r8)", "corpus joins a 10-row broadcast cut; packing window <=10 rows"),
    "llm_hard_negatives": (B, "pair-set-bounded", "top-similar non-matches per anchor from banded candidates, k-bounded per anchor"),
    "llm_bitext_margin": (M, "x8 1.5x / x64 5.0x (r12; r5: x8 2.6x)", "margin vs mean of k-NN cosines; candidates from the rotated-LSH buckets — rides the same pipeline fix as llm_ann_lsh (its x64 wall was ~35 s pre-fix, 5.3 s after)"),
    "llm_kneser_ney_score": (M, "x8 3.0x / x64 4.3x (r12; r8: 4.8x/12.2x)", "corpus passes + (p,w)-keyed scoring join; KN stats reuse the staged bigram artifact; the generator input now carries only a cheap position sequence (hash/pair work in the codegen'd Project above the Generate — the r12 GenerateExec-interpreted-input fix)"),
    "llm_quality_logreg": (M, "x8 2.8x / x64 8.9x (r8)", "3 GD iterations = 3 corpus passes into 3-integer partials; weights 1-row broadcast"),
    "llm_opt_threshold": (M, "x8 1.4x / x64 4.3x (r12, staged logs; r8: x8 1.6x)", "one dedup_eval-class audit pass off the staged truth + agreement logs; all 6 thresholds score off a <=14-row histogram"),
    "llm_bloom_dedup": (M, "x8 1.5x (r8)", "position table m-bounded (2^20) broadcast; membership probe map-side"),
    "llm_dist_drift": (M, "x8 2.2x (r8)", "one token-grouped conditional-count shuffle; vocabulary governs"),
    "llm_embedding_stats": (M, "x8 0.8x (r8)", "64 map-side-combined dimension groups"),
    "llm_multimodal_passthrough": (B, "linear-scan", "opaque binary payloads through relational plumbing, per-row"),
    "llm_multimodal_features": (B, "linear-scan", "per-row PPM decode to pixel stats, map-side"),
    "llm_multimodal_framesample": (B, "linear-scan", "per-row frame-array sampling, byte-exact fingerprints"),
    "llm_multimodal_audio": (B, "linear-scan", "per-row RMS/zero-crossing features"),
    "llm_multimodal_phash": (M, "x8 1.1x (r8)", "per-row decode+dHash map work; dedup group distinct-hash-bounded"),
    "llm_multimodal_consistency": (M, "x8 1.2x / x64 3.4x (r11)", "two per-row stand-in encoders (PPM decode -> dHash; token SimHash, both the sibling keys' exact pipelines) + ONE id-keyed join + codegen bit_count(xor) hamming + threshold; one row out per pair, no exchange wider than the id join"),
    # ----- round-9 additions
    "llm_unicode_normalize": (M, "x8 1.0x (r9)", "per-row NFC through the codegen expression; isNormalized fast path keeps already-NFC rows allocation-free"),
    "llm_char_entropy": (M, "x8 1.2x (r9)", "per-doc char histogram entirely in array lambdas — never leaves the row, zero shuffle; fixed-cost-dominated at this scale"),
    "llm_mmr_diversify": (M, "x8 2.6x (r9)", "all selection work on the 10-row BM25 cut (<=90 pair sims, 4 argmax rounds over <=9 rows); the growth is the BM25 scan, the llm_rag_context_pack class"),
    "llm_pack_efficiency": (M, "x8 1.2x (r9)", "consumes llm_pack_sequences' output; one language-keyed aggregation"),
    "llm_shard_balance": (M, "x8 1.1x (r9)", "one 64-group count shuffle (map-side combined) + arithmetic on the fixed 64-shard spine"),
    "llm_graph_modularity": (M, "x8 4.7x on 8x edges (r9)", "two cluster-keyed count shuffles over the verified near-dup edge set; arithmetic on cluster-count rows"),
    "win_kaplan_meier": (M, "x8 1.2x (r9)", "one user-keyed agg reduces each user to a row; survival fold runs on the <=span-days bounded series"),
    "etl_shallow_clone": (M, "x8 1.1x (r9)", "the clone IS a manifest write (metadata-sized); reads resolve a 2-row manifest into pruned multi-path scans"),
    "agg_theil_index": (M, "x8 1.0x (r9)", "the statistic runs on the (group, dollar) histogram like agg_gini; one grouped count + histogram-sized arithmetic"),
    "llm_cluster_coherence": (M, "x8 0.8x / x64 1.3x (r12; r11: 1.0x/2.3x)", "labels join per edge endpoint + one cluster-keyed agg over the verified LSH edge set — the modularity class; cost is the LSH scoring + fixpoint it audits"),
    "agg_chi_square": (B, "key-cardinality", "one (type,dow) count shuffle; every statistic computed on the <= types x 7 cell table"),
    "agg_mann_whitney": (B, "vocab-bound", "U from the bounded cents histogram (one count shuffle); never ranks or sorts rows — the agg_gini device applied to a rank test"),
    "etl_checksum_audit": (B, "linear-scan", "per-row hash is map-side; one month-keyed count/xor/sum shuffle with map-side combine; output is partition-count rows"),
    "llm_graph_assortativity": (M, "x8 1.8x on 8x edges (r9)", "degree groupBy + two edge-keyed degree joins + a 4-integer global agg — O(edges), the modularity class"),
    "llm_quality_calibration": (M, "x8 2.7x / x64 9.3x (r9)", "shares logreg's 3 corpus passes + one heuristic pass; all calibration arithmetic on the <=20-row bin table"),
    "win_lttb_downsample": (B, "bounded-series", "one hourly aggregation is the data pass; all selection work on the <= span-hours series with 24-row broadcast bucket stats"),
    "win_holt_linear": (B, "bounded-series", "one (type, hour) aggregation; the level/trend fold runs on the <= span-hours per-type series"),
    "llm_token_budget_trim": (M, "x8 2.3x / x64 4.2x (r9)", "quality histogram replaces the per-lang sort; only the single straddling quality level pays a doc-granular pass"),
    "llm_embedding_pca": (M, "x8 1.5x (r9)", "3 iterations x (vec-keyed + 64-group dim-keyed) aggregations; weights a 64-row broadcast — the logreg GD communication pattern"),
    "stream_hll_distinct": (B, "state-bounded", "state is one lgK=14 HLL sketch per event type forever; each batch one sketch-agg + sketch-sized union"),
    "agg_ks_test": (B, "vocab-bound", "both CDFs live on the bounded cents histogram (one count shuffle); D is an integer max over histogram rows"),
    "llm_dedup_auc": (M, "x8 1.3x / x64 2.8x (r12, staged logs)", "shares the staged stratumAgreement scored-candidate log (candidates from band equi-join, staged once); AUC itself folds a 13-row score histogram"),
    "stream_quantile_hist": (M, "x64 2.5x (r10)", "state is the (type, cents) histogram forever — bounded by the value domain; each batch one histogram-keyed merge. Measured x64: 1.75 -> 4.3s on 64x events — the vocab bound holds when the 64x corpus widens the value domain"),
    "agg_bootstrap_ci": (B, "linear-scan", "Poisson bootstrap is THE distributed resample: one map pass amplifies each row into 40 weighted contributions that partial-agg into 40 (Σw, Σwx) pairs — shuffle is 40 groups"),
    "llm_cluster_outliers": (B, "key-cardinality", "centroid table is (labels × 64 dims) and broadcasts; member scoring is one vec-keyed aggregation pass"),
    "win_markov_transitions": (M, "x64 3.9x (r10)", "the lead() window is user-keyed (per-user state only); the transition matrix is <= types² rows at any corpus size. Measured x64: 0.40 -> 1.5s on 64x events"),
    "agg_corr_matrix": (B, "linear-scan", "all six correlations from ONE pass of 15 int64 moment partials; the matrix is arithmetic on a single row"),
    "llm_feature_hashing": (B, "vocab-bound", "one token explode + one 256-group map-side-combined shuffle; per-slot distinct state is vocabulary-bounded"),
    # ----- L
    "q_flagship": (M, "x8 1.7x (r5)", "the TPC-H-Q3-shaped flagship: broadcast dims, one fact shuffle, top-10 TakeOrdered"),
}


def main(plans_path):
    keys = sorted(json.load(open(plans_path)))
    missing = [k for k in keys if k not in EVIDENCE]
    stale = [k for k in EVIDENCE if k not in keys]
    if missing or stale:
        sys.exit(f"EVIDENCE drift — missing: {missing} stale: {stale}")
    bad_kind = [k for k, (kind, _, _) in EVIDENCE.items() if kind not in (M, B)]
    bad_tag = [k for k, (kind, tag, _) in EVIDENCE.items()
               if kind == B and tag not in TAGS]
    if bad_kind or bad_tag:
        sys.exit(f"EVIDENCE invalid — bad kind: {bad_kind} bad tag: {bad_tag}")
    n_meas = sum(1 for kind, _, _ in EVIDENCE.values() if kind == M)
    print(f"<!-- generated by tools/scale_table.py from {plans_path} "
          f"({len(keys)} keys): {n_meas} measured, "
          f"{len(keys) - n_meas} bounded-by-construction -->")
    print("""
# SCALE — per-key scale-evidence register

Every `SparkEntry.queries` key carries exactly one of:

- **measured** — a wall-clock ratio on the `tools/stage_scale.py`
  keyed-scaling corpus (×8 = 8 disjoint-key copies of sf0.1, ×64 where
  spot-checked), min-of-N per key per JVM at `local[32]`, as recorded in
  BASELINE.md's per-round sweep tables (round in parentheses). At fixed
  parallelism, a ratio below the data growth factor is sublinear;
  ratios near 1× are fixed-cost-dominated.
- **bounded** — a named bounded-by-construction tag (closed vocabulary,
  defined in `tools/scale_table.py`) restating the scaling argument
  from the key's doc comment: why a measured row would be noise.

`tools/scale_table.py` FAILS on any key without an entry (or any entry
without a key), and `ScaleEvidenceSpec` asserts this file covers
`SparkEntry.queries` exactly — a new operator cannot land without a
scale story, the same way it cannot land without an oracle.""")
    for prefix, title in TIERS:
        tier_keys = [k for k in keys
                     if k.split("_")[0] == prefix
                     or (prefix == "q" and k == "q_flagship")]
        if not tier_keys:
            continue
        print(f"\n## {title} ({len(tier_keys)} keys)\n")
        print("| key | evidence | scale story |")
        print("|---|---|---|")
        for k in tier_keys:
            kind, tag, arg = EVIDENCE[k]
            ev = f"**{tag}**" if kind == M else f"bounded: `{tag}`"
            print(f"| `{k}` | {ev} | {arg} |")


if __name__ == "__main__":
    main(sys.argv[1])
