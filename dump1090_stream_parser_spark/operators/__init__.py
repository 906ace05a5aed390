"""Operator inventory (SURVEY.md §2).

Importing this package registers every query in the engine-wide registry
(`.registry.REGISTRY`): Tier B relational surface, Tier C training-data
extensions, and the SBS-1 domain queries. ``__spark_entry__.py`` exposes
the registry to the driver harness.
"""

from . import relational  # noqa: F401
from . import joins  # noqa: F401
from . import windows  # noqa: F401
from . import text  # noqa: F401
from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import multimodal  # noqa: F401
from . import pipeline_ops  # noqa: F401
from . import inference  # noqa: F401
from . import composite  # noqa: F401
from . import sbs1_gold  # noqa: F401
from . import timeseries  # noqa: F401
from . import statistics  # noqa: F401
from . import indexing  # noqa: F401
from . import linkage  # noqa: F401
from . import attribution  # noqa: F401
from . import rollup_merge  # noqa: F401
from . import basket  # noqa: F401
from . import sequence  # noqa: F401
from . import skyline  # noqa: F401
from . import cdc  # noqa: F401
from . import spatial  # noqa: F401
from . import graph  # noqa: F401
from . import storage  # noqa: F401

from .registry import REGISTRY, oracle_sql_map, queries_map  # noqa: F401

# The driver's correctness gate evaluates the FIRST 50 registry entries
# (round-1 lesson: q_ann_lsh + the three q_multimodal_* queries sat at
# positions 51-54 and never got a CORRECTNESS row). Registration order is
# therefore part of the verification contract: every capability's primary
# query must sit inside the window. Past the window sits a tail of
# queries whose CAPABILITY is also proven by an earlier in-window query;
# ALL entries, windowed or not, are verified by the local pytest parity
# gate (tests/test_parity.py) at sf0.001 and swept at sf0.01/0.1 by
# tools/parity.py. The per-query rationale below is DATA so the generated
# user-facing catalog (tools/make_catalog.py -> docs/QUERIES.md) carries
# the same capability map; tail order is the rotation order (newest
# candidates for a future window swap first).

#: The driver round this window registration TARGETS (VERDICT r10 ask
#: #2). The green-age drain invariant (tools/parking_guard.py
#: check_green_age) is evaluated at THIS round, not at the ledger-derived
#: current round -- so the moment a new CORRECTNESS file lands, the suite
#: reports "rotation pending" as a distinct signal instead of failing,
#: and only a registration left stale for a FULL round (ledger two or
#: more rounds ahead) is a violation. Bump this constant as part of every
#: rotation edit.
WINDOW_ROUND = 14

EVAL_TAIL_RATIONALE: dict[str, str] = {
    # ---- round-14 rotation (VERDICT r13 ask #3): the round-13/14
    # restructured queries re-enter the window so the driver
    # value-certifies the semantics-touching optimization work --
    # q_ks_test, q_mann_whitney (RANGE-frame pair grids), q_triangles
    # (array-side pair enumeration), q_near_dedup_minhash (band-struct
    # explode), q_chi2, q_sax (checkpoint removals), q_decile_lift
    # (windowed corpus totals, round 14), q_theil_sen (checkpoint
    # restored, round 14), plus q_pagerank and q_dedup_clusters (the
    # round-14 checkpoint_partitioned loop restructure). The ten parks
    # below make room; every one carries a FRESH r13 green row on code
    # untouched since (guard-enforced block diffs), and each names its
    # in-window capability holder.
    "q_cooccur": (
        "rotated OUT round 14 rotation (green driver rows r8+r13,"
        " basket.py block untouched this round): the collect_set +"
        " sorted-array pair enumeration core is held in-window by"
        " q_triangles (the same basket_pair_counts machinery, one"
        " census deeper); re-proven every round by the local parity"
        " gate"
    ),
    "q_interval_peak": (
        "rotated OUT round 14 rotation (green driver rows r10+r13,"
        " timeseries.py block untouched this round): non-equi interval"
        " predicates are held in-window by q_scd2_intervals (the same"
        " validity-interval overlap shape); re-proven every round by"
        " the local parity gate"
    ),
    "q_near_dedup_ngram": (
        "rotated OUT round 14 rotation (green driver rows r4+r5+r13,"
        " dedup.py block untouched this round): gram-set Jaccard"
        " near-dup is held in-window by q_near_dedup_minhash (the same"
        " shingle pipeline under banded signatures) and"
        " q_dedup_clusters_lsh (its survivors clustered); re-proven"
        " every round by the local parity gate"
    ),
    "q_dup_spans": (
        "rotated OUT round 14 rotation (green driver rows r10+r13,"
        " text.py block untouched this round): span-grain duplicate"
        " marking is held in-window by q_dup_spans_bloom (the same"
        " single-window marking behind the Bloom prefilter fork);"
        " re-proven every round by the local parity gate"
    ),
    "q_abtest": (
        "rotated OUT round 14 rotation (green driver rows r8+r13,"
        " statistics.py block untouched this round): two-sample"
        " hypothesis testing is held in-window by q_mann_whitney and"
        " q_ks_test (the same cohort-split compare over exact integer"
        " sufficient statistics); re-proven every round by the local"
        " parity gate"
    ),
    "q_gini": (
        "rotated OUT round 14 rotation (green driver rows r8+r13,"
        " statistics.py block untouched this round): exact"
        " order-statistic folds over the value collapse are held"
        " in-window by q_winsorize and q_weighted_median; re-proven"
        " every round by the local parity gate"
    ),
    "q_mutual_info": (
        "rotated OUT round 14 rotation (green driver rows r9+r13,"
        " statistics.py block untouched this round): contingency-grid"
        " machinery is held in-window by q_chi2 (literally the same"
        " domain-bounded cell counts, a different functional on top);"
        " re-proven every round by the local parity gate"
    ),
    "q_regression": (
        "rotated OUT round 14 rotation (green driver rows r8+r13,"
        " statistics.py block untouched this round): trend fitting over"
        " the day-grain collapse is held in-window by q_theil_sen (the"
        " robust-slope form over the same collapse); re-proven every"
        " round by the local parity gate"
    ),
    "q_anomaly_mad": (
        "rotated OUT round 14 rotation (green driver rows r8+r13,"
        " statistics.py block untouched this round): robust"
        " median/MAD order statistics are held in-window by"
        " q_winsorize (the same exact rank-selected fold); re-proven"
        " every round by the local parity gate"
    ),
    "q_transitions": (
        "rotated OUT round 14 rotation (green driver rows r8+r13,"
        " sequence.py block untouched this round): ordered"
        " event-sequence pairing is held in-window by q_paths (the"
        " same lead/lag sequence machinery one hop deeper); re-proven"
        " every round by the local parity gate"
    ),
    # ---- round-13 green-age rotation (VERDICT r12 ask #4): the full
    # r9 cohort (28 entries, age 4 at this window's round -- they would
    # hit the green-age bound at round 14) re-enters, joined by the 19
    # oldest entries of the r10 cohort in tail order, so the whole
    # registry stays at green-age <= 4 going into round 14. They are
    # joined by q_bucket_join + q_snapshot_read (NEW this round: the
    # storage-layout tier, first driver rows -- no registry entry waits
    # a round for its first row) and q_ann_opq, which STAYS in-window
    # because its source block changed this round (session-cached
    # rotation/LUT expression text, VERDICT r12 ask #1) and must
    # re-earn its green on the code as it stands. The 49 round-12
    # incumbents below park; every one carries a FRESH r12 green row on
    # code untouched since (guard-enforced block diffs).
    "q_cube": (
        "rotated OUT round 13 age rotation (green driver rows r5+r6+r7+r12,"
        " relational.py block untouched this round): rollup/cube/grouping-sets"
        " aggregation is held in-window by q_rollup_merge (the same partial/final"
        " mergeable-rollup machinery); re-proven every round by the local parity"
        " gate"
    ),
    "q_approx_distinct": (
        "rotated OUT round 13 age rotation (green driver rows r6+r7+r12,"
        " relational.py block untouched this round): the sketch-certificate"
        " discipline is held in-window by q_approx_percentile (exact leg +"
        " bounded-error sketch over the same scan); the exact distinct leg rides"
        " q_rollup_merge's agg machinery; re-proven every round by the local"
        " parity gate"
    ),
    "q_profile": (
        "rotated OUT round 13 age rotation (green driver rows r6+r7+r12,"
        " relational.py block untouched this round): column profiling is held"
        " in-window by q_length_hist (the same bounded-cardinality histogram"
        " collapse over the documents scan); re-proven every round by the local"
        " parity gate"
    ),
    "q_subquery_scalar": (
        "rotated OUT round 13 age rotation (green driver rows r6+r7+r12,"
        " relational.py block untouched this round): correlated-scalar"
        " decorrelation lands on the same left-join + grouped-agg plan held"
        " in-window by q_join_snowflake's chained joins and q_weighted_median's"
        " grouped aggregates; re-proven every round by the local parity gate"
    ),
    "q_unpivot": (
        "rotated OUT round 13 age rotation (green driver rows r6+r7+r12,"
        " relational.py block untouched this round): wide-to-long reshaping rides"
        " the bounded Generate held in-window by q_cooccur's pair expansion;"
        " re-proven every round by the local parity gate"
    ),
    "q_join_range": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r7+r12, joins.py block untouched this round):"
        " theta/range join keys are held in-window by q_scd2_intervals and"
        " q_interval_peak (the same non-equi interval predicates); re-proven"
        " every round by the local parity gate"
    ),
    "q_asof_lastval": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r7+r12, joins.py block untouched this round): the"
        " last(ignorenulls) ordered window is held in-window by"
        " q_sbs1_gold_latest (rank-1 latest state per key over the same"
        " ordering); re-proven every round by the local parity gate"
    ),
    "q_window_trailing": (
        "rotated OUT round 13 age rotation (green driver rows r6+r7+r12,"
        " windows.py block untouched this round): rows/range window frames are"
        " held in-window by q_decay_topk (trailing decayed windows over the same"
        " ordered frames); re-proven every round by the local parity gate"
    ),
    "q_lang_id": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r7+r12, text.py block re-touched by the round-13 optimization): the"
        " documents-scan text tier is held in-window by q_quality_score and"
        " q_token_count (the same single-scan character/token profile"
        " expressions); re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 329ad247]"
    ),
    "q_rolling_fingerprint": (
        "rotated OUT round 13 age rotation (green driver rows r5+r6+r7+r8+r12,"
        " text.py block re-touched by the round-13 optimization): rolling-hash fingerprints are held"
        " in-window by q_doc_fingerprint (the same polynomial rolling hash and"
        " winnowing fold); re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 3b5cb065]"
    ),
    "q_containment": (
        "rotated OUT round 13 age rotation (green driver rows r7+r8+r12, text.py"
        " block re-touched by the round-13 optimization): winnowed containment rides the fingerprint"
        " machinery held in-window by q_doc_fingerprint and the positional-gram"
        " expansion of q_dup_spans; re-proven every round by the local parity"
        " gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session]"

        " [round-14 optimization re-touched this block (VERDICT r13 #5):"
        " the winnow rebalance exchange went CONDITIONAL via"
        " tables.keyed_spread -- locally the undershoot condition fires"
        " and the plan is byte-identical; at production split counts the"
        " exchange disappears instead of re-shuffling document text."
        " Oracle text unchanged, sf0.01 parity green this session;"
        " block b2b35862]"
    ),
    "q_bm25": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r3+r4+r5+r6+r7+r12, text.py block re-touched by the round-13 optimization): tf/df scoring"
        " is held in-window by q_tfidf (the same token-frequency scaffolding;"
        " BM25 only changes the saturation formula); re-proven every round by the"
        " local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block dbcc74fa]"
    ),
    "q_ngram_top": (
        "rotated OUT round 13 age rotation (green driver rows r6+r7+r8+r12,"
        " text.py block re-touched by the round-13 optimization): gram counting +"
        " TakeOrderedAndProject top-k is held in-window by q_pmi (same"
        " bounded-vocabulary gram counts) and q_decay_topk (same top-k cap);"
        " re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 856229b2]"
    ),
    "q_quality_filter": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r3+r4+r5+r6+r7+r12, text.py block re-touched by the round-13 optimization): the quality"
        " heuristics are held in-window by q_quality_score (the same expression"
        " battery; the filter form only thresholds it); re-proven every round by"
        " the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block a8d31771]"
    ),
    "q_chunk_docs": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r3+r4+r5+r6+r7+r8+r9+r12, text.py block re-touched by the round-13 optimization): bounded"
        " sequence Generate is held in-window by q_dup_spans (the same positional"
        " explode bounded by document length); re-proven every round by the local"
        " parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block c1fac53f]"
    ),
    "q_dedup_best": (
        "rotated OUT round 13 age rotation (green driver rows r6+r7+r12,"
        " dedup.py block re-touched by the round-13 optimization): keep-best dedup is held in-window"
        " by q_sbs1_gold_latest (the same rank-1-per-key window discipline);"
        " re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block cf4d852a]"
    ),
    "q_dedup_incremental": (
        "rotated OUT round 13 age rotation (green driver rows r6+r7+r12,"
        " dedup.py block untouched this round): the snapshot-diff read path is"
        " held in-window by q_snapshot_read (the same manifest-pinned file"
        " listing) and q_cdc_apply (the same keyed-state reconciliation);"
        " re-proven every round by the local parity gate"
    ),
    "q_knn_join": (
        "rotated OUT round 13 age rotation (green driver rows r7+r8+r12,"
        " similarity.py block re-touched by the round-13 optimization): exact-kNN JVM expressions"
        " are held in-window by q_knn_per_label (the same zip_with dot-product"
        " fold + per-group rank); re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 0b1ba54c]"
    ),
    "q_ann_ivf": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r7+r12, similarity.py block untouched this round): IVF"
        " centroid assignment + shortlist search is held in-window by q_ann_opq"
        " (the same trained-quantizer fixtures and ADC scan); re-proven every"
        " round by the local parity gate"

        " [round-13 optimization re-touched this block: driver-side plan-build caching only (fixture/seed rows + parsed centroid expressions cached process/session-wide), oracle text unchanged, parity re-verified this session; block b6a6c4b1]"
    ),
    "q_ann_ivf_join": (
        "rotated OUT round 13 age rotation (green driver rows r7+r8+r9+r12,"
        " similarity.py block re-touched by the round-13 optimization): the IVF cell-join form rides"
        " the same quantizer machinery held in-window by q_ann_opq; re-proven"
        " every round by the local parity gate"

        " [round-13 optimization re-touched this block: driver-side plan-build caching only (fixture/seed rows + parsed centroid expressions cached process/session-wide), oracle text unchanged, parity re-verified this session; block 7811788a]"
    ),
    "q_semantic_dedup": (
        "rotated OUT round 13 age rotation (green driver rows r7+r8+r12,"
        " similarity.py block re-touched by the round-13 optimization): cell-bounded semantic pair"
        " generation is held in-window by q_dedup_clusters_lsh and"
        " q_near_dedup_embedding_lsh (the same bucketed pair space); re-proven"
        " every round by the local parity gate"

        " [round-13 optimization re-touched this block: driver-side plan-build caching only (fixture/seed rows + parsed centroid expressions cached process/session-wide), oracle text unchanged, parity re-verified this session; block 4043b41c]"
    ),
    "q_ann_lsh": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r3+r4+r5+r6+r7+r12, similarity.py block untouched this round):"
        " hyperplane-LSH banding is held in-window by q_near_dedup_embedding_lsh"
        " (the same session-cached band expressions); re-proven every round by"
        " the local parity gate"
    ),
    "q_random_projection": (
        "rotated OUT round 13 age rotation (green driver rows r7+r8+r12,"
        " similarity.py block re-touched by the round-13 optimization): matrix-literal projection is"
        " held in-window by q_ann_opq (the same broadcast rotation-matrix"
        " expression fold); re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 3eb8aebb]"
    ),
    "q_opq_encode": (
        "rotated OUT round 13 age rotation (green driver rows r12, similarity.py"
        " block re-touched by the round-13 optimization): the rotation + PQ encode path is held"
        " in-window by q_ann_opq (the same trained rotation, codebooks, and"
        " staged rotation column); re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 85ced948]"
    ),
    "q_ann_pq_pruned": (
        "rotated OUT round 13 age rotation (green driver rows r11+r12,"
        " similarity.py block re-touched by the round-13 optimization): the at-rest pruned ADC read"
        " is held in-window by q_ann_opq (the same session-cached fixture layout"
        " and ADC scan; pruning re-proven by the exec pins); re-proven every"
        " round by the local parity gate"

        " [round-13 optimization re-touched this block: driver-side plan-build caching only (fixture/seed rows + parsed centroid expressions cached process/session-wide), oracle text unchanged, parity re-verified this session; round-14 ADVICE hygiene re-touch: pruned plan tuples moved to _PRUNED_PLAN_CACHE and the layout schema into tables._SCHEMA_CACHE -- cache plumbing only, same values, parity re-verified; block 5f2d5130]"
    ),
    "q_multimodal_energy": (
        "rotated OUT round 13 age rotation (green driver rows r5+r6+r7+r12,"
        " multimodal.py block untouched this round): the Arrow-batched multimodal"
        " payload path is held in-window by q_multimodal_resize and"
        " q_multimodal_meta (the same mapInPandas schema and batch shape);"
        " re-proven every round by the local parity gate"
    ),
    "q_stratified_sample": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r3+r4+r5+r6+r7+r12, pipeline_ops.py block untouched this round):"
        " deterministic hash-split sampling is held in-window by q_abtest (the"
        " same uniform-hash assignment discipline); re-proven every round by the"
        " local parity gate"
    ),
    "q_weighted_sample": (
        "rotated OUT round 13 age rotation (green driver rows r7+r8+r9+r12,"
        " pipeline_ops.py block untouched this round): weighted deterministic"
        " sampling rides the same hash-uniform draw held in-window by q_abtest;"
        " re-proven every round by the local parity gate"
    ),
    "q_pack_shards": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r3+r4+r5+r6+r7+r12, pipeline_ops.py block untouched this round):"
        " monotone running-sum bin packing is held in-window by q_streaks (the"
        " same ordered running-window fold); re-proven every round by the local"
        " parity gate"
    ),
    "q_contamination": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r3+r4+r5+r6+r7+r12, pipeline_ops.py block untouched this round): the"
        " gram semi-join is held in-window by q_contamination_bloom (the same"
        " join with the Bloom prefilter fork wired); re-proven every round by the"
        " local parity gate"
    ),
    "q_mix_weights": (
        "rotated OUT round 13 age rotation (green driver rows"
        " r3+r4+r5+r6+r7+r12, pipeline_ops.py block untouched this round):"
        " per-source share algebra is held in-window by q_gini (the same"
        " source-grain distribution fold); re-proven every round by the local"
        " parity gate"
    ),
    "q_heavy_hitters": (
        "rotated OUT round 13 age rotation (green driver rows r4+r5+r6+r7+r12,"
        " pipeline_ops.py block untouched this round): frequency ranking is held"
        " in-window by q_decay_topk (the same count-collapse + top-k cap);"
        " re-proven every round by the local parity gate"
    ),
    "q_countmin": (
        "rotated OUT round 13 age rotation (green driver rows r7+r8+r9+r12,"
        " pipeline_ops.py block re-touched by the round-13 optimization): the sketch tier is held"
        " in-window by q_approx_percentile (exact leg + sketch certificate, same"
        " discipline); re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block c5fdb0c5]"
    ),
    "q_set_overlap_kmv": (
        "rotated OUT round 13 age rotation (green driver rows r7+r8+r12,"
        " pipeline_ops.py block re-touched by the round-13 optimization): the KMV overlap estimate"
        " is held in-window by q_source_overlap (the exact twin of the same"
        " containment/Jaccard matrix); re-proven every round by the local parity"
        " gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 1dcbbdec]"
    ),
    "q_source_divergence": (
        "rotated OUT round 13 age rotation (green driver rows r7+r8+r12,"
        " pipeline_ops.py block re-touched by the round-13 optimization): distribution-compare folds"
        " are held in-window by q_mutual_info (the same joint/marginal"
        " contingency algebra); re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block ea094007]"
    ),
    "q_retention_cohorts": (
        "rotated OUT round 13 age rotation (green driver rows r4+r5+r6+r7+r12,"
        " pipeline_ops.py block untouched this round): cohort time-bucketing is"
        " held in-window by q_transitions (the same event-time grouping at key"
        " grain); re-proven every round by the local parity gate"
    ),
    "q_dense_index": (
        "rotated OUT round 13 age rotation (green driver rows r5+r6+r7+r12,"
        " pipeline_ops.py block untouched this round): index materialization is"
        " held in-window by q_inverted_index and q_bitmap_index (the same"
        " posting-list builds); re-proven every round by the local parity gate"
    ),
    "q_model_score": (
        "rotated OUT round 13 age rotation (green driver rows r4+r5+r6+r7+r12,"
        " inference.py block untouched this round): linear-model expression folds"
        " are held in-window by q_regression (the same closed-form"
        " normal-equation algebra) and q_lm_score; re-proven every round by the"
        " local parity gate"
    ),
    "q_label_pca": (
        "rotated OUT round 13 age rotation (green driver rows r6+r7+r8+r12,"
        " inference.py block untouched this round): the Gram-matrix covariance"
        " fold is held in-window by q_regression (the same sum-of-products"
        " collapse); re-proven every round by the local parity gate"
    ),
    "q_hybrid_search": (
        "rotated OUT round 13 age rotation (green driver rows r4+r5+r6+r7+r12,"
        " inference.py block untouched this round): the lexical leg is held"
        " in-window by q_inverted_index, the vector leg by q_knn_per_label (the"
        " same fused rank blend re-proven by parity); re-proven every round by"
        " the local parity gate"
    ),
    "q_pipeline_funnel": (
        "rotated OUT round 13 age rotation (green driver rows r5+r6+r7+r8+r12,"
        " composite.py block untouched this round): stacked window stages are"
        " held in-window by q_attribution (the same ordered multi-stage window"
        " credit pass); re-proven every round by the local parity gate"
    ),
    "q_sbs1_gold_deadletter": (
        "rotated OUT round 13 age rotation (green driver rows r6+r7+r8+r12,"
        " sbs1_gold.py block re-touched by the round-13 optimization): the silver parse path and"
        " arity fork are held in-window by q_sbs1_gold_latest (the same"
        " production parser over the same fixture lines); re-proven every round"
        " by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 26421240]"
    ),
    "q_ema": (
        "rotated OUT round 13 age rotation (green driver rows r8+r9+r12,"
        " timeseries.py block untouched this round): recursive exponential"
        " smoothing is held in-window by q_holt (level+trend generalizes the EMA"
        " fold); re-proven every round by the local parity gate"
    ),
    "q_cusum": (
        "rotated OUT round 13 age rotation (green driver rows r8+r9+r12,"
        " timeseries.py block untouched this round): sequential drift screens are"
        " held in-window by q_burst (trailing-baseline z-scores) and"
        " q_anomaly_mad (robust deviation gates); re-proven every round by the"
        " local parity gate"
    ),
    "q_acf": (
        "rotated OUT round 13 age rotation (green driver rows r8+r9+r12,"
        " statistics.py block untouched this round): lagged covariance algebra is"
        " held in-window by q_regression (the same exact sum-of-products fold"
        " over shifted pairs); re-proven every round by the local parity gate"
    ),
    "q_seasonality": (
        "rotated OUT round 13 age rotation (green driver rows r9+r12,"
        " statistics.py block untouched this round): the day-grain spine and"
        " expected-share compare are held in-window by q_burst (the same"
        " zero-filled day spine); re-proven every round by the local parity gate"
    ),
    "q_hill": (
        "rotated OUT round 13 age rotation (green driver rows r9+r12,"
        " statistics.py block re-touched by the round-13 optimization): top-K order statistics are"
        " held in-window by q_winsorize (the same exact rank-selected clipping);"
        " re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 698a7a00]"
    ),
    # ---- round-12 second wave: q_ann_opq (the OPQ ADC read path,
    # full oracle, parity-verified at sf0.001/0.01/0.1 and under a
    # vanilla session) enters the window for its FIRST driver row --
    # no registry entry waits a round for its first row (the round-6
    # second-wave precedent); q_multimodal_resize parks to make room.
    # ---- round-12 green-age rotation (VERDICT r11 ask #5): the 25
    # entries last green in r7 (age 5 at this window's round) all
    # re-enter, joined by the full r8 cohort (11) and the first 12 of
    # the r9 cohort in tail order -- so the whole registry stays at
    # green-age <= 5 for the second consecutive round -- plus
    # q_opq_encode (NEW: OPQ rotated-codebook encoding, first driver
    # row) and q_ann_pq_pruned, which STAYS in-window because its
    # source block changed this round (once-per-session layout cache)
    # and must re-earn its green on the code as it stands. The 49
    # round-11 incumbents below park; every one carries a FRESH r11
    # green row on code untouched since (guard-enforced block diffs).
    "q_group_topk": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r11, relational.py block untouched this round):"
        " hash agg + top-k is held in-window by q_cube (the same"
        " partial/final aggregation) and q_ngram_top (the same"
        " TakeOrderedAndProject cap); re-proven every round by the local"
        " parity gate"
    ),
    "q_distinct_aircraft": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r11, relational.py block untouched this round):"
        " the distinct tier is held in-window by q_approx_distinct"
        " (exact distinct leg + sketch certificate over the same column"
        " family); re-proven every round by the local parity gate"
    ),
    "q_group_concat": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r11, relational.py block untouched this round):"
        " ordered string aggregation rides the same partial/final agg"
        " machinery held by q_cube; re-proven every round by the local"
        " parity gate"
    ),
    "q_project_cast": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r11, relational.py block untouched this round):"
        " projection/cast is exercised by every in-window query's typed"
        " projections (and pinned per-column by the parity gate)"
    ),
    "q_filter_range": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r11, relational.py block untouched this round):"
        " pushed-down range predicates are exercised by q_join_range's"
        " range keys and every in-window scan's PushedFilters; re-proven"
        " every round by the local parity gate"
    ),
    "q_set_ops": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r11, relational.py block untouched this round):"
        " set operations rebuild from the join/anti machinery held by"
        " q_contamination's semi join; value parity re-proven every"
        " round by the local parity gate"
    ),
    "q_time_bucket": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r11, relational.py block untouched this round): time"
        " bucketing is held in-window by q_retention_cohorts (the same"
        " truncate-to-bucket grouping at month grain); re-proven every"
        " round by the local parity gate"
    ),
    "q_json_extract": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r11, relational.py block untouched this round):"
        " JSON access is a fixed expression surface re-proven every"
        " round by the local parity gate"
    ),
    "q_subquery_in": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r11, relational.py block untouched this round):"
        " subquery capability is held in-window by q_subquery_scalar"
        " (the correlated scalar form of the same decorrelation); re-"
        " proven every round by the local parity gate"
    ),
    "q_sessionize": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r11, relational.py block untouched this round):"
        " gap-based sessionization is held in-window by"
        " q_pipeline_funnel's stacked window stages and the streaming"
        " session-window pytest legs; re-proven every round by the local"
        " parity gate"
    ),
    "q_percentile": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r11, relational.py block re-touched by the round-13 optimization): exact"
        " order statistics are held in-window by q_hill (rank-selected"
        " top-K over the same count-collapse); re-proven every round by"
        " the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block c655b6c9]"
    ),
    "q_pivot": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r3+r4+r5+r11, relational.py block untouched this round):"
        " reshaping is held in-window by q_unpivot (the inverse stack"
        " over the same columns); re-proven every round by the local"
        " parity gate"
    ),
    "q_gapfill": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r4+r5+r6+r11, relational.py block untouched this round):"
        " dense-spine generation is held in-window by q_chunk_docs'"
        " bounded Generate and q_seasonality's day-grain spine; re-"
        " proven every round by the local parity gate"
    ),
    "q_locf": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r4+r5+r11, relational.py block untouched this round): forward"
        " fill is held in-window by q_asof_lastval (the same"
        " last(ignorenulls) ordered window); re-proven every round by"
        " the local parity gate"
    ),
    "q_join_star": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r11, joins.py block untouched this round): the join"
        " tier is held in-window by q_join_range (theta/range) and"
        " q_knn_join (broadcast equi-join + agg); re-proven every round"
        " by the local parity gate"
    ),
    "q_join_semi_anti": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r11, joins.py block untouched this round):"
        " semi/anti joins are held in-window by q_contamination (a"
        " production semi join on gram hashes); re-proven every round by"
        " the local parity gate"
    ),
    "q_join_full": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r3+r4+r5+r6+r11, joins.py block untouched this round): outer-"
        " join capability rides the same join machinery (q_join_range"
        " in-window); value parity re-proven every round by the local"
        " parity gate"
    ),
    "q_window_latest": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r11, windows.py block untouched this round):"
        " window ranking is held in-window by q_window_trailing (the"
        " same shuffle+sort window machinery, framed form); re-proven"
        " every round by the local parity gate"
    ),
    "q_window_running": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r11, windows.py block untouched this round):"
        " running aggregates are held in-window by q_window_trailing and"
        " q_cusum's cumulative fold; re-proven every round by the local"
        " parity gate"
    ),
    "q_train_split": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r3+r4+r5+r11, text.py block re-touched by the round-13 optimization): hash"
        " splitting is held in-window by q_stratified_sample (the same"
        " deterministic hash-bucket assignment, stratified form); re-"
        " proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block bd9425bf]"
    ),
    "q_dedup": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r11, dedup.py block untouched this round): exact"
        " dedup is held in-window by q_dedup_best and"
        " q_dedup_incremental (the same fingerprint groupBy, keep-best /"
        " snapshot-diff forms); re-proven every round by the local"
        " parity gate"
    ),
    "q_near_dedup_simhash": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r11, dedup.py block re-touched by the round-13 optimization):"
        " sign-projection signatures are held in-window by"
        " q_random_projection (the same JL sign-matrix machinery); re-"
        " proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block dc17f90e]"
    ),
    "q_source_overlap_kmv": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " dedup.py block re-touched by the round-13 optimization): held in-window by"
        " q_set_overlap_kmv (the same KMV bottom-k sketch and estimator"
        " legs); re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 9d280480]"
    ),
    "q_knn_cosine": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r11, similarity.py block untouched this round):"
        " exact top-k cosine is held in-window by q_knn_join (the same"
        " norm-hoisted scoring core, query-table form); re-proven every"
        " round by the local parity gate"
    ),
    "q_near_dedup_embedding": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r11, similarity.py block untouched this round):"
        " embedding near-dup is held in-window by q_semantic_dedup (the"
        " same within-cell cosine prune at scale-bounded blocking); re-"
        " proven every round by the local parity gate"
    ),
    "q_ann_ivf_trained_join": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " similarity.py block re-touched by the round-13 optimization): the trained-"
        " quantizer probe join is held in-window by q_ann_ivf_join (the"
        " same probe-join plan over the seed quantizer) with the fixture"
        " contract pinned in tests/test_pq.py; re-proven every round by"
        " the local parity gate"

        " [round-13 optimization re-touched this block: driver-side plan-build caching only (fixture/seed rows + parsed centroid expressions cached process/session-wide), oracle text unchanged, parity re-verified this session; block d86e5a0d]"
    ),
    "q_ann_ivf_trained": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " similarity.py block untouched this round): held in-window by"
        " q_ann_ivf (the same coarse-quantized probe over the seed"
        " centroids) plus the committed-fixture tests; re-proven every"
        " round by the local parity gate"

        " [round-13 optimization re-touched this block: driver-side plan-build caching only (fixture/seed rows + parsed centroid expressions cached process/session-wide), oracle text unchanged, parity re-verified this session; block 37340b17]"
    ),
    "q_centroid_outliers": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r3+r4+r5+r11, similarity.py block untouched this round):"
        " centroid-distance scoring is held in-window by"
        " q_semantic_dedup's cell-centroid machinery; re-proven every"
        " round by the local parity gate"
    ),
    "q_quantize_embeddings": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r3+r4+r5+r11, similarity.py block untouched this round):"
        " scalar quantization is held in-window by q_opq_encode's code"
        " assignment (the trained-codebook form); re-proven every round"
        " by the local parity gate"
    ),
    "q_pq_encode": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " similarity.py block re-touched by the round-13 optimization): held in-window by"
        " q_opq_encode (the SAME shared _pq_code_expr encode, rotated"
        " form) and q_ann_pq_pruned's layout build; re-proven every"
        " round by the local parity gate"

        " [round-13 optimization re-touched this block: driver-side plan-build caching only (the inlined codebook collect replaced by the shared process-cached pq_codebook_by_m), oracle text unchanged, parity re-verified this session; block d6d2f814]"
    ),
    "q_ann_pq": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " similarity.py block re-touched by the round-13 optimization): ADC search is held"
        " in-window by q_ann_pq_pruned (the same ADC shortlist + exact"
        " re-rank over the at-rest layout, staying for its second green"
        " row); re-proven every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: driver-side plan-build caching only (adc_search now gets plan_cache_key, skipping the per-call query-vector collect + LUT render/parse), oracle text unchanged, parity re-verified this session; block c6b532c9]"
    ),
    "q_multimodal_frames": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r3+r4+r5+r11, multimodal.py block untouched this round): the"
        " Arrow row-expanding codec path is held in-window by"
        " q_multimodal_resize (same payload schema and mapInPandas batch"
        " shape); re-proven every round by the local parity gate"
    ),
    "q_multimodal_features": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r4+r5+r6+r11, multimodal.py block untouched this round): held"
        " in-window by q_multimodal_energy and q_multimodal_resize (the"
        " same Arrow-batched codec plumbing); re-proven every round by"
        " the local parity gate"
    ),
    "q_repetition_score": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r3+r4+r5+r11, pipeline_ops.py block untouched this round):"
        " gram-repetition statistics are held in-window by q_ngram_top"
        " (the same gram explode/agg machinery); re-proven every round"
        " by the local parity gate"
    ),
    "q_compaction_plan": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " pipeline_ops.py block untouched this round): metadata-plane"
        " bin packing is re-proven every round by the local parity gate;"
        " the compaction EXECUTION path is pinned by the snapshot-table"
        " pytest legs"
    ),
    "q_table_digest": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " pipeline_ops.py block re-touched by the round-13 optimization): bucket content"
        " digests are re-proven every round by the local parity gate and"
        " the digest streaming twin's pytest legs"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 993e4d3d]"
    ),
    "q_skew_profile": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " pipeline_ops.py block untouched this round): the skew advisor"
        " is re-proven every round by the local parity gate; its salting"
        " remedy is held in-window by q_ann_lsh's bucket keys"
    ),
    "q_auc": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " inference.py block untouched this round): rank-sum machinery"
        " is held in-window by q_ks_test (the same integer rank"
        " statistics over the score collapse); re-proven every round by"
        " the local parity gate"
    ),
    "q_benford": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r8+r9+r10+r11, statistics.py block re-touched by the round-13 optimization): the"
        " chi-square screen family is held in-window by q_seasonality"
        " (the same expected-vs-observed cell compare); re-proven every"
        " round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 398b4ecb]"
    ),
    "q_subsample_ci": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " statistics.py block re-touched by the round-13 optimization): hash-bit"
        " subsampling is held in-window by q_weighted_sample (the same"
        " deterministic per-row hash priority discipline); re-proven"
        " every round by the local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block 5182629f]"
    ),
    "q_spatial_join": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " spatial.py block re-touched by the round-13 optimization): grid-blocked radius"
        " joins are held in-window by q_join_range (the same blocking-"
        " then-verify range join shape); re-proven every round by the"
        " local parity gate"
    
        " [round-13 optimization re-touched this block: plan-shape only (input spread / checkpoint tuning / pair enumeration), oracle text unchanged, full vanilla parity sweep green this session; block e66e8c28]"
    ),
    # ---- round-11 green-age rotation (VERDICT r10 asks #1 + #8): all
    # 21 parked entries past green-age 5 (ages 6-7) re-enter the window
    # for fresh driver rows, joined by the 10 age-5 entries that would
    # cross the bound at the round-11 close -- so round 11 is the first
    # round the whole registry closes at green-age <= 5 -- and by the
    # new q_ann_pq_pruned (the at-rest codes-layout read path, ask #6).
    # The 32 incumbents below park to make room; every one carries a
    # FRESH r10 green row on code untouched since (guard-enforced block
    # diffs), and 17 of the 18 staying incumbents hold only the single
    # r10 green row, so staying earns them their second.
    "q_token_tf": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " text.py's tf block untouched this round): the explode ->"
        " per-token aggregation front end is held in-window by the"
        " re-entering q_repetition_score (the same tokenize-explode"
        " pipeline one statistic deeper); re-proven every round by the"
        " local parity gate"
    ),
    "q_funnel": (
        "rotated OUT round 11 age rotation (green driver rows r3+r10,"
        " composite.py's funnel block untouched this round): the"
        " user-keyed ordered-event staging is held in-window by the"
        " re-entering q_sessionize (the same per-user time-ordered lag"
        " machinery its stage gates build on); re-proven every round"
        " by the local parity gate"
    ),
    "q_window_ntile": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " windows.py's ntile block untouched this round): rank-bucket"
        " windowing is held in-window by the re-entering"
        " q_window_latest (the same ranking-window family) and exact"
        " quantile selection by q_percentile; re-proven every round by"
        " the local parity gate"
    ),
    "q_window_lag_delta": (
        "rotated OUT round 11 age rotation (green driver rows"
        " r1+r3+r10, windows.py's lag block untouched this round): the"
        " lag-over-ordered-window primitive is held in-window by the"
        " re-entering q_sessionize (whose gap detection IS a lag"
        " delta) and the frame machinery by q_window_running;"
        " re-proven every round by the local parity gate"
    ),
    "q_join_left": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " joins.py's left-outer block untouched this round): the"
        " outer-join tier is held in-window by the re-entering"
        " q_join_full (the two-sided generalization of the same"
        " coalesced-key shape) and q_join_semi_anti; re-proven every"
        " round by the local parity gate"
    ),
    "q_group_salted": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " relational.py's salted block untouched this round): the"
        " two-stage salted aggregation is held in-window by"
        " q_skew_profile (the key-skew diagnosis that computes the"
        " leveling salt factor it applies, staying for its second"
        " green row); re-proven every round by the local parity gate"
    ),
    "q_stats": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " relational.py's stats block untouched this round): the"
        " sufficient-statistics moment fold (avg/stddev/corr partials)"
        " is held in-window by q_subsample_ci (the same mergeable"
        " moment aggregation with confidence legs, staying for its"
        " second green row); re-proven every round by the local parity"
        " gate"
    ),
    "q_haversine": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " relational.py's haversine block untouched this round): the"
        " spherical-distance math tier is held in-window by"
        " q_spatial_join (the same great-circle formula inside its"
        " grid-blocked join predicate, staying for its second green"
        " row); re-proven every round by the local parity gate"
    ),
    "q_array_explode": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " relational.py's array block untouched this round): the"
        " Generate/explode array surface is held in-window by the"
        " re-entering q_multimodal_frames (explode over sampled frame"
        " arrays with the same posexplode ordinal discipline);"
        " re-proven every round by the local parity gate"
    ),
    "q_sliding_window": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " relational.py's sliding block untouched this round): the"
        " overlapping time-bucket rollup is held in-window by the"
        " re-entering q_time_bucket (the tumbling special case of the"
        " same date_trunc bucketing) and the frame machinery by"
        " q_window_running; re-proven every round by the local parity"
        " gate"
    ),
    "q_string_clean": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " relational.py's string block untouched this round): the"
        " string-fn projection surface is held in-window by"
        " q_ngram_top (string normalization + splitting in the same"
        " narrow expression tier) and q_containment's text shingling;"
        " re-proven every round by the local parity gate"
    ),
    "q_rollup": (
        "rotated OUT round 11 age rotation (green driver rows"
        " r3+r4+r10, relational.py's rollup block untouched this"
        " round): the multi-grain Expand aggregation is held in-window"
        " by the re-entering q_group_topk (the same partial+final hash"
        " agg core) and its grain-union semantics by q_set_ops;"
        " re-proven every round by the local parity gate"
    ),
    "q_agg_conditional": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " relational.py's conditional block untouched this round): the"
        " case-when conditional aggregate grid is held in-window by"
        " the re-entering q_pivot (whose cells are exactly these"
        " filtered aggregates) and the hash-agg tier by q_group_topk;"
        " re-proven every round by the local parity gate"
    ),
    # ---- round-10 fourth wave: q_ann_pq (ADC shortlist + exact
    # re-rank over the committed PQ codebook -- the read path the
    # q_pq_encode codes table exists for) enters the window for an
    # immediate driver row; q_countmin funds the slot.
    # ---- round-10 thirteenth wave: q_auc (exact rank-sum ROC AUC --
    # the threshold-free model gate) enters the window for an
    # immediate driver row; q_ks_test funds it.
    # ---- round-10 twelfth wave: q_decile_lift (the model-eval lift
    # table over the certified q_model_score frame) enters the window
    # for an immediate driver row; q_hill funds it.
    # ---- round-10 eleventh wave: q_sax (symbolic aggregate
    # approximation of the daily series -- the shape-indexing
    # primitive) enters the window for an immediate driver row;
    # q_seasonality funds it.
    # ---- round-10 tenth wave: q_skew_profile (the scale advisor:
    # key-skew diagnosis + leveling salt factor) enters the window for
    # an immediate driver row; q_cusum funds it.
    # ---- round-10 ninth wave: q_theil_sen (median-of-pairwise-slopes
    # robust trend over the day-grain collapse) enters the window for
    # an immediate driver row; q_ema funds it.
    # ---- round-10 eighth wave: q_subsample_ci (deterministic
    # hash-bit subsampling CI -- the one-pass mergeable bootstrap)
    # enters the window for an immediate driver row; q_acf funds it.
    # ---- round-10 seventh wave: q_table_digest (order-insensitive
    # per-bucket content digests -- the replica-verification
    # primitive) enters the window for an immediate driver row;
    # q_chunk_docs funds it.
    # ---- round-10 sixth wave: q_compaction_plan (metadata-plane
    # small-file bin packing -- the table-maintenance planner) enters
    # the window for an immediate driver row; q_triangles funds it.
    # ---- round-10 fifth wave: q_mann_whitney (tie-corrected rank-sum
    # test over the q_ks_test count-collapse machinery) enters the
    # window for an immediate driver row; q_weighted_sample funds it.
    # ---- round-10 mid-round wave: four new operators built this
    # session (q_spatial_join, q_pagerank, q_chi2, q_pq_encode) enter
    # the window immediately (no registry entry waits a round for its
    # first driver row); four multi-green incumbents park to fund the
    # slots, and the fifth slot swap re-enters q_token_count -- the
    # oldest-aged parked entry (last green r1) -- keeping the drain
    # invariant satisfied as the tail grows past the next quota step.
    # ---- round-10 green-age rotation (VERDICT r9 ask #2): the window
    # reserves its rotation quota (ceil(tail/5) = 19 slots) for the
    # OLDEST-aged parked entries -- the 14 whose last driver row was
    # round 1 and five of the seven round-3 cohort -- plus the two new
    # round-10 operators (q_source_overlap_kmv, q_ann_ivf_trained) and
    # the 17 round-9 entrants/replans that hold only one green row.
    # The 21 incumbents below park to make room, each with >= 2 green
    # rows (r8+r9 minimum) on code untouched this round, enforced by
    # parking_guard block diffs; ages are now guard-enforced via the
    # drain-rate invariant (tools/parking_guard.py check_green_age).
    # q_rollup re-entered the window round-10 thirteenth wave: the
    # oldest overdue parked entry (age 6, last green r4) takes the
    # drain slot the quota step to 22 (tail > 105) demands; q_streaks
    # funds the re-entry.
    # q_token_count re-entered the window mid-round 10: the OLDEST
    # green age in the registry (last driver row r3), funded by
    # q_lm_score's park below -- the age-rotation drain continuing at
    # the quota the guard enforces as the tail grows past 95.
    # q_length_hist re-entered the window round-10 eighth wave: the
    # oldest overdue parked entry (age 7, last green r3) takes the
    # drain slot the quota step to 21 (tail > 100) demands.
    # ---- round-10 eighth wave, second slot: q_holt funds
    # q_length_hist's drain re-entry.
}
# Rotated IN round 4 (per the VERDICT r3 rotation ask): q_locf and
# q_gapfill -- the newest full-oracle queries (spine generation +
# zero-fill join; last-obs-carried-forward resample) which had never had
# a driver row. Second round-4 rotation: q_contamination_bloom,
# q_heavy_hitters, q_model_score (the round-4 full-oracle additions)
# enter the window for their first driver rows; q_window_lag_delta,
# q_quality_score, q_multimodal_meta park with green r1+r3 history.
# Third round-4 rotation (same VERDICT-r3 principle -- newest
# full-oracle queries get driver rows, long-proven incumbents park):
# q_hybrid_search and q_retention_cohorts enter; q_tfidf (r1+r3 green)
# and q_funnel (r2+r3 green) park.
# Round-5 rotation (per VERDICT r4 asks #1+#2): the four queries whose
# only driver record was an r1 FAIL predating their round-2 fixes
# (q_cube, q_join_snowflake, q_approx_percentile, q_rolling_fingerprint)
# enter so the driver finally records the fixed implementations, plus
# the four strongest never-evaluated full-oracle queries
# (q_pipeline_funnel, q_dedup_clusters_lsh, q_dense_index,
# q_multimodal_energy). Eight incumbents park, every one with >=2 green
# driver rows on its CURRENT implementation (the rotation invariant:
# nothing rotates out without a green driver row on the code as it
# stands today).
# Round-6 rotation (per VERDICT r5 asks #1-#3): every registry entry
# that had never earned a green driver row enters the window --
# q_approx_distinct + the re-shaped q_approx_percentile (now
# self-certifying full-oracle, retiring the registry's last red/
# no-signal history), the round-5 tail flagships (q_sbs1_gold_latest,
# q_near_dedup_embedding_lsh, q_multimodal_resize), the seven
# never-evaluated full-oracle queries (q_dedup_best, q_profile,
# q_subquery_scalar, q_window_trailing, q_unpivot, q_ngram_top,
# q_label_pca -- the last upgraded from rows-only to a certificate
# oracle), and the new q_sbs1_gold_deadletter (§7.4 landmines pinned
# cross-engine). Twelve incumbents park, each with >=2 green driver
# rows on unchanged code; q_near_dedup_embedding specifically swaps
# for its LSH variant so the driver-certified embedding near-dup is
# the bounded-blocking plan (VERDICT r5 "What's wrong" #3).
# Round-7 rotation: q_containment (the round-6 tail flagship -- the
# registry's only never-evaluated entry) and the new q_semantic_dedup
# (SemDeDup manifest; full oracle + numpy third-engine test) enter the
# window, as does the new q_weighted_sample (Efraimidis-Spirakis
# per-source priority sampling, full oracle + deterministic bias
# test); q_near_dedup_simhash, q_join_semi_anti and q_window_latest
# park, each with five green driver rows (r1+r3+r4+r5+r6) on code
# untouched this round. NOTE on the round-7 advisor refactor: the literal-cache
# change in similarity.py (_array_sql/_planes_sql text caching) is
# shared infrastructure also reached by PARKED queries
# (q_knn_cosine, q_centroid_outliers, q_quantize_embeddings,
# q_near_dedup_embedding, q_knn_per_label); their unchanged semantics
# are covered by the full local parity sweep rather than by their
# historical driver rows alone.
# Round-7 second wave: q_scd2_intervals (SCD type-2 validity-interval
# construction -- full oracle, one-exchange two-window plan, parity at
# sf0.001-0.1) enters the window mid-round for an immediate driver
# row; q_sessionize parks on a five-green history with its lag-gap
# core held by the new entrant.
# Round-7 third wave: q_knn_join (kNN JOIN -- a query-vector TABLE
# against the corpus, exact top-k per query; full oracle, norm-hoisted
# broadcast batch join with a partial WindowGroupLimit below the rank
# exchange, plan-pinned) enters the window for an immediate driver
# row; q_group_topk parks on a five-green history (and stays executed
# every round as the entry() flagship smoke check). Its sublinear
# counterpart q_ann_ivf_join (batch IVF probe as ONE broadcast-hash
# equi-join on cell_id; in-plan probe ranking over the literal
# centroid matrix; full oracle, parity at sf0.001-0.1) enters
# alongside; q_group_concat parks on a five-green history with the
# hash-agg tier held by q_cube / q_heavy_hitters.
# Round-7 fourth wave: q_countmin (count-min sketch point-frequency
# estimation -- the over-estimating dual of q_heavy_hitters'
# Misra-Gries, fixed DEPTHxWIDTH mergeable grid; full oracle that
# REBUILDS the sketch in SQL from the portable hash family, parity at
# sf0.001-0.1) enters the window for an immediate driver row;
# q_multimodal_features parks with its tier double-held in-window.
# Round-7 fifth wave: q_random_projection (Johnson-Lindenstrauss
# sign-matrix projection d->16, the front-end that shrinks every
# downstream vector exchange; the oracle regenerates the matrix from
# the portable hash family, so projected values hash-compare
# bit-for-bit) enters for an immediate driver row; q_json_extract
# parks on the registry's deepest five-green history.
# Round-7 sixth wave: q_set_overlap_kmv (KMV bottom-k distinct sketch
# with set operations -- the third sketch-tier member: mergeable,
# duplicate-insensitive, and intersection-capable where HLL is not;
# sketches AND estimator doubles rebuilt verbatim by the oracle,
# parity at sf0.001-0.1) enters for an immediate driver row;
# q_gapfill parks on a three-green history with its Generate and
# fill-window tiers double-held in-window.
# Round-7 seventh wave: q_source_divergence (Jensen-Shannon divergence
# between per-source token distributions -- the mixture-drift
# diagnostic; exact integer counts, one token-sorted float fold shared
# as text with the oracle, parity at sf0.001-0.1) enters for an
# immediate driver row; q_join_full parks on a four-green history with
# the join tier double-held in-window.
# Round-9 third wave: q_ks_test (pairwise two-sample
# Kolmogorov-Smirnov over cohort spend distributions -- the CDF gap
# compares as the exact integer |cum1*n2 - cum2*n1|, so supremum and
# location are float-free) and q_hill (Hill tail-index from the top-K
# order statistics, K-bounded sorted fold) enter for immediate driver
# rows; q_set_overlap_kmv and q_rolling_fingerprint park, each with
# >= 2 green rows on code untouched this round.
# Round-9 second wave: three more operators built mid-round enter for
# immediate driver rows -- q_text_entropy (char-bigram Shannon
# entropy, the sorted-fold float discipline), q_source_overlap
# (pairwise gram containment/Jaccard matrix at source grain),
# q_burst (trailing-baseline z-scores on a zero-filled day spine).
# q_label_pca, q_pipeline_funnel and q_knn_join park, each with >= 2
# green driver rows on code untouched this round.
# Round-9 rotation (per VERDICT r8 asks #1-#3): q_streaks leaves the
# tail for its FIRST driver row (the only registry entry without one
# -- restoring the "every entry earns a green driver row" invariant),
# joined by the five round-9 operators: q_dup_spans_bloom (the wired
# Bloom prefilter fork, ask #3), q_seasonality (day-of-week chi-square
# screen), q_winsorize (exact clipped robust means), q_pmi (bounded-
# vocabulary collocation PMI), q_novelty (first-occurrence gram
# freshness). Six incumbents park, each with >= 2 green driver rows on
# code untouched this round. The round-9 registered-plan swaps (q_acf,
# q_ema, q_cusum -> segmented/dispatched forms; q_benford -> single
# scan) deliberately STAY in-window: their implementations changed, so
# they must re-earn green rows on the code as it stands.
# Round-6 second wave: the two operators built mid-round
# (q_dedup_incremental, q_lm_score -- both full-oracle,
# parity-verified at sf0.001/0.01/0.1 and under a vanilla session)
# enter immediately so no registry entry waits a round for its first
# driver row; q_distinct_aircraft and q_repetition_score park, both
# multi-green on unchanged code with named in-window holders.
_EVAL_TAIL = tuple(EVAL_TAIL_RATIONALE)
for _name in _EVAL_TAIL:
    REGISTRY[_name] = REGISTRY.pop(_name)
