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
WINDOW_ROUND = 12

EVAL_TAIL_RATIONALE: dict[str, str] = {
    # ---- round-12 second wave: q_ann_opq (the OPQ ADC read path,
    # full oracle, parity-verified at sf0.001/0.01/0.1 and under a
    # vanilla session) enters the window for its FIRST driver row --
    # no registry entry waits a round for its first row (the round-6
    # second-wave precedent); q_multimodal_resize parks to make room.
    "q_multimodal_resize": (
        "rotated OUT round 12 second wave (green driver rows r9, plus"
        " this window's pending row; multimodal.py's resize block"
        " untouched this round): the Arrow-batched byte-decimation"
        " codec path is held in-window by q_multimodal_energy (the"
        " same mapInPandas payload schema and batch shape); re-proven"
        " every round by the local parity gate"
    ),
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
        " r1+r3+r4+r11, relational.py block untouched this round): exact"
        " order statistics are held in-window by q_hill (rank-selected"
        " top-K over the same count-collapse); re-proven every round by"
        " the local parity gate"
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
        " r3+r4+r5+r11, text.py block untouched this round): hash"
        " splitting is held in-window by q_stratified_sample (the same"
        " deterministic hash-bucket assignment, stratified form); re-"
        " proven every round by the local parity gate"
    ),
    "q_dedup": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r11, dedup.py block untouched this round): exact"
        " dedup is held in-window by q_dedup_best and"
        " q_dedup_incremental (the same fingerprint groupBy, keep-best /"
        " snapshot-diff forms); re-proven every round by the local"
        " parity gate"
    ),
    "q_near_dedup_minhash": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r11, dedup.py block untouched this round): banded-"
        " signature blocking is held in-window by q_ann_lsh (band-bucket"
        " join) and q_rolling_fingerprint (the gram-hash stream); re-"
        " proven every round by the local parity gate"
    ),
    "q_near_dedup_simhash": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r1+r3+r4+r5+r6+r11, dedup.py block untouched this round):"
        " sign-projection signatures are held in-window by"
        " q_random_projection (the same JL sign-matrix machinery); re-"
        " proven every round by the local parity gate"
    ),
    "q_dedup_clusters": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r3+r4+r11, dedup.py block untouched this round): iterative"
        " connected components is benched separately (BASELINE.md) and"
        " pinned by dedicated tests; the fingerprint-join edge build is"
        " held in-window by q_dedup_incremental; re-proven every round"
        " by the local parity gate"
    ),
    "q_source_overlap_kmv": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " dedup.py block untouched this round): held in-window by"
        " q_set_overlap_kmv (the same KMV bottom-k sketch and estimator"
        " legs); re-proven every round by the local parity gate"
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
        " similarity.py block untouched this round): the trained-"
        " quantizer probe join is held in-window by q_ann_ivf_join (the"
        " same probe-join plan over the seed quantizer) with the fixture"
        " contract pinned in tests/test_pq.py; re-proven every round by"
        " the local parity gate"
    ),
    "q_ann_ivf_trained": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " similarity.py block untouched this round): held in-window by"
        " q_ann_ivf (the same coarse-quantized probe over the seed"
        " centroids) plus the committed-fixture tests; re-proven every"
        " round by the local parity gate"
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
        " similarity.py block untouched this round): held in-window by"
        " q_opq_encode (the SAME shared _pq_code_expr encode, rotated"
        " form) and q_ann_pq_pruned's layout build; re-proven every"
        " round by the local parity gate"
    ),
    "q_ann_pq": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " similarity.py block untouched this round): ADC search is held"
        " in-window by q_ann_pq_pruned (the same ADC shortlist + exact"
        " re-rank over the at-rest layout, staying for its second green"
        " row); re-proven every round by the local parity gate"
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
        " pipeline_ops.py block untouched this round): bucket content"
        " digests are re-proven every round by the local parity gate and"
        " the digest streaming twin's pytest legs"
    ),
    "q_skew_profile": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " pipeline_ops.py block untouched this round): the skew advisor"
        " is re-proven every round by the local parity gate; its salting"
        " remedy is held in-window by q_ann_lsh's bucket keys"
    ),
    "q_decile_lift": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " inference.py block untouched this round): the Arrow scoring"
        " pass is held in-window by q_model_score (the same mapInPandas"
        " inference path); re-proven every round by the local parity"
        " gate"
    ),
    "q_auc": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " inference.py block untouched this round): rank-sum machinery"
        " is held in-window by q_ks_test (the same integer rank"
        " statistics over the score collapse); re-proven every round by"
        " the local parity gate"
    ),
    "q_sax": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " timeseries.py block untouched this round): series segmentation"
        " is held in-window by q_acf's segmented day-grain collapse; re-"
        " proven every round by the local parity gate"
    ),
    "q_benford": (
        "rotated OUT round 12 age rotation (green driver rows"
        " r8+r9+r10+r11, statistics.py block untouched this round): the"
        " chi-square screen family is held in-window by q_seasonality"
        " (the same expected-vs-observed cell compare); re-proven every"
        " round by the local parity gate"
    ),
    "q_chi2": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " statistics.py block untouched this round): held in-window by"
        " q_seasonality (literally the same chi-square machinery at day-"
        " of-week grain); re-proven every round by the local parity gate"
    ),
    "q_mann_whitney": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " statistics.py block untouched this round): tie-corrected rank"
        " sums are held in-window by q_ks_test (the same distinct-value"
        " collapse and pair grid); re-proven every round by the local"
        " parity gate"
    ),
    "q_subsample_ci": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " statistics.py block untouched this round): hash-bit"
        " subsampling is held in-window by q_weighted_sample (the same"
        " deterministic per-row hash priority discipline); re-proven"
        " every round by the local parity gate"
    ),
    "q_theil_sen": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " statistics.py block untouched this round): domain-bounded pair"
        " grids are held in-window by q_ks_test; the day collapse by"
        " q_acf's segmented form; re-proven every round by the local"
        " parity gate"
    ),
    "q_spatial_join": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " spatial.py block untouched this round): grid-blocked radius"
        " joins are held in-window by q_join_range (the same blocking-"
        " then-verify range join shape); re-proven every round by the"
        " local parity gate"
    ),
    "q_pagerank": (
        "rotated OUT round 12 age rotation (green driver rows r10+r11,"
        " graph.py block untouched this round): iterative fixed-point is"
        " benched separately (BASELINE.md) and pinned by dedicated"
        " tests; the per-round join+agg shape is held in-window by"
        " q_triangles; re-proven every round by the local parity gate"
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
    "q_winsorize": (
        "rotated OUT round 11 age rotation (green driver rows r9+r10,"
        " statistics.py's winsorize block untouched this round): the"
        " exact rank-selected clipping is held in-window by the"
        " re-entering q_percentile (the same cumulative-count cut"
        " selection over a count-collapsed frame) and the robust"
        " two-sample tier by q_mann_whitney; re-proven every round by"
        " the local parity gate"
    ),
    "q_burst": (
        "rotated OUT round 11 age rotation (green driver rows r9+r10,"
        " timeseries.py's burst block untouched this round): the"
        " zero-filled day-spine aggregation is held in-window by the"
        " re-entering q_gapfill (the same dense-spine Generate +"
        " fill join) and the day-grain series discipline by q_sax's"
        " segmentation; re-proven every round by the local parity gate"
    ),
    "q_sbs1_gold_latest": (
        "rotated OUT round 11 age rotation (green driver rows"
        " r6+r7+r8+r9+r10 -- five consecutive -- sbs1_gold.py"
        " untouched this round): keyed latest-state ranking is held"
        " in-window by the re-entering q_window_latest (the same"
        " row_number-over-key-desc-time shape on the same events"
        " ordering); the ingest-side gold view stays executed every"
        " round by the streaming pytest e2e legs and the local parity"
        " gate"
    ),
    "q_multimodal_meta": (
        "rotated OUT round 11 age rotation (green driver rows r3+r10,"
        " multimodal.py's meta block untouched this round): the"
        " Arrow-batched binary metadata plumbing is held in-window by"
        " the re-entering q_multimodal_frames and q_multimodal_features"
        " (same payload schema, same mapInPandas batch shape);"
        " re-proven every round by the local parity gate"
    ),
    "q_knn_per_label": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " similarity.py's per-label block untouched this round): the"
        " grouped exact top-k cosine scan is held in-window by the"
        " re-entering q_knn_cosine (the same norm-hoisted scoring core"
        " and partial WindowGroupLimit, ungrouped form); re-proven"
        " every round by the local parity gate"
    ),
    "q_source_overlap": (
        "rotated OUT round 11 age rotation (green driver rows r9+r10,"
        " text.py's overlap block untouched this round): the pairwise"
        " source containment/Jaccard matrix is held in-window by"
        " q_source_overlap_kmv (the sketch form of the SAME pair"
        " grid over the same gram streams, staying for its second"
        " green row); re-proven every round by the local parity gate"
    ),
    "q_novelty": (
        "rotated OUT round 11 age rotation (green driver rows r9+r10,"
        " text.py's novelty block untouched this round):"
        " first-occurrence gram freshness is held in-window by the"
        " re-entering q_window_running (the same cumulative"
        " ordered-window pass that marks first occurrences) and the"
        " gram-hash family by q_dedup; re-proven every round by the"
        " local parity gate and the streaming novelty twin's pytest leg"
    ),
    "q_dup_spans_bloom": (
        "rotated OUT round 11 age rotation (green driver rows r9+r10,"
        " dedup.py's bloom fork untouched this round): the"
        " Bloom-prefiltered corpus-positional gram pipeline is the"
        " parked q_dup_spans' plan plus a broadcast bitmap gate, whose"
        " holders (q_near_dedup_minhash's gram hashing, q_window_"
        "running's windowed marking pass) re-enter the window this"
        " round; the measured 33%/43% row/byte shuffle cut stays"
        " pinned in docs/SCALE.md and the local parity gate re-proves"
        " both forks every round"
    ),
    "q_dup_spans": (
        "rotated OUT round 11 age rotation (green driver rows"
        " r8+r9+r10, dedup.py's span block untouched this round): the"
        " corpus-positional gram hashing is held in-window by the"
        " re-entering q_near_dedup_minhash (the same shingle-hash"
        " front end) and the one-pass windowed duplicate marking by"
        " q_window_running's frame machinery; re-proven every round by"
        " the local parity gate"
    ),
    "q_dedup_clusters_lsh": (
        "rotated OUT round 11 age rotation (green driver rows"
        " r5+r6+r7+r8+r9+r10 -- six consecutive, the deepest live"
        " streak in the registry -- dedup.py untouched this round):"
        " the pointer-jumping connected-components core re-enters the"
        " window directly as q_dedup_clusters, and its LSH"
        " edge-generation stage as q_near_dedup_minhash; re-proven"
        " every round by the local parity gate"
    ),
    "q_near_dedup_ngram": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " dedup.py's ngram block untouched this round): n-gram Jaccard"
        " near-dup is held in-window by the re-entering"
        " q_near_dedup_minhash (the sketched estimator of the SAME"
        " shingle-set Jaccard) and q_near_dedup_simhash; re-proven"
        " every round by the local parity gate"
    ),
    "q_dedup_events": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " dedup.py's events block untouched this round): the"
        " fingerprint-keyed exact-dedup shuffle is held in-window by"
        " the re-entering q_dedup (the same 60-bit content-fingerprint"
        " groupBy on the documents corpus); re-proven every round by"
        " the local parity gate and the streaming dedup pytest leg"
    ),
    "q_text_entropy": (
        "rotated OUT round 11 age rotation (green driver rows r9+r10,"
        " text.py's entropy block untouched this round): the"
        " shared-ln float fold over exact integer counts is held"
        " in-window by q_benford (the same digit/count goodness-of-fit"
        " discipline, staying for its fourth green row); the"
        " zero-exchange per-row sorted scan stays pinned by its"
        " executed-stage meter row (0 shuffle records) and the local"
        " parity gate"
    ),
    "q_pmi": (
        "rotated OUT round 11 age rotation (green driver rows r9+r10,"
        " text.py's pmi block untouched this round): exact-count"
        " association scoring over a bounded vocabulary is held"
        " in-window by q_chi2 (the same observed-vs-expected"
        " contingency fold, staying for its second green row);"
        " re-proven every round by the local parity gate"
    ),
    "q_length_hist": (
        "rotated OUT round 11 age rotation (green driver rows r3+r10,"
        " relational.py's histogram block untouched this round): the"
        " fixed-bucket distribution summary is held in-window by the"
        " re-entering q_percentile (the exact order-statistics view of"
        " the same length column); re-proven every round by the local"
        " parity gate"
    ),
    "q_doc_fingerprint": (
        "rotated OUT round 11 age rotation (green driver rows r1+r10,"
        " text.py's fingerprint block untouched this round): the"
        " rolling-hash document fingerprint family is held in-window"
        " by the re-entering q_dedup (which groups on exactly these"
        " fingerprints) and q_near_dedup_minhash's shingle hashes;"
        " re-proven every round by the local parity gate"
    ),
    "q_token_count": (
        "rotated OUT round 11 age rotation (green driver rows r3+r10,"
        " text.py's token-count block untouched this round): the"
        " regex-split token accounting is held in-window by the"
        " re-entering q_repetition_score (the same tokenizer feeding"
        " its bigram statistics); re-proven every round by the local"
        " parity gate"
    ),
    "q_quality_score": (
        "rotated OUT round 11 age rotation (green driver rows"
        " r1+r3+r10, text.py's quality block untouched this round):"
        " heuristic document scoring (length/punct/stopword ratios) is"
        " held in-window by the re-entering q_repetition_score (the"
        " same narrow per-document scan discipline over the same"
        " corpus); re-proven every round by the local parity gate"
    ),
    "q_tfidf": (
        "rotated OUT round 11 age rotation (green driver rows"
        " r1+r3+r10, text.py's tfidf block untouched this round): the"
        " gram-explode + document-frequency join is held in-window by"
        " the re-entering q_repetition_score (same explode-aggregate"
        " front end) and the broadcast dim-join shape by q_join_star;"
        " re-proven every round by the local parity gate"
    ),
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
    "q_near_dedup_embedding_lsh": (
        "rotated OUT round 10 mid-round wave (green driver rows"
        " r6+r7+r8+r9 -- four consecutive -- its similarity.py block"
        " untouched this session): the banded hyperplane-LSH bucket"
        " join is held in-window by q_dedup_clusters_lsh, whose pair"
        " stage IS this query's bucket-keyed self-join (first-agreeing"
        "-band emission and all), extended with the component fold;"
        " the embsweep blocking measurements stay recorded in"
        " docs/SCALE.md and re-proven every round by the local parity"
        " gate"
    ),
    "q_contamination_bloom": (
        "rotated OUT round 10 mid-round wave (green driver rows"
        " r4+r5+r6+r7+r8+r9 -- six consecutive -- pipeline_ops'"
        " bloom-gate block untouched this round): the Bloom-prefilter"
        " capability is held in-window by q_dup_spans_bloom (the same"
        " fixed-size bitmap broadcast ahead of a join-back, re-earning"
        " its row on the round-10 plan); the asymmetric"
        " eval-set-sized-filter crossover stays measured in"
        " docs/SCALE.md and re-proven every round by the local parity"
        " gate"
    ),
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
    "q_pii_scrub": (
        "rotated OUT round 10 third wave (green driver rows"
        " r3+r4+r5+r6+r7+r8+r9 -- a seven-green history, the deepest"
        " in the registry -- text.py's scrub block untouched this"
        " round): the regex/string-scan tier is double-held in-window"
        " by q_chunk_docs (the same narrow text pass with sequence"
        " windowing) and the re-entered q_string_clean; its window"
        " slot funds q_ann_ivf_trained_join's first driver row (the"
        " batch form completing the round-10 trained-quantizer"
        " trilogy); the zero-exchange scrub plan stays pinned by its"
        " plan test and re-proven every round by the local parity"
        " gate"
    ),
    "q_approx_percentile": (
        "rotated OUT round 10 age rotation (green driver rows"
        " r6+r7+r8+r9, statistics untouched this round): the"
        " percentile-sketch tier's certificate discipline is held"
        " in-window by q_countmin (sketch rebuilt cell-for-cell by the"
        " oracle) and the exact-cents selection shape by q_winsorize's"
        " cumulative-count cuts; bounded-error vs exact stays re-proven"
        " every round by tests/test_approx.py and the local parity gate"
    ),
    "q_join_snowflake": (
        "rotated OUT round 10 age rotation (green driver rows"
        " r5+r6+r7+r8+r9, joins.py untouched this round): the"
        " inner-equi chain capability is held in-window by the"
        " re-entering q_join_left (outer form over the same star core)"
        " and q_ann_ivf_join's broadcast-hash equi-join; re-proven"
        " every round by the local parity gate and its plan pin"
    ),
    "q_scd2_intervals": (
        "rotated OUT round 10 age rotation (green driver rows"
        " r7+r8+r9, windows.py untouched this round): the lag/lead"
        " interval staging is held in-window by the re-entering"
        " q_window_lag_delta (its core analytic) and q_streaks'"
        " per-user ordered lag runs; the one-exchange two-window plan"
        " stays pinned by its plan test and the local parity gate"
    ),
    "q_interval_peak": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " timeseries.py's interval code untouched this round): the"
        " bucket-overlap rollup is held in-window by q_burst's"
        " zero-filled day-spine aggregation and the re-entering"
        " q_sliding_window's time-bucket tier; re-proven every round"
        " by the local parity gate"
    ),
    "q_decay_topk": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " timeseries.py's decay code untouched this round): the"
        " time-decayed ranking tier is held in-window by"
        " q_weighted_sample (priority-ranked top-K through the same"
        " WindowGroupLimit) and q_burst's trailing-baseline scoring;"
        " re-proven every round by the local parity gate"
    ),
    "q_regression": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " statistics.py's OLS block untouched this round): the"
        " sufficient-statistics fold over exact scaled integers is"
        " exactly q_acf's in-window decimal(38,0) discipline (same"
        " partial+final hash shape); re-proven every round by the"
        " local parity gate and its third-engine numpy test"
    ),
    "q_mutual_info": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " statistics.py's MI block untouched this round): the"
        " joint-distribution information fold (exact counts, shared-ln"
        " sorted fold) is held in-window by q_text_entropy (the same"
        " float discipline over char bigrams) and q_pmi's association"
        " scoring; re-proven every round by the local parity gate"
    ),
    "q_anomaly_mad": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " statistics.py's MAD block untouched this round): the"
        " per-group aggregate broadcast-join-back (twice: median then"
        " MAD) is q_winsorize's in-window cut-and-join-back shape;"
        " re-proven every round by the local parity gate and its"
        " 3-scan plan pin"
    ),
    "q_weighted_median": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " statistics.py's weighted-median block untouched this round):"
        " cumulative-weight threshold selection is q_winsorize's"
        " in-window cumulative-count cut over the same count-collapsed"
        " frame; re-proven every round by the local parity gate"
    ),
    "q_abtest": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " statistics.py's z-test block untouched this round): the"
        " two-sample comparison tier is held in-window by q_ks_test"
        " (whole-distribution form over the same cohort spend frame,"
        " now decimal-exact at any scale); re-proven every round by"
        " the local parity gate"
    ),
    "q_gini": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " statistics.py's gini block untouched this round): the"
        " order-statistics cumulative fold is held in-window by"
        " q_hill's K-bounded sorted fold over the same"
        " rank-then-reduce discipline; re-proven every round by the"
        " local parity gate"
    ),
    "q_inverted_index": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " indexing.py untouched this round): sharded posting-list"
        " construction is held in-window by the re-entering q_token_tf"
        " (the same explode -> per-token aggregation front end) and"
        " q_chunk_docs' writer-side sequence tier; re-proven every"
        " round by the local parity gate"
    ),
    "q_bitmap_index": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " indexing.py untouched this round): the bitmap-word"
        " aggregation is held in-window by q_countmin's fixed-grid"
        " mergeable partials and the re-entering q_array_explode's"
        " array tier; re-proven every round by the local parity gate"
    ),
    "q_fuzzy_join": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " linkage.py untouched this round): the equi-blocked non-equi"
        " predicate join discipline is held in-window by"
        " q_source_overlap and q_source_overlap_kmv (hash-blocked"
        " self-joins with order predicates -- the same"
        " BroadcastNestedLoop avoidance); re-proven every round by the"
        " local parity gate and its plan pin"
    ),
    "q_attribution": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " attribution.py untouched this round): per-user ordered"
        " lookback staging is held in-window by q_streaks (the same"
        " user-keyed ordered lag) and keyed latest-state by"
        " q_sbs1_gold_latest; re-proven every round by the local"
        " parity gate"
    ),
    "q_rollup_merge": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " rollup_merge.py untouched this round): the partial-merge"
        " algebra proof is held in-window by q_countmin (the same"
        " mergeable-partials discipline with an oracle-rebuilt"
        " certificate) and the re-entering q_agg_conditional's"
        " grouped-aggregate tier; re-proven every round by the local"
        " parity gate"
    ),
    "q_cooccur": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " basket.py's cooccur block untouched this round): pairwise"
        " co-occurrence counting is contained in in-window q_pmi (the"
        " same presence self-join pair stream, extended with"
        " association scoring); re-proven every round by the local"
        " parity gate"
    ),
    "q_transitions": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " sequence.py's transition block untouched this round):"
        " ordered per-user step pairs are q_streaks' in-window lag"
        " staging (same sort, same keying); the streaming transition"
        " twin keeps its pytest e2e; re-proven every round by the"
        " local parity gate"
    ),
    "q_paths": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " sequence.py's path block untouched this round): ordered"
        " prefix aggregation is held in-window by q_streaks (ordered"
        " runs over the same user-event sort) and q_chunk_docs'"
        " sequence windowing; re-proven every round by the local"
        " parity gate"
    ),
    "q_skyline": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " skyline.py untouched this round): the dominance-pair"
        " elimination keeps its block-local antichain shape pinned by"
        " its plan test, the order-statistics tier held in-window by"
        " q_hill; re-proven every round by the local parity gate"
    ),
    "q_cdc_apply": (
        "rotated OUT round 10 age rotation (green driver rows r8+r9,"
        " cdc.py untouched this round): the keyed last-writer fold is"
        " held in-window by q_sbs1_gold_latest (latest-per-key over"
        " the same ranking shape) and its merge_states equivalence"
        " stays pinned exactly by tests/test_cdc.py plus the streaming"
        " CDC twin's pytest e2e; re-proven every round by the local"
        " parity gate"
    ),
    # q_rollup re-entered the window round-10 thirteenth wave: the
    # oldest overdue parked entry (age 6, last green r4) takes the
    # drain slot the quota step to 22 (tail > 105) demands; q_streaks
    # funds the re-entry.
    "q_streaks": (
        "rotated OUT round 10 thirteenth wave (green driver row r9 on"
        " the code as it stands -- its block untouched this round):"
        " the gaps-and-islands lag-gap core is held in-window by the"
        " re-entered q_window_lag_delta (the same lag-over-ordered-"
        "window primitive the island ids integrate) and the date-"
        "grain spine arithmetic by q_sax's day-index segmentation;"
        " its pytest leg and the local parity gate re-prove the"
        " island algebra every round"
    ),
    # q_token_count re-entered the window mid-round 10: the OLDEST
    # green age in the registry (last driver row r3), funded by
    # q_lm_score's park below -- the age-rotation drain continuing at
    # the quota the guard enforces as the tail grows past 95.
    "q_lm_score": (
        "rotated OUT round 10 mid-round wave (green driver rows"
        " r6+r7+r8+r9 -- four consecutive -- text.py's LM block"
        " untouched this session): the n-gram language-model scoring"
        " tier is held in-window by q_pmi (the same bigram/unigram"
        " association fold over shared gram streams) and q_text_entropy"
        " (the same shared-ln float discipline per document); its"
        " window slot funds the re-entry of q_token_count, the oldest"
        " green age in the registry; re-proven every round by the"
        " local parity gate"
    ),
    # q_length_hist re-entered the window round-10 eighth wave: the
    # oldest overdue parked entry (age 7, last green r3) takes the
    # drain slot the quota step to 21 (tail > 100) demands.
    # ---- round-10 eighth wave, second slot: q_holt funds
    # q_length_hist's drain re-entry.
    "q_holt": (
        "rotated OUT round 10 eighth wave (green driver rows r8+r9 on"
        " the coupled level+trend fold; block a9f7a883 -- the one"
        " drift since the r9 green is the re-read ADVICE fix"
        " replacing the inline density probe with a call into the"
        " shared memoized _series_exceeds_task_bound helper, fold"
        " semantics untouched and re-proven by fresh sf0.001-0.01"
        " parity this session): the coupled-recurrence"
        " list-accumulator tier is held in-window by q_ema (the same"
        " density-dispatched segmented fold family behind the same"
        " probe) and the exact-sums discipline by q_cusum; the"
        " segmented-equality property pins and the local parity gate"
        " re-prove it every round"
    ),
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
