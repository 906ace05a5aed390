"""Benchmark harness (driver contract: one JSON line to stdout).

Runs the headline query set at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints, as its LAST stdout line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, "reps": <n>,
     "value_mean": ...}

LINE-LENGTH CONTRACT (round 7): the driver captures only the last
~2000 characters of stdout and parses the JSON line out of that tail.
Rounds 5-6 appended a per-query ``queries_mean`` dict to the same
line; at 38-43 queries the line exceeded 2000 chars, the tail clipped
its head, and the driver recorded ``parsed: null`` two rounds running.
The per-query means are still printed -- on their OWN earlier line
(``bench_detail``) that the driver is free to ignore -- and the final
contract line is asserted < 1900 chars so it can never silently
regress past the tail window again.

Execution is measured with the noop sink (full plan runs, nothing is
collected to the driver), matching how a production job consumes these
operators.

VARIANCE DISCIPLINE (round 4): each query runs $SPARK_GRAFT_BENCH_REPS
times (default 3) and the comparable number is the per-query MIN --
round-over-round comparisons kept being confounded by +/-15% box
variance (BASELINE.md's own four same-code runs span 34.3-38.5 s), and
min-of-n is the standard way to strip scheduler/GC noise from a
steady-state plan-cost signal. The mean is emitted alongside so both
views stay visible; compare min to min across rounds (BASELINE.md
"compare min-of-n" line). BASELINE.md discipline: the first recorded
run is the baseline; later changes must stay within 2x.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dump1090_stream_parser_spark.session import get_spark

#: Headline queries: one per physical shape that matters at scale.
HEADLINE = [
    "q_group_topk",        # scan -> partial/final agg -> top-k (flagship)
    "q_filter_range",      # pushed-down predicate scan
    "q_join_star",         # 5-way star join + agg
    "q_join_left",         # outer join + agg
    "q_window_latest",     # shuffle+sort window rank
    "q_window_running",    # framed window aggregates
    "q_sessionize",        # lag-gap sessionization (two window passes)
    "q_rollup",            # grouping sets
    "q_percentile",        # sort-based quantile aggregate
    "q_asof_lastval",      # as-of via last(ignorenulls) window
    "q_time_bucket",       # time bucketing
    "q_json_extract",      # JSON column access
    "q_token_tf",          # explode -> agg -> top-k
    "q_tfidf",             # two-level text aggregation + broadcast join
    "q_lang_id",           # bigram profile scorer (explode-join-argmax)
    "q_dedup",             # exact dedup
    "q_near_dedup_minhash",  # MinHash LSH end-to-end
    "q_near_dedup_simhash",  # SimHash banding
    "q_knn_cosine",        # brute-force similarity top-k
    "q_knn_join",          # batch kNN join: query TABLE x corpus
    "q_ann_ivf_join",      # batch IVF probe join on cell_id
    "q_ann_lsh",           # hyperplane-LSH bucketed ANN
    "q_ann_ivf",           # IVF coarse-quantized ANN
    "q_multimodal_features",  # Arrow mapInPandas codec path
    "q_bm25",              # explode-free array-op scoring + 1-row broadcast
    "q_quality_filter",    # narrow-map cascade, single tiny rollup
    "q_funnel",            # stacked window stages, one exchange
    "q_centroid_outliers",  # posexplode agg + broadcast + window top-k
    "q_contamination",     # fact-fact gram-hash semi join
    "q_quantize_embeddings",  # narrow higher-order array map + 1 exchange
    "q_mix_weights",       # 1-row stats broadcast re-weighting
    "q_pii_scrub",         # zero-exchange regex scan
    "q_join_full",         # full outer over pre-aggregated sides
    "q_chunk_docs",        # context-window chunking (narrow explode)
    "q_contamination_bloom",  # Bloom-prefiltered gram semi join (scale twin)
    "q_heavy_hitters",     # Misra-Gries sketch (bounded-shuffle top-k)
    "q_model_score",       # Arrow-batched classifier inference pass
    "q_near_dedup_embedding_lsh",  # banded hyperplane-LSH pair blocking
    "q_sbs1_gold_latest",  # wire-line synth -> production parse -> gold agg
    "q_multimodal_resize",  # mapInPandas byte decimation + fingerprint
    "q_sbs1_gold_deadletter",  # fault-injected parse -> routing/NULL summary
    "q_approx_percentile",  # value-histogram exact + GK sketch certificate
    "q_dedup_incremental",  # snapshot-diff dedup (fingerprint joins)
    "q_lm_score",          # corpus-LM scoring join + bottom-k
    "q_containment",       # Arrow winnowing + inverted-index self-join
    "q_semantic_dedup",    # SemDeDup: quantize + within-cell cosine prune
    "q_weighted_sample",   # E-S priority sample (WindowGroupLimit top-K)
    "q_scd2_intervals",    # SCD2 intervals: one exchange, two windows
    "q_countmin",          # count-min grid + broadcast point probes
    "q_random_projection", # JL sign-matrix projection (narrow map)
    "q_set_overlap_kmv",   # KMV bottom-k sketch + set-op estimates
    "q_source_divergence", # pairwise JS divergence, token-sorted fold
    "q_ema",               # linear-recurrence fold (sorted-array EMA)
    "q_regression",        # OLS from exact-integer sufficient stats
    "q_inverted_index",    # sharded delta-encoded posting lists
    "q_fuzzy_join",        # blocked Levenshtein record linkage
    "q_mutual_info",       # joint-distribution MI, domain-sized folds
    "q_anomaly_mad",       # two-pass median/MAD robust outlier gate
    "q_attribution",       # one-exchange last-touch as-of credit
    "q_rollup_merge",      # partial-rollup merge == direct rollup
    "q_acf",               # lag-1..3 autocorrelation, exact-int stats
    "q_cooccur",           # basket-bounded co-occurrence self-join
    "q_transitions",       # Markov transition matrix, one window pass
    "q_interval_peak",     # sweep-line concurrency (deltas + day cumsum)
    "q_skyline",           # Pareto frontier via domain-sized prefix max
    "q_dup_spans",         # duplicated-substring spans (gaps-and-islands)
    "q_cdc_apply",         # changelog MERGE-apply (tombstoned top-1)
    "q_bitmap_index",      # bit_or month bitmaps + bitwise membership
    "q_weighted_median",   # integer-exact weighted order statistic
    "q_triangles",         # ordered 3-clique join + clustering coeff
    "q_abtest",            # pairwise two-proportion z-test matrix
    "q_gini",              # rank-formula concentration coefficient
    "q_decay_topk",        # power-of-two decayed ranking (exact ints)
    "q_cusum",             # integer-exact max-drawdown drift statistic
    "q_holt",              # coupled level+trend fold (list accumulator)
    "q_benford",           # first-digit law screen (string-digit, no libm)
    "q_paths",             # 3-step path mining (one sort, both lags)
    "q_streaks",           # date-grain gaps-and-islands streaks
    "q_dup_spans_bloom",   # Bloom-prefiltered dup-side span join
    "q_seasonality",       # day-of-week chi-square profile screen
    "q_winsorize",         # exact p01/p99 clipped robust means
    "q_pmi",               # bounded-vocab collocation PMI
    "q_novelty",           # first-occurrence gram freshness score
    "q_text_entropy",      # char-bigram entropy (sorted-fold float)
    "q_source_overlap",    # source-pair gram containment matrix
    "q_burst",             # trailing-baseline z on zero-filled spine
    "q_ks_test",           # exact two-sample KS (integer CDF gaps)
    "q_hill",              # Hill tail index from top-K order stats
    "q_source_overlap_kmv",  # KMV source-overlap sketch + exact legs
    "q_ann_ivf_trained",   # IVF probe over the persisted trained quantizer
    "q_ann_ivf_trained_join",  # batch probe join over the trained quantizer
    "q_spatial_join",      # grid-blocked radius join (lossless cover)
    "q_chi2",              # chi-square independence + Cramer's V
    "q_pq_encode",         # PQ codes over the committed codebook
    "q_ann_pq",            # ADC shortlist + exact re-rank (PQ read path)
    "q_mann_whitney",      # tie-corrected rank-sum z (integer 2*U1)
    "q_compaction_plan",   # metadata-plane small-file bin packing
    "q_table_digest",      # order-insensitive bucket content digests
    "q_subsample_ci",      # hash-bit subsampling CI (one-pass bootstrap)
    "q_theil_sen",         # median-of-slopes robust trend (domain pairs)
    "q_skew_profile",      # shuffle-key skew diagnosis + salt advisor
    "q_sax",               # symbolic aggregate approximation (SAX words)
    "q_decile_lift",       # model-eval lift/capture table (10 rows)
    "q_auc",               # exact rank-sum ROC AUC (no pairwise join)
    "q_ann_pq_pruned",     # at-rest IVF x PQ index: pruned search (build once/session)
    "q_opq_encode",        # OPQ rotated-codebook encode (narrow, staged rotation)
    "q_ann_opq",           # OPQ ADC search: rotated codes + original-vector re-rank
    "q_bucket_join",       # co-bucketed fact join: zero-exchange (build once/session)
    "q_snapshot_read",     # snapshot-table time-travel read (build once/session)
]
# q_dedup_clusters and q_pagerank are benched separately (BASELINE.md):
# an iterative operator's wall-clock is dominated by per-round driver
# scheduling at toy scale (q_pagerank measured 4.1 s at sf0.1, the
# slowest headline line, ~all of it fixed-round job latency), which
# would swamp the steady-state headline signal.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="bench",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once (not timed): tiny query.
    queries["q_group_topk"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # Rep loop OUTER (whole set per rep, not n back-to-back runs of one
    # query): successive reps of the same query would share a hot page
    # cache + JIT state that round-robin execution, like the driver's
    # own per-round single pass, does not enjoy.
    samples: dict[str, list[float]] = {}
    for _ in range(reps):
        for name in HEADLINE:
            fn = queries.get(name)
            if fn is None:
                continue
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.setdefault(name, []).append(time.perf_counter() - t0)

    per_query = {n: round(min(v), 3) for n, v in samples.items()}
    per_query_mean = {
        n: round(sum(v) / len(v), 3) for n, v in samples.items()
    }
    total = round(sum(per_query.values()), 3)
    total_mean = round(sum(per_query_mean.values()), 3)
    # Detail line first: anything after it may be all the driver sees.
    # Full 3-decimal mins and means both live here.
    print(
        json.dumps(
            {
                "metric": "bench_detail",
                "reps": reps,
                "value_mean": total_mean,
                "queries_min": per_query,
                "queries_mean": per_query_mean,
            },
            separators=(",", ":"),
        )
    )
    # Contract line (round-10 form, VERDICT r9 ask #8): the full
    # per-query grain lives ONLY on the bench_detail line above --
    # 3-decimal mins and means for every query, never degraded. The
    # contract line keeps the spec keys {metric, value, unit, queries,
    # sf} (+ reps/value_mean), but its "queries" dict carries the
    # SLOWEST queries at full 2-decimal grain, as many as fit the
    # character budget, with explicit elision accounting
    # (n_queries/n_elided) so a reader knows the dict is the top of
    # the distribution, not the whole set. This replaces the round-9
    # scheme of silently degrading every query to 1-decimal when the
    # set outgrew the budget: grain is now constant at every registry
    # size -- only COVERAGE of the already-redundant contract dict
    # shrinks, and it shrinks auditably.
    slowest = sorted(per_query.items(), key=lambda t: (-t[1], t[0]))

    def contract(top_n: int) -> str:
        return json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": {
                    n: round(v, 2) for n, v in slowest[:top_n]
                },
                "n_queries": len(per_query),
                "n_elided": max(0, len(per_query) - top_n),
                "sf": sf,
                "reps": reps,
                "value_mean": round(total_mean, 1),
            },
            separators=(",", ":"),
        )

    top_n = len(per_query)
    line = contract(top_n)
    while len(line) >= 1900 and top_n > 0:
        top_n -= 5
        line = contract(top_n)
    # Driver tail window is ~2000 chars; keep headroom for a trailing
    # newline plus any stray log flush between us and process exit.
    assert len(line) < 1900, f"contract line too long: {len(line)}"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
