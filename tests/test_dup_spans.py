"""Duplicated-substring spans (operators/dedup.py q_dup_spans):
pure-Python recompute + chaining invariant."""

from __future__ import annotations

from collections import defaultdict

from dump1090_stream_parser_spark.operators.dedup import (
    SPAN_GRAM,
    q_dup_spans,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def _spans(tokens_by_doc):
    gram_docs = defaultdict(set)
    gram_pos = defaultdict(list)
    for doc, toks in tokens_by_doc.items():
        for i in range(len(toks) - SPAN_GRAM + 1):
            g = " ".join(toks[i:i + SPAN_GRAM])
            gram_docs[g].add(doc)
            gram_pos[doc].append((i, g))
    out = set()
    for doc, positions in gram_pos.items():
        dup_pos = sorted(
            i for i, g in positions if len(gram_docs[g]) >= 2
        )
        if not dup_pos:
            continue
        start = prev = dup_pos[0]
        n = 1
        for p in dup_pos[1:]:
            if p == prev + 1:
                prev = p
                n += 1
                continue
            out.add((doc, start, prev + SPAN_GRAM - 1,
                     prev + SPAN_GRAM - start, n))
            start = prev = p
            n = 1
        out.add((doc, start, prev + SPAN_GRAM - 1,
                 prev + SPAN_GRAM - start, n))
    return out


def test_dup_spans_match_python(spark):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"],
         r["span_tokens"], r["n_grams"])
        for r in q_dup_spans(spark, SF_DIR).collect()
    }
    assert got, "duplicated spans expected in the synthetic corpus"
    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    assert got == _spans(docs)
    for _, start, end, span_tokens, n_grams in got:
        assert span_tokens == end - start + 1
        assert span_tokens == n_grams + SPAN_GRAM - 1

def test_dup_spans_bloom_equals_exact(spark):
    """The Bloom-prefiltered fork (VERDICT r8 ask #3) must be
    span-for-span identical: Bloom filters have no false negatives and
    the verify join scrubs false positives, so the shared oracle is
    honest."""
    from dump1090_stream_parser_spark.operators.dedup import (
        q_dup_spans_bloom,
    )

    exact = {tuple(r) for r in q_dup_spans(spark, SF_DIR).collect()}
    bloom = {tuple(r) for r in q_dup_spans_bloom(spark, SF_DIR).collect()}
    assert exact == bloom
    assert exact, "non-empty span set expected"


def test_novelty_matches_python(spark):
    """q_novelty third-engine check: distinct-gram novelty per doc,
    plus the corpus identity sum(n_novel) == distinct gram hashes."""
    from dump1090_stream_parser_spark.operators.dedup import q_novelty

    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in q_novelty(spark, SF_DIR).collect()
    }
    assert got, "novelty rows expected"
    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    first = {}
    by_doc = {}
    for doc in sorted(docs):
        toks = docs[doc]
        grams = {
            " ".join(toks[i:i + SPAN_GRAM])
            for i in range(len(toks) - SPAN_GRAM + 1)
        }
        if not grams:
            continue
        by_doc[doc] = grams
        for g in grams:
            first.setdefault(g, doc)
    assert got.keys() == by_doc.keys()
    for doc, grams in by_doc.items():
        novel = sum(1 for g in grams if first[g] == doc)
        n, nn, frac = got[doc]
        assert n == len(grams)
        assert nn == novel
        assert abs(frac - round(novel / len(grams), 6)) < 1e-9
    assert sum(nn for _, nn, _ in got.values()) == len(first)


def test_source_overlap_matches_python(spark):
    """q_source_overlap third-engine check: gram sets per source in
    pure Python, then every pair statistic."""
    import math

    from dump1090_stream_parser_spark.operators.dedup import (
        q_source_overlap,
    )

    got = {
        (r["source_a"], r["source_b"]): r
        for r in q_source_overlap(spark, SF_DIR).collect()
    }
    assert got, "source pairs expected"
    rows = load_table(spark, SF_DIR, "documents").collect()
    gsets: dict[str, set] = {}
    for r in rows:
        toks = [t for t in r["text"].split(" ") if t]
        grams = {
            " ".join(toks[i:i + SPAN_GRAM])
            for i in range(len(toks) - SPAN_GRAM + 1)
        }
        if grams:
            gsets.setdefault(r["source"], set()).update(grams)
    srcs = sorted(gsets)
    expect_pairs = {
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]
    }
    assert got.keys() == expect_pairs
    for (a, b), r in got.items():
        ga, gb = gsets[a], gsets[b]
        shared = len(ga & gb)
        assert (r["grams_a"], r["grams_b"], r["shared"]) == (
            len(ga), len(gb), shared
        )
        assert math.isclose(
            r["jaccard"], shared / len(ga | gb), rel_tol=0,
            abs_tol=5.01e-7,
        )
        assert math.isclose(
            r["containment_a"], shared / len(ga), rel_tol=0,
            abs_tol=5.01e-7,
        )
        assert math.isclose(
            r["containment_b"], shared / len(gb), rel_tol=0,
            abs_tol=5.01e-7,
        )
        assert r["jaccard"] <= min(r["containment_a"], r["containment_b"]) + 1e-9


def test_source_overlap_kmv_matches_python(spark):
    """q_source_overlap_kmv third-engine check: sketches AND estimators
    recomputed from Python gram sets with the identical IEEE arithmetic,
    plus the 1/sqrt(K-2) error envelope against the exact values."""
    import hashlib
    import math

    from dump1090_stream_parser_spark.operators.dedup import (
        SOV_K,
        q_source_overlap_kmv,
    )

    got = {
        (r["source_a"], r["source_b"]): r
        for r in q_source_overlap_kmv(spark, SF_DIR).collect()
    }
    assert got, "source pairs expected"

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = load_table(spark, SF_DIR, "documents").collect()
    hsets: dict[str, set] = {}
    for r in rows:
        toks = [t for t in r["text"].split(" ") if t]
        grams = {
            h60(" ".join(toks[i:i + SPAN_GRAM]))
            for i in range(len(toks) - SPAN_GRAM + 1)
        }
        if grams:
            hsets.setdefault(r["source"], set()).update(grams)
    sketches = {s: sorted(hs)[:SOV_K] for s, hs in hsets.items()}
    two60 = 1152921504606846976.0

    def est(cnt, hk):
        if cnt < SOV_K:
            return float(cnt)
        return (float(SOV_K - 1) * two60) / float(hk)

    srcs = sorted(hsets)
    assert got.keys() == {
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]
    }
    rsd = 1.0 / math.sqrt(SOV_K - 2)
    for (a, b), r in got.items():
        ka, kb = sketches[a], sketches[b]
        # exact certificate legs
        shared = len(hsets[a] & hsets[b])
        assert (r["grams_a"], r["grams_b"], r["shared"]) == (
            len(hsets[a]), len(hsets[b]), shared
        )
        # sketch recompute: merged trim, match count, estimators --
        # identical float ops, so equality is exact
        uk = sorted(set(ka) | set(kb))[:SOV_K]
        both = set(ka) & set(kb)
        c = sum(1 for h in uk if h in both)
        union_est = est(len(uk), uk[-1])
        jacc_est = float(c) / float(len(uk))
        inter_est = jacc_est * union_est
        assert r["union_est"] == union_est
        assert r["jaccard_est"] == jacc_est
        assert r["inter_est"] == inter_est
        assert r["containment_a_est"] == inter_est / est(
            len(ka), ka[-1] if ka else 0
        )
        assert r["containment_b_est"] == inter_est / est(
            len(kb), kb[-1] if kb else 0
        )
        # error envelope: union estimate within 5 rsd of exact union
        exact_union = len(hsets[a] | hsets[b])
        assert abs(union_est - exact_union) <= 5 * rsd * exact_union
