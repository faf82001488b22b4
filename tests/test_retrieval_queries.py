"""Semantic invariants for the retrieval-infrastructure queries
(plans/retrieval.py): properties the oracle hash-compare cannot express —
postings consistency against the raw text, label exclusion in the mined
negatives, decay-weight bounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from syscol_spark.plans.catalog import query_catalog
from syscol_spark.sources.tables import load_table


def _run(spark, sf_dir, name):
    return query_catalog()[name](spark, sf_dir)


def test_inverted_index_consistency(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_inverted_index").collect()
    assert 0 < len(rows) <= 40
    n_docs = load_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert 1 <= r["df"] <= n_docs
        assert r["tf_total"] >= r["df"]  # every posting doc contributes >=1
        assert r["pos_checksum"] >= 0
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    assert len({r["term"] for r in rows}) == len(rows)


def test_phrase_search_docs_really_contain_phrase(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_phrase_search").collect()
    assert rows
    hits = {r["doc_id"]: r for r in rows}
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(list(hits)))
        .select("doc_id", "text")
        .collect()
    }
    for doc_id, r in hits.items():
        toks = texts[doc_id].strip().split()
        occ = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "spark" and toks[i + 1] == "join"
        )
        assert occ == r["n_occurrences"], (doc_id, occ, r)
        assert toks[r["first_pos"]] == "spark"
        assert toks[r["first_pos"] + 1] == "join"


def test_phrase_search_k_docs_really_contain_phrase(spark, sf_dir):
    """The k-way intersection (with a REPEATED phrase term) against a
    driver-side replay over the raw text."""
    from syscol_spark.plans.retrieval import _PHRASE_K

    rows = _run(spark, sf_dir, "q_phrase_search_k").collect()
    assert rows
    hits = {r["doc_id"]: r for r in rows}
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(list(hits)))
        .select("doc_id", "text")
        .collect()
    }
    k = len(_PHRASE_K)
    for doc_id, r in hits.items():
        toks = texts[doc_id].strip().split()
        starts = [
            i
            for i in range(len(toks) - k + 1)
            if all(toks[i + j] == _PHRASE_K[j] for j in range(k))
        ]
        assert len(starts) == r["n_occurrences"], (doc_id, starts, r)
        assert starts and starts[0] == r["first_pos"], (doc_id, starts, r)


def test_phrase_occurrences_handles_overlap_and_repeats(spark):
    """Unit check of the kernel on a hand-built corpus: repeated terms,
    overlapping occurrences, and a near-miss that shares k-1 slots."""
    from syscol_spark.plans.retrieval import phrase_occurrences

    docs = spark.createDataFrame(
        [
            (1, "a b b a b b"),   # "a b b" at 0 and 3
            (2, "b b a"),          # near-miss: no occurrence
            (3, "a b b"),          # exactly one at 0
            (4, "a b a b"),        # none ("a b a" != phrase)
        ],
        "doc_id long, text string",
    )
    p = docs.select(
        "doc_id", F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "term")
    )
    got = {
        (r["doc_id"], r["start"])
        for r in phrase_occurrences(p, ("a", "b", "b")).collect()
    }
    assert got == {(1, 0), (1, 3), (3, 0)}


def test_inverted_delta_equals_full_rebuild(spark, sf_dir):
    """The merge theorem, checked directly: shard/merge result == one-shot
    index (same top-40 slice as q_inverted_index)."""
    full = _run(spark, sf_dir, "q_inverted_index").collect()
    merged = _run(spark, sf_dir, "q_inverted_delta").collect()
    key = lambda r: (r["term"], r["df"], r["tf_total"], r["first_doc"], r["pos_checksum"])  # noqa: E731
    assert sorted(map(key, merged)) == sorted(map(key, full))


def test_hard_negatives_ann_subset_of_exact_and_label_clean(spark, sf_dir):
    """ANN-shortlist negatives: label exclusion holds, cosines are real, and
    every mined pair is a bucket-collision candidate — cross-checked by
    recomputing the SRP buckets driver-side."""
    import numpy as np

    from syscol_spark.operators.similarity import _srp_plane

    rows = _run(spark, sf_dir, "q_hard_negatives_ann").collect()
    assert rows
    emb = {
        r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    planes = np.array([_srp_plane(64, p, 42) for p in range(6)])  # (6, 64)

    def bucket(v):
        return int(sum((1 << p) for p in range(6) if float(planes[p] @ v) >= 0))

    for r in rows:
        assert r["neg_label"] != r["label"], r
        assert -1.0 <= r["cosine"] <= 1.0
        bq = bucket(emb[r["query_id"]][0])
        bc = bucket(emb[r["neighbor_id"]][0])
        assert bin(bq ^ bc).count("1") <= 1, r


def test_hard_negatives_exclude_anchor_label(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_hard_negatives").collect()
    assert rows
    per_query: dict[int, list] = {}
    for r in rows:
        assert r["neg_label"] != r["label"], r
        assert -1.0 <= r["cosine"] <= 1.0
        assert 1 <= r["rk"] <= 3
        per_query.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_query.items():
        assert len(rs) == 3, (qid, rs)
        by_rk = sorted(rs, key=lambda r: r["rk"])
        cosines = [r["cosine"] for r in by_rk]
        assert cosines == sorted(cosines, reverse=True), (qid, cosines)


def test_hard_negatives_are_the_true_wrong_label_topk(spark, sf_dir):
    """Cross-check one anchor against a brute-force numpy computation."""
    import numpy as np

    emb = {
        r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    qv, ql = emb[0]
    scored = sorted(
        (
            (round(float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), 6), vid)
            for vid, (v, lbl) in emb.items()
            if lbl != ql
        ),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    got = sorted(
        (
            (r["cosine"], r["neighbor_id"])
            for r in _run(spark, sf_dir, "q_hard_negatives").collect()
            if r["query_id"] == 0
        ),
        key=lambda t: (-t[0], t[1]),
    )
    assert [vid for _, vid in got] == [vid for _, vid in scored], (got, scored)


def test_decayed_topk_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_decayed_topk").collect()
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert len(rows) == min(20, n_users)
    for r in rows:
        # each event contributes at most 1.0 (age 0) and at least 0
        assert 0 <= r["score_micro"] <= r["n_events"] * 1_000_000
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rank_fusion_contributions_and_membership(spark, sf_dir):
    """Every fused row's rrf_micro must equal the recomputed rank
    contributions, and rank 0 means absent-from-that-system (contributes 0)."""
    rows = _run(spark, sf_dir, "q_rank_fusion").collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        want = 0
        if r["bm25_rank"] > 0:
            want += 1_000_000 // (60 + r["bm25_rank"])
        if r["cos_rank"] > 0:
            want += 1_000_000 // (60 + r["cos_rank"])
        assert r["rrf_micro"] == want, r
        assert r["bm25_rank"] > 0 or r["cos_rank"] > 0  # in at least one list
        assert 0 <= r["bm25_rank"] <= 20 and 0 <= r["cos_rank"] <= 20
    scores = [r["rrf_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_ann_recall_bounds_and_quality(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_ann_recall").collect()
    assert len(rows) == 8  # one row per anchor
    for r in rows:
        assert 0 <= r["n_hits"] <= r["k"] == 5
        assert r["recall_ppm"] == r["n_hits"] * 1_000_000 // 5
    # the audit's job is to report the TRUE recall, whatever it is; at the
    # 50-vector test corpus the 6-plane multi-probe shortlist still has to
    # find SOME exact neighbors or the kernel wiring is broken
    mean_recall = sum(r["recall_ppm"] for r in rows) / len(rows)
    assert mean_recall >= 100_000, mean_recall  # >= 0.1 mean recall@5
