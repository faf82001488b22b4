"""Measure knn_graph's recall@3 against exact brute-force ground truth.

The r12 SRP bucket-size cap (operators/similarity.py: oversized buckets
pair each member with only its KNN_CAP_WINDOW forward id-neighbors) is
bit-identical to the uncapped build at every parity scale through sf1
(largest bucket 1431 < 2048), but at sf10 it engages — and its recall
cost there was argued (near-dup mates are interchangeable), not measured.
This measures it: sample ~1k vectors deterministically, compute their
EXACT top-3 by distributed brute force (batch GEMM per Arrow batch, global
re-rank), and report what fraction of the graph's edges reach exact-top-3
quality at BOTH sf1 (cap inert — the algorithm's intrinsic SRP recall) and
sf10 (cap engaged). The sf10-vs-sf1 delta isolates the cap's cost from the
SRP approximation itself.

A graph edge counts as a hit when its cosine >= the query's 3rd-best exact
cosine - 1e-9 (threshold recall: tie-safe on near-dup corpora where many
mates share the top cosine). recall@3 = hits / (3 * n_sampled).

Run ALONE (bench discipline):
    python scripts/knn_recall.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from syscol_spark.operators.similarity import knn_graph  # noqa: E402
from syscol_spark.session import get_session  # noqa: E402

K = 3
EPS = 1e-9
TARGET_SAMPLE = 1000
# Floor for the capped build at sf10. SRP band candidates are an
# approximation even uncapped, so the floor is on absolute recall; the
# artifact also reports the sf1 (cap-inert) recall so the cap's own cost
# is the visible delta.
FLOOR = 0.50

SCALES = {
    "sf1": os.path.join(REPO, ".localdata", "sf1"),
    "sf10": os.path.join(REPO, ".localdata", "sf10"),
}


def _exact_top3(spark, emb, sample_pdf):
    """Exact top-K cosine neighbors of the sampled queries over the WHOLE
    corpus: one GEMM per Arrow batch emits the batch-local top-(K+1) per
    query (+1 survives self-exclusion), a window re-ranks globally."""
    qids = sample_pdf["vec_id"].to_numpy()
    qmat = np.stack(sample_pdf["embedding"].to_numpy()).astype("float64")
    qnorm = np.sqrt(np.einsum("ij,ij->i", qmat, qmat))

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            cos = (mat @ qmat.T) / (norms[:, None] * qnorm[None, :])
            kk = min(K + 1, cos.shape[0])
            idx = np.argpartition(-cos, kth=kk - 1, axis=0)[:kk]
            qcol = np.repeat(qids, kk)
            ncol = ids[idx.T.ravel()]
            ccol = np.take_along_axis(cos, idx, axis=0).T.ravel()
            yield pd.DataFrame({"qid": qcol, "nbr": ncol, "cosine": ccol})

    cand = emb.select("vec_id", "embedding").mapInPandas(
        part, "qid bigint, nbr bigint, cosine double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nbr"))
    return (
        cand.filter(F.col("qid") != F.col("nbr"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
    )


def _measure(spark, sf_dir: str) -> dict:
    t0 = time.time()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    stride = max(1, n // TARGET_SAMPLE)
    sample_pdf = (
        emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(stride)) == 0)
        .select("vec_id", "embedding")
        .toPandas()
    )
    qid_list = [int(x) for x in sample_pdf["vec_id"]]

    exact = _exact_top3(spark, emb, sample_pdf)
    third = (
        exact.groupBy("qid")
        .agg(F.min("cosine").alias("third_cos"), F.count("*").alias("n_exact"))
    )

    graph = knn_graph(emb, k=K, dim=64, n_bands=8, band_bits="auto")
    edges = graph.filter(F.col("src").isin(qid_list)).select(
        F.col("src").alias("qid"), "nbr", "cosine"
    )
    hits = (
        edges.join(F.broadcast(third), "qid")
        .filter(F.col("cosine") >= F.col("third_cos") - EPS)
        .count()
    )
    n_sampled = len(qid_list)
    return {
        "n_vectors": n,
        "n_sampled": n_sampled,
        "recall_at_3": round(hits / (K * n_sampled), 4),
        "hits": hits,
        "denominator": K * n_sampled,
        "wall_s": round(time.time() - t0, 1),
    }


def main() -> int:
    spark = get_session("knn_recall")
    out = {
        "metric": "knn_graph_recall_at_3",
        "k": K,
        "floor_sf10": FLOOR,
        "tie_rule": "hit iff edge cosine >= exact 3rd-best cosine - 1e-9",
        "note": (
            "sf1: bucket cap provably inert (largest bucket 1431 < 2048) — this"
            " row is the SRP band approximation's intrinsic recall. sf10: cap"
            " engaged (r11 uncapped build: 2.95B pairs, OOM) — the sf10-sf1"
            " delta is the cap's measured recall cost."
        ),
    }
    for name, sf_dir in SCALES.items():
        out[name] = _measure(spark, sf_dir)
        print(f"# {name}: {out[name]}", file=sys.stderr)
    out["pass"] = out["sf10"]["recall_at_3"] >= FLOOR
    with open(os.path.join(REPO, "KNN_RECALL.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k in ("sf1", "sf10", "pass")}))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
