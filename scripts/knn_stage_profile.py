"""q_knn_graph stage breakdown at sf0.1 vs sf1 (r10 verdict ask #6).

knn_graph is the probe's highest sf1 ratio (7.88x for 10x data after the
band_bits="auto" fix). This profiles WHERE that wall goes, by timing
cumulative plan prefixes (min-of-2, noop sink, same discipline as the
probe) and differencing:

  1. band    — SRP banding + band equi-join candidate generation
  2. score   — Arrow/numpy cosine scoring of every candidate pair
  3. topk    — symmetrize + per-source window top-k

plus the candidate-pair count at each scale (the quantity band_bits="auto"
exists to control: pairs ~ n_bands * n^2 / 2^band_bits per bucket).

Run ALONE (same discipline as bench.py). Writes KNN_STAGES.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from syscol_spark.session import get_session  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.path.join(REPO, ".localdata", "sf1")


def _release_cached(spark) -> None:
    """Drop the eager localCheckpoint blocks each _srp_candidate_pairs
    build leaves behind. Without this, ~14 materializations pile up in the
    8g heap and the session ends in a GC death spiral (measured: a 22 s
    sf1 build became a >12-minute straggler at 7.8 GB RSS)."""
    import gc

    gc.collect()
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()
    except Exception:  # noqa: BLE001 - cleanup is best-effort
        pass


def _stages(spark, sf_dir: str, reps: int = 2) -> dict:
    from pyspark.sql import Window

    from syscol_spark.operators.similarity import _score_pairs_for, _srp_candidate_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    n = emb.count()
    band_bits = max(4, math.ceil(math.log2(max(1, n) / 125)))  # knn_graph's auto rule

    def build_cand():
        # mirror knn_graph exactly, INCLUDING the bucket-size cap (without
        # it this profiles a plan the operator no longer runs: at sf10 the
        # uncapped build generates 1.29B distinct pairs vs 99M capped)
        from syscol_spark.operators.similarity import KNN_BUCKET_CAP, KNN_CAP_WINDOW

        tagged = emb.withColumn("__blk", F.lit(1))
        return _srp_candidate_pairs(
            tagged, vec_col="embedding", id_col="vec_id", block_col="__blk",
            dim=64, n_bands=8, band_bits=band_bits, seed=42,
            bucket_cap=KNN_BUCKET_CAP, cap_window=KNN_CAP_WINDOW,
        )

    sides = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))

    def build_pairs():
        return _score_pairs_for(build_cand(), sides, n_sides=n)

    def build_full():
        # mirror knn_graph EXACTLY, including the post-scoring repartition:
        # it both dedups the Python scoring stage across the two union
        # branches (ReusedExchange) and keeps WindowGroupLimit's local sort
        # out of the Python-runner tasks (the sf10 stall/crash fix)
        pairs = build_pairs().repartition("id_a", "id_b")
        sym = pairs.selectExpr("id_a AS src", "id_b AS nbr", "cosine").unionByName(
            pairs.selectExpr("id_b AS src", "id_a AS nbr", "cosine")
        )
        w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("nbr"))
        return sym.select(
            "*", F.row_number().over(w).cast("long").alias("rk")
        ).filter(F.col("rk") <= 3)

    def timed(build) -> float:
        ts = []
        for _ in range(reps):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
            _release_cached(spark)
        return round(min(ts), 3)

    t_cand = timed(build_cand)
    t_score = timed(build_pairs)
    t_full = timed(build_full)
    n_cand = build_cand().count()
    _release_cached(spark)
    return {
        "n_vectors": n,
        "band_bits_auto": band_bits,
        "n_candidate_pairs": n_cand,
        "cum_band_sec": t_cand,
        "cum_score_sec": t_score,
        "cum_full_sec": t_full,
        "stage_band_sec": t_cand,
        "stage_score_sec": round(max(0.0, t_score - t_cand), 3),
        "stage_topk_sec": round(max(0.0, t_full - t_score), 3),
    }


_SCALE_DIRS = {
    "sf0.1": BASE,
    "sf1": SF1_DIR,
    "sf10": os.path.join(REPO, ".localdata", "sf10"),
}


def main() -> None:
    # SPARK_GRAFT_KNN_SCALES picks which scales to (re)measure; results
    # MERGE into the existing KNN_STAGES.json so the r11 sf0.1/sf1 columns
    # survive an sf10-only run (the r11 verdict ask: "KNN_STAGES.json gains
    # an sf10 column"). Ratios are recomputed between adjacent measured
    # scales. SPARK_GRAFT_KNN_REPS=1 keeps a multi-minute sf10 build to one
    # rep per stage.
    scales = [
        sc.strip()
        for sc in os.environ.get("SPARK_GRAFT_KNN_SCALES", "sf0.1,sf1").split(",")
        if sc.strip()
    ]
    bad = [sc for sc in scales if sc not in _SCALE_DIRS]
    if bad:
        raise SystemExit(
            f"unknown scale(s) {bad} in SPARK_GRAFT_KNN_SCALES; "
            f"valid: {sorted(_SCALE_DIRS)}"
        )
    reps = int(os.environ.get("SPARK_GRAFT_KNN_REPS", "2"))
    spark = get_session("knn_stages")
    # warm both lanes with a tiny full build so first-touch latency doesn't
    # land on the first timed stage
    from syscol_spark.operators.similarity import knn_graph

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet").limit(500)
    knn_graph(emb, k=3, dim=64).write.format("noop").mode("overwrite").save()

    path = os.path.join(REPO, "KNN_STAGES.json")
    out = {"metric": "knn_graph_stage_breakdown"}
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
        out.update({k: v for k, v in prev.items() if k in _SCALE_DIRS})
    for sc in scales:
        row = _stages(spark, _SCALE_DIRS[sc], reps=reps)
        row["reps"] = reps
        out[sc] = row
    order = [sc for sc in ("sf0.1", "sf1", "sf10") if sc in out]
    for lo, hi in zip(order, order[1:]):
        for s in ("stage_band_sec", "stage_score_sec", "stage_topk_sec"):
            b, h = out[lo][s], out[hi][s]
            out[f"ratio_{s.removesuffix('_sec')}_{hi}_vs_{lo}"] = (
                round(h / b, 2) if b > 0 else -1
            )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
