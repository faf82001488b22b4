"""sf1 scale probe: generate a 10x sf0.1 dataset locally, run the heaviest
catalog queries at both scales, and record the growth curve.

All correctness evidence tops out at sf0.1 (~600k-row lineitem); the plans
are ARGUED scale-safe (index-driven equi-joins, bounded broadcasts). This
probe converts that argument into measurement for exactly the queries where
it matters: wall(sf1)/wall(sf0.1) should be <= ~12x for a 10x data step
(linear growth + a log factor of headroom); a quadratic candidate generator
would show ~100x.

sf1 is derived from sf0.1 by deterministic 10x inflation with disjoint key
spaces (seed-free — every transform is a pure expression of the base data):

- every key column gets `+ copy * STRIDE` (STRIDE far above any base key),
  applied CONSISTENTLY across tables, so join fan-outs per key are exactly
  the base dataset's and the join graph stays referentially intact;
- document text gets the scale_probe token-bijection salt (every token
  suffixed per-copy), so shingle/similarity structure per copy is isomorphic
  to the base corpus while cross-copy overlap is zero — near-dup density per
  doc stays constant as volume grows, like a real corpus (n_chars is
  recomputed from the salted text);
- embeddings get the scale_probe per-copy Rademacher ±1 diagonal (copy 0
  is the identity): an ORTHOGONAL transform, so intra-copy cosine
  structure is exactly preserved while cross-copy cosines are
  sign-scrambled sums near zero. (A first attempt used small additive
  jitter instead; that left every vector with K-1 near-identical twins,
  densified every LSH/SRP bucket ~Kx and grew pair outputs ~K^2 — the
  probe then measured the distorted fixture, not the operator. A
  10-minute single-task straggler in knn_graph flagged it.);
- dimension tables that are constant across TPC-H scale factors
  (region, nation) are copied unchanged.

Usage:
    python scripts/scale_sf1.py            # generate (if missing) + probe
    python scripts/scale_sf1.py --gen-only
    python scripts/scale_sf1.py --probe-only

Writes SCALE_SF1.json at the repo root. Run ALONE (same discipline as
bench.py): concurrent Spark JVMs inflate wall times 4-8x.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401 - module-level so pandas_udf hints resolve
import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from syscol_spark.plans.catalog import QUERIES, _ensure_loaded  # noqa: E402
from syscol_spark.session import get_session  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.path.join(REPO, ".localdata", "sf1")
K = 10  # inflation factor
STRIDE = 100_000_000  # > any base key; keeps per-copy key spaces disjoint

HEAVY = [
    "q_ann_ivfadc_rr_bulk",
    "q_ann_ivfadc_bulk",
    "q_ann_ivfpq_rr",
    "q_pagerank",
    "q_kmeans_lloyd",
    "q_knn_graph",
    "q_mmr_diverse",
    "q_fuzzy_edit",
    "q_bfs_khop",
    "q_simhash",
    "q_dedup_clusters",
    "q_minhash_lsh",
    # round-10 operator: hot-key derivation + dim replication must stay
    # flat-per-row as the fact table grows
    "q_skew_salted_join",
]


def _select_queries() -> list[str]:
    """Round-11 extended coverage (r10 verdict ask #1): the r10 HEAVY list
    + the top SCALE_TOP_N (default 50) catalog queries by their committed
    bench wall + every tier's (plan module's) heaviest 3 — so the
    events/quality/mining/pipeline mid-tier, which had never executed above
    sf0.1, gets probed too. The r10 probe earned this: it caught knn_graph's
    band saturation that every plan audit had graded scale-safe."""
    walls: dict[str, float] = {}
    try:
        with open(os.path.join(REPO, "BENCH_FULL.json")) as fh:
            walls = {k: float(v) for k, v in json.load(fh).get("queries", {}).items()}
    except Exception as exc:  # noqa: BLE001 - selection degrades to HEAVY
        print(f"# _select_queries: no bench walls ({exc})", file=sys.stderr)
    _ensure_loaded()
    top_n = int(os.environ.get("SCALE_TOP_N", "50"))
    picked = {n for n in HEAVY if n in QUERIES}
    picked.update(sorted((n for n in walls if n in QUERIES), key=lambda n: -walls[n])[:top_n])
    by_tier: dict[str, list[str]] = {}
    for name, spec in QUERIES.items():
        by_tier.setdefault(spec.builder.__module__.rsplit(".", 1)[-1], []).append(name)
    for names in by_tier.values():
        names.sort(key=lambda n: -walls.get(n, 0.0))
        picked.update(names[:3])
    # SCALE_ONLY: re-probe just these queries (comma-separated) — the
    # targeted-remeasure path for queries whose first pass hit one of this
    # box's externally noisy windows
    only = [q.strip() for q in os.environ.get("SCALE_ONLY", "").split(",") if q.strip()]
    if only:
        picked = {n for n in only if n in QUERIES}
    # heaviest-first: if the budget trips, the queries most likely to hide
    # a scale defect were measured first
    return sorted(picked, key=lambda n: -walls.get(n, 0.0))


def _bench_walls() -> dict[str, float]:
    try:
        with open(os.path.join(REPO, "BENCH_FULL.json")) as fh:
            return {k: float(v) for k, v in json.load(fh).get("queries", {}).items()}
    except Exception:  # noqa: BLE001
        return {}

# key columns to offset per copy, per table (consistent across tables)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
UNCHANGED = ["region", "nation"]


def _inflated(spark, table: str):
    df = spark.read.parquet(f"{BASE}/{table}.parquet")
    out = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("__copy"), "*"
    )
    for key in KEYS[table]:
        ktype = dict(df.dtypes)[key]
        out = out.withColumn(
            key, (F.col(key) + F.col("__copy").cast("long") * F.lit(STRIDE)).cast(ktype)
        )
    if table == "documents":
        out = out.withColumn(
            "text",
            F.regexp_replace(
                F.col("text"),
                r"(\S+)",
                F.concat(F.lit("$1x"), F.col("__copy").cast("string")),
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        from syscol_spark.operators.similarity import rademacher_signs

        dim = len(
            spark.read.parquet(f"{BASE}/{table}.parquet").limit(1).collect()[0]["embedding"]
        )
        signs_by_copy = F.array(
            *[
                F.array(
                    *[
                        F.lit(s)
                        for s in (
                            [1.0] * dim if c == 0 else rademacher_signs(dim, c, seed=777)
                        )
                    ]
                )
                for c in range(K)
            ]
        )
        out = out.withColumn(
            "embedding",
            F.zip_with(
                F.col("embedding"),
                F.element_at(signs_by_copy, F.col("__copy") + 1),
                lambda x, s: (x.cast("double") * s).cast("float"),
            ),
        )
    return out.drop("__copy")


def generate(spark) -> None:
    os.makedirs(SF1_DIR, exist_ok=True)
    for table in UNCHANGED:
        spark.read.parquet(f"{BASE}/{table}.parquet").write.mode("overwrite").parquet(
            f"{SF1_DIR}/{table}.parquet"
        )
        print(f"# {table}: copied", file=sys.stderr)
    for table in KEYS:
        t0 = time.time()
        _inflated(spark, table).repartition(8).write.mode("overwrite").parquet(
            f"{SF1_DIR}/{table}.parquet"
        )
        n = spark.read.parquet(f"{SF1_DIR}/{table}.parquet").count()
        print(f"# {table}: {n} rows in {time.time() - t0:.1f}s", file=sys.stderr)


def _time_query(spark, name: str, sf_dir: str, reps: int) -> list[float]:
    ts = []
    for _ in range(reps):
        t0 = time.time()
        QUERIES[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(round(time.time() - t0, 3))
        _release_cached(spark)
    return ts


def _release_cached(spark) -> None:
    import gc

    gc.collect()
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()
    except Exception:  # noqa: BLE001
        pass


def _warmup(spark) -> None:
    """bench.py's three-lane session warmup, condensed: scan/agg/window/join
    codegen plus BOTH Python-worker lanes (ArrowEvalPython and mapInPandas).
    Without this the FIRST timed query absorbs ~10-20 s of session
    first-touch — the initial probe run measured q_ann_ivfadc_rr_bulk at
    19.1 s base (vs its 5.6 s bench number) purely from cold-start."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    try:
        li = spark.read.parquet(f"{BASE}/lineitem.parquet").limit(10_000)
        (
            li.groupBy("l_returnflag")
            .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("s"))
            .join(li.groupBy("l_returnflag").count(), "l_returnflag")
            .select("*", F.row_number().over(Window.partitionBy("l_returnflag").orderBy("s")).alias("r"))
            .write.format("noop").mode("overwrite").save()
        )

        @pandas_udf("long")
        def _plen(s: pd.Series) -> pd.Series:
            return s.str.len()

        docs = spark.read.parquet(f"{BASE}/documents.parquet").limit(2_000)
        (
            docs.select(F.explode(F.split("text", r"\s+")).alias("t"), _plen("text").alias("n"))
            .groupBy("t").agg(F.sum("n").alias("s"))
            .write.format("noop").mode("overwrite").save()
        )

        def _ident(it):
            yield from it

        docs.limit(200).select("doc_id").mapInPandas(_ident, schema="doc_id long").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception as exc:  # noqa: BLE001 - warmup must never kill the probe
        print(f"# warmup: ERROR {type(exc).__name__}: {exc}", file=sys.stderr)


def probe(spark) -> None:
    _ensure_loaded()
    _warmup(spark)
    reps_base = int(os.environ.get("SCALE_REPS_BASE", "2"))
    reps_sf1 = int(os.environ.get("SCALE_REPS_SF1", "2"))
    budget = float(os.environ.get("SCALE_BUDGET_SEC", "4200"))
    # soft per-query cap: a discovered scale-killer (the thing this probe
    # hunts) must cost ONE long rep, not reps_sf1 of them
    cap = float(os.environ.get("SCALE_PER_QUERY_CAP_SEC", "120"))
    selected = _select_queries()
    print(f"# probing {len(selected)} queries (budget {budget:.0f}s)", file=sys.stderr)
    t_start = time.time()
    results: dict[str, dict] = {}
    skipped: list[str] = []
    for name in selected:
        if time.time() - t_start > budget:
            skipped.append(name)
            continue
        try:
            base_ts = _time_query(spark, name, BASE, reps_base)
            # adaptive re-rep: a base min far above the committed clean
            # bench wall means THIS window (or early-session JIT ramp) is
            # contaminating the measurement — take up to 2 extra reps
            # before accepting it, and flag the query if it never recovers
            wall = _bench_walls().get(name)
            extra = 0
            while wall and min(base_ts) > 1.8 * wall and extra < 2:
                base_ts += _time_query(spark, name, BASE, 1)
                extra += 1
            suspect = bool(wall and min(base_ts) > 1.8 * wall)
            sf1_ts = _time_query(spark, name, SF1_DIR, 1)
            if sf1_ts[0] <= cap and reps_sf1 > 1:
                sf1_ts += _time_query(spark, name, SF1_DIR, reps_sf1 - 1)
        except Exception as exc:  # noqa: BLE001 - keep probing the rest
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"# {name}: ERROR {results[name]['error']}", file=sys.stderr)
            continue
        b, s = min(base_ts), min(sf1_ts)
        results[name] = {
            "sf0.1_sec": b,
            "sf1_sec": s,
            "ratio": round(s / b, 2),
            "sf0.1_reps": base_ts,
            "sf1_reps": sf1_ts,
        }
        if suspect:
            results[name]["suspect_window"] = True
        print(f"# {name}: {b:.2f}s -> {s:.2f}s ({s / b:.1f}x)", file=sys.stderr)
    if skipped:
        print(f"# budget tripped: {len(skipped)} queries skipped", file=sys.stderr)
    # SCALE_MERGE=1: fold a targeted remeasurement into the existing
    # artifact (provenance kept: remeasured flag + the replaced numbers)
    if os.environ.get("SCALE_MERGE") == "1":
        try:
            with open(os.path.join(REPO, "SCALE_SF1.json")) as fh:
                prior = json.load(fh)
            merged = dict(prior.get("queries", {}))
            for name, v in results.items():
                old = merged.get(name)
                v = dict(v)
                v["remeasured"] = True
                if old and "ratio" in old:
                    v["first_pass"] = {k: old[k] for k in ("sf0.1_sec", "sf1_sec", "ratio")}
                merged[name] = v
            results = merged
            skipped = prior.get("skipped_over_budget", skipped)
        except Exception as exc:  # noqa: BLE001 - fall back to fresh artifact
            print(f"# merge failed, writing fresh: {exc}", file=sys.stderr)
    ratios = sorted(
        ((v["ratio"], n) for n, v in results.items() if "ratio" in v), reverse=True
    )
    out = {
        "metric": "sf1_over_sf01_wall_ratio",
        "data_factor": K,
        "base_dir": BASE,
        "sf1_dir": SF1_DIR,
        "queries": results,
        "n_probed": len(results),
        "max_ratio": ratios[0][0] if ratios else -1,
        "worst_5": [{"query": n, "ratio": r} for r, n in ratios[:5]],
        "n_errors": sum(1 for v in results.values() if "error" in v),
        "budget_sec": budget,
        "skipped_over_budget": skipped,
        "reps": {"base": reps_base, "sf1": reps_sf1, "per_query_cap_sec": cap},
    }
    with open(os.path.join(REPO, "SCALE_SF1.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in ("metric", "n_probed", "max_ratio", "n_errors")}))


def main() -> None:
    spark = get_session("scale_sf1")
    args = sys.argv[1:]
    have = os.path.isdir(f"{SF1_DIR}/lineitem.parquet")
    if "--probe-only" not in args and (not have or "--gen-only" in args):
        generate(spark)
    if "--gen-only" not in args:
        probe(spark)


if __name__ == "__main__":
    main()
