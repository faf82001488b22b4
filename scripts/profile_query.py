"""Per-query optimization profiler (round 14).

For each named catalog query: capture .explain("formatted") to
plans/r15/<name>_<tag>.txt, then time N noop-sink reps, counting Spark
jobs/stages per rep via the status tracker. The plan-shape summary
(Exchange count, join strategies, Python-eval nodes, PushedFilters) and
per-rep {wall, jobs, stages} go to stdout as JSON.

Usage: python scripts/profile_query.py [--tag before|after] [--reps 3]
           [--sf DIR] query [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from syscol_spark.plans.catalog import QUERIES, _ensure_loaded  # noqa: E402
from syscol_spark.session import get_session  # noqa: E402


def plan_summary(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "exchange_kinds": sorted(set(re.findall(r"Exchange (\w+)", plan))),
        "joins": sorted(
            set(re.findall(r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                           r"BroadcastNestedLoopJoin|CartesianProduct)\b", plan))),
        "python_nodes": sorted(
            set(re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                           r"MapInArrow|FlatMapGroupsInPandas)\b", plan))),
        "wscg_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "aqe": "AdaptiveSparkPlan" in plan,
        "scans": len(re.findall(r"Scan parquet", plan)),
        "has_pushed_filters": "PushedFilters: [" in plan
                              and bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "n_ops": len(re.findall(r"^\s*[*+]?[-+ ]*\(\d+\)", plan, re.M)),
    }


def main() -> None:
    argv = sys.argv[1:]
    tag = "before"
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--tag":
            tag = argv[i + 1]; i += 2
        elif a == "--reps":
            reps = int(argv[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = argv[i + 1]; i += 2
        else:
            names.append(a); i += 1
    _ensure_loaded()
    if not names:
        names = list(QUERIES)
    spark = get_session("profile_r14")
    sc = spark.sparkContext

    def n_jobs() -> int:
        # dagScheduler.nextJobId is an AtomicInteger = total jobs submitted
        # (py4j auto-unboxes .get() on some versions; handle both)
        v = sc._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else v.get()

    os.makedirs("/root/repo/plans/r15", exist_ok=True)

    # one warmup touching the shared machinery (mirrors bench.py)
    import pyspark.sql.functions as F
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10_000)
    li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")) \
      .write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        spec = QUERIES[name]
        sc.setJobDescription(f"r14-profile:{name}")
        # --- build phase (may itself run jobs: kmeans collects, probes) ---
        jobs0 = n_jobs()
        t0 = time.time()
        df = spec.builder(spark, sf_dir)
        t_build = time.time() - t0
        build_jobs = n_jobs() - jobs0
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(f"/root/repo/plans/r15/{name}_{tag}.txt", "w") as fh:
            fh.write(plan)
        rep_rows = []
        for _ in range(reps):
            j0 = n_jobs()
            t0 = time.time()
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            rep_rows.append({"wall": round(wall, 3), "jobs": n_jobs() - j0})
            _release(spark)
        out[name] = {
            "build_sec": round(t_build, 3),
            "build_jobs": build_jobs,
            "reps": rep_rows,
            "min_wall": min(r["wall"] for r in rep_rows),
            "jobs_per_rep": rep_rows[-1]["jobs"],
            "plan": plan_summary(plan),
        }
        print(f"# {name}: min {out[name]['min_wall']:.2f}s, "
              f"{out[name]['jobs_per_rep']} jobs/rep, "
              f"plan={out[name]['plan']}", file=sys.stderr)
    print(json.dumps(out, indent=1))


def _release(spark) -> None:
    import gc
    gc.collect()
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()
    except Exception:  # noqa: BLE001
        pass


if __name__ == "__main__":
    main()
