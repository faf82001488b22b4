"""Cross-engine fuzz for the md5 bucket kernel (operators/sampling.py):
every sampling, mixture, split, sketch, bloom, and negative-sampling query
rests on hash_bucket (Spark) == hash_bucket_sql (DuckDB) == a plain Python
replay, for ANY key/seed/width. The parity suite proves agreement for the
seeds in registered queries; this pins the kernel over a randomized grid so
a new query can pick any seed safely.
"""

from __future__ import annotations

import hashlib
import random

import duckdb
import pyspark.sql.functions as F

from syscol_spark.operators.sampling import hash_bucket, hash_bucket_sql


def _py_bucket(key: str, seed: int, buckets: int) -> int:
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16) % buckets


def test_hash_bucket_three_engine_agreement(spark):
    rng = random.Random(20260815)
    cases = []
    for _ in range(200):
        key = rng.choice(
            [
                str(rng.randint(-(2**40), 2**40)),
                "".join(rng.choices("abcXYZ 0189_|:", k=rng.randint(0, 12))),
            ]
        )
        seed = rng.randint(0, 10_000)
        buckets = rng.choice([2, 64, 256, 8192, 1_000_000])
        cases.append((key, seed, buckets))

    df = spark.createDataFrame(
        [(i, k) for i, (k, _, _) in enumerate(cases)], "i int, key string"
    )
    spark_cols = [
        hash_bucket(F.col("key"), seed, buckets).alias(f"b{i}")
        if i == j
        else None
        for j, (_, seed, buckets) in enumerate(cases)
        for i in [j]
    ]
    # one row per case, one bucket column each — evaluate all in one job
    out = df.select("i", "key", *[c for c in spark_cols if c is not None]).collect()
    by_i = {r["i"]: r for r in out}

    con = duckdb.connect()
    for i, (key, seed, buckets) in enumerate(cases):
        want = _py_bucket(key, seed, buckets)
        got_spark = by_i[i][f"b{i}"]
        expr = hash_bucket_sql("?", seed, buckets).replace("CAST(? AS VARCHAR)", "?")
        got_duck = con.execute(f"SELECT {expr}", [key]).fetchone()[0]
        assert got_spark == want == got_duck, (key, seed, buckets)
