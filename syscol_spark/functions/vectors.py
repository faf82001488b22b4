"""Vector column expressions for embedding similarity (north-star).

All math is done in DOUBLE with sequential left-to-right accumulation
(F.aggregate), which matches DuckDB's list_* kernels bit-for-bit closely
enough that results agree after rounding. JVM-side codegen — no Python.

At 100 TB scale: these expressions vectorize inside whole-stage codegen; for
very wide vectors a pandas_udf + numpy dot is the alternative (BLAS), kept in
operators/similarity.py for the brute-force path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
