"""Cross-engine-stable aggregate helpers.

Why these exist: float sums are order-dependent, so Spark and DuckDB can
differ in the last ulp — and rounding does NOT absorb that at exact decimal
half-points (e.g. avg 1512.12/32 = 47.25375): Spark's ROUND rounds the
double's shortest decimal representation (BigDecimal.valueOf) while DuckDB
rounds the binary value, so the two engines round such values in OPPOSITE
directions. Observed in practice at sf0.1.

Fix: aggregate in DECIMAL(27,6) — exact, order-independent, bit-identical
across engines for any input with ≤6 decimal digits (all money/measure
columns here: price(2dp)·(1−disc)(2dp)=4dp, ·(1+tax)=6dp) — cast the exact
result to DOUBLE, and emit it UNROUNDED. Both engines convert the same exact
decimal to the same IEEE double (integer mantissas stay below 2^53 for sums
up to ~9×10^9 in value units), so no rounding step exists to disagree on.

SQL twin of ``dsum(x)``:  CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)
SQL twin of ``davg(x)``:  CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(x)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

DEC = "decimal(27,6)"


def dec6(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dsum(c: Column | str) -> Column:
    """Order-independent exact sum of a ≤6dp measure, as double."""
    return F.sum(dec6(c)).cast("double")


def davg(c: Column | str) -> Column:
    """Exact-sum average: identical doubles on any engine (no rounding)."""
    col = F.col(c) if isinstance(c, str) else c
    return dsum(col) / F.count(col)
