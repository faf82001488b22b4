"""Partitioner parity (SURVEY.md §2.4).

The reference's producer partitions records by FNV-1a(key) mod #partitions
(siesta-producer/partitioner.go:15-44), falls back to random placement for
nil keys (:46-58 — the path syscol actually takes, metrics_reporter.go:96),
and honors an explicit partition if set (:60-73).

Here the same contracts map to: an FNV-1a column expression (for byte-exact
placement parity when repartitioning by key), round-robin repartition for
the keyless case, and `repartition(n, col)` for explicit placement. FNV-1a
is pure 64-bit arithmetic; ANSI overflow is avoided by doing the multiply in
two 32-bit halves (wraparound semantics preserved).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

FNV_OFFSET_32 = 2166136261
FNV_PRIME_32 = 16777619
_M32 = 4294967296  # 2^32


def fnv1a_32_py(data: bytes) -> int:
    """Reference implementation (plan-time / test oracle)."""
    h = FNV_OFFSET_32
    for b in data:
        h ^= b
        h = (h * FNV_PRIME_32) % _M32
    return h


def fnv1a_32(col: Column | str) -> Column:
    """32-bit FNV-1a over the UTF-8 bytes of a string column, as a Catalyst
    expression (one aggregate pass over the byte array, derived via hex).
    Matches canonical FNV-1a test vectors — see tests."""
    c = F.col(col) if isinstance(col, str) else col
    return _fnv_expr(c)


def _fnv_expr(c: Column) -> Column:
    # byte array of the utf-8 encoding as 0..255 ints: aes-free pure SQL —
    # encode → hex (2 chars per byte) → conv per byte. The hex string is
    # lambda-bound (transform over a 1-element array) so it is computed once
    # per row — referenced bare inside the per-byte transform lambda,
    # CollapseProject would re-inline (and re-evaluate) it per byte.
    def bts_of(hx: Column) -> Column:
        idx = F.sequence(F.lit(0), (F.length(hx) / F.lit(2)).cast("int") - F.lit(1))
        return F.transform(
            idx, lambda i: F.conv(F.substring(hx, (i * 2 + 1).cast("int"), 2), 16, 10).cast("long")
        )

    bts = F.element_at(F.transform(F.array(F.hex(F.encode(c, "UTF-8"))), bts_of), 1)
    m32 = F.lit(_M32).cast("long")
    prime = F.lit(FNV_PRIME_32).cast("long")
    hashed = F.aggregate(
        bts,
        F.lit(FNV_OFFSET_32).cast("long"),
        # xor then multiply mod 2^32; h < 2^32, prime < 2^25 → product < 2^57
        lambda acc, b: F.pmod(acc.bitwiseXOR(b) * prime, m32),
    )
    # empty string: sequence(0, -1) yields a descending range, not [] —
    # return the FNV offset basis directly
    return F.when(F.length(c) == 0, F.lit(FNV_OFFSET_32).cast("long")).otherwise(hashed)


def fnv1a_partition(col: Column | str, n_partitions: int) -> Column:
    """Partition id with the reference's contract: FNV-1a(key) mod n
    (absolute value, like the Go int31 truncation path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(_fnv_expr(c), F.lit(n_partitions).cast("long")).cast("int")


def partition_like_reference(df: DataFrame, key_col: str | None, n_partitions: int) -> DataFrame:
    """X1/X2 dispatch: hash-partition by key, or round-robin when keyless
    (the reference's random placement for nil keys)."""
    if key_col is None:
        return df.repartition(n_partitions)
    return df.repartition(n_partitions, fnv1a_partition(key_col, n_partitions))


def manual_partition(df: DataFrame, partition_col: str, n_partitions: int) -> DataFrame:
    """X3: honor an EXPLICIT per-record partition id — row lands in Spark
    partition ``value % n_partitions``, mirroring the reference's
    explicit-partition branch (siesta-producer/partitioner.go:60-73).

    The DataFrame API cannot express identity placement (``repartition(n,
    col)`` HASH-partitions, scrambling the requested id), so this narrow
    parity shim drops to the RDD partitioner — the engine's one legitimate
    RDD use, paid only when a caller demands manual placement. For Kafka
    output prefer ``with_explicit_partition``: the Kafka sink honors a
    ``partition`` column natively with no RDD round-trip."""
    schema = df.schema
    idx = schema.names.index(partition_col)
    rdd = (
        df.rdd.map(lambda r: (r[idx], r))
        .partitionBy(n_partitions, lambda k: int(k) % n_partitions)
        .values()
    )
    return df.sparkSession.createDataFrame(rdd, schema)


def with_explicit_partition(df: DataFrame, partition_col: str | Column) -> DataFrame:
    """Attach the explicit target partition as the ``partition`` int column
    the Spark Kafka sink honors — the zero-copy route for X3 semantics on
    the produce path."""
    c = F.col(partition_col) if isinstance(partition_col, str) else partition_col
    return df.withColumn("partition", c.cast("int"))
