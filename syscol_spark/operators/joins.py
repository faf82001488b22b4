"""Join operators Spark lacks natively: as-of join and banded range join.

Both are implemented as compositions of built-in shuffle operators (union +
window, bucketed equi-join) — NOT nested-loop / theta joins — so they scale
linearly with data size on a cluster:

- ``asof_join``: the classic union-and-carry-forward trick. One shuffle on
  the key, one sort within partitions (Spark window), no pairwise matching.
  O(n log n) per key group vs O(n·m) for a naive time-predicate join.
- ``range_join_count``: time-bucketing turns an inequality join into an
  equi-join on (key, bucket); each left row probes at most 2 buckets, so
  Catalyst plans a plain shuffled hash join instead of BroadcastNestedLoop.

Reference parity: the syscol pipeline has no joins at all (SURVEY.md §2.10);
these implement the §2.11 "as-of/range joins for metric correlation" surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import broadcast


def _floordiv_long(c: Column, divisor: int) -> Column:
    """Exact floor division of a long column by a positive int literal.

    Pure 64-bit integer arithmetic — no double rounding at any timestamp
    magnitude (epoch-µs or epoch-ns). pmod is always in [0, divisor), so the
    adjusted dividend is an exact multiple and long division equals floor
    (including for negative dividends, where cast-style truncation would
    round toward zero instead).
    """
    if divisor <= 0:
        raise ValueError("divisor must be positive")
    c = c.cast("long")
    adjusted = c - F.pmod(c, F.lit(divisor))
    # adjusted is an exact multiple of divisor; dividing in DECIMAL(38,0)
    # (not double!) keeps the quotient exact even past 2^53 (epoch-ns).
    return (adjusted.cast("decimal(38,0)") / F.lit(divisor)).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts_us",
    right_time: str = "ts_us",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.time <= left.time`` and the same ``on`` key.

    Ties: a right row at exactly the left row's time matches; among equal
    right times the one with the greatest tiebreak column order wins
    (rows are sorted by (time, kind, *right_cols)) — deterministic.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__kind"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(right_time).alias(f"{right_time}{suffix}"),
    )
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{right_time}{suffix}"]
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__kind"),
        *[F.lit(None).cast(tagged_r.schema[c].dataType).alias(c) for c in carried],
        *[F.col(c) for c in left.columns],
    )
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__kind", f"{right_time}{suffix}")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"__f_{c}") for c in carried],
    )
    return filled.filter(F.col("__kind") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__f_{c}").alias(c) for c in carried],
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower_us: int,
    upper_us: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Count, for each left row, right rows with the same key whose time lies
    in ``[left.time + lower_us, left.time + upper_us)``.

    Implementation: right rows are replicated into the (at most 2) coarse
    time buckets a matching left row can fall in, then equi-joined on
    (key, bucket) and filtered by the exact predicate. All shuffle-based;
    no nested-loop join at any scale.
    """
    span = upper_us - lower_us
    if span <= 0:
        raise ValueError("upper_us must be > lower_us")
    # Bucket ids MUST use exact integer floor division: double division +
    # cast('long') can flip a boundary timestamp (epoch-µs ≈ 1.7e15, within
    # a few ulps of an integer quotient) into the adjacent bucket — the two
    # sides then disagree and the pair is silently dropped. Subtracting
    # pmod first makes the dividend an exact multiple, so `div` (integer
    # division on longs) IS floor division, for negative times too.
    lbucket = _floordiv_long(F.col(left_time) + F.lit(lower_us), span)
    # Unique row id: grouping on the left columns alone would collapse
    # duplicate left rows into one output row with a summed count.
    l2 = left.withColumn("__rid", F.monotonically_increasing_id()).select(
        F.col(on).alias("__k"), F.col(left_time).alias("__lt"), lbucket.alias("__b"), "*"
    )
    rbucket = _floordiv_long(F.col(right_time), span)
    r2 = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__rt"),
        F.explode(F.array(rbucket, rbucket - 1)).alias("__b"),
    )
    joined = l2.join(
        r2,
        (l2["__k"] == r2["__k"])
        & (l2["__b"] == r2["__b"])
        & (r2["__rt"] >= l2["__lt"] + F.lit(lower_us))
        & (r2["__rt"] < l2["__lt"] + F.lit(upper_us)),
        "left",
    )
    return (
        joined.groupBy(l2["__rid"], *[l2[c] for c in left.columns])
        .agg(F.count(r2["__rt"]).alias(count_alias))
        .drop("__rid")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    hot_keys: DataFrame | None = None,
    hot_top_k: int = 20,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the HOT keys ``n_salts`` ways on the
    fact side and replicate only the hot-key dim rows, so no single shuffle
    partition carries a whole hot key's rows.

    This is the operator a user reaches for after the key-skew profiler
    (q_skew_keys) flags a hot key: a plain ``fact.join(dim, on)`` hashes
    every row of the hottest key into ONE shuffle task, which at 100 TB is
    the straggler that defines job wall-clock. Here:

    - ``hot_keys`` (caller-supplied, or derived on-plan as the top
      ``hot_top_k`` fact keys by row count — a GlobalLimit-bounded
      broadcast, never data-proportional) marks the keys worth salting;
    - fact rows with a hot key get a DETERMINISTIC per-row salt in
      [0, n_salts) (xxhash64 over the whole row — no rand(), so retried
      tasks and re-runs place rows identically); cold keys keep salt 0.
      Limitation of determinism: byte-identical duplicate rows of a hot
      key all hash to the SAME salt, so skew made of exact duplicate rows
      gets no spread (it degrades to the plain join). If the fact side can
      contain mass duplicate rows, add a distinguishing column first
      (e.g. ``monotonically_increasing_id()``) — not done here because it
      would make retried tasks place rows differently;
    - dim rows with a hot key are exploded into all ``n_salts`` salts
      (replication cost: |hot| x n_salts rows, NOT |dim| x n_salts); cold
      dim rows carry salt 0 only;
    - the join runs on (key, salt), spreading each hot key over
      ``n_salts`` shuffle partitions; dropping ``__salt`` afterwards
      restores exactly the plain-join result (each fact row matches the
      one dim replica sharing its salt).

    Result is row-identical to ``fact.join(dim, on, how)`` by construction
    for ``inner`` and ``left`` (fact-preserving) joins. Dim-preserving
    joins would emit unmatched hot dim rows once per salt, so they are
    rejected.

    Complements (does not replace) AQE skew-split: AQE can only split a
    skewed partition AFTER shuffling it and only for sort-merge joins;
    salting spreads rows at map time and also covers the grouped-
    aggregation-after-join case where AQE's split cannot apply.

    Reference scope: syscol has no joins (SURVEY.md §2.10); this is
    north-star surface (BASELINE.json: design every operator for 100 TB).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left (fact-preserving) joins, got {how!r}")
    if n_salts < 2:
        raise ValueError("n_salts must be >= 2")
    for reserved in ("__salt", "__hot"):
        if reserved in fact.columns or reserved in dim.columns:
            raise ValueError(f"column name {reserved} is reserved by salted_join")
    if hot_keys is None:
        hot_keys = (
            fact.groupBy(on)
            .agg(F.count(F.lit(1)).alias("__c"))
            .orderBy(F.desc("__c"), on)
            .limit(hot_top_k)
            .select(on)
        )
    # distinct() guards the caller-supplied path: duplicate key rows in
    # hot_keys would multiply fact rows via the left join below (and dim
    # replicas via explode), silently breaking row-identity with the plain
    # join. The derived path above is already distinct (groupBy).
    hot = broadcast(hot_keys.select(on).distinct().select(F.col(on), F.lit(True).alias("__hot")))
    salted_fact = (
        fact.join(hot, on, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot").isNotNull(),
                F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    salted_dim = (
        dim.join(hot, on, "left")
        .withColumn(
            "__salt",
            F.explode(
                F.when(
                    F.col("__hot").isNotNull(),
                    F.sequence(F.lit(0), F.lit(n_salts - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("__hot")
    )
    return salted_fact.join(salted_dim, [on, "__salt"], how).drop("__salt")
