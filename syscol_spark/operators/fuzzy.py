"""Edit-distance self-join with q-gram prefix filtering (Ed-Join shape).

Fuzzy matching — "find all string pairs within Levenshtein distance k" — is
the entity-resolution / near-dup primitive the n-gram-Jaccard family can't
express (Jaccard is order-insensitive; edit distance is not).

The naive form is an all-pairs comparison: O(N²) candidates, each costing an
O(len²) dynamic program — the exact shape this engine bans. The scale-safe
form here is q-gram prefix filtering (Gravano et al., VLDB'01; Xiao et al.
"Ed-Join", VLDB'08):

1. Each string yields its DISTINCT q-grams. One edit destroys at most q
   grams, so ed(a,b) <= k implies |G(a) ∩ G(b)| >= max(|G(a)|,|G(b)|) - k·q.
2. Under ANY global total order on grams, two sets with overlap >= 1 must
   share an element within their first (k·q + 1) grams — so each string
   only indexes its (k·q+1)-gram PREFIX, and candidates come from an
   equi-join on those prefix grams.
3. The global order used is (document frequency, gram): rarest grams first.
   Frequency ordering is what makes the candidate set small in practice —
   common grams never enter a prefix unless a string has nothing rarer.
   The frequency table is one aggregation over the exploded grams; its
   join back is left to AQE (it broadcasts when the vocabulary is small,
   shuffles when a 100 TB corpus makes it large — both linear).
4. Candidate generation carries only (id, length, position) — never the
   strings — so the pair-dedup shuffle is narrow. Survivors of the length
   filter (|len(a)-len(b)| <= k, implied by ed <= k) and the positional
   filter (first-match overlap upper bound, PPJoin-style) rejoin the
   string table by id (linear) and pay a BANDED Levenshtein (threshold
   argument: O(k·n) per pair, -1 past the band).

Exactness around the bound's edges:
- Strings whose distinct-gram count is <= k·q can satisfy ed <= k with
  ZERO shared grams — but only against strings that are also small (the
  bound uses max of the two set sizes). Every small-gram-set string
  therefore gets ONE ADDITIONAL sentinel row (not a replacement: its real
  grams must stay indexed so small-vs-large pairs still collide).
- The whole operator is oracle-proven: the DuckDB twin is the brute-force
  definition (all pairs + levenshtein), so a hash-match means the filter
  chain dropped nothing at test scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: sentinel bucket pairing the small-gram-set strings with each other
_SHORT = "\x00short"


def _distinct_qgrams(col: F.Column, q: int) -> F.Column:
    """Distinct character q-grams; strings shorter than q yield themselves."""
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - q + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: col.substr(i, F.lit(q)))
    return F.array_distinct(F.when(n >= q, grams).otherwise(F.array(col)))


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 6,
) -> DataFrame:
    """All (id_a, id_b, ed) pairs with Levenshtein distance <= max_dist.

    Exact (no missed pairs — see module docstring), but never all-pairs:
    candidates come from an equi-join on frequency-ordered q-gram prefixes.
    """
    kq = max_dist * q
    prefix_len = kq + 1
    strings = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__s"))
    s = strings.withColumn("__grams", _distinct_qgrams(F.col("__s"), q)).withColumn(
        "__len", F.length("__s")
    )
    # materialize the exploded grams ONCE: the posting list feeds both the
    # document-frequency aggregation and the rank join, and recomputing the
    # tokenize+explode pass for each reference (plus for the downstream
    # prefix scan) dominated the wall time (measured ~2.4x at sf0.1). At
    # lake scale this is the "write the gram index to a table first" step —
    # same pattern as ngram_jaccard_pairs' shingle materialization.
    ex = s.select("__id", "__len", F.explode("__grams").alias("gram")).localCheckpoint()

    # global gram order: rarest first, gram string as tie-break (total order)
    freq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    ranked = ex.join(freq, "gram")
    w = Window.partitionBy("__id").orderBy(F.col("df").asc(), F.col("gram").asc())
    base = (
        ranked.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("__id")))
        .filter(F.col("__rn") <= prefix_len)
        .select("__id", "__len", "gram", "__rn", "__n")
    )
    # sentinel rows for small gram sets (bound vacuous only small-vs-small);
    # __rn/__n pinned so the positional filter is vacuously true for them
    short = (
        base.filter(F.col("__n") <= kq)
        .select("__id", "__len")
        .distinct()
        .select(
            "__id",
            "__len",
            F.lit(_SHORT).alias("gram"),
            F.lit(1).alias("__rn"),
            F.lit(1).alias("__n"),
        )
    )
    # NOT checkpointed on purpose (measured A/B at sf0.1: 4.10 s plain vs
    # 4.94 s with a localCheckpoint here): the self-join below does read
    # this subtree twice, but the freq agg + rank windows are cheaper to
    # recompute than the eager materialization barrier. Same lesson as the
    # Ed-Join COUNT-window revert — measure before "deduplicating" subplans.
    prefix = base.unionByName(short)

    a = prefix.select(
        F.col("__id").alias("id_a"),
        F.col("__len").alias("len_a"),
        F.col("__rn").alias("rn_a"),
        F.col("__n").alias("n_a"),
        "gram",
    )
    b = prefix.select(
        F.col("__id").alias("id_b"),
        F.col("__len").alias("len_b"),
        F.col("__rn").alias("rn_b"),
        F.col("__n").alias("n_b"),
        "gram",
    )
    # positional (first-match) filter: a real pair's FIRST shared gram g at
    # ordered positions (pa, pb) bounds total overlap by 1 + min(n_a - pa,
    # n_b - pb); real pairs need overlap >= max(n_a, n_b) - k·q, so any pair
    # whose every collision violates the bound cannot be real.
    positional = (
        F.lit(1) + F.least(F.col("n_a") - F.col("rn_a"), F.col("n_b") - F.col("rn_b"))
        >= F.greatest("n_a", "n_b") - F.lit(kq)
    )
    cand = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= F.lit(max_dist))
        .filter(positional)
        .select("id_a", "id_b")
        .distinct()
    )

    # rejoin the strings by id (linear: AQE broadcasts a small string table,
    # shuffle-joins a large one) and pay the banded DP only on survivors;
    # explicit repartition so AQE's small-shuffle coalescing can't serialize
    # the CPU-bound verify onto a few cores
    par = df.sparkSession.sparkContext.defaultParallelism
    sa = strings.select(F.col("__id").alias("id_a"), F.col("__s").alias("s_a"))
    sb = strings.select(F.col("__id").alias("id_b"), F.col("__s").alias("s_b"))
    return (
        cand.repartition(max(par, 8), "id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("ed", F.levenshtein("s_a", "s_b", max_dist).cast("long"))
        .filter(F.col("ed") >= 0)
        .select("id_a", "id_b", "ed")
    )
