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
3. The prefix is further SHORTENED by Ed-Join's location-based rule
   (Xiao et al. VLDB'08 §4): scanning grams in the global order, stop as
   soon as the selected grams contain k+1 whose min positions are pairwise
   >= q apart — disjoint q-windows cannot share an edit, so a string
   missing all k+1 needs > k edits. On long strings this cuts the prefix
   from k·q+1 toward k+1 grams, shrinking candidate volume quadratically.
4. The global order used is (document frequency, gram): rarest grams first.
   Frequency ordering is what makes the candidate set small in practice —
   common grams never enter a prefix unless a string has nothing rarer.
   The frequency table is one aggregation over the exploded grams; its
   join back is left to AQE (it broadcasts when the vocabulary is small,
   shuffles when a 100 TB corpus makes it large — both linear).
5. Candidate generation carries only (id, length) — never the strings —
   so the pair-dedup shuffle is narrow. Survivors of the length filter
   (|len(a)-len(b)| <= k, implied by ed <= k) rejoin the string table by
   id (linear) and pay a BANDED Levenshtein (threshold argument: O(k·n)
   per pair, -1 past the band). The PPJoin-style first-match positional
   filter was REMOVED: it is only sound when the globally-first shared
   gram is guaranteed inside both prefixes — true under the count bound,
   false under location shortening (a real pair may collide only via a
   later shared gram, where the first-match bound legitimately fails).

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


def _distinct_qgrams_minpos(col: F.Column, q: int) -> F.Column:
    """Distinct character q-grams with each gram's MIN occurrence position,
    as (gram, pos) structs; strings shorter than q yield themselves at
    pos 1. All array-side (sort + adjacent-dedup filter) — no shuffle; the
    positions feed the location-based prefix shortening. The sorted array
    is lambda-bound (_bind_once) so it is built once per row, not once per
    filtered element."""
    from syscol_spark.functions.text import _bind_once

    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - q + 1, F.lit(1)))
    grams = F.transform(
        idx, lambda i: F.struct(col.substr(i, F.lit(q)).alias("gram"), i.alias("pos"))
    )
    occ = F.when(n >= q, grams).otherwise(
        F.array(F.struct(col.alias("gram"), F.lit(1).alias("pos")))
    )
    # array_sort on structs orders by (gram asc, pos asc): the first row of
    # each gram run carries that gram's min position
    return _bind_once(
        F.array_sort(occ),
        lambda srt: F.filter(
            srt,
            lambda x, i: (i == 0)
            | (x["gram"] != F.element_at(srt, i)["gram"]),  # prev = 1-based i
        ),
    )


def _location_cutoff_expr(gp_col: str, max_dist: int, q: int, cap: int) -> F.Column:
    """Per-string prefix cutoff (Ed-Join location-based prefix, Xiao et
    al. VLDB'08 §4) as a NATIVE fold over the collected (rn, pos) array —
    no Python/Arrow in the plan (r14, guide §4; the former pandas_udf cost
    a worker spin-up on the scoring stage and was the only Python node in
    the operator). Scanning the string's distinct grams in global
    (df, gram) order, the prefix may STOP as soon as it contains
    ``max_dist + 1`` grams whose min-positions are pairwise >= q apart —
    q-disjoint gram windows cannot share an edit, so a pair missing all of
    them needs > max_dist edits. Shrinks the prefix from kq+1 toward k+1
    grams; candidate volume drops quadratically in that ratio. Evaluates
    to the rank of the completing gram, or ``cap`` when the string never
    accumulates max_dist+1 disjoint windows (keep the full count-bound
    prefix). The fold replicates the Arrow kernel step-for-step: append
    the gram's min-pos, re-sort, greedy-count disjoint windows (start
    sentinel -1e9, condition p >= last + q), latch the first completing
    rn. Arrays are <= kq+1 (<= 25) elements, so the quadratic
    re-evaluation inside the lambda is bounded and cheap."""
    need = max_dist + 1
    greedy = (
        "aggregate(array_sort(array_append(acc.poss, s.pos)), "
        "named_struct('cnt', 0, 'last', -1000000000), "
        f"(a, p) -> CASE WHEN p >= a.last + {q} "
        "THEN named_struct('cnt', a.cnt + 1, 'last', p) ELSE a END).cnt"
    )
    return F.expr(
        f"aggregate({gp_col}, "
        "named_struct('poss', cast(array() as array<int>), "
        f"'cut', cast({cap} as int), 'done', false), "
        "(acc, s) -> CASE WHEN acc.done THEN acc ELSE named_struct("
        "'poss', array_sort(array_append(acc.poss, s.pos)), "
        f"'cut', CASE WHEN {greedy} >= {need} THEN cast(s.rn as int) ELSE acc.cut END, "
        f"'done', {greedy} >= {need}) END).cut"
    )


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
    # checkpointed: the (id, string) slice is read three times — gram
    # extraction plus BOTH sides of the verify rejoin — and the caller's
    # upstream may be an arbitrary pipeline (measured: a regex-salted 16x
    # probe corpus recomputed 3x doubled the operator wall). One narrow
    # two-column materialization, smaller than the gram index checkpoint.
    strings = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__s")
    ).localCheckpoint()
    s = strings.withColumn(
        "__grams", _distinct_qgrams_minpos(F.col("__s"), q)
    ).withColumn("__len", F.length("__s"))
    # materialize the exploded grams ONCE: the posting list feeds both the
    # document-frequency aggregation and the rank join, and recomputing the
    # tokenize+explode pass for each reference (plus for the downstream
    # prefix scan) dominated the wall time (measured ~2.4x at sf0.1). At
    # lake scale this is the "write the gram index to a table first" step —
    # same pattern as ngram_jaccard_pairs' shingle materialization. Each
    # row carries the gram's min occurrence position (computed array-side,
    # no extra shuffle) for the location-based prefix shortening.
    ex = s.select(
        "__id", "__len", F.explode("__grams").alias("o")
    ).select(
        "__id", "__len", F.col("o.gram").alias("gram"), F.col("o.pos").alias("pos")
    ).localCheckpoint()

    # global gram order: rarest first, gram string as tie-break (total order)
    freq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    ranked = ex.join(freq, "gram")
    w = Window.partitionBy("__id").orderBy(F.col("df").asc(), F.col("gram").asc())
    counted = (
        ranked.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("__id")))
        .filter(F.col("__rn") <= prefix_len)
        .select("__id", "__len", "gram", "pos", "__rn", "__n")
    )
    # location-based prefix shortening (exact — see _location_cutoff_udf):
    # per string, find the rank where the prefix accumulates max_dist+1
    # pairwise q-disjoint gram windows and cut there. The symmetric-join
    # guarantee holds per string: order the pair by each side's LAST prefix
    # gram in the global (df, gram) order; the earlier side's prefix grams
    # are then absent from the other string entirely, which its own
    # stopping rule (disjoint windows, or the kq+1 count bound) converts
    # into ed > max_dist.
    cuts = (
        counted.groupBy("__id")
        .agg(
            F.sort_array(F.collect_list(F.struct("__rn", "pos")))
            .cast("array<struct<rn:int,pos:int>>")
            .alias("gp")
        )
        .select(
            "__id",
            _location_cutoff_expr("gp", max_dist, q, prefix_len).alias("__cut"),
        )
    )
    # checkpointed: the self-join reads this subtree twice and the sentinel
    # scan a third time, and since the location cut the subtree carries a
    # collect_list + Arrow UDF + join — no longer the cheap freq/rank
    # recompute the earlier "NOT checkpointed on purpose" A/B measured.
    # Re-measured at 16x inflation: ~20 s of duplicated cut work saved.
    base = (
        counted.join(cuts, "__id")
        .filter(F.col("__rn") <= F.col("__cut"))
        .select("__id", "__len", "gram", "__n")
        .localCheckpoint()
    )
    # sentinel rows for small gram sets (bound vacuous only small-vs-small)
    short = (
        base.filter(F.col("__n") <= kq)
        .select("__id", "__len")
        .distinct()
        .select("__id", "__len", F.lit(_SHORT).alias("gram"), F.lit(1).alias("__n"))
    )
    prefix = base.unionByName(short)

    a = prefix.select(
        F.col("__id").alias("id_a"), F.col("__len").alias("len_a"), "gram"
    )
    b = prefix.select(
        F.col("__id").alias("id_b"), F.col("__len").alias("len_b"), "gram"
    )
    # NO rank-positional (PPJoin first-match) filter here: it is only sound
    # when the globally-first shared gram is guaranteed inside both
    # prefixes, which the count bound (kq+1) provides but the location
    # shortening does NOT — a real pair can collide only via a later shared
    # gram, where the first-match overlap bound legitimately fails. The
    # location cut prunes far harder than the positional test did, and the
    # length filter (|len_a - len_b| <= k, implied by ed <= k) stays.
    cand = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= F.lit(max_dist))
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
