"""Byte-pair-encoding vocabulary induction (north-star: tokenizer training).

The data side of training a BPE tokenizer (Sennrich et al., ACL 2016) as
distributed DataFrame ops:

1. One corpus shuffle builds the word-frequency table (vocabulary-sized —
   at 100 TB of text that is ~10-100M rows, NOT corpus-sized; every later
   step touches only this table).
2. Each merge step is: count adjacent symbol pairs weighted by word
   frequency (explode + sum groupBy over the vocab table), take the global
   argmax with a distributed TakeOrdered top-1 (integer counts,
   (count desc, pair asc) total order — fully deterministic), and apply the
   merge to every word with one literal string replace.

The per-step driver pull is ONE row (the winning pair) — the same bounded
trainer-side pattern as kmeans_centroids, not a data-proportional collect.

Symbol sequences are carried as a delimited string ``|s1|s2|...|`` so a
merge of (a, b) is literally ``replace(repr, '|a|b|', '|ab|')``: string
replace scans left-to-right non-overlapping, which IS the BPE application
order (in ``|a|a|a|`` the pair (a,a) merges the first two, leaving
``|aa|a|`` — verified by test_bpe_overlapping_pairs_merge_left_to_right).
The representation keeps the whole loop inside codegen'd expressions; after
n merges a word's repr is an n-deep replace chain over the initial
characters, still one narrow projection.

Production scale note: real tokenizers run 30k+ merges; one Spark job per
merge would be scheduler-bound. The production path batches compatible
merges per round (apply the top-k pairwise-disjoint pairs per iteration —
the standard parallel-BPE construction); the per-step semantics here are
the exact sequential definition the batched variant must reproduce.

Reference parity: the reference ships no tokenizer (SURVEY.md §2.11
north-star scope); semantics follow the public BPE algorithm.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from syscol_spark.functions.text import tokens


def word_freq_table(df: DataFrame, content_col: str) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-wide shuffle."""
    return (
        df.select(F.explode(tokens(content_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _char_repr(word) -> F.Column:
    """'cat' -> '|c|a|t|': every single character becomes one symbol."""
    c = F.col(word) if isinstance(word, str) else word
    return F.concat(F.lit("|"), F.regexp_replace(c, "(.)", "$1|"))


def _pair_keys(repr_col: F.Column) -> F.Column:
    """Adjacent symbol pairs of a repr, each as its own '|a|b|' merge key."""
    syms = F.filter(F.split(repr_col, r"\|"), lambda x: x != "")
    n = F.size(syms)
    left = F.slice(syms, 1, F.greatest(n - 1, F.lit(0)))
    right = F.slice(syms, 2, F.greatest(n - 1, F.lit(0)))
    return F.zip_with(
        left, right, lambda a, b: F.concat(F.lit("|"), a, F.lit("|"), b, F.lit("|"))
    )


def learn_bpe_merges(df: DataFrame, content_col: str, *, n_merges: int = 8) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a corpus.

    Returns a DataFrame (step, left_sym, right_sym, merged, freq): the merge
    table a tokenizer serializes, in learned order. freq is the weighted
    pair count at the moment the merge was chosen (integer — no float
    parity risk). Column names avoid the reserved words LEFT/RIGHT so the
    oracle SQL can use them verbatim.
    """
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    spark = df.sparkSession
    # Materialize the word-frequency table EAGERLY: each merge step is its
    # own Spark action, and without the checkpoint every step would re-run
    # the corpus scan + shuffle from lineage (n_merges corpus scans instead
    # of one — the "write signatures first" lesson from q_minhash_lsh). The
    # checkpoint also resets lineage so step t's plan is t replaces deep
    # over a vocab-sized table, not t replays of the corpus.
    words = (
        word_freq_table(df, content_col)
        .withColumn("repr", _char_repr("word"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            words.select(F.explode(_pair_keys(F.col("repr"))).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not best:  # corpus of 1-char words only: nothing left to merge
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        left, right = pair.strip("|").split("|", 1)
        merged = left + right
        merges.append((step, left, right, merged, cnt))
        words = words.withColumn(
            "repr", F.replace(F.col("repr"), F.lit(pair), F.lit(f"|{merged}|"))
        )
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, merged string, freq long"
    )


def apply_bpe_merges(df: DataFrame, content_col: str, merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenize ``content_col`` with a learned merge list: per word, start
    from characters and apply every merge in order (one replace each — the
    chain stays a single codegen'd projection). Adds ``bpe_syms``
    (array<string>) without touching other columns."""
    def word_to_syms(w):
        r = F.concat(F.lit("|"), F.regexp_replace(w, "(.)", "$1|"))
        for left, right in merges:
            r = F.replace(r, F.lit(f"|{left}|{right}|"), F.lit(f"|{left}{right}|"))
        return F.filter(F.split(r, r"\|"), lambda x: x != "")

    return df.withColumn(
        "bpe_syms",
        F.flatten(F.transform(tokens(content_col), word_to_syms)),
    )
