"""Benchmark decontamination: flag training documents whose word n-grams
overlap a held-out benchmark/eval set.

The standard pre-training hygiene step (n-gram-overlap decontamination as
popularized by the GPT-3/Gopher/Llama reports): build the set of distinct
word n-grams appearing anywhere in the benchmark, then scan the corpus and
count, per document, how many of its n-grams hit that set.

Scale shape (the part that must survive 100 TB):
- The benchmark side is tiny relative to the corpus (eval sets are MBs) —
  its distinct-n-gram set is aggregated once and BROADCAST, so the corpus
  never shuffles to meet it.
- The corpus side is one scan: shingle (codegen `transform`, no explode of
  the raw text), explode the distinct shingles, map-side broadcast hash
  join against the benchmark set, then one partial-agg'd groupBy(doc_id)
  whose shuffle carries one row per document, not per n-gram.
- No UDFs anywhere; everything stays in whole-stage codegen.

The n-gram kernel is `word_shingles` (functions/text.py) — whitespace
tokens, n-word windows, distinct — chosen for an exact DuckDB twin so the
whole report is value-checked, not just row-counted.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast

from syscol_spark.functions.text import word_shingles


def benchmark_ngrams(bench: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-grams across the benchmark set (one column ``ngram``).

    Aggregate this ONCE and broadcast it: the result is bounded by the
    benchmark's vocabulary, not the corpus size.
    """
    return (
        bench.select(F.explode(word_shingles(text_col, n)).alias("ngram"))
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    bench_ngrams: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Per contaminated document: distinct-n-gram count, hit count, fraction.

    Documents with zero overlap are dropped (at scale the clean set is the
    overwhelming majority; the report is the exception list you act on).
    Output: (id_col, n_shingles, n_hits, contamination) — contamination
    rounded to 6dp for engine-stable comparison.
    """
    sh = corpus.select(
        F.col(id_col),
        word_shingles(text_col, n).alias("__shset"),
    ).withColumn("n_shingles", F.size("__shset").cast("long"))
    ex = sh.select(id_col, "n_shingles", F.explode("__shset").alias("ngram"))
    hits = (
        ex.join(broadcast(bench_ngrams.withColumn("__hit", F.lit(1))), "ngram", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
    )
    return hits.withColumn(
        "contamination",
        F.round(F.col("n_hits").cast("double") / F.col("n_shingles"), 6),
    )
