"""Training-data pipeline queries (north-star): deterministic sampling,
dataset mixing, sequence packing, PII redaction, column profiling.

All five sampling/packing/redaction entries are fully oracle-checked: the
md5-bucket sampling kernel (operators/sampling.py::hash_bucket) was chosen
specifically to have an exact DuckDB twin, so reproducible-sampling claims
are verified value-for-value, not just by row count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from syscol_spark.functions.text import (
    DEFAULT_STOPWORDS,
    EMAIL_RE,
    PHONE_RE,
    bpe_token_count,
    email_count,
    phone_count,
    quality_score,
    redact_pii,
    stopword_hits,
    token_count,
)
from syscol_spark.operators.profile import profile_columns
from syscol_spark.operators.sampling import (
    hash_bucket,
    hash_bucket_sql,
    hash_sample,
    pack_sequences,
    stratified_sample,
    weighted_mixture,
)
from syscol_spark.plans.catalog import register
from syscol_spark.sources.tables import load_table

_SEED = 7
_BUCKET_DOC = hash_bucket_sql("doc_id", _SEED)  # DuckDB twin of the Spark bucket


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- deterministic hash sampling --------------------------------------------
@register(
    "q_sample_hash",
    f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents
    WHERE {_BUCKET_DOC} < 250000
    GROUP BY lang
    """,
    description="deterministic 25% hash sample (md5 ppm bucket) — membership proven by sum of kept ids",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = hash_sample(_docs(spark, sf_dir), "doc_id", keep_ppm=250_000, seed=_SEED)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


# --- stratified sampling -----------------------------------------------------
@register(
    "q_stratified_sample",
    f"""
    SELECT lang, doc_id, n_chars
    FROM (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY {_BUCKET_DOC}, doc_id) AS rn
        FROM documents
    )
    WHERE rn <= 10
    """,
    description="deterministic stratified sample: 10 docs per language by hash order",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(
        _docs(spark, sf_dir), "lang", "doc_id", n_per_stratum=10, seed=_SEED
    ).select("lang", "doc_id", "n_chars")


# --- weighted dataset mixture ------------------------------------------------
# Per-source keep rates derived from the numeric source suffix (scale-robust:
# no enumeration of source names): tier = suffix % 3 → 60% / 30% / 10%.
_TIER_SQL = f"(CAST(regexp_extract(source, '(\\d+)$', 1) AS INT) % 3)"
_RATE_SQL = f"CASE {_TIER_SQL} WHEN 0 THEN 600000 WHEN 1 THEN 300000 ELSE 100000 END"


def _rate_ppm() -> F.Column:
    tier = F.regexp_extract(F.col("source"), r"(\d+)$", 1).cast("int") % 3
    return (
        F.when(tier == 0, F.lit(600_000))
        .when(tier == 1, F.lit(300_000))
        .otherwise(F.lit(100_000))
    )


@register(
    "q_mixture_weighted",
    f"""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents
    WHERE {_BUCKET_DOC} < {_RATE_SQL}
    GROUP BY source
    """,
    description="weighted dataset mixture: per-source deterministic down-sampling to 60/30/10% tiers",
)
def q_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = weighted_mixture(_docs(spark, sf_dir), "doc_id", _rate_ppm(), seed=_SEED)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


# --- sequence packing --------------------------------------------------------
_PACK_BUDGET = 512

@register(
    "q_pack_sequences",
    r"""
    SELECT lang, doc_id, n_tok, off AS offset,
           CAST(off // 512 AS BIGINT) AS first_pack,
           CAST((off + greatest(n_tok, 1) - 1) // 512 AS BIGINT) AS last_pack,
           CAST((off + greatest(n_tok, 1) - 1) // 512 - off // 512 AS BIGINT) AS n_splits
    FROM (
        SELECT lang, doc_id, n_tok,
               CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        FROM (
            SELECT lang, doc_id,
                   CAST(len(regexp_extract_all(text, '\w+|[^\w\s]+')) AS BIGINT) AS n_tok
            FROM documents
        )
    )
    """,
    description="sequence packing manifest: concat-and-chunk docs into 512-token windows per language",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    packed = pack_sequences(
        docs, group_col="lang", id_col="doc_id",
        n_tokens=bpe_token_count("text"), budget=_PACK_BUDGET,
    )
    return packed.select(
        "lang", "doc_id", "n_tok", "offset", "first_pack", "last_pack", "n_splits"
    )


# --- PII redaction -----------------------------------------------------------
# The synthetic corpus contains no PII, so the query PLANTS deterministic
# emails/phones derived from doc_id, then verifies detection counts and that
# redaction leaves zero residual matches — behavior-checked end-to-end on
# both engines.
@register(
    "q_pii_redact",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(planted, '"""
    + EMAIL_RE
    + """'))) AS BIGINT) AS n_emails,
           CAST(SUM(len(regexp_extract_all(planted, '"""
    + PHONE_RE
    + """'))) AS BIGINT) AS n_phones,
           CAST(SUM(len(regexp_extract_all(redacted, '"""
    + EMAIL_RE
    + """'))
              + len(regexp_extract_all(redacted, '"""
    + PHONE_RE
    + """'))) AS BIGINT) AS n_residual
    FROM (
        SELECT lang, planted,
               regexp_replace(regexp_replace(planted, '"""
    + EMAIL_RE
    + """', '[PII]', 'g'), '"""
    + PHONE_RE
    + """', '[PII]', 'g') AS redacted
        FROM (
            SELECT lang,
                   text || ' contact doc' || CAST(doc_id AS VARCHAR)
                        || '@example.com or 555-010-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS planted
            FROM documents
        )
    )
    GROUP BY lang
    """,
    description="PII scrub: plant deterministic emails/phones, count matches, verify zero residual after redaction",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    planted = F.concat(
        F.col("text"),
        F.lit(" contact doc"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-010-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
    )
    base = _docs(spark, sf_dir).select("lang", planted.alias("planted"))
    staged = base.withColumn("redacted", redact_pii("planted"))
    return staged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(email_count("planted")).alias("n_emails"),
        F.sum(phone_count("planted")).alias("n_phones"),
        F.sum(email_count("redacted") + phone_count("redacted")).alias("n_residual"),
    )


# --- end-to-end curation funnel ----------------------------------------------
# The composition a real pretraining pipeline runs: quality gate → language
# consistency gate → exact-dedup canonical gate, with per-stage survivor
# counts. Every stage reuses an independently-oracle-verified kernel
# (quality_score ≡ q_text_quality, stopword guess ≡ q_lang_id, canonical ≡
# q_dedup_exact's min-id policy), and the funnel itself is exact-checked.
_STOPS_SQL = ", ".join(f"'{s}'" for s in DEFAULT_STOPWORDS)
_PUNCT = r"[.,!?;:]"


@register(
    "q_curation_funnel",
    f"""
    WITH t AS (
      SELECT doc_id, lang, text,
             CAST(array_length(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  tok -> tok IN ({_STOPS_SQL}))) AS BIGINT) AS stop_hits,
             CAST(length(text) - length(regexp_replace(text, '{_PUNCT}', '', 'g')) AS DOUBLE)
               / length(text) AS praw,
             MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon_id
      FROM documents
    ), f AS (
      SELECT lang,
             ROUND(0.5 * least(n_tokens / 64.0, 1.0)
                 + 0.4 * least(4.0 * stop_hits / greatest(n_tokens, 1), 1.0)
                 + 0.1 * (1 - least(praw * 10, 1.0)), 6) >= 0.5 AS f_quality,
             ((CAST(stop_hits AS DOUBLE) / n_tokens >= 0.1) = (lang = 'en')) AS f_lang_raw,
             (doc_id = canon_id) AS f_canon_raw
      FROM t
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN f_quality AND f_lang_raw THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
           CAST(SUM(CASE WHEN f_quality AND f_lang_raw AND f_canon_raw THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM f
    GROUP BY lang
    """,
    description="curation funnel: quality gate -> language-consistency gate -> dedup-canonical gate, per-stage survivors",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy(F.md5("text"))
    staged = docs.select(
        "lang",
        (quality_score("text") >= 0.5).alias("f_quality"),
        (
            (stopword_hits("text").cast("double") / token_count("text") >= 0.1)
            == (F.col("lang") == "en")
        ).alias("f_lang_raw"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("f_canon_raw"),
    )
    return staged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("f_quality").cast("long")).alias("n_quality"),
        F.sum((F.col("f_quality") & F.col("f_lang_raw")).cast("long")).alias("n_lang_ok"),
        F.sum((F.col("f_quality") & F.col("f_lang_raw") & F.col("f_canon_raw")).cast("long")).alias("n_kept"),
    )


# --- column profiling --------------------------------------------------------
_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def _profile_col_sql(c: str, text_cast: str) -> str:
    return f"""
    SELECT '{c}' AS column,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS {text_cast}) AS min_str,
           CAST(MAX({c}) AS {text_cast}) AS max_str
    FROM orders
    """


@register(
    "q_profile",
    " UNION ALL ".join(
        [_profile_col_sql(c, "VARCHAR") for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]]
        + [
            """
    SELECT 'o_totalprice' AS column,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(27,6)) AS VARCHAR) AS min_str,
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(27,6)) AS VARCHAR) AS max_str
    FROM orders
    """
        ]
    ),
    description="one-pass column profile: nulls / exact distinct / min / max per column",
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_columns(load_table(spark, sf_dir, "orders"), _PROFILE_COLS)


# --- benchmark decontamination -----------------------------------------------
# Split the documents table deterministically: 2% (by md5 ppm bucket, its own
# seed) stands in for the held-out benchmark, the rest is the training corpus.
# A real deployment swaps the bench side for the actual eval-set files; the
# operator shape (broadcast n-gram set, map-side join) is identical.
_BENCH_SEED = 13
_BENCH_PPM = 20_000
_BUCKET_BENCH = hash_bucket_sql("doc_id", _BENCH_SEED)


@register(
    "q_decontaminate",
    f"""
    WITH sh AS (
      SELECT doc_id, {_BUCKET_BENCH} AS b,
             list_distinct(CASE WHEN array_length(toks) >= 3
               THEN list_transform(range(1, array_length(toks) - 1),
                                   i -> array_to_string(list_slice(toks, i, i + 2), ' '))
               ELSE [array_to_string(toks, ' ')] END) AS shset
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
    ), bench AS (
      SELECT DISTINCT unnest(shset) AS ngram FROM sh WHERE b < {_BENCH_PPM}
    ), ex AS (
      SELECT doc_id, len(shset) AS n_shingles, unnest(shset) AS ngram
      FROM sh WHERE b >= {_BENCH_PPM}
    ), agg AS (
      SELECT doc_id, CAST(any_value(n_shingles) AS BIGINT) AS n_shingles,
             CAST(count(bench.ngram) AS BIGINT) AS n_hits
      FROM ex LEFT JOIN bench USING (ngram) GROUP BY doc_id
    )
    SELECT doc_id, n_shingles, n_hits,
           ROUND(CAST(n_hits AS DOUBLE) / n_shingles, 6) AS contamination
    FROM agg WHERE n_hits > 0
    """,
    description="benchmark n-gram-overlap decontamination report (broadcast bench set, map-side join)",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from syscol_spark.operators.decontaminate import benchmark_ngrams, contamination_report

    docs = _docs(spark, sf_dir).withColumn(
        "__b", hash_bucket("doc_id", seed=_BENCH_SEED)
    )
    bench = docs.filter(F.col("__b") < _BENCH_PPM)
    corpus = docs.filter(F.col("__b") >= _BENCH_PPM)
    return contamination_report(
        corpus, benchmark_ngrams(bench, "text", n=3), "text", "doc_id", n=3
    )


# --- dataset domain-mix profile ----------------------------------------------
# The mixture-planning view: per language, how many sources contribute, how
# concentrated they are (token-share entropy, dominant share). Token shares
# come from exact integer sums, so both engines divide identical longs.
@register(
    "q_domain_mix",
    """
    WITH per AS (
      SELECT lang, source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(array_length(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS toks
      FROM documents GROUP BY lang, source
    ), tot AS (
      SELECT lang, CAST(SUM(toks) AS BIGINT) AS tot_toks,
             CAST(COUNT(*) AS BIGINT) AS n_sources
      FROM per GROUP BY lang
    )
    SELECT per.lang, any_value(n_sources) AS n_sources, any_value(tot_toks) AS total_tokens,
           ROUND(-SUM((CAST(toks AS DOUBLE) / tot_toks) * ln(CAST(toks AS DOUBLE) / tot_toks)), 6)
             AS source_entropy,
           ROUND(MAX(CAST(toks AS DOUBLE) / tot_toks), 6) AS top_share
    FROM per JOIN tot ON per.lang = tot.lang
    GROUP BY per.lang
    """,
    description="corpus mixture profile: per-language source counts, token-share entropy, dominant share",
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count("text")).alias("toks"),
        )
    )
    tot = per.groupBy("lang").agg(
        F.sum("toks").alias("tot_toks"), F.count(F.lit(1)).alias("n_sources")
    )
    share = F.col("toks").cast("double") / F.col("tot_toks")
    return (
        per.join(tot, "lang")
        .groupBy("lang")
        .agg(
            F.first("n_sources").alias("n_sources"),
            F.first("tot_toks").alias("total_tokens"),
            F.round(-F.sum(share * F.log(share)), 6).alias("source_entropy"),
            F.round(F.max(share), 6).alias("top_share"),
        )
    )


# --- weighted sampling (A-ES exponential jumps, deterministic) ---------------
# Efraimidis-Spirakis reservoir sampling as a deterministic dataflow: each
# row draws u from its own md5 bucket (engine-portable), and the sample is
# the global top-k by ln(u)/w — longer documents (w = n_chars) win
# proportionally more often. The ORDER key is rounded to 6dp with a doc_id
# tie-break so both engines cut the same top-k even at float ulps.
@register(
    "q_weighted_sample",
    f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ROUND(ln(({hash_bucket_sql("doc_id", 23)} + 0.5) / 1000000.0) / n_chars, 6) AS es_key
      FROM documents
    )
    SELECT doc_id, n_chars, es_key
    FROM keyed ORDER BY es_key DESC, doc_id LIMIT 50
    """,
    description="deterministic weighted sampling (Efraimidis-Spirakis top-k by ln(u)/weight)",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    u = (hash_bucket("doc_id", seed=23) + F.lit(0.5)) / F.lit(1_000_000.0)
    key = F.round(F.log(u) / F.col("n_chars"), 6)
    return (
        d.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(50)
    )


# --- linear quality classifier (fastText/logreg stand-in) --------------------
# No exp/libm anywhere: sigmoid is monotone, so thresholding the logit IS
# thresholding the probability, and the logit is a fixed dot product over
# engine-portable features evaluated in one pinned operation order (see
# functions/text.py::quality_logit — the oracle below mirrors that order
# token for token, so floor(1e6·logit) is the same exact integer in both
# engines). A trained model swaps in as a weight vector; plumbing + parity
# are unchanged.
_STOPS_IN = ", ".join(f"'{s}'" for s in DEFAULT_STOPWORDS)


@register(
    "q_quality_classifier",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST(array_length(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  tok -> tok IN ({_STOPS_IN}))) AS BIGINT) AS stop_hits,
             CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS BIGINT) AS n_nospace
      FROM documents
    ), s AS (
      SELECT doc_id,
             (-0.5) + 4.0 * (CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1))
                    + (-0.4) * ((CAST(n_nospace AS DOUBLE) / greatest(n_tokens, 1)) - 4.0)
                    + 0.8 * (CAST(n_tokens AS DOUBLE) / 100.0) AS logit
      FROM t
    )
    SELECT doc_id,
           CAST(floor(1000000.0 * logit) AS BIGINT) AS score_micro,
           logit >= 0.0 AS keep
    FROM s
    """,
    description="linear quality classifier: fixed-weight logit over portable text features, exact micro-int score",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from syscol_spark.functions.text import quality_logit

    logit = quality_logit("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.floor(F.lit(1_000_000.0) * logit).cast("long").alias("score_micro"),
        (logit >= F.lit(0.0)).alias("keep"),
    )


# --- deterministic train/valid/test split ------------------------------------
# The md5 ppm bucket (operators/sampling.py::hash_bucket) carves the corpus
# 90/5/5 by doc_id: membership is a pure per-row filter (zero shuffle, zero
# state), re-runs and engines agree row-for-row, and adding data never moves
# an existing doc between splits. Membership is proven by per-split id sums,
# not just counts.
_SPLIT_BUCKET = hash_bucket_sql("doc_id", 13)


@register(
    "q_split_assign",
    f"""
    SELECT CASE WHEN {_SPLIT_BUCKET} < 900000 THEN 'train'
                WHEN {_SPLIT_BUCKET} < 950000 THEN 'valid'
                ELSE 'test' END AS split,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1, 2
    """,
    description="deterministic 90/5/5 train/valid/test split via md5 ppm bucket, id-sum-proven membership",
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = hash_bucket("doc_id", seed=13)
    split = (
        F.when(b < 900_000, F.lit("train"))
        .when(b < 950_000, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        _docs(spark, sf_dir)
        .groupBy(split.alias("split"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --- temperature-scaled mixture weights ---------------------------------------
# The multilingual/multi-source rebalancing rule (sampling with temperature
# T: w_i ∝ n_i^(1/T)): flatten the source distribution so head domains stop
# drowning tail domains without inverting the order. 1/T = 0.5 is computed
# as sqrt(), which IEEE-754 guarantees exactly rounded in BOTH engines — no
# libm pow() cross-engine ulp risk at the rounding boundary. Everything
# derives on-plan (two tiny aggregates); output is the per-source sampling
# manifest: raw share, temperature share, and the achieved up/down ratio.
@register(
    "q_mix_temperature",
    """
    WITH per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(array_length(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
             SUM(sqrt(CAST(n_tokens AS DOUBLE))) AS tot_temp
      FROM per
    )
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS raw_share,
           ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / tot_temp, 6) AS temp_share,
           ROUND((sqrt(CAST(n_tokens AS DOUBLE)) / tot_temp)
                 / (CAST(n_tokens AS DOUBLE) / tot_tokens), 6) AS boost
    FROM per, tot
    """,
    description="temperature-scaled mixture weights (T=2): per-source raw vs flattened token share and the resulting up/down-sampling boost",
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count("text")).alias("n_tokens"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("tot_temp"),
    )
    raw_share = F.col("n_tokens").cast("double") / F.col("tot_tokens")
    temp_share = F.sqrt(F.col("n_tokens").cast("double")) / F.col("tot_temp")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(raw_share, 6).alias("raw_share"),
        F.round(temp_share, 6).alias("temp_share"),
        F.round(temp_share / raw_share, 6).alias("boost"),
    )


# --- end-to-end curation pipeline (capstone composition) ---------------------
# The whole pretraining curation DAG as ONE declarative plan — what "a user
# of the reference could run their entire pipeline here" means concretely:
# quality gate -> length gate -> normalization-aware dedup canonical ->
# PII-clean gate -> sequence packing of the survivors, with per-stage
# survivor counts and the final pack/token budget per language. Every stage
# is the already-oracle-checked kernel (quality_score, token_count,
# normalize_text, email/phone counts, pack_sequences); the composition cost
# is one md5-window for the canonical gate and one per-lang packing window
# over survivors — Catalyst pipelines all five gates into the same scan.
@register(
    "q_pipeline_e2e",
    f"""
    WITH t AS (
      SELECT doc_id, lang, text,
             CAST(array_length(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS nt,
             ROUND(0.5 * least(array_length(string_split_regex(trim(text), '\\s+')) / 64.0, 1.0)
                 + 0.4 * least(4.0 * len(list_filter(string_split_regex(trim(text), '\\s+'),
                                                     tok -> tok IN ({_STOPS_SQL})))
                               / greatest(array_length(string_split_regex(trim(text), '\\s+')), 1), 1.0)
                 + 0.1 * (1 - least((length(text) - length(regexp_replace(text, '{_PUNCT}', '', 'g')))
                                    / CAST(length(text) AS DOUBLE) * 10, 1.0)), 6) AS q,
             MIN(doc_id) OVER (
               PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '{_PUNCT}', '', 'g'),
                                                    '\\s+', ' ', 'g')))) AS canon_id,
             len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', 0))
               + len(regexp_extract_all(text, '\\b\\d{{3}}[-. ]\\d{{3}}[-. ]\\d{{4}}\\b', 0)) AS pii,
             CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]+')) AS BIGINT) AS bpe_nt
      FROM documents
    ), g AS (
      SELECT doc_id, lang, bpe_nt,
             (q >= 0.5) AS g_quality,
             (q >= 0.5 AND nt BETWEEN 20 AND 80) AS g_len,
             (q >= 0.5 AND nt BETWEEN 20 AND 80 AND doc_id = canon_id) AS g_canon,
             (q >= 0.5 AND nt BETWEEN 20 AND 80 AND doc_id = canon_id AND pii = 0) AS g_clean
      FROM t
    ), surv AS (
      SELECT lang, doc_id, bpe_nt,
             CAST(COALESCE(SUM(bpe_nt) OVER (
                 PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      FROM g WHERE g_clean
    ), packs AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(SUM(bpe_nt) AS BIGINT) AS total_tokens,
             CAST(MAX((off + greatest(bpe_nt, 1) - 1) // 512) + 1 AS BIGINT) AS n_packs,
             CAST(SUM(CASE WHEN (off + greatest(bpe_nt, 1) - 1) // 512 > off // 512
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
      FROM surv GROUP BY lang
    )
    SELECT g.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN g_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN g_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
           CAST(SUM(CASE WHEN g_canon THEN 1 ELSE 0 END) AS BIGINT) AS n_canon,
           CAST(SUM(CASE WHEN g_clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           any_value(p.total_tokens) AS total_tokens,
           any_value(p.n_packs) AS n_packs,
           any_value(p.n_straddlers) AS n_straddlers
    FROM g JOIN packs p ON g.lang = p.lang
    GROUP BY g.lang
    """,
    description="end-to-end curation pipeline in one plan: quality/length/norm-dedup/PII gates with per-stage survivors, then 512-token packing of the kept set per language",
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from syscol_spark.functions.text import normalize_text

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy(F.md5(normalize_text("text")))
    nt = token_count("text")
    staged = docs.select(
        "doc_id",
        "lang",
        bpe_token_count("text").alias("bpe_nt"),
        (quality_score("text") >= 0.5).alias("g_quality"),
        nt.between(20, 80).alias("g_len"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canon"),
        ((email_count("text") + phone_count("text")) == 0).alias("is_clean"),
    ).select(
        "doc_id",
        "lang",
        "bpe_nt",
        "g_quality",
        (F.col("g_quality") & F.col("g_len")).alias("g_len"),
        (F.col("g_quality") & F.col("g_len") & F.col("is_canon")).alias("g_canon"),
        (F.col("g_quality") & F.col("g_len") & F.col("is_canon") & F.col("is_clean")).alias(
            "g_clean"
        ),
    # staged is consumed twice (the packing leg and the funnel aggregate),
    # and its subtree is the expensive part — bpe_token_count,
    # quality_score, PII regexes, plus the canonical-dup window's corpus
    # shuffle. Materialize the NARROW (id, lang, count, 4 flags) result
    # once (r14, guide §2.4) instead of re-planning all of it per consumer.
    ).localCheckpoint()
    kept = staged.filter("g_clean").select("lang", "doc_id", "bpe_nt")
    packed = pack_sequences(
        kept, group_col="lang", id_col="doc_id", n_tokens=F.col("bpe_nt"), budget=_PACK_BUDGET
    )
    packs = packed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tok").alias("total_tokens"),
        (F.max("last_pack") + 1).alias("n_packs"),
        F.sum(F.when(F.col("n_splits") > 0, 1).otherwise(0)).alias("n_straddlers"),
    )
    return (
        staged.join(F.broadcast(packs), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("g_quality"), 1).otherwise(0)).alias("n_quality"),
            F.sum(F.when(F.col("g_len"), 1).otherwise(0)).alias("n_len"),
            F.sum(F.when(F.col("g_canon"), 1).otherwise(0)).alias("n_canon"),
            F.sum(F.when(F.col("g_clean"), 1).otherwise(0)).alias("n_clean"),
            F.any_value(F.col("total_tokens")).alias("total_tokens"),
            F.any_value(F.col("n_packs")).alias("n_packs"),
            F.any_value(F.col("n_straddlers")).alias("n_straddlers"),
        )
    )


# --- length-bucketed batching efficiency --------------------------------------
# The dynamic-batching diagnostic a training pipeline runs before choosing
# bucket boundaries: group docs into length buckets (caps 32/64/128 BPE
# tokens), measure the padding waste of batching each bucket at its cap,
# and compare against the single-cap baseline (everything padded to 128).
# Padding waste = fraction of batch slots that are pad tokens — the number
# length bucketing exists to shrink. All integers; one scan, one tiny agg.
@register(
    "q_batch_padding",
    r"""
    WITH t AS (
      SELECT lang,
             CAST(len(regexp_extract_all(text, '\w+|[^\w\s]+')) AS BIGINT) AS nt
      FROM documents
    ), b AS (
      SELECT lang, nt,
             CASE WHEN nt <= 32 THEN 32 WHEN nt <= 64 THEN 64 ELSE 128 END AS cap
      FROM t
    )
    SELECT lang, CAST(cap AS BIGINT) AS cap,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(nt) AS BIGINT) AS max_tokens,
           CAST(SUM(nt) AS BIGINT) AS sum_tokens,
           CAST(floor(1000000.0 * (COUNT(*) * cap - SUM(nt)) / (COUNT(*) * cap)) AS BIGINT)
             AS waste_micro,
           CAST(floor(1000000.0 * (COUNT(*) * 128 - SUM(nt)) / (COUNT(*) * 128.0)) AS BIGINT)
             AS waste_single_cap_micro
    FROM b GROUP BY lang, cap
    """,
    description="length-bucketed batching efficiency: padding waste per (lang, bucket cap) vs the single-cap baseline",
)
def q_batch_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    nt = bpe_token_count("text")
    b = d.select(
        "lang",
        nt.alias("nt"),
        F.when(nt <= 32, 32).when(nt <= 64, 64).otherwise(128).alias("cap"),
    )
    n = F.count(F.lit(1))
    return b.groupBy("lang", "cap").agg(
        n.alias("n_docs"),
        F.max("nt").alias("max_tokens"),
        F.sum("nt").alias("sum_tokens"),
        F.floor(F.lit(1_000_000.0) * (n * F.col("cap") - F.sum("nt")) / (n * F.col("cap")))
        .cast("long")
        .alias("waste_micro"),
        F.floor(F.lit(1_000_000.0) * (n * 128 - F.sum("nt")) / (n * F.lit(128.0)))
        .cast("long")
        .alias("waste_single_cap_micro"),
    ).select(
        "lang",
        F.col("cap").cast("long").alias("cap"),
        "n_docs",
        "max_tokens",
        "sum_tokens",
        "waste_micro",
        "waste_single_cap_micro",
    )
