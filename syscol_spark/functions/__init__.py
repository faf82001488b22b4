from syscol_spark.functions.envelope import (  # noqa: F401
    ENVELOPE_SCHEMA,
    enrich_envelope,
    envelope_to_json,
    explode_envelope,
    parse_envelope_json,
)
from syscol_spark.functions.partitioners import fnv1a_32, fnv1a_partition, partition_like_reference  # noqa: F401
from syscol_spark.functions.text import (  # noqa: F401
    bpe_token_count,
    bpe_tokens,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    stopword_hits,
    token_count,
    tokens,
    word_shingles,
)
from syscol_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
