from syscol_spark.functions.text import (  # noqa: F401
    punct_ratio,
    stopword_hits,
    token_count,
    tokens,
    word_shingles,
)
from syscol_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
