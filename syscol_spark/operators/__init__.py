from syscol_spark.operators.dedup import (  # noqa: F401
    dedup_clusters,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from syscol_spark.operators.joins import asof_join, range_join_count  # noqa: F401
from syscol_spark.operators.langid import classify_by_ngram, ngram_profiles  # noqa: F401
from syscol_spark.operators.multimodal import (  # noqa: F401
    documents_as_assets,
    extract_features,
    resize_assets,
    sample_frames,
)
from syscol_spark.operators.similarity import brute_force_topk, srp_topk  # noqa: F401
