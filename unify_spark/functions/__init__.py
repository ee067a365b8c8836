from unify_spark.functions.text import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)
from unify_spark.functions.dedup import (  # noqa: F401
    exact_duplicates,
    minhash_candidates,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_candidates,
)
from unify_spark.functions.similarity import (  # noqa: F401
    cosine_pairs,
    cosine_topk,
    lsh_ann_topk,
)
