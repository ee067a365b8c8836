from unify_spark.functions.text import (  # noqa: F401
    fingerprint,
    lang_id,
    normalize_text,
    normalized_duplicates,
    pii_counts,
    quality_features,
    remove_boilerplate_lines,
    token_count,
    top_ngrams,
    with_pii,
    with_winnow_fingerprints,
)
from unify_spark.functions.sampling import (  # noqa: F401
    sample_hash,
    split_columns,
    stratified_sample,
    take_per_stratum,
)
from unify_spark.functions.packing import (  # noqa: F401
    pack_chunks,
    pack_chunks_grouped,
    pack_documents,
    pack_spans,
)
from unify_spark.functions.dedup import (  # noqa: F401
    decontaminate,
    exact_duplicates,
    minhash_candidates,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_candidates,
    winnow_candidates,
)
from unify_spark.functions.similarity import (  # noqa: F401
    cosine_pairs,
    validated_vectors,
    cosine_topk,
    embedding_dup_clusters,
    embedding_near_dup_pairs,
    ivf_ann_topk,
    lsh_ann_topk,
)
from unify_spark.functions.graph import (  # noqa: F401
    canonical_docs,
    connected_components,
    duplicate_clusters,
)
from unify_spark.functions.pipeline import clean_corpus  # noqa: F401
from unify_spark.functions.sessions import sessionize  # noqa: F401
from unify_spark.functions.audio_dedup import (  # noqa: F401
    audio_dup_clusters,
    audio_fingerprints,
    audio_near_dup_candidates,
)
from unify_spark.functions.multimodal import (  # noqa: F401
    audio_embeddings,
    audio_features,
    audio_segments,
    audio_sidecars,
    normalize_audio_gain,
)
