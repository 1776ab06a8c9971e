from .dedup import (  # noqa: F401
    connected_components,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_params_for,
    ngram_jaccard_pairs,
    simhash_pairs,
    with_simhash,
)
from .curate import near_dup_pipeline  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_topk,
    ivf_topk,
    lsh_cosine_topk,
    lsh_params_for,
)
from .streaming import (  # noqa: F401
    streaming_exact_dedup,
    streaming_quality_gate,
)
from .sample import (  # noqa: F401
    cap_per_group,
    pack_greedy,
    stratified_sample,
)
from .text import (  # noqa: F401
    flag_contaminated,
    scrub_pii,
    with_fingerprint,
    with_language_id,
    with_quality_features,
    with_token_count,
)
from .curate import curate_corpus  # noqa: F401
from .incremental import (  # noqa: F401
    embedding_index_append,
    embedding_index_build,
    embedding_index_probe,
    embedding_index_reconcile,
    index_compact,
    minhash_index_append,
    minhash_index_build,
    minhash_index_probe,
    minhash_index_reconcile,
    ngram_index_append,
    ngram_index_build,
    ngram_index_probe,
    ngram_index_reconcile,
)
