from .text import add_text_features, detect_language  # noqa: F401
from .dedup import (  # noqa: F401
    add_exact_hash,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from .similarity import ann_topk, embedding_near_dups  # noqa: F401
