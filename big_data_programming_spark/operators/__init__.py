"""Composable DataFrame→DataFrame operators (SURVEY.md §2, §4 'genuinely
custom' list). Everything here is declarative DataFrame algebra —
Catalyst plans it; none of these functions trigger execution."""

from big_data_programming_spark.operators.clustering import (  # noqa: F401
    connected_components,
    dedup_clusters,
)
from big_data_programming_spark.operators.dedup import (  # noqa: F401
    exact_dedup_keys,
    jaccard_pairs,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    normalize_text,
    simhash,
)
from big_data_programming_spark.operators.multimodal import (  # noqa: F401
    fake_decode_features,
    sample_chunks,
    synthesize_blobs,
)
from big_data_programming_spark.operators.sessions import sessionize  # noqa: F401
from big_data_programming_spark.operators.similarity import (  # noqa: F401
    bucketed_near_pairs,
    cosine_similarity_col,
    ivf_build,
    ivf_topk,
    lsh_sign_bucket,
    topk_cosine,
)
from big_data_programming_spark.operators.skew import (  # noqa: F401
    salted_join,
    salted_sum_count,
)
from big_data_programming_spark.operators.text import (  # noqa: F401
    bpe_ish_tokens,
    quality_features,
    shingle_fingerprint,
    tokenize,
)
