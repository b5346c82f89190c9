"""Composable DataFrame→DataFrame operators (SURVEY.md §2, §4 'genuinely
custom' list). Everything here is declarative DataFrame algebra —
Catalyst plans it; none of these functions trigger execution."""

from big_data_programming_spark.operators.sessions import sessionize  # noqa: F401
from big_data_programming_spark.operators.dedup import (  # noqa: F401
    exact_dedup_keys,
    jaccard_pairs,
    normalize_text,
    simhash,
)
from big_data_programming_spark.operators.similarity import (  # noqa: F401
    cosine_similarity_col,
    lsh_sign_bucket,
    topk_cosine,
)
from big_data_programming_spark.operators.text import (  # noqa: F401
    bpe_ish_tokens,
    quality_features,
    shingle_fingerprint,
    tokenize,
)
