from protosc_spark.features.text import (  # noqa: F401
    char_hist,
    default_text_extractors,
    hashed_ngram,
    length_stats,
    role_onehot,
    token_ids,
)
